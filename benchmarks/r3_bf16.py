"""bf16-state experiment for the fused SOGP train kernel (SURVEY §7
watch-list (c), VERDICT r2 item 7): store the [S, S, lane] C/Q blocks in
bfloat16 with float32 arithmetic, measure train-kernel wall + in-sample
RMSE against the f32 kernel at both the reference and calibrated
constants. Writes benchmarks/r3_bf16.json with the adopt/bury verdict.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r3_bf16.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      rgb_gp_config)
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.ops.kernels import RBFParams
from gp_compressor_tpu.pallas_kernels import sogp_train
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)

    results = []
    for label, hp in (("ref-constants", None),
                      ("calibrated", (1.4e-3, 1.8e-3, 4.7e-4))):
        dgp = dict(capacity=bench.TPU_CAPACITY, slots=bench.TPU_SLOTS,
                   eps_tol=bench.TPU_EPS_TOL)
        if hp is not None:
            dgp.update(sigmaf_sq=hp[0], l_sq=hp[1], s20=hp[2],
                       eps_tol=bench.TPU_EPS_TOL * hp[0] / 100.0)
        cfg = CompressorConfig(
            patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                              max_patches=bench.MAX_PATCHES,
                              max_points_per_patch=bench.MAX_PPP,
                              approx_sphere_moments=True,
                              bank_order="center_out"),
            depth_gp=GPConfig(**dgp),
            rgb_gp=dataclasses.replace(
                rgb_gp_config(slots=bench.TPU_SLOTS,
                              capacity=bench.TPU_CAPACITY),
                eps_tol=bench.TPU_EPS_TOL),
        )
        batch = compressor.project(pts, cols, valid, cfg)
        kp = RBFParams(sigmaf_sq=jnp.asarray(cfg.depth_gp.sigmaf_sq),
                       l_sq=jnp.asarray(cfg.depth_gp.l_sq))
        B = batch.mask.shape[0]

        for sdt_name, sdt in (("f32", None), ("bf16", jnp.bfloat16)):
            def train_only():
                st = sparse_gp.init_batch(cfg.depth_gp, B)
                st = sogp_train.add_points_batch_pallas(
                    kp, cfg.depth_gp, st, batch.X, batch.y, batch.mask,
                    state_dtype=sdt)
                return st

            st = train_only()                          # compile
            _ = float(jnp.sum(st.C))
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                st = train_only()
                _ = float(jnp.sum(st.C))
                times.append(time.perf_counter() - t0)
            wall = min(times)
            mean, _ = sparse_gp.predict_batch(kp, cfg.depth_gp.s20, st,
                                              batch.X)
            err2 = jnp.sum(jnp.where(batch.mask,
                                     (mean[..., 0] - batch.y[..., 0]) ** 2,
                                     0.0))
            rmse = float(jnp.sqrt(err2 / jnp.maximum(jnp.sum(batch.mask), 1)))
            szs = sparse_gp.size(st)
            rec = {"label": label, "state_dtype": sdt_name,
                   "train_wall_s": round(wall, 4),
                   "rmse_m": round(rmse, 5),
                   "mean_bv": round(float(jnp.sum(szs) / jnp.maximum(
                       jnp.sum(szs > 0), 1)), 2)}
            print(json.dumps(rec), flush=True)
            results.append(rec)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r3_bf16.json")
    with open(path, "w") as f:
        json.dump({"results": results}, f, indent=1)


if __name__ == "__main__":
    main()
