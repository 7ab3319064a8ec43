"""f32 accuracy/throughput sweep on the TPU (VERDICT r1 item 8).

Sweeps the novelty threshold (eps_tol), BV budget (capacity/slots) and the
Pallas fused path on the headline 300k-point compress+decompress workload,
recording in-sample RMSE + wall so the f32-vs-f64 accuracy gap
(0.0232 m vs 0.015 m at round-1 end) can be traded off explicitly.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/f32_sweep.py
Writes benchmarks/f32_sweep.json and prints one JSON line per config.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor


def main():
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    use_pallas = jax.devices()[0].platform != "cpu"

    # (label, eps_tol, capacity, slots, (sigmaf_sq, l_sq, s20) or None for
    # the reference constants). The calibrated rows use the NUTS posterior
    # mode of the patch-bank marginal (bench.py extra.nuts) with the
    # novelty threshold rescaled to the calibrated signal variance —
    # measured RMSE 0.0135 m at full speed, BEATING the 0.015 m f64-with-
    # reference-constants figure: the round-1 "f32 accuracy gap" was a
    # hyperparameter misspecification gap (sigma_f^2=100/l=1 m on cm-scale
    # 0.15 m patches), not a precision gap.
    # NOTE slots=64 exceeds the fused train kernel's VMEM budget (the
    # [S, S, lane] C/Q blocks); slots <= 48 is the supported envelope.
    grid_cfgs = [
        ("ref-constants", 2.0, 30, 32, None),
        ("ref-constants", 1.0, 30, 32, None),
        ("ref-constants", 0.5, 30, 32, None),
        ("ref-constants", 1.0, 44, 48, None),
        ("ref-constants", 0.25, 44, 48, None),
        ("nuts-mode", 2.0 * 3.7e-3 / 100, 30, 32, (3.7e-3, 4.1e-3, 1.5e-4)),
        ("nuts-mode", 2.0 * 3.7e-3 / 100, 44, 48, (3.7e-3, 4.1e-3, 1.5e-4)),
        ("mid", 2.0 * 0.05 / 100, 30, 32, (0.05, 0.05, 1e-3)),
    ]
    results = []
    for label, eps_tol, capacity, slots, hp in grid_cfgs:
        dgp = dict(capacity=capacity, slots=slots, eps_tol=eps_tol)
        if hp is not None:
            dgp.update(sigmaf_sq=hp[0], l_sq=hp[1], s20=hp[2])
        cfg = CompressorConfig(
            patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                              max_patches=bench.MAX_PATCHES,
                              max_points_per_patch=bench.MAX_PPP,
                              approx_sphere_moments=True),
            depth_gp=GPConfig(**dgp),
            rgb_gp=dataclasses.replace(
                rgb_gp_config(slots=slots, capacity=capacity),
                eps_tol=2.0),
        )

        def run(key):
            return compressor.compress_decompress(pts, cols, valid, cfg,
                                                  key, use_pallas=use_pallas)

        try:
            comp, out = run(jax.random.key(0))
            _ = float(jnp.sum(out[0]) + jnp.sum(comp.depth_gp.C))
            times = []
            for i in range(2):
                t0 = time.perf_counter()
                comp, out = run(jax.random.key(i))
                _ = float(jnp.sum(out[0]) + jnp.sum(comp.depth_gp.C))
                times.append(time.perf_counter() - t0)
            wall = min(times)
            rmse = float(compressor.reconstruction_rmse(comp, cfg))
            from gp_compressor_tpu.models import sparse_gp
            szs = sparse_gp.size(comp.depth_gp)
            rec = {"label": label, "eps_tol": eps_tol,
                   "capacity": capacity, "slots": slots,
                   "wall_s": round(wall, 3),
                   "points_per_s": round(bench.N_POINTS / wall, 1),
                   "rmse_m": round(rmse, 4),
                   "mean_bv": round(float(jnp.sum(szs) / jnp.maximum(
                       jnp.sum(szs > 0), 1)), 1),
                   "max_bv": int(jnp.max(szs))}
        except Exception as e:
            rec = {"label": label, "eps_tol": eps_tol,
                   "capacity": capacity, "slots": slots,
                   "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "f32_sweep.json")
    with open(path, "w") as f:
        json.dump({"n_points": bench.N_POINTS,
                   "f64_reference_rmse_m": 0.015, "results": results}, f,
                  indent=1)


if __name__ == "__main__":
    main()
