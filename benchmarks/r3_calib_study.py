"""Calibration subsample study (VERDICT r2 weak #7 / item 4): how do the
MAP posterior mode and the downstream reconstruction RMSE move with the
number of calibration patches? Runs the full one-jit calibrated round trip
at calib_patches in {16, 32, 64, 128} (n=64 points each, stratified
calib_subsample) and records theta, RMSE, and wall. Writes
benchmarks/r3_calib_study.json.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r3_calib_study.py
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
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    use_pallas = jax.devices()[0].platform != "cpu"

    cfg = CompressorConfig(
        patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                          max_patches=bench.MAX_PATCHES,
                          max_points_per_patch=bench.MAX_PPP,
                          approx_sphere_moments=True,
                          bank_order="center_out"),
        depth_gp=GPConfig(capacity=bench.TPU_CAPACITY, slots=bench.TPU_SLOTS,
                          eps_tol=bench.TPU_EPS_TOL),
        rgb_gp=dataclasses.replace(
            rgb_gp_config(slots=bench.TPU_SLOTS, capacity=bench.TPU_CAPACITY),
            eps_tol=bench.TPU_EPS_TOL),
    )

    results = []
    for Bc in (16, 32, 64, 128):
        def run(key):
            return compressor.compress_decompress_calibrated(
                pts, cols, valid, cfg, key, use_pallas=use_pallas,
                calib_patches=Bc, calib_points=64, calib_steps=150,
                calib_lr=0.1, calib_starts=4)

        try:
            c, kp, s20, out = run(jax.random.key(0))
            _ = float(jnp.sum(out[0]))
            times = []
            for i in range(2):
                t0 = time.perf_counter()
                c, kp, s20, out = run(jax.random.key(i + 1))
                _ = float(jnp.sum(out[0]))
                times.append(time.perf_counter() - t0)
            wall = min(times)
            rmse = float(compressor.reconstruction_rmse(c, cfg, depth_kp=kp,
                                                        depth_s20=s20))
            rec = {"calib_patches": Bc, "wall_s": round(wall, 3),
                   "points_per_s": round(bench.N_POINTS / wall, 1),
                   "rmse_m": round(rmse, 4),
                   "sigmaf_sq": round(float(kp.sigmaf_sq), 6),
                   "l_sq": round(float(kp.l_sq), 6),
                   "s20": round(float(s20), 6)}
        except Exception as e:
            rec = {"calib_patches": Bc, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r3_calib_study.json")
    with open(path, "w") as f:
        json.dump({"n_points": bench.N_POINTS, "calib_points": 64,
                   "calib_steps": 150, "calib_starts": 4,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
