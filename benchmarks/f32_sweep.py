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

    results = []
    for eps_tol, capacity, slots in [
        (2.0, 30, 32), (1.0, 30, 32), (0.5, 30, 32),
        (1.0, 44, 48), (0.5, 44, 48), (0.25, 44, 48), (0.5, 60, 64),
    ]:
        cfg = CompressorConfig(
            patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                              max_patches=bench.MAX_PATCHES,
                              max_points_per_patch=bench.MAX_PPP,
                              approx_sphere_moments=True),
            depth_gp=GPConfig(capacity=capacity, slots=slots,
                              eps_tol=eps_tol),
            rgb_gp=dataclasses.replace(
                rgb_gp_config(slots=slots, capacity=capacity),
                eps_tol=eps_tol),
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
            rec = {"eps_tol": eps_tol, "capacity": capacity, "slots": slots,
                   "wall_s": round(wall, 3),
                   "points_per_s": round(bench.N_POINTS / wall, 1),
                   "rmse_m": round(rmse, 4),
                   "mean_bv": round(float(jnp.sum(szs) / jnp.maximum(
                       jnp.sum(szs > 0), 1)), 1),
                   "max_bv": int(jnp.max(szs))}
        except Exception as e:
            rec = {"eps_tol": eps_tol, "capacity": capacity, "slots": slots,
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
