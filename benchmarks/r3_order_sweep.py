"""Round-3 isolation sweep: deterministic bank order vs shuffle-luck.

VERDICT r2 weak #1: at the reference constants only 1-2 points per patch
pass the f32 novelty floor, so the random shuffle decides WHICH points
become basis vectors (headline RMSE 0.0311 +- 0.010 across keys). This
sweep measures each deterministic PatchConfig.bank_order (and the shuffle
baseline) on the exact bench headline configuration, across 3 PRNG keys,
to pick an order that is (a) key-independent and (b) at or below the
0.021 m target without losing throughput.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r3_order_sweep.py
Writes benchmarks/r3_order_sweep.json, one JSON line per config.
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

    grid_cfgs = [(order, eps)
                 for order in ("shuffle", "native", "center_out", "edge_in")
                 for eps in (2.0, 0.5)]
    results = []
    for order, eps_tol in grid_cfgs:
        cfg = CompressorConfig(
            patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                              max_patches=bench.MAX_PATCHES,
                              max_points_per_patch=bench.MAX_PPP,
                              approx_sphere_moments=True,
                              bank_order=order),
            depth_gp=GPConfig(capacity=bench.TPU_CAPACITY,
                              slots=bench.TPU_SLOTS, eps_tol=eps_tol),
            rgb_gp=dataclasses.replace(
                rgb_gp_config(slots=bench.TPU_SLOTS,
                              capacity=bench.TPU_CAPACITY),
                eps_tol=bench.TPU_EPS_TOL),
        )

        def run(key):
            return compressor.compress_decompress(pts, cols, valid, cfg,
                                                  key, use_pallas=use_pallas)

        try:
            comp, out = run(jax.random.key(0))
            _ = float(jnp.sum(out[0]) + jnp.sum(comp.depth_gp.C))
            times, rmses = [], []
            for i in range(3):
                t0 = time.perf_counter()
                comp, out = run(jax.random.key(i))
                _ = float(jnp.sum(out[0]) + jnp.sum(comp.depth_gp.C))
                times.append(time.perf_counter() - t0)
                rmses.append(float(compressor.reconstruction_rmse(comp, cfg)))
            wall = min(times)
            from gp_compressor_tpu.models import sparse_gp
            szs = sparse_gp.size(comp.depth_gp)
            rec = {"order": order, "eps_tol": eps_tol,
                   "wall_s": round(wall, 3),
                   "points_per_s": round(bench.N_POINTS / wall, 1),
                   "rmse_m": [round(r, 4) for r in rmses],
                   "mean_bv": round(float(jnp.sum(szs) / jnp.maximum(
                       jnp.sum(szs > 0), 1)), 2),
                   "max_bv": int(jnp.max(szs))}
        except Exception as e:
            rec = {"order": order, "eps_tol": eps_tol,
                   "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r3_order_sweep.json")
    with open(path, "w") as f:
        json.dump({"n_points": bench.N_POINTS, "results": results}, f,
                  indent=1)


if __name__ == "__main__":
    main()
