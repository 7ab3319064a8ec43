"""Decompose the fixed-constants f32 quality gap (0.0208 f32 vs 0.015
f64): is it BASIS SIZE (f64's eps_tol=1e-6 keeps 2-3 BVs, f32's noise
floor keeps ~1) or STATE PRECISION (the Csato recursion's alpha/C drift
over ~160 f32 sparse updates per patch)?

Four rows on the bench cloud at the bench operating point (CPU, XLA
path): f64/eps=1e-6 (the r1 reference row), f64/eps=2.0 (f64 precision,
f32's basis), f32/eps=2.0 (the bench headline semantics), f32 with the
streaming geometric 2-BV admission. If f64/eps=2.0 ~ 0.015, precision is
the whole gap and more f32 BVs can never close it (bury); if it ~ 0.021,
the basis is the gap and basis-selection work matters.
Writes benchmarks/r4_gap_decompose.json.

Runs on CPU (x64): JAX_PLATFORMS=cpu python benchmarks/r4_gap_decompose.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import bench
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4_gap_decompose.json")


def main():
    from benchmarks.r3_reg_traj import bench_cfg
    base = bench_cfg()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    valid_np = np.ones(pts_np.shape[0], bool)
    results = {"n_points": int(pts_np.shape[0]), "rows": []}

    def run(tag, dtype, eps, novelty="gamma", geom=(0.05, 2, 1e-2)):
        cfg = dataclasses.replace(
            base,
            depth_gp=dataclasses.replace(
                base.depth_gp, dtype=dtype, eps_tol=eps,
                novelty_mode=novelty, geom_dmin=geom[0],
                geom_max_bv=geom[1], geom_gamma_min_rel=geom[2]),
            rgb_gp=dataclasses.replace(base.rgb_gp, dtype=dtype))
        pdt = jnp.float64 if dtype == jnp.float64 else jnp.float32
        pts = jnp.asarray(pts_np, pdt)
        cols = jnp.asarray(cols_np, pdt)
        valid = jnp.asarray(valid_np)
        t0 = time.perf_counter()
        comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                                 jax.random.key(0))
        rmse = float(compressor.reconstruction_rmse(comp, cfg))
        wall = time.perf_counter() - t0
        B = comp.patch.mask.shape[0]
        nl = float(comp.patch.n_leaves)
        mbv = float(jnp.sum(jnp.where(jnp.arange(B) < comp.patch.n_leaves,
                                      sparse_gp.size(comp.depth_gp), 0))
                    ) / max(nl, 1)
        row = {"tag": tag, "rmse_m": round(rmse, 5),
               "mean_bv": round(mbv, 3), "wall_s": round(wall, 1)}
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    run("f32_eps2", jnp.float32, 2.0)
    run("f64_eps2", jnp.float64, 2.0)
    run("f64_eps1e6", jnp.float64, 1e-6)
    run("f32_geom_2bv", jnp.float32, 2.0, novelty="geometric")
    run("f64_geom_2bv", jnp.float64, 2.0, novelty="geometric")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
