"""Geometric-novelty headline sweep (VERDICT r3 next #6).

Runs the full one-jit compress_decompress at the bench operating point
with GPConfig.novelty_mode="geometric" over (geom_dmin, geom_max_bv,
geom_gamma_min_rel), recording in-sample RMSE, mean BV count, throughput,
and the PRNG-key spread (should be exactly 0: deterministic center-out
banks + deterministic admission). Baseline row = the r3 gamma-mode
headline (eps_tol=2.0). Writes benchmarks/r4_geom_novelty.json.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r4_geom_novelty.py
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
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4_geom_novelty.json")


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from benchmarks.r3_reg_traj import bench_cfg
    base_cfg = bench_cfg()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    use_pallas = jax.devices()[0].platform != "cpu"
    results = {"n_points": int(pts.shape[0]), "rows": []}

    def run(cfg, tag, keys=(0, 1), geom=None):
        walls, rmses, mbvs = [], [], []
        for kseed in keys:
            comp, out = compressor.compress_decompress(
                pts, cols, valid, cfg, jax.random.key(kseed),
                use_pallas=use_pallas, geom=geom)
            rmse = compressor.reconstruction_rmse(comp, cfg)
            float(jnp.sum(out[0]))                     # force execution
            t0 = time.perf_counter()
            comp, out = compressor.compress_decompress(
                pts, cols, valid, cfg, jax.random.key(kseed),
                use_pallas=use_pallas, geom=geom)
            rmse = compressor.reconstruction_rmse(comp, cfg)
            r = float(rmse)
            walls.append(time.perf_counter() - t0)
            rmses.append(r)
            B = comp.patch.mask.shape[0]
            nl = float(comp.patch.n_leaves)
            mbv = float(jnp.sum(jnp.where(jnp.arange(B) < comp.patch.n_leaves,
                                          sparse_gp.size(comp.depth_gp), 0))
                        ) / max(nl, 1)
            mbvs.append(mbv)
        row = {"tag": tag, "rmse_m": round(float(np.mean(rmses)), 5),
               "rmse_spread": round(float(np.max(rmses) - np.min(rmses)), 6),
               "mean_bv": round(float(np.mean(mbvs)), 3),
               "wall_s": round(float(np.min(walls)), 4),
               "points_per_s": round(bench.N_POINTS / float(np.min(walls)), 1)}
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
        return row

    run(base_cfg, "baseline_gamma_eps2")

    # ONE static geometric config; the (dmin, max_bv, gamma_min) knobs are
    # TRACED overrides riding the kernel's SMEM row, so the whole grid
    # shares a single compile
    geo_cfg = dataclasses.replace(
        base_cfg,
        depth_gp=dataclasses.replace(base_cfg.depth_gp,
                                     novelty_mode="geometric"),
        rgb_gp=dataclasses.replace(base_cfg.rgb_gp,
                                   novelty_mode="geometric"))
    for dmin, max_bv, gmin in (
            (0.04, 2, 1e-2), (0.05, 2, 1e-2), (0.08, 2, 1e-2),
            (0.11, 2, 1e-2), (0.04, 3, 1e-2), (0.05, 3, 1e-2),
            (0.08, 3, 1e-2), (0.05, 3, 2e-2), (0.05, 4, 1e-2),
            (0.04, 3, 5e-3), (0.05, 6, 1e-2)):
        geom = (jnp.asarray(dmin, jnp.float32),
                jnp.asarray(max_bv, jnp.float32),
                jnp.asarray(gmin, jnp.float32))
        run(geo_cfg, f"geom_d{dmin}_k{max_bv}_g{gmin}", geom=geom)

    # far_center bank order + geometric admission = streaming FPS-2:
    # the first two bank rows are each patch's extreme pair
    fps_cfg = dataclasses.replace(
        geo_cfg, patch=dataclasses.replace(geo_cfg.patch,
                                           bank_order="far_center"))
    for dmin, max_bv, gmin in (
            (0.05, 2, 1e-2), (0.05, 2, 5e-3), (0.08, 2, 1e-2),
            (0.05, 3, 1e-2), (0.05, 3, 5e-3), (0.08, 3, 1e-2)):
        geom = (jnp.asarray(dmin, jnp.float32),
                jnp.asarray(max_bv, jnp.float32),
                jnp.asarray(gmin, jnp.float32))
        run(fps_cfg, f"fps_d{dmin}_k{max_bv}_g{gmin}", geom=geom)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
