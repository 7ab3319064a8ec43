"""Geometric basis preselection vs the f32 novelty cliff (VERDICT r3 next
#6: fixed-constants f32 RMSE 0.0208 vs 0.015 f64, mean_bv 1.01).

Diagnosis: at the reference constants (sigma_f^2=100, l=1 m on 0.15 m
patches) the novelty gamma = k** - k^T Q k cancels ~7 decimal digits, so
f32 must hold eps_tol at ~2.0 — admitting only the single first point per
patch — while f64 at eps_tol=1e-6 keeps 2-3 BVs and reaches 0.015 m. But
the f32 danger is specifically NEAR-DUPLICATE full updates (tiny true
gamma -> 1/gamma blows Q); for geometrically well-separated points the
true gamma is O(0.01-1) and f32 evaluates it fine. So: preselect k
basis points per patch by farthest-point sampling (conditioning-free,
pure geometry), FORCE them into the basis first (per-point eps_tol=-inf),
and project every remaining point sparsely (+inf). Sweeps k and records
in-sample RMSE; writes benchmarks/r4_forced_bv.json.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r4_forced_bv.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import bench
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.ops.noise import GaussianNoise
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4_forced_bv.json")


def fps_indices(X, m, k):
    """Farthest-point sampling of k indices from masked [P, 2] points,
    seeded at the most central point (ties go to the lowest index)."""
    P = X.shape[0]
    d0 = jnp.sum(X * X, axis=-1)
    start = jnp.argmin(jnp.where(m, d0, jnp.inf))
    idx = jnp.full((k,), start, jnp.int32)
    mind = jnp.where(m, jnp.sum((X - X[start]) ** 2, -1), -jnp.inf)

    def body(carry, i):
        idx, mind = carry
        nxt = jnp.argmax(mind).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        d = jnp.sum((X - X[nxt]) ** 2, -1)
        mind = jnp.minimum(mind, jnp.where(m, d, -jnp.inf))
        return (idx, mind), None

    if k > 1:
        (idx, _), _ = lax.scan(body, (idx, mind), jnp.arange(1, k))
    return idx


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from benchmarks.r3_reg_traj import bench_cfg
    cfg = bench_cfg()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)

    batch = compressor.project(pts, cols, valid, cfg)
    dkp, _ = compressor.default_params(cfg)
    noise = GaussianNoise(s20=jnp.asarray(cfg.depth_gp.s20))
    B, P = batch.mask.shape
    results = {"n_points": int(pts.shape[0]), "ks": []}

    @jax.jit
    def baseline_rmse():
        comp = compressor.train(batch, cfg, jax.random.key(0),
                                banks_shuffled=True)
        return compressor.reconstruction_rmse(comp, cfg), \
            jnp.mean(jnp.where(jnp.arange(B) < batch.n_leaves,
                               sparse_gp.size(comp.depth_gp), 0.0)
                     * B / jnp.maximum(batch.n_leaves, 1))

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def forced_rmse(k):
        # FPS-selected points first (forced full), remainder sparse
        sel = jax.vmap(lambda X, m: fps_indices(X, m, k))(
            batch.X, batch.mask)                          # [B, k]
        selmask = jnp.zeros((B, P), bool)
        selmask = jax.vmap(lambda sm, s, m: sm.at[s].set(m[s]))(
            selmask, sel, batch.mask)                     # only valid picks
        order = jnp.argsort(~selmask, axis=1, stable=True)  # selected first
        take = lambda a: jnp.take_along_axis(
            a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1)
        Xo, Yo = take(batch.X), take(batch.y)
        mo = jnp.take_along_axis(batch.mask, order, axis=1)
        so = jnp.take_along_axis(selmask, order, axis=1)
        big = jnp.asarray(3.0e38, batch.X.dtype)
        eps = jnp.where(so, -big, big)
        states = sparse_gp.init_batch(cfg.depth_gp, B)
        states = sparse_gp.add_points_batch(dkp, noise, cfg.depth_gp,
                                            states, Xo, Yo, mo, eps_tol=eps)
        from gp_compressor_tpu.geometry import patches as patches_mod
        probes = patches_mod.prediction_grid(cfg.patch, batch.X.dtype)[::5]
        states, nbad = sparse_gp.sanitize_batch(
            states, dkp, cfg.depth_gp.s20, max_pred=10.0 * cfg.patch.res,
            probes=probes)
        comp = compressor.CompressedCloud(patch=batch, depth_gp=states,
                                          rgb_gp=states)
        rmse = compressor.reconstruction_rmse(comp, cfg)
        mbv = jnp.sum(jnp.where(jnp.arange(B) < batch.n_leaves,
                                sparse_gp.size(states), 0)) \
            / jnp.maximum(batch.n_leaves, 1)
        return rmse, mbv, nbad

    r0, bv0 = baseline_rmse()
    results["baseline_eps2"] = {"rmse_m": round(float(r0), 5),
                                "mean_bv": round(float(bv0), 3)}
    print(json.dumps({"baseline": results["baseline_eps2"]}), flush=True)

    for k in (1, 2, 3, 4, 6, 8):
        t0 = time.perf_counter()
        rmse, mbv, nbad = forced_rmse(k)
        row = {"k": k, "rmse_m": round(float(rmse), 5),
               "mean_bv": round(float(mbv), 3), "sanitized": int(nbad),
               "wall_s": round(time.perf_counter() - t0, 2)}
        results["ks"].append(row)
        print(json.dumps(row), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
