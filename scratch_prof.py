import dataclasses, functools, time
import numpy as np
import jax, jax.numpy as jnp

from gp_compressor_tpu.config import CompressorConfig, GPConfig, PatchConfig, rgb_gp_config
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.geometry import patches as P, voxel, rotation
from gp_compressor_tpu.workloads import compressor

N_POINTS = 300_000
RES, SZ = 0.15, 20
cfg = CompressorConfig(
    patch=PatchConfig(res=RES, sz=SZ, max_patches=4096,
                      max_points_per_patch=256, approx_sphere_moments=True),
    depth_gp=GPConfig(capacity=30, slots=32, eps_tol=2.0),
    rgb_gp=dataclasses.replace(rgb_gp_config(slots=32, capacity=30), eps_tol=2.0),
)
pcfg = cfg.patch
B = pcfg.max_patches

pts_np, cols_np = synthetic.room_cloud(n=N_POINTS, seed=0)
pts = jnp.asarray(pts_np); cols = jnp.asarray(cols_np)
valid = jnp.ones(pts.shape[0], bool)
key = jax.random.key(0)

def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms")
    return out

@jax.jit
def f_grid(pts, valid):
    return voxel.build_grid(pts, valid, pcfg.res, pcfg.max_patches, pcfg.max_cells)

grid = timeit("build_grid", f_grid, pts, valid)

@jax.jit
def f_claim(pts, valid):
    return P.claim_points(pts, valid, pcfg)

_, R, _, claim, loc_claim, claimed = timeit("claim_points (p1+p2)", f_claim, pts, valid)

N = N_POINTS

@jax.jit
def f_eigh_only(M):
    cnt = M[:, 3, 3].astype(jnp.int32)
    return rotation.rotation_from_moment_batch(M, cnt, pcfg.min_points_for_rotation)

M = jax.random.normal(jax.random.key(3), (B, 4, 4))
M = M @ M.transpose(0, 2, 1)
timeit("rotation_from_moment (eigh)", f_eigh_only, M)

@jax.jit
def f_pass3(claim, claimed, loc_claim, cols):
    Pn = pcfg.max_points_per_patch
    dt = loc_claim.dtype
    order = jnp.argsort(jnp.where(claimed, claim, B), stable=True)
    sc = jnp.where(claimed, claim, B)[order]
    first = jnp.searchsorted(sc, sc, side='left')
    rank_sorted = jnp.arange(N) - first
    rank = jnp.zeros(N, jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))
    tgt_ok = claimed & (rank < Pn)
    flat = jnp.where(tgt_ok, claim * Pn + rank, B * Pn)
    Xb = jnp.zeros((B * Pn, 2), dt).at[flat].set(
        jnp.where(tgt_ok[:, None], loc_claim[:, 1:], 0.0), mode='drop')
    cb = jnp.zeros((B * Pn, 3), dt).at[flat].set(
        jnp.where(tgt_ok[:, None], cols, 0.0), mode='drop')
    mb = jnp.zeros((B * Pn,), bool).at[flat].set(tgt_ok, mode='drop')
    return Xb, cb, mb

timeit("pass3: rank+scatter", f_pass3, claim, claimed, loc_claim, cols)

proj = functools.partial(compressor.project, cfg=cfg)
batch = timeit("project full", proj, pts, cols, valid)
trainf = lambda b: compressor.train(b, cfg, key, use_pallas=True)
comp = timeit("train (pallas)", trainf, batch)
dec = lambda c: compressor.decompress(c, cfg)
out = timeit("decompress", dec, comp)
print("device:", jax.devices()[0])
