"""End-to-end GP compress -> decompress (the test_gp_compress workload,
src/test_gp_compress.cpp) on a synthetic cloud with quantitative oracles:

  * in-sample depth RMSE small (the commented-out instrumentation of
    src/gp_compressor.cpp:303-315 turned into a real metric)
  * reconstructed cloud geometrically close to the input surfaces
  * reconstructed colors close to input colors
"""

import jax
import jax.numpy as jnp
import numpy as np

from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor

CFG = CompressorConfig(
    patch=PatchConfig(res=0.3, sz=10, max_patches=512, max_points_per_patch=384),
    depth_gp=GPConfig(capacity=60, slots=64, dtype=jnp.float64),
    rgb_gp=rgb_gp_config(slots=64, capacity=60, dtype=jnp.float64),
)


def test_compress_decompress_roundtrip():
    pts, cols = synthetic.room_cloud(n=12000, seed=1)
    pts = jnp.asarray(pts, jnp.float64)
    cols = jnp.asarray(cols, jnp.float64)
    valid = jnp.ones(pts.shape[0], bool)

    comp = compressor.compress(pts, cols, valid, CFG, jax.random.key(0))
    rmse = float(compressor.reconstruction_rmse(comp, CFG))
    # With the reference's hyperparameters (s20=0.1 => noise std 0.32 m,
    # l=1 m >> patch size) the GP smooths heavily, and corner voxels mix
    # two surfaces whose bimodal depth cannot be fit by one 2.5-D patch —
    # those dominate the in-sample RMSE. ~5 cm is the expected operating
    # point of the reference semantics on this scene, not a regression.
    assert rmse < 0.08, rmse

    world, colors, ok, centers, normals, patch_ok = compressor.decompress(comp, CFG)
    world = np.asarray(world)[np.asarray(ok)]
    colors = np.asarray(colors)[np.asarray(ok)]
    assert world.shape[0] > 1000
    assert np.isfinite(world).all()
    assert colors.min() >= 0 and colors.max() <= 255

    # geometric closeness on OCCUPIED grid cells: the reference predicts
    # every cell including unobserved ones (the W check is commented out,
    # src/gp_compressor.cpp:322-325), and those extrapolate to the patch
    # plane far from any surface — so the quantitative check restricts to
    # cells with data (W mask).
    B, G = CFG.patch.max_patches, CFG.patch.sz ** 2
    occ = (np.asarray(comp.patch.W) & np.asarray(ok).reshape(B, G)).reshape(-1)
    wocc = np.asarray(compressor.decompress(comp, CFG)[0])[occ]
    inp = np.asarray(pts)
    sub = wocc[:: max(1, wocc.shape[0] // 500)]
    d = np.sqrt(((sub[:, None, :] - inp[None, :, :]) ** 2).sum(-1)).min(1)
    assert np.median(d) < 0.05, np.median(d)


def test_color_reconstruction_tracks_input():
    pts, cols = synthetic.room_cloud(n=8000, seed=2)
    ptsj = jnp.asarray(pts, jnp.float64)
    colsj = jnp.asarray(cols, jnp.float64)
    valid = jnp.ones(pts.shape[0], bool)
    comp = compressor.compress(ptsj, colsj, valid, CFG, jax.random.key(1))
    world, colors, ok, *_ = compressor.decompress(comp, CFG)
    world = np.asarray(world)[np.asarray(ok)]
    colors = np.asarray(colors)[np.asarray(ok)]
    # for each reconstructed sample, color error vs nearest input point
    sub = slice(0, world.shape[0], max(1, world.shape[0] // 300))
    w, c = world[sub], colors[sub]
    d2 = ((w[:, None, :] - pts[None, :: 5, :]) ** 2).sum(-1)
    nn = d2.argmin(1)
    cerr = np.abs(c - cols[::5][nn]).mean()
    assert cerr < 40.0, cerr  # mean per-channel error under ~40/255


def test_empty_patches_emit_nothing():
    pts, cols = synthetic.room_cloud(n=3000, seed=3)
    ptsj = jnp.asarray(pts, jnp.float64)
    valid = jnp.ones(pts.shape[0], bool)
    comp = compressor.compress(ptsj, jnp.asarray(cols, jnp.float64), valid,
                               CFG, jax.random.key(2))
    world, colors, ok, centers, normals, patch_ok = compressor.decompress(comp, CFG)
    B = CFG.patch.max_patches
    G = CFG.patch.sz ** 2
    ok = np.asarray(ok).reshape(B, G)
    # padding patches beyond n_leaves must be fully masked out
    n = int(comp.patch.n_leaves)
    assert not ok[n:].any()
