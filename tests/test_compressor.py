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


def test_compress_calibrated_improves_heldout_loglik():
    """MAP-calibrated hyperparameters must improve the held-out predictive
    log-likelihood over the reference's fixed constants (in-sample RMSE is
    NOT the criterion — calibration learns honest noise, which smooths)."""
    from gp_compressor_tpu.models import sparse_gp
    from gp_compressor_tpu.workloads import compressor as C

    pts, cols = synthetic.room_cloud(n=9000, seed=11)
    ptsj = jnp.asarray(pts, jnp.float64)
    colsj = jnp.asarray(cols, jnp.float64)
    valid = jnp.ones(pts.shape[0], bool)
    batch = C.project(ptsj, colsj, valid, CFG)
    P = batch.mask.shape[1]
    hold = (jnp.arange(P) % 4) == 0
    m_train = batch.mask & ~hold[None, :]
    m_test = batch.mask & hold[None, :]
    tb = batch._replace(mask=m_train)

    def heldout_ll(comp, cfg, kp):
        dkp, _ = C.default_params(cfg)
        kp = kp if kp is not None else dkp
        ll = jax.vmap(lambda st, x, y, m: jnp.where(
            m, sparse_gp.log_likelihood(kp, cfg.depth_gp.s20, st, x, y),
            0.0))(comp.depth_gp, batch.X, batch.y, m_test)
        return float(jnp.sum(ll) / jnp.maximum(jnp.sum(m_test), 1))

    base = C.train(tb, CFG, jax.random.key(0))
    ll_base = heldout_ll(base, CFG, None)

    comp, kp, s20, cal_cfg = C.compress_calibrated(
        ptsj, colsj, valid, CFG, jax.random.key(0), calib_steps=150)
    # retrain on the same held-out split with calibrated params
    cal = C.train(tb, cal_cfg, jax.random.key(0), depth_kp=kp)
    ll_cal = heldout_ll(cal, cal_cfg, kp)
    assert np.isfinite(ll_cal)
    assert ll_cal > ll_base, (ll_base, ll_cal)


def test_traced_hyperparameter_overrides_match_static_config():
    """train(depth_s20=, depth_eps=) with TRACED values must reproduce the
    program with the same constants baked statically into the config, on
    both the XLA scan path and the Pallas kernel (interpret mode) — the
    plumbing the one-jit calibrated pipeline rides."""
    import dataclasses

    from gp_compressor_tpu.pallas_kernels import sogp_train

    pts, cols = synthetic.room_cloud(n=6000, seed=3)
    ptsj, colsj = jnp.asarray(pts, jnp.float64), jnp.asarray(cols, jnp.float64)
    valid = jnp.ones(pts.shape[0], bool)
    batch = compressor.project(ptsj, colsj, valid, CFG)

    s20, eps = 0.013, 0.37
    static_cfg = dataclasses.replace(CFG, depth_gp=dataclasses.replace(
        CFG.depth_gp, s20=s20, eps_tol=eps))
    a = compressor.train(batch, static_cfg, jax.random.key(5))
    b = compressor.train(batch, CFG, jax.random.key(5),
                         depth_s20=jnp.asarray(s20, jnp.float64),
                         depth_eps=jnp.asarray(eps, jnp.float64))
    np.testing.assert_array_equal(np.asarray(a.depth_gp.active),
                                  np.asarray(b.depth_gp.active))
    np.testing.assert_allclose(np.asarray(a.depth_gp.alpha),
                               np.asarray(b.depth_gp.alpha), rtol=1e-12)

    # Pallas kernel (interpret mode): SMEM param row carries s20/eps_tol
    f32 = lambda t: jax.tree.map(lambda x: jnp.asarray(x, jnp.float32)
                                 if jnp.issubdtype(x.dtype, jnp.floating)
                                 else x, t)
    from gp_compressor_tpu.models import sparse_gp
    cfg32 = dataclasses.replace(CFG.depth_gp, dtype=jnp.float32,
                                s20=s20, eps_tol=eps)
    st0 = sparse_gp.init_batch(cfg32, batch.X.shape[0])
    kp = compressor.default_params(CFG)[0]
    pa = sogp_train.add_points_batch_pallas(
        f32(kp), cfg32, st0, f32(batch.X), f32(batch.y),
        batch.mask, interpret=True)
    pb = sogp_train.add_points_batch_pallas(
        f32(kp), dataclasses.replace(cfg32, s20=0.9, eps_tol=9.9), st0,
        f32(batch.X), f32(batch.y), batch.mask, interpret=True,
        s20=jnp.float32(s20), eps_tol=jnp.float32(eps))
    np.testing.assert_array_equal(np.asarray(pa.active), np.asarray(pb.active))
    np.testing.assert_allclose(np.asarray(pa.alpha), np.asarray(pb.alpha),
                               rtol=1e-6)


def test_fused_calibrated_roundtrip_is_one_jit_and_accurate():
    """compress_decompress_calibrated: the one-dispatch north-star path
    returns a finite reconstruction at least as accurate as the
    fixed-constant path on held-in data, with cm-scale calibrated values."""
    pts, cols = synthetic.room_cloud(n=9000, seed=11)
    ptsj = jnp.asarray(pts, jnp.float64)
    colsj = jnp.asarray(cols, jnp.float64)
    valid = jnp.ones(pts.shape[0], bool)

    comp, kp, s20, out = compressor.compress_decompress_calibrated(
        ptsj, colsj, valid, CFG, jax.random.key(0), calib_steps=300)
    world, colors, vmask = out[0], out[1], out[2]
    assert np.isfinite(np.asarray(world)[np.asarray(vmask)]).all()
    rmse = float(compressor.reconstruction_rmse(comp, CFG, depth_kp=kp,
                                                depth_s20=s20))
    assert np.isfinite(rmse) and rmse < 0.08, rmse
    # calibration must leave the reference's misspecified scale
    # (sigma_f^2 = 100 on cm-amplitude data)
    assert float(kp.sigmaf_sq) < 10.0, float(kp.sigmaf_sq)
    assert float(s20) < 0.1, float(s20)


def test_smc_refine_pose_improves_offset():
    from gp_compressor_tpu.config import MappingConfig, SMCConfig
    from gp_compressor_tpu.workloads import mapping

    pts, cols = synthetic.room_cloud(n=6000, seed=12)
    half = len(pts) // 2
    state = mapping.map_init(CFG, MappingConfig(), [-1, -1, -1], [4, 4, 4],
                             dtype=jnp.float64)
    state, _ = mapping.add_cloud(state, jnp.asarray(pts[:half], jnp.float64),
                                 jnp.asarray(cols[:half], jnp.float64),
                                 jnp.ones(half, bool), CFG, MappingConfig(),
                                 jax.random.key(0))
    offset = np.array([0.015, -0.01, 0.012])
    scan = jnp.asarray(pts[half:] + offset, jnp.float64)
    smc_cfg = SMCConfig(num_particles=128, pose_proposal_std_t=0.006,
                        pose_proposal_std_r=0.002)
    (R, t), st, trace = mapping.smc_refine_pose(
        state, scan, jnp.asarray(cols[half:], jnp.float64),
        jnp.ones(scan.shape[0], bool), CFG, smc_cfg, jax.random.key(1),
        n_iters=10)
    moved = np.asarray(scan @ np.asarray(R).T + np.asarray(t))
    err0 = np.linalg.norm(offset)
    err1 = np.linalg.norm(moved - pts[half:], axis=1).mean()
    assert err1 < err0, (err0, err1)


def test_calib_subsample_stratified_no_duplicates():
    """calib_subsample must select DISTINCT points per patch: a stratified
    stride over the compacted valid rows when the patch has more than n
    points, the plain prefix otherwise (duplicated rows would make the
    calibration Gram exactly singular). Also guards the center_out-order
    bias fix (VERDICT r3: first-n valid rows under ordered banks were the
    n most central points)."""
    from gp_compressor_tpu.geometry.patches import PatchBatch

    B, P, n = 4, 10, 5
    mask = np.zeros((B, P), bool)
    mask[0, :3] = True
    mask[1, :] = True
    mask[2, :7] = True
    X = np.arange(B * P * 2).reshape(B, P, 2).astype(np.float64)
    y = np.arange(B * P).reshape(B, P, 1).astype(np.float64)
    batch = PatchBatch(
        grid=None, rotations=None, means=None, rgb_means=None, W=None,
        X=jnp.asarray(X), y=jnp.asarray(y), rgb=jnp.zeros((B, P, 3)),
        mask=jnp.asarray(mask), counts=jnp.sum(mask, 1).astype(jnp.int32),
        claims=None, n_leaves=jnp.asarray(B))
    Xc, yc, mc = compressor.calib_subsample(batch, B, n)
    counts_sorted = sorted([3, 10, 7, 0], reverse=True)
    for b in range(B):
        sel = np.asarray(Xc[b])[np.asarray(mc[b])]
        assert sel.shape[0] == min(counts_sorted[b], n)
        assert np.unique(sel, axis=0).shape[0] == sel.shape[0]
