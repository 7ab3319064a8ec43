"""Pallas fused-training kernel parity vs the XLA scan path (interpret
mode on CPU; the real compile is exercised by bench.py on TPU).

Two regimes: a strict microtest with no deletion churn (results must agree
to float32 accumulation error), and the realistic smooth-surface regime
where per-op rounding differences can flip chaotic deletion choices in a
few patches — there parity is statistical (sizes, median prediction
agreement, equal reconstruction quality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_compressor_tpu.config import GPConfig
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.ops.kernels import RBFParams
from gp_compressor_tpu.ops.noise import GaussianNoise
from gp_compressor_tpu.pallas_kernels import sogp_train

KP = RBFParams(sigmaf_sq=jnp.asarray(100.0, jnp.float32),
               l_sq=jnp.asarray(1.0, jnp.float32))
NOISE = GaussianNoise(s20=jnp.asarray(0.1, jnp.float32))


def _run_both(cfg, X, Y, mask):
    ref = sparse_gp.add_points_batch(KP, NOISE, cfg,
                                     sparse_gp.init_batch(cfg, X.shape[0]),
                                     X, Y, mask)
    out = sogp_train.add_points_batch_pallas(
        KP, cfg, sparse_gp.init_batch(cfg, X.shape[0]), X, Y, mask,
        interpret=True)
    return ref, out


@pytest.mark.parametrize("dout", [1, 3])
def test_strict_parity_no_churn(dout):
    """Well-separated points, capacity ample: no deletions, branch
    decisions robust — states must agree to f32 accumulation error."""
    r = np.random.default_rng(0)
    B, P = 130, 12
    cfg = GPConfig(capacity=14, slots=16, dout=dout, eps_tol=1e-4,
                   dtype=jnp.float32)
    X = jnp.asarray(r.uniform(-20, 20, size=(B, P, 2)), jnp.float32)
    Y = jnp.asarray(r.normal(size=(B, P, dout)), jnp.float32)
    mask = jnp.asarray(r.uniform(size=(B, P)) > 0.2)
    ref, out = _run_both(cfg, X, Y, mask)
    assert np.array_equal(np.asarray(ref.active), np.asarray(out.active))
    for name, a, b in [("bv", ref.bv, out.bv), ("alpha", ref.alpha, out.alpha),
                       ("C", ref.C, out.C), ("Q", ref.Q, out.Q)]:
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                           rtol=1e-3), name


def test_statistical_parity_realistic_regime():
    """Smooth depth surfaces with capacity churn: both paths must deliver
    the same BV budgets and equally good posteriors."""
    r = np.random.default_rng(3)
    B, P = 140, 80
    cfg = GPConfig(capacity=8, slots=16, dout=1, eps_tol=2.0,
                   dtype=jnp.float32)
    X = jnp.asarray(r.uniform(-0.075, 0.075, size=(B, P, 2)), jnp.float32)
    f = 0.03 * np.sin(8 * np.asarray(X[..., 0])) \
        + 0.02 * np.cos(11 * np.asarray(X[..., 1]))
    Y = jnp.asarray((f + 0.004 * r.standard_normal((B, P)))[..., None],
                    jnp.float32)
    mask = jnp.ones((B, P), bool)
    ref, out = _run_both(cfg, X, Y, mask)

    sa = np.asarray(sparse_gp.size(ref))
    sb = np.asarray(sparse_gp.size(out))
    assert (sa == sb).mean() > 0.9
    m1, _ = sparse_gp.predict_batch(KP, cfg.s20, ref, X)
    m2, _ = sparse_gp.predict_batch(KP, cfg.s20, out, X)
    rmse1 = float(jnp.sqrt(jnp.mean((m1 - Y) ** 2)))
    rmse2 = float(jnp.sqrt(jnp.mean((m2 - Y) ** 2)))
    assert abs(rmse1 - rmse2) < 0.2 * max(rmse1, 1e-3), (rmse1, rmse2)
    d = np.abs(np.asarray(m1) - np.asarray(m2))
    assert np.median(d) < 5e-3, np.median(d)


def test_geometric_novelty_parity_and_selection():
    """GPConfig.novelty_mode='geometric': both paths must admit the same
    (farthest-point-style) basis and agree on the resulting state; the
    admitted BVs must respect the separation and budget rules."""
    r = np.random.default_rng(7)
    B, P = 130, 40
    res = 0.15
    cfg = GPConfig(capacity=14, slots=16, dout=1, dtype=jnp.float32,
                   novelty_mode="geometric", geom_dmin=0.05, geom_max_bv=3,
                   geom_gamma_min_rel=1e-2)
    half = res / 2
    X = jnp.asarray(r.uniform(-half, half, size=(B, P, 2)), jnp.float32)
    Y = jnp.asarray(0.01 * r.normal(size=(B, P, 1)), jnp.float32)
    mask = jnp.asarray(r.uniform(size=(B, P)) > 0.1)
    ref, out = _run_both(cfg, X, Y, mask)
    assert np.array_equal(np.asarray(ref.active), np.asarray(out.active))
    # a gamma within f32 rounding of the admission floor can flip between
    # the two paths' summation orders (knife-edge, same as the capacity
    # churn caveat above): require identical BV picks on >= 95% of patches
    # and strict state agreement there
    same = np.all(np.asarray(ref.bv) == np.asarray(out.bv), axis=(1, 2))
    assert same.mean() >= 0.95, same.mean()
    # at sf=100/l=1 conditioning the recursion amplifies per-op rounding
    # order differences through the state, so raw-state comparison is
    # meaningless; compare what reaches users — predictions on the
    # footprint — on the same-decision patches
    probes = jnp.asarray(r.uniform(-half, half, size=(24, 2)), jnp.float32)
    Bp = jnp.broadcast_to(probes, (B, 24, 2))
    m_ref, v_ref = sparse_gp.predict_batch(KP, cfg.s20, ref, Bp)
    m_out, v_out = sparse_gp.predict_batch(KP, cfg.s20, out, Bp)
    dm = np.abs(np.asarray(m_ref)[same] - np.asarray(m_out)[same])
    assert np.median(dm) < 1e-3, np.median(dm)
    assert dm.max() < 2e-2, dm.max()     # well under the 0.01 data scale
    # equally good in-sample fits on the training points
    tm_ref, _ = sparse_gp.predict_batch(KP, cfg.s20, ref, X)
    tm_out, _ = sparse_gp.predict_batch(KP, cfg.s20, out, X)
    mask_np = np.asarray(mask)
    e_ref = np.sqrt(np.mean((np.asarray(tm_ref)[..., 0] -
                             np.asarray(Y)[..., 0])[mask_np] ** 2))
    e_out = np.sqrt(np.mean((np.asarray(tm_out)[..., 0] -
                             np.asarray(Y)[..., 0])[mask_np] ** 2))
    assert abs(e_ref - e_out) < 0.1 * max(e_ref, e_out), (e_ref, e_out)
    # no divergence anywhere, either path
    for st in (ref, out):
        for leaf in (st.alpha, st.C, st.Q):
            assert np.isfinite(np.asarray(leaf)).all()
    # selection invariants: budget respected, pairwise separation >= dmin
    sizes = np.asarray(sparse_gp.size(ref))
    assert sizes.max() <= cfg.geom_max_bv
    assert sizes.min() >= 1           # every patch has valid points
    bv = np.asarray(ref.bv)
    act = np.asarray(ref.active)
    for b_ in range(B):
        pts = bv[b_][act[b_]]
        if len(pts) >= 2:
            d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            assert d.min() >= cfg.geom_dmin - 1e-6


def test_traced_geom_override_matches_static_config():
    """The traced (dmin, max_bv, gamma_min) SMEM overrides must reproduce
    the static-config geometric mode bit-for-bit (sweeps rely on this to
    share one compile)."""
    r = np.random.default_rng(3)
    B, P = 130, 24
    cfg = GPConfig(capacity=14, slots=16, dout=1, dtype=jnp.float32,
                   novelty_mode="geometric", geom_dmin=0.05, geom_max_bv=3,
                   geom_gamma_min_rel=1e-2)
    X = jnp.asarray(r.uniform(-0.075, 0.075, size=(B, P, 2)), jnp.float32)
    Y = jnp.asarray(0.01 * r.normal(size=(B, P, 1)), jnp.float32)
    mask = jnp.ones((B, P), bool)
    st_static = sogp_train.add_points_batch_pallas(
        KP, cfg, sparse_gp.init_batch(cfg, B), X, Y, mask, interpret=True)
    geom = (jnp.asarray(0.05, jnp.float32), jnp.asarray(3.0, jnp.float32),
            jnp.asarray(1e-2, jnp.float32))
    st_traced = sogp_train.add_points_batch_pallas(
        KP, cfg, sparse_gp.init_batch(cfg, B), X, Y, mask, interpret=True,
        geom=geom)
    for a, b in zip(jax.tree.leaves(st_static), jax.tree.leaves(st_traced)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
