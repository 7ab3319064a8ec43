"""ops.linalg_f32: elementwise-only Cholesky/solves used by the
calibration posterior (the XLA Cholesky HLO's internal blocked matmuls run
at backend-default precision — bf16 on TPU — which the near-rank-1
reference-constant Grams cannot survive; see ops/linalg_f32.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gp_compressor_tpu.ops import linalg_f32


def _spd(n, seed=0, jitter=None):
    r = np.random.default_rng(seed)
    A = r.standard_normal((n, n))
    K = A @ A.T + (jitter if jitter is not None else n) * np.eye(n)
    return K


@pytest.mark.parametrize("n", [1, 5, 48, 64])
def test_cholesky_matches_numpy(n):
    K = _spd(n, seed=n)
    L = np.asarray(linalg_f32.cholesky(jnp.asarray(K)))
    Lref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, Lref, rtol=5e-6, atol=5e-6)


def test_solves_match_numpy():
    n = 48
    K = _spd(n, seed=3)
    L = np.linalg.cholesky(K)
    b = np.random.default_rng(1).standard_normal((n, 4))
    x = np.asarray(linalg_f32.cho_solve(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(K, b), rtol=1e-5,
                               atol=1e-8)
    y = np.asarray(linalg_f32.solve_lower(jnp.asarray(L), jnp.asarray(b)))
    import scipy.linalg as sla
    np.testing.assert_allclose(y, sla.solve_triangular(L, b, lower=True),
                               rtol=1e-5, atol=1e-8)
    y1 = np.asarray(linalg_f32.solve_lower(jnp.asarray(L),
                                           jnp.asarray(b[:, 0])))
    np.testing.assert_allclose(y1, y[:, 0], rtol=1e-6)


def test_indefinite_produces_nan():
    n = 16
    K = _spd(n, seed=2) - 5 * n * np.eye(n)
    L = np.asarray(linalg_f32.cholesky(jnp.asarray(K)))
    assert np.isnan(L).any()


def test_cholesky_gradient_matches_reference():
    """d/dK sum(log diag chol(K)) == 0.5 K^-1 (symmetrized) for symmetric
    perturbations — validates AD through the fori_loop algorithm."""
    n = 12
    K = jnp.asarray(_spd(n, seed=5))

    def f(K):
        return jnp.sum(jnp.log(jnp.diagonal(linalg_f32.cholesky(K))))

    g = np.asarray(jax.grad(f)(K))
    Kinv = np.linalg.inv(np.asarray(K))
    # gradient w.r.t. an unconstrained K feeds only the lower triangle +
    # diagonal; compare action on symmetric perturbations
    r = np.random.default_rng(7)
    for _ in range(3):
        dK = r.standard_normal((n, n))
        dK = (dK + dK.T) / 2
        ana = np.sum(g * dK)
        ref = 0.5 * np.trace(Kinv @ dK)
        np.testing.assert_allclose(ana, ref, rtol=2e-4, atol=1e-7)
