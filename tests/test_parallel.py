"""Multi-chip sharding tests on the virtual 8-device CPU mesh — the
pattern the reference cannot express at all (single thread, SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gp_compressor_tpu.config import GPConfig, MeshConfig
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.ops.kernels import RBFParams
from gp_compressor_tpu.ops.noise import GaussianNoise
from gp_compressor_tpu.parallel import mesh as mesh_lib

KP = RBFParams(sigmaf_sq=jnp.asarray(100.0), l_sq=jnp.asarray(1.0))


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = mesh_lib.make_mesh(MeshConfig(chain_size=2))
    assert m.devices.shape == (4, 2)
    m1 = mesh_lib.make_mesh(MeshConfig())
    assert m1.devices.shape == (8, 1)


def test_sharded_training_matches_single_device():
    """Patch-axis sharding must not change results: same batched training
    on 8 devices vs 1."""
    cfg = GPConfig(capacity=10, slots=16, dtype=jnp.float64)
    noise = GaussianNoise(s20=jnp.asarray(0.1))
    r = np.random.default_rng(0)
    B, n = 16, 30
    X = jnp.asarray(r.uniform(-5, 5, size=(B, n, 2)))
    Y = jnp.asarray(r.normal(size=(B, n, 1)))
    mask = jnp.ones((B, n), bool)

    ref = sparse_gp.add_points_batch(KP, noise, cfg,
                                     sparse_gp.init_batch(cfg, B), X, Y, mask)

    m = mesh_lib.make_mesh(MeshConfig())
    sh = mesh_lib.patch_sharding(m)
    Xs = jax.device_put(X, sh)
    Ys = jax.device_put(Y, sh)
    ms = jax.device_put(mask, sh)
    states = jax.device_put(sparse_gp.init_batch(cfg, B), sh)

    @jax.jit
    def train(states, X, Y, mask):
        return sparse_gp.add_points_batch(KP, noise, cfg, states, X, Y, mask)

    out = train(states, Xs, Ys, ms)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_global_reduction_over_sharded_patches():
    """A global RMSE over the sharded patch axis (the registration /
    bench reduction) lowers to a cross-device collective and matches the
    unsharded value."""
    cfg = GPConfig(capacity=10, slots=16, dtype=jnp.float64)
    noise = GaussianNoise(s20=jnp.asarray(0.1))
    r = np.random.default_rng(1)
    B, n = 24, 20
    X = jnp.asarray(r.uniform(-5, 5, size=(B, n, 2)))
    Y = jnp.asarray(r.normal(size=(B, n, 1)))
    mask = jnp.ones((B, n), bool)

    m = mesh_lib.make_mesh(MeshConfig())
    sh = mesh_lib.patch_sharding(m)

    @jax.jit
    def train_and_rmse(states, X, Y, mask):
        st = sparse_gp.add_points_batch(KP, noise, cfg, states, X, Y, mask)
        mean, _ = sparse_gp.predict_batch(KP, cfg.s20, st, X)
        return jnp.sqrt(jnp.mean((mean - Y) ** 2))

    ref = train_and_rmse(sparse_gp.init_batch(cfg, B), X, Y, mask)
    out = train_and_rmse(jax.device_put(sparse_gp.init_batch(cfg, B), sh),
                         jax.device_put(X, sh), jax.device_put(Y, sh),
                         jax.device_put(mask, sh))
    assert np.isclose(float(ref), float(out), atol=1e-12)


def test_chain_axis_hmc_sharding():
    """HMC chains shard over the chain axis and sample independently."""
    from gp_compressor_tpu.config import HMCConfig
    from gp_compressor_tpu.inference import hmc

    def logpost(th):
        return -0.5 * jnp.sum(th ** 2)

    m = mesh_lib.make_mesh(MeshConfig(chain_size=2))
    csh = NamedSharding(m, P("chain"))
    theta0 = jax.device_put(jnp.zeros((2, 3)), csh)
    cfg = HMCConfig(num_warmup=50, num_samples=50)
    samples, acc, _ = jax.jit(
        lambda t0, k: hmc.hmc_sample_chains(logpost, t0, k, cfg))(
            theta0, jax.random.key(0))
    assert samples.shape == (2, 50, 3)
    assert np.isfinite(np.asarray(samples)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
