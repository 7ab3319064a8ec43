"""Registration tests: recover a known rigid perturbation (the
test_gp_accuracy protocol, src/test_gp_accuracy.cpp, with synthetic ground
truth instead of TUM trajectories)."""

import jax
import jax.numpy as jnp
import numpy as np

from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.geometry import transforms
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor, registration

CFG = CompressorConfig(
    patch=PatchConfig(res=0.3, sz=10, max_patches=512, max_points_per_patch=256),
    depth_gp=GPConfig(capacity=60, slots=64, dtype=jnp.float64),
    rgb_gp=rgb_gp_config(slots=64, capacity=60, dtype=jnp.float64),
)


def _map_and_scan(n=9000, seed=4):
    pts, cols = synthetic.room_cloud(n=n, seed=seed)
    half = n // 2
    return ((jnp.asarray(pts[:half], jnp.float64),
             jnp.asarray(cols[:half], jnp.float64)),
            (pts[half:], cols[half:]))


def test_gradient_points_toward_alignment():
    """For a small pure translation, one gradient evaluation must point
    (mostly) back toward the map."""
    (mpts, mcols), (spts_np, scols_np) = _map_and_scan()
    comp = compressor.compress(mpts, mcols, jnp.ones(mpts.shape[0], bool),
                               CFG, jax.random.key(0))
    offset = np.array([0.03, -0.02, 0.015])
    spts = jnp.asarray(spts_np + offset, jnp.float64)
    scols = jnp.asarray(scols_np, jnp.float64)
    delta, ls, cls, n_used = registration.compute_transformation(
        comp, spts, scols, jnp.ones(spts.shape[0], bool), CFG,
        RegistrationConfig())
    d = np.asarray(delta[:3])
    assert int(n_used) > 1000
    # gradient ascent on likelihood should push opposite to the offset
    cos = d @ (-offset) / (np.linalg.norm(d) * np.linalg.norm(offset))
    assert cos > 0.4, (d, cos)


def test_registration_recovers_small_transform():
    (mpts, mcols), (spts_np, scols_np) = _map_and_scan()
    comp = compressor.compress(mpts, mcols, jnp.ones(mpts.shape[0], bool),
                               CFG, jax.random.key(0))
    # ground-truth perturbation: a few mm/cm and ~1 degree
    spts_t, R_true = synthetic.rigid_transform(spts_np, [0.00, 0.01, -0.008],
                                               [0.02, -0.015, 0.01])
    t_true = np.array([0.02, -0.015, 0.01])
    spts = jnp.asarray(spts_t, jnp.float64)
    scols = jnp.asarray(scols_np, jnp.float64)

    # the reference's step=0.1 is tuned to TUM scans; on this synthetic
    # scene the density-gradient scale needs a smaller step to be stable
    rcfg = RegistrationConfig(max_steps=150, step=0.005)
    state, aligned = registration.register(
        comp, spts, scols, jnp.ones(spts.shape[0], bool), CFG, rcfg)

    err0 = np.linalg.norm(spts_t - spts_np, axis=1).mean()
    err1 = np.linalg.norm(np.asarray(aligned) - spts_np, axis=1).mean()
    assert int(state.step_nbr) > 10
    # alignment must reduce the mean point error substantially
    assert err1 < 0.5 * err0, (err0, err1)


def test_registration_identity_stays_put():
    """Registering an unperturbed scan must not walk away."""
    (mpts, mcols), (spts_np, scols_np) = _map_and_scan(seed=6)
    comp = compressor.compress(mpts, mcols, jnp.ones(mpts.shape[0], bool),
                               CFG, jax.random.key(0))
    spts = jnp.asarray(spts_np, jnp.float64)
    rcfg = RegistrationConfig(max_steps=60, step=0.005)
    state, aligned = registration.register(
        comp, spts, jnp.asarray(scols_np, jnp.float64),
        jnp.ones(spts.shape[0], bool), CFG, rcfg)
    drift = np.linalg.norm(np.asarray(aligned) - spts_np, axis=1).mean()
    assert drift < 0.02, drift
