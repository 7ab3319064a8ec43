"""Mapping tests: incremental insertion, patch creation thresholds,
pending-evidence accumulation, free-space carving, multi-scan consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from gp_compressor_tpu.config import (CompressorConfig, GPConfig,
                                      MappingConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import mapping
from gp_compressor_tpu.models import sparse_gp

CFG = CompressorConfig(
    patch=PatchConfig(res=0.3, sz=10, max_patches=512, max_points_per_patch=256),
    depth_gp=GPConfig(capacity=40, slots=48, dtype=jnp.float64),
    rgb_gp=rgb_gp_config(slots=48, capacity=40, dtype=jnp.float64),
)
MCFG = MappingConfig(min_points_new_patch=40, max_ray_steps=48)


def _cloud(n, seed):
    pts, cols = synthetic.room_cloud(n=n, seed=seed)
    return (jnp.asarray(pts, jnp.float64), jnp.asarray(cols, jnp.float64),
            jnp.ones(n, bool))


def _fresh_map():
    return mapping.map_init(CFG, MCFG, world_min=[-1.0, -1.0, -1.0],
                            world_max=[4.0, 4.0, 4.0], dtype=jnp.float64)


def test_first_cloud_creates_patches():
    state = _fresh_map()
    pts, cols, valid = _cloud(5000, 0)
    state, info = mapping.add_cloud(state, pts, cols, valid, CFG, MCFG,
                                    jax.random.key(0))
    assert info["n_patches"] > 20
    szs = np.asarray(sparse_gp.size(state.depth_gp))
    created = np.asarray(state.created)
    assert created.sum() > 20
    assert (szs[created] > 0).mean() > 0.9


def test_incremental_insert_grows_gps():
    state = _fresh_map()
    pts, cols, valid = _cloud(4000, 0)
    state, _ = mapping.add_cloud(state, pts, cols, valid, CFG, MCFG,
                                 jax.random.key(0))
    sz1 = np.asarray(sparse_gp.size(state.depth_gp)).sum()
    n1 = int(state.n_patches)
    # second scan of the same scene, no perturbation
    pts2, cols2, valid2 = _cloud(4000, 1)
    state, info = mapping.add_cloud(state, pts2, cols2, valid2, CFG, MCFG,
                                    jax.random.key(1),
                                    rcfg=RegistrationConfig(max_steps=40, step=0.005))
    assert not info["diverged"]
    sz2 = np.asarray(sparse_gp.size(state.depth_gp)).sum()
    assert sz2 >= sz1             # GPs absorb new evidence
    assert int(state.n_patches) >= n1


def test_pending_accumulates_then_creates():
    """Voxels below min_nbr accumulate; once evidence crosses the
    threshold a patch is created (src/gp_mapping.cpp:126)."""
    state = _fresh_map()
    # a small plane patch with ~25 points per scan in one voxel
    r = np.random.default_rng(0)

    def plane_scan(n):
        uv = r.uniform(-0.1, 0.1, size=(n, 2))
        # far from every synthetic-room surface so no existing patch claims it
        pts = np.stack([uv[:, 0] + 1.5, uv[:, 1] + 1.5,
                        np.full(n, 2.5)], -1)
        cols = np.full((n, 3), 128.0)
        return (jnp.asarray(pts, jnp.float64), jnp.asarray(cols, jnp.float64),
                jnp.ones(n, bool))

    # first cloud: min_nbr=1 (constructor path) — use a different region so
    # the plane voxel stays empty
    base, bcols, bvalid = _cloud(2000, 2)
    state, _ = mapping.add_cloud(state, base, bcols, bvalid, CFG, MCFG,
                                 jax.random.key(0))
    n0 = int(state.n_patches)

    p1, c1, v1 = plane_scan(25)
    state, _ = mapping.add_cloud(state, p1, c1, v1, CFG, MCFG,
                                 jax.random.key(1),
                                 rcfg=RegistrationConfig(max_steps=15, step=0.005))
    pend1 = int(np.asarray(state.pend_count).sum())
    assert pend1 > 0              # below threshold: buffered, not created

    p2, c2, v2 = plane_scan(25)
    state, _ = mapping.add_cloud(state, p2, c2, v2, CFG, MCFG,
                                 jax.random.key(2),
                                 rcfg=RegistrationConfig(max_steps=15, step=0.005))
    # 25 + 25 >= 40: the voxel must now be a created patch
    created = np.asarray(state.created)
    assert int(state.n_patches) > n0
    # find the patch near (1, 1, 0.5)
    means = np.asarray(state.means)
    d = np.linalg.norm(means - np.array([1.5, 1.5, 2.5]), axis=1)
    d[~created] = np.inf
    assert d.min() < 0.3, d.min()


def test_free_space_carving_marks_crossed_patches():
    """A ray through the scene marks crossed patches free and the hit
    patch not-free."""
    state = _fresh_map()
    pts, cols, valid = _cloud(5000, 3)
    state, _ = mapping.add_cloud(state, pts, cols, valid, CFG, MCFG,
                                 jax.random.key(0))
    free = np.asarray(state.free)
    W = np.asarray(state.W)
    created = np.asarray(state.created)
    # camera at origin inside the room: some cells must be carved free
    assert free[created].sum() > 0
    # hit cells (occupied) are predominantly NOT free
    occupied_and_free = (free & W)[created].sum()
    occupied = W[created].sum()
    assert occupied_and_free < 0.35 * occupied


def test_map_cloud_prediction():
    state = _fresh_map()
    pts, cols, valid = _cloud(4000, 4)
    state, _ = mapping.add_cloud(state, pts, cols, valid, CFG, MCFG,
                                 jax.random.key(0))
    w, c, ok = mapping.map_cloud(state, CFG)
    w = np.asarray(w)[np.asarray(ok)]
    assert w.shape[0] > 500
    assert np.isfinite(w).all()


def test_occupancy_channel():
    """The probit occupancy GP (completed unfinished reference feature)
    must separate occupied from carved-free cells."""
    state = _fresh_map()
    pts, cols, valid = _cloud(5000, 7)
    state, _ = mapping.add_cloud(state, pts, cols, valid, CFG, MCFG,
                                 jax.random.key(0))
    occ = mapping.train_occupancy(state, CFG, jax.random.key(1))
    import jax.numpy as jnp
    from gp_compressor_tpu.geometry import patches as pm
    grid_uv = pm.prediction_grid(CFG.patch, state.means.dtype)
    B = state.W.shape[0]
    p = np.asarray(mapping.predict_occupancy(
        occ, CFG, jnp.broadcast_to(grid_uv, (B,) + grid_uv.shape)))
    W = np.asarray(state.W)
    free = np.asarray(state.free)
    created = np.asarray(state.created)
    hit = W & ~free & created[:, None]
    carved = free & ~W & created[:, None]
    if hit.sum() > 50 and carved.sum() > 50:
        assert p[hit].mean() > p[carved].mean() + 0.1, (
            p[hit].mean(), p[carved].mean())
