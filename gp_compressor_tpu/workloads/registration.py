"""Scan-to-map rigid registration by gradient ascent on the GP likelihood.

Reference: gp_registration (src/gp_registration.cpp). The map is a
compressed cloud (patch GPs); each step re-bins the scan into the map's
voxel structure, computes per-point gradients of the predictive *density*
w.r.t. the point's local coordinates (likelihood_dx,
src/sparse_gp.hpp:478-508), rotates them to world, chains through the
6-DoF twist Jacobian J = [I | -[x]_x] (src/gp_registration.cpp:40-49),
takes the running mean into P, and applies the small-angle step
R = Rx Ry Rz, t = step * delta (src/gp_registration.cpp:51-58,73-92) until
convergence (>10 steps and (>=300 steps or both gradient norms < 0.1),
src/gp_registration.cpp:67-71).

TPU-native: the serial leaf loop becomes one batched pass — scan points are
first-claim assigned to existing patches with the same argmin-over-
candidates logic as compression, per-patch point banks feed a vmap of
`jax.grad` over the predictive density, and the running mean is one global
(psum-able) reduction. The whole registration loop runs under
`lax.while_loop` in a single jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gp_compressor_tpu.config import CompressorConfig, RegistrationConfig
from gp_compressor_tpu.geometry import transforms, voxel
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.ops.kernels import RBFParams
from gp_compressor_tpu.workloads.compressor import CompressedCloud, default_params


class RegistrationState(NamedTuple):
    R_cloud: jnp.ndarray     # [3, 3] accumulated rotation
    t_cloud: jnp.ndarray     # [3] accumulated translation
    delta: jnp.ndarray       # [6] last gradient (t, omega)
    step_nbr: jnp.ndarray    # int32
    mean_likelihood: jnp.ndarray
    mean_color_likelihood: jnp.ndarray


def init_state(dtype=jnp.float32) -> RegistrationState:
    return RegistrationState(
        R_cloud=jnp.eye(3, dtype=dtype), t_cloud=jnp.zeros(3, dtype),
        delta=jnp.zeros(6, dtype), step_nbr=jnp.asarray(0, jnp.int32),
        mean_likelihood=jnp.asarray(0.0, dtype),
        mean_color_likelihood=jnp.asarray(0.0, dtype))


def claim_to_patches(grid, rotations, means, trained, points, valid, res,
                     leaf_ids=None):
    """Assign scan points to existing patches: candidate = 27-neighbour
    leaf whose search sphere (around the VOXEL center) contains the point
    and whose patch-frame clip passes (get_local_points,
    src/gp_registration.cpp:94-113); claim = first passing leaf in *leaf
    order* (the octree's key order); patches with an empty GP never claim
    (src/gp_registration.cpp:158).

    `leaf_ids` optionally translates a sorted-key slot to a stable gp_index
    (identity for the compressor, insertion order for the mapping workload).
    Returns (gp_index claim [N], local coords [N, 3], claimed [N]).
    """
    B = rotations.shape[0]
    N = points.shape[0]
    dt = points.dtype
    half = jnp.asarray(res, dt) / 2.0

    best = jnp.full((N,), B, jnp.int32)       # sorted-slot of the claim
    loc_claim = jnp.zeros((N, 3), dt)
    offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               for dz in (-1, 0, 1)]
    for off in offsets:
        idx, ok, _ = voxel.candidate_at_offset(grid, points, valid, off)
        gid = idx if leaf_ids is None else leaf_ids[idx]
        ok = ok & trained[gid]
        Rk = rotations[gid]
        rel = points - means[gid]
        loc = jnp.einsum('nji,nj->ni', Rk, rel)
        clip_ok = ((loc[:, 1] <= half) & (loc[:, 1] >= -half)
                   & (loc[:, 2] <= half) & (loc[:, 2] >= -half))
        better = ok & clip_ok & (idx < best)
        best = jnp.where(better, idx, best)
        loc_claim = jnp.where(better[:, None], loc, loc_claim)
    claimed = best < B
    safe = jnp.minimum(best, B - 1)
    gclaim = safe if leaf_ids is None else leaf_ids[safe]
    gclaim = jnp.where(claimed, gclaim, B).astype(jnp.int32)
    return gclaim, loc_claim, claimed


def _claim_to_map(comp: CompressedCloud, points: jnp.ndarray,
                  valid: jnp.ndarray, cfg: CompressorConfig):
    batch = comp.patch
    trained = sparse_gp.size(comp.depth_gp) > 0                 # [B]
    return claim_to_patches(batch.grid, batch.rotations, batch.means,
                            trained, points, valid, cfg.patch.res)


def _bank_points(claim, loc, colors, claimed, B, P):
    """Scatter claimed points into [B, P] banks (same ranking trick as the
    compression front-end)."""
    N = claim.shape[0]
    order = jnp.argsort(jnp.where(claimed, claim, B), stable=True)
    sc = jnp.where(claimed, claim, B)[order]
    first = jnp.searchsorted(sc, sc, side='left')
    rank = jnp.zeros(N, jnp.int32).at[order].set(
        (jnp.arange(N) - first).astype(jnp.int32))
    ok = claimed & (rank < P)
    flat = jnp.where(ok, claim * P + rank, B * P)
    dt = loc.dtype
    Xb = jnp.zeros((B * P, 3), dt).at[flat].set(
        jnp.where(ok[:, None], loc, 0.0), mode='drop').reshape(B, P, 3)
    Cb = jnp.zeros((B * P, 3), dt).at[flat].set(
        jnp.where(ok[:, None], colors, 0.0), mode='drop').reshape(B, P, 3)
    Mb = jnp.zeros((B * P,), bool).at[flat].set(ok, mode='drop').reshape(B, P)
    return Xb, Cb, Mb


def _depth_density_grads(kp: RBFParams, s20, states, Xb, mask):
    """Per-point gradient of the depth predictive density w.r.t.
    (y, u, v) — [B, P, 3]. Xb rows are local (depth, u, v)."""

    def per_patch(state, pts, m):
        def density(uv, y):
            mean, var = sparse_gp.predict(kp, s20, state, uv[None])
            lp = -0.5 * jnp.log(2 * jnp.pi * var[0]) \
                - 0.5 * (y - mean[0, 0]) ** 2 / var[0]
            return jnp.exp(lp)

        g = jax.vmap(jax.grad(density, argnums=(1, 0)))(pts[:, 1:], pts[:, 0])
        dy, duv = g
        out = jnp.concatenate([dy[:, None], duv], axis=-1)
        return jnp.where(m[:, None], out, 0.0)

    return jax.vmap(per_patch)(states, Xb, mask)


def _color_density_grads(kp: RBFParams, s20, states, Xb, Cb, mask):
    """Gradient of the RGB field predictive density w.r.t. (u, v); the
    y-component is zero following the reference's intent
    (src/sparse_gp_field.hpp:387). [B, P, 3]."""

    def per_patch(state, pts, cols, m):
        def density(uv, c):
            mean, var = sparse_gp.predict(kp, s20, state, uv[None])
            lp = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * var)
                         - 0.5 * (c - mean[0]) ** 2 / var)
            return jnp.exp(lp)

        duv = jax.vmap(jax.grad(density, argnums=0))(pts[:, 1:], cols)
        out = jnp.concatenate([jnp.zeros_like(duv[:, :1]), duv], axis=-1)
        return jnp.where(m[:, None], out, 0.0)

    return jax.vmap(per_patch)(states, Xb, Cb, mask)


def compute_transformation(comp: CompressedCloud, points, colors, valid,
                           cfg: CompressorConfig, rcfg: RegistrationConfig,
                           depth_kp=None, rgb_kp=None):
    """One gradient evaluation (compute_transformation,
    src/gp_registration.cpp:115-246). Returns (delta [6], mean likelihood,
    mean color likelihood, n_points_used)."""
    dkp, ckp = default_params(cfg)
    depth_kp = depth_kp if depth_kp is not None else dkp
    rgb_kp = rgb_kp if rgb_kp is not None else ckp
    batch = comp.patch
    B = batch.rotations.shape[0]
    P = cfg.patch.max_points_per_patch

    claim, loc, claimed = _claim_to_map(comp, points, valid, cfg)
    cidx = jnp.where(claimed, claim, 0)
    cdm = colors - batch.rgb_means[cidx]            # demeaned colors (:169-171)
    Xb, Cb, Mb = _bank_points(claim, loc, cdm, claimed, B, P)

    dX = _depth_density_grads(depth_kp, cfg.depth_gp.s20, comp.depth_gp, Xb, Mb)
    dCX = _color_density_grads(rgb_kp, cfg.rgb_gp.s20, comp.rgb_gp, Xb, Cb, Mb)
    a = rcfg.color_blend
    dX = a * dX + (1.0 - a) * dCX                   # :198-199

    # rotate gradients to world: g_world = R g_local (dX *= R^T, :204)
    gw = jnp.einsum('bij,bpj->bpi', batch.rotations, dX)
    # world positions and twist Jacobians (:205-215)
    pw = jnp.einsum('bij,bpj->bpi', batch.rotations, Xb) + batch.means[:, None, :]
    J = jax.vmap(jax.vmap(transforms.transform_jacobian))(pw)   # [B,P,3,6]
    contrib = jnp.einsum('bpi,bpij->bpj', gw, J)                # [B,P,6]
    n_used = jnp.maximum(jnp.sum(Mb), 1)
    delta = jnp.sum(jnp.where(Mb[..., None], contrib, 0.0), axis=(0, 1)) / n_used

    # mean data likelihoods (ls, :211-212,248-256)
    ll = jax.vmap(lambda st, x, m: jnp.where(
        m, sparse_gp.likelihood(depth_kp, cfg.depth_gp.s20, st,
                                x[:, 1:], x[:, :1]), 0.0))(comp.depth_gp, Xb, Mb)
    cl = jax.vmap(lambda st, x, c, m: jnp.where(
        m, sparse_gp.likelihood(rgb_kp, cfg.rgb_gp.s20, st, x[:, 1:], c),
        0.0))(comp.rgb_gp, Xb, Cb, Mb)
    ls = jnp.sum(ll) / n_used
    cls = jnp.sum(cl) / n_used
    return delta, ls, cls, jnp.sum(Mb)


@functools.partial(jax.jit, static_argnames=("cfg", "rcfg"))
def register(comp: CompressedCloud, scan_points, scan_colors, scan_valid,
             cfg: CompressorConfig,
             rcfg: RegistrationConfig = RegistrationConfig(),
             init: RegistrationState = None):
    """Full registration loop under lax.while_loop (add_cloud +
    registration_step until registration_done, src/gp_registration.cpp:60-92,
    gp_mapping::add_cloud loop src/gp_mapping.cpp:18-20).

    Returns (state, transformed scan points).
    """
    dt = scan_points.dtype
    state = init if init is not None else init_state(dt)
    # apply any initial pose
    pts0 = transforms.apply(scan_points, state.R_cloud, state.t_cloud)

    def cond(carry):
        st, _ = carry
        done = (st.step_nbr > rcfg.min_steps) & (
            (st.step_nbr >= rcfg.max_steps)
            | ((jnp.linalg.norm(st.delta[:3]) < rcfg.grad_tol)
               & (jnp.linalg.norm(st.delta[3:]) < rcfg.grad_tol)))
        return ~done

    def body(carry):
        st, pts = carry
        delta, ls, cls, _ = compute_transformation(
            comp, pts, scan_colors, scan_valid, cfg, rcfg)
        R = transforms.euler_xyz(rcfg.step * delta[3:])
        t = rcfg.step * delta[:3]
        new = RegistrationState(
            R_cloud=R @ st.R_cloud, t_cloud=st.t_cloud + t, delta=delta,
            step_nbr=st.step_nbr + 1, mean_likelihood=ls,
            mean_color_likelihood=cls)
        return new, transforms.apply(pts, R, t)

    state, pts = lax.while_loop(cond, body, (state, pts0))
    return state, pts


def registration_error(R_est, t_est, R_true, t_true):
    """Translation / rotation error metrics (test_gp_accuracy,
    src/test_gp_accuracy.cpp:158-181): the registration recovers the
    inverse of the applied perturbation."""
    dR = R_est @ R_true
    t_err = jnp.linalg.norm(R_est @ t_true + t_est)
    r_err = transforms.rotation_angle(dR)
    return t_err, r_err
