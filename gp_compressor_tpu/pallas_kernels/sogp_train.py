"""Fused SOGP training kernel (Pallas/TPU) — the framework's hot op.

The XLA path (models.sparse_gp.add_points_batch) scans points with the
[B, S, S] C/Q state living in HBM: every scan step reads and writes the
whole state, so a P-point cloud moves ~2*P*B*S^2 floats of HBM traffic.
This kernel keeps a block of patches' entire state resident in VMEM across
the whole point loop, cutting state traffic by a factor of P (~256x) and
turning the update into pure VPU arithmetic.

Layout: patches ride the 128-wide LANE axis ("structure-of-arrays"):
  C, Q:   [S, S, L]     alpha: [S, D, L]    bv: [S, 2, L]
  active: [S, L]        X: [P, 2, L]  Y: [P, D, L]  valid: [P, L]
Every scalar of the serial algorithm (src/sparse_gp.hpp:90-249) becomes an
[L]-vector; every [S]-vector becomes [S, L]; rank-1 updates become
[S, S, L] elementwise multiply-adds. All reductions run over sublane axes,
which the VPU vectorizes at full width.

VMEM discipline (the v5e budget is 16 MB): state buffers alias in/out and
are MUTATED through refs after each algebraic step so Mosaic can retire
temporaries early; the sparse/full branches are fused by predicating the
rank-1 vectors/coefficients BEFORE the outer products (one [S, S, L]
multiply-add per matrix per point); point validity is folded into the
coefficients instead of full-size selects.

Semantics match models.sparse_gp.add_point (same full/sparse select,
capacity deletion, bounded geometric deletions, s2>=gamma clamp); parity
tests run both paths. Gaussian noise only — the probit occupancy channel
trains through the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gp_compressor_tpu.config import GPConfig
from gp_compressor_tpu.models.sparse_gp import SOGPState
from gp_compressor_tpu.ops.kernels import RBFParams

LANES = 128


def _diag(M):
    """Diagonal of [S, S, L] -> [S, L]. The eye mask is float32 before it
    gains a minor dim — Mosaic cannot reshape i1 vectors into a new minor
    dimension."""
    S = M.shape[0]
    i = lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = lax.broadcasted_iota(jnp.int32, (S, S), 1)
    eye = (i == j).astype(M.dtype)
    return jnp.sum(M * eye[:, :, None], axis=1)


def _kernel(cfg: GPConfig, n_points: int,
            prm_ref, cnt_ref, X_ref, Y_ref, V_ref, bv_in, al_in, C_in, Q_in,
            act_in, bv_o, al_o, C_o, Q_o, act_o, dC_ref, dQ_ref):
    S = cfg.slots
    sigmaf_sq = prm_ref[0, 0]
    l_sq = prm_ref[0, 1]
    s20 = prm_ref[0, 2]
    eps_tol = prm_ref[0, 3]
    geom_kappa = prm_ref[0, 4]
    geom_max_bv = prm_ref[0, 5]
    geom_gamma_min = prm_ref[0, 6]
    kstar = sigmaf_sq
    iota = lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
    f32 = jnp.float32

    # C/Q may be STORED in a lower precision (bf16 state experiment,
    # SURVEY §7 watch-list (c)); all arithmetic stays float32
    def _ld(ref):
        return ref[:].astype(f32)

    def _st(ref, val):
        ref[:] = val.astype(ref.dtype)

    def delete_inplace(loc, do):
        """Conditional per-lane BV removal, mutating the state refs.
        `do`: [L] float (1.0 = delete on this lane).

        The whole body is predicated on ANY lane deleting: at the bench
        operating point deletions fire on a vanishing fraction of points,
        so this removes ~8 full [S, S, L] passes from the common path."""

        @pl.when(jnp.max(do) > 0.0)
        def _():
            ohd = (iota == loc[None, :]).astype(jnp.float32) * do[None, :]
            # ohd is zero on lanes that do not delete -> all deltas vanish
            alpha = al_o[:]
            C = _ld(C_o)
            Q = _ld(Q_o)
            astar = jnp.sum(alpha * ohd[:, None, :], axis=0)     # [D, L]
            Ccol = jnp.sum(C * ohd[None, :, :], axis=1)          # [S, L]
            Qcol = jnp.sum(Q * ohd[None, :, :], axis=1)
            cstar = jnp.sum(Ccol * ohd, axis=0)                  # [L]
            qstar = jnp.sum(Qcol * ohd, axis=0)
            keep = 1.0 - ohd
            Cs = Ccol * keep
            Qs = Qcol * keep
            qc = Qs + Cs
            den = qstar + cstar
            inv_q = do / jnp.where(jnp.abs(qstar) > 1e-30, qstar, 1.0)
            inv_d = do / jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
            # zeroing of row/col loc on deleting lanes: M*keep_i*keep_j =
            # M - do*(row+col outer parts); fold into the rank-1 deltas
            al_o[:] = (alpha - qc[:, None, :]
                       * (astar * inv_d[None, :])[None, :, :]) \
                * keep[:, None, :]
            _st(C_o, (C + Qs[:, None, :] * (Qs * inv_q[None, :])[None, :, :]
                      - qc[:, None, :] * (qc * inv_d[None, :])[None, :, :])
                * keep[:, None, :] * keep[None, :, :])
            _st(Q_o, (Q - Qs[:, None, :] * (Qs * inv_q[None, :])[None, :, :])
                * keep[:, None, :] * keep[None, :, :])
            bv_o[:] = bv_o[:] * keep[:, None, :]
            act_o[:] = act_o[:] * keep
            # rank-1 deltas hit the diagonal in closed form
            dC_ref[:] = (dC_ref[:] + Qs * Qs * inv_q[None, :]
                         - qc * qc * inv_d[None, :]) * keep
            dQ_ref[:] = (dQ_ref[:] - Qs * Qs * inv_q[None, :]) * keep

    def body(p, carry):
        x = X_ref[p]                       # [2, L]
        y = Y_ref[p]                       # [D, L]
        v = V_ref[p]                       # [L] float validity

        act = act_o[:]
        bv = bv_o[:]
        diff = bv - x[None, :, :]          # [S, 2, L]
        d2 = jnp.sum(diff * diff, axis=1)  # [S, L]
        k = sigmaf_sq * jnp.exp(-0.5 / l_sq * d2) * act

        alpha = al_o[:]
        m = jnp.sum(alpha * k[:, None, :], axis=0)              # [D, L]
        Ck = jnp.sum(_ld(C_o) * k[None, :, :], axis=1)          # [S, L]
        s2 = kstar + jnp.sum(k * Ck, axis=0)                    # [L]
        e_hat = jnp.sum(_ld(Q_o) * k[None, :, :], axis=1)       # [S, L]
        gamma = kstar - jnp.sum(k * e_hat, axis=0)              # [L]
        gamma = jnp.where(gamma < cfg.gamma_tiny, 0.0, gamma)
        s2 = jnp.maximum(s2, gamma)        # f32 invariant (see sparse_gp)
        r = -1.0 / (s20 + s2)              # Gaussian noise dx2_ln
        q = (y - m) / (s20 + s2)           # [D, L] dx_ln

        if cfg.novelty_mode == "geometric":
            # conditioning-free streaming novelty (GPConfig.novelty_mode):
            # admit iff max kernel value < kappa (= farther than geom_dmin
            # from every BV) and under the BV budget — pure [S, L] values
            # the update already has; gamma plays no role in admission
            kmax = jnp.max(k, axis=0)                           # [L]
            nbv = jnp.sum(act, axis=0)                          # [L]
            admit = (nbv < geom_max_bv) & (kmax < geom_kappa) \
                & (gamma > geom_gamma_min)
            sp = 1.0 - admit.astype(jnp.float32)                # [L] 1=sparse
        else:
            sp = (gamma < eps_tol).astype(jnp.float32)          # [L] 1=sparse
        eta = 1.0 / (1.0 + gamma * r)
        slot = jnp.argmin(act, axis=0)                          # [L]
        oh = (iota == slot[None, :]).astype(jnp.float32)        # [S, L]

        # fused predicated rank-1 updates; validity folds into coefficients
        v1 = Ck + sp[None, :] * e_hat + (1.0 - sp)[None, :] * oh
        coefA = (sp * eta + (1.0 - sp)) * v                     # [L]
        al_o[:] = alpha + v1[:, None, :] * (q * coefA[None, :])[None, :, :]
        _st(C_o, _ld(C_o) + (r * coefA)[None, None, :]
            * v1[:, None, :] * v1[None, :, :])
        # incremental diagonals: the rank-1 updates add coef*v_i^2 on the
        # diagonal — same arithmetic the full matrices receive, at [S, L]
        # cost. Saves ~6 full [S, S, L] diag sweeps per point.
        dC_ref[:] = dC_ref[:] + (r * coefA)[None, :] * v1 * v1

        # Q/bv/act change ONLY on a full (BV-adding) update. In the steady
        # state (saturated novelty budget) almost every point is a sparse
        # update on every lane, so predicating this block on any lane
        # going full removes one [S, S, L] load+FMA+store (Q — the same
        # footprint as C) from the common path.
        @pl.when(jnp.max((1.0 - sp) * v) > 0.0)
        def _():
            gsafe = jnp.maximum(gamma, cfg.gamma_tiny)
            coefQ = (1.0 - sp) * v / gsafe                      # [L]
            e_f = e_hat - oh
            _st(Q_o, _ld(Q_o)
                + coefQ[None, None, :] * e_f[:, None, :] * e_f[None, :, :])
            grow = (1.0 - sp)[None, :] * v[None, :] * oh        # [S, L]
            bv_o[:] = bv * (1.0 - grow)[:, None, :] \
                + grow[:, None, :] * x[None, :, :]
            act_o[:] = jnp.maximum(act, grow)
            dQ_ref[:] = dQ_ref[:] + coefQ[None, :] * e_f * e_f

        # capacity deletion (one per insertion suffices)
        act2 = act_o[:]
        size = jnp.sum(act2, axis=0)
        scores = jnp.where(act2 > 0,
                           jnp.sum(al_o[:] * al_o[:], axis=1)
                           / (dQ_ref[:] + dC_ref[:]), jnp.inf)
        loc = jnp.argmin(scores, axis=0)
        over = ((size > float(cfg.capacity)).astype(jnp.float32)) * v
        delete_inplace(loc, over)

        for _ in range(cfg.max_geometric_deletes):
            act3 = act_o[:]
            g = jnp.where(act3 > 0, 1.0 / dQ_ref[:], jnp.inf)
            locg = jnp.argmin(g, axis=0)
            dog = ((jnp.min(g, axis=0) < cfg.geom_tol)
                   & (jnp.sum(act3, axis=0) > 1)).astype(jnp.float32) * v
            delete_inplace(locg, dog)
        return carry

    # initialise outputs from the (aliased) inputs, then loop in place.
    # The trip count is the BLOCK's last valid row + 1 (SMEM): point
    # validity is per-lane anyway, so rows past every lane's last point
    # are pure no-ops — mapping banks average well under half the static
    # bound, and neighbouring (key-sorted) patches have correlated
    # counts, so the per-block dynamic bound removes ~the padding tail.
    bv_o[:] = bv_in[:]
    al_o[:] = al_in[:]
    C_o[:] = C_in[:]
    Q_o[:] = Q_in[:]
    act_o[:] = act_in[:]
    dC_ref[:] = _diag(C_in[:].astype(f32))
    dQ_ref[:] = _diag(Q_in[:].astype(f32))
    n_eff = jnp.minimum(cnt_ref[0, pl.program_id(0)], n_points)
    lax.fori_loop(0, n_eff, body, 0)


def _to_lanes(a, B):
    """[B, ...] -> [nblk, ..., LANES] with padding."""
    nblk = (B + LANES - 1) // LANES
    pad = nblk * LANES - B
    a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    a = a.reshape((nblk, LANES) + a.shape[1:])
    perm = (0,) + tuple(range(2, a.ndim)) + (1,)
    return a.transpose(perm)


def _from_lanes(a, B):
    """[nblk, ..., LANES] -> [B, ...]."""
    nd = a.ndim
    perm = (0, nd - 1) + tuple(range(1, nd - 1))
    a = a.transpose(perm)
    return a.reshape((-1,) + a.shape[2:])[:B]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret",
                                              "state_dtype"))
def add_points_batch_pallas(kp: RBFParams, cfg: GPConfig, states: SOGPState,
                            X: jnp.ndarray, Y: jnp.ndarray,
                            mask: jnp.ndarray,
                            interpret: bool = False,
                            s20=None, eps_tol=None,
                            state_dtype=None, geom=None) -> SOGPState:
    """Drop-in for sparse_gp.add_points_batch (Gaussian noise, no shuffle —
    pre-permute X/Y/mask outside if desired). X: [B, P, 2], Y: [B, P, D],
    mask: [B, P].

    s20 / eps_tol: optional TRACED overrides of the config constants; they
    ride the SMEM param row, so a calibrated run (traced hyperparameters
    from MAP/HMC) reuses the same compiled kernel instead of retracing.
    geom: optional TRACED (dmin, max_bv, gamma_min_rel) override of the
    geometric-novelty constants (same SMEM mechanism — sweeps share one
    compile); only read when cfg.novelty_mode == "geometric".
    state_dtype: optional storage dtype for the C/Q state blocks (e.g.
    jnp.bfloat16 — SURVEY §7 watch-list (c)); arithmetic stays float32
    and the returned state is converted back to the input dtype. See
    benchmarks/r3_bf16.json for the measured accuracy/throughput verdict."""
    B, P, _ = X.shape
    dt = states.C.dtype
    sdt = dt if state_dtype is None else state_dtype

    Xl = _to_lanes(X, B)                       # [nblk, P, 2, L]
    Yl = _to_lanes(Y, B)                       # [nblk, P, D, L]
    Vl = _to_lanes(mask.astype(dt), B)         # [nblk, P, L]
    bvl = _to_lanes(states.bv, B)              # [nblk, S, 2, L]
    al = _to_lanes(states.alpha, B)            # [nblk, S, D, L]
    Cl = _to_lanes(states.C.astype(sdt), B)    # [nblk, S, S, L]
    Ql = _to_lanes(states.Q.astype(sdt), B)
    actl = _to_lanes(states.active.astype(dt), B)  # [nblk, S, L]
    nblk = Xl.shape[0]

    sf = jnp.asarray(kp.sigmaf_sq, dt)
    l2 = jnp.asarray(kp.l_sq, dt)
    g_dmin, g_maxbv, g_gmin = (cfg.geom_dmin, cfg.geom_max_bv,
                               cfg.geom_gamma_min_rel) if geom is None \
        else geom
    kappa = sf * jnp.exp(jnp.asarray(-0.5, dt)
                         * jnp.asarray(g_dmin, dt) ** 2 / l2)
    prm = jnp.stack([
        sf, l2,
        jnp.asarray(cfg.s20 if s20 is None else s20, dt),
        jnp.asarray(cfg.eps_tol if eps_tol is None else eps_tol, dt),
        kappa, jnp.asarray(g_maxbv, dt),
        jnp.asarray(g_gmin, dt) * sf,
    ])[None, :]                                                   # [1, 7]
    kern = functools.partial(_kernel, cfg, P)

    def bspec(shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # per-block trip count: last valid row + 1, maxed over the block's
    # 128 patch lanes (works for any mask pattern, not just prefixes)
    anyv = jnp.any(mask, axis=1)
    last = P - 1 - jnp.argmax(mask[:, ::-1], axis=1)
    n_eff = jnp.where(anyv, last + 1, 0).astype(jnp.int32)
    nblk_cnt = (B + LANES - 1) // LANES
    cnt = jnp.max(jnp.pad(n_eff, (0, nblk_cnt * LANES - B))
                  .reshape(nblk_cnt, LANES), axis=1)[None, :]     # [1, nblk]

    def kernel_wrap(prm_ref, cnt_ref, X_ref, Y_ref, V_ref, bv_ref, alpha_ref,
                    C_ref, Q_ref, act_ref, bv_o, al_o, C_o, Q_o, act_o,
                    dC_ref, dQ_ref):
        kern(prm_ref, cnt_ref, X_ref.at[0], Y_ref.at[0], V_ref.at[0],
             bv_ref.at[0], alpha_ref.at[0], C_ref.at[0], Q_ref.at[0],
             act_ref.at[0], bv_o.at[0], al_o.at[0], C_o.at[0], Q_o.at[0],
             act_o.at[0], dC_ref, dQ_ref)

    out_shapes = [
        jax.ShapeDtypeStruct(bvl.shape, dt),
        jax.ShapeDtypeStruct(al.shape, dt),
        jax.ShapeDtypeStruct(Cl.shape, sdt),
        jax.ShapeDtypeStruct(Ql.shape, sdt),
        jax.ShapeDtypeStruct(actl.shape, dt),
    ]
    bv2, a2, C2, Q2, act2 = pl.pallas_call(
        kernel_wrap,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, 7), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  # full [1, nblk] row in SMEM (TPU block shapes must
                  # equal the array dims here); the kernel indexes its
                  # block's count by pl.program_id
                  pl.BlockSpec((1, nblk), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  bspec(Xl.shape[1:]), bspec(Yl.shape[1:]), bspec(Vl.shape[1:]),
                  bspec(bvl.shape[1:]), bspec(al.shape[1:]),
                  bspec(Cl.shape[1:]), bspec(Ql.shape[1:]),
                  bspec(actl.shape[1:])],
        out_specs=[bspec(bvl.shape[1:]), bspec(al.shape[1:]),
                   bspec(Cl.shape[1:]), bspec(Ql.shape[1:]),
                   bspec(actl.shape[1:])],
        out_shape=out_shapes,
        # alias state inputs onto outputs: halves the VMEM block footprint
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3, 9: 4},
        scratch_shapes=[pltpu.VMEM((cfg.slots, LANES), dt),
                        pltpu.VMEM((cfg.slots, LANES), dt)],
        interpret=interpret,
    )(prm, cnt, Xl, Yl, Vl, bvl, al, Cl, Ql, actl)

    return SOGPState(
        bv=_from_lanes(bv2, B), alpha=_from_lanes(a2, B),
        C=_from_lanes(C2, B).astype(dt), Q=_from_lanes(Q2, B).astype(dt),
        active=_from_lanes(act2, B) > 0.5)
