"""Round-5 mapping-claims microbenchmark: where do the insert body's
claims (66 ms), banking (18 ms) and shared-sort passes actually spend
device time at the bench operating point (150k-pt scan, 2048-slot map)?

Each variant is timed as (T_K - T_1)/(K - 1) over a K-iteration on-device
fori_loop whose carry perturbs the inputs (DCE- and hoist-proof; the
tunnel RTT of ~25 ms/dispatch makes single-shot timings meaningless).

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r5_claims_micro.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import bench
from gp_compressor_tpu.config import (CompressorConfig, GPConfig,
                                      MappingConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.geometry import voxel
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import mapping, registration


def make_cfg():
    return CompressorConfig(
        patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                          max_patches=bench.MAX_PATCHES,
                          max_points_per_patch=bench.MAX_PPP,
                          approx_sphere_moments=True,
                          bank_order="center_out"),
        depth_gp=GPConfig(capacity=bench.TPU_CAPACITY, slots=bench.TPU_SLOTS,
                          eps_tol=bench.TPU_EPS_TOL),
        rgb_gp=dataclasses.replace(
            rgb_gp_config(slots=bench.TPU_SLOTS, capacity=bench.TPU_CAPACITY),
            eps_tol=bench.TPU_EPS_TOL),
    )


def time_pair(fn, *args):
    K = 33
    float(fn(1, *args))
    float(fn(K, *args))
    t0 = time.perf_counter(); float(fn(1, *args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(K, *args))
    tK = time.perf_counter() - t0
    return round((tK - t1) / (K - 1) * 1e3, 2)


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    cfg = make_cfg()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    lo = np.asarray(jnp.min(pts, 0)) - 0.3
    hi = np.asarray(jnp.max(pts, 0)) + 0.3
    mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=8,
                         carve_stride=8, drop_on_reg_cap=False, reg_stride=4)
    rcfg = RegistrationConfig(max_steps=8, min_steps=2, step_mode="rprop",
                              bank_points=64)
    Ns = 150_000
    scan0 = (pts[0::2][:Ns], cols[0::2][:Ns], valid[0::2][:Ns])
    scan1 = (pts[1::2][:Ns], cols[1::2][:Ns], valid[1::2][:Ns])
    state = mapping.map_init(cfg, mcfg, lo, hi, dtype=pts.dtype)
    state, _, _, _ = mapping.add_cloud_fused(state, *scan0, cfg, mcfg,
                                             jax.random.key(0), rcfg=rcfg,
                                             use_pallas=True)
    state, _, _, _ = mapping.add_cloud_fused(state, *scan1, cfg, mcfg,
                                             jax.random.key(1), rcfg=rcfg,
                                             use_pallas=True)
    float(jnp.sum(state.means))

    comp = mapping._map_as_compressed(state, cfg)
    tables = registration._map_claim_tables(
        comp, trained=state.created[state.leaf_ids])
    grid = comp.patch.grid
    P, C, V = scan1
    res = cfg.patch.res
    B_slots = grid.keys.shape[0]
    out = {"device": str(jax.devices()[0]), "n_points": Ns,
           "n_slots": int(B_slots)}

    # ---- 1. full claim_with_tables --------------------------------------
    @jax.jit
    def full_claim(K, P):
        def body(i, c):
            s, p = c
            cl, loc, cd = registration.claim_with_tables(
                tables, grid, p, V, res, out_fill=B_slots)
            s = s + jnp.sum(loc) + jnp.sum(cl) + jnp.sum(cd)
            return s, P + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), P))
        return s
    out["full_claim_ms"] = time_pair(full_claim, P)

    # ---- 2. keys + octant + row index only ------------------------------
    @jax.jit
    def keys_only(K, P):
        def body(i, c):
            s, p = c
            keys3 = voxel.point_keys(p, grid.origin, grid.res)
            keys3c = jnp.clip(keys3, 0, grid.dims - 1)
            lin = voxel.linearize(keys3c, grid.dims)
            nc = tables.cell_row.shape[0]
            row = tables.cell_row[jnp.clip(lin, 0, nc - 1)]
            home_center = grid.origin + (keys3c.astype(p.dtype) + 0.5) \
                * jnp.asarray(res, p.dtype)
            oct_id = voxel.octant_of(p - home_center)
            row8 = jnp.where((lin < nc) & (row >= 0) & V, row, 0) * 8 + oct_id
            s = s + jnp.sum(row8)
            return s, P + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), P))
        return s
    out["keys_row_ms"] = time_pair(keys_only, P)

    # ---- 3. + the three table row gathers -------------------------------
    @jax.jit
    def gathers(K, P):
        def body(i, c):
            s, p = c
            keys3 = voxel.point_keys(p, grid.origin, grid.res)
            keys3c = jnp.clip(keys3, 0, grid.dims - 1)
            lin = voxel.linearize(keys3c, grid.dims)
            nc = tables.cell_row.shape[0]
            row = tables.cell_row[jnp.clip(lin, 0, nc - 1)]
            home_center = grid.origin + (keys3c.astype(p.dtype) + 0.5) \
                * jnp.asarray(res, p.dtype)
            oct_id = voxel.octant_of(p - home_center)
            row8 = jnp.where((lin < nc) & (row >= 0) & V, row, 0) * 8 + oct_id
            Rk = tables.R12[row8]
            sk = tables.prio[row8]
            gk = tables.gid[row8]
            s = s + jnp.sum(Rk) + jnp.sum(sk) + jnp.sum(gk)
            return s, P + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), P))
        return s
    out["plus_row_gathers_ms"] = time_pair(gathers, P)

    # ---- 4. gather R12 only (the wide row) ------------------------------
    keys3c = jnp.clip(voxel.point_keys(P, grid.origin, grid.res),
                      0, grid.dims - 1)
    lin = voxel.linearize(keys3c, grid.dims)
    row = tables.cell_row[jnp.clip(lin, 0, tables.cell_row.shape[0] - 1)]
    home_center = grid.origin + (keys3c.astype(P.dtype) + 0.5) \
        * jnp.asarray(res, P.dtype)
    oct_id = voxel.octant_of(P - home_center)
    row8_h = jnp.where((lin < tables.cell_row.shape[0]) & (row >= 0) & V,
                       row, 0) * 8 + oct_id

    @jax.jit
    def r12_only(K, row8):
        def body(i, c):
            s, r8 = c
            Rk = tables.R12[r8]
            s = s + jnp.sum(Rk)
            return s, (row8 + (s * 0).astype(jnp.int32))
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, jnp.float32),
                                          row8))
        return s
    out["r12_gather_only_ms"] = time_pair(r12_only, row8_h)

    @jax.jit
    def prio_only(K, row8):
        def body(i, c):
            s, r8 = c
            s = s + jnp.sum(tables.prio[r8])
            return s, (row8 + (s * 0).astype(jnp.int32))
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, jnp.float32),
                                          row8))
        return s
    out["sidx_gather_only_ms"] = time_pair(prio_only, row8_h)

    # ---- 5. shared sort + windows at insert shapes ----------------------
    from gp_compressor_tpu.geometry.patches import sort_by_claim
    B = cfg.patch.max_patches
    cl, loc, cd = registration.claim_with_tables(tables, grid, P, V, res,
                                                 out_fill=B_slots)
    d2c = loc[:, 1] ** 2 + loc[:, 2] ** 2
    seg_all = jnp.where(cd, jnp.minimum(cl, B - 1), 2 * B).astype(jnp.int32)

    @jax.jit
    def shared_sort(K, rank):
        def body(i, c):
            s, rk = c
            outs, starts = sort_by_claim(
                seg_all, seg_all < 2 * B,
                (loc[:, 1], loc[:, 2], loc[:, 0], C[:, 0], C[:, 1], C[:, 2],
                 P[:, 0], P[:, 1], P[:, 2], seg_all.astype(P.dtype)),
                2 * B, rank=rk)
            s = s + sum(jnp.sum(o) for o in outs) + jnp.sum(starts)
            return s, rk + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), d2c))
        return s
    out["shared_sort10_ms"] = time_pair(shared_sort, d2c)

    # sort with only the 4 banking-essential payloads (u, v, d, seg)
    @jax.jit
    def small_sort(K, rank):
        def body(i, c):
            s, rk = c
            outs, starts = sort_by_claim(
                seg_all, seg_all < 2 * B,
                (loc[:, 1], loc[:, 2], loc[:, 0], seg_all.astype(P.dtype)),
                2 * B, rank=rk)
            s = s + sum(jnp.sum(o) for o in outs) + jnp.sum(starts)
            return s, rk + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), d2c))
        return s
    out["sort4_ms"] = time_pair(small_sort, d2c)

    # ---- 6. bank window gathers at [B, Pmax] ----------------------------
    (u_s, v_s, d_s, r_s, g_s, b_s, wx_s, wy_s, wz_s, seg_f), starts2 = \
        sort_by_claim(seg_all, seg_all < 2 * B,
                      (loc[:, 1], loc[:, 2], loc[:, 0], C[:, 0], C[:, 1],
                       C[:, 2], P[:, 0], P[:, 1], P[:, 2],
                       seg_all.astype(P.dtype)), 2 * B, rank=d2c)
    counts_b = starts2[1:B + 1] - starts2[:B]
    Nnz = jnp.maximum(starts2[-1], 1)
    Pmax = cfg.patch.max_points_per_patch

    @jax.jit
    def windows(K, us):
        def body(i, c):
            s, u = c
            rk = jnp.arange(Pmax, dtype=jnp.int32)
            m = rk[None, :] < counts_b[:, None]
            pos = jnp.minimum(starts2[:B, None] + rk[None, :], Nnz - 1)
            X = jnp.where(m[..., None],
                          jnp.stack([u[pos], v_s[pos]], -1), 0.0)
            Y = jnp.where(m, d_s[pos], 0.0)
            Cc = jnp.where(m[..., None],
                           jnp.stack([r_s[pos], g_s[pos], b_s[pos]], -1), 0.0)
            s = s + jnp.sum(X) + jnp.sum(Y) + jnp.sum(Cc)
            return s, u + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), us))
        return s
    out["bank_windows_ms"] = time_pair(windows, u_s)

    # ---- 7. scatter-form banking: ONE [N, 6] scatter from the sorted
    # payload into [B*Pmax, 6] (the window form above pays B*Pmax gather
    # positions x 6 arrays; the scatter pays N writes once) --------------
    @jax.jit
    def bank_scatter(K, us):
        def body(i, c):
            s, u = c
            iota = jnp.arange(u.shape[0], dtype=jnp.int32)
            seg_i = seg_f.astype(jnp.int32)
            rank_row = iota - starts2[jnp.clip(seg_i, 0, 2 * B)]
            okb = (seg_i < B) & (rank_row < Pmax)
            tgt = jnp.where(okb, seg_i * Pmax + rank_row, B * Pmax)
            payload = jnp.stack([u, v_s, d_s, r_s, g_s, b_s], -1)
            flat = jnp.zeros((B * Pmax + 1, 6), u.dtype).at[tgt].set(
                jnp.where(okb[:, None], payload, 0.0), mode='drop')
            Xb = flat[:B * Pmax, :2].reshape(B, Pmax, 2)
            Yb = flat[:B * Pmax, 2].reshape(B, Pmax)
            Cb = flat[:B * Pmax, 3:].reshape(B, Pmax, 3)
            s = s + jnp.sum(Xb) + jnp.sum(Yb) + jnp.sum(Cb)
            return s, u + s * 1e-12
        s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, P.dtype), u_s))
        return s
    out["bank_scatter_ms"] = time_pair(bank_scatter, u_s)

    # ---- 8. full claim-table build (the per-scan fixed cost the reuse
    # gate was supposed to amortize; in the bench stream `becomes` keeps
    # firing so it runs every scan) --------------------------------------
    trained_v = state.created[state.leaf_ids]

    @jax.jit
    def table_build(K, rots):
        def body(i, c):
            s, r = c
            t = registration.build_claim_tables(
                grid, r, comp.patch.means, trained_v)
            s = s + jnp.sum(t.R12) + jnp.sum(t.prio) + jnp.sum(t.cell_row)
            return s, r + s * 1e-12
        s, _ = lax.fori_loop(0, K, body,
                             (jnp.asarray(0.0, P.dtype),
                              comp.patch.rotations))
        return s
    out["table_build_ms"] = time_pair(table_build, comp.patch.rotations)

    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_claims_micro.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
