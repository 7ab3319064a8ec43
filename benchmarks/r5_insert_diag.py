"""Round-5 mapping diagnosis: prefix-timed per-stage device cost of the
steady-state map_insert at the bench operating point, plus whether the
claim-table reuse gate actually holds on the bench stream.

Stages (map_insert _diag_stop):
  1 alloc (linkey/unique/table rebuild)   6 banking
  2 sphere moments + frames               7 train pair
  3 claims                                8 sanitize
  4 means segments                        9 pending buffers
  5 W mask                                0 full insert (incl. carve)

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r5_insert_diag.py
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

import bench
from gp_compressor_tpu.config import (CompressorConfig, GPConfig,
                                      MappingConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor, mapping, registration


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


def _sync(*arrays):
    return float(sum(jnp.sum(a) for a in arrays))


def _time(fn, n=3):
    fn()                                    # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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
    p99 = float(np.percentile(np.linalg.norm(np.asarray(pts), axis=1), 99))
    steps = min(mapping.required_ray_steps(lo, hi, cfg.patch.res),
                int(1.2 * p99 / cfg.patch.res) + 2)
    mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=steps,
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
    # fold one more scan so the steady state has both halves' voxels
    state, _, _, _ = mapping.add_cloud_fused(state, *scan1, cfg, mcfg,
                                             jax.random.key(1), rcfg=rcfg,
                                             use_pallas=True)
    _sync(state.means)

    min_nbr = jnp.asarray(mcfg.min_points_new_patch, jnp.int32)

    def run(stop, mc=mcfg):
        out = mapping.map_insert(state, scan1[0], scan1[1], scan1[2], cfg,
                                 mc, jax.random.key(2), min_nbr,
                                 use_pallas=True, _diag_stop=stop)
        if stop:
            _sync(out[1]["chk"])
        else:
            _sync(out[0].means, out[0].free)
        return out

    rows = {}
    prev = 0.0
    for stop in (1, 2, 3, 4, 5, 6, 7, 8, 9, 0):
        t = _time(lambda: run(stop))
        name = {1: "alloc", 2: "moments", 3: "tables+claims", 4: "means",
                5: "W", 6: "bank", 7: "train", 8: "sanitize", 9: "pending",
                0: "full+carve"}[stop]
        rows[name] = {"cum_s": round(t, 4),
                      "stage_ms": round((t - prev) * 1e3, 1)}
        prev = t
        print(json.dumps({"diag": "insert_stage", "stage": name,
                          **rows[name]}), flush=True)

    # incremental table update vs forced full rebuild (table_update_max=0)
    mc_full = dataclasses.replace(mcfg, table_update_max=0)
    t_full = _time(lambda: run(0, mc_full))
    print(json.dumps({"diag": "insert_totals",
                      "full_incremental_s": rows["full+carve"]["cum_s"],
                      "full_rebuild_tables_s": round(t_full, 4)}),
          flush=True)

    # registration share of the per-scan wall (persistent tables, gid view)
    k = mcfg.reg_stride
    comp = mapping._map_view_gid(state, cfg)
    tables = state.tables._replace(nm=jnp.concatenate(
        [state.rotations[:, :, 0], state.means], axis=1))

    def reg():
        st, out = registration.register(
            comp, scan0[0][::k], scan0[1][::k], scan0[2][::k], cfg, rcfg,
            tables=tables)
        _sync(out)
        return st

    t_reg = _time(reg)
    st = reg()
    print(json.dumps({"diag": "register", "wall_s": round(t_reg, 4),
                      "steps": int(st.step_nbr)}), flush=True)


if __name__ == "__main__":
    main()
