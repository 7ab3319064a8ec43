"""Round-3 diagnosis on the TPU: mapping stage shares, registration
overshoot, NUTS after the stratified calib_subsample fix.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r3_diagnose.py [mapping|registration|nuts]...
Prints one JSON line per measurement.
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


def _time(fn, n=2):
    out = fn()                              # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def diag_mapping(pts, cols, valid, cfg):
    lo = np.asarray(jnp.min(pts, 0)) - 0.3
    hi = np.asarray(jnp.max(pts, 0)) + 0.3
    steps = mapping.required_ray_steps(lo, hi, cfg.patch.res)
    rcfg = RegistrationConfig(max_steps=20, step=0.02)
    Ns = 150_000
    scan0 = (pts[0::2][:Ns], cols[0::2][:Ns], valid[0::2][:Ns])
    scan1 = (pts[1::2][:Ns], cols[1::2][:Ns], valid[1::2][:Ns])

    for stride in (1, 4):
        mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=steps,
                             carve_stride=stride)
        state = mapping.map_init(cfg, mcfg, lo, hi, dtype=pts.dtype)
        state, _, _, _ = mapping.add_cloud_fused(
            state, *scan0, cfg, mcfg, jax.random.key(0), rcfg=rcfg,
            use_pallas=True)
        _sync(state.means)

        # full add_cloud
        t_full, _ = _time(lambda: (
            mapping.add_cloud_fused(state, *scan1, cfg, mcfg,
                                    jax.random.key(1), rcfg=rcfg,
                                    use_pallas=True),
            _sync(state.means))[0][0].means.block_until_ready())
        # insert only
        def ins():
            st2, _ = mapping.map_insert(state, scan1[0], scan1[1], scan1[2],
                                        cfg, mcfg, jax.random.key(1),
                                        jnp.asarray(50, jnp.int32),
                                        use_pallas=True)
            _sync(st2.means)
            return st2
        t_ins, _ = _time(ins)
        # register only
        comp = mapping._map_as_compressed(state, cfg)
        def reg():
            st, out = registration.register(comp, scan1[0], scan1[1],
                                            scan1[2], cfg, rcfg)
            _sync(out)
            return st
        t_reg, st = _time(reg)
        print(json.dumps({"diag": "mapping", "carve_stride": stride,
                          "t_full": round(t_full, 3),
                          "t_insert": round(t_ins, 3),
                          "t_register": round(t_reg, 3),
                          "reg_steps": int(st.step_nbr)}), flush=True)

    # map quality after the sanitize fix
    mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=steps,
                         carve_stride=4)
    state = mapping.map_init(cfg, mcfg, lo, hi, dtype=pts.dtype)
    state, _, _, _ = mapping.add_cloud_fused(state, *scan0, cfg, mcfg,
                                             jax.random.key(0), rcfg=rcfg,
                                             use_pallas=True)
    SP = jnp.stack([scan1[0], scan0[0], scan1[0], scan0[0]])
    SC = jnp.stack([scan1[1], scan0[1], scan1[1], scan0[1]])
    SV = jnp.stack([scan1[2], scan0[2], scan1[2], scan0[2]])
    state2, dvg, _, info = mapping.add_clouds(state, SP, SC, SV, cfg, mcfg,
                                              jax.random.key(2), rcfg=rcfg,
                                              use_pallas=True)
    mpts, _, mok = mapping.map_cloud(state2, cfg)
    mp = np.asarray(mpts)[np.asarray(mok)]
    finite = np.isfinite(mp).all(axis=1)
    from scipy.spatial import cKDTree
    ref = np.concatenate([np.asarray(scan0[0]), np.asarray(scan1[0])])
    d, _ = cKDTree(ref).query(mp[finite], k=1)
    print(json.dumps({"diag": "map_quality",
                      "nonfinite": int((~finite).sum()),
                      "map_rmse_m": round(float(np.sqrt(np.mean(d**2))), 4),
                      "diverged": [bool(x) for x in np.asarray(dvg)]}),
          flush=True)


def diag_insert(pts, cols, valid, cfg):
    """Per-stage device time of map_insert at the bench operating point:
    claims, sphere moments, train pair, carve, banking+scatters remainder."""
    import functools

    from gp_compressor_tpu.geometry import patches as patches_mod
    from gp_compressor_tpu.models import sparse_gp
    from gp_compressor_tpu.pallas_kernels import sogp_train
    from gp_compressor_tpu.workloads.compressor import default_params

    lo = np.asarray(jnp.min(pts, 0)) - 0.3
    hi = np.asarray(jnp.max(pts, 0)) + 0.3
    steps = mapping.required_ray_steps(lo, hi, cfg.patch.res)
    rcfg = RegistrationConfig(max_steps=12, min_steps=2, step=0.02)
    Ns = 150_000
    scan0 = (pts[0::2][:Ns], cols[0::2][:Ns], valid[0::2][:Ns])
    scan1 = (pts[1::2][:Ns], cols[1::2][:Ns], valid[1::2][:Ns])
    mcfg = MappingConfig(min_points_new_patch=50, max_ray_steps=steps,
                         carve_stride=4, drop_on_reg_cap=False)
    state = mapping.map_init(cfg, mcfg, lo, hi, dtype=pts.dtype)
    state, _, _, _ = mapping.add_cloud_fused(state, *scan0, cfg, mcfg,
                                             jax.random.key(0), rcfg=rcfg,
                                             use_pallas=True)
    _sync(state.means)
    B = cfg.patch.max_patches
    dt = pts.dtype
    grid = state.grid(cfg.patch.res)

    @jax.jit
    def claims_only(points, valid):
        rot_p = jnp.concatenate([state.rotations, jnp.eye(3, dtype=dt)[None]],
                                0)
        mean_p = jnp.concatenate([state.means, jnp.zeros((1, 3), dt)], 0)
        trained_p = jnp.concatenate([state.created, jnp.zeros((1,), bool)])
        ids_p = jnp.concatenate([state.leaf_ids, jnp.asarray([B], jnp.int32)])
        claim, loc, cl = registration.claim_to_patches(
            grid, rot_p, mean_p, trained_p, points, valid, cfg.patch.res,
            leaf_ids=ids_p)
        return claim, loc, cl

    def run_claims():
        out = claims_only(scan1[0], scan1[2])
        _sync(out[1])
        return out
    t_claims, (claim, loc, cl) = _time(run_claims)

    @jax.jit
    def moments_only(points, valid):
        M, c = patches_mod.sphere_moments(grid, points, valid, cfg.patch)
        return jnp.sum(M) + jnp.sum(c)
    t_mom, _ = _time(lambda: float(moments_only(scan1[0], scan1[2])))

    @jax.jit
    def bank_only(claim, loc, colors, cl):
        Xb, Yb, Cb, Mb = mapping._bank_training_points(
            claim, cl, loc[:, 1:], loc[:, 0], colors, B,
            cfg.patch.max_points_per_patch)
        return Xb, Yb, Cb, Mb
    def run_bank():
        out = bank_only(claim, loc, scan1[1], cl)
        _sync(out[0])
        return out
    t_bank, (Xb, Yb, Cb, Mb) = _time(run_bank)

    dkp, ckp = default_params(cfg)

    @jax.jit
    def train_only(Xb, Yb, Cb, Mb):
        kd, kc = jax.random.split(jax.random.key(3))
        P_ = Xb.shape[1]
        perm = jax.vmap(lambda kk: jax.random.permutation(kk, P_))(
            jax.random.split(kd, B))
        take = lambda a: jnp.take_along_axis(
            a, perm.reshape(perm.shape + (1,) * (a.ndim - 2)), axis=1)
        d = sogp_train.add_points_batch_pallas(
            dkp, cfg.depth_gp, state.depth_gp, take(Xb), take(Yb),
            jnp.take_along_axis(Mb, perm, axis=1))
        c = sogp_train.add_points_batch_pallas(
            ckp, cfg.rgb_gp, state.rgb_gp, take(Xb), take(Cb),
            jnp.take_along_axis(Mb, perm, axis=1))
        return jnp.sum(d.C) + jnp.sum(c.C)
    t_train, _ = _time(lambda: float(train_only(Xb, Yb, Cb, Mb)))

    @jax.jit
    def carve_only(points, hv, hc):
        free = mapping._carve_free_space(
            state, state.key_to_leaf, state.created, state.rotations,
            state.means, state.free, points, hv, hc, cfg, mcfg)
        return jnp.sum(free)
    cs = mcfg.carve_stride
    t_carve, _ = _time(lambda: float(carve_only(
        scan1[0][::cs], (scan1[2] & cl)[::cs], claim[::cs])))

    @jax.jit
    def sanitize_only(d, c):
        probes = patches_mod.prediction_grid(cfg.patch, dt)[::5]
        d2, _ = sparse_gp.sanitize_batch(d, dkp, cfg.depth_gp.s20,
                                         max_pred=10.0 * cfg.patch.res,
                                         probes=probes)
        c2, _ = sparse_gp.sanitize_batch(c, ckp, cfg.rgb_gp.s20,
                                         max_pred=2.5e3, probes=probes)
        return jnp.sum(d2.C) + jnp.sum(c2.C)
    t_san, _ = _time(lambda: float(sanitize_only(state.depth_gp,
                                                 state.rgb_gp)))

    def ins():
        st2, _ = mapping.map_insert(state, scan1[0], scan1[1], scan1[2],
                                    cfg, mcfg, jax.random.key(1),
                                    jnp.asarray(50, jnp.int32),
                                    use_pallas=True)
        _sync(st2.means)
        return st2
    t_ins, _ = _time(ins)
    print(json.dumps({"diag": "insert_stages",
                      "t_claims": round(t_claims, 3),
                      "t_moments": round(t_mom, 3),
                      "t_bank": round(t_bank, 3),
                      "t_train_pair": round(t_train, 3),
                      "t_carve_s4": round(t_carve, 3),
                      "t_sanitize": round(t_san, 3),
                      "t_insert_total": round(t_ins, 3)}), flush=True)


def diag_registration(pts, cols, valid, cfg):
    from gp_compressor_tpu.geometry import transforms

    comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                             jax.random.key(0),
                                             use_pallas=True)
    ang = jnp.asarray([0.004, -0.003, 0.005], pts.dtype)
    t_true = jnp.asarray([0.012, -0.009, 0.006], pts.dtype)
    R_true = transforms.euler_xyz(ang)
    moved = pts @ R_true.T + t_true
    err0 = float(jnp.mean(jnp.linalg.norm(moved - pts, axis=1)))

    def run_cfgs(tag, cmp_, cfgs, dkp=None, ds20=None):
        for step, cap, reclaim, mm in cfgs:
            rcfg = RegistrationConfig(max_steps=cap, step=step,
                                      grad_tol_step_ref=0.1, min_steps=5,
                                      reclaim_every=reclaim, max_motion=mm)
            st, out = registration.register(cmp_, moved, cols, valid, cfg,
                                            rcfg, depth_kp=dkp,
                                            depth_s20=ds20)
            _sync(out)
            t0 = time.perf_counter()
            st, out = registration.register(cmp_, moved, cols, valid, cfg,
                                            rcfg, depth_kp=dkp,
                                            depth_s20=ds20)
            _sync(out)
            wall = time.perf_counter() - t0
            err1 = float(jnp.mean(jnp.linalg.norm(out - pts, axis=1)))
            terr, rerr = registration.registration_error(
                st.R_cloud, st.t_cloud, R_true, t_true)
            print(json.dumps({"diag": "registration", "map": tag,
                              "step": step, "cap": cap, "reclaim": reclaim,
                              "max_motion": mm, "steps": int(st.step_nbr),
                              "wall_s": round(wall, 3),
                              "err0": round(err0, 4),
                              "err1": round(err1, 4),
                              "trans_err": round(float(terr), 4),
                              "rot_err": round(float(rerr), 5)}),
                  flush=True)

    run_cfgs("ref", comp, ((0.02, 60, 4, 0.002), (0.1, 60, 4, 0.002),
                           (0.1, 60, 4, 0.001), (0.005, 60, 4, None)))

    compc, kpc, s20c, _ = compressor.compress_decompress_calibrated(
        pts, cols, valid, cfg, jax.random.key(0), use_pallas=True,
        calib_patches=32, calib_points=64, calib_steps=150, calib_starts=4)
    run_cfgs("calibrated", compc, ((0.005, 60, 4, 0.002),
                                   (0.0005, 60, 4, 0.002),
                                   (0.02, 60, 4, 0.001)),
             dkp=kpc, ds20=s20c)


def diag_nuts(pts, cols, valid, cfg):
    from gp_compressor_tpu.config import HMCConfig
    from gp_compressor_tpu.inference import hmc, nuts

    comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                             jax.random.key(0),
                                             use_pallas=True)
    Xc, yc, mc = compressor.calib_subsample(comp.patch, 16, 48)
    logpost = hmc.make_patch_logpost(Xc, yc, mc.astype(Xc.dtype))
    hcfg = HMCConfig(num_warmup=50, num_samples=100, num_chains=4)
    theta0 = jnp.asarray([np.log(100.0), 0.0, np.log(0.1)], Xc.dtype)
    th0 = theta0[None, :] + 0.2 * jax.random.normal(
        jax.random.key(7), (hcfg.num_chains, 3), Xc.dtype)
    samples, acc, _ = nuts.nuts_sample_chains(logpost, th0,
                                              jax.random.key(1), hcfg)
    _sync(samples)
    t0 = time.perf_counter()
    samples, acc, _ = nuts.nuts_sample_chains(logpost, th0,
                                              jax.random.key(2), hcfg)
    _sync(samples)
    wall = time.perf_counter() - t0
    rhat = hmc.split_rhat(samples)
    mode = jnp.exp(jnp.mean(samples.reshape(-1, 3), axis=0))
    print(json.dumps({"diag": "nuts",
                      "samples_per_s": round(400 / wall, 1),
                      "accept": round(float(jnp.mean(acc)), 3),
                      "max_rhat": round(float(jnp.max(rhat)), 3),
                      "post_mean": [round(float(v), 6) for v in mode]}),
          flush=True)


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    which = sys.argv[1:] or ["mapping", "registration", "nuts"]
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    cfg = make_cfg()
    if "mapping" in which:
        diag_mapping(pts, cols, valid, cfg)
    if "insert" in which:
        diag_insert(pts, cols, valid, cfg)
    if "registration" in which:
        diag_registration(pts, cols, valid, cfg)
    if "nuts" in which:
        diag_nuts(pts, cols, valid, cfg)


if __name__ == "__main__":
    main()
