"""Per-step registration trajectory at bench scale (round-3 divergence
diagnosis): mirrors registration.register's body under a lax.scan so the
mean alignment error, step norms, and likelihood are visible per step.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r3_reg_traj.py [n_steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import bench
from gp_compressor_tpu.config import RegistrationConfig
from gp_compressor_tpu.geometry import transforms, voxel
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor, registration


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    step = float(sys.argv[2]) if len(sys.argv) > 2 else 0.005
    reclaim = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    cfg = bench_cfg()
    use_pallas = jax.devices()[0].platform != "cpu"

    calibrated = "calib" in sys.argv
    if calibrated:
        comp, kpc, s20c, _ = compressor.compress_decompress_calibrated(
            pts, cols, valid, cfg, jax.random.key(0), use_pallas=use_pallas,
            calib_patches=32, calib_points=64, calib_steps=150,
            calib_lr=0.1, calib_starts=4)
        dkp_override, ds20_override = kpc, s20c
    else:
        comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                                 jax.random.key(0),
                                                 use_pallas=use_pallas)
        dkp_override, ds20_override = None, None
    ang = jnp.asarray([0.004, -0.003, 0.005], pts.dtype)
    t_true = jnp.asarray([0.012, -0.009, 0.006], pts.dtype)
    R_true = transforms.euler_xyz(ang)
    moved = pts @ R_true.T + t_true

    mm = None
    for a in sys.argv[1:]:
        if a.startswith("mm="):
            mm = float(a[3:])
    mode = "rprop" if "rprop" in sys.argv else "fixed"
    rcfg = RegistrationConfig(max_steps=n_steps, step=step,
                              reclaim_every=reclaim, max_motion=mm,
                              step_mode=mode, grad_tol_step_ref=0.1)

    @jax.jit
    def traj(moved):
        dt = moved.dtype
        tables = registration._map_claim_tables(comp)
        batch = comp.patch
        B = batch.rotations.shape[0]
        P = cfg.patch.max_points_per_patch
        centers = voxel.voxel_centers(batch.grid)[:B]
        dkp, ckp = registration.default_params(cfg)
        if dkp_override is not None:
            dkp = dkp_override

        def rebank(p):
            claim, _, claimed = registration._claim_to_map(
                comp, p, valid, cfg, tables=tables)
            Wb, Cb, Mb = registration._bank_points(claim, p, cols, claimed,
                                                   B, P)
            Cb = jnp.where(Mb[..., None], Cb - batch.rgb_means[:, None, :],
                           0.0)
            return Wb, Cb, Mb

        def body(carry, i):
            p, Wb, Cb, Mb, eta, prev = carry
            Wb, Cb, Mb = lax.cond(i % rcfg.reclaim_every == 0,
                                  lambda a: rebank(a[0]), lambda a: a[1:],
                                  (p, Wb, Cb, Mb))
            delta, ls, cls, nu = registration._bank_step(
                comp, cfg, rcfg, dkp, ckp, Wb, Cb, Mb, centers,
                depth_s20=ds20_override)
            if rcfg.step_mode == "rprop":
                flip = delta * prev < 0
                eta = jnp.clip(jnp.where(flip, 0.5 * eta, 1.2 * eta),
                               rcfg.rprop_eta_min, rcfg.rprop_eta_max)
                move = jnp.where(flip, 0.0, jnp.sign(delta)) * eta
                tv, wv = move[:3], move[3:]
                prev = jnp.where(flip, 0.0, delta)
            else:
                tv = rcfg.step * delta[:3]
                wv = rcfg.step * delta[3:]
                if rcfg.max_motion is not None:
                    cap = jnp.asarray(rcfg.max_motion, tv.dtype)
                    tiny = jnp.asarray(1e-30, tv.dtype)
                    tv = tv * jnp.minimum(1.0,
                                          cap / (jnp.linalg.norm(tv) + tiny))
                    wv = wv * jnp.minimum(1.0,
                                          cap / (jnp.linalg.norm(wv) + tiny))
            R = transforms.euler_xyz(wv)
            p = transforms.apply(p, R, tv)
            err = jnp.mean(jnp.linalg.norm(p - pts, axis=1))
            out = (err, jnp.linalg.norm(tv), jnp.linalg.norm(wv), ls, cls,
                   nu.astype(dt), tv[0], tv[1], tv[2])
            return (p, transforms.apply(Wb, R, tv), Cb, Mb, eta, prev), out

        carry0 = (moved, jnp.zeros((B, P, 3), dt), jnp.zeros((B, P, 3), dt),
                  jnp.zeros((B, P), bool), jnp.full((6,), rcfg.rprop_eta0, dt),
                  jnp.zeros((6,), dt))
        _, outs = lax.scan(body, carry0, jnp.arange(n_steps))
        return outs

    outs = [jnp.asarray(o) for o in traj(moved)]
    err0 = float(jnp.mean(jnp.linalg.norm(moved - pts, axis=1)))
    print(json.dumps({"err0": round(err0, 5)}))
    names = ["err", "dt_norm", "dw_norm", "loglik", "color_ll", "n_used",
             "tx", "ty", "tz"]
    for i in range(n_steps):
        row = {"step": i}
        for nme, o in zip(names, outs):
            row[nme] = round(float(o[i]), 6)
        if i < 12 or i % 10 == 0 or i == n_steps - 1:
            print(json.dumps(row))


def bench_cfg():
    import dataclasses

    from gp_compressor_tpu.config import (CompressorConfig, GPConfig,
                                          PatchConfig, rgb_gp_config)
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


if __name__ == "__main__":
    main()
