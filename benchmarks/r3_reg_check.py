"""Quick register() end-check on TPU: runs the real while_loop path with a
given config against the calibrated map and reports error decomposition.

Usage: python benchmarks/r3_reg_check.py [reclaim] [blend] [eta0]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from benchmarks.r3_reg_traj import bench_cfg
from gp_compressor_tpu.config import RegistrationConfig
from gp_compressor_tpu.geometry import transforms
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor, registration


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    reclaim = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    blend = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    eta0 = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-3
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    cfg = bench_cfg()
    use_pallas = jax.devices()[0].platform != "cpu"

    if "ref" in sys.argv:
        comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                                 jax.random.key(0),
                                                 use_pallas=use_pallas)
        kpc = s20c = None
    else:
        comp, kpc, s20c, _ = compressor.compress_decompress_calibrated(
            pts, cols, valid, cfg, jax.random.key(0), use_pallas=use_pallas,
            calib_patches=32, calib_points=64, calib_steps=150,
            calib_lr=0.1, calib_starts=4)

    ang = jnp.asarray([0.004, -0.003, 0.005], pts.dtype)
    t_true = jnp.asarray([0.012, -0.009, 0.006], pts.dtype)
    R_true = transforms.euler_xyz(ang)
    moved = pts @ R_true.T + t_true
    err0 = float(jnp.mean(jnp.linalg.norm(moved - pts, axis=1)))

    rcfg = RegistrationConfig(max_steps=80, step_mode="rprop",
                              reclaim_every=reclaim, color_blend=blend,
                              rprop_eta0=eta0)
    st, out = registration.register(comp, moved, cols, valid, cfg, rcfg,
                                    depth_kp=kpc, depth_s20=s20c)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    st, out = registration.register(comp, moved, cols, valid, cfg, rcfg,
                                    depth_kp=kpc, depth_s20=s20c)
    float(jnp.sum(out))
    wall = time.perf_counter() - t0
    err1 = float(jnp.mean(jnp.linalg.norm(out - pts, axis=1)))
    terr, rerr = registration.registration_error(st.R_cloud, st.t_cloud,
                                                 R_true, t_true)
    # truth test: does the composed state reproduce `out`?
    out_state = transforms.apply(moved, st.R_cloud, st.t_cloud)
    err_state = float(jnp.mean(jnp.linalg.norm(out_state - pts, axis=1)))
    state_vs_out = float(jnp.mean(jnp.linalg.norm(out_state - out, axis=1)))
    dR = st.R_cloud @ R_true
    tr = float(jnp.trace(dR))
    print(json.dumps({
        "reclaim": reclaim, "blend": blend, "eta0": eta0,
        "steps": int(st.step_nbr), "wall_s": round(wall, 3),
        "steps_per_s": round(int(st.step_nbr) / wall, 1),
        "err0": round(err0, 5), "err1": round(err1, 5),
        "removed_pct": round(100 * (1 - err1 / err0), 1),
        "trans_err_m": round(float(terr), 5),
        "rot_err_rad": round(float(rerr), 7),
        "err_from_state_pose": round(err_state, 5),
        "state_vs_out_m": round(state_vs_out, 5),
        "trace_dR": round(tr, 7)}))


if __name__ == "__main__":
    main()
