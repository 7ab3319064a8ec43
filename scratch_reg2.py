import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.geometry import transforms
from gp_compressor_tpu.workloads import compressor, registration

N = 150_000
cfg = CompressorConfig(
    patch=PatchConfig(res=0.4, sz=30, max_patches=2048,
                      max_points_per_patch=256, approx_sphere_moments=True),
    depth_gp=GPConfig(capacity=30, slots=32, eps_tol=2.0),
    rgb_gp=dataclasses.replace(rgb_gp_config(slots=32, capacity=30), eps_tol=2.0),
)
pts_np, cols_np = synthetic.room_cloud(n=N, seed=0)
pts = jnp.asarray(pts_np); cols = jnp.asarray(cols_np)
valid = jnp.ones(N, bool)
comp = compressor.compress(pts, cols, valid, cfg, jax.random.key(0), use_pallas=True)
jax.block_until_ready(comp.depth_gp.C)

Rt = transforms.euler_xyz(jnp.asarray([0.01, -0.008, 0.012]))
tt = jnp.asarray([0.03, -0.02, 0.025])
scan = transforms.apply(pts, Rt, tt)

for k in (1, 4, 10):
    rcfg = RegistrationConfig(step=0.01, max_steps=100, min_steps=10,
                              grad_tol=1e-4, reclaim_every=k)
    st, out = registration.register(comp, scan, cols, valid, cfg, rcfg)
    _ = float(st.mean_likelihood)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        st, _ = registration.register(comp, scan, cols, valid, cfg, rcfg)
        _ = float(st.mean_likelihood)
        ts.append(time.perf_counter() - t0)
    steps = int(st.step_nbr)
    w = min(ts)
    terr, rerr = registration.registration_error(st.R_cloud, st.t_cloud, Rt, tt)
    print(f"k={k:2d}: {w*1e3:7.1f} ms / {steps} steps = {w/max(steps,1)*1e3:6.2f} ms/step, "
          f"ll={float(st.mean_likelihood):.4f} t_err={float(terr):.5f} r_err={float(rerr):.5f}")
