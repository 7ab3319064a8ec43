import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.geometry import transforms
from gp_compressor_tpu.workloads import compressor, registration

N = 20000
cfg = CompressorConfig(
    patch=PatchConfig(res=0.3, sz=10, max_patches=4096, max_points_per_patch=256),
    depth_gp=GPConfig(capacity=100, slots=128),
    rgb_gp=rgb_gp_config())
rcfg = RegistrationConfig(step=0.005, max_steps=150)
pts_np, cols_np = synthetic.room_cloud(n=2 * N, seed=0)
half = N
comp = compressor.compress(jnp.asarray(pts_np[:half]), jnp.asarray(cols_np[:half]),
                           jnp.ones(half, bool), cfg, jax.random.key(0))
jax.block_until_ready(comp.depth_gp.C)

rng = np.random.default_rng(0)
rotvec = 0.005 * rng.standard_normal(3)
t_true = 0.02 * rng.standard_normal(3)
scan, R_true = synthetic.rigid_transform(pts_np[half:], rotvec, t_true)
ref = pts_np[half:]
cols = jnp.asarray(cols_np[half:])
valid = jnp.ones(half, bool)

tables = jax.jit(registration._map_claim_tables)(comp)
step_fn = jax.jit(lambda pts: registration.compute_transformation(
    comp, pts, cols, valid, cfg, rcfg, tables=tables))

for step in (0.005, 0.001, 0.0002):
    pts = jnp.asarray(scan)
    print(f"--- step={step}")
    for it in range(60):
        delta, ls, cls, nuse = step_fn(pts)
        R = transforms.euler_xyz(step * delta[3:])
        t = step * delta[:3]
        pts = transforms.apply(pts, R, t)
        if it % 10 == 0 or it == 59:
            err = float(jnp.mean(jnp.linalg.norm(pts - ref, axis=1)))
            print(f"  it={it:3d} err={err:.4f} ll={float(ls):.3f} |dt|={float(jnp.linalg.norm(delta[:3])):.4f} |dw|={float(jnp.linalg.norm(delta[3:])):.4f} n={int(nuse)}")
