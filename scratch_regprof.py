import dataclasses, functools, time
import numpy as np
import jax, jax.numpy as jnp
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.geometry import transforms
from gp_compressor_tpu.workloads import compressor, registration
from gp_compressor_tpu.models import sparse_gp

N = 150_000
cfg = CompressorConfig(
    patch=PatchConfig(res=0.4, sz=30, max_patches=2048,
                      max_points_per_patch=256, approx_sphere_moments=True),
    depth_gp=GPConfig(capacity=30, slots=32, eps_tol=2.0),
    rgb_gp=dataclasses.replace(rgb_gp_config(slots=32, capacity=30), eps_tol=2.0),
)
rcfg = RegistrationConfig(step=0.01, max_steps=100, min_steps=10, grad_tol=1e-4)

pts_np, cols_np = synthetic.room_cloud(n=N, seed=0)
pts = jnp.asarray(pts_np); cols = jnp.asarray(cols_np)
valid = jnp.ones(N, bool)
comp = compressor.compress(pts, cols, valid, cfg, jax.random.key(0), use_pallas=True)
jax.block_until_ready(comp.depth_gp.C)

Rt = transforms.euler_xyz(jnp.asarray([0.01, -0.008, 0.012]))
tt = jnp.asarray([0.03, -0.02, 0.025])
scan = transforms.apply(pts, Rt, tt)

def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms")
    return out

tables = jax.jit(registration._map_claim_tables)(comp)
jax.block_until_ready(tables.R)

B = comp.patch.rotations.shape[0]
P = cfg.patch.max_points_per_patch
dkp, ckp = compressor.default_params(cfg)

f_claim = jax.jit(lambda p: registration.claim_with_tables(
    tables, comp.patch.grid, p, valid, cfg.patch.res, out_fill=B))
claim, loc, claimed = timeit("claim_with_tables", f_claim, scan)

cdm = cols - comp.patch.rgb_means[jnp.where(claimed, claim, 0)]
f_bank = jax.jit(lambda c, l, cd, cl: registration._bank_points(c, l, cd, cl, B, P))
Xb, Cb, Mb = timeit("bank_points", f_bank, claim, loc, cdm, claimed)

f_dg = jax.jit(lambda Xb, Mb: registration._depth_density_grads(
    dkp, cfg.depth_gp.s20, comp.depth_gp, Xb, Mb))
timeit("depth grads", f_dg, Xb, Mb)

f_cg = jax.jit(lambda Xb, Cb, Mb: registration._color_density_grads(
    ckp, cfg.rgb_gp.s20, comp.rgb_gp, Xb, Cb, Mb))
timeit("color grads", f_cg, Xb, Cb, Mb)

f_ll = jax.jit(lambda Xb, Mb: jax.vmap(lambda st, x, m: jnp.where(
    m, sparse_gp.likelihood(dkp, cfg.depth_gp.s20, st, x[:, 1:], x[:, :1]),
    0.0))(comp.depth_gp, Xb, Mb))
timeit("depth likelihood", f_ll, Xb, Mb)

f_step = jax.jit(lambda p: registration.compute_transformation(
    comp, p, cols, valid, cfg, rcfg, tables=tables))
timeit("full step", f_step, scan)
print("device:", jax.devices()[0])
