import dataclasses, functools, time
import jax, jax.numpy as jnp
from gp_compressor_tpu.config import CompressorConfig, GPConfig, PatchConfig, rgb_gp_config
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor

N_POINTS = 300_000
cfg = CompressorConfig(
    patch=PatchConfig(res=0.15, sz=20, max_patches=4096,
                      max_points_per_patch=256, approx_sphere_moments=True),
    depth_gp=GPConfig(capacity=30, slots=32, eps_tol=2.0),
    rgb_gp=dataclasses.replace(rgb_gp_config(slots=32, capacity=30), eps_tol=2.0),
)
pts_np, cols_np = synthetic.room_cloud(n=N_POINTS, seed=0)
pts = jnp.asarray(pts_np); cols = jnp.asarray(cols_np)
valid = jnp.ones(pts.shape[0], bool)

@functools.partial(jax.jit, static_argnames=())
def onejit(pts, cols, valid, key):
    batch = compressor.project._fun(pts, cols, valid, cfg) if hasattr(compressor.project, "_fun") else None
    raise SystemExit

# simpler: call the underlying (unjitted) logic inside one jit
from gp_compressor_tpu.geometry import patches as patches_mod

def _pipeline(pts, cols, valid, key):
    batch = patches_mod.build_patches(pts, cols, valid, cfg.patch)
    comp = compressor.train.__wrapped__(batch, cfg, key, use_pallas=True)
    out = compressor.decompress.__wrapped__(comp, cfg)
    s = (jnp.sum(out[0]) + jnp.sum(comp.depth_gp.C) + jnp.sum(comp.rgb_gp.C))
    return s, comp

pipe = jax.jit(_pipeline)
s, comp = pipe(pts, cols, valid, jax.random.key(0))
print("warm", float(s))
ts = []
for i in range(4):
    t0 = time.perf_counter()
    s, comp = pipe(pts, cols, valid, jax.random.key(i))
    float(s)
    ts.append(time.perf_counter() - t0)
print("one-jit pipeline:", [round(t*1e3,1) for t in ts], "ms")
print(N_POINTS/min(ts), "points/s")
