import dataclasses, functools, time
import jax, jax.numpy as jnp
from gp_compressor_tpu.config import CompressorConfig, GPConfig, PatchConfig, rgb_gp_config
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor
from gp_compressor_tpu.geometry import patches as patches_mod
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.pallas_kernels import sogp_train
from gp_compressor_tpu.ops.kernels import RBFParams

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
key = jax.random.key(0)

batch = compressor.project(pts, cols, valid, cfg)
jax.block_until_ready(batch.X)

def timeit(name, fn, *args, reps=3):
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

B = batch.mask.shape[0]
P = batch.X.shape[1]
dkp, ckp = compressor.default_params(cfg)

@jax.jit
def f_perm(batch, key):
    kd, _ = jax.random.split(key)
    perm = jax.vmap(lambda k: jax.random.permutation(k, P))(jax.random.split(kd, B))
    take = lambda a: jnp.take_along_axis(
        a, perm.reshape(perm.shape + (1,) * (a.ndim - 2)), axis=1)
    Xs, ys, rs = take(batch.X), take(batch.y), take(batch.rgb)
    ms = jnp.take_along_axis(batch.mask, perm, axis=1)
    return Xs, ys, rs, ms

Xs, ys, rs, ms = timeit("perm+take", f_perm, batch, key)

dstates = sparse_gp.init_batch(cfg.depth_gp, B)
cstates = sparse_gp.init_batch(cfg.rgb_gp, B)

kd = functools.partial(sogp_train.add_points_batch_pallas, dkp, cfg.depth_gp)
kc = functools.partial(sogp_train.add_points_batch_pallas, ckp, cfg.rgb_gp)
d2 = timeit("kernel depth (D=1)", kd, dstates, Xs, ys, ms)
c2 = timeit("kernel rgb (D=3)", kc, cstates, Xs, rs, ms)

probes = patches_mod.prediction_grid(cfg.patch, batch.X.dtype)
san = jax.jit(lambda s: sparse_gp.sanitize_batch(s, dkp, cfg.depth_gp.s20,
                                                 max_pred=1.5, probes=probes)[0])
timeit("sanitize depth", san, d2)

trainf = lambda b: compressor.train(b, cfg, key, use_pallas=True)
timeit("train total", trainf, batch)
print("device:", jax.devices()[0])
