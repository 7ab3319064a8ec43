import time
import numpy as np
import jax, jax.numpy as jnp
from gp_compressor_tpu.geometry import voxel
from gp_compressor_tpu.utils import synthetic

N = 300_000
B = 4096
RES = 0.15
pts_np, _ = synthetic.room_cloud(n=N, seed=0)
pts = jnp.asarray(pts_np)
valid = jnp.ones(N, bool)
grid = jax.jit(lambda p, v: voxel.build_grid(p, v, RES, B, 131072))(pts, valid)
offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
R = jax.random.normal(jax.random.key(1), (B, 3, 3))

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

@jax.jit
def lookups_only(grid, pts, valid):
    acc = jnp.zeros(N, jnp.int32)
    keys3 = voxel.point_keys(pts, grid.origin, grid.res)
    for off in offsets:
        cand3 = keys3 + jnp.asarray(off, jnp.int32)[None, :]
        lin = voxel.linearize(cand3, grid.dims)
        idx, exists = voxel.lookup(grid, lin)
        acc = acc + jnp.where(exists, idx, 0)
    return acc

@jax.jit
def gathers_only(grid, pts, R):
    keys3 = voxel.point_keys(pts, grid.origin, grid.res)
    lin0 = voxel.linearize(keys3, grid.dims)
    idx0, _ = voxel.lookup(grid, lin0)
    acc = jnp.zeros((N, 3))
    for k in range(27):
        idx = (idx0 + k) % B
        Rk = R[idx]
        acc = acc + jnp.einsum('nji,nj->ni', Rk, pts)
    return acc

@jax.jit
def one_big_rowgather(grid, pts, Rcand):
    # Rcand: [B, 27*9]; one per-point lookup + one contiguous row gather
    keys3 = voxel.point_keys(pts, grid.origin, grid.res)
    lin0 = voxel.linearize(keys3, grid.dims)
    idx0, _ = voxel.lookup(grid, lin0)
    rows = Rcand[idx0]                       # [N, 243]
    Rk = rows.reshape(N, 27, 3, 3)
    loc = jnp.einsum('nkji,nj->nki', Rk, pts)  # [N,27,3]
    return jnp.min(loc, axis=1)

Rcand = jax.random.normal(jax.random.key(2), (B, 27 * 9))

timeit("27x table lookups only", lookups_only, grid, pts, valid)
timeit("27x R[idx] gathers + einsum", gathers_only, grid, pts, R)
timeit("1 lookup + [N,243] row gather", one_big_rowgather, grid, pts, Rcand)
print("device:", jax.devices()[0])
