import time, functools
import jax, jax.numpy as jnp

B, P, S = 2048, 256, 32
key = jax.random.key(0)
Xb = jax.random.normal(key, (B, P, 2))
k0 = jax.random.normal(key, (B, P, S))
bv = jax.random.normal(key, (B, S, 2))
C = jax.random.normal(key, (B, S, S))
al = jax.random.normal(key, (B, S, 1))

HI = jax.lax.Precision.HIGHEST

def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.2f} ms")
    return out

timeit("trivial (Xb + 1)", jax.jit(lambda x: x + 1.0), Xb)
timeit("sum(Xb)", jax.jit(lambda x: jnp.sum(x)), Xb)

f_d2 = jax.jit(lambda uv, bv: jnp.sum(
    (uv[:, :, None, :] - bv[:, None, :, :]) ** 2, -1))
d2 = timeit("d2 difference form [B,P,S]", f_d2, Xb, bv)

f_k = jax.jit(lambda d2: 100.0 * jnp.exp(-0.5 * d2))
k = timeit("k = exp(d2)", f_k, d2)

f_ck_hi = jax.jit(lambda k, C: jnp.einsum('bps,bst->bpt', k, C, precision=HI))
timeit("Ck einsum HIGHEST", f_ck_hi, k, C)
f_ck_lo = jax.jit(lambda k, C: jnp.einsum('bps,bst->bpt', k, C))
timeit("Ck einsum DEFAULT", f_ck_lo, k, C)

f_m = jax.jit(lambda k, al: jnp.einsum('bps,bsd->bpd', k, al, precision=HI))
timeit("m einsum (S->1) HIGHEST", f_m, k, al)

# fused chain: d2 -> k -> Ck -> reduce
@jax.jit
def chain(uv, bv, C, al):
    d2 = jnp.sum((uv[:, :, None, :] - bv[:, None, :, :]) ** 2, -1)
    k = 100.0 * jnp.exp(-0.5 * d2)
    Ck = jnp.einsum('bps,bst->bpt', k, C, precision=HI)
    m = jnp.einsum('bps,bsd->bpd', k, al, precision=HI)
    return jnp.sum(k * Ck, -1), m
timeit("chain d2+k+Ck+m", chain, Xb, bv, C, al)

# same with P folded into lanes-friendly layout: [B*P, S] x block-diag? try 2D matmul
k2 = k.reshape(B * P, S)
C2 = C  # per-batch
f_bmm = jax.jit(lambda k, C: jax.lax.dot_general(
    k, C, (((2,), (1,)), ((0,), (0,))), precision=HI))
timeit("dot_general batched", f_bmm, k, C)
print("device:", jax.devices()[0])
