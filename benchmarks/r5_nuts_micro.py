"""Round-5 NUTS microbenchmark: per-leapfrog cost of the patch-bank
logpost value_and_grad under different small-matrix factorizations, plus
end-to-end nuts_sample_chains wall, on the real TPU.

The bench posterior shape is [16 patches, n=48] x 4 vmapped chains; the
logpost is data-value independent in cost, so the calib bank is synthetic
(no headline-pipeline compile needed).

Per-op dispatch+fetch on the tunnel costs ~25 ms RTT, so every number is
measured as (T_K - T_1)/(K-1) over a K-iteration on-device fori_loop whose
carry folds each iteration's value+grad (DCE-proof).

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r5_nuts_micro.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def synth_bank(B=16, n=48, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    X = jnp.asarray(r.uniform(-0.075, 0.075, (B, n, 2)), dtype)
    y = jnp.asarray(0.01 * r.standard_normal((B, n)), dtype)
    m = jnp.ones((B, n), dtype)
    return X, y, m


def time_pair(fn, *args):
    """fn(K, *args) -> scalar array; returns (t1, tK, per_iter_ms)."""
    K = 65
    float(fn(1, *args))                      # compile both trip counts
    float(fn(K, *args))
    t0 = time.perf_counter(); float(fn(1, *args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn(K, *args))
    tK = time.perf_counter() - t0
    return t1, tK, (tK - t1) / (K - 1) * 1e3


def leapfrog_bench(vag, theta0, nchain=4):
    """K sequential value_and_grads, vmapped over nchain chains."""
    th0 = theta0[None, :] + 0.01 * jnp.arange(nchain, dtype=theta0.dtype)[:, None]

    @jax.jit
    def run(K, th0):
        def one_chain(th):
            def body(i, c):
                s, th = c
                v, g = vag(th + 1e-5 * i)
                return s + v, th + 1e-6 * g
            s, _ = lax.fori_loop(0, K, body, (jnp.asarray(0.0, th.dtype), th))
            return s

        return jnp.sum(jax.vmap(one_chain)(th0))

    return time_pair(run, th0)


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from gp_compressor_tpu.config import HMCConfig
    from gp_compressor_tpu.inference import hmc, nuts
    from gp_compressor_tpu.ops import linalg_f32

    X, y, m = synth_bank()
    theta0 = jnp.asarray([np.log(100.0), 0.0, np.log(0.1)], X.dtype)
    out = {"device": str(jax.devices()[0])}
    e2e_only = "e2e" in sys.argv[1:]

    variants = {}

    # v0: current production path
    lp0 = hmc.make_patch_logpost(X, y, m)
    variants["v0_current"] = nuts._safe_vag(lp0)

    # v1: XLA-native cholesky/solve (numerically WRONG on TPU at these
    # constants — speed bound only)
    def loglik_xla(theta, Xp, yp, mp):
        from gp_compressor_tpu.ops import kernels
        from gp_compressor_tpu.ops.kernels import RBFParams
        sf, l2, s20 = jnp.exp(theta[0]), jnp.exp(theta[1]), jnp.exp(theta[2])
        s20 = s20 + 1e-4 * sf
        kp = RBFParams(sigmaf_sq=sf, l_sq=l2)
        n = Xp.shape[0]
        m2 = mp[:, None] * mp[None, :]
        K = kernels.gram(kp, Xp, Xp) * m2 + jnp.diag(jnp.where(mp > 0, s20, 1.0))
        L = jnp.linalg.cholesky(K)
        ym = yp * mp
        alpha = jax.scipy.linalg.cho_solve((L, True), ym)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)) * mp)
        return -0.5 * (jnp.sum(ym * alpha) + logdet
                       + jnp.sum(mp) * jnp.log(2 * jnp.pi))

    def lp_xla(theta):
        ll = jnp.sum(jax.vmap(loglik_xla, in_axes=(None, 0, 0, 0))(
            theta, X, y, m))
        pm = jnp.asarray((4.6, 0.0, -2.3), X.dtype)
        return ll + jnp.sum(-0.5 * ((theta - pm) / 3.0) ** 2)

    variants["v1_xla_chol"] = nuts._safe_vag(lp_xla)

    # v2: current elementwise routines at full unroll
    saved = linalg_f32._UNROLL
    linalg_f32._UNROLL = 64
    lp2 = hmc.make_patch_logpost(X, y, m)
    variants["v2_unroll_full"] = nuts._safe_vag(lp2)

    for name in (() if e2e_only else list(variants)):
        vag = variants[name]
        if name == "v2_unroll_full":
            linalg_f32._UNROLL = 64
        else:
            linalg_f32._UNROLL = saved
        try:
            t1, tK, per = leapfrog_bench(vag, theta0)
            out[name] = {"t_dispatch_s": round(t1, 4),
                         "per_leapfrog_ms": round(per, 4)}
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, out[name], flush=True)
    linalg_f32._UNROLL = saved

    # end-to-end NUTS at the bench config, current path
    hcfg = HMCConfig(num_warmup=50, num_samples=100, num_chains=4)
    th0 = theta0[None, :] + 0.2 * jax.random.normal(
        jax.random.key(7), (hcfg.num_chains, 3), X.dtype)
    samples, acc, _ = nuts.nuts_sample_chains(lp0, th0, jax.random.key(1),
                                              hcfg)
    float(jnp.sum(samples))
    walls = []
    nlf_total = None
    for i in range(3):
        t0 = time.perf_counter()
        samples, acc, _ = nuts.nuts_sample_chains(lp0, th0,
                                                  jax.random.key(2 + i), hcfg)
        float(jnp.sum(samples))
        walls.append(time.perf_counter() - t0)
    out["nuts_e2e"] = {"wall_s": [round(w, 3) for w in walls],
                      "samples_per_s": round(400 / float(np.median(walls)), 1),
                      "accept": round(float(jnp.mean(acc)), 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
