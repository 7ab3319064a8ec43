"""No-U-Turn Sampler over GP hyperparameters.

Dynamic-trajectory HMC (Hoffman & Gelman 2014) with multinomial progressive
sampling and biased trajectory selection (Betancourt 2017), dual-averaging
step-size warmup shared with inference.hmc.

Implementation note: hyperparameter spaces here are tiny (dim = 3), so the
trajectory stores *every* leapfrog state in a [2^max_depth, dim] buffer and
performs the sub-tree U-turn checks by direct indexing — far simpler than
the checkpoint-stack formulation and free at this dimensionality. The whole
sampler jits; chains `vmap` and shard over the mesh `chain` axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gp_compressor_tpu.config import HMCConfig


class _Z(NamedTuple):
    theta: jnp.ndarray
    p: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray

    def energy(self, inv_mass):
        return self.logp - 0.5 * jnp.sum(inv_mass * self.p * self.p)


def _safe_vag(logpost):
    """value_and_grad with non-finite sanitization: any theta where the
    posterior (or its gradient) is non-finite evaluates to logp = -inf,
    grad = 0. Without this, a single huge leapfrog that overflows theta to
    +-inf makes the PRIOR's gradient -(theta - mu)/sigma^2 infinite, the
    next momentum NaN, and the NaN reaches the accept statistic -> dual
    averaging h_bar -> step size: the chain then silently freezes at its
    init (every NaN proposal is rejected) and split-R-hat explodes
    (measured on TPU: accept = NaN, R-hat 18 on the frozen chain). -inf/0
    instead makes such trajectories ordinary rejected divergences.
    """
    vag = jax.value_and_grad(logpost)

    def lg(th):
        v, g = vag(th)
        bad = ~(jnp.isfinite(v) & jnp.all(jnp.isfinite(g)))
        v = jnp.where(bad, -jnp.inf, v)
        g = jnp.where(bad, 0.0, g)
        return v, g

    return lg


def _leapfrog(lg, z: _Z, eps, inv_mass) -> _Z:
    p = z.p + 0.5 * eps * z.grad
    theta = z.theta + eps * inv_mass * p
    logp, grad = lg(theta)
    p = p + 0.5 * eps * grad
    return _Z(theta, p, logp, grad)


def _uturn(theta_m, p_m, theta_p, p_p, inv_mass):
    d = theta_p - theta_m
    return (jnp.sum(d * (inv_mass * p_m)) < 0.0) | \
           (jnp.sum(d * (inv_mass * p_p)) < 0.0)


def nuts_step(logpost: Callable, theta0, key, eps, inv_mass,
              max_depth: int = 8):
    """One NUTS transition. Returns (theta, accept_stat, n_leapfrog).

    The doubling loop is a `lax.while_loop` over a DYNAMIC depth: a
    trajectory that U-turns at depth d costs 2^(d+1)-1 leapfrogs, not the
    2^max_depth-1 an unrolled loop would always pay. Typical trees stop at
    depth 2-4, so this is ~10-60x fewer model-gradient evaluations per
    transition than the fully-unrolled form (under vmap the loop runs until
    the slowest chain finishes — still the max over chains, not 2^max)."""
    lg = _safe_vag(logpost)
    dim = theta0.shape[0]
    Lmax = 1 << max_depth

    kp, key = jax.random.split(key)
    p0 = jax.random.normal(kp, (dim,)) / jnp.sqrt(inv_mass)
    logp0, grad0 = lg(theta0)
    z0 = _Z(theta0, p0, logp0, grad0)
    H0 = z0.energy(inv_mass)

    # trajectory state
    class Carry(NamedTuple):
        z_minus: _Z
        z_plus: _Z
        z_sample: _Z
        log_w_total: jnp.ndarray   # log sum of subtree weights so far
        turning: jnp.ndarray
        diverged: jnp.ndarray
        sum_acc: jnp.ndarray       # accept-stat accumulator
        n_lf: jnp.ndarray
        depth: jnp.ndarray
        key: jax.Array

    carry = Carry(z0, z0, z0, jnp.asarray(0.0), jnp.asarray(False),
                  jnp.asarray(False), jnp.asarray(0.0),
                  jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), key)

    # buffers for the current subtree's states
    def build_and_merge(carry: Carry):
        depth = carry.depth
        n = jnp.left_shift(1, depth)                  # dynamic subtree size
        kdir, ksel, kin, knext = jax.random.split(carry.key, 4)
        go_right = jax.random.bernoulli(kdir)
        z_start = jax.tree.map(
            lambda a, b: jnp.where(go_right, a, b), carry.z_plus,
            carry.z_minus)
        step_eps = jnp.where(go_right, eps, -eps)
        dirsign = jnp.where(go_right, 1.0, -1.0)

        thetas0 = jnp.zeros((Lmax, dim))
        ps0 = jnp.zeros((Lmax, dim))

        def leaf(i, st):
            (z, thetas, ps, log_w, z_prop, turning, diverged, sum_acc,
             rng) = st
            z = _leapfrog(lg, z, step_eps, inv_mass)
            h = z.energy(inv_mass)
            dh = h - H0
            div = dh < -1000.0
            lw = jnp.where(jnp.isfinite(dh), dh, -jnp.inf)
            # progressive multinomial sampling within the subtree
            log_w_new = jnp.logaddexp(log_w, lw)
            rng, ks = jax.random.split(rng)
            take = jnp.log(jax.random.uniform(ks)) < (lw - log_w_new)
            z_prop = jax.tree.map(
                lambda a, b: jnp.where(take, a, b), z, z_prop)
            sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(dh))
            thetas = thetas.at[i].set(z.theta)
            ps = ps.at[i].set(z.p)

            # sub-U-turn checks: leaf i closes blocks of size 2^k whenever
            # (i+1) % 2^k == 0; compare against the block's first leaf
            def check(k, t):
                blk = jnp.left_shift(1, k)
                closes = ((i + 1) % blk) == 0
                first = i + 1 - blk
                th_f = thetas[jnp.maximum(first, 0)]
                p_f = ps[jnp.maximum(first, 0)]
                # the U-turn displacement must be in TIME order: for a
                # backward subtree the first-integrated leaf is the latest
                # in time, so the sign flips with the direction
                d = (z.theta - th_f) * dirsign
                ut = (jnp.sum(d * (inv_mass * p_f)) < 0.0) | \
                     (jnp.sum(d * (inv_mass * z.p)) < 0.0)
                return t | (closes & ut)

            turning = lax.fori_loop(1, depth + 1, check, turning)
            diverged = diverged | div
            return (z, thetas, ps, log_w_new, z_prop, turning, diverged,
                    sum_acc, rng)

        st0 = (z_start, thetas0, ps0, jnp.asarray(-jnp.inf), z_start,
               jnp.asarray(False), jnp.asarray(False), jnp.asarray(0.0), kin)
        (z_end, thetas, ps, log_w_sub, z_prop, sub_turning, diverged,
         sum_acc_sub, _) = lax.fori_loop(0, n, leaf, st0)

        # biased trajectory sampling between old trajectory and new subtree
        accept_sub = jnp.log(jax.random.uniform(ksel)) < \
            (log_w_sub - carry.log_w_total)
        ok = ~(sub_turning | diverged)
        z_sample = jax.tree.map(
            lambda a, b: jnp.where(accept_sub & ok, a, b), z_prop,
            carry.z_sample)
        log_w_total = jnp.where(ok, jnp.logaddexp(carry.log_w_total,
                                                  log_w_sub),
                                carry.log_w_total)

        z_minus = jax.tree.map(lambda a, b: jnp.where(go_right | ~ok, a, b),
                               carry.z_minus, z_end)
        z_plus = jax.tree.map(lambda a, b: jnp.where(go_right & ok, a, b),
                              z_end, carry.z_plus)
        whole_turn = _uturn(z_minus.theta, z_minus.p, z_plus.theta,
                            z_plus.p, inv_mass)
        turning = carry.turning | sub_turning | whole_turn | diverged
        return Carry(z_minus, z_plus, z_sample, log_w_total, turning,
                     carry.diverged | diverged,
                     carry.sum_acc + sum_acc_sub,
                     carry.n_lf + n, depth + 1, knext)

    carry = lax.while_loop(
        lambda c: (~c.turning) & (c.depth < max_depth),
        build_and_merge, carry)

    acc_stat = carry.sum_acc / jnp.maximum(carry.n_lf, 1)
    return carry.z_sample.theta, acc_stat, carry.n_lf


def find_reasonable_step_size(logpost: Callable, theta0, key, inv_mass,
                              eps0, max_doublings: int = 30):
    """Hoffman & Gelman (2014) Algorithm 4: double/halve eps until the
    one-leapfrog acceptance ratio crosses 1/2. Costs ~10 single leapfrogs
    and saves the dual-averaging warmup from starting orders of magnitude
    off scale — a blind eps that is 100x too large makes every early
    warmup trajectory a full 2^max_depth-leapfrog divergent tree."""
    lg = _safe_vag(logpost)
    p0 = jax.random.normal(key, theta0.shape, theta0.dtype) / \
        jnp.sqrt(inv_mass)
    logp0, grad0 = lg(theta0)
    z0 = _Z(theta0, p0, logp0, grad0)
    H0 = z0.energy(inv_mass)

    def logr_at(eps):
        z = _leapfrog(lg, z0, eps, inv_mass)
        logr = z.energy(inv_mass) - H0
        return jnp.where(jnp.isfinite(logr), logr, -jnp.inf)

    eps0 = jnp.asarray(eps0, theta0.dtype)
    logr0 = logr_at(eps0)
    a = jnp.where(logr0 > jnp.log(0.5), 1.0, -1.0).astype(theta0.dtype)

    def cond(c):
        eps, logr, it = c
        return (a * logr > -a * jnp.log(2.0)) & (it < max_doublings)

    def body(c):
        eps, logr, it = c
        eps = eps * jnp.exp2(a)
        return eps, logr_at(eps), it + 1

    eps, _, _ = lax.while_loop(cond, body,
                               (eps0, logr0, jnp.asarray(0, jnp.int32)))
    # non-finite logpost(theta0) makes logr -inf for EVERY eps: the search
    # would burn all halvings and return eps0 * 2^-30, seeding dual
    # averaging with mu = log(10 eps) absurdly small (ADVICE r2). Keep the
    # caller's eps0 unchanged in that regime — warmup adapts from there.
    return jnp.where(jnp.isfinite(logp0), eps, eps0)


def nuts_warmup_and_sample(logpost: Callable, theta0: jnp.ndarray,
                           key: jax.Array, cfg: HMCConfig,
                           adapt_mass: bool = False):
    """Warmup then sampling, single chain.
    Returns (samples [num_samples, dim], mean accept-stat, step size).

    Warmup is two-phase (Stan-style windowed adaptation, simplified):
    phase 1 (half the budget) dual-averages the step size under a unit
    mass matrix while collecting draws; the second half of those draws
    estimates a DIAGONAL mass matrix (inv_mass = posterior variance,
    shrunk toward identity), and phase 2 re-adapts the step size under it.
    Rationale (measured on the bench patch-bank posterior): the log-scale
    hyperparameters have posterior scales spanning ~10x, so unit-mass
    trajectories need 1-2 extra tree doublings to traverse the slow
    direction — mass adaptation halves the leapfrogs/sample, which is the
    whole cost (each leapfrog is a latency-bound [B, n, n] elementwise
    Cholesky sweep forward + backward). adapt_mass defaults OFF: on the
    bench patch-bank posterior (3 log-scale dims of comparable posterior
    scale) the adapted mass bought no tree-depth reduction while the
    doubled warmup budget it needs cut end-to-end samples/s in half
    (measured round 4: 25.9/s at warmup 120 + mass vs ~49/s unit-mass at
    warmup 50) — enable it for posteriors with real scale anisotropy."""
    dim = theta0.shape[0]
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def da_phase(theta, inv_mass, n, key, collect: bool):
        """Dual-averaging warmup phase of n steps; optionally collect
        draws. Returns (theta, adapted eps, draws [n, dim] or None)."""
        key, kf = jax.random.split(key)
        eps0 = find_reasonable_step_size(logpost, theta, kf, inv_mass,
                                         cfg.init_step_size)
        mu = jnp.log(10.0 * eps0)

        def body(carry, m):
            theta, eps, h_bar, log_eps_bar, key = carry
            key, sub = jax.random.split(key)
            theta, acc, _ = nuts_step(logpost, theta, sub, eps, inv_mass,
                                      cfg.max_tree_depth)
            mf = m.astype(jnp.float32) + 1.0
            eta = 1.0 / (mf + t0)
            h_bar = (1.0 - eta) * h_bar + eta * (cfg.target_accept - acc)
            log_eps = mu - jnp.sqrt(mf) / gamma * h_bar
            w = mf ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            carry = (theta, jnp.exp(log_eps), h_bar, log_eps_bar, key)
            return carry, (theta if collect else None)

        (theta, _, _, log_eps_bar, _), draws = lax.scan(
            body, (theta, eps0, jnp.asarray(0.0), jnp.asarray(0.0), key),
            jnp.arange(n))
        return theta, jnp.exp(log_eps_bar), draws

    key, k1 = jax.random.split(key)
    inv_mass = jnp.ones(dim)
    if adapt_mass and cfg.num_warmup >= 100:
        # a short phase-1 window (e.g. 25 draws at warmup=50) can estimate
        # a near-zero variance on an axis where the chain barely moved —
        # the clipped inv_mass then freezes that axis and the chain never
        # mixes (measured: accept 0.77, split-R-hat 8.3 at warmup=50).
        # Only adapt with a real budget, and floor every axis at 1% of the
        # largest so no direction can collapse.
        n1 = cfg.num_warmup // 2
        theta, eps, draws = da_phase(theta0, inv_mass, n1, k1, collect=True)
        # variance over the settled half of phase 1, shrunk toward identity
        # (Stan's regularization) — guards the few-draw estimate
        tail = draws[n1 // 2:]
        m = tail.shape[0]
        var = jnp.var(tail, axis=0)
        inv_mass = (m / (m + 5.0)) * var + 1e-3 * (5.0 / (m + 5.0))
        inv_mass = jnp.clip(inv_mass, 1e-2 * jnp.max(inv_mass), 1e6)
        key, k2 = jax.random.split(key)
        theta, eps, _ = da_phase(theta, inv_mass,
                                 cfg.num_warmup - n1, k2, collect=False)
    else:
        theta, eps, _ = da_phase(theta0, inv_mass, cfg.num_warmup, k1,
                                 collect=False)

    def sample_body(carry, k):
        theta = carry
        theta, acc, nlf = nuts_step(logpost, theta, k, eps, inv_mass,
                                    cfg.max_tree_depth)
        return theta, (theta, acc, nlf)

    keys = jax.random.split(key, cfg.num_samples)
    _, (samples, accs, nlfs) = lax.scan(sample_body, theta, keys)
    return samples, jnp.mean(accs), eps


def nuts_sample_chains(logpost: Callable, theta0: jnp.ndarray,
                       key: jax.Array, cfg: HMCConfig):
    """theta0: [C, dim] -> samples [C, num_samples, dim]; chains vmap and
    shard over the mesh chain axis."""
    keys = jax.random.split(key, theta0.shape[0])
    f = jax.vmap(lambda t0, k: nuts_warmup_and_sample(logpost, t0, k, cfg))
    return f(theta0, keys)
