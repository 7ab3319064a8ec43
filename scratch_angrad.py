import dataclasses, functools, time
import numpy as np
import jax, jax.numpy as jnp
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      RegistrationConfig, rgb_gp_config)
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.geometry import transforms
from gp_compressor_tpu.workloads import compressor, registration
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.ops import kernels

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

B = comp.patch.rotations.shape[0]
P = cfg.patch.max_points_per_patch
dkp, ckp = compressor.default_params(cfg)

tables = jax.jit(registration._map_claim_tables)(comp)
claim, loc, claimed = jax.jit(lambda p: registration.claim_with_tables(
    tables, comp.patch.grid, p, valid, cfg.patch.res, out_fill=B))(scan)
cdm = cols - comp.patch.rgb_means[jnp.where(claimed, claim, 0)]
Xb, Cb, Mb = jax.jit(lambda c, l, cd, cl: registration._bank_points(
    c, l, cd, cl, B, P))(claim, loc, cdm, claimed)
jax.block_until_ready(Xb)

HI = jax.lax.Precision.HIGHEST


def fused_grads(dkp, ds20, cstates_kp, cs20, dstates, cstates, Xb, Cb, Mb,
                prec=HI):
    """Analytic density grads + likelihoods for depth and color banks.

    Xb [B,P,3] rows (y, u, v); Cb [B,P,3] demeaned colors; Mb [B,P].
    Returns dX [B,P,3] depth-density grads (dy,du,dv),
            dCX [B,P,3] color (0,du,dv), ll [B,P], cl [B,P].
    """
    uv = Xb[..., 1:]                                           # [B,P,2]
    y = Xb[..., 0]                                             # [B,P]

    def predict_parts(kp, s20, st):
        act = st.active.astype(Xb.dtype)                       # [B,S]
        bv = st.bv                                             # [B,S,2]
        d2 = (jnp.sum(uv * uv, -1)[..., None]
              - 2.0 * jnp.einsum('bpj,bsj->bps', uv, bv, precision=prec)
              + jnp.sum(bv * bv, -1)[:, None, :])
        k = kp.sigmaf_sq * jnp.exp(-0.5 / kp.l_sq * d2) * act[:, None, :]
        Ck = jnp.einsum('bps,bst->bpt', k, st.C, precision=prec)
        # stacked contraction targets: [alpha | alpha*bv_u | alpha*bv_v]
        Dd = st.alpha.shape[-1]
        W = jnp.concatenate([st.alpha, st.alpha[:, :, None, :].reshape(
            st.alpha.shape[0], st.alpha.shape[1], Dd) * 0.0], axis=-1) \
            if False else None
        m = jnp.einsum('bps,bsd->bpd', k, st.alpha, precision=prec)
        A1 = jnp.einsum('bps,bsjd->bpjd', k,
                        bv[..., None] * st.alpha[:, :, None, :],
                        precision=prec)                        # [B,P,2,D]
        V0 = jnp.sum(k * Ck, -1)                               # [B,P]
        V1 = jnp.einsum('bps,bsj->bpj', k * Ck, bv, precision=prec)  # [B,P,2]
        latent = kp.sigmaf_sq + V0
        var = s20 + jnp.maximum(latent, 0.0)
        vmask = (latent > 0.0).astype(Xb.dtype)
        dm = (A1 - uv[..., None] * m[:, :, None, :]) / kp.l_sq  # [B,P,2,D]
        dvar = 2.0 * (V1 - uv * V0[..., None]) / kp.l_sq * vmask[..., None]
        return m, var, dm, dvar

    # depth GP (D=1)
    m, var, dm, dvar = predict_parts(dkp, ds20, dstates)
    md = m[..., 0]
    r = (y - md) / var
    lp = -0.5 * jnp.log(2 * jnp.pi * var) - 0.5 * (y - md) * r
    pd = jnp.exp(lp)
    dlp_dvar = -0.5 / var + 0.5 * r * r
    dlp_du = r[..., None] * dm[..., 0] + dlp_dvar[..., None] * dvar
    dX = jnp.concatenate([(-pd * r)[..., None], pd[..., None] * dlp_du], -1)
    dX = jnp.where(Mb[..., None], dX, 0.0)
    ll = jnp.where(Mb, pd, 0.0)

    # color GP (D=3, shared var)
    mc, varc, dmc, dvarc = predict_parts(cstates_kp, cs20, cstates)
    rc = (Cb - mc) / varc[..., None]
    lpc = jnp.sum(-0.5 * jnp.log(2 * jnp.pi * varc)[..., None]
                  - 0.5 * (Cb - mc) * rc, -1)
    pc = jnp.exp(lpc)
    dlpc_dvar = jnp.sum(-0.5 / varc[..., None] + 0.5 * rc * rc, -1)
    dlpc_du = jnp.einsum('bpd,bpjd->bpj', rc, dmc) + dlpc_dvar[..., None] * dvarc
    dCX = jnp.concatenate([jnp.zeros_like(pc)[..., None],
                           pc[..., None] * dlpc_du], -1)
    dCX = jnp.where(Mb[..., None], dCX, 0.0)
    cl = jnp.where(Mb, pc, 0.0)
    return dX, dCX, ll, cl


f_new = jax.jit(functools.partial(fused_grads, dkp, cfg.depth_gp.s20, ckp,
                                  cfg.rgb_gp.s20, comp.depth_gp, comp.rgb_gp))
dX2, dCX2, ll2, cl2 = f_new(Xb, Cb, Mb)

# reference values
dX1 = jax.jit(lambda: registration._depth_density_grads(
    dkp, cfg.depth_gp.s20, comp.depth_gp, Xb, Mb))()
dCX1 = jax.jit(lambda: registration._color_density_grads(
    ckp, cfg.rgb_gp.s20, comp.rgb_gp, Xb, Cb, Mb))()
ll1 = jax.jit(lambda: jax.vmap(lambda st, x, m: jnp.where(
    m, sparse_gp.likelihood(dkp, cfg.depth_gp.s20, st, x[:, 1:], x[:, :1]),
    0.0))(comp.depth_gp, Xb, Mb))()

for name, a, b in [("dX", dX1, dX2), ("dCX", dCX1, dCX2), ("ll", ll1, ll2)]:
    d = float(jnp.max(jnp.abs(a - b)))
    s = float(jnp.max(jnp.abs(a)))
    print(f"{name}: maxabs diff {d:.3e}  (scale {s:.3e})")

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

timeit("fused analytic (HI)", f_new, Xb, Cb, Mb)
f_lo = jax.jit(functools.partial(fused_grads, dkp, cfg.depth_gp.s20, ckp,
                                 cfg.rgb_gp.s20, comp.depth_gp, comp.rgb_gp,
                                 prec=jax.lax.Precision.DEFAULT))
dX3, _, _, _ = f_lo(Xb, Cb, Mb)
print("lo-prec dX maxdiff:", float(jnp.max(jnp.abs(dX3 - dX1))))
timeit("fused analytic (DEFAULT)", f_lo, Xb, Cb, Mb)
print("device:", jax.devices()[0])
