"""Roofline / stage-share measurement for the headline pipeline
(VERDICT r2 item 10): measure per-stage device wall (project front end,
depth train kernel, RGB train kernel, grid decompress) against the fused
one-jit total, and place the train kernel against simple VPU-FLOP and
HBM-byte ceilings. Writes benchmarks/r3_roofline.json; the narrative lands
in BASELINE.md's roofline paragraph.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r3_roofline.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, PatchConfig,
                                      rgb_gp_config)
from gp_compressor_tpu.models import sparse_gp
from gp_compressor_tpu.pallas_kernels import sogp_train
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor


def timed(fn, n=3):
    out = fn()                                # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)

    cfg = CompressorConfig(
        patch=PatchConfig(res=bench.RES, sz=bench.SZ,
                          max_patches=bench.MAX_PATCHES,
                          max_points_per_patch=bench.MAX_PPP,
                          approx_sphere_moments=True,
                          bank_order="center_out"),
        depth_gp=GPConfig(capacity=bench.TPU_CAPACITY, slots=bench.TPU_SLOTS,
                          eps_tol=bench.TPU_EPS_TOL),
        rgb_gp=dataclasses.replace(
            rgb_gp_config(slots=bench.TPU_SLOTS, capacity=bench.TPU_CAPACITY),
            eps_tol=bench.TPU_EPS_TOL),
    )
    kp = compressor.default_params(cfg)[0]
    ckp = compressor.default_params(cfg)[1]
    B = cfg.patch.max_patches
    S = cfg.depth_gp.slots
    P = cfg.patch.max_points_per_patch
    G = cfg.patch.sz ** 2

    # fused end-to-end
    t_fused, (comp, out) = timed(lambda: (lambda c_o: (
        float(jnp.sum(c_o[1][0]) + jnp.sum(c_o[0].depth_gp.C)), c_o)[1])(
        compressor.compress_decompress(pts, cols, valid, cfg,
                                       jax.random.key(0), use_pallas=True)))

    # stage: project
    def s_project():
        b = compressor.project(pts, cols, valid, cfg)
        _ = float(jnp.sum(b.X))
        return b
    t_proj, batch = timed(s_project)

    # stage: train kernels
    def s_train_depth():
        st = sparse_gp.init_batch(cfg.depth_gp, B)
        st = sogp_train.add_points_batch_pallas(kp, cfg.depth_gp, st,
                                                batch.X, batch.y, batch.mask)
        _ = float(jnp.sum(st.C))
        return st
    t_td, dst = timed(s_train_depth)

    def s_train_rgb():
        st = sparse_gp.init_batch(cfg.rgb_gp, B)
        st = sogp_train.add_points_batch_pallas(ckp, cfg.rgb_gp, st,
                                                batch.X, batch.rgb,
                                                batch.mask)
        _ = float(jnp.sum(st.C))
        return st
    t_tc, cst = timed(s_train_rgb)

    # stage: decompress
    def s_dec():
        o = compressor.decompress(comp, cfg)
        _ = float(jnp.sum(o[0]))
        return o
    t_dec, _o = timed(s_dec)

    # simple ceilings for the train kernel (per GP):
    # VPU flops: ~8 [S,S,L]-sized multiply-add passes per inserted point
    flops = 8.0 * S * S * B * P * 2      # 2 = mul+add
    vpu_peak = 3.0e12                    # ~f32 VPU throughput, v5e ballpark
    # HBM bytes: banks in (X, y/rgb, mask) + state out (C, Q, alpha, bv)
    bytes_banks = B * P * (2 + 1 + 1) * 4
    bytes_state = B * (2 * S * S + S * 3) * 4 * 2
    hbm_bw = 8.0e11                      # ~HBM bandwidth, v5e ballpark
    t_flop_bound = flops / vpu_peak
    t_mem_bound = (bytes_banks + bytes_state) / hbm_bw

    rtt = 0.025                          # measured tunnel dispatch+fetch RTT
    result = {
        "fused_wall_s": round(t_fused, 4),
        "stage_wall_s": {"project": round(t_proj - rtt, 4),
                         "train_depth": round(t_td - rtt, 4),
                         "train_rgb": round(t_tc - rtt, 4),
                         "decompress": round(t_dec - rtt, 4)},
        "note": "per-stage walls include one dispatch each; ~25 ms tunnel "
                "RTT already subtracted (stage sum > fused is RTT +"
                " recompute overlap)",
        "train_kernel_ceilings_s": {
            "vpu_flop_bound": round(t_flop_bound, 5),
            "hbm_byte_bound": round(t_mem_bound, 5)},
        "train_kernel_flops": flops,
        "shapes": {"B": B, "S": S, "P": P, "G": G},
    }
    print(json.dumps(result), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r3_roofline.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
