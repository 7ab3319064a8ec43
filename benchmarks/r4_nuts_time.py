"""Standalone NUTS + ADVI timing at the bench operating point (VERDICT r3
next #7: 49 -> >=100 samples/s). Reuses bench.bench_nuts verbatim so the
number is the same one BENCH_r{N}.json records.

Usage (NEVER concurrently with another TPU process):
    python benchmarks/r4_nuts_time.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from gp_compressor_tpu.utils import synthetic
from gp_compressor_tpu.workloads import compressor


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from benchmarks.r3_reg_traj import bench_cfg
    cfg = bench_cfg()
    pts_np, cols_np = synthetic.room_cloud(n=bench.N_POINTS, seed=0)
    pts = jnp.asarray(pts_np)
    cols = jnp.asarray(cols_np)
    valid = jnp.ones(pts.shape[0], bool)
    use_pallas = jax.devices()[0].platform != "cpu"
    comp, _ = compressor.compress_decompress(pts, cols, valid, cfg,
                                             jax.random.key(0),
                                             use_pallas=use_pallas)
    out = bench.bench_nuts(pts, cols, valid, cfg, comp, use_pallas)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
