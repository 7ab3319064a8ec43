"""Scaling efficiency of the sharded compress stage on a virtual CPU mesh.

BASELINE.json's north star asks for multi-device scaling efficiency; real
multi-chip hardware is unavailable in this environment, so this measures
the patch-axis-sharded train+predict stage (the portion of the pipeline
that distributes — the front end is point-parallel and runs once) over
1/2/4/8 virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count).

Caveat recorded with the numbers: virtual devices share the host's cores,
so absolute efficiency is bounded by physical core count and memory
bandwidth; the measurement demonstrates the sharded program and collective
structure, not ICI performance.

Usage: python benchmarks/scaling_cpu_mesh.py
"""

import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # one compute thread per virtual device: device-axis parallelism is
    # then structural instead of hidden inside a shared intra-op pool
    + " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from gp_compressor_tpu.config import (CompressorConfig, GPConfig,  # noqa: E402
                                      PatchConfig, rgb_gp_config)
from gp_compressor_tpu.geometry import patches as patches_mod  # noqa: E402
from gp_compressor_tpu.models import sparse_gp  # noqa: E402
from gp_compressor_tpu.ops.kernels import RBFParams  # noqa: E402
from gp_compressor_tpu.ops.noise import GaussianNoise  # noqa: E402
from gp_compressor_tpu.utils import synthetic  # noqa: E402
from gp_compressor_tpu.workloads import compressor  # noqa: E402


def main():
    n_points = 120_000
    cfg = CompressorConfig(
        patch=PatchConfig(res=0.15, sz=20, max_patches=2048,
                          max_points_per_patch=128,
                          approx_sphere_moments=True),
        depth_gp=GPConfig(capacity=30, slots=32, eps_tol=2.0,
                          dtype=jnp.float32),
        rgb_gp=dataclasses.replace(rgb_gp_config(slots=32, capacity=30),
                                   eps_tol=2.0),
    )
    pts_np, cols_np = synthetic.room_cloud(n=n_points, seed=0)
    pts = jnp.asarray(pts_np, jnp.float32)
    cols = jnp.asarray(cols_np, jnp.float32)
    valid = jnp.ones(n_points, bool)
    batch = compressor.project(pts, cols, valid, cfg,
                               shuffle_key=jax.random.key(0))
    batch = jax.block_until_ready(batch)
    dkp, ckp = compressor.default_params(cfg)
    dnoise = GaussianNoise(s20=jnp.asarray(cfg.depth_gp.s20, jnp.float32))
    cnoise = GaussianNoise(s20=jnp.asarray(cfg.rgb_gp.s20, jnp.float32))
    B = cfg.patch.max_patches
    G = cfg.patch.sz ** 2
    grid_uv = patches_mod.prediction_grid(cfg.patch, jnp.float32)

    def train_predict(X, y, rgb, mask):
        d0 = sparse_gp.init_batch(cfg.depth_gp, X.shape[0])
        c0 = sparse_gp.init_batch(cfg.rgb_gp, X.shape[0])
        d = sparse_gp.add_points_batch(dkp, dnoise, cfg.depth_gp, d0, X, y,
                                       mask)
        c = sparse_gp.add_points_batch(ckp, cnoise, cfg.rgb_gp, c0, X, rgb,
                                       mask)
        q = jnp.broadcast_to(grid_uv, (X.shape[0], G, 2))
        dm, _ = sparse_gp.predict_batch(dkp, cfg.depth_gp.s20, d, q)
        cm, _ = sparse_gp.predict_batch(ckp, cfg.rgb_gp.s20, c, q)
        # global in-sample RMSE: the cross-device reduction
        tm, _ = sparse_gp.predict_batch(dkp, cfg.depth_gp.s20, d, X)
        err2 = jnp.sum(jnp.where(mask, (tm[..., 0] - y[..., 0]) ** 2, 0.0))
        return jnp.sqrt(err2 / jnp.maximum(jnp.sum(mask), 1)), \
            jnp.sum(dm), jnp.sum(cm)

    devices = jax.devices()
    results = {}
    t1 = None
    for d in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devices[:d]).reshape(d, 1), ("data", "chain"))
        sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(a, sh)
                for a in (batch.X, batch.y, batch.rgb, batch.mask)]
        f = jax.jit(train_predict)
        out = jax.block_until_ready(f(*args))        # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(out[0]) + float(out[1])
            times.append(time.perf_counter() - t0)
        wall = min(times)
        if d == 1:
            t1 = wall
        results[d] = {
            "wall_s": round(wall, 3),
            "speedup": round(t1 / wall, 2),
            "efficiency_pct": round(100.0 * t1 / wall / d, 1),
            "rmse": round(float(out[0]), 4),
        }
        print(f"devices={d}: {results[d]}", flush=True)

    out = {"metric": "cpu_mesh_scaling", "n_points": n_points,
           "patches": int(batch.n_leaves), "results": results,
           "note": "virtual devices share host cores; see file docstring"}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_cpu_mesh.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
