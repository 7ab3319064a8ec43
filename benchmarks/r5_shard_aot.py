"""Record the bench-shape AOT sharding report (VERDICT r4 weak #4) to
benchmarks/r5_shard_aot.json.

Runs on the virtual 8-device CPU mesh — compile-only, no TPU needed:
    JAX_PLATFORMS=cpu python benchmarks/r5_shard_aot.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import bench
from gp_compressor_tpu.config import (CompressorConfig, GPConfig, MeshConfig,
                                      PatchConfig, RegistrationConfig,
                                      rgb_gp_config)
from gp_compressor_tpu.parallel import mesh as mesh_lib
from gp_compressor_tpu.parallel.aot_check import aot_shard_report


def main():
    from gp_compressor_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
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
            eps_tol=bench.TPU_EPS_TOL))
    m = mesh_lib.make_mesh(MeshConfig())
    rep = aot_shard_report(cfg, 120_000, m,
                           rcfg=RegistrationConfig(max_steps=80,
                                                   step_mode="rprop"))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r5_shard_aot.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
