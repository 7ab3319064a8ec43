"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh (the multi-chip pattern the
reference lacks entirely — SURVEY.md §4 "multi-node testing: N/A") and with
x64 enabled so parity tests against the float64 serial oracle are tight.

NOTE: the ambient environment pins JAX_PLATFORMS=axon (a single-client real
TPU tunnel) and a sitecustomize imports jax at interpreter start, so the
env var is already captured before this file runs. `jax.config.update`
still wins after import — tests must never touch the TPU tunnel; only
bench.py uses it.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeated test sessions (and the CLI
# subprocess smoke tests) skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/gptpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
