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
# subprocess smoke tests) skip recompiles. The dir is keyed by the host's
# CPU model (utils/cache.py): /tmp can survive into a session on DIFFERENT
# hardware, and XLA:CPU loads foreign AOT entries with only a warning —
# round 4 lost an hour to a stale cache producing wrong numerics ("machine
# type doesn't match ... could lead to execution errors such as SIGILL").
from gp_compressor_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache(min_compile_secs=1.0)
