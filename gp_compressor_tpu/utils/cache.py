"""Persistent JAX compilation-cache setup shared by tests and benchmarks.

The cache dir must be keyed by the host CPU signature whenever XLA:CPU may
compile into it: /tmp can survive into a session on DIFFERENT hardware, and
XLA:CPU loads foreign AOT entries with only a warning — a stale cache
produced wrong numerics ("machine type doesn't match ... could lead to
execution errors such as SIGILL"). TPU entries go through the remote-compile
relay and are keyed by the backend, so the plain dir is safe there; keying
everything by platform+signature costs nothing and removes the footgun from
every call site (tests/conftest.py, bench.py, benchmarks/*.py).
"""

from __future__ import annotations

import hashlib
import platform


def cache_dir() -> str:
    """Compilation-cache directory keyed by this host's CPU signature."""
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            sig += "".join(l for l in f
                           if l.startswith(("model name", "flags")))[:4096]
    except OSError:
        pass
    tag = hashlib.sha1(sig.encode()).hexdigest()[:8]
    return f"/tmp/gptpu_jax_cache_cpu_{tag}"


def setup_compilation_cache(min_compile_secs: float = 0.0) -> None:
    """Point jax at the signature-keyed persistent cache (best-effort)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
