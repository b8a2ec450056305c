"""Opt-out persistent XLA compilation cache for the device engines.

Remote TPU compiles of the scan/cascade programs take ~40-140 s; the JAX
persistent cache makes every later process pay seconds instead.  Enabled
lazily the first time a device engine builds a jitted program, so merely
importing the package never touches global JAX config.

Env knobs:
  PYAHOCORASICK_TPU_COMPILE_CACHE=0    disable
  JAX_COMPILATION_CACHE_DIR=<path>     cache location (default /tmp/jax_cache)
"""

from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("PYAHOCORASICK_TPU_COMPILE_CACHE", "1") == "0":
        return
    try:
        import jax

        # respect an explicit user configuration
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # noqa: BLE001 — the cache is an optimization only
        pass
