"""Opt-out persistent XLA compilation cache for the device engines.

Remote TPU compiles of the scan/cascade programs take ~40-140 s; the JAX
persistent cache makes every later process pay seconds instead.  Enabled
lazily the first time a device engine builds a jitted program, so merely
importing the package never touches global JAX config.

The default location is per-user (~/.cache/pyahocorasick_tpu/jax, mode
0700): a world-shared path like /tmp/jax_cache could be pre-created by
another local user and poisoned with crafted serialized executables that a
victim process would deserialize.

Env knobs:
  PYAHOCORASICK_TPU_COMPILE_CACHE=0    disable
  JAX_COMPILATION_CACHE_DIR=<path>     cache location (overrides default)
"""

from __future__ import annotations

import os

_done = False


def _default_cache_dir() -> str | None:
    """Per-user cache dir, created 0700; None if it cannot be secured."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    path = os.path.join(base, "pyahocorasick_tpu", "jax")
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
        st = os.stat(path)
        if st.st_uid != os.getuid() or (st.st_mode & 0o077):
            return None  # someone else's dir, or group/world accessible
    except OSError:
        return None
    return path


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
            path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
                _default_cache_dir()
            )
            if path is None:
                return
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # noqa: BLE001 — the cache is an optimization only
        pass
