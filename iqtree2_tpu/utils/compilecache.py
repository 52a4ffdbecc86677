"""Persistent-compile-cache setup that actually works under axon.

Two traps this module exists to avoid:

1. The axon sitecustomize imports jax at interpreter STARTUP, so setting
   JAX_COMPILATION_CACHE_DIR inside the process is too late — the config
   value is already latched as None and the cache silently never
   initializes ("get_executable_and_time: cache is disabled").  The fix
   is jax.config.update on the live config, which works at any time.
2. A world-shared fixed /tmp path invites cross-user permission
   collisions (round-4 ADVICE.md) — default to a per-user directory.

Measured on the v5e tunnel: a fresh process pays ~60-90 s of remote
compiles for the search program set; with the cache enabled the second
process pays ~9 s (deserialization only).
"""

from __future__ import annotations

import os
import tempfile


def default_cache_dir() -> str:
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    try:
        uid = os.getuid()
    except AttributeError:            # non-POSIX
        uid = 0
    return os.path.join(tempfile.gettempdir(), f"jax_cache_u{uid}")


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 0.5) -> str | None:
    """Point jax's persistent compile cache at ``path`` (default: the
    per-user dir).  Returns the path, or None when disabled via
    IQTREE2_TPU_NO_COMPILE_CACHE=1."""
    if os.environ.get("IQTREE2_TPU_NO_COMPILE_CACHE"):
        return None
    import jax
    path = path or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:                 # cache is an optimization only
        return None
    return path
