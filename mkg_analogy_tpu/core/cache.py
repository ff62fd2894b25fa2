"""Persistent XLA compilation cache.

Compiles of the full-size train step take minutes (more behind a device
tunnel); caching them on disk makes every repeat run start instantly.
Call early, before the first jit execution.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/mkg_jax_cache")


def enable_compilation_cache(path: str = DEFAULT_DIR) -> None:
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
