"""Persistent XLA compilation cache.

Large fused programs (the flagship sliding-window sweep with mirror TTA)
can take many minutes to compile on remote-attached TPUs; the persistent
cache makes every later process start-up near-instant for already-seen
shapes. Enabled by all CLIs and bench.py; cache location overridable via
DEEPWMH_COMPILE_CACHE.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "deepwmh_tpu", "xla_cache"
)
_enabled = False


def enable_compilation_cache(path: str = None) -> str:
    global _enabled
    cache_dir = path or os.environ.get("DEEPWMH_COMPILE_CACHE", _DEFAULT)
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable time to compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass
    return cache_dir
