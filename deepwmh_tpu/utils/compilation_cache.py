"""Persistent XLA compilation cache.

Large fused programs (the flagship sliding-window sweep with mirror TTA)
can take many minutes to compile; the persistent cache makes later process
start-ups near-instant for already-seen shapes on standard TPU hosts.
(Remote-attach backends that compile server-side, like axon, don't benefit
— measured — but the call is harmless there.)

Enabled by every CLI and bench.py; location overridable via
DEEPWMH_COMPILE_CACHE. Best-effort: any failure degrades to no caching
with a warning, never aborts the run.
"""

from __future__ import annotations

import os
import warnings

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "deepwmh_tpu", "xla_cache"
)
_active_dir = None


def enable_compilation_cache(path: str = None) -> str:
    """Enable the cache (idempotent). Returns the ACTIVE cache directory,
    or '' when caching could not be enabled."""
    global _active_dir
    if _active_dir is not None:
        if path is not None and os.path.abspath(path) != _active_dir:
            warnings.warn(
                "compilation cache already active at %s; ignoring %s"
                % (_active_dir, path)
            )
        return _active_dir
    cache_dir = os.path.abspath(
        path or os.environ.get("DEEPWMH_COMPILE_CACHE", _DEFAULT)
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        _active_dir = cache_dir
        return cache_dir
    except Exception as e:
        warnings.warn("persistent compilation cache disabled: %s" % e)
        return ""
