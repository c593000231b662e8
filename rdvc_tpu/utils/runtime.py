"""Process-level runtime knobs: persistent XLA compilation cache.

First-compile latency dominates short runs (and every fresh process repays
it); the persistent cache makes encode/decode/training CLIs warm-start.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/rdvc_tpu/xla")
_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = path or os.environ.get("RDVC_XLA_CACHE", _DEFAULT_CACHE)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
