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


def select_device(gpu):
    """Map the reference's --gpu flag onto jax device selection
    (reference codec_processing.py:1189-1204: -1 -> CPU, N -> cuda:N).

    None or a negative id pins computation to the host CPU; a non-negative
    id picks the N-th accelerator (clamped, falling back to whatever
    devices exist). Returns the selected device after setting it as jax's
    default.
    """
    import jax

    if gpu is None or int(gpu) < 0:
        dev = jax.local_devices(backend="cpu")[0]
    else:
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        pool = accel or jax.devices()
        dev = pool[min(int(gpu), len(pool) - 1)]
    jax.config.update("jax_default_device", dev)
    return dev
