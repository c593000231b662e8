"""Codec checkpoint save/load (flax msgpack serialization).

Fills the role of the reference's .pth.tar checkpoints
(/root/reference/new_train.py:354-447, 1051-1056): model variables plus a
config snapshot and training metadata. Entropy-bottleneck CDF tables are
NOT stored — they are rebuilt deterministically from the checkpoint params
at load (the reference's update(force=True) invariant,
codec_processing.py:869-886).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

_MAGIC = b"RDVCCKPT"


def save_checkpoint(
    path: str,
    variables: Dict[str, Any],
    metadata: Optional[Dict[str, Any]] = None,
    cast_dtype: Optional[np.dtype] = None,
) -> None:
    """Write variables (params + batch_stats [+ opt_state...]) + metadata.

    cast_dtype (e.g. np.float16) halves on-disk size; load_checkpoint casts
    leaves back to the template's dtypes, so storage precision is
    transparent to the caller."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if cast_dtype is not None:
        def cast(x):
            a = np.asarray(x)
            return a.astype(cast_dtype) if np.issubdtype(
                a.dtype, np.floating
            ) else a

        import jax

        variables = jax.tree_util.tree_map(cast, variables)
    payload = serialization.to_bytes(variables)
    meta = json.dumps(metadata or {}).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(len(meta).to_bytes(8, "big"))
        f.write(meta)
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Dict[str, Any]):
    """Load into the structure of `template` (from model.init).

    Returns (variables, metadata). Missing/extra keys are tolerated the way
    the reference loads with strict=False (new_train.py:397-411): the
    template provides defaults for anything absent in the file.
    """
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"not an rdvc checkpoint: {path}")
        meta_len = int.from_bytes(f.read(8), "big")
        metadata = json.loads(f.read(meta_len).decode("utf-8"))
        payload = f.read()
    variables = serialization.from_bytes(template, payload)
    # Restore the template's dtypes (storage may be reduced precision).
    import jax

    # NOTE: read .dtype directly — np.asarray on a template leaf would pull
    # every device array back to the host (slow and flaky over the relay).
    variables = jax.tree_util.tree_map(
        lambda stored, tmpl: np.asarray(stored).astype(tmpl.dtype)
        if hasattr(tmpl, "dtype")
        else stored,
        variables,
        template,
    )
    return variables, metadata


def tree_size_bytes(tree) -> int:
    import jax

    return sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(tree)
    )
