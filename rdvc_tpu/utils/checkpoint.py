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
import logging
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

log = logging.getLogger(__name__)

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


def _merge_state(template, stored, path=""):
    """Recursively overlay a restored state dict onto the template tree:
    keys present in both take the stored value (cast to the template
    leaf's dtype); keys only in the template keep their init values; keys
    only in the file are ignored. This is the reference's strict=False
    semantics (new_train.py:397-411: missing EB buffers tolerated,
    unexpected keys dropped) — flax's from_bytes alone hard-fails on any
    key-set difference, which would forbid e.g. warm-starting a
    hyperprior model from a factorized checkpoint's shared transforms."""
    if isinstance(template, dict):
        if not isinstance(stored, dict):
            log.warning("checkpoint: %s is a leaf in file, subtree in "
                        "template; keeping template", path or "<root>")
            return template
        out = {}
        # A missing MODULE subtree (shallow path) means untrained random
        # weights silently enter the model — warn loudly; deep leaf-level
        # gaps (e.g. new per-layer params) stay informational.
        shallow = path.count("/") <= 1
        say = log.warning if shallow else log.info
        for k, v in template.items():
            if k in stored:
                out[k] = _merge_state(v, stored[k], f"{path}/{k}")
            else:
                say("checkpoint: %s/%s absent in file; keeping init "
                    "(random weights!)" if shallow else
                    "checkpoint: %s/%s absent in file; keeping init",
                    path, k)
                out[k] = v
        for k in stored:
            if k not in template:
                say("checkpoint: dropping unexpected key %s/%s", path, k)
        return out
    # Leaf: cast to the template's dtype (storage may be reduced
    # precision). NOTE: read .dtype directly — np.asarray on a template
    # leaf would pull device arrays back to host (slow over the relay).
    if hasattr(template, "dtype"):
        arr = np.asarray(stored)
        if hasattr(template, "shape") and tuple(arr.shape) != tuple(
            template.shape
        ):
            log.warning(
                "checkpoint: %s shape %s != template %s; keeping init",
                path, arr.shape, tuple(template.shape),
            )
            return template
        return arr.astype(template.dtype)
    return stored


def load_checkpoint(path: str, template: Dict[str, Any]):
    """Load into the structure of `template` (from model.init).

    Returns (variables, metadata). Missing/extra keys are tolerated the way
    the reference loads with strict=False (new_train.py:397-411): the
    template provides defaults for anything absent in the file; unexpected
    file keys are dropped (both logged).
    """
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"not an rdvc checkpoint: {path}")
        meta_len = int.from_bytes(f.read(8), "big")
        metadata = json.loads(f.read(meta_len).decode("utf-8"))
        payload = f.read()
    stored = serialization.msgpack_restore(payload)
    # Merge in state-dict space (tuples/custom nodes appear as {"0": ...}
    # dicts there, so the overlay is pure dict-on-dict), then rebuild the
    # template's structure through flax.
    tmpl_sd = serialization.to_state_dict(template)
    merged_sd = _merge_state(tmpl_sd, stored)
    variables = serialization.from_state_dict(template, merged_sd)
    return variables, metadata


def peek_metadata(path: str) -> Dict[str, Any]:
    """Read ONLY a checkpoint's metadata dict (no param payload parse).

    Lets eval drivers self-configure the model variant (e.g.
    metadata["model_config"]["hyperprior"]) before building a runtime —
    the runtime's variant guard otherwise refuses a mismatched flag."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"not an rdvc checkpoint: {path}")
        meta_len = int.from_bytes(f.read(8), "big")
        return json.loads(f.read(meta_len).decode("utf-8"))


def tree_size_bytes(tree) -> int:
    import jax

    return sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(tree)
    )
