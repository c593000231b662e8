"""Strip training checkpoints to eval form for committing.

Drops opt_state and casts float leaves to f16 (load_checkpoint restores the
template dtypes, and EB CDF tables are rebuilt from params at load — see
utils/checkpoint.py), shrinking ~343MB trainer checkpoints to ~58MB eval
checkpoints. Usage:  python scripts/strip_ckpt.py ckpt [ckpt ...]
"""

import json
import os
import sys

import numpy as np
from flax import serialization

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rdvc_tpu.utils.checkpoint import _MAGIC, save_checkpoint

for path in sys.argv[1:]:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"not an rdvc checkpoint: {path}")
        meta = json.loads(f.read(int.from_bytes(f.read(8), "big")))
        variables = serialization.msgpack_restore(f.read())
    before = os.path.getsize(path)
    variables.pop("opt_state", None)
    meta["stripped"] = "eval-only (opt_state dropped, f16 storage)"
    save_checkpoint(path, variables, metadata=meta, cast_dtype=np.float16)
    print(f"{path}: {before/1e6:.0f} MB -> {os.path.getsize(path)/1e6:.0f} MB")
