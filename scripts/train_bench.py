"""Training throughput benchmark (SURVEY §6.3 counterpart).

Reference point: phase-3 epochs of ~1091-1117 s on an RTX 3050 Ti at
batch 4, 256x256 Vimeo crops (codec_checkpoints_2phase_visual/
training_log_3phase_resAE_vis.txt, cited in SURVEY §6.3). This measures
the TPU trainer's steady-state step rate at the same batch/crop config.

Method notes (axon relay environment):
- ONE device-resident batch is reused for every timed step — the relay's
  35 MB/s host->device link is not the subject here; production input
  pipelines stream ahead of the device.
- Steps are dispatched through the jitted step function directly (the
  Trainer.train_step wrapper materializes metrics every step, which
  costs a relay round trip per step); the clock stops after the LAST
  step's loss materializes, so queued device work is fully counted.

Usage: python scripts/train_bench.py [out.json]
Env:   TB_BATCH (default 4), TB_CROP (default 256), TB_STEPS (default 20),
       TB_PHASES (default "2,3")
"""

import json
import os
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.device_put(np.zeros(8, np.uint8)))  # absorb relay handshake

from rdvc_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.train.data import SyntheticFlowPairDataset, batch_iterator
from rdvc_tpu.train.loop import Trainer

BATCH = int(os.environ.get("TB_BATCH", "4"))
CROP = int(os.environ.get("TB_CROP", "256"))
STEPS = int(os.environ.get("TB_STEPS", "20"))
PHASES = [int(p) for p in os.environ.get("TB_PHASES", "2,3").split(",")]

OUT_PATH = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/train_bench.json"
os.makedirs(os.path.dirname(OUT_PATH) or ".", exist_ok=True)

report = {
    "batch": BATCH,
    "crop": CROP,
    "steps": STEPS,
    "device": str(jax.devices()[0]),
    "reference_phase3_s_per_epoch": [1091, 1117],  # SURVEY §6.3
}


def log(k, v):
    report[k] = v
    print(f"{k}: {json.dumps(v)}", flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=2)


cfg = TrainConfig(batch_size=BATCH, crop_size=(CROP, CROP), seed=0)
trainer = Trainer(cfg=cfg, model_cfg=ModelConfig())
state = trainer.init_state(spatial=(CROP, CROP))

ds = SyntheticFlowPairDataset(size=CROP, length=BATCH, seed=0)
batch = next(batch_iterator(ds, BATCH, shuffle=False))
f1, f2, flow = (
    jax.device_put(jnp.asarray(x, jnp.float32)) for x in batch
)

for phase in PHASES:
    # Fresh device-side copies per phase: the jitted step DONATES
    # params/opt_state buffers, so reusing state.params across phases
    # passes deleted arrays (observed RuntimeError on the 2nd phase).
    params = jax.tree_util.tree_map(jnp.copy, state.params)
    batch_stats = jax.tree_util.tree_map(jnp.copy, state.batch_stats)
    tx, mode = trainer._optimizer(phase, params)
    opt_state = tx.init(params)
    jitted = trainer._jitted(phase, tx)

    # Warmup: compile + one executed step (donated buffers mean we must
    # thread params/opt_state through every call).
    rng = jax.random.PRNGKey(0)
    params, batch_stats, opt_state, metrics = jitted(
        params, batch_stats, opt_state, f1, f2, flow, rng
    )
    float(metrics["loss"])  # materialize: warmup fully done

    t0 = time.perf_counter()
    for i in range(STEPS):
        rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        params, batch_stats, opt_state, metrics = jitted(
            params, batch_stats, opt_state, f1, f2, flow, rng
        )
    loss = float(metrics["loss"])  # single final materialization
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"phase {phase} loss not finite: {loss}"
    log(f"phase{phase}", {
        "steps_per_s": round(STEPS / dt, 3),
        "imgs_per_s": round(STEPS * BATCH / dt, 2),
        "s_per_step": round(dt / STEPS, 4),
        "loss_final": round(loss, 4),
        "optimizer_mode": mode,
    })

# Orientation vs the reference: their phase-3 epoch walltime at batch 4.
# (Their samples/epoch is a Vimeo subset whose size isn't in the logs, so
# steps/s is the honest comparable; s/epoch would need their epoch size.)
print("wrote", OUT_PATH)
