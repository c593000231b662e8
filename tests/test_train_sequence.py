"""Sequence-unrolled fine-tune path (VideoCodec.forward_sequence +
Trainer seq loss): the train/decode-mismatch fix for long-GOP drift.

The unrolled forward must chain the warp reference through the
reconstructions (decoder semantics, reference codec_processing.py:1941),
keep rates/losses finite, and train end to end."""

import numpy as np
import jax
import pytest

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.models.codec import VideoCodec, init_codec_variables
from rdvc_tpu.train.data import (
    CoherentCropSequenceDataset,
    sequence_batch_iterator,
)
from rdvc_tpu.train.loop import Trainer


def test_sequence_dataset_consistency():
    ds = CoherentCropSequenceDataset(size=32, length=4, seq_len=4, max_step=2)
    frames, flows = ds[1]
    assert frames.shape == (4, 32, 32, 3)
    assert flows.shape == (3, 32, 32, 2)
    # constant flow, and frame pairs actually obey it: f2(x) = f1(x + flow)
    dx, dy = int(flows[0, 0, 0, 0]), int(flows[0, 0, 0, 1])
    assert np.all(flows[..., 0] == dx) and np.all(flows[..., 1] == dy)
    s = 32
    x0, x1 = max(0, -dx), min(s, s - dx)
    y0, y1 = max(0, -dy), min(s, s - dy)
    np.testing.assert_allclose(
        frames[1, y0:y1, x0:x1],
        frames[0, y0 + dy : y1 + dy, x0 + dx : x1 + dx],
        atol=1e-6,
    )


def test_forward_sequence_chains_reconstructions():
    """The step-t warp reference must be the step-(t-1) reconstruction:
    zeroing out a middle target frame must change later reconstructions."""
    cfg = ModelConfig()
    model = VideoCodec(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    variables = init_codec_variables(model, rng, spatial=(32, 32))
    ds = CoherentCropSequenceDataset(size=32, length=2, seq_len=4)
    frames, flows = ds[0]
    frames = frames[None]
    flows = flows[None]

    def run(fr):
        # train=True keeps the quantizer continuous (uniform-noise
        # relaxation with a FIXED rng): at random init the eval-path
        # round() maps every input to the same integers, which would hide
        # the chain. The ref-chaining under test is train-flag-independent.
        out, _ = model.apply(
            variables, fr, flows, 2, train=True,
            rngs={"noise": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
            method=VideoCodec.forward_sequence,
        )
        return out

    out = run(frames)
    assert out["recons"].shape == (1, 3, 32, 32, 3)
    assert np.isfinite(float(out["rate_motion_sum"]))
    assert np.isfinite(float(out["rate_residual_sum"]))
    # Perturb frame 1 (a target of step 0): its reconstruction feeds the
    # step-1 warp, so recons[1] and recons[2] must change.
    frames2 = np.array(frames)
    frames2[:, 1] = 0.0
    out2 = run(frames2)
    assert not np.allclose(out["recons"][:, 1], out2["recons"][:, 1])
    assert not np.allclose(out["recons"][:, 2], out2["recons"][:, 2])


@pytest.mark.slow
def test_sequence_train_step_reduces_loss():
    cfg = TrainConfig(batch_size=2, crop_size=(32, 32), seed=0)
    trainer = Trainer(cfg=cfg, model_cfg=ModelConfig())
    ds = CoherentCropSequenceDataset(size=32, length=4, seq_len=3, max_step=2)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(sequence_batch_iterator(ds, 2, shuffle=False))
    losses = []
    for _ in range(4):
        state, metrics = trainer.train_step(state, batch, phase=2)
        assert np.isfinite(metrics["loss"])
        assert "psnr_last" in metrics
        losses.append(metrics["loss"])
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_fit_routes_sequence_dataset(tmp_path):
    cfg = TrainConfig(
        batch_size=2, crop_size=(32, 32), seed=0,
        num_epochs=1, phase1_epochs=0, phase3_start_epoch=99,
        checkpoint_dir=str(tmp_path), vis_dir="",
        real_bitstream_check_every=0,
    )
    trainer = Trainer(cfg=cfg, model_cfg=ModelConfig())
    ds = CoherentCropSequenceDataset(size=32, length=4, seq_len=3)
    state = trainer.fit(ds)
    assert state.step > 0
