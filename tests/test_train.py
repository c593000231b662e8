"""Training system tests: .flo IO, dataset, phases, train step, multi-device
DP on the virtual CPU mesh (SURVEY.md §4 seams f, h), checkpoint resume."""

import os

import numpy as np
import jax
import pytest

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.parallel import make_data_mesh
from rdvc_tpu.train.data import (
    SyntheticFlowPairDataset,
    VimeoFlowPairDataset,
    batch_iterator,
    read_flo,
    write_flo,
)
from rdvc_tpu.train.loop import Trainer
from rdvc_tpu.train.phases import loss_weights, phase_for_epoch, phase_trainable_mask


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.randn(17, 23, 2).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_flo_rejects_nan(tmp_path):
    flow = np.full((4, 4, 2), np.nan, np.float32)
    p = str(tmp_path / "bad.flo")
    write_flo(p, flow)
    with pytest.raises(ValueError):
        read_flo(p)


def test_vimeo_dataset_layout(tmp_path):
    """Mirrored frame/flow tree with im1.png..im3.png per sequence dir."""
    from PIL import Image

    rng = np.random.RandomState(1)
    for seq in ("00001/0001", "00001/0002"):
        fdir = tmp_path / "frames" / seq
        fldir = tmp_path / "flows" / seq
        fdir.mkdir(parents=True)
        fldir.mkdir(parents=True)
        for i in (1, 2, 3):
            Image.fromarray(
                rng.randint(0, 255, (32, 48, 3), np.uint8)
            ).save(fdir / f"im{i}.png")
        for i in (1, 2):  # flow for pairs (im1,im2), (im2,im3)
            write_flo(
                str(fldir / f"im{i}.flo"),
                rng.randn(32, 48, 2).astype(np.float32),
            )
    ds = VimeoFlowPairDataset(
        str(tmp_path / "frames"), str(tmp_path / "flows")
    )
    assert len(ds) == 4  # 2 dirs x 2 consecutive pairs
    f1, f2, flow = ds[0]
    assert f1.shape == (32, 48, 3) and flow.shape == (32, 48, 2)
    assert f1.dtype == np.float32 and f1.max() <= 1.0


def test_phase_schedule():
    cfg = TrainConfig(phase1_epochs=30, phase3_start_epoch=100)
    assert phase_for_epoch(cfg, 1) == 1
    assert phase_for_epoch(cfg, 30) == 1
    assert phase_for_epoch(cfg, 31) == 2
    assert phase_for_epoch(cfg, 99) == 2
    assert phase_for_epoch(cfg, 100) == 3


def test_phase_masks():
    cfg = TrainConfig(freeze_mcn_phase1=True, phase3_variant="res_ae")
    params = {
        "motion_encoder": {"k": np.zeros(1)},
        "motion_decoder": {"k": np.zeros(1)},
        "motion_entropy_bottleneck": {"k": np.zeros(1)},
        "residual_encoder": {"k": np.zeros(1)},
        "motion_compensation_net": {"k": np.zeros(1)},
    }
    m1 = phase_trainable_mask(cfg, 1, params)
    assert m1["motion_compensation_net"]["k"] is False
    assert m1["motion_encoder"]["k"] is True
    m3 = phase_trainable_mask(cfg, 3, params)
    assert m3["motion_encoder"]["k"] is False
    assert m3["motion_compensation_net"]["k"] is False
    assert m3["residual_encoder"]["k"] is True


def test_loss_weights_variants():
    cfg = TrainConfig()
    w = loss_weights(cfg, 1)
    assert w["flow"] == 10.0 and w["residual"] == 10000.0 and w["msssim"] == 0
    w3 = loss_weights(cfg, 3)
    assert w3["msssim"] == 5.0
    cfg_res = TrainConfig(phase3_variant="res_ae")
    wr = loss_weights(cfg_res, 3)
    assert wr["flow"] == 0.0 and wr["residual"] == 15000.0 and wr["bpp_residual"] == 5.0
    cfg_psnr = TrainConfig(phase3_variant="psnr")
    assert loss_weights(cfg_psnr, 3)["recon_mse"] == 100.0


@pytest.fixture(scope="module")
def trainer():
    cfg = TrainConfig(batch_size=2, crop_size=(32, 32), seed=0)
    return Trainer(cfg=cfg, model_cfg=ModelConfig())


@pytest.mark.slow
def test_train_step_reduces_loss(trainer):
    ds = SyntheticFlowPairDataset(size=32, length=8, seed=0)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 2, shuffle=False))
    losses = []
    for i in range(4):
        state, metrics = trainer.train_step(state, batch, phase=1)
        losses.append(metrics["loss"])
        assert np.isfinite(metrics["loss"])
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_phase2_step_runs(trainer):
    ds = SyntheticFlowPairDataset(size=32, length=4, seed=1)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 2, shuffle=False))
    state, metrics = trainer.train_step(state, batch, phase=2)
    assert np.isfinite(metrics["loss"]) and metrics["psnr"] > 0


@pytest.mark.slow
def test_phase3_msssim_step(trainer):
    ds = SyntheticFlowPairDataset(size=32, length=4, seed=2)
    state = trainer.init_state(spatial=(32, 32))
    state.epoch = trainer.cfg.phase3_start_epoch
    batch = next(batch_iterator(ds, 2, shuffle=False))
    state, metrics = trainer.train_step(state, batch, phase=3)
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["msssim"] <= 1.0


@pytest.mark.slow
def test_optimizer_reconfigures_across_phases(trainer):
    state = trainer.init_state(spatial=(32, 32))
    mode1 = state.optimizer_mode
    state = trainer.maybe_reconfigure(state, trainer.cfg.phase1_epochs + 1)
    assert state.optimizer_mode != mode1
    state = trainer.maybe_reconfigure(state, trainer.cfg.phase3_start_epoch)
    assert "phase3" in state.optimizer_mode


@pytest.mark.slow
def test_frozen_params_stay_frozen():
    cfg = TrainConfig(
        batch_size=2, crop_size=(32, 32), freeze_mcn_phase1=True
    )
    tr = Trainer(cfg=cfg)
    ds = SyntheticFlowPairDataset(size=32, length=4, seed=3)
    state = tr.init_state(spatial=(32, 32))
    before = jax.tree_util.tree_map(
        np.asarray, state.params["motion_compensation_net"]
    )
    batch = next(batch_iterator(ds, 2, shuffle=False))
    state, _ = tr.train_step(state, batch, phase=1)
    after = jax.tree_util.tree_map(
        np.asarray, state.params["motion_compensation_net"]
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_checkpoint_save_restore(tmp_path, trainer):
    ds = SyntheticFlowPairDataset(size=32, length=4, seed=4)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 2, shuffle=False))
    state, _ = trainer.train_step(state, batch, phase=1)
    path = str(tmp_path / "ck.ckpt")
    trainer.save(state, path)
    restored = trainer.restore(path, spatial=(32, 32))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # peek_metadata reads the variant header without parsing params —
    # eval drivers use it to self-configure (make_rd_report.py).
    from rdvc_tpu.utils.checkpoint import peek_metadata

    meta = peek_metadata(path)
    mc = meta["model_config"]
    assert mc["hyperprior"] == trainer.model_cfg.hyperprior
    assert "epoch" in meta


@pytest.mark.slow
def test_data_parallel_mesh_step():
    """DP over the 8-device virtual CPU mesh: per-device batch shards,
    replicated params, loss matches the single-device step."""
    assert jax.device_count() >= 8, "conftest must set 8 virtual devices"
    mesh = make_data_mesh(8)
    cfg = TrainConfig(batch_size=8, crop_size=(32, 32), seed=0)
    tr = Trainer(cfg=cfg, mesh=mesh)
    ds = SyntheticFlowPairDataset(size=32, length=8, seed=5)
    state = tr.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 8, shuffle=False))
    state, metrics = tr.train_step(state, batch, phase=1)
    assert np.isfinite(metrics["loss"])
    # Params remain replicated (same value on all devices)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_real_bitstream_check(trainer):
    ds = SyntheticFlowPairDataset(size=32, length=2, seed=6)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 2, shuffle=False))
    sizes = trainer.real_bitstream_check(state, batch)
    assert sizes["motion_kb"] > 0 and sizes["residual_kb"] > 0


@pytest.mark.slow
def test_checkpoint_includes_optimizer_state(tmp_path, trainer):
    from rdvc_tpu.train.data import SyntheticFlowPairDataset, batch_iterator

    ds = SyntheticFlowPairDataset(size=32, length=4, seed=7)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 2, shuffle=False))
    state, _ = trainer.train_step(state, batch, phase=1)
    path = str(tmp_path / "opt.ckpt")
    trainer.save(state, path)
    restored = trainer.restore(path, spatial=(32, 32))
    # Adam moments carried over (nonzero after a step)
    orig_leaves = jax.tree_util.tree_leaves(state.opt_state)
    rest_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(orig_leaves) == len(rest_leaves)
    matched = sum(
        np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(orig_leaves, rest_leaves)
        if hasattr(a, "shape") and np.asarray(a).size
    )
    assert matched > 0


@pytest.mark.slow
def test_epoch_visualization(tmp_path, trainer):
    from rdvc_tpu.train.data import SyntheticFlowPairDataset, batch_iterator
    from rdvc_tpu.train.visualize import visualize_epoch

    ds = SyntheticFlowPairDataset(size=32, length=2, seed=8)
    state = trainer.init_state(spatial=(32, 32))
    batch = next(batch_iterator(ds, 2, shuffle=False))
    path = visualize_epoch(trainer, state, batch, 3, 2, str(tmp_path / "vis"))
    assert path and os.path.getsize(path) > 0


def test_coherent_crop_dataset():
    """f2(x) = f1(x + flow) exactly (integer-step translation), and the
    mixture dataset interleaves sources."""
    from rdvc_tpu.train.data import (
        CoherentCropDataset,
        MixtureDataset,
        SyntheticFlowPairDataset,
    )

    ds = CoherentCropDataset(size=32, length=8, seed=3, max_step=3)
    assert len(ds) == 8
    f1, f2, flow = ds[2]
    assert f1.shape == (32, 32, 3) and flow.shape == (32, 32, 2)
    dx = int(flow[0, 0, 0])
    dy = int(flow[0, 0, 1])
    assert np.all(flow[..., 0] == dx) and np.all(flow[..., 1] == dy)
    # verify the warp identity on the valid overlap
    ys = slice(max(0, -dy), 32 - max(0, dy))
    xs = slice(max(0, -dx), 32 - max(0, dx))
    np.testing.assert_allclose(
        f2[ys, xs],
        f1[
            slice(ys.start + dy, ys.stop + dy),
            slice(xs.start + dx, xs.stop + dx),
        ],
        atol=1e-6,
    )

    mix = MixtureDataset(ds, SyntheticFlowPairDataset(size=32, length=4))
    assert len(mix) == 12
    a = mix[0][0]
    b = mix[1][0]
    assert a.shape == b.shape == (32, 32, 3)
