"""Tests for eval harnesses, vis tools, convert utils, experimental codecs."""

import json
import os

import numpy as np
import pytest

from rdvc_tpu.experimental.quantum import (
    DctBlockCodec,
    fft_topk_compress,
    fft_topk_reconstruct,
    patched_benchmark,
)
from rdvc_tpu.experimental.quantum.fft_topk import qft_topk_roundtrip
from rdvc_tpu.io.convert import crop_yuv, downsample_fps_yuv
from rdvc_tpu.utils.vis import (
    REFERENCE_RD,
    parse_training_log,
    plot_rd_curves,
    plot_training_curves,
)


def _smooth_gray(h=64, w=64):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    return np.clip(
        127 + 80 * np.sin(xs / 9.0) * np.cos(ys / 7.0), 0, 255
    ).astype(np.uint8)


def test_dct_codec_roundtrip():
    gray = _smooth_gray()
    codec = DctBlockCodec(quality=75)
    result = codec.evaluate(gray)
    assert result["psnr_db"] > 30
    assert result["compression_ratio"] > 1


def test_dct_codec_quality_tradeoff():
    gray = _smooth_gray()
    lo = DctBlockCodec(quality=10).evaluate(gray)
    hi = DctBlockCodec(quality=90).evaluate(gray)
    assert hi["psnr_db"] > lo["psnr_db"]
    assert lo["estimated_bytes"] < hi["estimated_bytes"]


def test_dct_codec_nonmultiple_of_8():
    gray = _smooth_gray(37, 51)
    codec = DctBlockCodec(quality=60)
    recon = codec.decompress(codec.compress(gray))
    assert recon.shape == gray.shape


def test_fft_topk():
    gray = _smooth_gray(32, 32).astype(np.float64)
    full = fft_topk_reconstruct(fft_topk_compress(gray, 1.0))
    np.testing.assert_allclose(full, gray, atol=1e-6)
    partial = fft_topk_reconstruct(fft_topk_compress(gray, 0.1))
    assert partial.shape == gray.shape


def test_qft_simulated_roundtrip():
    patch = _smooth_gray(16, 16).astype(np.float64)
    rec_exact = qft_topk_roundtrip(patch, 1.0, shots=None)
    # magnitude-only reconstruction of a nonnegative patch with all coeffs
    np.testing.assert_allclose(rec_exact, patch, rtol=1e-6, atol=1e-6)
    rec_shots = qft_topk_roundtrip(patch, 0.5, shots=2048, seed=1)
    assert rec_shots.shape == patch.shape


def test_patched_benchmark():
    gray = _smooth_gray(64, 64)
    results = patched_benchmark(
        gray, patch_size=16, keep_fractions=(0.5,), methods=("fft", "qft"),
        shots=512,
    )
    assert len(results) == 2
    fft_r = [r for r in results if r["method"] == "fft"][0]
    assert fft_r["psnr_db"] > 20


def test_convert_utils(tmp_path):
    w, h, fb = 16, 8, 16 * 8 * 3 // 2
    data = bytes(range(256)) * ((fb * 10) // 256 + 1)
    src = str(tmp_path / "a.yuv")
    open(src, "wb").write(data[: fb * 10])
    out = str(tmp_path / "b.yuv")
    assert crop_yuv(src, out, w, h, 4) == 4
    assert os.path.getsize(out) == fb * 4
    out2 = str(tmp_path / "c.yuv")
    assert downsample_fps_yuv(src, out2, w, h, keep_every=4) == 3  # 0,4,8
    # byte-level: kept frames must be exact copies
    orig = open(src, "rb").read()
    kept = open(out2, "rb").read()
    assert kept[:fb] == orig[:fb]
    assert kept[fb : 2 * fb] == orig[4 * fb : 5 * fb]


def test_training_log_parse_and_plot(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "blah\n"
        "2026-01-01 INFO epoch 1 done in 12.5s: {'loss': 3.2, 'psnr': 20.1}\n"
        "2026-01-01 INFO epoch 2 done in 11.0s: {'loss': 2.1, 'psnr': 22.4}\n"
    )
    recs = parse_training_log(str(log))
    assert len(recs) == 2 and recs[1]["loss"] == 2.1
    out = plot_training_curves(recs, str(tmp_path / "curves.png"))
    assert out and os.path.getsize(out) > 0


def test_rd_curve_plot(tmp_path):
    ours = {"Beauty": {"bpp": [0.5, 0.3], "psnr": [30.0, 29.0]}}
    out = plot_rd_curves(ours, str(tmp_path / "rd.png"))
    assert os.path.getsize(out) > 0
    assert set(REFERENCE_RD) == {"Beauty", "ReadySetGo", "Jockey"}


def test_two_frame_roundtrip_smoke(tmp_path):
    """Eval harness on dummy images with zero-flow backend (fast path)."""
    from rdvc_tpu.config import CodecConfig
    from rdvc_tpu.eval.two_frames import run_two_frame_roundtrip

    config = CodecConfig()
    config.raft_backend = "zero"
    config.raft_resize_height = 32
    config.raft_resize_width = 32
    config.codec_checkpoint_path = str(tmp_path / "none")
    result = run_two_frame_roundtrip(
        str(tmp_path / "im1.png"),
        str(tmp_path / "im2.png"),
        config=config,
        output_dir=str(tmp_path / "out"),
    )
    assert np.isfinite(result["psnr_raw"])
    assert result["bytes_motion"] > 0 and result["bytes_residual"] > 0
    assert os.path.exists(tmp_path / "out" / "reconstructed.png")


def test_flow_hsv_vis():
    from rdvc_tpu.ops.flowvis import flow_to_hsv_rgb

    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4, :, 0] = 3.0   # rightward
    flow[4:, :, 1] = -3.0  # upward
    rgb = flow_to_hsv_rgb(flow)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    # distinct directions get distinct hues
    assert not np.array_equal(rgb[0, 0], rgb[7, 0])


def test_clips_coherent_motion():
    """coherent_clip frames are exact translations of each other (the
    ground-truth flow is the step), and the shared generator matches what
    bench.py uses."""
    import numpy as np

    from rdvc_tpu.eval.clips import coherent_clip, shimmer_clip

    frames = coherent_clip(3, 64, 96, seed=2, step=(3, 2))
    assert len(frames) == 3
    assert frames[0].shape == (64, 96, 3) and frames[0].dtype == np.uint8
    # frame t+1 shifted back by (dy, dx) equals frame t on the overlap
    a = frames[0][3:, 2:]
    b = frames[1][:-3, :-2]
    assert np.array_equal(a, b)

    import bench

    bench_frames = bench.synth_frames(3, 64, 96, seed=2, step=(3, 2))
    assert all(
        np.array_equal(x, y) for x, y in zip(frames, bench_frames)
    )

    sh = shimmer_clip(3, 64, 96)
    assert sh[0].shape == (64, 96, 3)
    # shimmer is NOT a translation (different regime by construction)
    assert not np.array_equal(sh[0][3:, 2:], sh[1][:-3, :-2])


def test_epe_eval_zero_flow():
    """EPE harness: zero-flow backend must equal the mean GT magnitude."""
    import numpy as np

    from rdvc_tpu.eval.epe import evaluate_flow_backend, mean_epe
    from rdvc_tpu.train.data import CoherentCropDataset

    ds = CoherentCropDataset(size=24, length=4, seed=5, max_step=3)
    r = evaluate_flow_backend(
        lambda a, b: np.zeros(a.shape[:2] + (2,), np.float32), ds
    )
    expected = np.mean(
        [mean_epe(np.zeros_like(ds[i][2]), ds[i][2]) for i in range(4)]
    )
    assert abs(r["epe_mean"] - expected) < 1e-6
    assert r["items"] == 4
