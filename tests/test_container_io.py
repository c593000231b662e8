"""Container + IO + postproc tests (golden-byte and round-trip properties)."""

import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from rdvc_tpu.container import (
    EOF_MARKER,
    FRAME_MARKER,
    METADATA_MARKER,
    RdvcReader,
    RdvcWriter,
    pack_pframe_payload,
    unpack_iframe_payload,
    unpack_pframe_payload,
)
from rdvc_tpu.io.jpeg import decode_jpeg, encode_jpeg
from rdvc_tpu.io.yuv import (
    read_yuv420p_frames,
    rgb_to_yuv420p,
    write_yuv420p_frames,
    yuv420p_to_rgb,
)
from rdvc_tpu.postproc import (
    histogram_match_ycrcb,
    low_motion_replacement,
    temporal_iir_filter,
)


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "test.rdvc")
    w = RdvcWriter(path)
    w.add_iframe(0, b"JPEGDATA", ".jpg")
    w.add_pframe(1, (17, 30), b"motionbits", (17, 30), b"residualbits")
    w.add_pframe(2, (17, 30), b"m2", (17, 30), b"r2")
    meta = {"rdvc_version": "1.0", "original_dimensions_wh": [240, 136]}
    w.finalize(meta)

    with RdvcReader(path) as r:
        assert r.metadata == meta
        recs = list(r.frames())
    assert [rec.frame_type for rec in recs] == ["I", "P", "P"]
    assert [rec.index for rec in recs] == [0, 1, 2]
    ext, data = unpack_iframe_payload(recs[0].payload)
    assert ext == ".jpg" and data == b"JPEGDATA"
    m_shape, m_bs, r_shape, r_bs = unpack_pframe_payload(recs[1].payload)
    assert m_shape == (17, 30) and m_bs == b"motionbits"
    assert r_shape == (17, 30) and r_bs == b"residualbits"
    assert w.total_pframe_payload_bytes == len(b"motionbits") + len(
        b"residualbits"
    ) + len(b"m2") + len(b"r2")


def test_container_byte_layout(tmp_path):
    """Golden-byte check of the on-disk format (big-endian markers/lengths,
    reference codec_processing.py:86-96)."""
    path = str(tmp_path / "g.rdvc")
    w = RdvcWriter(path)
    w.add_iframe(0, b"XY", ".jpg")
    w.finalize({"a": 1})
    raw = open(path, "rb").read()
    assert raw.startswith(METADATA_MARKER)
    (meta_len,) = struct.unpack(">I", raw[8:12])
    frame_off = 12 + meta_len
    assert raw[frame_off : frame_off + 8] == FRAME_MARKER
    (idx,) = struct.unpack(">I", raw[frame_off + 8 : frame_off + 12])
    assert idx == 0
    assert raw[frame_off + 12 : frame_off + 13] == b"I"
    (plen,) = struct.unpack(">Q", raw[frame_off + 13 : frame_off + 21])
    payload = raw[frame_off + 21 : frame_off + 21 + plen]
    assert payload == b"\x04.jpgXY"
    assert raw.endswith(EOF_MARKER)


def test_container_truncation_tolerated(tmp_path):
    path = str(tmp_path / "t.rdvc")
    w = RdvcWriter(path)
    w.add_iframe(0, b"AA")
    w.add_pframe(1, (2, 2), b"mm", (2, 2), b"rr")
    w.finalize({})
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-20])  # chop EOF + part of last frame
    with RdvcReader(path) as r:
        recs = list(r.frames())
    assert len(recs) == 1 and recs[0].frame_type == "I"


def test_yuv_roundtrip(tmp_path):
    # Smooth gradients: 4:2:0 chroma subsampling is near-lossless on them
    # (random noise would be the worst case for chroma decimation).
    ys, xs = np.mgrid[0:32, 0:48]
    frames = [
        np.stack(
            [(ys * 4 + t) % 256, (xs * 3 + t) % 256, ((ys + xs) * 2) % 256], -1
        ).astype(np.uint8)
        for t in range(3)
    ]
    path = str(tmp_path / "t.yuv")
    n = write_yuv420p_frames(path, frames)
    assert n == 3
    back = list(read_yuv420p_frames(path, 48, 32))
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 12


def test_yuv_odd_dims_rejected(tmp_path):
    with pytest.raises(ValueError):
        list(read_yuv420p_frames("/dev/null", 47, 32))


def test_yuv_colorspace_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (16, 16, 3), np.uint8)
    i420 = rgb_to_yuv420p(rgb)
    ref = cv2.cvtColor(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR), cv2.COLOR_BGR2YUV_I420)
    np.testing.assert_array_equal(i420, ref)
    back = yuv420p_to_rgb(i420, 16, 16)
    ref_back = cv2.cvtColor(
        cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420), cv2.COLOR_BGR2RGB
    )
    np.testing.assert_array_equal(back, ref_back)


def test_jpeg_roundtrip():
    rng = np.random.RandomState(2)
    # Smooth image compresses well; random noise would not.
    x = np.linspace(0, 255, 64 * 64 * 3).reshape(64, 64, 3)
    rgb = (x + rng.randn(64, 64, 3) * 2).clip(0, 255).astype(np.uint8)
    data = encode_jpeg(rgb, quality=90)
    back = decode_jpeg(data)
    assert back.shape == rgb.shape
    assert np.mean(np.abs(back.astype(int) - rgb.astype(int))) < 8


def test_lmr():
    frame = jnp.ones((1, 4, 4, 3)) * 0.5
    iframe = jnp.zeros((1, 4, 4, 3))
    flow = jnp.zeros((1, 4, 4, 2))
    flow = flow.at[0, 0, 0, 0].set(10.0)  # one high-motion pixel
    out, mask = low_motion_replacement(frame, flow, iframe, jnp.float32(1.0))
    out = np.asarray(out)
    assert out[0, 0, 0, 0] == 0.5  # high-motion pixel kept
    assert out[0, 1, 1, 0] == 0.0  # low-motion pixel replaced
    # threshold 0 disables
    out2, _ = low_motion_replacement(frame, flow, iframe, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(frame))


def test_temporal_iir():
    cur = jnp.ones((1, 2, 2, 3)) * 0.8
    prev = jnp.ones((1, 2, 2, 3)) * 0.4
    out = temporal_iir_filter(cur, prev, jnp.float32(0.25))
    np.testing.assert_allclose(np.asarray(out), 0.25 * 0.4 + 0.75 * 0.8, atol=1e-6)


def test_histmatch_identity():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    out = histogram_match_ycrcb(img, img)
    # Matching an image to itself should be near-identity (up to uint8 quantization)
    assert float(jnp.abs(out - img).mean()) < 0.01


def test_histmatch_shifts_brightness():
    rng = np.random.RandomState(4)
    base = rng.rand(1, 64, 64, 3).astype(np.float32) * 0.5
    bright = np.clip(base + 0.4, 0, 1)
    out = np.asarray(histogram_match_ycrcb(jnp.asarray(base), jnp.asarray(bright)))
    assert out.mean() > base.mean() + 0.2
