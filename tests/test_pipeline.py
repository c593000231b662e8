"""End-to-end encode -> .rdvc -> decode round trip (the test_2frames /
test_uvg equivalent, SURVEY.md §4 seams a, c, g).

Uses a random-init codec + the Farneback/zero flow backends so no trained
weights are needed; correctness here means pipeline integrity (container
round-trip, latent bit-exactness through rANS, encoder/decoder state
discipline, determinism), not RD quality.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rdvc_tpu.config import CodecConfig, ModelConfig
from rdvc_tpu.io.yuv import write_yuv420p_frames
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.pipeline.decode import decode_video
from rdvc_tpu.pipeline.encode import encode_video, compression_resolution


def _make_video(tmp_path, n=6, h=64, w=96):
    """Moving smooth-gradient synthetic video (JPEG/YUV-friendly)."""
    ys, xs = np.mgrid[0 : h * 2, 0 : w * 2].astype(np.float64)
    base = np.stack(
        [
            127 + 100 * np.sin(xs / 17.0) * np.cos(ys / 23.0),
            127 + 100 * np.cos(xs / 29.0 + ys / 13.0),
            127 + 100 * np.sin((xs + ys) / 19.0),
        ],
        axis=-1,
    )
    frames = []
    for t in range(n):
        crop = base[t * 2 : t * 2 + h, t * 3 : t * 3 + w]
        frames.append(np.ascontiguousarray(np.clip(crop, 0, 255).astype(np.uint8)))
    path = str(tmp_path / "in.yuv")
    write_yuv420p_frames(path, frames)
    return path, frames


def _small_config(tmp_path, in_path, h=64, w=96):
    c = CodecConfig()
    c.input_file_path = in_path
    c.output_rdvc_file = str(tmp_path / "out.rdvc")
    c.input_rdvc_file = c.output_rdvc_file
    c.output_video_path_decode = str(tmp_path / "recon.yuv")
    c.input_yuv_width = w
    c.input_yuv_height = h
    c.input_yuv_fps = 30.0
    c.iframe_interval = 4
    c.flow_compress_height = h
    c.residual_compress_height = h
    c.raft_backend = "zero"
    c.raft_resize_height = 32
    c.raft_resize_width = 48
    c.codec_checkpoint_path = str(tmp_path / "nonexistent")
    return c


@pytest.fixture(scope="module")
def runtime():
    return CodecRuntime(model_cfg=ModelConfig(), seed=0)


def test_compression_resolution():
    # 1080p 16:9 stays 1080x1920; odd targets get even-rounded
    assert compression_resolution(1080, 1920, 1080) == (1080, 1920)
    assert compression_resolution(135, 1920, 1080) == (136, 240)


@pytest.mark.slow
def test_encode_decode_roundtrip(tmp_path, runtime):
    in_path, frames = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    enc = encode_video(config, runtime=runtime)
    assert enc["frames"] == 6
    assert os.path.getsize(config.output_rdvc_file) > 0
    assert enc["metadata"]["total_frames_processed"] == 6

    dec = decode_video(config, runtime=runtime, collect_frames=True)
    assert dec["frames"] == 6
    out_frames = dec["decoded_frames"]
    assert all(f.shape == (64, 96, 3) for f in out_frames)

    # I-frames (0, 4) are JPEG q70 of the source: close to the original.
    for i in (0, 4):
        err = np.mean(
            np.abs(out_frames[i].astype(int) - frames[i].astype(int))
        )
        assert err < 15, f"I-frame {i} err {err}"


@pytest.mark.slow
def test_decode_deterministic(tmp_path, runtime):
    in_path, _ = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    d1 = decode_video(config, runtime=runtime, collect_frames=True)
    d2 = decode_video(config, runtime=runtime, collect_frames=True)
    for a, b in zip(d1["decoded_frames"], d2["decoded_frames"]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_decode_tolerates_payload_corruption(tmp_path, runtime):
    """Bit flips inside a P-frame entropy payload must not crash the
    decoder: the rANS decode is table-driven (any word sequence decodes to
    SOME symbol sequence), so corruption degrades to garbage pixels for
    the affected GOP while the stream structure and every frame survive.
    (Resilience beyond the reference, which only tolerates truncation —
    codec_processing.py:1960-1965.)"""
    import re
    import struct

    in_path, _ = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    data = bytearray(open(config.output_rdvc_file, "rb").read())
    starts = [m.start() for m in re.finditer(b"RDVCFRME", bytes(data))]
    # Frame 1 is the first P-frame (interval 4). Header: marker(8) +
    # idx(4) + type(1) + payload_len(8); payload: mH(4) mW(4) m_len(4)
    # then the motion bitstream.
    base = starts[1] + 8 + 4
    assert data[base : base + 1] == b"P"
    payload = base + 1 + 8
    (m_len,) = struct.unpack(">I", data[payload + 8 : payload + 12])
    assert m_len >= 12, "motion payload too small to corrupt safely"
    for i in range(8):
        data[payload + 12 + 4 + i] ^= 0xFF
    bad = tmp_path / "corrupt.rdvc"
    bad.write_bytes(bytes(data))
    config.input_rdvc_file = str(bad)
    dec = decode_video(config, runtime=runtime, collect_frames=True)
    assert dec["frames"] == 6
    assert all(f.shape == (64, 96, 3) for f in dec["decoded_frames"])


@pytest.mark.slow
def test_latents_bitexact_through_rans(tmp_path, runtime):
    """The decoder's dequantized latents must exactly equal what the encoder
    would get by quantizing its own latents (bitstream transparency)."""
    rng = np.random.RandomState(5)
    lat = (rng.randn(1, 8, 12, 128) * 2).astype(np.float32)
    bs, shape = runtime.compress_motion(jnp.asarray(lat))
    back = runtime.decompress_motion(bs, shape)
    expected = runtime.quantized_latents(lat, "motion")
    np.testing.assert_array_equal(back, expected)


@pytest.mark.slow
def test_encode_with_farneback(tmp_path, runtime):
    pytest.importorskip("cv2")
    in_path, _ = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    config.raft_backend = "farneback"
    enc = encode_video(config, runtime=runtime)
    assert enc["frames"] == 6
    dec = decode_video(config, runtime=runtime)
    assert dec["frames"] == 6


@pytest.mark.slow
def test_cli_encode_decode(tmp_path, runtime, monkeypatch):
    """CLI surface parity: --mode encode|decode."""
    from rdvc_tpu import cli

    in_path, _ = _make_video(tmp_path)
    rdvc = str(tmp_path / "cli.rdvc")
    recon = str(tmp_path / "cli_recon.yuv")
    # Patch runtime construction to reuse the module fixture (avoids re-init)
    monkeypatch.setattr(
        "rdvc_tpu.pipeline.codec_runtime.CodecRuntime",
        lambda *a, **k: runtime,
    )
    rc = cli.main(
        [
            "--mode", "encode", "--input", in_path, "--output", rdvc,
            "--yuv_width", "96", "--yuv_height", "64",
            "--raft_backend", "zero", "--iframe_interval", "4",
            "--flow_compress_height", "64",
            "--residual_compress_height", "64",
            "--checkpoint", str(tmp_path / "none"),
        ]
    )
    assert rc == 0 and os.path.exists(rdvc)
    rc = cli.main(
        [
            "--mode", "decode", "--input", rdvc, "--output", recon,
            "--checkpoint", str(tmp_path / "none"),
        ]
    )
    assert rc == 0

    # --mode info: host-only container inspection, no device/model.
    info = cli.container_info(rdvc)
    assert info["frames"] == 6
    assert info["frame_stats"]["I"]["count"] == 2
    assert info["frame_stats"]["P"]["count"] == 4
    assert info["metadata"]["iframe_interval"] == 4
    assert info["bpp"] > 0
    rc = cli.main(["--mode", "info", "--input", rdvc, "--json"])
    assert rc == 0
    assert cli.main(["--mode", "info"]) == 2  # missing --input


@pytest.mark.slow
def test_encode_decode_fused_raft(tmp_path, runtime):
    """Fused single-dispatch encode (JAX RAFT) + fused decode round trip."""
    in_path, _ = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    config.raft_backend = "raft"
    config.raft_resize_height = 32
    config.raft_resize_width = 48
    config.raft_iters = 2
    enc = encode_video(config, runtime=runtime)
    assert enc["frames"] == 6
    dec = decode_video(config, runtime=runtime, collect_frames=True)
    assert dec["frames"] == 6
    assert all(f.shape == (64, 96, 3) for f in dec["decoded_frames"])
    # determinism of the fused path
    dec2 = decode_video(config, runtime=runtime, collect_frames=True)
    for a, b in zip(dec["decoded_frames"], dec2["decoded_frames"]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_gop_batched_matches_serial(tmp_path, runtime):
    """Batched-GOP decode must produce identical frames to the serial path."""
    in_path, _ = _make_video(tmp_path, n=10)
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    config.decode_gop_batch = 4
    d_batched = decode_video(config, runtime=runtime, collect_frames=True)
    config.decode_gop_batch = 1
    d_serial = decode_video(config, runtime=runtime, collect_frames=True)
    assert d_batched["frames"] == d_serial["frames"] == 10
    for i, (a, b) in enumerate(
        zip(d_batched["decoded_frames"], d_serial["decoded_frames"])
    ):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


@pytest.mark.slow
def test_gop_mesh_sharded_matches_serial(tmp_path, runtime):
    """Multi-device GOP-parallel decode (rows sharded over a `gop` mesh,
    SURVEY §2.11) must produce identical frames to the serial path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    in_path, _ = _make_video(tmp_path, n=18)
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    config.decode_gop_batch = 4
    config.decode_gop_devices = 2
    d_mesh = decode_video(config, runtime=runtime, collect_frames=True)
    assert runtime._gop_mesh is not None
    config.decode_gop_batch = 1
    config.decode_gop_devices = 1
    d_serial = decode_video(config, runtime=runtime, collect_frames=True)
    assert runtime._gop_mesh is None
    assert d_mesh["frames"] == d_serial["frames"] == 18
    for i, (a, b) in enumerate(
        zip(d_mesh["decoded_frames"], d_serial["decoded_frames"])
    ):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


def test_gop_batched_oom_falls_back_gop_serial(tmp_path, runtime, monkeypatch):
    """A device OOM on a multi-GOP group must degrade to GOP-serial decode
    (pad_to=1, genuinely smaller working set) and still produce frames
    identical to the serial path."""
    in_path, _ = _make_video(tmp_path, n=10)
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    config.decode_gop_batch = 1
    d_serial = decode_video(config, runtime=runtime, collect_frames=True)

    real_scan = runtime.decode_pframes_scan
    oom_calls = {"n": 0}

    def scan_or_oom(state_raw, prev_post, iframe, m_T, r_T, *a, **k):
        if m_T.shape[1] > 1:  # any multi-row group "exhausts" device memory
            oom_calls["n"] += 1
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (fake)")
        return real_scan(state_raw, prev_post, iframe, m_T, r_T, *a, **k)

    monkeypatch.setattr(runtime, "decode_pframes_scan", scan_or_oom)
    config.decode_gop_batch = 4
    d_fb = decode_video(config, runtime=runtime, collect_frames=True)
    assert oom_calls["n"] >= 1
    assert d_fb["frames"] == d_serial["frames"] == 10
    for i, (a, b) in enumerate(
        zip(d_fb["decoded_frames"], d_serial["decoded_frames"])
    ):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


@pytest.mark.slow
def test_gop_batched_lone_trailing_iframe(tmp_path, runtime):
    """A video ending exactly on an I-frame (zero-P GOP) must decode."""
    in_path, _ = _make_video(tmp_path, n=9)  # iframe_interval=4: I@0,4,8; GOP3 = lone I
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    config.decode_gop_batch = 4
    dec = decode_video(config, runtime=runtime, collect_frames=True)
    assert dec["frames"] == 9


@pytest.mark.slow
def test_decode_debug_dumps(tmp_path, runtime):
    """Staged debug PNGs (reference decoder capability)."""
    in_path, _ = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    encode_video(config, runtime=runtime)
    config.debug_dump_enabled = True
    config.debug_frame_interval_decode = 2
    config.debug_frames_dir_decode = str(tmp_path / "dbg")
    dec = decode_video(config, runtime=runtime)
    assert dec["frames"] == 6
    import glob

    dumps = glob.glob(str(tmp_path / "dbg" / "*.png"))
    assert len(dumps) >= 9  # at least one full staged set (all 9 stages)
    names = {p.split("_", 2)[-1] for p in dumps}
    assert any("final_post" in n for n in names)
    # The two reference debug stages added in round 3
    # (codec_processing.py:1851-1903):
    assert any("lmr_mask" in n for n in names)
    assert any("hist_matched" in n for n in names)


def test_select_device_gpu_flag():
    """--gpu semantics (reference codec_processing.py:1189-1204): negative
    or None pins to host CPU; N picks the N-th device (clamped)."""
    import jax

    from rdvc_tpu.utils.runtime import select_device

    dev = select_device(-1)
    assert dev.platform == "cpu"
    assert jax.config.jax_default_device == dev

    dev0 = select_device(0)
    assert dev0 == [d for d in jax.devices() if d.platform != "cpu"][0] if any(
        d.platform != "cpu" for d in jax.devices()
    ) else jax.devices()[0]

    # Out-of-range index clamps instead of crashing.
    dev_hi = select_device(10_000)
    assert dev_hi in jax.devices()
    # Restore the CPU default for the rest of the suite.
    select_device(None)
    assert jax.config.jax_default_device.platform == "cpu"


def test_fused_coded_encode_matches_staged(runtime):
    """The single-dispatch coded encode (encode_pframes_chain_coded +
    assemble_frames_coded) must emit byte-identical payloads to the staged
    path (chain encode -> encode_frames_device_rans -> assemble_frames)."""
    from rdvc_tpu.models.raft import RaftRunner

    runner = RaftRunner(iters=2, spatial=(32, 48))
    runtime.attach_raft(runner.model, runner.variables)
    rng = np.random.RandomState(5)
    chain = rng.randint(0, 256, (4, 64, 96, 3), dtype=np.uint8)
    hw = ((32, 48), (64, 96), (64, 96))

    handles = runtime.encode_pframes_chain_coded(chain, *hw)
    fused = runtime.assemble_frames_coded(handles, 3)

    m_sym, r_sym = runtime.encode_pframes_chain(chain, *hw)
    staged = runtime.assemble_frames(
        runtime.encode_frames_device_rans(m_sym, r_sym), 3
    )
    assert len(fused) == len(staged) == 3
    for f, s in zip(fused, staged):
        assert f[1] == s[1] and f[3] == s[3]  # shapes
        assert f[0] == s[0], "motion payload bytes differ"
        assert f[2] == s[2], "residual payload bytes differ"


def test_fused_scan_decode_matches_staged(runtime):
    """Escape-free CA payloads through the fused entropy-decode+scan
    dispatch must produce frames identical to the staged path
    (decode_payloads_device -> decode_pframes_scan)."""
    rng = np.random.RandomState(9)
    T, B, h, w = 2, 2, 4, 6
    H, W = 32, 48

    def in_range(tables, c, seed):
        r = np.random.RandomState(seed)
        max_v = tables.cdf_length - 2
        lo = tables.offset
        out = np.empty((T * B, h, w, c), np.int32)
        for ch in range(c):
            out[..., ch] = r.randint(lo[ch], lo[ch] + max_v[ch], (T * B, h, w))
        return out

    m_sym = in_range(runtime.motion_tables, 128, 1)
    r_sym = in_range(runtime.residual_tables, 192, 2)
    payloads = runtime.assemble_frames(
        runtime.encode_frames_device_rans(
            jnp.asarray(m_sym), jnp.asarray(r_sym)
        )
    )
    assert all(p[0] is not None and p[2] is not None for p in payloads)
    m_pl = [p[0] for p in payloads]
    r_pl = [p[2] for p in payloads]

    prev = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    fused = runtime.decode_pframes_scan_coded(
        prev, prev, prev, m_pl, r_pl, (h, w), (h, w),
        0.0, 0.0, (H, W), False, T,
    )
    m_dev = runtime.decode_payloads_device(m_pl, "motion", (h, w))
    r_dev = runtime.decode_payloads_device(r_pl, "residual", (h, w))
    staged = runtime.decode_pframes_scan(
        prev, prev, prev,
        m_dev.reshape(T, B, h, w, 128), r_dev.reshape(T, B, h, w, 192),
        0.0, 0.0, (H, W), False,
    )
    for f, s in zip(fused, staged):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(s))


@pytest.mark.slow
def test_gop_mesh_sharded_encode_matches_single(runtime):
    """Batched P-frame encode with rows sharded over a `gop` mesh must
    produce identical symbols to the unsharded dispatch (encode-side
    multi-chip mirror of the sharded decode scan)."""
    import jax

    from rdvc_tpu.models.raft import RaftRunner
    from rdvc_tpu.parallel import make_data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    runner = RaftRunner(iters=2, spatial=(32, 48))
    runtime.attach_raft(runner.model, runner.variables)
    rng = np.random.RandomState(11)
    prevs = rng.randint(0, 256, (4, 64, 96, 3), dtype=np.uint8)
    curs = rng.randint(0, 256, (4, 64, 96, 3), dtype=np.uint8)
    hw = ((32, 48), (64, 96), (64, 96))

    m0, r0 = runtime.encode_pframes_batched(prevs, curs, *hw)
    m0, r0 = np.asarray(m0), np.asarray(r0)
    runtime.set_gop_mesh(make_data_mesh(2, axis_name="gop"))
    try:
        m1, r1 = runtime.encode_pframes_batched(prevs, curs, *hw)
        assert not m1.sharding.is_fully_replicated
        # SPMD recompilation reassociates bf16 math, so a small fraction
        # of latents sit on the other side of round(); the encoder's
        # symbol choice only has to be self-consistent, not bit-stable
        # across program partitionings.
        for a, b in ((m0, np.asarray(m1)), (r0, np.asarray(r1))):
            diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert diff.max() <= 1, diff.max()
            assert (diff != 0).mean() < 0.01, (diff != 0).mean()
    finally:
        runtime.set_gop_mesh(None)


@pytest.mark.slow
def test_encode_gop_devices_roundtrip(tmp_path, runtime):
    """End-to-end encode with the P-frame batch sharded over 2 devices
    (encode_gop_devices) must produce a decodable bitstream."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    in_path, _ = _make_video(tmp_path, n=8)
    config = _small_config(tmp_path, in_path)
    config.raft_backend = "raft"
    config.raft_resize_height = 32
    config.raft_resize_width = 48
    config.raft_iters = 2
    config.encode_gop_devices = 2
    enc = encode_video(config, runtime=runtime)
    assert enc["frames"] == 8
    assert runtime._gop_mesh is None  # mesh reset after encode
    dec = decode_video(config, runtime=runtime, collect_frames=True)
    assert dec["frames"] == 8
    assert all(np.isfinite(f).all() for f in dec["decoded_frames"])


def test_fused_coded_encode_dispatch_failure_falls_back(
    tmp_path, runtime, monkeypatch
):
    """If the fused coded-encode dispatch raises, flush_batch must degrade
    to the staged chain path and still produce a decodable bitstream."""
    def boom(*a, **k):
        raise RuntimeError("injected dispatch failure")

    monkeypatch.setattr(runtime, "encode_pframes_chain_coded", boom)
    in_path, _ = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    config.raft_backend = "raft"
    config.raft_resize_height = 32
    config.raft_resize_width = 48
    config.raft_iters = 2
    enc = encode_video(config, runtime=runtime)
    assert enc["frames"] == 6
    dec = decode_video(config, runtime=runtime, collect_frames=True)
    assert dec["frames"] == 6
