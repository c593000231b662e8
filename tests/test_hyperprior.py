"""Hyperprior entropy model: Gaussian conditional tables/coding, the
mean-scale hyper transforms, codec integration, trainer wiring, and the
end-to-end pipeline round trip.

The reference advertises a hyperprior ("Hyperprior Autoencoders for
entropy coding", its README) but only ships the factorized bottleneck
(/root/reference/codec_processing.py:433,447); this variant is therefore
pinned against its own executable spec: CompressAI GaussianConditional
semantics for tables/indexes, exact encoder/decoder agreement through the
indexed rANS coder.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdvc_tpu.config import ModelConfig
from rdvc_tpu.entropy.gaussian import (
    SCALE_MIN,
    build_gaussian_cdf_tables,
    default_scale_table,
    gaussian_likelihood,
    scale_indexes,
)
from rdvc_tpu.entropy.rans.coder import (
    HYPER_TAG,
    RansCodec,
    native_available,
    pack_hyper_payload,
    unpack_hyper_payload,
)


TINY = dict(
    hyperprior=True,
    hyper_channels=32,
    motion_latent_channels=16,
    residual_latent_channels=24,
    encoder_base_channels=8,
    mcn_base_channels=8,
)


# ---------------------------------------------------------------------------
# Gaussian conditional primitives
# ---------------------------------------------------------------------------


def test_gaussian_tables_valid_and_deterministic():
    t1 = build_gaussian_cdf_tables()
    t2 = build_gaussian_cdf_tables()
    t1.validate()
    assert np.array_equal(t1.quantized_cdf, t2.quantized_cdf)
    assert np.array_equal(t1.offset, t2.offset)
    # Support grows with scale: the widest bin covers the largest sigma.
    assert t1.cdf_length[-1] > t1.cdf_length[0]
    assert np.all(t1.medians == 0.0)


def test_scale_indexes_compressai_semantics():
    table = default_scale_table()
    scales = np.asarray([0.0, SCALE_MIN, 0.2, 1.0, 17.3, 255.0, 1e6])
    idx = scale_indexes(scales)
    # Executable spec: smallest bin with table[bin] >= scale; scales past
    # the table max clamp to the last bin (out-of-range symbols escape).
    for s, i in zip(np.maximum(scales, table[0]), idx):
        if s > table[-1]:
            assert i == len(table) - 1
            continue
        assert table[i] >= s - 1e-12
        if i > 0:
            assert table[i - 1] < s
    # jax path agrees with numpy path
    idx_j = scale_indexes(jnp.asarray(scales))
    assert np.array_equal(np.asarray(idx_j), idx)


def test_gaussian_roundtrip_with_escapes():
    tables = build_gaussian_cdf_tables()
    rng = np.random.default_rng(0)
    sigmas = np.exp(rng.uniform(np.log(0.12), np.log(8.0), 4096))
    idx = scale_indexes(sigmas).astype(np.int32)
    sym = np.round(rng.normal(0, sigmas)).astype(np.int32)
    # Force out-of-range escapes on both sides.
    sym[0] = 10_000
    sym[1] = -10_000
    codec = RansCodec(use_native=False)
    data = codec.encode(sym, idx, tables)
    out = codec.decode(data, idx, tables)
    assert np.array_equal(out, sym)
    if native_available():
        codec_n = RansCodec(use_native=True)
        assert codec_n.encode(sym, idx, tables) == data
        assert np.array_equal(codec_n.decode(data, idx, tables), sym)


def test_gaussian_likelihood_matches_tables():
    """Training likelihood ≈ the quantized pmf the coder uses: the model
    optimizes the same rate the bitstream pays."""
    tables = build_gaussian_cdf_tables()
    table = default_scale_table()
    for b in (0, 20, 40):
        s = table[b]
        v = jnp.asarray([0.0, 1.0, -2.0])
        lik = gaussian_likelihood(v, jnp.zeros(3), jnp.full(3, s))
        n = int(tables.cdf_length[b])
        cdf = tables.quantized_cdf[b, :n].astype(np.float64)
        pmf = np.diff(cdf) / (1 << tables.precision)
        off = int(tables.offset[b])
        for val, l in zip([0, 1, -2], np.asarray(lik)):
            q = pmf[val - off]
            assert abs(float(l) - q) < 2e-3, (b, val, float(l), q)


def test_hyper_payload_pack_unpack():
    p = pack_hyper_payload((3, 5), b"zzz", b"yyyy")
    assert p[0] == HYPER_TAG
    (zh, zw), zb, yb = unpack_hyper_payload(p)
    assert (zh, zw) == (3, 5) and zb == b"zzz" and yb == b"yyyy"
    with pytest.raises(ValueError):
        unpack_hyper_payload(b"\x01abc")
    with pytest.raises(ValueError):
        unpack_hyper_payload(p[: len(p) - len(b"yyyy") - 1])


# ---------------------------------------------------------------------------
# Model integration
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_codec_hyper_forward_and_grads():
    from rdvc_tpu.models.codec import VideoCodec, init_codec_variables

    cfg = ModelConfig(**TINY)
    m = VideoCodec(cfg=cfg)
    v = init_codec_variables(m, jax.random.PRNGKey(0), spatial=(64, 64))
    tops = set(v["params"].keys())
    assert {
        "motion_hyper_encoder", "motion_hyper_decoder", "motion_hyper_eb",
        "residual_hyper_encoder", "residual_hyper_decoder",
        "residual_hyper_eb",
    } <= tops
    # Unused factorized y-bottlenecks are NOT created in hyper mode.
    assert "motion_entropy_bottleneck" not in tops

    f1 = jnp.zeros((1, 64, 64, 3))
    f2 = jnp.full((1, 64, 64, 3), 0.5)
    flow = jnp.zeros((1, 64, 64, 2))

    def loss(params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            f1, f2, flow, 2, train=True,
            rngs={"noise": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return (
            jnp.sum(out["rate_motion"])
            + jnp.sum(out["rate_motion_hyper"])
            + jnp.sum(out["rate_residual"])
            + jnp.sum(out["rate_residual_hyper"])
            + jnp.mean(jnp.square(out["frame2_reconstructed_final"] - f2))
        )

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(
        {k: g[k] for k in g if "hyper" in k}
    )
    assert leaves and all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # The hyper path must receive gradient signal (rate depends on it).
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_phase3_res_ae_freezes_motion_hyper_modules():
    from rdvc_tpu.config import TrainConfig
    from rdvc_tpu.train.phases import phase_trainable_mask

    params = {
        k: {"w": np.zeros(1)}
        for k in (
            "motion_encoder", "motion_hyper_encoder", "motion_hyper_eb",
            "residual_encoder", "residual_hyper_encoder",
            "motion_compensation_net",
        )
    }
    cfg = TrainConfig(phase3_variant="res_ae")
    mask = phase_trainable_mask(cfg, 3, params)
    assert not mask["motion_hyper_encoder"]["w"]
    assert not mask["motion_hyper_eb"]["w"]
    assert mask["residual_hyper_encoder"]["w"]


@pytest.mark.slow
def test_trainer_step_hyperprior_smoke():
    from rdvc_tpu.config import TrainConfig
    from rdvc_tpu.train.data import SyntheticFlowPairDataset, batch_iterator
    from rdvc_tpu.train.loop import Trainer

    cfg = TrainConfig(
        batch_size=2, crop_size=(32, 32), real_bitstream_check_every=0
    )
    trainer = Trainer(cfg=cfg, model_cfg=ModelConfig(**TINY))
    state = trainer.init_state(spatial=(32, 32))
    ds = SyntheticFlowPairDataset(size=32, length=2, seed=0)
    batch = next(batch_iterator(ds, 2, shuffle=False))
    state, metrics = trainer.train_step(state, batch, phase=2)
    assert np.isfinite(metrics["loss"])
    # bpp metrics include the z streams (strictly positive even for
    # near-deterministic latents because the EB density is untrained).
    assert metrics["bpp_motion"] > 0 and metrics["bpp_residual"] > 0


def test_checkpoint_cross_load_factorized_to_hyper(tmp_path):
    """strict=False load semantics (reference new_train.py:397-411): a
    factorized checkpoint warm-starts the hyper model's shared transforms;
    hyper modules keep their init; the file's EB subtrees are dropped."""
    from rdvc_tpu.models.codec import VideoCodec, init_codec_variables
    from rdvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    base = {k: v for k, v in TINY.items() if k != "hyperprior" and k != "hyper_channels"}
    mF = VideoCodec(cfg=ModelConfig(**base))
    vF = init_codec_variables(mF, jax.random.PRNGKey(0), spatial=(32, 32))
    path = str(tmp_path / "f.ckpt")
    save_checkpoint(path, vF, {"note": "factorized"})

    # Exact-structure reload stays bit-identical (regression guard for the
    # merge-based loader).
    tmpl = init_codec_variables(mF, jax.random.PRNGKey(1), spatial=(32, 32))
    v2, _ = load_checkpoint(path, tmpl)
    for a, b in zip(
        jax.tree_util.tree_leaves(vF["params"]),
        jax.tree_util.tree_leaves(v2["params"]),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    mH = VideoCodec(cfg=ModelConfig(**TINY))
    tH = init_codec_variables(mH, jax.random.PRNGKey(2), spatial=(32, 32))
    vH, _ = load_checkpoint(path, tH)
    # Shared transforms took the file's weights (every leaf)...
    for a, b in zip(
        jax.tree_util.tree_leaves(vH["params"]["motion_encoder"]),
        jax.tree_util.tree_leaves(vF["params"]["motion_encoder"]),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # ...and differ from the template's own init on at least one leaf
    # (otherwise the previous assertion would be vacuous).
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(vH["params"]["motion_encoder"]),
            jax.tree_util.tree_leaves(tH["params"]["motion_encoder"]),
        )
    )
    # Hyper modules kept the template init (every leaf).
    for a, b in zip(
        jax.tree_util.tree_leaves(vH["params"]["motion_hyper_encoder"]),
        jax.tree_util.tree_leaves(tH["params"]["motion_hyper_encoder"]),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Runtime + pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hyper_runtime():
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

    return CodecRuntime(model_cfg=ModelConfig(**TINY), seed=0)


def test_runtime_hyper_roundtrip_exact(hyper_runtime):
    rt = hyper_runtime
    rng = np.random.default_rng(1)
    for which, c in (("motion", 16), ("residual", 24)):
        y = rng.normal(0, 3, (1, 12, 20, c)).astype(np.float32)
        bs, shape = rt.compress_motion(y) if which == "motion" else (
            rt.compress_residual(y)
        )
        assert bs[0] == HYPER_TAG and shape == (12, 20)
        y_hat = (
            rt.decompress_motion_symbols(bs, shape)
            if which == "motion"
            else rt.decompress_residual_symbols(bs, shape)
        )
        assert y_hat.dtype == np.float32
        # Dequantized latents sit within half a step of the input: the
        # decoder reproduced the encoder's exact (mu, sigma).
        assert float(np.abs(y_hat - y).max()) <= 0.5 + 1e-5
        # Determinism: encoding twice gives identical bytes.
        bs2, _ = rt.compress_motion(y) if which == "motion" else (
            rt.compress_residual(y)
        )
        assert bs2 == bs


def test_runtime_hyper_rate_tracks_sigma(hyper_runtime):
    """Payloads must shrink for latents the Gaussian model predicts well:
    near-mean latents cost less than far-from-mean latents."""
    rt = hyper_runtime
    rng = np.random.default_rng(2)
    y_small = rng.normal(0, 0.5, (1, 12, 20, 16)).astype(np.float32)
    y_big = rng.normal(0, 30.0, (1, 12, 20, 16)).astype(np.float32)
    b_small, _ = rt.compress_motion(y_small)
    b_big, _ = rt.compress_motion(y_big)
    assert len(b_small) < len(b_big)


def test_runtime_hyper_device_transport_roundtrip(hyper_runtime, monkeypatch):
    """Force the device transport (0x03 z + 0x05 y blobs) through the
    runtime seam and round-trip exactly. The encoder and decoder derive
    bins through the SAME compiled graph (codec_runtime._hyper_quant_fns
    invariant), so the device-coded stream must reproduce the host-path
    latents bit-for-bit."""
    from rdvc_tpu.entropy.device_gaussian import BIN_TAG as BT
    from rdvc_tpu.entropy.device_rans import CA_TAG
    from rdvc_tpu.entropy.rans.coder import unpack_hyper_payload

    rt = hyper_runtime
    rng = np.random.default_rng(5)
    # Small amplitude: the untrained hyper-synthesis predicts sigma near
    # its softplus floor (~0.8 -> row support +-5); larger symbols would
    # escape to the host coder (that policy has its own test above).
    y = rng.normal(0, 0.3, (1, 12, 20, 16)).astype(np.float32)

    monkeypatch.setenv("RDVC_HYPER_DEVICE_MIN_N", "1")
    bs_dev, shape = rt.compress_motion(y)
    assert bs_dev[0] == HYPER_TAG
    _, z_blob, y_blob = unpack_hyper_payload(bs_dev)
    assert z_blob[0] == CA_TAG and y_blob[0] == BT

    monkeypatch.setenv("RDVC_HYPER_DEVICE_MIN_N", str(1 << 30))
    bs_host, _ = rt.compress_motion(y)
    _, z_blob_h, y_blob_h = unpack_hyper_payload(bs_host)
    assert z_blob_h[0] == 0x01 and y_blob_h[0] == 0x01

    lat_dev = np.asarray(rt.decompress_motion_symbols(bs_dev, shape))
    lat_host = np.asarray(rt.decompress_motion_symbols(bs_host, shape))
    # Same quantization graphs => identical latents from both transports.
    assert np.array_equal(lat_dev, lat_host)
    assert float(np.abs(lat_dev - y).max()) <= 0.5 + 1e-5


@pytest.mark.slow
def test_fused_hyper_chain_encode_roundtrip(hyper_runtime, monkeypatch):
    """Fused hyper encode (chain -> latents/z in one jit, shared per-frame
    bins graphs, all four entropy encodes + one packed meta) must produce
    0x04 payloads the standard hyper decode round-trips to within half a
    quantization step of the chain latents — whichever transport each
    frame ended up on (device, or per-frame host fallback on escapes)."""
    from rdvc_tpu.models.raft import RaftRunner

    rt = hyper_runtime
    monkeypatch.setenv("RDVC_HYPER_DEVICE_MIN_N", "1")
    runner = RaftRunner(iters=2, spatial=(32, 48))
    rt.attach_raft(runner.model, runner.variables)
    rng = np.random.RandomState(5)
    # Smooth, slowly-varying chain: keeps untrained-model latents small.
    base = rng.rand(64, 96, 3)
    chain = np.stack(
        [np.clip(base + 0.01 * t, 0, 1) * 255 for t in range(4)]
    ).astype(np.uint8)
    hw = ((32, 48), (64, 96), (64, 96))

    handles = rt.encode_pframes_chain_hyper(chain, *hw)
    results = rt.assemble_frames_hyper(handles, 3)
    m_lat, r_lat = np.asarray(handles[5]), np.asarray(handles[6])
    assert len(results) == 3
    for i, (m_bs, m_shape, r_bs, r_shape) in enumerate(results):
        assert m_bs[0] == HYPER_TAG and r_bs[0] == HYPER_TAG
        y_m = np.asarray(rt.decompress_motion_symbols(m_bs, m_shape))
        y_r = np.asarray(rt.decompress_residual_symbols(r_bs, r_shape))
        assert float(np.abs(y_m - m_lat[i : i + 1]).max()) <= 0.5 + 1e-4
        assert float(np.abs(y_r - r_lat[i : i + 1]).max()) <= 0.5 + 1e-4

    # Failure fallback: per-frame coding on chain latents matches shapes.
    lat = rt.encode_pframes_chain_latents(chain, *hw)
    assert lat[0].shape == handles[5].shape
    assert lat[1].shape == handles[6].shape

    # Batched device decode (the GOP-prefetch path) must equal the
    # per-frame decode for every device-transport frame in the group.
    # Byte 13 is the inner z blob's transport tag (after the 0x04 header).
    m_payloads = [r[0] for r in results]
    if all(p[13] == 0x03 for p in m_payloads):
        batch = np.asarray(
            rt.decode_payloads_device(
                m_payloads, "motion", results[0][1]
            )
        )
        assert batch.dtype == np.float32
        for i, p in enumerate(m_payloads):
            one = np.asarray(
                rt.decompress_motion_symbols(p, results[i][1])
            )
            assert np.array_equal(batch[i : i + 1], one)
    else:
        # Mixed transports: the batched path must refuse so the caller
        # falls back to per-frame decode.
        with pytest.raises(ValueError):
            rt.decode_hyper_payloads_device(
                m_payloads, "motion", results[0][1]
            )


@pytest.mark.slow
def test_hyper_pipeline_roundtrip(tmp_path):
    """encode -> .rdvc -> decode with the hyperprior model; the decoder
    self-configures from the container metadata (no flag needed)."""
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
    from rdvc_tpu.pipeline.decode import decode_video
    from rdvc_tpu.pipeline.encode import encode_video
    from tests.test_pipeline import _make_video, _small_config

    in_path, frames = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    config.hyperprior = True
    config.hyper_channels = TINY["hyper_channels"]
    # Match the tiny architecture so runtime init stays fast.
    config.motion_latent_channels = TINY["motion_latent_channels"]
    config.residual_latent_channels = TINY["residual_latent_channels"]
    config.encoder_base_channels = TINY["encoder_base_channels"]
    config.mcn_base_channels = TINY["mcn_base_channels"]

    enc_rt = CodecRuntime(model_cfg=config.model_config(), seed=0)
    enc = encode_video(config, runtime=enc_rt)
    assert enc["frames"] == 6
    assert enc["metadata"]["entropy_model"] == "hyperprior"

    # Fresh decode-side runtime built FROM METADATA (config deliberately
    # reset to factorized) — proves the container self-describes.
    config.hyperprior = False
    import rdvc_tpu.pipeline.decode as dec_mod

    built = {}
    orig = dec_mod.CodecRuntime

    def _capture(*a, **k):
        rt = orig(*a, **k)
        built["cfg"] = rt.cfg
        return rt

    dec_mod.CodecRuntime = _capture
    try:
        dec = decode_video(config, collect_frames=True)
    finally:
        dec_mod.CodecRuntime = orig
    assert dec["frames"] == 6
    assert built["cfg"].hyperprior
    out0 = dec["decoded_frames"][0]
    assert out0.shape == frames[0].shape
    # Random-init model: only pipeline integrity is asserted (frames
    # decode, finite, in range) — RD quality needs training.
    for f in dec["decoded_frames"]:
        assert f.dtype == np.uint8 and f.shape == frames[0].shape


@pytest.mark.slow
def test_hyper_pipeline_fused_device_roundtrip(tmp_path, monkeypatch):
    """encode -> decode with the FUSED hyper encode path engaged (JAX RAFT
    chain + device transport forced small): exercises encode.py's hyper
    flush branch, escape fallbacks, and decode of mixed-transport frames."""
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
    from rdvc_tpu.pipeline.decode import decode_video
    from rdvc_tpu.pipeline.encode import encode_video
    from tests.test_pipeline import _make_video, _small_config

    monkeypatch.setenv("RDVC_HYPER_DEVICE_MIN_N", "1")
    in_path, frames = _make_video(tmp_path)
    config = _small_config(tmp_path, in_path)
    config.hyperprior = True
    config.hyper_channels = TINY["hyper_channels"]
    config.motion_latent_channels = TINY["motion_latent_channels"]
    config.residual_latent_channels = TINY["residual_latent_channels"]
    config.encoder_base_channels = TINY["encoder_base_channels"]
    config.mcn_base_channels = TINY["mcn_base_channels"]
    config.raft_backend = "auto"  # fused chain path (random RAFT weights)
    config.device_entropy_coding = True

    enc_rt = CodecRuntime(model_cfg=config.model_config(), seed=0)
    enc = encode_video(config, runtime=enc_rt)
    assert enc["frames"] == 6
    assert enc["metadata"]["entropy_model"] == "hyperprior"
    # Debug dumps force the serial decode path and must handle the
    # hyperprior's float latents (no median re-add, no factorized tables).
    config.debug_dump_enabled = True
    config.debug_frames_dir_decode = str(tmp_path / "dbg")
    config.debug_frame_interval_decode = 1
    dec = decode_video(config, collect_frames=True)
    assert dec["frames"] == 6
    for f in dec["decoded_frames"]:
        assert f.dtype == np.uint8 and f.shape == frames[0].shape
    import glob

    dumped = glob.glob(str(tmp_path / "dbg" / "*.png"))
    assert len(dumped) >= 9  # all 9 stages for at least one P-frame


def test_runtime_refuses_mismatched_checkpoint_variant(tmp_path):
    """The tolerant merge-loader would silently give a wrong --hyperprior
    flag random entropy params; the runtime must refuse instead (the
    trainer records model_config in checkpoint metadata)."""
    from rdvc_tpu.models.codec import VideoCodec, init_codec_variables
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
    from rdvc_tpu.utils.checkpoint import save_checkpoint

    base = {
        k: v for k, v in TINY.items()
        if k not in ("hyperprior", "hyper_channels")
    }
    mH = VideoCodec(cfg=ModelConfig(**TINY))
    vH = init_codec_variables(mH, jax.random.PRNGKey(0), spatial=(32, 32))
    path = str(tmp_path / "h.ckpt")
    save_checkpoint(path, vH, {"model_config": {"hyperprior": True}})
    with pytest.raises(ValueError, match="hyperprior"):
        CodecRuntime(
            model_cfg=ModelConfig(**base), checkpoint_path=path
        )
    # Matching flag loads fine.
    rt = CodecRuntime(model_cfg=ModelConfig(**TINY), checkpoint_path=path)
    assert rt.cfg.hyperprior
