"""Exactness of the lane-aligned (space-to-depth) inference graph.

models/fast_infer.py claims its weight rearrangements are EXACT rewrites of
the flax modules; these tests pin that in float32 (per-primitive and
per-module), then check the bf16 runtime wiring end-to-end with a loose
tolerance (bf16 reassociation differs between the two graphs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdvc_tpu.models import fast_infer as fi
from rdvc_tpu.models.layers import get_activation


def _conv_ref(x, k, pad, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("ksize", [3, 5])
def test_conv_s1_s2d_exact(ksize):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16, 5), jnp.float32)
    k = rng.randn(ksize, ksize, 5, 7).astype(np.float32)
    ref = _conv_ref(x, jnp.asarray(k), ksize // 2)
    w, pad = fi.conv_s1_weights_to_s2d(k)
    got = fi.depth_to_space(
        fi._conv(fi.space_to_depth(x), jnp.asarray(w, jnp.float32), pad)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv_s2_s2d_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 16, 6), jnp.float32)
    k = rng.randn(3, 3, 6, 9).astype(np.float32)
    ref = _conv_ref(x, jnp.asarray(k), 1, stride=2)
    w, pad = fi.conv_s2_weights_to_s2d(k)
    got = fi._conv(fi.space_to_depth(x), jnp.asarray(w, jnp.float32), pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_convT_subpixel_exact():
    from flax import linen as nn

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 11, 6), jnp.float32)
    k = rng.randn(3, 3, 6, 4).astype(np.float32)
    m = nn.ConvTranspose(
        features=4, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
        use_bias=False, param_dtype=jnp.float32,
    )
    ref = m.apply({"params": {"kernel": jnp.asarray(k)}}, x)
    w, pad = fi.convT_s2_weights_to_subpixel(k)
    got = fi.depth_to_space(fi._conv(x, jnp.asarray(w, jnp.float32), pad))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv_transpose_trunk_matches_flax():
    """fast_infer._conv_transpose (used for trunk up-layers) == flax."""
    from flax import linen as nn

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 7, 9, 8), jnp.float32)
    k = rng.randn(3, 3, 8, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    m = nn.ConvTranspose(
        features=4, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
        use_bias=True, param_dtype=jnp.float32,
    )
    ref = m.apply(
        {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}, x
    )
    got = fi._conv_transpose(x, jnp.asarray(k), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def _folded_params(module, rng_key, *args):
    v = module.init(jax.random.PRNGKey(rng_key), *args, train=False)
    return v["params"]


def test_analysis_module_exact_f32():
    from rdvc_tpu.models.transforms import AnalysisTransform

    m = AnalysisTransform(
        latent_channels=8, base_channels=4, num_downsample_layers=3,
        num_res_blocks=2, norm="none", compute_dtype=jnp.float32,
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 48, 64, 3), jnp.float32)
    p = _folded_params(m, 0, x)
    ref = m.apply({"params": p}, x, train=False)
    fp = fi._prep_analysis(jax.tree_util.tree_map(np.asarray, p), jnp.float32)
    got = fi.analysis_apply(fp, x, get_activation("leaky_relu"), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # Odd input dims take the plain fallback and must match too.
    x_odd = jnp.asarray(rng.randn(1, 47, 63, 3), jnp.float32)
    ref_o = m.apply({"params": p}, x_odd, train=False)
    got_o = fi.analysis_apply(fp, x_odd, get_activation("leaky_relu"), jnp.float32)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o), atol=1e-4)


def test_synthesis_module_exact_f32():
    from rdvc_tpu.models.transforms import SynthesisTransform

    m = SynthesisTransform(
        output_channels=3, base_channels=4, num_upsample_layers=3,
        num_res_blocks=2, norm="none", compute_dtype=jnp.float32,
    )
    rng = np.random.RandomState(5)
    y = jnp.asarray(rng.randn(1, 6, 8, 8), jnp.float32)
    p = _folded_params(m, 1, y)
    ref = m.apply({"params": p}, y, train=False)
    fp = fi._prep_synthesis(jax.tree_util.tree_map(np.asarray, p), jnp.float32)
    got = fi.synthesis_apply(fp, y, get_activation("leaky_relu"), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # Odd latent dims are fine (output is always even, 8x the latent grid).
    y_odd = jnp.asarray(rng.randn(1, 5, 7, 8), jnp.float32)
    ref_o = m.apply({"params": p}, y_odd, train=False)
    got_o = fi.synthesis_apply(fp, y_odd, get_activation("leaky_relu"), jnp.float32)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o), atol=1e-4)


def test_mcn_module_exact_f32():
    from rdvc_tpu.models.mcn import MotionCompensationNetwork

    m = MotionCompensationNetwork(
        base_channels=8, num_res_blocks=3, norm="none",
        compute_dtype=jnp.float32,
    )
    rng = np.random.RandomState(6)
    warped = jnp.asarray(rng.rand(1, 24, 32, 3), jnp.float32)
    flow = jnp.asarray(rng.randn(1, 24, 32, 2), jnp.float32)
    ref_f = jnp.asarray(rng.rand(1, 24, 32, 3), jnp.float32)
    p = _folded_params(m, 2, warped, flow, ref_f)
    ref = m.apply({"params": p}, warped, flow, ref_f, train=False)
    fp = fi._prep_mcn(jax.tree_util.tree_map(np.asarray, p), jnp.float32)
    got = fi.mcn_apply(
        fp, warped, flow, ref_f, get_activation("leaky_relu"), jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # Odd dims -> plain fallback
    w_o, f_o, r_o = warped[:, :23, :31], flow[:, :23, :31], ref_f[:, :23, :31]
    ref_o = m.apply({"params": p}, w_o, f_o, r_o, train=False)
    got_o = fi.mcn_apply(
        fp, w_o, f_o, r_o, get_activation("leaky_relu"), jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o), atol=1e-4)


def test_runtime_reconstruct_fast_vs_flax_bf16():
    """End-to-end wiring: CodecRuntime with the fast graph reproduces the
    flax graph's reconstruction within bf16 tolerance."""
    import os

    from rdvc_tpu.config import ModelConfig
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

    rng = np.random.RandomState(7)
    prev = rng.rand(1, 64, 96, 3).astype(np.float32)
    q_m = rng.randint(-3, 4, (1, 8, 12, 128)).astype(np.float32)
    q_r = rng.randint(-3, 4, (1, 8, 12, 192)).astype(np.float32)

    cfg = ModelConfig()
    rt_fast = CodecRuntime(model_cfg=cfg, seed=0)
    assert "fast" in rt_fast.variables, "fast graph not active"
    os.environ["RDVC_FAST_INFER"] = "0"
    try:
        rt_flax = CodecRuntime(model_cfg=cfg, seed=0)
    finally:
        del os.environ["RDVC_FAST_INFER"]
    assert "fast" not in rt_flax.variables

    out_f = rt_fast.reconstruct_p_frame(prev, q_m, q_r, (64, 96))
    out_s = rt_flax.reconstruct_p_frame(prev, q_m, q_r, (64, 96))
    np.testing.assert_allclose(
        np.asarray(out_f["reconstructed"]),
        np.asarray(out_s["reconstructed"]),
        atol=5e-2,
    )
    # Encode side too (analysis transforms + MCN via apply shim).
    flow = jnp.asarray(rng.randn(1, 64, 96, 2).astype(np.float32))
    m_f = rt_fast._apply(
        rt_fast.variables, flow,
        method=type(rt_fast.model).analyze_motion,
    )
    m_s = rt_flax._apply(
        rt_flax.variables, flow,
        method=type(rt_flax.model).analyze_motion,
    )
    np.testing.assert_allclose(
        np.asarray(m_f), np.asarray(m_s), atol=5e-2
    )


def test_calibration_reattaches_fast_tree():
    """calibrate_entropy_models rebuilds self.variables; the fast tree must
    survive (a dropped 'fast' key would KeyError on the next dispatch)."""
    from rdvc_tpu.config import ModelConfig
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

    rng = np.random.RandomState(3)
    rt = CodecRuntime(model_cfg=ModelConfig(), seed=0)
    assert "fast" in rt.variables
    rt.calibrate_entropy_models(
        {
            "motion": rng.randn(2, 4, 6, 128).astype(np.float32),
            "residual": rng.randn(2, 4, 6, 192).astype(np.float32),
        },
        steps=2,
    )
    assert "fast" in rt.variables
    prev = rng.rand(1, 32, 48, 3).astype(np.float32)
    q_m = rng.randint(-2, 3, (1, 4, 6, 128)).astype(np.float32)
    q_r = rng.randint(-2, 3, (1, 4, 6, 192)).astype(np.float32)
    out = rt.reconstruct_p_frame(prev, q_m, q_r, (32, 48))
    assert np.isfinite(np.asarray(out["reconstructed"])).all()


