"""VideoCodec model tests: shapes, phase semantics, reconstruct path.

Spec: reference VideoCodec training forward (new_train.py:229-296) and
inference decompress path (codec_processing.py:538-619).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdvc_tpu.config import ModelConfig
from rdvc_tpu.models.codec import VideoCodec, init_codec_variables


@pytest.fixture(scope="module")
def codec_and_vars():
    model = VideoCodec(cfg=ModelConfig())
    variables = init_codec_variables(model, jax.random.PRNGKey(0), spatial=(64, 64))
    return model, variables


def _inputs(h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    f1 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    f2 = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    flow = jnp.asarray(rng.randn(1, h, w, 2) * 2, jnp.float32)
    return f1, f2, flow


def test_forward_shapes_phase2(codec_and_vars):
    model, variables = codec_and_vars
    f1, f2, flow = _inputs()
    out = model.apply(
        variables, f1, f2, flow, 2, train=True,
        rngs={"noise": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    assert out["flow_reconstructed"].shape == (1, 64, 64, 2)
    assert out["residual_reconstructed"].shape == (1, 64, 64, 3)
    assert out["frame2_reconstructed_final"].shape == (1, 64, 64, 3)
    # 8x downsampling, motion latent 128 / residual latent 192
    assert out["motion_latents"].shape == (1, 8, 8, 128)
    assert out["residual_latents"].shape == (1, 8, 8, 192)
    r = np.asarray(out["frame2_reconstructed_final"])
    assert r.min() >= 0.0 and r.max() <= 1.0
    assert np.all(np.isfinite(np.asarray(out["rate_motion"])))


def test_phase1_uses_gt_flow_warp(codec_and_vars):
    """In phase 1 the predictor is the GT-flow warp (no MCN)."""
    from rdvc_tpu.ops.warp import bilinear_warp

    model, variables = codec_and_vars
    f1, f2, flow = _inputs(seed=2)
    out = model.apply(
        variables, f1, f2, flow, 1, train=False,
    )
    expected = bilinear_warp(f1, flow)
    np.testing.assert_allclose(
        np.asarray(out["frame2_motion_compensated"]),
        np.asarray(expected),
        atol=1e-5,
    )


def test_phase2_mcn_is_multiplicative_mask(codec_and_vars):
    model, variables = codec_and_vars
    f1, f2, flow = _inputs(seed=3)
    out = model.apply(variables, f1, f2, flow, 2, train=False)
    from rdvc_tpu.ops.warp import bilinear_warp

    warped = np.asarray(bilinear_warp(f1, out["flow_reconstructed"]))
    mc = np.asarray(out["frame2_motion_compensated"])
    # mask in (0,1): |mc| <= |warped|
    assert np.all(np.abs(mc) <= np.abs(warped) + 1e-5)


def test_reconstruct_p_frame_with_resolution_change(codec_and_vars):
    """Decode path handles compression-res latents + upsampling to target."""
    model, variables = codec_and_vars
    rng = np.random.RandomState(4)
    prev = jnp.asarray(rng.rand(1, 96, 128, 3), jnp.float32)
    q_m = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    q_r = jnp.asarray(rng.randn(1, 8, 8, 192), jnp.float32)
    out = model.apply(
        variables, prev, q_m, q_r, (96, 128),
        method=VideoCodec.reconstruct_p_frame,
    )
    assert out["reconstructed"].shape == (1, 96, 128, 3)
    assert out["flow"].shape == (1, 96, 128, 2)
    r = np.asarray(out["reconstructed"])
    assert r.min() >= 0.0 and r.max() <= 1.0


def test_aux_loss_finite(codec_and_vars):
    model, variables = codec_and_vars
    val = model.apply(variables, method=VideoCodec.aux_loss)
    assert np.isfinite(float(val))


def test_forward_jits_and_grads():
    """The training step must be jittable and differentiable end-to-end."""
    model = VideoCodec(cfg=ModelConfig())
    variables = init_codec_variables(model, jax.random.PRNGKey(5), spatial=(32, 32))
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    f1, f2, flow = _inputs(32, 32, seed=6)

    @jax.jit
    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            f1, f2, flow, 2, train=True,
            rngs={"noise": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        num_px = 32 * 32
        bpp = (out["rate_motion"].sum() + out["rate_residual"].sum()) / num_px
        mse_flow = jnp.mean((out["flow_reconstructed"] - flow) ** 2)
        mse_res = jnp.mean(
            (out["residual_reconstructed"] - out["residual_computed"]) ** 2
        )
        return 10.0 * mse_flow + 10000.0 * mse_res + bpp

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
