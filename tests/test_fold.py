"""BatchNorm folding (models/fold.py): the folded norm='none' model must
reproduce the eval-mode norm='batch' model through every inference piece."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdvc_tpu.config import ModelConfig
from rdvc_tpu.models.codec import VideoCodec, init_codec_variables
from rdvc_tpu.models.fold import fold_batchnorms, foldable


def _trained_like_variables(seed=0):
    """Init variables, then perturb BN stats/affines so folding is
    non-trivial (fresh init has mean=0, var=1, scale=1, bias=0 — folding
    would be the identity and the test would not exercise the math)."""
    model = VideoCodec(cfg=ModelConfig())
    variables = init_codec_variables(model, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed + 1)

    def perturb(tree, is_stats):
        if isinstance(tree, dict):
            return {k: perturb(v, is_stats or k == "BatchNorm_0") for k, v in tree.items()}
        if is_stats:
            arr = np.asarray(tree, np.float32)
            return jnp.asarray(arr + rng.uniform(0.1, 0.8, arr.shape).astype(np.float32))
        return tree

    return model, {
        "params": perturb(variables["params"], False),
        "batch_stats": perturb(variables["batch_stats"], True),
    }


@pytest.fixture(scope="module")
def folded_pair():
    model, variables = _trained_like_variables()
    folded_params = fold_batchnorms(
        variables["params"], variables["batch_stats"]
    )
    folded_model = VideoCodec(cfg=ModelConfig(norm="none"))
    return model, variables, folded_model, {"params": folded_params}


def test_foldable_detects_batchnorm(folded_pair):
    model, variables, _, folded_vars = folded_pair
    assert foldable(variables["params"])
    assert not foldable(folded_vars["params"])


def test_fold_preserves_inference_pieces(folded_pair):
    model, variables, fmodel, fvars = folded_pair
    rng = np.random.RandomState(7)
    flow = jnp.asarray(rng.randn(1, 32, 48, 2).astype(np.float32) * 3)
    residual = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32) * 0.2)

    for method, x in [
        (VideoCodec.analyze_motion, flow),
        (VideoCodec.analyze_residual, residual),
    ]:
        a = np.asarray(model.apply(variables, x, method=method))
        b = np.asarray(fmodel.apply(fvars, x, method=method))
        # bf16 compute path: folded weights round differently, so exact
        # equality is impossible; require the divergence energy to be at
        # bf16-noise level relative to the signal (f32 compute agrees to
        # 2e-6 — see models/fold.py math).
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert rel < 2e-2, f"{method}: relative L2 divergence {rel}"


def test_fold_preserves_reconstruction(folded_pair):
    model, variables, fmodel, fvars = folded_pair
    rng = np.random.RandomState(11)
    prev = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    qm = jnp.asarray(rng.randn(1, 4, 6, ModelConfig().motion_latent_channels).astype(np.float32))
    qr = jnp.asarray(rng.randn(1, 4, 6, ModelConfig().residual_latent_channels).astype(np.float32))

    a = model.apply(
        variables, prev, qm, qr, (32, 48),
        method=VideoCodec.reconstruct_p_frame,
    )["reconstructed"]
    b = fmodel.apply(
        fvars, prev, qm, qr, (32, 48),
        method=VideoCodec.reconstruct_p_frame,
    )["reconstructed"]
    # Reconstructions are clipped to [0,1]; require PSNR-level agreement.
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    assert mse < 1e-4, f"folded reconstruction diverged: mse={mse}"


def test_runtime_folds_by_default(monkeypatch):
    from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

    rt = CodecRuntime(model_cfg=ModelConfig())
    assert rt.cfg.norm == "none"
    assert not foldable(rt.variables["params"])

    monkeypatch.setenv("RDVC_FOLD_BN", "0")
    rt_raw = CodecRuntime(model_cfg=ModelConfig())
    assert rt_raw.cfg.norm == "batch"
    assert foldable(rt_raw.variables["params"])
