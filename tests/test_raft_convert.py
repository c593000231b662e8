"""Validate the torchvision raft_large -> flax weight converter.

torchvision is not installed here, so the test constructs a synthetic
state_dict with torchvision >=0.13's EXACT raft_large key names and shapes
(torchvision/models/optical_flow/raft.py; reference usage:
/root/reference/codec_processing.py:48-82, 1244-1308) and asserts:
  1. full conversion with no missing/leftover keys,
  2. the converted tree is structurally identical (paths + shapes) to
     RAFT.init's variables,
  3. the model runs with converted weights,
  4. functional parity of the feature/context encoders against a
     torch re-implementation of the torchvision blocks (torch IS installed).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rdvc_tpu.models.raft import RAFT
from rdvc_tpu.models.raft.convert import convert_torchvision_raft
from rdvc_tpu.models.raft.encoders import RaftEncoder


def _tv_conv_keys(sd, rng, prefix, o, i, k, bias):
    sd[f"{prefix}.weight"] = rng.randn(o, i, k[0], k[1]).astype(np.float32) * 0.1
    if bias:
        sd[f"{prefix}.bias"] = rng.randn(o).astype(np.float32) * 0.1


def _tv_bn_keys(sd, rng, prefix, c):
    sd[f"{prefix}.weight"] = 1.0 + 0.1 * rng.randn(c).astype(np.float32)
    sd[f"{prefix}.bias"] = 0.1 * rng.randn(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = 0.1 * rng.randn(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(100, np.int64)


def _tv_encoder_keys(sd, rng, prefix, batchnorm):
    """feature/context encoder: stem convnormrelu, layer1-3 (2 units each),
    final conv. raft_large dims: 64 -> (64, 96, 128) -> 256."""
    _tv_conv_keys(sd, rng, f"{prefix}.convnormrelu.0", 64, 3, (7, 7), bias=False)
    if batchnorm:
        _tv_bn_keys(sd, rng, f"{prefix}.convnormrelu.1", 64)
    dims = [(64, 64), (64, 96), (96, 128)]
    for layer, (cin, cout) in enumerate(dims, start=1):
        for unit in (0, 1):
            tp = f"{prefix}.layer{layer}.{unit}"
            i0 = cin if unit == 0 else cout
            _tv_conv_keys(sd, rng, f"{tp}.convnormrelu1.0", cout, i0, (3, 3), False)
            _tv_conv_keys(sd, rng, f"{tp}.convnormrelu2.0", cout, cout, (3, 3), False)
            if batchnorm:
                _tv_bn_keys(sd, rng, f"{tp}.convnormrelu1.1", cout)
                _tv_bn_keys(sd, rng, f"{tp}.convnormrelu2.1", cout)
            if unit == 0 and layer > 1:  # strided units project
                _tv_conv_keys(sd, rng, f"{tp}.downsample.0", cout, cin, (1, 1), False)
                if batchnorm:
                    _tv_bn_keys(sd, rng, f"{tp}.downsample.1", cout)
    _tv_conv_keys(sd, rng, f"{prefix}.conv", 256, 128, (1, 1), bias=True)


def make_tv_raft_large_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    _tv_encoder_keys(sd, rng, "feature_encoder", batchnorm=False)
    _tv_encoder_keys(sd, rng, "context_encoder", batchnorm=True)
    ub = "update_block"
    _tv_conv_keys(sd, rng, f"{ub}.motion_encoder.convcorr1.0", 256, 324, (1, 1), True)
    _tv_conv_keys(sd, rng, f"{ub}.motion_encoder.convcorr2.0", 192, 256, (3, 3), True)
    _tv_conv_keys(sd, rng, f"{ub}.motion_encoder.convflow1.0", 128, 2, (7, 7), True)
    _tv_conv_keys(sd, rng, f"{ub}.motion_encoder.convflow2.0", 64, 128, (3, 3), True)
    _tv_conv_keys(sd, rng, f"{ub}.motion_encoder.conv.0", 126, 256, (3, 3), True)
    for g, k in (("convgru1", (1, 5)), ("convgru2", (5, 1))):
        for c in ("convz", "convr", "convq"):
            _tv_conv_keys(sd, rng, f"{ub}.recurrent_block.{g}.{c}", 128, 384, k, True)
    _tv_conv_keys(sd, rng, f"{ub}.flow_head.conv1", 256, 128, (3, 3), True)
    _tv_conv_keys(sd, rng, f"{ub}.flow_head.conv2", 2, 256, (3, 3), True)
    _tv_conv_keys(sd, rng, "mask_predictor.convrelu.0", 256, 128, (3, 3), True)
    _tv_conv_keys(sd, rng, "mask_predictor.conv", 576, 256, (1, 1), True)
    return sd


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.shape(v)
    return out


def test_convert_tree_matches_model_init():
    sd = make_tv_raft_large_state_dict()
    converted = convert_torchvision_raft(sd)

    model = RAFT(iters=2)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ref = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), dummy, dummy)
    )
    ref = {"params": dict(ref["params"]), "batch_stats": dict(ref["batch_stats"])}

    got_p = _paths(converted["params"])
    want_p = _paths(ref["params"])
    assert got_p == want_p, (
        f"missing={sorted(set(want_p) - set(got_p))[:5]} "
        f"extra={sorted(set(got_p) - set(want_p))[:5]}"
    )
    assert _paths(converted["batch_stats"]) == _paths(ref["batch_stats"])


def test_convert_rejects_layout_drift():
    sd = make_tv_raft_large_state_dict()
    sd.pop("update_block.flow_head.conv1.weight")
    with pytest.raises(KeyError):
        convert_torchvision_raft(sd)
    sd2 = make_tv_raft_large_state_dict()
    sd2["update_block.unexpected.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError):
        convert_torchvision_raft(sd2)


def test_converted_weights_run():
    sd = make_tv_raft_large_state_dict()
    variables = convert_torchvision_raft(sd)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = RAFT(iters=2)
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)
    b = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)
    flow = model.apply(variables, a, b, train=False)
    assert flow.shape == (1, 32, 48, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_load_torchvision_checkpoint_from_pth(tmp_path):
    """RaftRunner path: a .pth file saved by torch loads and converts."""
    torch = pytest.importorskip("torch")
    from rdvc_tpu.models.raft.raft import load_torchvision_raft_checkpoint

    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in make_tv_raft_large_state_dict(seed=2).items()
    }
    p = tmp_path / "raft_large_sintel.pth"
    torch.save(sd, str(p))
    variables = load_torchvision_raft_checkpoint(str(p))
    model = RAFT(iters=1)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), dummy, dummy)
    assert _paths(jax.tree_util.tree_map(np.asarray, variables)["params"]) == _paths(
        jax.tree_util.tree_map(np.asarray, ref)["params"]
    )


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["instance", "batch"])
def test_encoder_matches_torch_reimplementation(kind):
    """Functional parity: run a torch re-implementation of torchvision's
    FeatureEncoder graph with the synthetic weights and compare against our
    RaftEncoder with the converted weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    sd = {}
    rng = np.random.RandomState(3)
    prefix = "feature_encoder" if kind == "instance" else "context_encoder"
    _tv_encoder_keys(sd, rng, prefix, batchnorm=(kind == "batch"))

    t = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()
         if not k.endswith("num_batches_tracked")}

    def conv(x, p, stride=1):
        w = t[f"{p}.weight"]
        b = t.get(f"{p}.bias")
        pad = (w.shape[-1] // 2, w.shape[-2] // 2)  # (wpad, hpad) -> F wants (h, w)
        return F.conv2d(x, w, b, stride=stride, padding=(w.shape[-2] // 2, w.shape[-1] // 2))

    def norm(x, p, c):
        if kind == "instance":
            return F.instance_norm(x, eps=1e-5)
        return F.batch_norm(
            x, t[f"{p}.running_mean"], t[f"{p}.running_var"],
            t[f"{p}.weight"], t[f"{p}.bias"], training=False, eps=1e-5,
        )

    def block(x, tp, cout, stride):
        y = torch.relu(norm(conv(x, f"{tp}.convnormrelu1.0", stride), f"{tp}.convnormrelu1.1", cout))
        y = torch.relu(norm(conv(y, f"{tp}.convnormrelu2.0"), f"{tp}.convnormrelu2.1", cout))
        if f"{tp}.downsample.0.weight" in t:
            x = norm(conv(x, f"{tp}.downsample.0", stride), f"{tp}.downsample.1", cout)
        return torch.relu(x + y)

    x_np = np.random.RandomState(4).rand(1, 3, 40, 56).astype(np.float32)
    x = torch.from_numpy(x_np)
    with torch.no_grad():
        y = torch.relu(norm(conv(x, f"{prefix}.convnormrelu.0", 2), f"{prefix}.convnormrelu.1", 64))
        for layer, cout in ((1, 64), (2, 96), (3, 128)):
            y = block(y, f"{prefix}.layer{layer}.0", cout, 1 if layer == 1 else 2)
            y = block(y, f"{prefix}.layer{layer}.1", cout, 1)
        y = conv(y, f"{prefix}.conv")
    want = y.numpy().transpose(0, 2, 3, 1)

    from rdvc_tpu.models.raft.convert import _encoder, _StateDict

    params, stats = _encoder(_StateDict(sd), prefix, kind)
    enc = RaftEncoder(output_dim=256, norm=kind, compute_dtype=jnp.float32)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    got = np.asarray(
        enc.apply(
            jax.tree_util.tree_map(jnp.asarray, variables),
            jnp.asarray(x_np.transpose(0, 2, 3, 1)),
            train=False,
        )
    )
    assert got.shape == want.shape
    # Unnormalized random-weight outputs grow to O(1e3-1e4); float32
    # accumulation-order differences scale with magnitude, so use a
    # scale-aware absolute tolerance (~1e-5 of the output range).
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5 * scale)
