"""mmconv == XLA conv (the matmul reformulation must be numerically
faithful; bf16 inputs, f32 accumulation both sides)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdvc_tpu.ops.mmconv import conv2d_mm, conv_transpose2d_mm


@pytest.mark.parametrize(
    "B,H,W,Cin,Cout,k,s",
    [
        (2, 16, 24, 64, 128, 3, 2),
        (2, 16, 24, 64, 64, 3, 1),
        (1, 20, 20, 3, 64, 5, 1),    # im2col regime (small Cin)
        (2, 16, 16, 2, 32, 5, 1),    # flow stem
        (1, 15, 17, 40, 8, 3, 1),    # odd spatial dims
    ],
)
def test_conv2d_mm_matches_xla(B, H, W, Cin, Cout, k, s):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, Cin, Cout) * 0.1, jnp.float32).astype(
        jnp.bfloat16
    )
    pad = k // 2
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = conv2d_mm(x, w, stride=(s, s), padding=(pad, pad))
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2
    )


@pytest.mark.parametrize(
    "B,H,W,Cin,Cout",
    [(2, 8, 12, 64, 32), (1, 7, 9, 16, 8), (2, 16, 16, 128, 64)],
)
def test_conv_transpose2d_mm_matches_xla(B, H, W, Cin, Cout):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.1, jnp.float32).astype(
        jnp.bfloat16
    )
    ref = jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = conv_transpose2d_mm(x, w)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2
    )


def test_layer_param_tree_identical_across_impls(monkeypatch):
    """mm and xla conv impls must expose IDENTICAL param trees (checkpoint
    interchangeability) and compute the same function."""
    import os

    from rdvc_tpu.models.layers import ConvNormAct, ConvTransposeNormAct

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 6), jnp.float32)

    def tree_paths(tree, prefix=""):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out += tree_paths(v, prefix + k + "/")
            else:
                out.append((prefix + k, v.shape))
        return sorted(out)

    outs = {}
    trees = {}
    for impl in ("mm", "xla"):
        monkeypatch.setenv("RDVC_CONV_IMPL", impl)
        m = ConvNormAct(12, kernel_size=3, stride=2)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        trees[impl] = tree_paths(jax.tree_util.tree_map(np.asarray, v["params"]))
        outs[impl] = m.apply(v, x, train=False)
    assert trees["mm"] == trees["xla"]
    np.testing.assert_allclose(
        np.asarray(outs["mm"], np.float32),
        np.asarray(outs["xla"], np.float32),
        rtol=5e-2, atol=5e-2,
    )

    for impl in ("mm", "xla"):
        monkeypatch.setenv("RDVC_CONV_IMPL", impl)
        m = ConvTransposeNormAct(12)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        trees[impl] = tree_paths(jax.tree_util.tree_map(np.asarray, v["params"]))
        outs[impl] = m.apply(v, x, train=False)
    assert trees["mm"] == trees["xla"]
    np.testing.assert_allclose(
        np.asarray(outs["mm"], np.float32),
        np.asarray(outs["xla"], np.float32),
        rtol=5e-2, atol=5e-2,
    )
