"""Unit tests for core ops: warp, resize, metrics.

Oracles: torch.nn.functional.grid_sample / interpolate (CPU torch is in the
image) and closed-form identities — mirroring the reference semantics
(codec_processing.py:322-367 warp; 772-818 resize_flow).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rdvc_tpu.ops import bilinear_warp, resize_bilinear, resize_flow, psnr, ssim, ms_ssim


def test_warp_zero_flow_is_identity():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 13, 17, 3).astype(np.float32)
    flow = np.zeros((2, 13, 17, 2), np.float32)
    out = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_integer_shift():
    rng = np.random.RandomState(1)
    img = rng.rand(1, 8, 8, 1).astype(np.float32)
    # flow dx=+1 everywhere: output(x) = input(x+1); border clamp at right edge
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, :, -1, 0], img[0, :, -1, 0], atol=1e-6)


def test_warp_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    B, H, W, C = 2, 20, 28, 3
    img = rng.rand(B, H, W, C).astype(np.float32)
    flow = (rng.rand(B, H, W, 2).astype(np.float32) - 0.5) * 6.0

    out = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))

    # Reference formulation: normalized grid + grid_sample border/bilinear
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ys, xs = torch.meshgrid(
        torch.linspace(-1, 1, H), torch.linspace(-1, 1, W), indexing="ij"
    )
    grid = torch.stack((xs, ys), dim=2)[None].repeat(B, 1, 1, 1)
    nfx = t_flow[:, 0] / ((W - 1) / 2.0)
    nfy = t_flow[:, 1] / ((H - 1) / 2.0)
    sample = grid + torch.stack((nfx, nfy), dim=3)
    ref = F.grid_sample(
        t_img, sample, mode="bilinear", padding_mode="border", align_corners=True
    )
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    img = rng.rand(1, 24, 36, 3).astype(np.float32)
    for out_hw in [(12, 18), (48, 72), (17, 25)]:
        out = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))
        t = torch.from_numpy(img).permute(0, 3, 1, 2)
        ref = F.interpolate(
            t, size=out_hw, mode="bilinear", align_corners=False, antialias=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=str(out_hw))


def test_resize_flow_rescales_displacements():
    flow = np.ones((1, 10, 20, 2), np.float32)
    out = np.asarray(resize_flow(jnp.asarray(flow), (20, 10)))
    assert out.shape == (1, 20, 10, 2)
    np.testing.assert_allclose(out[..., 0], 0.5, atol=1e-5)  # dx * 10/20
    np.testing.assert_allclose(out[..., 1], 2.0, atol=1e-5)  # dy * 20/10


def test_resize_flow_degenerate_returns_none():
    flow = np.ones((1, 10, 20, 2), np.float32)
    assert resize_flow(jnp.asarray(flow), (0, 10)) is None


def test_psnr():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = np.full((1, 8, 8, 3), 0.1, np.float32)
    val = float(psnr(jnp.asarray(a), jnp.asarray(b))[0])
    assert abs(val - 20.0) < 1e-3  # -10 log10(0.01)


def test_ssim_identity():
    rng = np.random.RandomState(4)
    a = rng.rand(1, 32, 32, 3).astype(np.float32)
    val = float(ssim(jnp.asarray(a), jnp.asarray(a))[0])
    assert val > 0.999


def test_ssim_matches_skimage():
    skimage = pytest.importorskip("skimage")
    from skimage.metrics import structural_similarity

    rng = np.random.RandomState(5)
    a = rng.rand(40, 40).astype(np.float32)
    b = np.clip(a + rng.randn(40, 40).astype(np.float32) * 0.05, 0, 1)
    ours = float(ssim(jnp.asarray(a[None, :, :, None]), jnp.asarray(b[None, :, :, None]))[0])
    ref = structural_similarity(a, b, data_range=1.0, win_size=7)
    assert abs(ours - ref) < 5e-3


def test_msssim_sanity():
    rng = np.random.RandomState(6)
    a = rng.rand(1, 192, 192, 3).astype(np.float32)
    same = float(ms_ssim(jnp.asarray(a), jnp.asarray(a))[0])
    assert same > 0.999
    b = np.clip(a + rng.randn(1, 192, 192, 3).astype(np.float32) * 0.1, 0, 1)
    diff = float(ms_ssim(jnp.asarray(a), jnp.asarray(b))[0])
    assert diff < same


def test_msssim_matches_pytorch_msssim():
    pm = pytest.importorskip("pytorch_msssim")
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(7)
    a = rng.rand(1, 192, 192, 3).astype(np.float32)
    b = np.clip(a + rng.randn(1, 192, 192, 3).astype(np.float32) * 0.05, 0, 1)
    ours = float(ms_ssim(jnp.asarray(a), jnp.asarray(b))[0])
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref = float(pm.ms_ssim(ta, tb, data_range=1.0))
    assert abs(ours - ref) < 1e-3
