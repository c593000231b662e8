"""Two-frame P-frame round trip (the reference's canonical smoke test).

Spec: /root/reference/test_2frames.py:433-592 — load im1/im2, estimate flow
at the RAFT working resolution, upscale to native, native-resolution
warp+MCN residual (clamped to [-1, 1], test_2frames.py:510), compress,
decompress, histogram-match the reconstruction to the ORIGINAL im2 (unlike
the decoder pipeline which matches to the previous decoded frame), report
PSNR/SSIM raw and matched plus stage timings, save artifacts.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.ops.metrics import psnr as psnr_fn, ssim as ssim_fn
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow
from rdvc_tpu.ops.warp import bilinear_warp
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.pipeline.flow import make_flow_backend
from rdvc_tpu.postproc import histogram_match_ycrcb

log = logging.getLogger(__name__)


def _load_image(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _dummy_images(dir_: str, size=(256, 256)):
    """Create dummy inputs when missing (reference test_2frames.py:616-626)."""
    os.makedirs(dir_, exist_ok=True)
    ys, xs = np.mgrid[0 : size[0], 0 : size[1]].astype(np.float32)
    a = np.stack(
        [np.sin(xs / 13), np.cos(ys / 17), np.sin((xs + ys) / 23)], -1
    ) * 0.5 + 0.5
    b = np.roll(a, (3, 5), axis=(0, 1))
    p1 = os.path.join(dir_, "im1.png")
    p2 = os.path.join(dir_, "im2.png")
    Image.fromarray((a * 255).astype(np.uint8)).save(p1)
    Image.fromarray((b * 255).astype(np.uint8)).save(p2)
    return p1, p2


def run_two_frame_roundtrip(
    im1_path: str,
    im2_path: str,
    config: Optional[CodecConfig] = None,
    runtime: Optional[CodecRuntime] = None,
    output_dir: Optional[str] = None,
) -> Dict:
    config = config or CodecConfig()
    if not (os.path.exists(im1_path) and os.path.exists(im2_path)):
        im1_path, im2_path = _dummy_images(
            os.path.dirname(im1_path) or "."
        )
    runtime = runtime or CodecRuntime(
        model_cfg=config.model_config(),
        checkpoint_path=(
            config.codec_checkpoint_path
            if os.path.exists(config.codec_checkpoint_path)
            else None
        ),
    )
    f1 = _load_image(im1_path)
    f2 = _load_image(im2_path)
    H, W = f1.shape[:2]
    d1 = jnp.asarray(f1[None])
    d2 = jnp.asarray(f2[None])

    # Flow at working resolution -> native
    raft_hw = (config.raft_resize_height, config.raft_resize_width)
    flow_fn = make_flow_backend(config.raft_backend, raft_iters=config.raft_iters)
    f1_small = np.asarray(resize_bilinear(d1, raft_hw))[0]
    f2_small = np.asarray(resize_bilinear(d2, raft_hw))[0]
    flow = flow_fn(f1_small, f2_small)
    flow_native = resize_flow(jnp.asarray(flow), (H, W))

    # Native-res prediction + residual (clamped +-1, test_2frames.py:510)
    warped = bilinear_warp(d1, flow_native)
    mc = runtime._mc(runtime.variables, warped, flow_native, d1)
    residual = jnp.clip(d2 - mc, -1.0, 1.0)

    t0 = time.time()
    m_lat = runtime._apply(
        runtime.variables, flow_native, method=type(runtime.model).analyze_motion
    )
    r_lat = runtime._apply(
        runtime.variables, residual, method=type(runtime.model).analyze_residual
    )
    m_bs, m_shape = runtime.compress_motion(m_lat)
    r_bs, r_shape = runtime.compress_residual(r_lat)
    t_compress = time.time() - t0

    t0 = time.time()
    q_m = runtime.decompress_motion(m_bs, m_shape)
    q_r = runtime.decompress_residual(r_bs, r_shape)
    out = runtime.reconstruct_p_frame(d1, q_m, q_r, (H, W))
    recon = out["reconstructed"]
    t_decompress = time.time() - t0

    t0 = time.time()
    matched = histogram_match_ycrcb(recon, d2)  # match to ORIGINAL im2
    t_histmatch = time.time() - t0

    result = {
        "psnr_raw": float(psnr_fn(recon, d2)[0]),
        "ssim_raw": float(ssim_fn(recon, d2)[0]),
        "psnr_matched": float(psnr_fn(matched, d2)[0]),
        "ssim_matched": float(ssim_fn(matched, d2)[0]),
        "bytes_motion": len(m_bs),
        "bytes_residual": len(r_bs),
        "time_compress_s": t_compress,
        "time_decompress_s": t_decompress,
        "time_histmatch_s": t_histmatch,
    }
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)

        def save(name, arr):
            a = np.asarray(jnp.clip(arr[0], 0, 1) * 255).astype(np.uint8)
            Image.fromarray(a).save(os.path.join(output_dir, name))

        save("warped.png", warped)
        save("motion_compensated.png", mc)
        save("residual.png", residual * 0.5 + 0.5)
        save("reconstructed.png", recon)
        save("reconstructed_matched.png", matched)
        save("original_im2.png", d2)
        save("original_im1.png", d1)
    return result
