"""EB-only calibration of a CodecRuntime to a clip's latent statistics.

The factorized entropy bottlenecks are density models over the analysis
transforms' latents; when eval content differs from the training
distribution, symbols drift outside the fitted support and every latent
escapes to the host bypass coder — the bitstream balloons and the
device coding path is bypassed entirely. The reference avoids this by
construction (it always evaluates the checkpoint on content like its
training data); here the synthetic eval clips make the fit explicit.

This is the EB half of training only (reference analog: the
`eb.update()`-after-every-step maintenance loop, new_train.py:968-976);
the transforms are untouched, so reconstruction quality is unchanged —
only the rate model adapts.

Shared by bench.py and scripts/sustained_run.py so both measure the
same coding regime.
"""

from __future__ import annotations

import numpy as np


def calibrate_on_clip(runtime, raft_variables, frames, config) -> None:
    """Fit the runtime's entropy bottlenecks to the latents this clip
    actually produces.

    frames: >=3 uint8 RGB frames (H, W, 3) from the eval clip family.
    Uses the fused encode path to produce motion/residual symbols for two
    consecutive P-frames, adds back the CURRENT medians (symbols are
    median-offset; fitting on raw symbols would silently shift the density
    by the old medians), and runs the EB-only fit.
    """
    h, w = frames[0].shape[:2]
    m_lat, r_lat = runtime._fused_encode_fn(
        runtime.variables,
        raft_variables,
        np.stack([frames[0], frames[1]]),
        np.stack([frames[1], frames[2]]),
        (config.raft_resize_height, config.raft_resize_width),
        (h, w),
        (h, w),
    )
    # Read medians BEFORE calibrate_entropy_models rebuilds the tables.
    m_med = runtime.motion_tables.medians[None, None, None, :]
    r_med = runtime.residual_tables.medians[None, None, None, :]
    runtime.calibrate_entropy_models(
        {
            "motion": np.asarray(m_lat, np.float32)[:, ::4, ::4] + m_med,
            "residual": np.asarray(r_lat, np.float32)[:, ::4, ::4] + r_med,
        }
    )
