"""Optical-flow HSV visualization.

Reference: visualize_flow_hsv (/root/reference/codec_processing.py:1005-1027)
— cartToPolar -> hue from angle, value from normalized magnitude, full
saturation -> RGB. Pure numpy (host-side debug/visualization utility).
"""

from __future__ import annotations

import numpy as np


def flow_to_hsv_rgb(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 RGB visualization."""
    fx = np.asarray(flow[..., 0], np.float32)
    fy = np.asarray(flow[..., 1], np.float32)
    mag = np.sqrt(fx * fx + fy * fy)
    ang = np.arctan2(fy, fx)  # [-pi, pi]
    hue = (ang + np.pi) / (2 * np.pi)  # [0, 1]
    scale = max_mag if max_mag else max(float(mag.max()), 1e-6)
    val = np.clip(mag / scale, 0.0, 1.0)
    sat = np.ones_like(val)
    # HSV -> RGB
    h6 = hue * 6.0
    i = np.floor(h6).astype(np.int32) % 6
    f = h6 - np.floor(h6)
    p = val * (1 - sat)
    q = val * (1 - f * sat)
    t = val * (1 - (1 - f) * sat)
    r = np.choose(i, [val, q, p, p, t, val])
    g = np.choose(i, [t, val, val, q, p, p])
    b = np.choose(i, [p, p, t, val, val, q])
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)
