"""Per-epoch training visualization.

Reference: new_train.py:622-727 — a 4x2 matplotlib grid per epoch: original
vs reconstruction (with PSNR), motion-compensated prediction vs reference
frame, GT vs reconstructed flow magnitudes, computed vs reconstructed
residuals; saved as epoch_%04d_phase%d_vis.png.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def visualize_epoch(
    trainer,
    state,
    batch,
    epoch: int,
    phase: int,
    out_dir: str,
) -> Optional[str]:
    """Render the reference's 4x2 diagnostic grid for the first sample."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    f1, f2, flow = (jnp.asarray(x[:1], jnp.float32) for x in batch)
    out = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        f1, f2, flow, phase, train=False,
    )

    def img(x):
        return np.clip(np.asarray(x)[0], 0.0, 1.0)

    def mag(fl):
        a = np.asarray(fl)[0]
        return np.sqrt(a[..., 0] ** 2 + a[..., 1] ** 2)

    recon = img(out["frame2_reconstructed_final"])
    orig = img(f2)
    mse = float(np.mean((recon - orig) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))

    fig, axes = plt.subplots(4, 2, figsize=(10, 16))
    panels = [
        (orig, "original frame2"),
        (recon, f"reconstruction (PSNR {psnr:.2f} dB)"),
        (img(out["frame2_motion_compensated"]), "MC prediction"),
        (img(f1), "reference frame1"),
        (mag(out["flow_input"]), "GT flow |v|"),
        (mag(out["flow_reconstructed"]), "reconstructed flow |v|"),
        (img(out["residual_computed"] * 0.5 + 0.5), "residual (target)"),
        (img(out["residual_reconstructed"] * 0.5 + 0.5), "residual (recon)"),
    ]
    for ax, (data, title) in zip(axes.ravel(), panels):
        if data.ndim == 2:
            ax.imshow(data, cmap="magma")
        else:
            ax.imshow(data)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"epoch_{epoch:04d}_phase{phase}_vis.png")
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
