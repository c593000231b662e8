"""Training-log parsing + plotting and RD-curve tools.

Reference equivalents: vis.py / vis_phase3.py (log -> per-phase metric
plots) and vis_bench.py (RD benchmark tables -> curves). Our training loop
logs structured "epoch N done ... {metrics}" lines; parse those. Also
includes the reference's published RD benchmark tables (vis_bench.py:5-24)
for comparison plots.
"""

from __future__ import annotations

import ast
import re
from typing import Dict, List, Optional

# Reference's published RD points (vis_bench.py:5-24): comp-res -> metrics.
REFERENCE_RD = {
    "Beauty": {
        "res": [1080, 720, 480, 360, 240, 140],
        "psnr": [30.31, 29.65, 28.80, 28.79, 27.57, 26.60],
        "msssim": [0.8775, 0.8655, 0.8464, 0.8459, 0.8182, 0.8075],
        "bpp": [0.5151, 0.2809, 0.1959, 0.1678, 0.1485, 0.1386],
    },
    "ReadySetGo": {
        "res": [1080, 720, 480, 360, 240, 140],
        "psnr": [27.87, 27.09, 24.36, 25.10, 22.10, 20.98],
        "msssim": [0.9365, 0.9219, 0.8541, 0.8721, 0.7458, 0.6720],
        "bpp": [0.6180, 0.3855, 0.2862, 0.2487, 0.2191, 0.2014],
    },
    "Jockey": {
        "res": [1080, 720, 480, 360, 240, 140],
        "psnr": [29.13, 28.61, 26.82, 27.42, 23.70, 21.97],
        "msssim": [0.9046, 0.8847, 0.8388, 0.8423, 0.7357, 0.6673],
        "bpp": [1.0363, 0.4180, 0.2497, 0.1977, 0.1603, 0.1394],
    },
}

_EPOCH_RE = re.compile(
    r"epoch (\d+) done in ([\d.]+)s: (\{.*\})"
)


def parse_training_log(path: str) -> List[Dict]:
    """Parse `epoch N done in Ts: {...}` lines into records."""
    records = []
    with open(path) as f:
        for line in f:
            m = _EPOCH_RE.search(line)
            if not m:
                continue
            try:
                metrics = ast.literal_eval(m.group(3))
            except (ValueError, SyntaxError):
                continue
            records.append(
                {"epoch": int(m.group(1)), "seconds": float(m.group(2)), **metrics}
            )
    return records


def plot_training_curves(records: List[Dict], out_path: str) -> Optional[str]:
    """Per-metric training curves (vis.py equivalent)."""
    if not records:
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in records[0] if k not in ("epoch", "seconds")]
    n = len(keys)
    cols = 3
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.5 * rows))
    axes = axes.ravel() if n > 1 else [axes]
    epochs = [r["epoch"] for r in records]
    for ax, key in zip(axes, keys):
        ax.plot(epochs, [r.get(key) for r in records])
        ax.set_title(key)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    for ax in axes[n:]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_rd_curves(
    results: Dict[str, Dict[str, List[float]]],
    out_path: str,
    metric: str = "psnr",
    include_reference: bool = True,
) -> str:
    """RD curves (vis_bench.py equivalent): results maps video name ->
    {'bpp': [...], metric: [...]}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for name, data in results.items():
        ax.plot(data["bpp"], data[metric], "o-", label=f"{name} (ours)")
    if include_reference:
        for name, data in REFERENCE_RD.items():
            key = "psnr" if metric == "psnr" else "msssim"
            ax.plot(
                data["bpp"], data[key], "s--", alpha=0.5,
                label=f"{name} (reference)",
            )
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)" if metric == "psnr" else "MS-SSIM")
    ax.grid(alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
