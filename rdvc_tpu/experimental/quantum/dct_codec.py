"""Experimental I-frame codec: 8x8 block DCT + quantization (+ optional
EFRQI quantum-circuit encoding study).

Reference: /root/reference/quantum_compressor_wrapper.py (standalone, NOT
wired into the production codec — README.md:3): grayscale image -> 8x8 DCT
-> quantization table -> nonzero coefficients -> EFRQI circuit on a
simulator -> classical IDCT reconstruction; reports PSNR + a classical
compression-ratio estimate as JSON on stdout.

Here the DCT path is pure numpy/scipy (host-side); the EFRQI circuit study
runs only if PennyLane is installed (`efrqi_circuit_stats`), mirroring the
reference's simulator-only role.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import numpy as np
from scipy.fftpack import dctn, idctn

# JPEG-style luminance quantization table (the reference uses a scaled
# standard table).
_Q50 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float64,
)


def _quality_table(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    q = np.floor((_Q50 * scale + 50.0) / 100.0)
    return np.maximum(q, 1.0)


class DctBlockCodec:
    """8x8 block-DCT grayscale I-frame codec."""

    def __init__(self, quality: int = 50, block: int = 8):
        self.block = block
        self.qtable = _quality_table(quality)

    def compress(self, gray: np.ndarray) -> Dict:
        """(H, W) uint8 -> dict of quantized nonzero coefficients."""
        h, w = gray.shape
        b = self.block
        ph = (b - h % b) % b
        pw = (b - w % b) % b
        img = np.pad(gray.astype(np.float64) - 128.0, ((0, ph), (0, pw)), "edge")
        H, W = img.shape
        blocks = img.reshape(H // b, b, W // b, b).transpose(0, 2, 1, 3)
        coeffs = dctn(blocks, axes=(2, 3), norm="ortho")
        q = np.round(coeffs / self.qtable)
        nz = np.nonzero(q)
        return {
            "shape": (h, w),
            "padded": (H, W),
            "indices": np.stack(nz, 1).astype(np.int32),
            "values": q[nz].astype(np.int16),
        }

    def decompress(self, data: Dict) -> np.ndarray:
        h, w = data["shape"]
        H, W = data["padded"]
        b = self.block
        q = np.zeros((H // b, W // b, b, b), np.float64)
        idx = data["indices"]
        q[idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]] = data["values"]
        coeffs = q * self.qtable
        blocks = idctn(coeffs, axes=(2, 3), norm="ortho")
        img = blocks.transpose(0, 2, 1, 3).reshape(H, W) + 128.0
        return np.clip(img[:h, :w], 0, 255).astype(np.uint8)

    def evaluate(self, gray: np.ndarray) -> Dict:
        """Round-trip + metrics, JSON-ready (the reference's stdout
        protocol, quantum_compressor_wrapper.py:340)."""
        data = self.compress(gray)
        recon = self.decompress(data)
        mse = float(np.mean((gray.astype(np.float64) - recon) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        nnz = int(data["values"].shape[0])
        # Classical size estimate: ~3 bytes per nonzero coeff (pos + value)
        est_bytes = nnz * 3
        raw_bytes = gray.size
        return {
            "psnr_db": psnr,
            "nonzero_coeffs": nnz,
            "estimated_bytes": est_bytes,
            "compression_ratio": raw_bytes / max(est_bytes, 1),
        }


def efrqi_circuit_stats(
    gray_block: np.ndarray, shots: int = 1024
) -> Optional[Dict]:
    """EFRQI circuit study on one 8x8 block (requires PennyLane; returns
    None when unavailable — the quantum part is an optional simulator-side
    experiment, reference quantum_compressor_wrapper.py:102-203)."""
    try:
        import pennylane as qml
    except ImportError:
        return None
    b = gray_block.shape[0]
    n_pos = int(np.ceil(np.log2(b * b)))
    codec = DctBlockCodec(quality=50, block=b)
    data = codec.compress(gray_block)
    values = data["values"]
    n_val = max(int(np.ceil(np.log2(np.abs(values).max() + 1))) + 1, 1) if values.size else 1
    wires = n_pos + n_val
    dev = qml.device("default.qubit", wires=wires, shots=shots)

    @qml.qnode(dev)
    def circuit():
        for i in range(n_pos):
            qml.Hadamard(wires=i)
        for (bi, bj, y, x), v in zip(data["indices"], values):
            pos = int(y) * b + int(x)
            bits = [(pos >> k) & 1 for k in range(n_pos)]
            vv = int(abs(v)) & ((1 << n_val) - 1)
            for k in range(n_val):
                if (vv >> k) & 1:
                    ctrl = [i for i in range(n_pos)]
                    qml.ctrl(
                        qml.PauliX(wires=n_pos + k),
                        control=ctrl,
                        control_values=bits,
                    )
        return qml.counts()

    counts = circuit()
    return {"num_qubits": wires, "shots": shots, "unique_outcomes": len(counts)}


def main(argv=None) -> int:
    """CLI: grayscale image -> JSON metrics on stdout."""
    import argparse

    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--quality", type=int, default=50)
    args = p.parse_args(argv)
    gray = np.asarray(Image.open(args.image).convert("L"))
    result = DctBlockCodec(quality=args.quality).evaluate(gray)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
