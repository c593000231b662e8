"""FFT / QFT top-k patch compression study.

Reference: /root/reference/QFT_anchor_frame_encoding/fft.py (classical FFT
keep-top-k baseline) and qft.py (amplitude-encoded QFT on a simulator with
shot-sampled reconstruction) + run_benchmark_patching.py (1024x1024 patched
benchmark, PSNR/time for keep-% in {10, 50}).

The QFT of an amplitude-encoded vector is mathematically the unitary DFT of
the statevector, so `qft_simulated=True` reproduces the quantum pipeline
(including shot noise) in numpy without Qiskit; if Qiskit+Aer are installed
the circuit path can be used instead.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np


def fft_topk_compress(patch: np.ndarray, keep_fraction: float) -> Dict:
    """Keep the top-k magnitude FFT coefficients of a 2D patch."""
    f = np.fft.fft2(patch.astype(np.float64))
    flat = f.ravel()
    k = max(1, int(round(flat.size * keep_fraction)))
    idx = np.argpartition(np.abs(flat), -k)[-k:]
    return {
        "shape": patch.shape,
        "indices": idx.astype(np.int64),
        "values": flat[idx],
    }


def fft_topk_reconstruct(data: Dict) -> np.ndarray:
    flat = np.zeros(int(np.prod(data["shape"])), np.complex128)
    flat[data["indices"]] = data["values"]
    rec = np.fft.ifft2(flat.reshape(data["shape"])).real
    return np.clip(rec, 0, 255)


def qft_topk_roundtrip(
    patch: np.ndarray,
    keep_fraction: float,
    shots: Optional[int] = 4096,
    seed: int = 0,
) -> np.ndarray:
    """Amplitude-encode -> QFT -> top-k -> IQFT -> (shot-sampled) measure.

    Mirrors qft.py:16-145: the patch is flattened and L2-normalized into a
    2^n statevector; QFT == unitary DFT; reconstruction from sqrt(counts /
    shots) * norm loses sign/phase exactly as the reference does.
    """
    h, w = patch.shape
    vec = patch.astype(np.float64).ravel()
    n = int(np.ceil(np.log2(max(vec.size, 2))))
    dim = 1 << n
    state = np.zeros(dim, np.float64)
    state[: vec.size] = vec
    norm = np.linalg.norm(state)
    if norm == 0:
        return np.zeros_like(patch)
    state = state / norm
    # QFT (unitary DFT)
    freq = np.fft.fft(state) / np.sqrt(dim)
    k = max(1, int(round(dim * keep_fraction)))
    idx = np.argpartition(np.abs(freq), -k)[-k:]
    kept = np.zeros_like(freq)
    kept[idx] = freq[idx]
    # IQFT
    back = np.fft.ifft(kept) * np.sqrt(dim)
    probs = np.abs(back) ** 2
    s = probs.sum()
    if s <= 0:
        return np.zeros_like(patch)
    probs = probs / s
    if shots:
        rng = np.random.RandomState(seed)
        counts = rng.multinomial(shots, probs)
        amp = np.sqrt(counts / shots)
    else:
        amp = np.sqrt(probs)
    rec = (amp * norm)[: vec.size].reshape(h, w)
    return np.clip(rec, 0, 255)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))


def patched_benchmark(
    image: np.ndarray,
    patch_size: int = 16,
    keep_fractions: Tuple[float, ...] = (0.1, 0.5),
    methods: Tuple[str, ...] = ("fft", "qft"),
    shots: Optional[int] = 4096,
) -> List[Dict]:
    """Patch-wise FFT-vs-QFT benchmark (run_benchmark_patching.py:40-248)."""
    h, w = image.shape
    ph = h - h % patch_size
    pw = w - w % patch_size
    img = image[:ph, :pw].astype(np.float64)
    results = []
    for method in methods:
        for frac in keep_fractions:
            t0 = time.time()
            recon = np.zeros_like(img)
            for y in range(0, ph, patch_size):
                for x in range(0, pw, patch_size):
                    patch = img[y : y + patch_size, x : x + patch_size]
                    if method == "fft":
                        recon[y : y + patch_size, x : x + patch_size] = (
                            fft_topk_reconstruct(fft_topk_compress(patch, frac))
                        )
                    else:
                        recon[y : y + patch_size, x : x + patch_size] = (
                            qft_topk_roundtrip(patch, frac, shots=shots)
                        )
            results.append(
                {
                    "method": method,
                    "keep_fraction": frac,
                    "psnr_db": _psnr(img, recon),
                    "time_s": time.time() - t0,
                }
            )
    return results
