"""RAFT optical flow in JAX (recurrent all-pairs field transforms).

Fresh implementation to the paper spec (arXiv 2003.12039; PAPERS.md) filling
the reference's RAFT dependency (invocation contract:
/root/reference/codec_processing.py:1436-1444 — 12 iterations, last flow
used; input frames resized to a fixed working resolution, [0,1] RGB).

TPU-native: NHWC, bf16 conv compute, correlation volume as one batched
matmul, iterations as a lax.scan over a static-length loop with the
correlation pyramid held loop-invariant.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rdvc_tpu.models.raft.corr import build_corr_pyramid, corr_lookup
from rdvc_tpu.models.raft.encoders import RaftEncoder
from rdvc_tpu.models.raft.fast_update import fused_update_step
from rdvc_tpu.models.raft.update import UpdateBlock, convex_upsample


class RAFT(nn.Module):
    """RAFT-large: 256-d features, hidden/context 128, 4-level pyramid,
    radius-4 lookup, 8x convex upsampling."""

    iters: int = 12
    num_levels: int = 4
    radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Fused Pallas correlation kernel (TPU only; see pallas_corr.py)
    use_pallas_corr: bool = False
    # Inference-only fused update block (exact conv fusions; fast_update.py).
    # Training and `init` always run the flax modules.
    fused_update: bool = False

    def setup(self):
        self.fnet = RaftEncoder(
            output_dim=256, norm="instance", compute_dtype=self.compute_dtype
        )
        self.cnet = RaftEncoder(
            output_dim=self.hidden_dim + self.context_dim,
            norm="batch",
            compute_dtype=self.compute_dtype,
        )
        self.update_block = UpdateBlock(
            hidden_dim=self.hidden_dim, compute_dtype=self.compute_dtype
        )

    def __call__(
        self,
        image1: jax.Array,
        image2: jax.Array,
        *,
        train: bool = False,
        return_all: bool = False,
    ):
        """image1/image2: (B, H, W, 3) in [0, 1]; H, W divisible by 8.

        Returns the final upsampled flow (B, H, W, 2); with return_all=True,
        also the per-iteration upsampled flows (iters, B, H, W, 2).
        """
        H, W = image1.shape[1:3]
        if H % 8 or W % 8:
            raise ValueError(f"RAFT input dims must be /8, got {H}x{W}")
        # RAFT normalizes images to [-1, 1].
        x1 = image1.astype(jnp.float32) * 2.0 - 1.0
        x2 = image2.astype(jnp.float32) * 2.0 - 1.0

        fmap1 = self.fnet(x1, train=train)
        fmap2 = self.fnet(x2, train=train)
        cfeat = self.cnet(x1, train=train)
        return self._flow_from_features(
            fmap1, fmap2, cfeat, (H, W), return_all=return_all
        )

    def flow_chain(self, chain: jax.Array, *, train: bool = False):
        """Flow for the consecutive pairs of a frame chain.

        chain: (B+1, H, W, 3) in [0, 1] -> flow (B, H, W, 2) for pairs
        (i, i+1). The feature encoder runs ONCE per frame; the pairwise
        form (__call__ on chain[:-1], chain[1:]) runs it twice on every
        interior frame. Exact per-sample: fnet is instance-norm and cnet
        uses eval-mode BatchNorm running stats, so batch membership does
        not change any frame's features. Inference-only (train-mode BN
        would couple batch statistics)."""
        H, W = chain.shape[1:3]
        if H % 8 or W % 8:
            raise ValueError(f"RAFT input dims must be /8, got {H}x{W}")
        x = chain.astype(jnp.float32) * 2.0 - 1.0
        fmaps = self.fnet(x, train=train)
        cfeat = self.cnet(x[:-1], train=train)
        return self._flow_from_features(fmaps[:-1], fmaps[1:], cfeat, (H, W))

    def _flow_from_features(
        self, fmap1, fmap2, cfeat, hw, *, return_all: bool = False
    ):
        H, W = hw
        B = fmap1.shape[0]
        pyramid = build_corr_pyramid(
            fmap1, fmap2, self.num_levels, use_pallas=self.use_pallas_corr
        )
        hidden = jnp.tanh(cfeat[..., : self.hidden_dim])
        context = nn.relu(cfeat[..., self.hidden_dim :])

        h8, w8 = H // 8, W // 8
        xs = jax.lax.broadcasted_iota(jnp.float32, (B, h8, w8), 2)
        ys = jax.lax.broadcasted_iota(jnp.float32, (B, h8, w8), 1)
        coords0 = jnp.stack([xs, ys], axis=-1)  # (B, h8, w8, 2)

        # Iterations are python-unrolled: the update block shares parameters
        # across iterations (flax reuses the submodule), the spatial size is
        # 1/8 resolution, and XLA fuses the unrolled body; flax modules
        # cannot be applied inside a raw lax.scan body.
        flow = jnp.zeros((B, h8, w8, 2), jnp.float32)
        ups = []
        fused = self.fused_update and not self.is_initializing()
        for _ in range(self.iters):
            coords = coords0 + flow
            corr = corr_lookup(pyramid, coords, self.radius)
            if fused:
                hidden, delta, mask = fused_update_step(
                    self.update_block.variables["params"],
                    hidden, context, corr, flow, self.compute_dtype,
                )
            else:
                hidden, delta, mask = self.update_block(
                    hidden, context, corr, flow
                )
            flow = flow + delta
            if return_all:
                ups.append(convex_upsample(flow, mask))
        final = ups[-1] if return_all else convex_upsample(flow, mask)
        if return_all:
            return final, jnp.stack(ups)
        return final


def load_torchvision_raft_checkpoint(path: str) -> dict:
    """Load a torchvision raft_large .pth/.pt checkpoint from disk and
    convert it to flax variables (host-side; requires torch)."""
    import torch

    from rdvc_tpu.models.raft.convert import convert_torchvision_raft

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {
        k.removeprefix("module.").removeprefix("_orig_mod."): v.numpy()
        for k, v in sd.items()
        if hasattr(v, "numpy")
    }
    variables = convert_torchvision_raft(sd)
    return jax.tree_util.tree_map(jnp.asarray, variables)


class RaftRunner:
    """Host-facing wrapper: owns variables, jits the forward per shape."""

    def __init__(
        self,
        variables: Optional[dict] = None,
        iters: int = 12,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
        spatial: Tuple[int, int] = (368, 640),
    ):
        import os

        fused = os.environ.get("RDVC_RAFT_FUSED", "1") != "0"
        self.model = RAFT(iters=iters, fused_update=fused)
        if variables is None:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            variables = self.model.init(
                jax.random.PRNGKey(seed), dummy, dummy
            )
            if checkpoint_path and checkpoint_path.endswith((".pth", ".pt", ".tar")):
                # torchvision raft_large checkpoint (the reference's Sintel
                # weights, codec_processing.py:1244-1308): convert on host.
                variables = load_torchvision_raft_checkpoint(checkpoint_path)
            elif checkpoint_path:
                from rdvc_tpu.utils.checkpoint import load_checkpoint

                variables, _ = load_checkpoint(checkpoint_path, variables)
        self.variables = variables
        self._jitted = jax.jit(
            lambda v, a, b: self.model.apply(v, a, b, train=False)
        )

    def __call__(self, image1: jax.Array, image2: jax.Array) -> jax.Array:
        return self._jitted(self.variables, image1, image2)

    def estimate(self, frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
        """FlowFn interface: (H, W, 3) float [0,1] frames -> (1, H, W, 2)."""
        a = jnp.asarray(frame1[None], jnp.float32)
        b = jnp.asarray(frame2[None], jnp.float32)
        return np.asarray(self._jitted(self.variables, a, b))
