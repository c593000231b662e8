"""CodecRuntime: jitted device compute + host rANS around the VideoCodec.

This is the inference engine both pipelines share. It mirrors the split in
the reference between device model work and CompressAI's host coder
(compress_simplified / decompress_frame_simplified,
/root/reference/codec_processing.py:509-619) but jits each stage once per
shape and keeps all state on device between stages.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rdvc_tpu.config import ModelConfig
from rdvc_tpu.entropy.factorized import build_cdf_tables, CdfTables
from rdvc_tpu.entropy.rans import (
    RansCodec,
    decode_with_tables,
    encode_with_tables,
)
from rdvc_tpu.models.codec import VideoCodec, init_codec_variables
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow
from rdvc_tpu.ops.warp import bilinear_warp
from rdvc_tpu.utils.checkpoint import load_checkpoint


class CodecRuntime:
    def __init__(
        self,
        model_cfg: Optional[ModelConfig] = None,
        variables: Optional[dict] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.cfg = model_cfg or ModelConfig()
        self.model = VideoCodec(cfg=self.cfg)
        if variables is None:
            variables = init_codec_variables(
                self.model, jax.random.PRNGKey(seed)
            )
            if checkpoint_path:
                variables, _ = load_checkpoint(checkpoint_path, variables)
        self.variables = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        # The update(force=True) equivalent: bake CDF tables once at load
        # (reference codec_processing.py:869-886).
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        self.motion_tables: CdfTables = build_cdf_tables(
            params["motion_entropy_bottleneck"]
        )
        self.residual_tables: CdfTables = build_cdf_tables(
            params["residual_entropy_bottleneck"]
        )
        self.rans = RansCodec()
        self._apply = self.model.apply

    # ------------------------------------------------------------------
    # Jitted device functions (cached per shape via functools.lru_cache on
    # the jitted callables; jax.jit itself caches by shape)
    # ------------------------------------------------------------------
    @functools.cached_property
    def _encode_pframe_fn(self):
        @functools.partial(jax.jit, static_argnames=("comp_hw_flow", "comp_hw_res"))
        def fn(variables, prev, cur, flow_orig, comp_hw_flow, comp_hw_res):
            # Encode-side prediction uses the RAFT flow directly (the
            # reference's encoder never decodes its own bitstream and uses
            # the ground-truth current frame as the next reference,
            # codec_processing.py:1456-1471, 1499).
            warped = bilinear_warp(prev, flow_orig)
            pred = self._mc(variables, warped, flow_orig, prev)
            residual = cur - pred
            residual_c = resize_bilinear(residual, comp_hw_res, antialias=True)
            flow_c = resize_flow(flow_orig, comp_hw_flow)
            m_lat = self._apply(
                variables, flow_c, method=VideoCodec.analyze_motion
            )
            r_lat = self._apply(
                variables, residual_c, method=VideoCodec.analyze_residual
            )
            return m_lat, r_lat

        return fn

    def _mc(self, variables, warped, flow, ref):
        return self._apply(
            variables,
            warped,
            flow,
            ref,
            method=lambda m, w, f, r: m.motion_compensation_net(
                w, f, r, train=False
            ),
        )

    @functools.cached_property
    def _reconstruct_fn(self):
        @functools.partial(jax.jit, static_argnames=("target_hw",))
        def fn(variables, prev, q_m, q_r, target_hw):
            return self._apply(
                variables, prev, q_m, q_r, target_hw,
                method=VideoCodec.reconstruct_p_frame,
            )

        return fn

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def encode_pframe_latents(
        self,
        prev: jax.Array,
        cur: jax.Array,
        flow_orig: jax.Array,
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
    ) -> Tuple[jax.Array, jax.Array]:
        return self._encode_pframe_fn(
            self.variables, prev, cur, flow_orig,
            tuple(comp_hw_flow), tuple(comp_hw_res),
        )

    def compress_motion(self, latents) -> Tuple[bytes, Tuple[int, int]]:
        lat = np.asarray(latents, np.float32)
        bs = encode_with_tables(lat, self.motion_tables, self.rans)
        return bs, (lat.shape[1], lat.shape[2])

    def compress_residual(self, latents) -> Tuple[bytes, Tuple[int, int]]:
        lat = np.asarray(latents, np.float32)
        bs = encode_with_tables(lat, self.residual_tables, self.rans)
        return bs, (lat.shape[1], lat.shape[2])

    def decompress_motion(self, bs: bytes, shape_hw) -> np.ndarray:
        return decode_with_tables(bs, shape_hw, self.motion_tables, self.rans)

    def decompress_residual(self, bs: bytes, shape_hw) -> np.ndarray:
        return decode_with_tables(bs, shape_hw, self.residual_tables, self.rans)

    def reconstruct_p_frame(
        self,
        prev: jax.Array,
        q_motion: jax.Array,
        q_residual: jax.Array,
        target_hw: Tuple[int, int],
    ) -> Dict[str, jax.Array]:
        return self._reconstruct_fn(
            self.variables, prev, jnp.asarray(q_motion), jnp.asarray(q_residual),
            tuple(int(v) for v in target_hw),
        )

    def quantized_latents(self, latents, which: str) -> np.ndarray:
        """Round latents to what a rANS round-trip would produce (symbols
        relative to the channel medians) without touching the coder."""
        tables = self.motion_tables if which == "motion" else self.residual_tables
        lat = np.asarray(latents, np.float64)
        med = tables.medians[None, None, None, :]
        return (np.round(lat - med) + med).astype(np.float32)
