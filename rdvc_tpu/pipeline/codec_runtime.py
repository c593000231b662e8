"""CodecRuntime: jitted device compute + host rANS around the VideoCodec.

This is the inference engine both pipelines share. It mirrors the split in
the reference between device model work and CompressAI's host coder
(compress_simplified / decompress_frame_simplified,
/root/reference/codec_processing.py:509-619) but jits each stage once per
shape and keeps all state on device between stages.
"""

from __future__ import annotations

import dataclasses
import functools
import os
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
from rdvc_tpu.postproc import histogram_match_ycrcb
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
                variables, ckpt_meta = load_checkpoint(
                    checkpoint_path, variables
                )
                # The merge-based loader tolerates tree mismatches (the
                # reference's strict=False), which makes a wrong
                # --hyperprior flag produce a valid-LOOKING model with
                # random entropy parameters. The trainer records its
                # model_config in the checkpoint metadata — cross-check
                # the entropy-model variant and fail loudly on mismatch.
                mc = (ckpt_meta or {}).get("model_config") or {}
                if "hyperprior" in mc and bool(mc["hyperprior"]) != bool(
                    self.cfg.hyperprior
                ):
                    raise ValueError(
                        f"checkpoint {checkpoint_path} was trained with "
                        f"hyperprior={mc['hyperprior']} but the runtime is "
                        f"configured with hyperprior={self.cfg.hyperprior};"
                        " pass the matching --hyperprior setting"
                    )
        # Inference-time BatchNorm folding (models/fold.py): eval-mode BN is
        # a fixed per-channel affine that composes exactly into the
        # preceding conv — the runtime re-instantiates the model with
        # norm='none' and folded kernels, removing every f32 norm
        # round-trip at 1080p. RDVC_FOLD_BN=0 keeps the raw graph.
        if (
            self.cfg.norm == "batch"
            and variables.get("batch_stats")
            and os.environ.get("RDVC_FOLD_BN", "1") != "0"
        ):
            from rdvc_tpu.models.fold import fold_batchnorms

            variables = {
                "params": fold_batchnorms(
                    variables["params"], variables["batch_stats"]
                )
            }
            self.cfg = dataclasses.replace(self.cfg, norm="none")
            self.model = VideoCodec(cfg=self.cfg)
        self.variables = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        # The update(force=True) equivalent: bake CDF tables once at load
        # (reference codec_processing.py:869-886). Download ONLY the EB
        # subtrees (a few KB) — the first device->host readback through the
        # axon relay pays a long handshake, and the full param tree is tens
        # of MB it never needs on host.
        if self.cfg.hyperprior:
            # Hyperprior variant: the factorized bottlenecks model the
            # hyper-latents z; latents y are Gaussian-conditional coded
            # against structural (checkpoint-independent) tables.
            from rdvc_tpu.entropy.gaussian import build_gaussian_cdf_tables

            self.motion_tables = None
            self.residual_tables = None
            self.motion_hyper_tables: CdfTables = build_cdf_tables(
                jax.tree_util.tree_map(
                    np.asarray, variables["params"]["motion_hyper_eb"]
                )
            )
            self.residual_hyper_tables: CdfTables = build_cdf_tables(
                jax.tree_util.tree_map(
                    np.asarray, variables["params"]["residual_hyper_eb"]
                )
            )
            self.gaussian_tables: CdfTables = build_gaussian_cdf_tables()
        else:
            self.motion_tables: CdfTables = build_cdf_tables(
                jax.tree_util.tree_map(
                    np.asarray,
                    variables["params"]["motion_entropy_bottleneck"],
                )
            )
            self.residual_tables: CdfTables = build_cdf_tables(
                jax.tree_util.tree_map(
                    np.asarray,
                    variables["params"]["residual_entropy_bottleneck"],
                )
            )
        self.rans = RansCodec()
        self._apply = self.model.apply
        # Lane-aligned inference graph (models/fast_infer.py): exact s2d
        # weight rearrangements of the folded checkpoint that keep the
        # full-resolution low-channel convs on 128-lane MXU tiles.
        # RDVC_FAST_INFER=0 keeps the flax graph.
        if (
            self.cfg.norm == "none"
            and os.environ.get("RDVC_FAST_INFER", "1") != "0"
        ):
            from rdvc_tpu.models.fast_infer import (
                FastCodecApply,
                build_fast_params,
            )

            self.variables["fast"] = build_fast_params(
                self.variables["params"]
            )
            self._apply = FastCodecApply(self.cfg)

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
            variables, warped, flow, ref, method=VideoCodec.apply_mcn
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
    # Fused single-dispatch paths (one jitted call per frame: fewer host
    # round-trips — critical when the device sits behind a tunnel)
    # ------------------------------------------------------------------
    def attach_raft(self, raft_model, raft_variables) -> None:
        """Attach a RAFT flax model + variables for the fused encode path."""
        self._raft_model = raft_model
        self._raft_variables = raft_variables

    @functools.cached_property
    def _fused_encode_fn(self):
        @functools.partial(
            jax.jit,
            static_argnames=("raft_hw", "comp_hw_flow", "comp_hw_res"),
        )
        def fn(
            variables, raft_variables, prev_u8, cur_u8,
            raft_hw, comp_hw_flow, comp_hw_res,
        ):
            return self._encode_body(
                variables, raft_variables, prev_u8, cur_u8,
                raft_hw, comp_hw_flow, comp_hw_res,
            )

        return fn

    def _encode_latents_body(
        self, variables, raft_variables, prev_u8, cur_u8,
        raft_hw, comp_hw_flow, comp_hw_res,
    ):
        """Traced fused P-frame front half: RAFT flow + warp + MCN +
        residual + analysis transforms -> (m_lat, r_lat) float latents."""
        prev = prev_u8.astype(jnp.float32) / 255.0
        cur = cur_u8.astype(jnp.float32) / 255.0
        H, W = prev.shape[1:3]
        p_small = resize_bilinear(prev, raft_hw)
        c_small = resize_bilinear(cur, raft_hw)
        flow_small = self._raft_model.apply(
            raft_variables, p_small, c_small, train=False
        )
        flow_orig = resize_flow(flow_small, (H, W))
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

    def _encode_latents_body_chain(
        self, variables, raft_variables, chain,
        raft_hw, comp_hw_flow, comp_hw_res,
    ):
        """Chain-aware variant of _encode_latents_body: (B+1, H, W, 3)
        consecutive frames in, per-pair latents out. RAFT's feature
        encoder and the raft-resolution resize run ONCE per frame instead
        of twice per interior frame (exact: both are per-sample at
        inference — see RAFT.flow_chain). ~25% of the chain encode's
        device time was duplicated fnet work (profile_stages:
        raft_encoders 25.4 ms/frame of encode_chain's 66.6)."""
        frames = chain.astype(jnp.float32) / 255.0
        H, W = frames.shape[1:3]
        small = resize_bilinear(frames, raft_hw)
        if hasattr(type(self._raft_model), "flow_chain"):
            flow_small = self._raft_model.apply(
                raft_variables, small, train=False, method="flow_chain"
            )
        else:  # non-chain-aware flow model: pairwise form
            flow_small = self._raft_model.apply(
                raft_variables, small[:-1], small[1:], train=False
            )
        prev, cur = frames[:-1], frames[1:]
        flow_orig = resize_flow(flow_small, (H, W))
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

    def _quantize_symbols(self, m_lat, r_lat):
        """Quantize latents to int16 symbols on device: halves the
        device->host transfer (the dominant encode cost over a slow link)
        and moves the rounding onto the VPU."""
        m_med = jnp.asarray(self.motion_tables.medians)
        r_med = jnp.asarray(self.residual_tables.medians)
        m_sym = jnp.round(m_lat - m_med).astype(jnp.int16)
        r_sym = jnp.round(r_lat - r_med).astype(jnp.int16)
        return m_sym, r_sym

    def _encode_body(
        self, variables, raft_variables, prev_u8, cur_u8,
        raft_hw, comp_hw_flow, comp_hw_res,
    ):
        """Traced fused P-frame encode: RAFT flow + warp + MCN + residual +
        analysis transforms + symbol quantization, one dispatch."""
        m_lat, r_lat = self._encode_latents_body(
            variables, raft_variables, prev_u8, cur_u8,
            raft_hw, comp_hw_flow, comp_hw_res,
        )
        return self._quantize_symbols(m_lat, r_lat)

    def _encode_body_chain(
        self, variables, raft_variables, chain,
        raft_hw, comp_hw_flow, comp_hw_res,
    ):
        """Chain form of _encode_body (fnet deduped across the chain)."""
        m_lat, r_lat = self._encode_latents_body_chain(
            variables, raft_variables, chain,
            raft_hw, comp_hw_flow, comp_hw_res,
        )
        return self._quantize_symbols(m_lat, r_lat)

    def encode_pframe_fused(
        self,
        prev_u8: jax.Array,
        cur_u8,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
    ):
        """uint8 frames in, latents out, one device dispatch. Returns
        (motion_latents, residual_latents) as async device arrays."""
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        return self._fused_encode_fn(
            self.variables, self._raft_variables,
            prev_u8, jnp.asarray(cur_u8),
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
        )

    def encode_pframes_batched(
        self,
        prev_u8,
        cur_u8,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
    ):
        """Batched P-frame encode: (B, H, W, 3) uint8 prev/cur stacks in,
        (B, h, w, C) int16 symbol stacks out, ONE device dispatch.

        Valid because the reference encoder predicts from ground-truth
        frames, never its own reconstructions (codec_processing.py:1499) —
        P-frames are independent at encode time, so batching them fills the
        MXU and amortizes the (slow) device->host symbol download.
        """
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        prev_u8 = jnp.asarray(prev_u8)
        cur_u8 = jnp.asarray(cur_u8)
        # Multi-chip encode: P-frames are independent at encode time
        # (ground-truth prediction), so batch rows shard over the `gop`
        # mesh with zero cross-device communication — the encode-side
        # mirror of the sharded decode scan (SURVEY §2.11).
        sh = getattr(self, "_gop_sharding", None)
        if sh is not None and prev_u8.shape[0] % self._gop_mesh.size == 0:
            prev_u8, cur_u8 = (
                jax.device_put(x, sh) for x in (prev_u8, cur_u8)
            )
        return self._fused_encode_fn(
            self.variables, self._raft_variables,
            prev_u8, cur_u8,
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
        )

    @staticmethod
    def _i420_to_rgb_traced(planes):
        """(B, H*3/2, W) uint8 I420 -> (B, H, W, 3) float RGB in [0, 255].

        BT.601 full-range inverse of _rgb_to_i420_traced; chroma upsampled
        by 2x2 replication (cv2 COLOR_YUV2RGB_I420 behavior)."""
        B, H32, W = planes.shape
        H = H32 * 2 // 3
        y = planes[:, :H, :].astype(jnp.float32)
        u = planes[:, H : H + H // 4, :].reshape(B, H // 2, W // 2)
        v = planes[:, H + H // 4 :, :].reshape(B, H // 2, W // 2)
        u = jnp.repeat(
            jnp.repeat(u.astype(jnp.float32) - 128.0, 2, axis=1), 2, axis=2
        )
        v = jnp.repeat(
            jnp.repeat(v.astype(jnp.float32) - 128.0, 2, axis=1), 2, axis=2
        )
        r = y + 1.402 * v
        g = y - 0.344136 * u - 0.714136 * v
        b = y + 1.772 * u
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)

    @functools.cached_property
    def _fused_encode_chain_i420_fn(self):
        @functools.partial(
            jax.jit,
            static_argnames=("raft_hw", "comp_hw_flow", "comp_hw_res"),
        )
        def fn(
            variables, raft_variables, chain_i420,
            raft_hw, comp_hw_flow, comp_hw_res,
        ):
            # (B+1, H*3/2, W) raw I420 chain: half the upload bytes of RGB;
            # color conversion happens on device.
            rgb = self._i420_to_rgb_traced(chain_i420)
            return self._encode_body_chain(
                variables, raft_variables, rgb,
                raft_hw, comp_hw_flow, comp_hw_res,
            )

        return fn

    def encode_pframes_chain_i420(
        self,
        chain_i420,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
    ):
        """Chain-batched P-frame encode from raw I420 planes
        ((B+1, H*3/2, W) uint8): halves the upload again vs the RGB chain."""
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        return self._fused_encode_chain_i420_fn(
            self.variables, self._raft_variables, jnp.asarray(chain_i420),
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
        )

    @functools.cached_property
    def _fused_encode_chain_fn(self):
        @functools.partial(
            jax.jit,
            static_argnames=("raft_hw", "comp_hw_flow", "comp_hw_res"),
        )
        def fn(
            variables, raft_variables, chain_u8,
            raft_hw, comp_hw_flow, comp_hw_res,
        ):
            # (B+1, H, W, 3) frame chain -> (prev, cur) pairs by slicing on
            # device: consecutive P-frames share their boundary frame, so
            # the host uploads each frame ONCE instead of twice (and the
            # chain body runs fnet once per frame instead of twice).
            return self._encode_body_chain(
                variables, raft_variables, chain_u8,
                raft_hw, comp_hw_flow, comp_hw_res,
            )

        return fn

    def encode_pframes_chain(
        self,
        chain_u8,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
    ):
        """Chain-batched P-frame encode: (B+1, H, W, 3) uint8 consecutive
        frames in, (B, h, w, C) int16 symbol stacks out (pair i = frames
        i, i+1). Halves the host->device upload vs encode_pframes_batched."""
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        return self._fused_encode_chain_fn(
            self.variables, self._raft_variables, jnp.asarray(chain_u8),
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
        )

    # ------------------------------------------------------------------
    # Fully-fused coded encode: chain -> symbols -> channel-aligned rANS16
    # -> flattened word grids + ONE packed meta array, all in ONE dispatch.
    # The staged path costs ~5 dispatches + 4 meta/word downloads per
    # flush; every relay round trip blocks behind queued device work, so
    # collapsing them is worth more than any kernel micro-win (CLAUDE.md).
    # ------------------------------------------------------------------
    @functools.cached_property
    def _fused_encode_chain_coded_fn(self):
        @functools.partial(
            jax.jit,
            static_argnames=("raft_hw", "comp_hw_flow", "comp_hw_res",
                             "i420"),
        )
        def fn(
            variables, raft_variables, m_consts, r_consts, chain,
            raft_hw, comp_hw_flow, comp_hw_res, i420,
        ):
            # K/S/L depend only on the (fixed) channel counts, so the
            # traced shape is stable across entropy recalibrations; the
            # CDF rows travel as arguments, never as baked-in constants.
            from rdvc_tpu.entropy.device_rans import (
                pack_flush_sections_traced,
            )

            menc, renc = self._device_encoders
            rgb = self._i420_to_rgb_traced(chain) if i420 else chain
            m_sym, r_sym = self._encode_body_chain(
                variables, raft_variables, rgb,
                raft_hw, comp_hw_flow, comp_hw_res,
            )
            m_flat, m_meta, _ = menc.encode_traced(m_sym, m_consts)
            r_flat, r_meta, _ = renc.encode_traced(r_sym, r_consts)
            meta_all = jnp.concatenate([m_meta, r_meta], axis=1)
            # One downloadable buffer per flush: [meta | m words | r words]
            # with each kind's valid prefix packed back-to-back (the host
            # fetches it in ONE adaptively-sized round trip — trip count,
            # not bytes, dominates flush downloads through the relay).
            packed = pack_flush_sections_traced(
                meta_all,
                [m_flat, r_flat],
                [
                    m_meta[:, 2 * menc.num_streams],
                    r_meta[:, 2 * renc.num_streams],
                ],
            )
            return packed, m_sym, r_sym

        return fn

    def encode_pframes_chain_coded(
        self,
        chain,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
        i420: bool = False,
    ):
        """Chain-batched P-frame encode + device entropy coding in ONE
        device dispatch. `chain`: (B+1, H, W, 3) uint8 RGB frames, or raw
        I420 planes (B+1, H*3/2, W) when i420=True. Returns opaque handles
        for assemble_frames_coded()."""
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        menc, renc = self._device_encoders
        packed, m_sym, r_sym = self._fused_encode_chain_coded_fn(
            self.variables, self._raft_variables,
            menc.encode_consts, renc.encode_consts,
            jnp.asarray(chain),
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
            i420,
        )
        return packed, m_sym, r_sym

    def assemble_frames_coded(self, handles, n_real: Optional[int] = None):
        """Host side of the fused coded encode: ONE adaptively-sized
        download covering the packed meta AND both payload kinds' word
        prefixes (vs 3 round trips before packing, ~8 for the staged path;
        a second fetch only when the previous flush's size hint
        under-predicts). Escaped frames fall back to the host coder on
        downloaded symbols."""
        from rdvc_tpu.entropy.device_rans import (
            fetch_packed_flush,
            split_packed_sections,
        )

        packed, m_sym, r_sym = handles
        menc, renc = self._device_encoders
        wm = 2 * menc.num_streams + 2
        wr = 2 * renc.num_streams + 2

        def needed_of(meta):
            m_tot = meta[:, wm - 2].astype(np.int64)
            r_tot = meta[:, wm + wr - 2].astype(np.int64)
            return int((m_tot + r_tot).max()) if meta.size else 0

        if not hasattr(self, "_flush_hints"):
            self._flush_hints = {}
        hint_key = ("coded", int(packed.shape[1]))
        meta_np, words_np, needed = fetch_packed_flush(
            packed, wm + wr, needed_of, self._flush_hints.get(hint_key)
        )
        self._flush_hints[hint_key] = needed + (needed >> 2) + 64
        m_meta = meta_np[:, :wm]
        r_meta = meta_np[:, wm:]
        m_words, r_words = split_packed_sections(
            words_np, [m_meta[:, wm - 2], r_meta[:, wr - 2]]
        )
        m_shape = (m_sym.shape[1], m_sym.shape[2])
        r_shape = (r_sym.shape[1], r_sym.shape[2])
        hw_m = m_shape[0] * m_shape[1]
        hw_r = r_shape[0] * r_shape[1]
        from rdvc_tpu.entropy.device_rans import ca_layout

        _, _, len_m = ca_layout(m_sym.shape[3], hw_m, menc.target_streams)
        _, _, len_r = ca_layout(r_sym.shape[3], hw_r, renc.target_streams)
        m_list = menc.assemble_batch_np(
            m_words, m_meta, hw_m * m_sym.shape[3], len_m
        )
        r_list = renc.assemble_batch_np(
            r_words, r_meta, hw_r * r_sym.shape[3], len_r
        )
        n = len(m_list) if n_real is None else min(n_real, len(m_list))
        out = []
        for i in range(n):
            m_bs, r_bs = m_list[i], r_list[i]
            if m_bs is None:
                m_bs, _ = self.compress_motion_symbols(
                    np.asarray(m_sym[i : i + 1])
                )
            if r_bs is None:
                r_bs, _ = self.compress_residual_symbols(
                    np.asarray(r_sym[i : i + 1])
                )
            out.append((m_bs, m_shape, r_bs, r_shape))
        return out

    # ------------------------------------------------------------------
    # Fused HYPER encode: three device stages per flush instead of ~10
    # round trips per frame. Stage A (one jit): chain compute -> latents +
    # quantized hyper-latents. Stage B: the SHARED per-frame bins_fn
    # executables (B=1 — the decode side runs the identical executable on
    # the identical z_sym; a batched variant would be a different XLA
    # program with no bitwise-sigma guarantee, see _hyper_quant_fns).
    # Stage C (one jit): y quantization + all four entropy encodes
    # (z: channel-aligned 0x03, y: bin-indexed 0x05) + ONE packed meta.
    # ------------------------------------------------------------------
    @functools.cached_property
    def _fused_encode_chain_hyper_fn(self):
        @functools.partial(
            jax.jit,
            static_argnames=("raft_hw", "comp_hw_flow", "comp_hw_res",
                             "i420"),
        )
        def fn(
            variables, raft_variables, z_med_m, z_med_r, chain,
            raft_hw, comp_hw_flow, comp_hw_res, i420,
        ):
            rgb = self._i420_to_rgb_traced(chain) if i420 else chain
            m_lat, r_lat = self._encode_latents_body_chain(
                variables, raft_variables, rgb,
                raft_hw, comp_hw_flow, comp_hw_res,
            )
            z_m = self.model.apply(
                variables, m_lat, method=VideoCodec.hyper_analyze_motion
            )
            z_r = self.model.apply(
                variables, r_lat,
                method=VideoCodec.hyper_analyze_residual,
            )
            z_sym_m = jnp.round(
                z_m.astype(jnp.float32) - z_med_m
            ).astype(jnp.int32)
            z_sym_r = jnp.round(
                z_r.astype(jnp.float32) - z_med_r
            ).astype(jnp.int32)
            return m_lat, r_lat, z_sym_m, z_sym_r

        return fn

    @functools.cached_property
    def _fused_hyper_code_fn(self):
        @jax.jit
        def fn(
            m_lat, mu_m, bins_m, z_sym_m,
            r_lat, mu_r, bins_r, z_sym_r,
            zm_consts, zr_consts,
        ):
            zm_enc, _ = self._hyper_device_coders["motion"]
            zr_enc, _ = self._hyper_device_coders["residual"]
            g_enc, _ = self._hyper_device_coders["gaussian"]
            B = m_lat.shape[0]
            y_sym_m = (
                jnp.round(m_lat.astype(jnp.float32) - mu_m)
                .astype(jnp.int32)
                .reshape(B, -1)
            )
            y_sym_r = (
                jnp.round(r_lat.astype(jnp.float32) - mu_r)
                .astype(jnp.int32)
                .reshape(B, -1)
            )
            zm_flat, zm_meta, _ = zm_enc.encode_traced(z_sym_m, zm_consts)
            zr_flat, zr_meta, _ = zr_enc.encode_traced(z_sym_r, zr_consts)
            ym_flat, ym_meta, _ = g_enc.encode_traced(y_sym_m, bins_m)
            yr_flat, yr_meta, _ = g_enc.encode_traced(y_sym_r, bins_r)
            meta_all = jnp.concatenate(
                [zm_meta, ym_meta, zr_meta, yr_meta], axis=1
            )
            # One downloadable buffer per flush (meta + all four payload
            # kinds' valid word prefixes back-to-back): the host fetches it
            # in ONE adaptively-sized round trip instead of five.
            from rdvc_tpu.entropy.device_rans import (
                pack_flush_sections_traced,
            )

            metas = [zm_meta, ym_meta, zr_meta, yr_meta]
            packed = pack_flush_sections_traced(
                meta_all,
                [zm_flat, ym_flat, zr_flat, yr_flat],
                [m[:, m.shape[1] - 2] for m in metas],
            )
            return packed

        return fn

    def encode_pframes_chain_hyper(
        self,
        chain,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
        i420: bool = False,
        n_real: Optional[int] = None,
    ):
        """Chain-batched hyperprior P-frame encode (device transport).
        Returns opaque handles for assemble_frames_hyper(). `n_real`
        bounds the per-frame bins dispatches: padding rows (partial
        flushes are chain-padded to the compiled batch) reuse the last
        real frame's (mu, bins) — each skipped row saves two relay
        round trips, and assemble drops the padded payloads anyway."""
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        zm_t = self.motion_hyper_tables
        zr_t = self.residual_hyper_tables
        m_lat, r_lat, z_sym_m, z_sym_r = self._fused_encode_chain_hyper_fn(
            self.variables, self._raft_variables,
            jnp.asarray(zm_t.medians), jnp.asarray(zr_t.medians),
            jnp.asarray(chain),
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
            i420,
        )
        _, bins_fn_m, _, _ = self._hyper_quant_fns["motion"]
        _, bins_fn_r, _, _ = self._hyper_quant_fns["residual"]
        hw_m = (int(m_lat.shape[1]), int(m_lat.shape[2]))
        hw_r = (int(r_lat.shape[1]), int(r_lat.shape[2]))
        B = int(m_lat.shape[0])
        n_live = B if n_real is None else max(1, min(n_real, B))
        mus_m, binses_m, mus_r, binses_r = [], [], [], []
        for b in range(n_live):
            mu, bins = bins_fn_m(
                self._flax_variables, z_sym_m[b : b + 1],
                jnp.asarray(zm_t.medians), hw_m,
            )
            mus_m.append(mu)
            binses_m.append(bins)
            mu, bins = bins_fn_r(
                self._flax_variables, z_sym_r[b : b + 1],
                jnp.asarray(zr_t.medians), hw_r,
            )
            mus_r.append(mu)
            binses_r.append(bins)
        for _ in range(B - n_live):  # padding rows reuse the last real
            mus_m.append(mus_m[-1])
            binses_m.append(binses_m[-1])
            mus_r.append(mus_r[-1])
            binses_r.append(binses_r[-1])
        mu_m = jnp.concatenate(mus_m, axis=0)
        bins_m = jnp.concatenate(binses_m, axis=0)
        mu_r = jnp.concatenate(mus_r, axis=0)
        bins_r = jnp.concatenate(binses_r, axis=0)
        zm_enc, _ = self._hyper_device_coders["motion"]
        zr_enc, _ = self._hyper_device_coders["residual"]
        packed = self._fused_hyper_code_fn(
            m_lat, mu_m, bins_m, z_sym_m,
            r_lat, mu_r, bins_r, z_sym_r,
            zm_enc.encode_consts, zr_enc.encode_consts,
        )
        return (packed, m_lat, r_lat, z_sym_m, z_sym_r)

    def encode_pframes_chain_latents(
        self,
        chain,
        raft_hw: Tuple[int, int],
        comp_hw_flow: Tuple[int, int],
        comp_hw_res: Tuple[int, int],
        i420: bool = False,
    ):
        """Chain-batched encode front half only: (B, h, w, C) float latent
        stacks (the fused hyper path's failure fallback feeds these to the
        per-frame hyper coder)."""
        if not hasattr(self, "_raft_model"):
            raise RuntimeError("attach_raft() first")
        zm_t = self.motion_hyper_tables
        zr_t = self.residual_hyper_tables
        m_lat, r_lat, _, _ = self._fused_encode_chain_hyper_fn(
            self.variables, self._raft_variables,
            jnp.asarray(zm_t.medians), jnp.asarray(zr_t.medians),
            jnp.asarray(chain),
            tuple(raft_hw), tuple(comp_hw_flow), tuple(comp_hw_res),
            i420,
        )
        return m_lat, r_lat

    def assemble_frames_hyper(self, handles, n_real: Optional[int] = None):
        """Host side of the fused hyper encode: ONE adaptively-sized
        download covering the packed meta AND all four payload kinds' word
        prefixes (vs 5 round trips before packing), then per-frame 0x04
        payload packing. Escaped frames fall back to the host transport
        recomputed from the kept latents."""
        from rdvc_tpu.entropy.device_gaussian import bin_stream_layout
        from rdvc_tpu.entropy.device_rans import (
            ca_layout,
            fetch_packed_flush,
            split_packed_sections,
        )
        from rdvc_tpu.entropy.rans.coder import pack_hyper_payload

        packed, m_lat, r_lat, z_sym_m, z_sym_r = handles
        zm_enc, _ = self._hyper_device_coders["motion"]
        zr_enc, _ = self._hyper_device_coders["residual"]
        g_enc, _ = self._hyper_device_coders["gaussian"]
        n_ym = int(np.prod(m_lat.shape[1:]))
        n_yr = int(np.prod(r_lat.shape[1:]))
        s_ym, l_ym = bin_stream_layout(n_ym, g_enc.target_streams)
        s_yr, l_yr = bin_stream_layout(n_yr, g_enc.target_streams)
        widths = [
            2 * zm_enc.num_streams + 2,
            2 * s_ym + 2,
            2 * zr_enc.num_streams + 2,
            2 * s_yr + 2,
        ]
        edges = np.cumsum([0] + widths)
        meta_w = int(edges[-1])

        def needed_of(meta):
            tot = sum(
                meta[:, edges[i + 1] - 2].astype(np.int64) for i in range(4)
            )
            return int(tot.max()) if meta.size else 0

        if not hasattr(self, "_flush_hints"):
            self._flush_hints = {}
        hint_key = ("hyper", int(packed.shape[1]))
        meta_np, words_np, needed = fetch_packed_flush(
            packed, meta_w, needed_of, self._flush_hints.get(hint_key)
        )
        self._flush_hints[hint_key] = needed + (needed >> 2) + 64
        metas = [
            meta_np[:, edges[i] : edges[i + 1]] for i in range(4)
        ]
        zm_words, ym_words, zr_words, yr_words = split_packed_sections(
            words_np, [m[:, m.shape[1] - 2] for m in metas]
        )

        zm_shape = (z_sym_m.shape[1], z_sym_m.shape[2])
        zr_shape = (z_sym_r.shape[1], z_sym_r.shape[2])
        n_zm = int(np.prod(z_sym_m.shape[1:]))
        n_zr = int(np.prod(z_sym_r.shape[1:]))
        _, _, l_zm = ca_layout(
            z_sym_m.shape[3], zm_shape[0] * zm_shape[1],
            zm_enc.target_streams,
        )
        _, _, l_zr = ca_layout(
            z_sym_r.shape[3], zr_shape[0] * zr_shape[1],
            zr_enc.target_streams,
        )
        zm_list = zm_enc.assemble_batch_np(zm_words, metas[0], n_zm, l_zm)
        ym_list = g_enc.assemble_batch_np(ym_words, metas[1], n_ym, l_ym)
        zr_list = zr_enc.assemble_batch_np(zr_words, metas[2], n_zr, l_zr)
        yr_list = g_enc.assemble_batch_np(yr_words, metas[3], n_yr, l_yr)

        m_shape = (int(m_lat.shape[1]), int(m_lat.shape[2]))
        r_shape = (int(r_lat.shape[1]), int(r_lat.shape[2]))
        n = len(zm_list) if n_real is None else min(n_real, len(zm_list))
        out = []
        for i in range(n):
            if zm_list[i] is None or ym_list[i] is None:
                m_bs, _ = self._hyper_compress_host(
                    m_lat[i : i + 1], "motion"
                )
            else:
                m_bs = pack_hyper_payload(
                    zm_shape, zm_list[i], ym_list[i]
                )
            if zr_list[i] is None or yr_list[i] is None:
                r_bs, _ = self._hyper_compress_host(
                    r_lat[i : i + 1], "residual"
                )
            else:
                r_bs = pack_hyper_payload(
                    zr_shape, zr_list[i], yr_list[i]
                )
            out.append((m_bs, m_shape, r_bs, r_shape))
        return out

    # ------------------------------------------------------------------
    # Compact symbol download: per-channel uint8/uint16 split keyed on the
    # CDF-table support (static layout -> one compiled pack fn). Channels
    # whose table span fits a byte travel as uint8 — about half the bytes
    # over the (slow) device->host pipe. A device-side out-of-range count
    # guards exactness: any unrepresentable symbol falls back to raw int16.
    # ------------------------------------------------------------------
    @functools.cached_property
    def _pack_meta(self):
        def meta(tables: CdfTables):
            span = tables.cdf_length.astype(np.int64) - 2  # max in-table v
            idx8 = np.where(span <= 255)[0].astype(np.int32)
            idx16 = np.where(span > 255)[0].astype(np.int32)
            return idx8, idx16

        return meta(self.motion_tables), meta(self.residual_tables)

    @functools.cached_property
    def _pack_fn(self):
        (m8, m16), (r8, r16) = self._pack_meta
        m_off = jnp.asarray(self.motion_tables.offset, jnp.int32)
        r_off = jnp.asarray(self.residual_tables.offset, jnp.int32)

        @jax.jit
        def fn(m_sym, r_sym):
            def split(sym, off, i8, i16):
                v = sym.astype(jnp.int32) - off
                v8 = jnp.take(v, jnp.asarray(i8), axis=-1)
                v16 = jnp.take(v, jnp.asarray(i16), axis=-1)
                bad = jnp.sum((v8 < 0) | (v8 > 255)) + jnp.sum(
                    (v16 < 0) | (v16 > 65535)
                )
                return v8.astype(jnp.uint8), v16.astype(jnp.uint16), bad

            m_u8, m_u16, m_bad = split(m_sym, m_off, m8, m16)
            r_u8, r_u16, r_bad = split(r_sym, r_off, r8, r16)
            return m_u8, m_u16, r_u8, r_u16, m_bad + r_bad

        return fn

    def download_symbols(self, m_sym, r_sym) -> Tuple[np.ndarray, np.ndarray]:
        """Device int16 symbol stacks -> host int32 symbol arrays, via the
        compact uint8/uint16 split (exact; falls back to raw int16 when a
        symbol exceeds its channel's packed range)."""
        (m8, m16), (r8, r16) = self._pack_meta
        m_u8, m_u16, r_u8, r_u16, bad = self._pack_fn(m_sym, r_sym)
        if int(np.asarray(bad)) != 0:
            return (
                np.asarray(m_sym, np.int32),
                np.asarray(r_sym, np.int32),
            )

        def rebuild(u8, u16, i8, i16, tables, shape):
            v = np.empty(shape, np.int32)
            if i8.size:
                v[..., i8] = np.asarray(u8, np.int32)
            if i16.size:
                v[..., i16] = np.asarray(u16, np.int32)
            return v + tables.offset[None, None, None, :]

        m = rebuild(
            m_u8, m_u16, m8, m16, self.motion_tables, m_sym.shape
        )
        r = rebuild(
            r_u8, r_u16, r8, r16, self.residual_tables, r_sym.shape
        )
        return m, r

    def compress_motion_symbols(self, sym) -> Tuple[bytes, Tuple[int, int]]:
        """int16 symbols (1, h, w, C), already round(y - median)."""
        from rdvc_tpu.entropy.rans.coder import SINGLE_TAG, _channel_indexes

        s = np.asarray(sym, np.int32)
        _, h, w, c = s.shape
        idx = _channel_indexes((h, w), c)
        bs = bytes([SINGLE_TAG]) + self.rans.encode(
            s.ravel(), idx, self.motion_tables
        )
        return bs, (h, w)

    def compress_residual_symbols(self, sym) -> Tuple[bytes, Tuple[int, int]]:
        from rdvc_tpu.entropy.rans.coder import SINGLE_TAG, _channel_indexes

        s = np.asarray(sym, np.int32)
        _, h, w, c = s.shape
        idx = _channel_indexes((h, w), c)
        bs = bytes([SINGLE_TAG]) + self.rans.encode(
            s.ravel(), idx, self.residual_tables
        )
        return bs, (h, w)

    def decompress_motion_symbols(self, bs: bytes, shape_hw) -> np.ndarray:
        """-> int16 symbols (1, h, w, C); medians re-added on device.
        Hyperprior payloads (0x04) return dequantized float32 latents
        instead (the decode step body's median-add is dtype-gated)."""
        from rdvc_tpu.entropy.rans.coder import _channel_indexes, decode_payload

        if bs and bs[0] == 0x04:
            return self.hyper_decompress(bs, shape_hw, "motion")
        h, w = int(shape_hw[0]), int(shape_hw[1])
        c = self.motion_tables.medians.shape[0]
        idx = _channel_indexes((h, w), c)
        sym = decode_payload(bs, idx, self.motion_tables, self.rans)
        return sym.reshape(1, h, w, c).astype(np.int16)

    def decompress_residual_symbols(self, bs: bytes, shape_hw) -> np.ndarray:
        from rdvc_tpu.entropy.rans.coder import _channel_indexes, decode_payload

        if bs and bs[0] == 0x04:
            return self.hyper_decompress(bs, shape_hw, "residual")
        h, w = int(shape_hw[0]), int(shape_hw[1])
        c = self.residual_tables.medians.shape[0]
        idx = _channel_indexes((h, w), c)
        sym = decode_payload(bs, idx, self.residual_tables, self.rans)
        return sym.reshape(1, h, w, c).astype(np.int16)

    # ------------------------------------------------------------------
    # Hyperprior coding (ModelConfig.hyperprior; models/hyperprior.py).
    # z rides the factorized host coder; y is Gaussian-conditional coded
    # with per-element scale-bin indexes (entropy/gaussian.py). Encoder
    # and decoder recompute (mu, sigma) from the SAME quantized z on the
    # SAME device, so the indexes agree structurally. Host-coded serial
    # path only — the fused/device-rANS fast paths remain factorized.
    # ------------------------------------------------------------------
    @functools.cached_property
    def _hyper_fns(self):
        """Jitted hyper transforms. The hyper nets are norm-free and not
        part of the fast_infer rewrite tree, so they always run the flax
        graph (exactness pinned by tests/test_hyperprior.py)."""
        model = self.model

        @jax.jit
        def am(variables, y):
            return model.apply(
                variables, y, method=VideoCodec.hyper_analyze_motion
            )

        @jax.jit
        def ar(variables, y):
            return model.apply(
                variables, y, method=VideoCodec.hyper_analyze_residual
            )

        @functools.partial(jax.jit, static_argnames=("hw",))
        def sm(variables, z_hat, hw):
            return model.apply(
                variables, z_hat, hw,
                method=VideoCodec.hyper_synthesize_motion,
            )

        @functools.partial(jax.jit, static_argnames=("hw",))
        def sr(variables, z_hat, hw):
            return model.apply(
                variables, z_hat, hw,
                method=VideoCodec.hyper_synthesize_residual,
            )

        return {"motion": (am, sm), "residual": (ar, sr)}

    @property
    def _flax_variables(self):
        return {
            "params": self.variables["params"],
            "batch_stats": self.variables.get("batch_stats", {}),
        }

    def _hyper_mu_sigma(self, z_hat_np, shape_hw, which):
        """Quantized z (1, zh, zw, Cz) float32 -> (mu, sigma) numpy arrays
        of shape (h, w, C). Shared by compress and decompress so both
        sides derive identical Gaussian parameters."""
        _, synth = self._hyper_fns[which]
        mu, sigma = synth(
            self._flax_variables,
            jnp.asarray(z_hat_np),
            (int(shape_hw[0]), int(shape_hw[1])),
        )
        return np.asarray(mu[0], np.float32), np.asarray(sigma[0], np.float32)

    @functools.cached_property
    def _hyper_device_coders(self):
        """Device entropy coders for the hyper path: channel-aligned (0x03)
        for z, bin-indexed Gaussian (0x05, entropy/device_gaussian.py) for
        y. Built lazily; any failure routes the frame to the host coder."""
        from rdvc_tpu.entropy.device_gaussian import (
            DeviceGaussianDecoder,
            DeviceGaussianEncoder,
        )
        from rdvc_tpu.entropy.device_rans import (
            DeviceRansDecoder,
            DeviceRansEncoder,
        )

        return {
            "motion": (
                DeviceRansEncoder(self.motion_hyper_tables),
                DeviceRansDecoder(self.motion_hyper_tables),
            ),
            "residual": (
                DeviceRansEncoder(self.residual_hyper_tables),
                DeviceRansDecoder(self.residual_hyper_tables),
            ),
            "gaussian": (
                DeviceGaussianEncoder(self.gaussian_tables),
                DeviceGaussianDecoder(self.gaussian_tables),
            ),
        }

    @functools.cached_property
    def _hyper_quant_fns(self):
        """Jitted device-side quantization graphs for the hyper path.

        CORRECTNESS INVARIANT: encoder and decoder must derive bit-
        identical scale bins or the y stream is garbage. Both sides
        therefore run the SAME compiled executable (`bins_fn`) on the same
        quantized z — same device + same executable + same input is
        deterministic, whereas re-deriving sigma inside two differently-
        fused jit graphs is not guaranteed bitwise-stable across fusion
        contexts. z_sym (exact integers) is the only value that crosses
        between the encode-side and decode-side graphs.
        """
        from rdvc_tpu.entropy.gaussian import scale_indexes

        model = self.model
        fns = {}
        for which, analyze_m, synth_m in (
            (
                "motion",
                VideoCodec.hyper_analyze_motion,
                VideoCodec.hyper_synthesize_motion,
            ),
            (
                "residual",
                VideoCodec.hyper_analyze_residual,
                VideoCodec.hyper_synthesize_residual,
            ),
        ):

            @jax.jit
            def z_sym_fn(variables, y, z_med, _a=analyze_m):
                z = model.apply(variables, y, method=_a)
                return jnp.round(z.astype(jnp.float32) - z_med).astype(
                    jnp.int32
                )

            @functools.partial(jax.jit, static_argnames=("hw",))
            def bins_fn(variables, z_sym, z_med, hw, _s=synth_m):
                z_hat = z_sym.astype(jnp.float32) + z_med
                mu, sigma = model.apply(variables, z_hat, hw, method=_s)
                bins = scale_indexes(sigma)
                B = z_sym.shape[0]
                return mu, bins.reshape(B, -1).astype(jnp.int32)

            @jax.jit
            def y_sym_fn(y, mu):
                B = y.shape[0]
                return (
                    jnp.round(y.astype(jnp.float32) - mu)
                    .astype(jnp.int32)
                    .reshape(B, -1)
                )

            @jax.jit
            def y_hat_fn(y_sym, mu):
                B, h, w, c = mu.shape
                return (
                    y_sym.reshape(B, h, w, c).astype(jnp.float32) + mu
                )

            fns[which] = (z_sym_fn, bins_fn, y_sym_fn, y_hat_fn)
        return fns

    def _hyper_z_tables(self, which: str):
        return (
            self.motion_hyper_tables
            if which == "motion"
            else self.residual_hyper_tables
        )

    def hyper_compress(self, latents, which: str):
        """Float latents (1, h, w, C) -> (0x04 payload bytes, (h, w)).

        Device-first: z rides the channel-aligned coder (0x03), y the
        bin-indexed Gaussian coder (0x05); only compressed words cross the
        link. Escapes (rare sigma/symbol outliers) or device-coder failure
        fall back to the host coder (0x01 blobs) for the frame.
        """
        y = jnp.asarray(latents)
        if os.environ.get("RDVC_DEVICE_HYPER", "1") != "0":
            try:
                out = self._hyper_compress_device(y, which)
                if out is not None:
                    return out
            except Exception:
                # Loud like the factorized device-coding fallback
                # (encode.py device_code_batch): silently losing the
                # device transport means paying host-coder round trips
                # on every frame.
                log.exception(
                    "device hyper encode failed; host transport fallback"
                )
        return self._hyper_compress_host(y, which)

    def _hyper_prep(self, y, which: str):
        """Shared quantization front half: (z_sym, y_sym flat, bins flat,
        mu) — all device arrays, all derived through the shared jitted
        graphs (see _hyper_quant_fns invariant)."""
        z_tables = self._hyper_z_tables(which)
        z_sym_fn, bins_fn, y_sym_fn, _ = self._hyper_quant_fns[which]
        z_med = jnp.asarray(z_tables.medians)
        z_sym = z_sym_fn(self._flax_variables, y, z_med)
        h, w = int(y.shape[1]), int(y.shape[2])
        mu, bins = bins_fn(self._flax_variables, z_sym, z_med, (h, w))
        y_sym = y_sym_fn(y, mu)
        return z_sym, y_sym, bins, mu

    def _hyper_compress_device(self, y, which: str):
        from rdvc_tpu.entropy.rans.coder import pack_hyper_payload

        # The multistream device format carries 2 uint16 state words per
        # stream (~16 KB at the default 4096 streams) — pure overhead for
        # small tensors. Route small latents to the host coder; production
        # shapes (1080p latents: millions of symbols) clear this easily.
        n_y = int(np.prod(y.shape[1:]))
        min_n = int(
            os.environ.get("RDVC_HYPER_DEVICE_MIN_N", str(1 << 18))
        )
        if n_y < min_n:
            return None
        z_sym, y_sym, bins, _ = self._hyper_prep(y, which)
        z_enc, _ = self._hyper_device_coders[which]
        g_enc, _ = self._hyper_device_coders["gaussian"]
        z_payloads = z_enc.assemble_batch(
            *z_enc.encode_device_batch(z_sym)
        )
        y_payloads = g_enc.assemble_batch(
            *g_enc.encode_device_batch(y_sym, bins)
        )
        if z_payloads[0] is None or y_payloads[0] is None:
            return None  # escape -> host fallback
        zh, zw = int(z_sym.shape[1]), int(z_sym.shape[2])
        h, w = int(y.shape[1]), int(y.shape[2])
        return (
            pack_hyper_payload((zh, zw), z_payloads[0], y_payloads[0]),
            (h, w),
        )

    def _hyper_compress_host(self, y, which: str):
        """Host rANS transport (0x01 blobs); quantization and bins still
        come from the shared device graphs so host- and device-coded
        frames are interchangeable."""
        from rdvc_tpu.entropy.rans.coder import (
            SINGLE_TAG,
            _channel_indexes,
            pack_hyper_payload,
        )

        z_tables = self._hyper_z_tables(which)
        z_sym, y_sym, bins, _ = self._hyper_prep(y, which)
        zh, zw, cz = (
            int(z_sym.shape[1]), int(z_sym.shape[2]), int(z_sym.shape[3])
        )
        z_bytes = bytes([SINGLE_TAG]) + self.rans.encode(
            np.asarray(z_sym[0]).ravel(),
            _channel_indexes((zh, zw), cz),
            z_tables,
        )
        y_bytes = bytes([SINGLE_TAG]) + self.rans.encode(
            np.asarray(y_sym[0], np.int32),
            np.asarray(bins[0], np.int32),
            self.gaussian_tables,
        )
        h, w = int(y.shape[1]), int(y.shape[2])
        return pack_hyper_payload((zh, zw), z_bytes, y_bytes), (h, w)

    def hyper_decompress(self, payload: bytes, shape_hw, which: str):
        """0x04 payload -> dequantized float32 latents (1, h, w, C): the
        decode step body skips its median-add for float inputs, so these
        slot straight into the fused serial decode. Device-coded blobs
        (0x03 z / 0x05 y) decode on device — symbols never cross the
        link; host blobs (0x01) decode on the host thread."""
        from rdvc_tpu.entropy.device_gaussian import BIN_TAG
        from rdvc_tpu.entropy.device_rans import CA_TAG
        from rdvc_tpu.entropy.rans.coder import (
            SINGLE_TAG,
            _channel_indexes,
            unpack_hyper_payload,
        )

        z_tables = self._hyper_z_tables(which)
        c = (
            self.cfg.motion_latent_channels
            if which == "motion"
            else self.cfg.residual_latent_channels
        )
        (zh, zw), z_bytes, y_bytes = unpack_hyper_payload(payload)
        cz = self.cfg.hyper_channels
        h, w = int(shape_hw[0]), int(shape_hw[1])

        # --- z -> z_sym (device when 0x03) ---
        if z_bytes[0] == CA_TAG:
            _, z_dec = self._hyper_device_coders[which]
            z_sym_dev = z_dec.decode_device([z_bytes]).reshape(
                1, zh, zw, cz
            )
        elif z_bytes[0] == SINGLE_TAG:
            z_sym_dev = jnp.asarray(
                self.rans.decode(
                    z_bytes[1:], _channel_indexes((zh, zw), cz), z_tables
                ).reshape(1, zh, zw, cz)
            )
        else:
            raise ValueError(f"unknown hyper z transport {z_bytes[0]}")

        # --- (mu, bins) from z via the SAME compiled graph the encoder
        # used (bit-identical bins; see _hyper_quant_fns invariant) ---
        _, bins_fn, _, y_hat_fn = self._hyper_quant_fns[which]
        z_med = jnp.asarray(z_tables.medians)
        mu, bins = bins_fn(self._flax_variables, z_sym_dev, z_med, (h, w))

        # --- y -> latents (dequantization stays on device both ways) ---
        if y_bytes[0] == BIN_TAG:
            _, g_dec = self._hyper_device_coders["gaussian"]
            y_sym = g_dec.decode_device([y_bytes], bins)
            return y_hat_fn(y_sym, mu)
        if y_bytes[0] == SINGLE_TAG:
            y_sym = self.rans.decode(
                y_bytes[1:],
                np.asarray(bins[0], np.int32),
                self.gaussian_tables,
            )
            return y_hat_fn(jnp.asarray(y_sym[None]), mu)
        raise ValueError(f"unknown hyper y transport {y_bytes[0]}")

    # ------------------------------------------------------------------
    # Device-side entropy coding fast path: the TPU emits the compressed
    # words itself (entropy/device_rans.py), so the host downloads only
    # ~bpp/8 bytes per pixel instead of raw symbols. Escapes (out-of-table
    # symbols) fall back per frame to the host coder.
    # ------------------------------------------------------------------
    @functools.cached_property
    def _device_encoders(self):
        from rdvc_tpu.entropy.device_rans import DeviceRansEncoder

        return (
            DeviceRansEncoder(self.motion_tables),
            DeviceRansEncoder(self.residual_tables),
        )

    @functools.cached_property
    def _device_decoders(self):
        from rdvc_tpu.entropy.device_rans import DeviceRansDecoder

        return (
            DeviceRansDecoder(self.motion_tables),
            DeviceRansDecoder(self.residual_tables),
        )

    def decode_payloads_device(self, payloads, which: str, shape_hw):
        """Channel-aligned (tag 0x03) payloads -> (B, h, w, C) int16 symbols
        ON DEVICE: the host uploads only compressed words, never raw symbols
        (the upload pipe runs at tens of MB/s — raw symbols are ~100x the
        bytes). Hyperprior (0x04) payloads whose blobs are device-coded
        batch-decode to float32 latents instead (median-add is dtype-gated
        downstream). Raises ValueError on payloads needing the host coder;
        callers fall back to host decode + symbol upload for those."""
        from rdvc_tpu.entropy.device_rans import CA_TAG

        if (
            self.cfg.hyperprior
            and payloads
            and all(p and p[0] == 0x04 for p in payloads)
        ):
            return self.decode_hyper_payloads_device(
                payloads, which, shape_hw
            )
        if any(not p or p[0] != CA_TAG for p in payloads):
            raise ValueError("non-chunked payload; host decode required")
        if which == "motion":
            dec, tables = self._device_decoders[0], self.motion_tables
        else:
            dec, tables = self._device_decoders[1], self.residual_tables
        c = tables.medians.shape[0]
        h, w = int(shape_hw[0]), int(shape_hw[1])
        sym = dec.decode_device(list(payloads))  # (B, h*w*c) int32
        return sym.reshape(len(payloads), h, w, c).astype(jnp.int16)

    def decode_hyper_payloads_device(self, payloads, which: str, shape_hw):
        """Batch-decode hyperprior (0x04) payloads whose inner blobs are
        device-coded (z: 0x03, y: 0x05) -> (B, h, w, C) float32 latents ON
        DEVICE. One batched z kernel, per-frame shared bins graphs, one
        batched y kernel. Raises ValueError if any frame used the host
        transport (mixed groups fall back to per-frame host decode)."""
        from rdvc_tpu.entropy.device_gaussian import BIN_TAG
        from rdvc_tpu.entropy.device_rans import CA_TAG
        from rdvc_tpu.entropy.rans.coder import unpack_hyper_payload

        parts = [unpack_hyper_payload(p) for p in payloads]
        if any(
            z[0] != CA_TAG or y[0] != BIN_TAG for _, z, y in parts
        ):
            raise ValueError(
                "host-transport hyper blob; per-frame decode required"
            )
        zh, zw = parts[0][0]
        if any(p[0] != (zh, zw) for p in parts):
            raise ValueError("inconsistent hyper z shapes in group")
        cz = self.cfg.hyper_channels
        h, w = int(shape_hw[0]), int(shape_hw[1])
        z_tables = self._hyper_z_tables(which)
        _, z_dec = self._hyper_device_coders[which]
        _, g_dec = self._hyper_device_coders["gaussian"]
        z_sym = z_dec.decode_device([z for _, z, _ in parts]).reshape(
            len(parts), zh, zw, cz
        )
        _, bins_fn, _, y_hat_fn = self._hyper_quant_fns[which]
        z_med = jnp.asarray(z_tables.medians)
        mus, binses = [], []
        for b in range(len(parts)):
            mu, bins = bins_fn(
                self._flax_variables, z_sym[b : b + 1], z_med, (h, w)
            )
            mus.append(mu)
            binses.append(bins)
        mu = jnp.concatenate(mus, axis=0)
        bins = jnp.concatenate(binses, axis=0)
        y_sym = g_dec.decode_device([y for _, _, y in parts], bins)
        return y_hat_fn(y_sym, mu)

    def encode_frame_device_rans(self, m_sym_1, r_sym_1):
        """Dispatch device entropy coding for ONE frame's symbol tensors
        (1, h, w, C). Returns opaque async handles for assemble_frame()."""
        return self.encode_frames_device_rans(m_sym_1, r_sym_1)

    def encode_frames_device_rans(self, m_sym, r_sym):
        """Dispatch device entropy coding for a BATCH of frames' symbol
        tensors (B, h, w, C): four device dispatches total regardless of B.
        Returns opaque async handles for assemble_frames()."""
        menc, renc = self._device_encoders
        return (
            menc.encode_device_batch(m_sym),
            renc.encode_device_batch(r_sym),
            m_sym,
            r_sym,
        )

    def assemble_frame(self, handles) -> Tuple[bytes, Tuple[int, int], bytes, Tuple[int, int]]:
        """Host side of one device-coded frame (see assemble_frames)."""
        return self.assemble_frames(handles)[0]

    def assemble_frames(self, handles, n_real: Optional[int] = None):
        """Host side of the device-coded batch: download compact word grids
        (one bucketed transfer per payload kind) and build tagged payloads;
        per-frame host fallback when escapes exist. Returns
        [(m_bs, m_shape, r_bs, r_shape)] for the first n_real frames."""
        mh, rh, m_sym, r_sym = handles
        menc, renc = self._device_encoders
        m_shape = (m_sym.shape[1], m_sym.shape[2])
        r_shape = (r_sym.shape[1], r_sym.shape[2])
        m_list = menc.assemble_batch(*mh)
        r_list = renc.assemble_batch(*rh)
        n = len(m_list) if n_real is None else min(n_real, len(m_list))
        out = []
        for i in range(n):
            m_bs, r_bs = m_list[i], r_list[i]
            if m_bs is None:
                m_bs, _ = self.compress_motion_symbols(
                    np.asarray(m_sym[i : i + 1])
                )
            if r_bs is None:
                r_bs, _ = self.compress_residual_symbols(
                    np.asarray(r_sym[i : i + 1])
                )
            out.append((m_bs, m_shape, r_bs, r_shape))
        return out

    def _decode_step_body(
        self, variables, prev_raw, q_m, q_r, prev_post, iframe,
        lmr_threshold, iir_alpha, target_hw,
    ):
        """Traced body shared by the per-frame fused decode and the
        multi-frame scan decode: reconstruct + LMR + hist-match + IIR."""
        # int16 symbols (fast transfer) -> float latents on device
        if jnp.issubdtype(q_m.dtype, jnp.integer):
            q_m = q_m.astype(jnp.float32) + jnp.asarray(
                self.motion_tables.medians
            )
        if jnp.issubdtype(q_r.dtype, jnp.integer):
            q_r = q_r.astype(jnp.float32) + jnp.asarray(
                self.residual_tables.medians
            )
        out = self._apply(
            variables, prev_raw, q_m, q_r, target_hw,
            method=VideoCodec.reconstruct_p_frame,
        )
        raw = out["reconstructed"]
        flow = out["flow"]
        # Stage 2: LMR (threshold <= 0 disables via the mask)
        mag = jnp.sqrt(
            jnp.square(flow[..., 0]) + jnp.square(flow[..., 1])
        )
        mask = jnp.logical_and(mag < lmr_threshold, lmr_threshold > 0)
        post = jnp.where(mask[..., None], iframe, raw)
        # Stage 3: histogram match vs previous post-processed frame
        post = histogram_match_ycrcb(post, prev_post)
        # Stage 4: IIR (alpha = 0 is identity)
        post = jnp.clip(
            iir_alpha * prev_post + (1.0 - iir_alpha) * post, 0.0, 1.0
        )
        return raw, post

    @functools.cached_property
    def _fused_decode_fn(self):
        @functools.partial(jax.jit, static_argnames=("target_hw",))
        def fn(
            variables, prev_raw, q_m, q_r, prev_post, iframe,
            lmr_threshold, iir_alpha, target_hw,
        ):
            raw, post = self._decode_step_body(
                variables, prev_raw, q_m, q_r, prev_post, iframe,
                lmr_threshold, iir_alpha, target_hw,
            )
            u8 = jnp.clip(post * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
            return raw, post, u8

        return fn

    def _scan_steps(
        self, variables, prev_raw, prev_post, iframe, q_m_T, q_r_T,
        lmr_threshold, iir_alpha, target_hw, emit_i420,
    ):
        """Traced lax.scan over T frame steps: carries the per-GOP-row
        recurrence state; emits the packed uint8 frames for every step.
        q_*_T: (T, B, h, w, C) int symbol stacks. Shared by the plain and
        the fused (entropy-decode-included) scan entry points."""

        def step(carry, qs):
            state_raw, pprev = carry
            q_m, q_r = qs
            raw, post = self._decode_step_body(
                variables, state_raw, q_m, q_r, pprev, iframe,
                lmr_threshold, iir_alpha, target_hw,
            )
            if emit_i420:
                u8 = self._rgb_to_i420_traced(post)
            else:
                u8 = jnp.clip(post * 255.0 + 0.5, 0, 255).astype(
                    jnp.uint8
                )
            return (raw, post), u8

        (raw_f, post_f), u8_T = jax.lax.scan(
            step, (prev_raw, prev_post), (q_m_T, q_r_T)
        )
        return raw_f, post_f, u8_T

    @functools.cached_property
    def _scan_decode_fn(self):
        @functools.partial(
            jax.jit, static_argnames=("target_hw", "emit_i420")
        )
        def fn(
            variables, prev_raw, prev_post, iframe, q_m_T, q_r_T,
            lmr_threshold, iir_alpha, target_hw, emit_i420,
        ):
            return self._scan_steps(
                variables, prev_raw, prev_post, iframe, q_m_T, q_r_T,
                lmr_threshold, iir_alpha, target_hw, emit_i420,
            )

        return fn

    @functools.cached_property
    def _scan_decode_coded_fn(self):
        @functools.partial(
            jax.jit,
            static_argnames=(
                "m_stat", "r_stat", "n_t", "target_hw", "emit_i420"
            ),
        )
        def fn(
            variables, prev_raw, prev_post, iframe,
            m_grid, r_grid, m_rows, m_offs, r_rows, r_offs,
            lmr_threshold, iir_alpha,
            m_stat, r_stat, n_t, target_hw, emit_i420,
        ):
            """Entropy decode + T-step scan in ONE dispatch: the compressed
            word grids ride the call as arguments (the symbols never exist
            off-device), replacing the staged path's two decode-kernel
            dispatches + stack reshuffle per chunk. m_stat/r_stat =
            (K, L, hw, h, w) static layout from the payload headers."""
            from rdvc_tpu.entropy.device_rans import _decode_ca_batch_kernel

            B = prev_raw.shape[0]

            def symbols(grid, rows, offs, stat, channels):
                K, L, hw, h, w = stat
                sym = _decode_ca_batch_kernel(grid, rows, offs, K, L, hw)
                return sym.reshape(n_t, B, h, w, channels)

            q_m_T = symbols(
                m_grid, m_rows, m_offs, m_stat,
                self.motion_tables.medians.shape[0],
            )
            q_r_T = symbols(
                r_grid, r_rows, r_offs, r_stat,
                self.residual_tables.medians.shape[0],
            )
            return self._scan_steps(
                variables, prev_raw, prev_post, iframe, q_m_T, q_r_T,
                lmr_threshold, iir_alpha, target_hw, emit_i420,
            )

        return fn

    def decode_pframes_scan_coded(
        self, prev_raw, prev_post, iframe, m_payloads, r_payloads,
        m_shape, r_shape, lmr_threshold, iir_alpha, target_hw, emit_i420,
        n_t: int,
    ):
        """Fused chunk decode: channel-aligned payload bytes in, post-
        processed frames out, one device dispatch (entropy decode + scan).
        Payload lists are (n_t * B) long, t-major. Raises ValueError on
        non-CA payloads (callers fall back to the staged scan path)."""
        from rdvc_tpu.entropy.device_rans import CA_TAG

        if getattr(self, "_gop_sharding", None) is not None:
            raise ValueError("gop mesh decode uses the staged scan path")
        if any(not p or p[0] != CA_TAG for p in m_payloads) or any(
            not p or p[0] != CA_TAG for p in r_payloads
        ):
            raise ValueError("non-chunked payload; host decode required")
        mdec, rdec = self._device_decoders
        m_grid, m_ns, m_L = mdec.prepare_grids(list(m_payloads))
        r_grid, r_ns, r_L = rdec.prepare_grids(list(r_payloads))
        # The word-grid row count is content-dependent (bucketed by max
        # payload size), but it is a traced-arg SHAPE of the fused scan —
        # every new bucket would recompile the whole T-step reconstruction
        # (~40 s at 1080p). Pad to a per-(S, L) high-water mark so the
        # compiled shape only grows (at most a couple of recompiles per
        # run, none once the warmup has seen the biggest chunk).
        if not hasattr(self, "_grid_hwm"):
            self._grid_hwm = {}

        def hwm_pad(grid, L):
            key = (grid.shape[2], L)
            rows = max(self._grid_hwm.get(key, 0), grid.shape[1])
            self._grid_hwm[key] = rows
            if rows > grid.shape[1]:
                pad = np.zeros(
                    (grid.shape[0], rows - grid.shape[1], grid.shape[2]),
                    grid.dtype,
                )
                grid = np.concatenate([grid, pad], axis=1)
            return grid

        m_grid = hwm_pad(m_grid, m_L)
        r_grid = hwm_pad(r_grid, r_L)
        m_rows, m_offs, m_K = mdec._ca_rows(m_grid.shape[2])
        r_rows, r_offs, r_K = rdec._ca_rows(r_grid.shape[2])
        m_stat = (m_K, m_L, m_ns // mdec._C, int(m_shape[0]), int(m_shape[1]))
        r_stat = (r_K, r_L, r_ns // rdec._C, int(r_shape[0]), int(r_shape[1]))
        return self._scan_decode_coded_fn(
            self.variables, jnp.asarray(prev_raw), prev_post, iframe,
            m_grid, r_grid, m_rows, m_offs, r_rows, r_offs,
            jnp.float32(lmr_threshold), jnp.float32(iir_alpha),
            m_stat, r_stat, int(n_t),
            tuple(int(v) for v in target_hw), bool(emit_i420),
        )

    def decode_pframes_scan(
        self, prev_raw, prev_post, iframe, q_m_T, q_r_T,
        lmr_threshold, iir_alpha, target_hw, emit_i420,
    ):
        """T decode steps (each batched over B GOP rows) in one dispatch.
        Returns (raw_final, post_final, u8_frames (T, B, ...)). With
        set_gop_mesh, the B axis is sharded across devices."""
        prev_raw = jnp.asarray(prev_raw)
        sh = getattr(self, "_gop_sharding", None)
        if sh is not None and prev_raw.shape[0] % self._gop_mesh.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = self._gop_mesh.axis_names[0]
            row_sh = NamedSharding(self._gop_mesh, P(None, axis))
            prev_raw, prev_post, iframe = (
                jax.device_put(jnp.asarray(x), sh)
                for x in (prev_raw, prev_post, iframe)
            )
            q_m_T = jax.device_put(jnp.asarray(q_m_T), row_sh)
            q_r_T = jax.device_put(jnp.asarray(q_r_T), row_sh)
        return self._scan_decode_fn(
            self.variables, prev_raw, prev_post, iframe,
            q_m_T, q_r_T,
            jnp.float32(lmr_threshold), jnp.float32(iir_alpha),
            tuple(int(v) for v in target_hw), bool(emit_i420),
        )

    @staticmethod
    def _rgb_to_i420_traced(post):
        """(B, H, W, 3) float RGB -> (B, H*3/2, W) uint8 I420 planes.

        BT.601 studio-free (full-range JPEG-style, matching the
        cv2.COLOR_BGR2YUV_I420 constants used by the IO layer) — packs
        the decoded frame on device so the host download is 1.5 B/px
        instead of 3.
        """
        x = post * 255.0
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        B, H, W = y.shape
        u_sub = u.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
        v_sub = v.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
        yq = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
        uq = jnp.clip(jnp.round(u_sub), 0, 255).astype(jnp.uint8).reshape(
            B, H // 4, W
        )
        vq = jnp.clip(jnp.round(v_sub), 0, 255).astype(jnp.uint8).reshape(
            B, H // 4, W
        )
        return jnp.concatenate([yq, uq, vq], axis=1)

    @functools.cached_property
    def _to_i420_fn(self):
        return jax.jit(self._rgb_to_i420_traced)

    def to_i420(self, post: jax.Array) -> jax.Array:
        return self._to_i420_fn(post)

    def set_gop_mesh(self, mesh) -> None:
        """Shard the GOP-batched decode across a device mesh.

        Each batch row of decode_pframe_fused is an independent GOP
        recurrence (SURVEY §2.11 GOP-parallelism), so rows distribute over
        the mesh's `gop` axis with zero cross-device communication;
        parameters replicate once. Pass None to disable."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            if getattr(self, "_gop_mesh", None) is not None:
                self.variables = jax.device_put(
                    self.variables, jax.devices()[0]
                )
                if hasattr(self, "_raft_variables"):
                    # Leaving these on the released mesh would make the
                    # next fused encode mix devices and fail per-frame.
                    self._raft_variables = jax.device_put(
                        self._raft_variables, jax.devices()[0]
                    )
            self._gop_mesh = None
            self._gop_sharding = None
            return
        self._gop_mesh = mesh
        self._gop_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        self.variables = jax.device_put(
            self.variables, NamedSharding(mesh, P())
        )
        if hasattr(self, "_raft_variables"):
            self._raft_variables = jax.device_put(
                self._raft_variables, NamedSharding(mesh, P())
            )

    def decode_pframe_fused(
        self,
        prev_raw: jax.Array,
        q_m,
        q_r,
        prev_post: jax.Array,
        iframe: jax.Array,
        lmr_threshold: float,
        iir_alpha: float,
        target_hw: Tuple[int, int],
    ):
        """One dispatch: reconstruct + all post stages + uint8 output.
        Returns (raw_recon, postprocessed, uint8_frames) — all batched
        (B, H, W, ...); pass B>1 stacks to decode independent GOPs in
        parallel (each batch row carries its own recurrence state). With
        set_gop_mesh, rows are sharded across devices."""
        prev_raw = jnp.asarray(prev_raw)
        q_m, q_r = jnp.asarray(q_m), jnp.asarray(q_r)
        prev_post, iframe = jnp.asarray(prev_post), jnp.asarray(iframe)
        sh = getattr(self, "_gop_sharding", None)
        if sh is not None and prev_raw.shape[0] % self._gop_mesh.size == 0:
            prev_raw, q_m, q_r, prev_post, iframe = (
                jax.device_put(x, sh)
                for x in (prev_raw, q_m, q_r, prev_post, iframe)
            )
        return self._fused_decode_fn(
            self.variables, prev_raw, q_m, q_r,
            prev_post, iframe,
            jnp.float32(lmr_threshold), jnp.float32(iir_alpha),
            tuple(int(v) for v in target_hw),
        )

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
        if self.cfg.hyperprior:
            return self.hyper_compress(latents, "motion")
        lat = np.asarray(latents, np.float32)
        bs = encode_with_tables(lat, self.motion_tables, self.rans)
        return bs, (lat.shape[1], lat.shape[2])

    def compress_residual(self, latents) -> Tuple[bytes, Tuple[int, int]]:
        if self.cfg.hyperprior:
            return self.hyper_compress(latents, "residual")
        lat = np.asarray(latents, np.float32)
        bs = encode_with_tables(lat, self.residual_tables, self.rans)
        return bs, (lat.shape[1], lat.shape[2])

    def decompress_motion(self, bs: bytes, shape_hw) -> np.ndarray:
        if self.cfg.hyperprior:
            return self.hyper_decompress(bs, shape_hw, "motion")
        return decode_with_tables(bs, shape_hw, self.motion_tables, self.rans)

    def decompress_residual(self, bs: bytes, shape_hw) -> np.ndarray:
        if self.cfg.hyperprior:
            return self.hyper_decompress(bs, shape_hw, "residual")
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

    def calibrate_entropy_models(
        self, latent_samples: dict, steps: int = 150, lr: float = 1e-2
    ) -> None:
        """Fit ONLY the entropy-bottleneck densities/quantiles to observed
        latent statistics (the transforms stay fixed), then rebuild the CDF
        tables. This is the EB half of training — used to get representative
        bitstream sizes before a full training run exists, and as a
        post-training `update()` analog.

        latent_samples: {"motion": (N,h,w,C) array, "residual": ...}
        """
        if self.cfg.hyperprior:
            raise NotImplementedError(
                "EB clip calibration fits the factorized latent densities; "
                "the hyperprior model adapts its rate through the learned "
                "hyper-synthesis instead (fine-tune the checkpoint)."
            )
        import optax

        params = dict(self.variables["params"])
        for name, key in (
            ("motion", "motion_entropy_bottleneck"),
            ("residual", "residual_entropy_bottleneck"),
        ):
            if name not in latent_samples:
                continue
            y = jnp.asarray(latent_samples[name], jnp.float32)
            from rdvc_tpu.entropy.factorized import FactorizedEntropyBottleneck

            channels = (
                self.cfg.motion_latent_channels
                if name == "motion"
                else self.cfg.residual_latent_channels
            )
            # Standalone module with the same param subtree as the codec's
            # submodule (setup() fields aren't reachable outside apply).
            eb = FactorizedEntropyBottleneck(channels)
            eb_params = params[key]
            tx = optax.adam(lr)
            opt_state = tx.init(eb_params)

            @jax.jit
            def step(p, s, key_):
                def loss_fn(pp):
                    y_hat, lik = eb.apply(
                        {"params": pp}, y, train=True, noise_key=key_
                    )
                    bits = -jnp.sum(jnp.log2(lik))
                    aux = eb.apply({"params": pp}, method=type(eb).aux_loss)
                    return bits / y.size + 1e-3 * aux

                g = jax.grad(loss_fn)(p)
                updates, s2 = tx.update(g, s)
                return optax.apply_updates(p, updates), s2

            rng = jax.random.PRNGKey(0)
            for i in range(steps):
                rng, k = jax.random.split(rng)
                eb_params, opt_state = step(eb_params, opt_state, k)
            params[key] = jax.device_get(eb_params)
        new_vars = {
            "params": params,
            "batch_stats": self.variables["batch_stats"],
        }
        if "fast" in self.variables:
            # Calibration only touches the EB subtrees, which the fast
            # tree never reads — carry it over instead of re-running the
            # host-side weight rearrangement + re-upload.
            new_vars["fast"] = self.variables["fast"]
        self.variables = new_vars
        params_np = jax.tree_util.tree_map(np.asarray, params)
        self.motion_tables = build_cdf_tables(
            params_np["motion_entropy_bottleneck"]
        )
        self.residual_tables = build_cdf_tables(
            params_np["residual_entropy_bottleneck"]
        )
        # Drop every jitted closure that baked in the old tables at trace
        # time — the quantization medians ride _encode_body /
        # _decode_step_body as CONSTANTS (jnp.asarray of self.*_tables),
        # so any cached trace would silently quantize against stale
        # medians while the rebuilt CDF tables add the new ones back.
        for attr in (
            "_encode_pframe_fn",
            "_fused_encode_fn",
            "_fused_encode_chain_fn",
            "_fused_encode_chain_i420_fn",
            "_fused_encode_chain_coded_fn",
            "_fused_decode_fn",
            "_scan_decode_fn",
            "_scan_decode_coded_fn",
            "_pack_meta",
            "_pack_fn",
            "_device_encoders",
            "_device_decoders",
        ):
            self.__dict__.pop(attr, None)

    def quantized_latents(self, latents, which: str) -> np.ndarray:
        """Round latents to what a rANS round-trip would produce (symbols
        relative to the channel medians) without touching the coder.
        Factorized model only (hyperprior quantizes against per-element
        means from the hyper-synthesis; use hyper_compress/decompress)."""
        assert not self.cfg.hyperprior, "factorized-model utility"
        tables = self.motion_tables if which == "motion" else self.residual_tables
        lat = np.asarray(latents, np.float64)
        med = tables.medians[None, None, None, :]
        return (np.round(lat - med) + med).astype(np.float32)
