"""VideoCodec: the P-frame codec model (motion AE + MCN + residual AE).

Behavioral spec from the reference's two VideoCodec variants — training
(/root/reference/new_train.py:229-296) and inference
(/root/reference/codec_processing.py:411-619) — defined ONCE here (the
reference copy-pastes the model 4x; see SURVEY.md §1).

All tensors are NHWC float32 at the API boundary; internals run bf16 on the
MXU. The training `__call__` is phase-aware (1: warp with GT flow, no MCN;
2/3: warp with reconstructed flow + MCN). The inference path is split into
pure jittable pieces (analysis/synthesis/reconstruct) so that the
encode/decode pipelines can jit them once and drive the host-side rANS coder
around them.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdvc_tpu.config import ModelConfig
from rdvc_tpu.entropy.factorized import FactorizedEntropyBottleneck
from rdvc_tpu.models.mcn import MotionCompensationNetwork
from rdvc_tpu.models.transforms import AnalysisTransform, SynthesisTransform
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow
from rdvc_tpu.ops.warp import bilinear_warp


class VideoCodec(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        c = self.cfg
        # Motion path: flow (2ch) latents; base channels are halved for the
        # motion AE (reference codec_processing.py:429-440).
        self.motion_encoder = AnalysisTransform(
            latent_channels=c.motion_latent_channels,
            base_channels=c.encoder_base_channels // 2,
            num_downsample_layers=c.encoder_downsample_layers,
            num_res_blocks=c.encoder_res_blocks,
            norm=c.norm,
            act=c.activation,
        )
        if not c.hyperprior:
            self.motion_entropy_bottleneck = FactorizedEntropyBottleneck(
                c.motion_latent_channels
            )
        self.motion_decoder = SynthesisTransform(
            output_channels=2,
            base_channels=c.encoder_base_channels // 2,
            num_upsample_layers=c.decoder_upsample_layers,
            num_res_blocks=c.decoder_res_blocks,
            final_activation=None,
            norm=c.norm,
            act=c.activation,
        )
        # Residual path: image-like (3ch).
        self.residual_encoder = AnalysisTransform(
            latent_channels=c.residual_latent_channels,
            base_channels=c.encoder_base_channels,
            num_downsample_layers=c.encoder_downsample_layers,
            num_res_blocks=c.encoder_res_blocks,
            norm=c.norm,
            act=c.activation,
        )
        if not c.hyperprior:
            self.residual_entropy_bottleneck = FactorizedEntropyBottleneck(
                c.residual_latent_channels
            )
        self.residual_decoder = SynthesisTransform(
            output_channels=3,
            base_channels=c.encoder_base_channels,
            num_upsample_layers=c.decoder_upsample_layers,
            num_res_blocks=c.decoder_res_blocks,
            final_activation=None,
            norm=c.norm,
            act=c.activation,
        )
        self.motion_compensation_net = MotionCompensationNetwork(
            base_channels=c.mcn_base_channels,
            num_res_blocks=c.mcn_res_blocks,
            norm=c.norm,
            act=c.activation,
        )
        # Mean-scale hyperprior (opt-in; models/hyperprior.py): per-AE
        # hyper-latent z coded by a factorized bottleneck, whose synthesis
        # predicts per-element Gaussian (mu, sigma) for the latent coder.
        if c.hyperprior:
            from rdvc_tpu.models.hyperprior import (
                HyperAnalysis,
                HyperSynthesis,
            )

            self.motion_hyper_encoder = HyperAnalysis(
                hyper_channels=c.hyper_channels, act=c.activation
            )
            self.motion_hyper_decoder = HyperSynthesis(
                latent_channels=c.motion_latent_channels,
                hyper_channels=c.hyper_channels,
                act=c.activation,
            )
            self.motion_hyper_eb = FactorizedEntropyBottleneck(
                c.hyper_channels
            )
            self.residual_hyper_encoder = HyperAnalysis(
                hyper_channels=c.hyper_channels, act=c.activation
            )
            self.residual_hyper_decoder = HyperSynthesis(
                latent_channels=c.residual_latent_channels,
                hyper_channels=c.hyper_channels,
                act=c.activation,
            )
            self.residual_hyper_eb = FactorizedEntropyBottleneck(
                c.hyper_channels
            )

    # ------------------------------------------------------------------
    # Training forward (reference new_train.py:249-296)
    # ------------------------------------------------------------------
    def __call__(
        self,
        frame1: jax.Array,
        frame2: jax.Array,
        flow_input: jax.Array,
        current_phase: int = 2,
        *,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        hyper_rates = {}
        motion_latents = self.motion_encoder(flow_input, train=train)
        if self.cfg.hyperprior:
            q_motion, motion_lik, z_rate_m = self._code_hyper(
                motion_latents,
                self.motion_hyper_encoder,
                self.motion_hyper_decoder,
                self.motion_hyper_eb,
                train=train,
            )
            hyper_rates["rate_motion_hyper"] = z_rate_m
        else:
            q_motion, motion_lik = self.motion_entropy_bottleneck(
                motion_latents, train=train
            )
        rate_motion = -jnp.log2(motion_lik)
        flow_reconstructed = self.motion_decoder(q_motion, train=train)

        # Training always uses the flat warp: the tiled path's backward
        # scatters window slices (serialized on TPU); see ops/warp.py.
        if current_phase == 1:
            warped = bilinear_warp(frame1, flow_input, impl="flat")
            predictor = warped
            residual_computed = frame2 - warped
        else:
            warped = bilinear_warp(frame1, flow_reconstructed, impl="flat")
            predictor = self.motion_compensation_net(
                warped, flow_reconstructed, frame1, train=train
            )
            residual_computed = frame2 - predictor

        residual_latents = self.residual_encoder(residual_computed, train=train)
        if self.cfg.hyperprior:
            q_residual, residual_lik, z_rate_r = self._code_hyper(
                residual_latents,
                self.residual_hyper_encoder,
                self.residual_hyper_decoder,
                self.residual_hyper_eb,
                train=train,
            )
            hyper_rates["rate_residual_hyper"] = z_rate_r
        else:
            q_residual, residual_lik = self.residual_entropy_bottleneck(
                residual_latents, train=train
            )
        rate_residual = -jnp.log2(residual_lik)
        residual_reconstructed = self.residual_decoder(q_residual, train=train)

        recon = jnp.clip(predictor + residual_reconstructed, 0.0, 1.0)

        return {
            "flow_reconstructed": flow_reconstructed,
            "residual_reconstructed": residual_reconstructed,
            "rate_motion": rate_motion,
            "rate_residual": rate_residual,
            "flow_input": flow_input,
            "residual_computed": residual_computed,
            "motion_latents": motion_latents,
            "residual_latents": residual_latents,
            "frame2_motion_compensated": predictor,
            "frame2_reconstructed_final": recon,
            **hyper_rates,
        }

    def forward_sequence(
        self,
        frames: jax.Array,   # (B, T, H, W, 3) GT frames; frames[:, 0] is the
                             # I-frame stand-in (GT reference, like decode)
        flows: jax.Array,    # (B, T-1, H, W, 2) GT flow for pairs (t, t+1)
        current_phase: int = 2,
        *,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        """Sequence-unrolled training forward: each step warps the PREVIOUS
        RECONSTRUCTION (not the GT frame), exactly as the decoder does
        (reference codec_processing.py:1941 feeds the raw reconstruction
        back). The single-pair training forward (reference
        new_train.py:249-296) warps the GT previous frame, which leaves
        multi-step error accumulation untrained — this unroll closes the
        train/decode mismatch so long GOPs stop collapsing (round-3
        sustained run: 41 dB at the I-frame -> 6.6 dB at GOP position 31).

        The flow input stays the GT pair flow: at encode time RAFT runs on
        GT frames (codec_processing.py:1436, 1499), so the motion stream's
        input distribution is unchanged; only the warp reference drifts.

        Gradients flow through the whole chain (no stop_gradient), so early
        steps learn to produce reconstructions that later steps can predict
        from.
        """
        T = frames.shape[1]
        ref = frames[:, 0]
        recons = []
        rate_m = jnp.float32(0.0)
        rate_r = jnp.float32(0.0)
        rate_mh = jnp.float32(0.0)
        rate_rh = jnp.float32(0.0)
        mse_flow = jnp.float32(0.0)
        mse_res = jnp.float32(0.0)
        for t in range(T - 1):
            o = self(
                ref, frames[:, t + 1], flows[:, t], current_phase,
                train=train,
            )
            recons.append(o["frame2_reconstructed_final"])
            rate_m = rate_m + jnp.sum(o["rate_motion"])
            rate_r = rate_r + jnp.sum(o["rate_residual"])
            if "rate_motion_hyper" in o:
                rate_mh = rate_mh + jnp.sum(o["rate_motion_hyper"])
                rate_rh = rate_rh + jnp.sum(o["rate_residual_hyper"])
            mse_flow = mse_flow + jnp.mean(
                jnp.square(o["flow_reconstructed"] - o["flow_input"])
            )
            mse_res = mse_res + jnp.mean(
                jnp.square(
                    o["residual_reconstructed"] - o["residual_computed"]
                )
            )
            ref = o["frame2_reconstructed_final"]
        out = {
            "recons": jnp.stack(recons, axis=1),  # (B, T-1, H, W, 3)
            "rate_motion_sum": rate_m,
            "rate_residual_sum": rate_r,
            "mse_flow": mse_flow / (T - 1),
            "mse_residual": mse_res / (T - 1),
        }
        if self.cfg.hyperprior:
            out["rate_motion_hyper_sum"] = rate_mh
            out["rate_residual_hyper_sum"] = rate_rh
        return out

    def _code_hyper(self, y, h_a, h_s, eb, *, train: bool):
        """Mean-scale hyperprior coding of latents y: z = h_a(y) through
        the factorized bottleneck, (mu, sigma) = h_s(z_hat), y coded
        against N(mu, sigma). Returns (y_hat, y_likelihoods, z_rate)."""
        from rdvc_tpu.entropy.gaussian import gaussian_likelihood

        z = h_a(y, train=train)
        z_hat, z_lik = eb(z, train=train)
        mu, sigma = h_s(z_hat, (y.shape[1], y.shape[2]), train=train)
        yf = y.astype(jnp.float32)
        if train:
            y_hat = yf + jax.random.uniform(
                self.make_rng("noise"), yf.shape, jnp.float32, -0.5, 0.5
            )
        else:
            y_hat = jnp.round(yf - mu) + mu
        y_lik = gaussian_likelihood(y_hat, mu, sigma)
        return y_hat.astype(y.dtype), y_lik, -jnp.log2(z_lik)

    def aux_loss(self) -> jax.Array:
        if self.cfg.hyperprior:
            return (
                self.motion_hyper_eb.aux_loss()
                + self.residual_hyper_eb.aux_loss()
            )
        return (
            self.motion_entropy_bottleneck.aux_loss()
            + self.residual_entropy_bottleneck.aux_loss()
        )

    # ------------------------------------------------------------------
    # Inference pieces (jitted by the pipelines; rANS runs on host between
    # analysis and synthesis — reference compress_simplified /
    # decompress_frame_simplified, codec_processing.py:509-619)
    # ------------------------------------------------------------------
    def analyze_motion(self, flow: jax.Array) -> jax.Array:
        """Flow at compression resolution -> motion latents (float32)."""
        return self.motion_encoder(flow, train=False)

    def analyze_residual(self, residual: jax.Array) -> jax.Array:
        return self.residual_encoder(residual, train=False)

    def synthesize_flow(self, q_motion: jax.Array) -> jax.Array:
        return self.motion_decoder(q_motion, train=False)

    def synthesize_residual(self, q_residual: jax.Array) -> jax.Array:
        return self.residual_decoder(q_residual, train=False)

    # Hyperprior inference pieces (pipeline/codec_runtime.py hyper coding;
    # only defined when cfg.hyperprior)
    def hyper_analyze_motion(self, y: jax.Array) -> jax.Array:
        return self.motion_hyper_encoder(y, train=False)

    def hyper_analyze_residual(self, y: jax.Array) -> jax.Array:
        return self.residual_hyper_encoder(y, train=False)

    def hyper_synthesize_motion(
        self, z_hat: jax.Array, target_hw: Tuple[int, int]
    ) -> Tuple[jax.Array, jax.Array]:
        return self.motion_hyper_decoder(z_hat, target_hw, train=False)

    def hyper_synthesize_residual(
        self, z_hat: jax.Array, target_hw: Tuple[int, int]
    ) -> Tuple[jax.Array, jax.Array]:
        return self.residual_hyper_decoder(z_hat, target_hw, train=False)

    def apply_mcn(
        self, warped: jax.Array, flow: jax.Array, ref: jax.Array
    ) -> jax.Array:
        """Named inference entry for the MCN (so the runtime's apply shim
        can dispatch on method identity; see models/fast_infer.py)."""
        return self.motion_compensation_net(warped, flow, ref, train=False)

    def reconstruct_p_frame(
        self,
        previous_frame: jax.Array,  # (1, H, W, 3) original resolution
        q_motion: jax.Array,        # (1, h_m, w_m, C_m) quantized latents
        q_residual: jax.Array,      # (1, h_r, w_r, C_r) quantized latents
        target_hw: Tuple[int, int],
    ) -> Dict[str, jax.Array]:
        """Shared decode path: latents + previous reconstruction -> frame.

        Mirrors decompress_frame_simplified
        (codec_processing.py:538-619): decode flow at compression
        resolution, upsample with value rescaling, warp, MCN, decode
        residual, bilinear-upsample, add, clamp.
        """
        H, W = int(target_hw[0]), int(target_hw[1])
        flow_low = self.motion_decoder(q_motion, train=False)
        flow_up = resize_flow(flow_low, (H, W))
        warped = bilinear_warp(previous_frame, flow_up)
        mc = self.motion_compensation_net(warped, flow_up, previous_frame, train=False)
        res_low = self.residual_decoder(q_residual, train=False)
        res_up = resize_bilinear(res_low, (H, W))
        recon = jnp.clip(mc + res_up, 0.0, 1.0)
        return {
            "reconstructed": recon,
            "flow": flow_up,
            "warped": warped,
            "motion_compensated": mc,
            "residual": res_up,
        }


def create_codec(cfg: Optional[ModelConfig] = None) -> VideoCodec:
    return VideoCodec(cfg=cfg or ModelConfig())


def init_codec_variables(
    model: VideoCodec, rng: jax.Array, spatial: Tuple[int, int] = (64, 64)
) -> dict:
    """Initialize parameters + batch stats with tiny dummy inputs."""
    H, W = spatial
    f1 = jnp.zeros((1, H, W, 3), jnp.float32)
    f2 = jnp.zeros((1, H, W, 3), jnp.float32)
    flow = jnp.zeros((1, H, W, 2), jnp.float32)
    params_rng, noise_rng = jax.random.split(rng)
    return model.init(
        {"params": params_rng, "noise": noise_rng},
        f1, f2, flow, 2, train=True,
    )
