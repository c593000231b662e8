"""Configuration surface for the rdvc_tpu framework.

Mirrors the reference's attribute-style config objects
(`CodecConfig`, /root/reference/codec_processing.py:625-693 and
`TrainConfig`, /root/reference/new_train.py:563-607) so a user of the
reference finds the same knobs, implemented as dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters of the VideoCodec.

    Values match the reference defaults (codec_processing.py:664-672,
    new_train.py:572-580) and must match a loaded checkpoint.
    """

    motion_latent_channels: int = 128
    residual_latent_channels: int = 192
    mcn_base_channels: int = 32
    mcn_res_blocks: int = 3
    encoder_base_channels: int = 64
    encoder_res_blocks: int = 2
    encoder_downsample_layers: int = 3
    decoder_res_blocks: int = 2
    decoder_upsample_layers: int = 3
    # Reference uses BatchNorm2d + LeakyReLU(0.2) in all transforms
    # (codec_processing.py:125-126); GDN is available as an opt-in variant.
    norm: str = "batch"  # "batch" | "gdn" | "none"
    activation: str = "leaky_relu"
    # Mean-scale hyperprior entropy model (the architecture the reference's
    # README advertises but its code never instantiates — see
    # models/hyperprior.py). When True, each AE codes a hyper-latent z
    # (factorized) whose synthesis predicts per-element Gaussian (mu, sigma)
    # for the latent coder. Must match the loaded checkpoint.
    hyperprior: bool = False
    hyper_channels: int = 128

    @property
    def downsample_factor(self) -> int:
        return 2 ** self.encoder_downsample_layers


@dataclasses.dataclass
class CodecConfig:
    """Encode/decode pipeline configuration.

    Same surface as the reference CodecConfig
    (codec_processing.py:625-673); `gpu` is retained for CLI parity and
    maps to device selection.
    """

    # Common paths and settings
    codec_checkpoint_path: str = "./checkpoints/latest"
    gpu: Optional[int] = 0  # retained for reference CLI parity; None => CPU

    # Encoder specific
    input_file_path: str = "./input.yuv"
    output_rdvc_file: str = "./compressed_video.rdvc"
    iframe_interval: int = 5
    iframe_jpeg_quality: int = 70
    flow_compress_height: int = 1080
    residual_compress_height: int = 1080

    # YUV specific inputs (only if input_file_path is .yuv)
    input_yuv_width: Optional[int] = 1920
    input_yuv_height: Optional[int] = 1080
    input_yuv_pixel_format: str = "yuv420p"
    input_yuv_fps: Optional[float] = 30.0

    # RAFT specific (for encoder)
    raft_backend: str = "auto"  # 'auto' | 'jax' (reference: torchvision/local)
    raft_checkpoint_dir: str = "./raft_checkpoints"
    raft_checkpoint_path: Optional[str] = None
    raft_resize_height: int = 368
    raft_resize_width: int = 640
    # GRU refinement iterations. The reference runs torchvision's default 12
    # (codec_processing.py:1436-1444); set 12 for exact parity. Default 4:
    # measured RD-neutral on the eval content (benchmarks/
    # raft_iters_study.json — EPE flat from 2 iters, bpp/PSNR within 0.1%
    # of 12 at 4) while dropping ~2/3 of the encoder's GRU device time.
    raft_iters: int = 4
    raft_dropout: float = 0.0
    raft_mixed_precision: bool = True  # bf16 on TPU

    # Pipeline performance (TPU-native additions; encode batches P-frames —
    # valid because the encoder predicts from ground-truth frames)
    encode_batch_size: int = 8
    rans_threads: int = 4
    # Entropy-code on the TPU (chunked rANS16): the host downloads only the
    # compressed payload instead of raw latent symbols. Frames with
    # out-of-table symbols fall back to the host coder automatically.
    device_entropy_coding: bool = True
    # Decode GOPs (I-frame-delimited independent chains) in parallel batches;
    # requires temporal_filter_alpha == 0 (the IIR filter couples GOPs).
    decode_gop_batch: int = 4
    # Shard the GOP batch rows over the first N devices (a 1-D `gop` mesh;
    # SURVEY §2.11 GOP-parallelism). 1 = single device.
    decode_gop_devices: int = 1
    # Shard the encode P-frame batch rows over N devices (same `gop` mesh;
    # uses prev/cur stacks instead of the shared-boundary chain, so uploads
    # double — worth it only when multiple chips are actually available).
    encode_gop_devices: int = 1

    # Decoder specific
    input_rdvc_file: str = "./compressed_video.rdvc"
    output_video_path_decode: str = "./reconstructed_video.mp4"
    debug_frames_dir_decode: str = "./debug_frames_decoder"
    debug_frame_interval_decode: int = 10
    # Staged debug PNG dumps (reference dumps by default; here opt-in since
    # they force the serial decode path)
    debug_dump_enabled: bool = False
    low_motion_replacement_threshold: float = 0.0
    temporal_filter_alpha: float = 0.0

    # Model architecture (must match the loaded checkpoint)
    motion_latent_channels: int = 128
    residual_latent_channels: int = 192
    mcn_base_channels: int = 32
    encoder_base_channels: int = 64
    encoder_res_blocks: int = 2
    encoder_downsample_layers: int = 3
    decoder_res_blocks: int = 2
    decoder_upsample_layers: int = 3
    hyperprior: bool = False
    hyper_channels: int = 128

    def model_config(self) -> ModelConfig:
        return ModelConfig(
            motion_latent_channels=self.motion_latent_channels,
            residual_latent_channels=self.residual_latent_channels,
            mcn_base_channels=self.mcn_base_channels,
            encoder_base_channels=self.encoder_base_channels,
            encoder_res_blocks=self.encoder_res_blocks,
            encoder_downsample_layers=self.encoder_downsample_layers,
            decoder_res_blocks=self.decoder_res_blocks,
            decoder_upsample_layers=self.decoder_upsample_layers,
            hyperprior=self.hyperprior,
            hyper_channels=self.hyper_channels,
        )

    def update_from_args(self, args) -> None:
        """Apply CLI overrides (reference codec_processing.py:675-693)."""
        if getattr(args, "gpu", None) is not None:
            self.gpu = None if args.gpu == -1 else args.gpu
        if self.gpu is None:
            self.raft_mixed_precision = False
        if getattr(args, "raft_backend", None) is not None:
            self.raft_backend = args.raft_backend
        if getattr(args, "temporal_filter_alpha", None) is not None:
            self.temporal_filter_alpha = args.temporal_filter_alpha


@dataclasses.dataclass
class TrainConfig:
    """3-phase training configuration (reference new_train.py:563-607)."""

    # Data
    frame_base_dir: str = "./data/vimeo90k/sequences"
    flow_base_dir: str = "./data/vimeo90k/flows"
    batch_size: int = 4
    num_workers: int = 2
    crop_size: Optional[Tuple[int, int]] = (256, 256)

    # Schedule
    num_epochs: int = 150
    phase1_epochs: int = 30
    phase3_start_epoch: int = 100
    lr_phase1: float = 1e-4
    lr_phase2: float = 1e-4
    lr_phase3: float = 1e-5
    aux_lr: float = 1e-3
    freeze_mcn_phase1: bool = True
    # Phase-3 variants from the reference training scripts:
    #   "full"   — new_train.py (whole model, MS-SSIM loss added)
    #   "res_ae" — train_msssim.py (freeze motion path + MCN)
    #   "psnr"   — train_psnr.py (adds MSE-reconstruction term)
    phase3_variant: str = "full"

    # Loss weights (new_train.py:585-604)
    lambda_flow: float = 10.0
    lambda_residual: float = 10000.0
    lambda_bpp_motion: float = 1.0
    lambda_bpp_residual: float = 1.0
    lambda_msssim_phase3: float = 5.0
    lambda_flow_phase3: float = 10.0
    lambda_residual_phase3: float = 10000.0
    lambda_mse_reconstruction_phase3: float = 100.0  # train_psnr.py:587-592
    # train_msssim.py phase-3 weights (res_ae variant)
    lambda_residual_resae: float = 15000.0
    lambda_bpp_residual_resae: float = 5.0

    grad_clip_norm: float = 1.0
    weight_decay: float = 1e-4  # AdamW
    # Sequence-unrolled fine-tune (train/loop.py seq path): weight of the
    # last-unrolled-step reconstruction MSE — the drift-damping term.
    lambda_seq_recon: float = 1000.0

    # Precision / parallelism
    use_bf16: bool = True
    data_axis: str = "data"  # mesh axis for data parallelism

    # Checkpointing / logging
    checkpoint_dir: str = "./codec_checkpoints_3phase"
    log_dir: str = "./logs"
    vis_dir: str = "./codec_visualizations_3phase"
    real_bitstream_check_every: int = 200  # new_train.py:991-1005
    seed: int = 42
