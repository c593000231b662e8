"""3-phase curriculum: phase selection, parameter freezing, loss weights.

Spec (/root/reference/new_train.py:815-893 + SURVEY.md §2.7):
  Phase 1 (epoch <= phase1_epochs): motion-AE + residual-AE + EBs on GT-flow
    warping; MCN frozen if freeze_mcn_phase1.
  Phase 2 (epoch < phase3_start_epoch): full model, reconstructed-flow
    warping + MCN.
  Phase 3 (else): variant-dependent —
    "full"   (new_train.py): whole model, MS-SSIM term, LR 1e-5
    "res_ae" (train_msssim.py:620-631): freeze motion path + MCN, train
             residual AE only
    "psnr"   (train_psnr.py:587-592): full + MSE(recon, frame2) term
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from rdvc_tpu.config import TrainConfig

MOTION_PATH_MODULES = (
    "motion_encoder",
    "motion_decoder",
    "motion_entropy_bottleneck",
    # Hyperprior variant (ModelConfig.hyperprior): the motion hyper
    # transforms + hyper bottleneck freeze with the rest of the motion path.
    "motion_hyper_encoder",
    "motion_hyper_decoder",
    "motion_hyper_eb",
)
MCN_MODULE = "motion_compensation_net"


def phase_for_epoch(cfg: TrainConfig, epoch: int) -> int:
    if epoch <= cfg.phase1_epochs:
        return 1
    if epoch < cfg.phase3_start_epoch:
        return 2
    return 3


def lr_for_phase(cfg: TrainConfig, phase: int) -> float:
    return {1: cfg.lr_phase1, 2: cfg.lr_phase2, 3: cfg.lr_phase3}[phase]


def phase_trainable_mask(cfg: TrainConfig, phase: int, params: Dict[str, Any]):
    """Pytree of bools: True = trainable in this phase."""

    def mask_for(top: str) -> bool:
        if phase == 1 and cfg.freeze_mcn_phase1 and top == MCN_MODULE:
            return False
        if phase == 3 and cfg.phase3_variant == "res_ae":
            if top in MOTION_PATH_MODULES or top == MCN_MODULE:
                return False
        return True

    return {
        top: jax.tree_util.tree_map(lambda _: mask_for(top), sub)
        for top, sub in params.items()
    }


def loss_weights(cfg: TrainConfig, phase: int) -> Dict[str, float]:
    if phase in (1, 2):
        return {
            "flow": cfg.lambda_flow,
            "residual": cfg.lambda_residual,
            "bpp_motion": cfg.lambda_bpp_motion,
            "bpp_residual": cfg.lambda_bpp_residual,
            "msssim": 0.0,
            "recon_mse": 0.0,
        }
    if cfg.phase3_variant == "res_ae":
        return {
            "flow": 0.0,
            "residual": cfg.lambda_residual_resae,
            "bpp_motion": 0.0,
            "bpp_residual": cfg.lambda_bpp_residual_resae,
            "msssim": cfg.lambda_msssim_phase3,
            "recon_mse": 0.0,
        }
    w = {
        "flow": cfg.lambda_flow_phase3,
        "residual": cfg.lambda_residual_phase3,
        "bpp_motion": cfg.lambda_bpp_motion,
        "bpp_residual": cfg.lambda_bpp_residual,
        "msssim": cfg.lambda_msssim_phase3,
        "recon_mse": 0.0,
    }
    if cfg.phase3_variant == "psnr":
        w["recon_mse"] = cfg.lambda_mse_reconstruction_phase3
    return w
