"""torchvision RAFT checkpoint -> flax params converter.

The reference loads torchvision's Sintel-pretrained raft_large
(/root/reference/codec_processing.py:48-82, 1244-1308). This maps a
torchvision `raft_large` state_dict (as numpy arrays; load the .pth with
torch on host) onto rdvc_tpu.models.raft.RAFT's parameter tree so
pretrained weights can be used without re-training.

Layout conversions: torch conv weights are (O, I, kH, kW) -> flax HWIO
(kH, kW, I, O); torch norm weight/bias -> flax scale/bias.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w, b=None):
    out = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _encoder_params(sd: Dict[str, np.ndarray], prefix: str, norm_key: str) -> dict:
    """Map a torchvision raft FeatureEncoder at `prefix` onto RaftEncoder.

    torchvision layout: convnormactivation stem, layer1/2/3 each with two
    ResidualBlock(convnormactivation x2 + optional downsample), conv output.
    Ours: Conv_0 stem + norm + 6 RaftResBlock_i + Conv_1 out.
    """
    p: dict = {}
    # Stem: convnormactivation.0 = conv, .1 = norm
    p["Conv_0"] = _conv(sd[f"{prefix}.convnormactivation.0.weight"],
                        sd.get(f"{prefix}.convnormactivation.0.bias"))
    p[norm_key] = _norm(sd, f"{prefix}.convnormactivation.1")

    block = 0
    norm_idx = 1
    for layer in (1, 2, 3):
        for unit in (0, 1):
            tp = f"{prefix}.layer{layer}.{unit}"
            bp: dict = {}
            bp["Conv_0"] = _conv(
                sd[f"{tp}.convnormrelu1.0.weight"],
                sd.get(f"{tp}.convnormrelu1.0.bias"),
            )
            bp[f"{norm_key.split('_')[0]}_0"] = _norm(sd, f"{tp}.convnormrelu1.1")
            bp["Conv_1"] = _conv(
                sd[f"{tp}.convnormrelu2.0.weight"],
                sd.get(f"{tp}.convnormrelu2.0.bias"),
            )
            bp[f"{norm_key.split('_')[0]}_1"] = _norm(sd, f"{tp}.convnormrelu2.1")
            if f"{tp}.downsample.0.weight" in sd:
                bp["Conv_2"] = _conv(
                    sd[f"{tp}.downsample.0.weight"],
                    sd.get(f"{tp}.downsample.0.bias"),
                )
                bp[f"{norm_key.split('_')[0]}_2"] = _norm(sd, f"{tp}.downsample.1")
            p[f"RaftResBlock_{block}"] = bp
            block += 1
    p["Conv_1"] = _conv(sd[f"{prefix}.conv.weight"], sd.get(f"{prefix}.conv.bias"))
    return p


def convert_torchvision_raft(state_dict: Dict[str, np.ndarray]) -> dict:
    """Best-effort mapping of torchvision raft_large weights.

    Returns a {"params": ...} tree for rdvc_tpu RAFT. Raises KeyError with
    the missing torch key when the checkpoint layout differs — the caller
    should fall back to random init.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    params["fnet"] = _encoder_params(sd, "feature_encoder", "InstanceNorm_0")
    params["cnet"] = _encoder_params(sd, "context_encoder", "BatchNorm_0")

    ub = "update_block"
    enc = {
        "Conv_0": _conv(sd[f"{ub}.motion_encoder.convcorr1.0.weight"],
                        sd.get(f"{ub}.motion_encoder.convcorr1.0.bias")),
        "Conv_1": _conv(sd[f"{ub}.motion_encoder.convcorr2.0.weight"],
                        sd.get(f"{ub}.motion_encoder.convcorr2.0.bias")),
        "Conv_2": _conv(sd[f"{ub}.motion_encoder.convflow1.0.weight"],
                        sd.get(f"{ub}.motion_encoder.convflow1.0.bias")),
        "Conv_3": _conv(sd[f"{ub}.motion_encoder.convflow2.0.weight"],
                        sd.get(f"{ub}.motion_encoder.convflow2.0.bias")),
        "Conv_4": _conv(sd[f"{ub}.motion_encoder.conv.0.weight"],
                        sd.get(f"{ub}.motion_encoder.conv.0.bias")),
    }
    gru = {
        "convz_1x5": _conv(sd[f"{ub}.recurrent_block.convgru1.convz.weight"],
                           sd[f"{ub}.recurrent_block.convgru1.convz.bias"]),
        "convr_1x5": _conv(sd[f"{ub}.recurrent_block.convgru1.convr.weight"],
                           sd[f"{ub}.recurrent_block.convgru1.convr.bias"]),
        "convq_1x5": _conv(sd[f"{ub}.recurrent_block.convgru1.convq.weight"],
                           sd[f"{ub}.recurrent_block.convgru1.convq.bias"]),
        "convz_5x1": _conv(sd[f"{ub}.recurrent_block.convgru2.convz.weight"],
                           sd[f"{ub}.recurrent_block.convgru2.convz.bias"]),
        "convr_5x1": _conv(sd[f"{ub}.recurrent_block.convgru2.convr.weight"],
                           sd[f"{ub}.recurrent_block.convgru2.convr.bias"]),
        "convq_5x1": _conv(sd[f"{ub}.recurrent_block.convgru2.convq.weight"],
                           sd[f"{ub}.recurrent_block.convgru2.convq.bias"]),
    }
    flow_head = {
        "Conv_0": _conv(sd[f"{ub}.flow_head.conv1.weight"],
                        sd[f"{ub}.flow_head.conv1.bias"]),
        "Conv_1": _conv(sd[f"{ub}.flow_head.conv2.weight"],
                        sd[f"{ub}.flow_head.conv2.bias"]),
    }
    mask_head = {
        "Conv_0": _conv(sd["mask_predictor.convrelu.0.weight"],
                        sd.get("mask_predictor.convrelu.0.bias")),
        "Conv_1": _conv(sd["mask_predictor.conv.weight"],
                        sd["mask_predictor.conv.bias"]),
    }
    params["update_block"] = {
        "encoder": enc,
        "gru": gru,
        "flow_head": flow_head,
        "mask_head": mask_head,
    }
    return {"params": params}
