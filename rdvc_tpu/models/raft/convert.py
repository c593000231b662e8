"""torchvision RAFT checkpoint -> flax variables converter.

The reference loads torchvision's Sintel-pretrained raft_large
(/root/reference/codec_processing.py:48-82, 1244-1308). This maps a
torchvision `raft_large` state_dict (as numpy arrays; load the .pth with
torch on host) onto rdvc_tpu.models.raft.RAFT's variables so pretrained
weights can be used without re-training.

torchvision layout facts this encodes (torchvision/models/optical_flow/raft.py):
- FeatureEncoder stem is ``convnormrelu`` (a Conv2dNormActivation: .0 conv,
  .1 norm); residual units are ``layer{1,2,3}.{0,1}`` with
  ``convnormrelu1/convnormrelu2`` and an optional ``downsample``
  Conv2dNormActivation; final plain ``conv``.
- feature_encoder norms are InstanceNorm2d with affine=False and no running
  stats => NO norm keys exist; we emit identity scale/bias for our affine
  InstanceNorm.
- context_encoder norms are BatchNorm2d => weight/bias map to flax
  scale/bias params and running_mean/running_var map to batch_stats.
- Convs under a Conv2dNormActivation with a norm layer have bias=False; we
  emit zero biases for our always-biased flax convs (exact equivalence:
  the norm's bias/normalization absorbs any constant).
- mask_predictor lives at the TOP level of the torch module tree, not under
  update_block.

Layout conversions: torch conv weights are (O, I, kH, kW) -> flax HWIO
(kH, kW, I, O); torch norm weight/bias -> flax scale/bias.

Note on input range: torchvision raft_large officially expects [-1, 1]
inputs; the reference feeds it [0, 1] tensors (preprocess_frame_raft,
codec_processing.py:751-761). Our RAFT normalizes [0,1] -> [-1,1]
internally, i.e. converted weights see their intended distribution.
"""

from __future__ import annotations

from typing import Dict, Set, Tuple

import numpy as np


class _StateDict:
    """Wraps a torch-style state_dict, tracking consumed keys so the
    converter can fail loudly on layout drift (leftover keys)."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used: Set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"torchvision raft_large key not found: {key!r} "
                "(checkpoint layout differs from the expected torchvision "
                ">=0.13 raft_large layout)"
            )
        self.used.add(key)
        return self.sd[key]

    def maybe(self, key: str):
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        return None

    def has(self, key: str) -> bool:
        return key in self.sd

    def leftovers(self) -> Set[str]:
        ignorable = {k for k in self.sd if k.endswith("num_batches_tracked")}
        return set(self.sd) - self.used - ignorable


def _conv(sd: _StateDict, prefix: str) -> dict:
    w = sd.take(f"{prefix}.weight")
    kernel = np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    b = sd.maybe(f"{prefix}.bias")
    if b is None:
        b = np.zeros((w.shape[0],), np.float32)
    return {"kernel": kernel.astype(np.float32), "bias": np.asarray(b, np.float32)}


def _norm(
    sd: _StateDict, prefix: str, kind: str, channels: int
) -> Tuple[dict, dict]:
    """-> (params {scale, bias}, batch_stats {mean, var} or {})."""
    if kind == "instance":
        # torchvision InstanceNorm2d(affine=False): no keys; identity affine.
        if sd.has(f"{prefix}.weight"):
            return (
                {
                    "scale": np.asarray(sd.take(f"{prefix}.weight"), np.float32),
                    "bias": np.asarray(sd.take(f"{prefix}.bias"), np.float32),
                },
                {},
            )
        return (
            {
                "scale": np.ones((channels,), np.float32),
                "bias": np.zeros((channels,), np.float32),
            },
            {},
        )
    # batch norm: affine + running stats
    return (
        {
            "scale": np.asarray(sd.take(f"{prefix}.weight"), np.float32),
            "bias": np.asarray(sd.take(f"{prefix}.bias"), np.float32),
        },
        {
            "mean": np.asarray(sd.take(f"{prefix}.running_mean"), np.float32),
            "var": np.asarray(sd.take(f"{prefix}.running_var"), np.float32),
        },
    )


def _encoder(sd: _StateDict, prefix: str, kind: str) -> Tuple[dict, dict]:
    """Map a torchvision raft FeatureEncoder at `prefix` onto RaftEncoder.

    Ours (flax auto-naming): Conv_0 stem + {Instance,Batch}Norm_0 +
    RaftResBlock_0..5 + Conv_1 out; blocks hold Conv_0/Norm_0, Conv_1/Norm_1
    and optional projection Conv_2/Norm_2.
    """
    norm_name = "InstanceNorm" if kind == "instance" else "BatchNorm"
    params: dict = {}
    stats: dict = {}

    params["Conv_0"] = _conv(sd, f"{prefix}.convnormrelu.0")
    ch = params["Conv_0"]["kernel"].shape[-1]
    p, s = _norm(sd, f"{prefix}.convnormrelu.1", kind, ch)
    params[f"{norm_name}_0"] = p
    if s:
        stats[f"{norm_name}_0"] = s

    block = 0
    for layer in (1, 2, 3):
        for unit in (0, 1):
            tp = f"{prefix}.layer{layer}.{unit}"
            bp: dict = {}
            bs: dict = {}
            for i, sub in enumerate(("convnormrelu1", "convnormrelu2")):
                bp[f"Conv_{i}"] = _conv(sd, f"{tp}.{sub}.0")
                c = bp[f"Conv_{i}"]["kernel"].shape[-1]
                p, s = _norm(sd, f"{tp}.{sub}.1", kind, c)
                bp[f"{norm_name}_{i}"] = p
                if s:
                    bs[f"{norm_name}_{i}"] = s
            if sd.has(f"{tp}.downsample.0.weight"):
                bp["Conv_2"] = _conv(sd, f"{tp}.downsample.0")
                c = bp["Conv_2"]["kernel"].shape[-1]
                p, s = _norm(sd, f"{tp}.downsample.1", kind, c)
                bp[f"{norm_name}_2"] = p
                if s:
                    bs[f"{norm_name}_2"] = s
            params[f"RaftResBlock_{block}"] = bp
            if bs:
                stats[f"RaftResBlock_{block}"] = bs
            block += 1
    params["Conv_1"] = _conv(sd, f"{prefix}.conv")
    return params, stats


def convert_torchvision_raft(state_dict: Dict[str, np.ndarray]) -> dict:
    """Map torchvision raft_large weights onto rdvc_tpu RAFT variables.

    Returns {"params": ..., "batch_stats": ...}. Raises KeyError naming the
    missing torch key when the checkpoint layout differs, and ValueError
    when unrecognized keys remain (layout drift) — callers should fall back
    to random init on failure.
    """
    sd = _StateDict(state_dict)
    params: dict = {}
    stats: dict = {}

    params["fnet"], _ = _encoder(sd, "feature_encoder", "instance")
    params["cnet"], cnet_stats = _encoder(sd, "context_encoder", "batch")
    if cnet_stats:
        stats["cnet"] = cnet_stats

    ub = "update_block"
    enc = {
        "Conv_0": _conv(sd, f"{ub}.motion_encoder.convcorr1.0"),
        "Conv_1": _conv(sd, f"{ub}.motion_encoder.convcorr2.0"),
        "Conv_2": _conv(sd, f"{ub}.motion_encoder.convflow1.0"),
        "Conv_3": _conv(sd, f"{ub}.motion_encoder.convflow2.0"),
        "Conv_4": _conv(sd, f"{ub}.motion_encoder.conv.0"),
    }
    gru = {
        "convz_1x5": _conv(sd, f"{ub}.recurrent_block.convgru1.convz"),
        "convr_1x5": _conv(sd, f"{ub}.recurrent_block.convgru1.convr"),
        "convq_1x5": _conv(sd, f"{ub}.recurrent_block.convgru1.convq"),
        "convz_5x1": _conv(sd, f"{ub}.recurrent_block.convgru2.convz"),
        "convr_5x1": _conv(sd, f"{ub}.recurrent_block.convgru2.convr"),
        "convq_5x1": _conv(sd, f"{ub}.recurrent_block.convgru2.convq"),
    }
    flow_head = {
        "Conv_0": _conv(sd, f"{ub}.flow_head.conv1"),
        "Conv_1": _conv(sd, f"{ub}.flow_head.conv2"),
    }
    mask_head = {
        "Conv_0": _conv(sd, "mask_predictor.convrelu.0"),
        "Conv_1": _conv(sd, "mask_predictor.conv"),
    }
    params["update_block"] = {
        "encoder": enc,
        "gru": gru,
        "flow_head": flow_head,
        "mask_head": mask_head,
    }

    left = sd.leftovers()
    if left:
        raise ValueError(
            f"unconsumed torchvision keys (layout drift?): {sorted(left)[:8]}"
            f"{'...' if len(left) > 8 else ''}"
        )
    return {"params": params, "batch_stats": stats}
