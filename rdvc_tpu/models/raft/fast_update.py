"""Fused inference path for the RAFT update block.

The update block dominates encode device time (profile_stages_r04.json:
raft_update_block_1it ~37 ms/frame isolated at ~2-3% MFU for ~17 GFLOP/frame
— two orders of magnitude off the MXU roofline) while the big codec convs
run at 40-67% MFU. At the update block's small spatial extent (46x80 at the
368x640 flow working resolution) per-op overhead and poor tiling dominate,
so the lever is OP COUNT, not FLOPs: this module recomputes the block with
exact output-channel-wise conv fusions — fusing convs that share an input
along their OUTPUT channel axis leaves every output channel's dot product
(weights, taps, reduction axis) unchanged, so it is an arithmetic
rearrangement of the same checkpoint, never a retrain.

Fusions (21 convs/iteration -> 12):
  - SepConvGRU, per direction: convz + convr + the x-half of convq run as
    ONE (k,384->384) conv over cat(h, x) (the q third consumes only the x
    channels; its h rows are zero), then one small (k,128->128) conv for
    the r*h half of convq. 3 gate convs -> 2.
  - FlowHead/MaskHead first convs (both 3x3 128->256 on the same hidden
    state) run as one 3x3 128->512 conv, split after the relu.

Reference behavior being reproduced: RAFT paper §3.2-3.3 update operator,
torchvision raft_large layout (same contract as models/raft/update.py;
reference invocation codec_processing.py:1436-1444). Gated by
RDVC_RAFT_FUSED (default on) in RaftRunner; training and `init` always use
the flax modules, so parameter structure and checkpoints are unchanged.
tests/test_raft_fast.py pins this path to the flax graph.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _conv(x, w, b, pad, cd):
    y = jax.lax.conv_general_dilated(
        x.astype(cd), w.astype(cd), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(cd)
    return y


_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))
_P3 = ((3, 3), (3, 3))


def _motion_encoder(p, flow, corr, cd):
    """Mirrors update.MotionEncoder (compact Conv_0..Conv_4 order)."""
    relu = jax.nn.relu
    c = relu(_conv(corr, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], _P0, cd))
    c = relu(_conv(c, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], _P1, cd))
    f = relu(_conv(flow, p["Conv_2"]["kernel"], p["Conv_2"]["bias"], _P3, cd))
    f = relu(_conv(f, p["Conv_3"]["kernel"], p["Conv_3"]["bias"], _P1, cd))
    x = jnp.concatenate([c, f], axis=-1)
    x = relu(_conv(x, p["Conv_4"]["kernel"], p["Conv_4"]["bias"], _P1, cd))
    return jnp.concatenate([x, flow.astype(cd)], axis=-1)


def _gru_direction(g, h, x, kh, kw, cd):
    """One SepConvGRU direction with the z/r/q_x gate convs fused.

    q_pre = Wq_h*(r*h) + Wq_x*x + b_q; the Wq_x term depends only on x, so
    it rides the z/r conv over cat(h, x) with zero weights on the h rows.
    """
    d = h.shape[-1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    wz = g[f"convz_{kh}x{kw}"]["kernel"]
    wr = g[f"convr_{kh}x{kw}"]["kernel"]
    wq = g[f"convq_{kh}x{kw}"]["kernel"]
    wq_h, wq_x = wq[:, :, :d, :], wq[:, :, d:, :]
    w_fused = jnp.concatenate(
        [wz, wr,
         jnp.concatenate([jnp.zeros_like(wq[:, :, :d, :]), wq_x], axis=2)],
        axis=3,
    )
    b_fused = jnp.concatenate(
        [g[f"convz_{kh}x{kw}"]["bias"], g[f"convr_{kh}x{kw}"]["bias"],
         g[f"convq_{kh}x{kw}"]["bias"]]
    )
    hx = jnp.concatenate([h, x], axis=-1)
    y = _conv(hx, w_fused, b_fused, pad, cd)
    z = jax.nn.sigmoid(y[..., :d])
    r = jax.nn.sigmoid(y[..., d : 2 * d])
    qx = y[..., 2 * d :]
    q = jnp.tanh(_conv(r * h, wq_h, None, pad, cd) + qx)
    return (1.0 - z) * h + z * q


def fused_update_step(
    params, hidden, context, corr, flow, cd=jnp.bfloat16
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact fused recomputation of update.UpdateBlock.__call__.

    params: the ``update_block`` subtree of the RAFT variables' ``params``.
    Returns (hidden, delta_flow, mask) with the flax path's dtypes.
    """
    motion = _motion_encoder(
        params["encoder"], flow.astype(cd), corr.astype(cd), cd
    )
    x = jnp.concatenate([context.astype(cd), motion], axis=-1)
    h = hidden.astype(cd)
    for kh, kw in ((1, 5), (5, 1)):
        h = _gru_direction(params["gru"], h, x, kh, kw, cd)

    fh, mh = params["flow_head"], params["mask_head"]
    w0 = jnp.concatenate(
        [fh["Conv_0"]["kernel"], mh["Conv_0"]["kernel"]], axis=3
    )
    b0 = jnp.concatenate([fh["Conv_0"]["bias"], mh["Conv_0"]["bias"]])
    y = jax.nn.relu(_conv(h, w0, b0, _P1, cd))
    n = fh["Conv_0"]["kernel"].shape[-1]
    delta = _conv(
        y[..., :n], fh["Conv_1"]["kernel"], fh["Conv_1"]["bias"], _P1, cd
    ).astype(jnp.float32)
    mask = (
        _conv(y[..., n:], mh["Conv_1"]["kernel"], mh["Conv_1"]["bias"], _P0, cd)
        * 0.25
    ).astype(jnp.float32)
    return h, delta, mask
