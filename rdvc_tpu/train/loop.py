"""Training loop: 3-phase curriculum, optax, data-parallel mesh, checkpoints.

Spec: /root/reference/new_train.py main loop (729-1082) — per-phase
optimizer reconfiguration with parameter freezing, grad-clip 1.0, AdamW,
rate losses from the entropy bottlenecks, periodic real-bitstream
verification (new_train.py:991-1005), latest-only checkpointing with phase
tag. TPU-native: one jitted SPMD train step over a 1-D data mesh (params
replicated, batch sharded, gradient all-reduce by XLA), bf16 compute inside
the model, no GradScaler (bf16 needs none).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rdvc_tpu.config import ModelConfig, TrainConfig
from rdvc_tpu.models.codec import VideoCodec, init_codec_variables
from rdvc_tpu.ops.metrics import ms_ssim, psnr, ssim
from rdvc_tpu.train.data import batch_iterator, sequence_batch_iterator
from rdvc_tpu.train.phases import (
    loss_weights,
    lr_for_phase,
    phase_for_epoch,
    phase_trainable_mask,
)
from rdvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0
    step: int = 0
    optimizer_mode: str = ""


def _label_tree(params, trainable_mask):
    """Leaf labels for optax.multi_transform: frozen / aux (EB quantiles) /
    main."""

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        top = keys[0] if keys else ""
        sub = trainable_mask.get(top, True)
        trainable = bool(jax.tree_util.tree_leaves(sub)[0]) if not isinstance(sub, bool) else sub
        if not trainable:
            return "frozen"
        if "quantiles" in keys:
            return "aux"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


class Trainer:
    def __init__(
        self,
        cfg: Optional[TrainConfig] = None,
        model_cfg: Optional[ModelConfig] = None,
        mesh=None,
    ):
        self.cfg = cfg or TrainConfig()
        self.model_cfg = model_cfg or ModelConfig()
        self.model = VideoCodec(cfg=self.model_cfg)
        self.mesh = mesh
        self._step_cache: Dict[int, Any] = {}
        self._tx_cache: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None, spatial=(64, 64)) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        variables = init_codec_variables(self.model, rng, spatial=spatial)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        phase = phase_for_epoch(self.cfg, 1)
        tx, mode = self._optimizer(phase, params)
        opt_state = tx.init(params)
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            params, batch_stats, opt_state = jax.device_put(
                (params, batch_stats, opt_state), rep
            )
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            epoch=1,
            step=0,
            optimizer_mode=mode,
        )

    # ------------------------------------------------------------------
    def _optimizer(self, phase: int, params) -> Tuple[optax.GradientTransformation, str]:
        cfg = self.cfg
        lr = lr_for_phase(cfg, phase)
        mode = f"phase{phase}_lr{lr:g}_{cfg.phase3_variant if phase == 3 else 'std'}"
        if mode in self._tx_cache:
            return self._tx_cache[mode], mode
        mask = phase_trainable_mask(cfg, phase, params)
        labels = _label_tree(params, mask)
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.multi_transform(
                {
                    "main": optax.adamw(lr, weight_decay=cfg.weight_decay),
                    "aux": optax.adam(cfg.aux_lr),
                    "frozen": optax.set_to_zero(),
                },
                labels,
            ),
        )
        self._tx_cache[mode] = tx
        return tx, mode

    def maybe_reconfigure(self, state: TrainState, epoch: int) -> TrainState:
        """Recreate optimizer when phase/LR changes (reference
        new_train.py:856-893 recreates AdamW on any phase change)."""
        phase = phase_for_epoch(self.cfg, epoch)
        tx, mode = self._optimizer(phase, state.params)
        if mode != state.optimizer_mode:
            log.info("optimizer reconfigured: %s -> %s", state.optimizer_mode, mode)
            opt_state = tx.init(state.params)
            if self.mesh is not None:
                opt_state = jax.device_put(
                    opt_state, NamedSharding(self.mesh, P())
                )
            state = dataclasses.replace(
                state, opt_state=opt_state, optimizer_mode=mode
            )
        return dataclasses.replace(state, epoch=epoch)

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch, phase: int, noise_rng):
        f1, f2, flow = batch
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            f1, f2, flow, phase, train=True,
            rngs={"noise": noise_rng},
            mutable=["batch_stats"],
        )
        B, H, W, _ = f1.shape
        num_px = B * H * W
        w = loss_weights(self.cfg, phase)
        bpp_m = jnp.sum(out["rate_motion"]) / num_px
        bpp_r = jnp.sum(out["rate_residual"]) / num_px
        # Hyperprior variant: the coded hyper-latent z is part of each
        # stream's rate (keys exist only when ModelConfig.hyperprior).
        if "rate_motion_hyper" in out:
            bpp_m = bpp_m + jnp.sum(out["rate_motion_hyper"]) / num_px
        if "rate_residual_hyper" in out:
            bpp_r = bpp_r + jnp.sum(out["rate_residual_hyper"]) / num_px
        mse_flow = jnp.mean(
            jnp.square(out["flow_reconstructed"] - out["flow_input"])
        )
        mse_res = jnp.mean(
            jnp.square(out["residual_reconstructed"] - out["residual_computed"])
        )
        recon = out["frame2_reconstructed_final"]
        loss = (
            w["flow"] * mse_flow
            + w["residual"] * mse_res
            + w["bpp_motion"] * bpp_m
            + w["bpp_residual"] * bpp_r
        )
        msssim_val = jnp.float32(0.0)
        if w["msssim"] > 0:
            # MS-SSIM needs min(H, W) > 160 for 5 scales; fall back to
            # gaussian SSIM on smaller training crops.
            if min(H, W) > 160:
                msssim_val = jnp.mean(ms_ssim(recon, f2))
            else:
                log.warning(
                    "crop %dx%d <= 160px: phase-3 MS-SSIM term falls back "
                    "to single-scale SSIM (different loss than the "
                    "reference's 256-crop MS-SSIM)", H, W,
                )
                msssim_val = jnp.mean(
                    ssim(recon, f2, win_size=11, gaussian=True)
                )
            loss = loss + w["msssim"] * (1.0 - msssim_val)
        if w["recon_mse"] > 0:
            loss = loss + w["recon_mse"] * jnp.mean(jnp.square(recon - f2))
        # Quantile-fitting aux loss (gradients reach only the quantiles;
        # replaces CompressAI's separate aux optimizer pass)
        aux = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            method=VideoCodec.aux_loss,
        )
        loss = loss + 1e-2 * aux
        metrics = {
            "loss": loss,
            "bpp_motion": bpp_m,
            "bpp_residual": bpp_r,
            "mse_flow": mse_flow,
            "mse_residual": mse_res,
            "msssim": msssim_val,
            "psnr": jnp.mean(psnr(recon, f2)),
            "aux": aux,
        }
        return loss, (updates["batch_stats"], metrics)

    def _loss_fn_seq(self, params, batch_stats, batch, phase: int, noise_rng):
        """Sequence-unrolled loss (VideoCodec.forward_sequence): per-step
        rate/distortion averaged over the T-1 unrolled P-frames, with the
        warp reference chained through the reconstructions. Closes the
        train/decode mismatch behind long-GOP drift (round-3 sustained run
        collapsed from 41 dB to 6.6 dB across a 32-frame GOP)."""
        frames, flows = batch
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            frames, flows, phase, train=True,
            rngs={"noise": noise_rng},
            mutable=["batch_stats"],
            method=VideoCodec.forward_sequence,
        )
        B, T, H, W, _ = frames.shape
        num_px = B * (T - 1) * H * W
        w = loss_weights(self.cfg, phase)
        bpp_m = out["rate_motion_sum"] / num_px
        bpp_r = out["rate_residual_sum"] / num_px
        if "rate_motion_hyper_sum" in out:
            bpp_m = bpp_m + out["rate_motion_hyper_sum"] / num_px
            bpp_r = bpp_r + out["rate_residual_hyper_sum"] / num_px
        recon = out["recons"].reshape(B * (T - 1), H, W, 3)
        target = frames[:, 1:].reshape(B * (T - 1), H, W, 3)
        loss = (
            w["flow"] * out["mse_flow"]
            + w["residual"] * out["mse_residual"]
            + w["bpp_motion"] * bpp_m
            + w["bpp_residual"] * bpp_r
        )
        msssim_val = jnp.float32(0.0)
        if w["msssim"] > 0:
            if min(H, W) > 160:
                msssim_val = jnp.mean(ms_ssim(recon, target))
            else:
                msssim_val = jnp.mean(
                    ssim(recon, target, win_size=11, gaussian=True)
                )
            loss = loss + w["msssim"] * (1.0 - msssim_val)
        if w["recon_mse"] > 0:
            loss = loss + w["recon_mse"] * jnp.mean(
                jnp.square(recon - target)
            )
        # The unroll's own drift penalty: the LAST step's reconstruction
        # error is what GOP-tail quality is made of; weight it explicitly
        # even in phase 2 (where the pairwise loss has no recon term).
        last = out["recons"][:, -1]
        loss = loss + self.cfg.lambda_seq_recon * jnp.mean(
            jnp.square(last - frames[:, -1])
        )
        aux = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            method=VideoCodec.aux_loss,
        )
        loss = loss + 1e-2 * aux
        metrics = {
            "loss": loss,
            "bpp_motion": bpp_m,
            "bpp_residual": bpp_r,
            "mse_flow": out["mse_flow"],
            "mse_residual": out["mse_residual"],
            "msssim": msssim_val,
            "psnr": jnp.mean(psnr(recon, target)),
            "psnr_last": jnp.mean(psnr(last, frames[:, -1])),
            "aux": aux,
        }
        return loss, (updates["batch_stats"], metrics)

    @staticmethod
    def _is_sequence_batch(batch) -> bool:
        return len(batch) == 2 and np.ndim(batch[0]) == 5

    def train_step(
        self, state: TrainState, batch, phase: Optional[int] = None
    ) -> Tuple[TrainState, Dict[str, float]]:
        phase = phase if phase is not None else phase_for_epoch(self.cfg, state.epoch)
        tx, mode = self._optimizer(phase, state.params)
        if mode != state.optimizer_mode:
            # Phase/LR change mid-stream: recreate the optimizer state (the
            # reference recreates AdamW on every phase change,
            # new_train.py:856-893).
            opt_state = tx.init(state.params)
            if self.mesh is not None:
                opt_state = jax.device_put(
                    opt_state, NamedSharding(self.mesh, P())
                )
            state = dataclasses.replace(
                state, opt_state=opt_state, optimizer_mode=mode
            )
        seq = self._is_sequence_batch(batch)
        arrays = tuple(jnp.asarray(x, jnp.float32) for x in batch)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.cfg.data_axis))
            arrays = tuple(jax.device_put(x, sh) for x in arrays)
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.seed), state.step
        )
        jitted = self._jitted(phase, tx, seq=seq)
        params, batch_stats, opt_state, metrics = jitted(
            state.params, state.batch_stats, state.opt_state, *arrays, rng
        )
        new_state = dataclasses.replace(
            state,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {k: float(v) for k, v in metrics.items()}

    def _jitted(self, phase: int, tx, seq: bool = False):
        key = (phase, id(tx), seq)
        if key not in self._step_cache:
            loss_fn = self._loss_fn_seq if seq else self._loss_fn

            def step(params, batch_stats, opt_state, *rest):
                *batch, rng = rest
                (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, tuple(batch), phase, rng)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                return new_params, new_bs, new_opt, metrics

            self._step_cache[key] = jax.jit(step, donate_argnums=(0, 2))
        return self._step_cache[key]

    # ------------------------------------------------------------------
    def _bitstream_runtime(self, state: TrainState):
        """Cached CodecRuntime for the periodic bitstream check: a fresh
        runtime per check would re-fold/re-rearrange the full param tree
        and recompile every hyper jit graph each time (~minutes/check on
        TPU). Fold and fast-infer are disabled (rate measurement only);
        the jitted hyper graphs take variables as ARGUMENTS, so swapping
        params in place is safe — only the z CDF tables must rebuild."""
        import os as _os

        from rdvc_tpu.entropy.factorized import build_cdf_tables
        from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        rt = getattr(self, "_rbc_rt", None)
        if rt is None:
            saved = {
                k: _os.environ.get(k)
                for k in ("RDVC_FOLD_BN", "RDVC_FAST_INFER")
            }
            _os.environ["RDVC_FOLD_BN"] = "0"
            _os.environ["RDVC_FAST_INFER"] = "0"
            try:
                rt = CodecRuntime(
                    model_cfg=self.model_cfg, variables=variables
                )
            finally:
                for k, v in saved.items():
                    if v is None:
                        _os.environ.pop(k, None)
                    else:
                        _os.environ[k] = v
            self._rbc_rt = rt
            return rt
        rt.variables = variables
        params_np = {
            k: jax.tree_util.tree_map(np.asarray, state.params[k])
            for k in ("motion_hyper_eb", "residual_hyper_eb")
        }
        rt.motion_hyper_tables = build_cdf_tables(
            params_np["motion_hyper_eb"]
        )
        rt.residual_hyper_tables = build_cdf_tables(
            params_np["residual_hyper_eb"]
        )
        return rt

    def real_bitstream_check(self, state: TrainState, batch) -> Dict[str, float]:
        """Measure actual rANS bytes for one batch (the reference's
        every-200-batch cross-validation, new_train.py:991-1005). The
        hyperprior variant routes through the runtime's hyper coder so the
        measured bytes include the z stream."""
        f1, f2, flow = (jnp.asarray(x, jnp.float32) for x in batch)
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            f1, f2, flow, 2, train=False,
        )
        if self.model_cfg.hyperprior:
            rt = self._bitstream_runtime(state)
            sizes = {}
            import os as _os

            prev = _os.environ.get("RDVC_DEVICE_HYPER")
            _os.environ["RDVC_DEVICE_HYPER"] = "0"  # host transport: the
            # cached runtime's device-coder tables would go stale as
            # params move; the HOST path rebuilds z tables per refresh.
            try:
                for name in ("motion", "residual"):
                    lat = np.asarray(out[f"{name}_latents"])
                    total = 0
                    for b in range(lat.shape[0]):
                        bs, _ = rt.hyper_compress(lat[b : b + 1], name)
                        total += len(bs)
                    sizes[f"{name}_kb"] = total / 1024.0
            finally:
                if prev is None:
                    _os.environ.pop("RDVC_DEVICE_HYPER", None)
                else:
                    _os.environ["RDVC_DEVICE_HYPER"] = prev
            return sizes
        from rdvc_tpu.entropy.factorized import build_cdf_tables
        from rdvc_tpu.entropy.rans import RansCodec, encode_with_tables

        params_np = jax.tree_util.tree_map(np.asarray, state.params)
        codec = RansCodec()
        sizes = {}
        for name, key in (
            ("motion", "motion_entropy_bottleneck"),
            ("residual", "residual_entropy_bottleneck"),
        ):
            tables = build_cdf_tables(params_np[key])
            lat = np.asarray(out[f"{name}_latents"])
            total = 0
            for b in range(lat.shape[0]):
                total += len(encode_with_tables(lat[b : b + 1], tables, codec))
            sizes[f"{name}_kb"] = total / 1024.0
        return sizes

    # ------------------------------------------------------------------
    def save(self, state: TrainState, path: Optional[str] = None) -> str:
        """Latest-only checkpoint with optimizer state + phase tag
        (reference new_train.py:1051-1056 stores model/optimizer/scaler/
        optimizer_mode; bf16 has no scaler)."""
        path = path or os.path.join(
            self.cfg.checkpoint_dir, "latest_checkpoint_3phase.ckpt"
        )
        save_checkpoint(
            path,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
            metadata={
                "epoch": state.epoch,
                "step": state.step,
                "optimizer_mode": state.optimizer_mode,
                "config": dataclasses.asdict(self.cfg),
                "model_config": dataclasses.asdict(self.model_cfg),
            },
        )
        return path

    def restore(self, path: str, spatial=(64, 64)) -> TrainState:
        state = self.init_state(spatial=spatial)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        try:
            variables, meta = load_checkpoint(path, template)
            opt_state = variables.get("opt_state", state.opt_state)
        except Exception:
            # Older checkpoint without optimizer state (or a different
            # optimizer tree): load model variables only, like the
            # reference's strict=False path (new_train.py:397-411).
            variables, meta = load_checkpoint(
                path,
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            opt_state = state.opt_state
        epoch = int(meta.get("epoch", 1))
        st = dataclasses.replace(
            state,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            epoch=epoch,
            step=int(meta.get("step", 0)),
        )
        reconfigured = self.maybe_reconfigure(st, epoch)
        if (
            meta.get("optimizer_mode") == reconfigured.optimizer_mode
            and opt_state is not state.opt_state
        ):
            reconfigured = dataclasses.replace(
                reconfigured, opt_state=opt_state
            )
        return reconfigured

    # ------------------------------------------------------------------
    def fit(
        self,
        dataset,
        num_epochs: Optional[int] = None,
        state: Optional[TrainState] = None,
        log_every: int = 50,
    ) -> TrainState:
        cfg = self.cfg
        state = state or self.init_state(
            spatial=cfg.crop_size or (64, 64)
        )
        num_epochs = num_epochs or cfg.num_epochs
        # Sequence datasets (items = (frames (T,H,W,3), flows)) route
        # through the unrolled loss; pair datasets keep the pairwise path.
        probe = dataset[0]
        seq_data = len(probe) == 2 and np.ndim(probe[0]) == 4
        iterator = sequence_batch_iterator if seq_data else batch_iterator
        stop_file = os.environ.get("RDVC_STOP_FILE") or (
            os.path.join(cfg.checkpoint_dir, "STOP")
            if cfg.checkpoint_dir else ""
        )
        ran_epochs = 0
        for epoch in range(state.epoch, num_epochs + 1):
            if stop_file and os.path.exists(stop_file):
                # Graceful early stop at an epoch boundary (the relay wedges
                # on mid-dispatch kills — see CLAUDE.md): the latest epoch is
                # already checkpointed by save() below / the previous pass.
                # A stop file that predates the FIRST epoch means this
                # process was parked before it trained anything (e.g. a
                # hung relay client being retired): abort loudly so the
                # caller does not save untrained weights over real ones.
                if ran_epochs == 0:
                    raise RuntimeError(
                        f"stop file {stop_file} present before any epoch "
                        "ran; aborting fit (nothing trained)"
                    )
                log.info("stop file %s present; ending fit early at epoch "
                         "%d", stop_file, epoch)
                break
            state = self.maybe_reconfigure(state, epoch)
            phase = phase_for_epoch(cfg, epoch)
            t0 = time.time()
            agg: Dict[str, float] = {}
            n = 0
            for batch in iterator(
                dataset, cfg.batch_size, seed=cfg.seed + epoch
            ):
                try:
                    state, metrics = self.train_step(state, batch, phase)
                except Exception:
                    # Skip-and-continue on per-batch failures (reference's
                    # OOM/exception handling, new_train.py:1013-1030).
                    log.exception(
                        "batch failed at epoch %d step %d; skipping",
                        epoch, state.step,
                    )
                    continue
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + v
                n += 1
                if n % log_every == 0:
                    log.info(
                        "epoch %d phase %d batch %d: %s",
                        epoch, phase, n,
                        {k: round(v / n, 5) for k, v in agg.items()},
                    )
                if (
                    cfg.real_bitstream_check_every
                    and not seq_data
                    and n % cfg.real_bitstream_check_every == 0
                ):
                    log.info(
                        "real bitstream: %s",
                        self.real_bitstream_check(state, batch),
                    )
            ran_epochs += 1
            log.info(
                "epoch %d done in %.1fs: %s",
                epoch,
                time.time() - t0,
                {k: round(v / max(n, 1), 5) for k, v in agg.items()},
            )
            self.save(state)
            if self.cfg.vis_dir and n > 0 and not seq_data:
                try:
                    from rdvc_tpu.train.visualize import visualize_epoch

                    visualize_epoch(
                        self, state, batch, epoch, phase, self.cfg.vis_dir
                    )
                except Exception:
                    log.exception("epoch visualization failed")
        return state
