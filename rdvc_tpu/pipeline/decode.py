"""Video decoder pipeline: .rdvc -> frames.

Mirrors decode_video_main (/root/reference/codec_processing.py:1663-1980):
parse container, JPEG-decode I-frames, reconstruct P-frames against the RAW
previous reconstruction (post-processing never feeds back into the codec
reference — the encoder/decoder state-sync invariant,
codec_processing.py:1941), then apply the post-processing cascade:
low-motion-region replacement -> histogram matching (vs previous
POST-PROCESSED frame) -> first-order IIR temporal filter.

TPU-first: all three post stages run on device (the reference round-trips
hist-match through CPU skimage per frame).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.container import (
    RdvcReader,
    unpack_iframe_payload,
    unpack_pframe_payload,
)
from rdvc_tpu.io.jpeg import decode_jpeg
from rdvc_tpu.io.video import VideoSink
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime
from rdvc_tpu.postproc import temporal_iir_filter
from rdvc_tpu.utils.timers import StageTimer

log = logging.getLogger(__name__)


def decode_video(
    config: CodecConfig,
    runtime: Optional[CodecRuntime] = None,
    sink: Optional[VideoSink] = None,
    collect_frames: bool = False,
    timer: Optional[StageTimer] = None,
) -> Dict:
    """Decode config.input_rdvc_file -> config.output_video_path_decode."""
    timer = timer or StageTimer()
    from rdvc_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    reader = RdvcReader(config.input_rdvc_file)
    meta = reader.metadata
    if runtime is None:
        model_cfg = config.model_config()
        # Self-configure the entropy model from the container metadata in
        # BOTH directions (the checkpoint must match it either way; this
        # saves the caller from repeating --hyperprior at decode time and
        # corrects a stray flag — streams written before the hyperprior
        # existed carry no entropy_model key and are factorized).
        stream_hyper = meta.get("entropy_model") == "hyperprior"
        if stream_hyper != model_cfg.hyperprior:
            import dataclasses as _dc

            log.info(
                "decode: container metadata says entropy_model=%s; "
                "overriding the configured model variant",
                meta.get("entropy_model", "factorized"),
            )
            hc = (
                meta.get("encoder_config_summary", {}).get("hyper_channels")
                or model_cfg.hyper_channels
            )
            model_cfg = _dc.replace(
                model_cfg, hyperprior=stream_hyper, hyper_channels=int(hc)
            )
        runtime = CodecRuntime(
            model_cfg=model_cfg,
            checkpoint_path=(
                config.codec_checkpoint_path
                if os.path.exists(config.codec_checkpoint_path)
                else None
            ),
        )
    width, height = meta["original_dimensions_wh"]
    fps = float(meta.get("original_fps", 30.0))

    own_sink = sink is None
    if own_sink:
        sink = VideoSink(config.output_video_path_decode, width, height, fps)

    # Decoder state (reference codec_processing.py:1691-1693, 1940-1943)
    ref_raw = None        # raw reconstruction fed back into the codec
    prev_post = None      # previous post-processed frame (hist-match/IIR ref)
    latest_iframe = None  # latest decoded I-frame (LMR source)
    lmr_threshold = jnp.float32(config.low_motion_replacement_threshold)
    iir_alpha = jnp.float32(config.temporal_filter_alpha)

    frames_out = [] if collect_frames else None
    n_frames = 0
    pending_u8 = None  # async device uint8 frame awaiting host write

    # When the sink takes raw I420 and frames aren't collected, frames are
    # packed to YUV420 on device (half the download bytes).
    use_i420 = (
        sink is not None
        and getattr(sink, "accepts_i420", False)
        and not collect_frames
    )

    def _start_host_copy(x):
        """Kick off the device->host transfer early so the blocking
        np.asarray at emit time finds the bytes already landed."""
        try:
            x.copy_to_host_async()
        except AttributeError:
            pass
        return x

    def emit(u8_frame, kind: str = "rgb") -> None:
        nonlocal n_frames
        with timer.span("frame_write"):
            arr = np.asarray(u8_frame)
        if kind == "i420":
            sink.write_i420(arr)
        else:
            if sink is not None:
                sink.write_rgb(arr)
            if collect_frames:
                frames_out.append(arr)
        n_frames += 1

    # Debug dumps force the serial path (reference decoder writes staged
    # PNGs every debug_frame_interval_decode frames,
    # codec_processing.py:1775-1926).
    debug_dir = getattr(config, "debug_frames_dir_decode", None)
    debug_every = int(getattr(config, "debug_frame_interval_decode", 0) or 0)
    debug_on = bool(debug_dir) and debug_every > 0 and os.path.isdir(
        os.path.dirname(os.path.abspath(debug_dir)) or "."
    ) and getattr(config, "debug_dump_enabled", False)

    # GOP-parallel fast path: I-frame-delimited chains are independent when
    # the IIR filter is off (alpha couples consecutive GOPs through the
    # I-frame), so decode G of them as one batched recurrence.
    gop_batch = max(1, getattr(config, "decode_gop_batch", 1))
    gop_devices = max(1, getattr(config, "decode_gop_devices", 1))
    if gop_devices > 1 and gop_batch > 1:
        import jax

        from rdvc_tpu.parallel.mesh import make_data_mesh

        n = min(gop_devices, len(jax.devices()))
        if gop_batch % n != 0:
            # Round the batch up so rows divide evenly over the mesh.
            gop_batch = ((gop_batch + n - 1) // n) * n
        runtime.set_gop_mesh(make_data_mesh(n, axis_name="gop"))
    elif getattr(runtime, "_gop_mesh", None) is not None:
        runtime.set_gop_mesh(None)
    if gop_batch > 1 and config.temporal_filter_alpha == 0 and not debug_on:
        try:
            _decode_gop_batched(
                config, runtime, reader, emit, timer, height, width,
                gop_batch, use_i420,
            )
            return {
                "frames": n_frames,
                "metadata": meta,
                "decoded_frames": frames_out,
                "timings": timer.summary(),
            }
        finally:
            reader.close()
            if own_sink and sink is not None:
                sink.close()

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max(1, config.rans_threads))

    def _rans_one(payload: bytes):
        m_shape, m_bs, r_shape, r_bs = unpack_pframe_payload(payload)
        return (
            runtime.decompress_motion_symbols(m_bs, m_shape),
            runtime.decompress_residual_symbols(r_bs, r_shape),
        )

    emit_kind = "i420" if use_i420 else "rgb"
    try:
        # Read records in bounded windows (a few prefetch groups) so symbol
        # production for upcoming frames overlaps the device recurrence
        # without materializing every payload of a long video in host RAM.
        import itertools

        frame_iter = reader.frames()
        while True:
            with timer.span("container_read"):
                records = list(
                    itertools.islice(frame_iter, _READ_WINDOW)
                )
            if not records:
                break
            rans_futs = _prefetch_symbols(runtime, records, pool, timer)
            ref_raw, prev_post, latest_iframe, pending_u8 = _decode_serial_window(
                records, rans_futs, runtime, config, emit, timer,
                height, width, use_i420, emit_kind, iir_alpha,
                ref_raw, prev_post, latest_iframe, pending_u8,
                debug_on, debug_every, _start_host_copy,
            )
        if pending_u8 is not None:
            emit(pending_u8, emit_kind)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
        reader.close()
        if own_sink and sink is not None:
            sink.close()

    return {
        "frames": n_frames,
        "metadata": meta,
        "decoded_frames": frames_out,
        "timings": timer.summary(),
    }


_READ_WINDOW = 128  # serial-path container read-ahead (bounds host RAM)


def _decode_serial_window(
    records, rans_futs, runtime, config, emit, timer, height, width,
    use_i420, emit_kind, iir_alpha, ref_raw, prev_post, latest_iframe,
    pending_u8, debug_on, debug_every, _start_host_copy,
):
    """One read-ahead window of the serial decode loop; returns the decoder
    state threaded to the next window."""
    post = prev_post
    for i, rec in enumerate(records):
        if rec.frame_type == "I":
            with timer.span("iframe_decode"):
                _, img_bytes = unpack_iframe_payload(rec.payload)
                rgb = decode_jpeg(img_bytes)
                frame = jnp.asarray(rgb[None].astype(np.float32) / 255.0)
            ref_raw = frame
            latest_iframe = frame
            post = frame
            if prev_post is not None and float(iir_alpha) > 0:
                post = temporal_iir_filter(post, prev_post, iir_alpha)
            if pending_u8 is not None:
                emit(pending_u8, emit_kind)
            nxt = (
                runtime.to_i420(post)[0]
                if use_i420
                else jnp.clip(post[0] * 255.0 + 0.5, 0, 255).astype(
                    jnp.uint8
                )
            )
            pending_u8 = _start_host_copy(nxt)
        else:
            if ref_raw is None:
                log.warning("P-frame %d before any I-frame; skipped", rec.index)
                continue
            with timer.span("rans_decode"):
                q_m, q_r = rans_futs.pop(i).result()
            # One fused dispatch: reconstruct + LMR + hist-match + IIR
            # + uint8 conversion (post-processing stays on device).
            with timer.span("decode_dispatch"):
                raw, post, u8 = runtime.decode_pframe_fused(
                    ref_raw, q_m, q_r,
                    prev_post if prev_post is not None else ref_raw,
                    latest_iframe if latest_iframe is not None else ref_raw,
                    config.low_motion_replacement_threshold,
                    config.temporal_filter_alpha,
                    (height, width),
                )
                frame_dev = runtime.to_i420(post)[0] if use_i420 else u8[0]
            if debug_on and rec.index % debug_every == 0:
                _dump_debug_frames(
                    runtime, config, rec.index, ref_raw, q_m, q_r,
                    (height, width), post,
                    prev_post=prev_post if prev_post is not None else ref_raw,
                    iframe=(
                        latest_iframe
                        if latest_iframe is not None
                        else ref_raw
                    ),
                )
            # Overlap: write the previous frame while this one computes.
            if pending_u8 is not None:
                emit(pending_u8, emit_kind)
            pending_u8 = _start_host_copy(frame_dev)
            ref_raw = raw  # codec reference stays RAW
        prev_post = post
    return ref_raw, prev_post, latest_iframe, pending_u8


class _Ready:
    """Future-compatible wrapper for already-available (device) symbols."""

    def __init__(self, value):
        self._value = value

    def result(self):
        return self._value


_DEVICE_DECODE_GROUP = 16


def _prefetch_symbols(runtime, records, pool, timer):
    """Produce {record_index: future-like -> (q_m, q_r)} for all P-frames.

    Fast path: chunked (device-coded) payloads are entropy-decoded ON the
    device in groups — the host uploads only compressed words and the
    symbols never cross the link. Host-coded payloads (tag 0x01, the escape
    fallback) decode on the host thread pool and upload raw symbols.
    """
    p_items = []  # (key, m_shape, m_bs, r_shape, r_bs)
    for i, rec in enumerate(records):
        if rec.frame_type == "P":
            p_items.append((i,) + unpack_pframe_payload(rec.payload))
    return _prefetch_items(runtime, p_items, pool, timer)


def _prefetch_items(runtime, p_items, pool, timer):
    """{key: future-like} symbol prefetcher over (key, m_shape, m_bs,
    r_shape, r_bs) items (see _prefetch_symbols)."""
    # Split into consecutive same-shape groups of bounded size.
    groups = []
    cur = []
    prev_shapes = None
    for it in p_items:
        shapes = (it[1], it[3])
        if cur and (
            shapes != prev_shapes or len(cur) >= _DEVICE_DECODE_GROUP
        ):
            groups.append(cur)
            cur = []
        cur.append(it)
        prev_shapes = shapes
    if cur:
        groups.append(cur)

    class _Group:
        """Lazily device-decoded symbol group: dispatched on first touch
        (plus one-group lookahead from the caller), freed when every row
        has been consumed — bounds HBM to ~2 groups for long sequences."""

        def __init__(self, items):
            self.items = items
            self.stacks = None
            self.host_futs = None
            self.consumed = set()

        def dispatch(self):
            if self.stacks is not None or self.host_futs is not None:
                return
            items = self.items
            try:
                # Pad to the fixed group size: every group hits ONE
                # compiled decode-kernel shape (padded rows are dummy
                # repeats, never read back).
                pad = list(items) + [items[-1]] * (
                    _DEVICE_DECODE_GROUP - len(items)
                )
                with timer.span("device_rans_decode_dispatch"):
                    m_stack = runtime.decode_payloads_device(
                        [it[2] for it in pad], "motion", items[0][1]
                    )
                    r_stack = runtime.decode_payloads_device(
                        [it[4] for it in pad], "residual", items[0][3]
                    )
                self.stacks = (m_stack, r_stack)
            except Exception:
                log.debug("device entropy decode unavailable; host fallback")
                self.host_futs = [
                    pool.submit(
                        lambda mb=it[2], ms=it[1], rb=it[4], rs=it[3]: (
                            runtime.decompress_motion_symbols(mb, ms),
                            runtime.decompress_residual_symbols(rb, rs),
                        )
                    )
                    for it in items
                ]

        def row(self, k):
            self.dispatch()
            if self.stacks is not None:
                m_stack, r_stack = self.stacks
                out = (m_stack[k : k + 1], r_stack[k : k + 1])
            else:
                out = self.host_futs[k].result()
            self.consumed.add(k)
            if len(self.consumed) >= len(self.items):
                self.stacks = None
                self.host_futs = None
            return out

    class _Ref:
        def __init__(self, gi, k):
            self.gi = gi
            self.k = k

        def result(self):
            if self.gi + 1 < len(group_objs):  # lookahead: overlap next
                group_objs[self.gi + 1].dispatch()
            return group_objs[self.gi].row(self.k)

    group_objs = [_Group(g) for g in groups]
    futs = {}
    for gi, g in enumerate(groups):
        for k, it in enumerate(g):
            futs[it[0]] = _Ref(gi, k)
    return futs


def _prefetch_chunks(runtime, p_items, group_size, pool, timer):
    """Chunk-granular symbol prefetcher over a complete rectangular
    (t-major) payload lattice. Returns chunk objects whose stacks() yields
    (m (G, h, w, C), r (G, h, w, C)) int16 symbol stacks; device entropy
    decode dispatches lazily with one-chunk lookahead, host-coded payloads
    fall back to the thread pool + symbol upload."""
    groups = [
        p_items[i : i + group_size]
        for i in range(0, len(p_items), group_size)
    ]

    class _Chunk:
        def __init__(self, idx, items):
            self.idx = idx
            self.items = items
            self._result = None
            self._host_futs = None

        def dispatch(self):
            if self._result is not None or self._host_futs is not None:
                return
            items = list(self.items)
            # Pad to the fixed kernel batch so every chunk hits one
            # compiled decode-kernel shape.
            while len(items) < max(group_size, _DEVICE_DECODE_GROUP):
                items.append(items[-1])
            try:
                with timer.span("device_rans_decode_dispatch"):
                    m = runtime.decode_payloads_device(
                        [it[2] for it in items], "motion", items[0][1]
                    )
                    r = runtime.decode_payloads_device(
                        [it[4] for it in items], "residual", items[0][3]
                    )
                self._result = (m[:group_size], r[:group_size])
            except Exception:
                log.debug("device entropy decode unavailable; host fallback")
                self._host_futs = [
                    pool.submit(
                        lambda mb=it[2], ms=it[1], rb=it[4], rs=it[3]: (
                            runtime.decompress_motion_symbols(mb, ms),
                            runtime.decompress_residual_symbols(rb, rs),
                        )
                    )
                    for it in items[:group_size]
                ]

        def stacks(self):
            self.dispatch()
            if self.idx + 1 < len(chunks):  # lookahead: overlap next
                chunks[self.idx + 1].dispatch()
            if self._result is not None:
                return self._result
            rows = [f.result() for f in self._host_futs]
            m = np.concatenate([np.asarray(q[0]) for q in rows], 0)
            r = np.concatenate([np.asarray(q[1]) for q in rows], 0)
            return m, r

    chunks = [_Chunk(i, g) for i, g in enumerate(groups)]
    return chunks


def _decode_gop_batched(
    config: CodecConfig,
    runtime: CodecRuntime,
    reader: RdvcReader,
    emit,
    timer: StageTimer,
    height: int,
    width: int,
    gop_batch: int,
    use_i420: bool = False,
) -> None:
    """Decode consecutive GOPs as one batched recurrence.

    Each batch row carries its own (ref_raw, prev_post, iframe) state; the
    within-GOP P-frame chain remains strictly serial (the codec recurrence),
    but G chains advance per device dispatch. Host rANS for all payloads of
    the group runs in a thread pool up front. Frames are emitted in
    container order after the group completes.
    """
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max(1, config.rans_threads))

    def process_group(group, pad_to=None) -> None:
        # Pad to the fixed batch size so every group hits one compiled
        # shape; padded rows are dropped at emit time. The OOM fallback
        # passes pad_to=1 so the retry genuinely shrinks the device
        # working set instead of re-padding to the shape that just OOMed.
        real = len(group)
        while len(group) < (gop_batch if pad_to is None else pad_to):
            group = group + [group[-1]]
        B = len(group)
        with timer.span("iframe_decode"):
            irgb = np.stack([decode_jpeg(g["ibytes"]) for g in group])

        # Complete (t, gi) payload lattice: finished/lone-I rows repeat a
        # dummy payload so every chunk is a rectangular (T, B) block (their
        # decoded symbols are computed and discarded — regularity buys one
        # scan dispatch per chunk instead of one dispatch per step).
        max_len = max((len(g["p"]) for g in group), default=0)
        any_payload = next(
            (g["p"][0] for g in group if g["p"]), None
        )
        p_items = []
        for t in range(max_len):
            for gi, g in enumerate(group):
                if t < len(g["p"]):
                    item = g["p"][t]
                elif g["p"]:
                    item = g["p"][len(g["p"]) - 1]
                else:
                    item = any_payload
                p_items.append(((gi, t),) + item)
        chunk_t = max(1, _DEVICE_DECODE_GROUP // B)
        chunks = _prefetch_chunks(
            runtime, p_items, chunk_t * B, pool, timer
        )

        state_raw = jnp.asarray(irgb.astype(np.float32) / 255.0)
        prev_post = state_raw
        iframe = state_raw
        # Chunk-timeline instrumentation (RDVC_DECODE_TIMELINE=1): stderr
        # timestamps proving whether chunk N's download actually overlaps
        # chunk N+1's device compute through the relay (overlap_s forensics).
        timeline = os.environ.get("RDVC_DECODE_TIMELINE") == "1"
        t_origin = time.perf_counter() if timeline else 0.0

        def _mark(tag, ci):
            if timeline:
                print(
                    f"[decode-timeline] {tag} chunk={ci} "
                    f"t={time.perf_counter() - t_origin:.3f}",
                    file=sys.stderr, flush=True,
                )
        if use_i420:
            from rdvc_tpu.io.yuv import rgb_to_yuv420p

            out_frames = [
                [("i420", rgb_to_yuv420p(irgb[i]))] for i in range(B)
            ]
        else:
            out_frames = [[("rgb", irgb[i])] for i in range(B)]
        kind = "i420" if use_i420 else "rgb"
        pending_dl = None  # ([(t, active_rows)], async (T, B, ...) frames)

        def drain_download(ci=-1):
            nonlocal pending_dl
            if pending_dl is None:
                return
            steps, dev = pending_dl
            pending_dl = None
            _mark("drain_start", ci)
            with timer.span("frame_download"):
                arr = np.asarray(dev)
            _mark("drain_end", ci)
            for ti, act in steps:
                for gi in act:
                    out_frames[gi].append((kind, arr[ti, gi]))

        for ci, chunk in enumerate(chunks):
            t0 = ci * chunk_t
            n_t = min(chunk_t, max_len - t0)
            # Fused path: entropy decode + scan in ONE dispatch (payload
            # words ride the call). The staged path below costs two extra
            # decode-kernel dispatches per chunk, and through the relay
            # every round trip blocks behind queued device work.
            fused = None
            _mark("dispatch_start", ci)
            try:
                items = list(chunk.items)
                while len(items) < chunk_t * B:  # pad to the compiled shape
                    items.append(items[-1])
                with timer.span("decode_dispatch"):
                    fused = runtime.decode_pframes_scan_coded(
                        state_raw, prev_post, iframe,
                        [it[2] for it in items], [it[4] for it in items],
                        items[0][1], items[0][3],
                        config.low_motion_replacement_threshold, 0.0,
                        (height, width), use_i420, chunk_t,
                    )
            except ValueError:
                pass  # host-coded payloads or gop mesh: staged path
            if fused is not None:
                state_raw, prev_post, u8_T = fused
            else:
                with timer.span("rans_decode"):
                    m_stack, r_stack = chunk.stacks()
                # The last chunk scans its padded dummy steps too (one
                # compiled shape); their outputs and the post-group carry
                # are discarded.
                with timer.span("decode_dispatch"):
                    m_T = jnp.asarray(m_stack).reshape(
                        (chunk_t, B) + m_stack.shape[1:]
                    )
                    r_T = jnp.asarray(r_stack).reshape(
                        (chunk_t, B) + r_stack.shape[1:]
                    )
                    state_raw, prev_post, u8_T = (
                        runtime.decode_pframes_scan(
                            state_raw, prev_post, iframe, m_T, r_T,
                            config.low_motion_replacement_threshold, 0.0,
                            (height, width), use_i420,
                        )
                    )
            _mark("dispatch_end", ci)
            # Download of the previous chunk overlaps this chunk's compute.
            drain_download(ci - 1)
            try:
                u8_T.copy_to_host_async()
            except AttributeError:
                pass
            steps = [
                (
                    ti,
                    [
                        gi
                        for gi, g in enumerate(group)
                        if t0 + ti < len(g["p"]) and gi < real
                    ],
                )
                for ti in range(n_t)
            ]
            pending_dl = (steps, u8_T)
        drain_download()
        for gi in range(real):
            for k2, f in out_frames[gi]:
                emit(f, k2)

    def safe_process(group):
        """Device OOM on a multi-GOP group degrades to GOP-serial retries:
        each GOP restarts cleanly from its own I-frame (nothing is emitted
        until a group completes), so halving the batch rows is always safe.
        Long runs sit near the HBM ceiling (observed: a 600-frame sustained
        decode OOMs at B=2 where the 64-frame bench with identical shapes
        fits) — resilience here keeps the jockey.txt scenario alive."""
        try:
            process_group(group)
        except Exception as e:  # jaxlib runtime error types vary by backend
            if "RESOURCE_EXHAUSTED" not in str(e) or len(group) == 1:
                raise
            log.warning(
                "device OOM decoding a %d-GOP group; retrying GOP-serially",
                len(group),
            )
            for g in group:
                process_group([g], pad_to=1)

    group = []
    current = None
    for rec in reader.frames():
        if rec.frame_type == "I":
            if current is not None:
                group.append(current)
                if len(group) >= gop_batch:
                    safe_process(group)
                    group = []
            _, ibytes = unpack_iframe_payload(rec.payload)
            current = {"ibytes": ibytes, "p": []}
        else:
            if current is None:
                log.warning("P-frame %d before any I-frame; skipped", rec.index)
                continue
            current["p"].append(unpack_pframe_payload(rec.payload))
    if current is not None:
        group.append(current)
    if group:
        safe_process(group)
    pool.shutdown()


def _dump_debug_frames(
    runtime: CodecRuntime,
    config: CodecConfig,
    index: int,
    prev_raw,
    q_m,
    q_r,
    target_hw,
    post,
    prev_post=None,
    iframe=None,
) -> None:
    """Staged debug PNGs for one P-frame: all 9 stages of the reference
    decoder's per-N-frames dumps — prev-ref, flow, warped, MC prediction,
    residual, raw recon, LMR mask (codec_processing.py:1851-1882),
    hist-matched stage (1884-1903), final post-processed
    (codec_processing.py:1775-1926)."""
    import os

    from PIL import Image

    # Factorized streams deliver int16 symbols (medians re-added here);
    # hyperprior streams deliver already-dequantized float32 latents.
    if np.issubdtype(np.asarray(q_m).dtype, np.integer):
        q_m = np.asarray(q_m, np.float32) + runtime.motion_tables.medians[
            None, None, None, :
        ]
    if np.issubdtype(np.asarray(q_r).dtype, np.integer):
        q_r = np.asarray(q_r, np.float32) + runtime.residual_tables.medians[
            None, None, None, :
        ]
    out = runtime.reconstruct_p_frame(prev_raw, q_m, q_r, target_hw)
    d = config.debug_frames_dir_decode
    os.makedirs(d, exist_ok=True)

    def save(name, arr, drange=False):
        a = np.asarray(arr)[0]
        if drange:
            lo, hi = a.min(), a.max()
            a = (a - lo) / max(hi - lo, 1e-6)
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
        if a.ndim == 2:
            a = np.stack([a] * 3, -1)
        Image.fromarray(a).save(os.path.join(d, f"frame_{index:05d}_{name}.png"))

    save("1_prev_ref", prev_raw)
    flow = out["flow"]
    mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    save("2_flow_mag", mag, drange=True)
    save("3_warped", out["warped"])
    save("4_motion_compensated", out["motion_compensated"])
    save("5_residual", out["residual"] * 0.5 + 0.5)
    save("6_raw_recon", out["reconstructed"])
    # Stages 7-8 replay the post cascade at dump time (the fused decode
    # kernel never materializes them separately).
    thr = float(config.low_motion_replacement_threshold)
    mask = np.logical_and(np.asarray(mag) < thr, thr > 0)
    save("7_lmr_mask", mask.astype(np.float32))
    if prev_post is not None and iframe is not None:
        from rdvc_tpu.postproc import histogram_match_ycrcb

        lmr_out = jnp.where(
            jnp.asarray(mask)[..., None],
            jnp.asarray(iframe),
            out["reconstructed"],
        )
        save("8_hist_matched", histogram_match_ycrcb(lmr_out, jnp.asarray(prev_post)))
    save("9_final_post", post)
