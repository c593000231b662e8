"""Rate-distortion sweep over compression resolutions.

Reference: the published RD benchmarks sweep flow/residual_compress_height
over {1080, 720, 480, 360, 240, 140} (beauty.txt runs; plotted by
vis_bench.py). This harness reruns the UVG benchmark per resolution and
emits the table + optional RD-curve plot against the reference's numbers.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence

from rdvc_tpu.config import CodecConfig
from rdvc_tpu.eval.uvg import run_uvg_benchmark
from rdvc_tpu.pipeline.codec_runtime import CodecRuntime

log = logging.getLogger(__name__)

REFERENCE_HEIGHTS = (1080, 720, 480, 360, 240, 140)


def run_rd_sweep(
    yuv_path: str,
    width: int,
    height: int,
    num_frames: int = 50,
    heights: Sequence[int] = REFERENCE_HEIGHTS,
    base_config: Optional[CodecConfig] = None,
    runtime: Optional[CodecRuntime] = None,
    plot_path: Optional[str] = None,
    video_name: str = "video",
) -> List[Dict]:
    results = []
    for h in heights:
        config = dataclasses.replace(base_config) if base_config else CodecConfig()
        config.flow_compress_height = h
        config.residual_compress_height = h
        r = run_uvg_benchmark(
            yuv_path, width, height, num_frames=num_frames,
            config=config, runtime=runtime,
        )
        r["compress_height"] = h
        log.info(
            "RD point %dp: PSNR %.2f dB, MS-SSIM %s, bpp %.4f",
            h, r["psnr_avg_db"], r["ms_ssim_avg"], r["bpp"],
        )
        results.append(r)
    if plot_path:
        from rdvc_tpu.utils.vis import plot_rd_curves

        plot_rd_curves(
            {
                video_name: {
                    "bpp": [r["bpp"] for r in results],
                    "psnr": [r["psnr_avg_db"] for r in results],
                }
            },
            plot_path,
        )
    return results
