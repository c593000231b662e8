from rdvc_tpu.io.yuv import (  # noqa: F401
    read_yuv420p_frames,
    count_yuv420p_frames,
    write_yuv420p_frames,
    yuv420p_to_rgb,
    rgb_to_yuv420p,
)
from rdvc_tpu.io.video import get_frame_source, VideoSink  # noqa: F401
from rdvc_tpu.io.jpeg import encode_jpeg, decode_jpeg  # noqa: F401
