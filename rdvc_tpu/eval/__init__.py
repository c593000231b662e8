from rdvc_tpu.eval.two_frames import run_two_frame_roundtrip  # noqa: F401
from rdvc_tpu.eval.uvg import run_uvg_benchmark  # noqa: F401
