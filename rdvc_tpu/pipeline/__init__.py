from rdvc_tpu.pipeline.codec_runtime import CodecRuntime  # noqa: F401
from rdvc_tpu.pipeline.encode import encode_video  # noqa: F401
from rdvc_tpu.pipeline.decode import decode_video  # noqa: F401
