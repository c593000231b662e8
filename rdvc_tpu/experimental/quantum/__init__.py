from rdvc_tpu.experimental.quantum.dct_codec import DctBlockCodec  # noqa: F401
from rdvc_tpu.experimental.quantum.fft_topk import (  # noqa: F401
    fft_topk_compress,
    fft_topk_reconstruct,
    patched_benchmark,
)
