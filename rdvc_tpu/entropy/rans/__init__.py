from rdvc_tpu.entropy.rans.coder import (  # noqa: F401
    RansCodec,
    encode_with_tables,
    decode_with_tables,
    native_available,
)
