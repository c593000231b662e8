from rdvc_tpu.container.rdvc_format import (  # noqa: F401
    RdvcReader,
    RdvcWriter,
    FrameRecord,
    pack_iframe_payload,
    unpack_iframe_payload,
    pack_pframe_payload,
    unpack_pframe_payload,
    METADATA_MARKER,
    FRAME_MARKER,
    EOF_MARKER,
)
