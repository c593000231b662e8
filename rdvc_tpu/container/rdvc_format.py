"""`.rdvc` container: byte-compatible reader/writer.

Format spec (reference /root/reference/codec_processing.py:86-96 constants,
1380-1568 writer, 1696-1772 parser), all integers big-endian:

    [RDVCMETA][u32 json_len][json metadata]
    repeat per frame:
      [RDVCFRME][u32 frame_idx][1 byte b'I'|b'P'][u64 payload_len][payload]
    [RDVCEND_]

I-frame payload:  [u8 ext_len][ext bytes e.g. ".jpg"][image bytes]
P-frame payload:  [i32 mH][i32 mW][u32 m_len][motion bitstream]
                  [i32 rH][i32 rW][u32 r_len][residual bitstream]
                  (H, W are latent-space dims)

The reference buffers frame records in RAM and writes the metadata block
first even though it is produced last; the writer here does the same so a
stream is produced in one pass.
"""

from __future__ import annotations

import dataclasses
import io
import json
import struct
from typing import Iterator, Optional, Tuple

METADATA_MARKER = b"RDVCMETA"
FRAME_MARKER = b"RDVCFRME"
EOF_MARKER = b"RDVCEND_"

_U8 = ">B"
_U32 = ">I"
_I32 = ">i"
_U64 = ">Q"


@dataclasses.dataclass
class FrameRecord:
    index: int
    frame_type: str  # "I" | "P"
    payload: bytes


def pack_iframe_payload(image_bytes: bytes, ext: str = ".jpg") -> bytes:
    ext_b = ext.encode("utf-8")
    return struct.pack(_U8, len(ext_b)) + ext_b + image_bytes


def unpack_iframe_payload(payload: bytes) -> Tuple[str, bytes]:
    (ext_len,) = struct.unpack(_U8, payload[:1])
    ext = payload[1 : 1 + ext_len].decode("utf-8")
    return ext, payload[1 + ext_len :]


def pack_pframe_payload(
    motion_shape_hw: Tuple[int, int],
    motion_bitstream: bytes,
    residual_shape_hw: Tuple[int, int],
    residual_bitstream: bytes,
) -> bytes:
    return (
        struct.pack(_I32, int(motion_shape_hw[0]))
        + struct.pack(_I32, int(motion_shape_hw[1]))
        + struct.pack(_U32, len(motion_bitstream))
        + motion_bitstream
        + struct.pack(_I32, int(residual_shape_hw[0]))
        + struct.pack(_I32, int(residual_shape_hw[1]))
        + struct.pack(_U32, len(residual_bitstream))
        + residual_bitstream
    )


def unpack_pframe_payload(
    payload: bytes,
) -> Tuple[Tuple[int, int], bytes, Tuple[int, int], bytes]:
    off = 0
    mh, mw = struct.unpack(_I32, payload[off : off + 4])[0], struct.unpack(
        _I32, payload[off + 4 : off + 8]
    )[0]
    off += 8
    (m_len,) = struct.unpack(_U32, payload[off : off + 4])
    off += 4
    motion_bs = payload[off : off + m_len]
    off += m_len
    rh = struct.unpack(_I32, payload[off : off + 4])[0]
    rw = struct.unpack(_I32, payload[off + 4 : off + 8])[0]
    off += 8
    (r_len,) = struct.unpack(_U32, payload[off : off + 4])
    off += 4
    residual_bs = payload[off : off + r_len]
    off += r_len
    if off != len(payload):
        raise ValueError(
            f"P-frame payload has {len(payload) - off} trailing bytes"
        )
    return (mh, mw), motion_bs, (rh, rw), residual_bs


class RdvcWriter:
    """One-pass writer: frames buffered in RAM, metadata emitted first
    (reference behavior, codec_processing.py:1380-1565)."""

    def __init__(self, path: str):
        self._path = path
        self._buffer = io.BytesIO()
        self._count = 0
        self.total_pframe_payload_bytes = 0

    def add_iframe(self, index: int, image_bytes: bytes, ext: str = ".jpg") -> None:
        payload = pack_iframe_payload(image_bytes, ext)
        self._add(index, b"I", payload)

    def add_pframe(
        self,
        index: int,
        motion_shape_hw: Tuple[int, int],
        motion_bitstream: bytes,
        residual_shape_hw: Tuple[int, int],
        residual_bitstream: bytes,
    ) -> None:
        payload = pack_pframe_payload(
            motion_shape_hw, motion_bitstream, residual_shape_hw, residual_bitstream
        )
        # Reference tracks the sum of the two bitstream lengths.
        self.total_pframe_payload_bytes += len(motion_bitstream) + len(
            residual_bitstream
        )
        self._add(index, b"P", payload)

    def _add(self, index: int, ftype: bytes, payload: bytes) -> None:
        self._buffer.write(FRAME_MARKER)
        self._buffer.write(struct.pack(_U32, index))
        self._buffer.write(ftype)
        self._buffer.write(struct.pack(_U64, len(payload)))
        self._buffer.write(payload)
        self._count += 1

    @property
    def num_frames(self) -> int:
        return self._count

    def finalize(self, metadata: dict) -> None:
        meta_bytes = json.dumps(metadata, indent=4).encode("utf-8")
        with open(self._path, "wb") as f:
            f.write(METADATA_MARKER)
            f.write(struct.pack(_U32, len(meta_bytes)))
            f.write(meta_bytes)
            f.write(self._buffer.getvalue())
            f.write(EOF_MARKER)


class RdvcReader:
    """Streaming parser with EOF-marker tolerance
    (reference codec_processing.py:1696-1772, 1948-1965)."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        marker = self._f.read(8)
        if marker != METADATA_MARKER:
            self._f.close()
            raise ValueError(f"not an RDVC file (got {marker!r})")
        (meta_len,) = struct.unpack(_U32, self._f.read(4))
        self.metadata = json.loads(self._f.read(meta_len).decode("utf-8"))

    def __enter__(self) -> "RdvcReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        self._f.close()

    def frames(self) -> Iterator[FrameRecord]:
        while True:
            rec = self._read_frame()
            if rec is None:
                return
            yield rec

    def _read_frame(self) -> Optional[FrameRecord]:
        marker = self._f.read(8)
        if not marker or marker == EOF_MARKER:
            return None
        if len(marker) < 8:
            # Truncated stream: tolerate, like the reference's EOFError path.
            return None
        if marker != FRAME_MARKER:
            raise ValueError(f"bad frame marker {marker!r}")
        hdr = self._f.read(4 + 1 + 8)
        if len(hdr) < 13:
            return None
        (index,) = struct.unpack(_U32, hdr[:4])
        ftype = hdr[4:5].decode("ascii")
        if ftype not in ("I", "P"):
            raise ValueError(f"bad frame type {ftype!r}")
        (plen,) = struct.unpack(_U64, hdr[5:13])
        payload = self._f.read(plen)
        if len(payload) < plen:
            return None  # truncated final frame
        return FrameRecord(index=index, frame_type=ftype, payload=payload)
