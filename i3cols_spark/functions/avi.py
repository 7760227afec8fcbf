"""Minimal AVI (RIFF) container with MJPEG video — pure stdlib.

Motion-JPEG-in-AVI is the simplest REAL video format expressible with
nothing beyond ``struct``: a RIFF container whose ``movi`` list holds
one baseline JPEG (functions/jpeg.py) per frame.  This closes the
"video" leg of the multimodal north star with genuine bytes: the
writer emits a spec-shaped file (hdrl with avih/strh/strf, movi
chunks, idx1 index) that standard tools recognize, and the reader is
a real chunk-walking parser, not a length lookup.

Supported: one 'vids'/'MJPG' stream, '00dc'/'00db' frame chunks, even
-byte chunk padding, optional idx1 (written, not required to read).
Not supported (per-feature gates, same policy as functions/codecs):
audio streams, ODML extended indexes, multi-stream files.

Scale note: both functions operate on a single in-memory payload and
run inside Arrow-batched ``mapInPandas`` workers — memory is bounded
by one batch of payloads, never by dataset size.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class VideoData:
    width: int
    height: int
    fps: int
    frames: list[bytes]  # one baseline-JPEG payload per frame


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + size + data, padded to an even boundary."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(video: VideoData) -> bytes:
    """Serialize JPEG frames into an AVI container (RIFF/AVI 1.0)."""
    n = len(video.frames)
    max_frame = max((len(f) for f in video.frames), default=0)
    usec_per_frame = 1_000_000 // max(1, video.fps)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec_per_frame,       # dwMicroSecPerFrame
            max_frame * video.fps,  # dwMaxBytesPerSec (advisory)
            0,                    # dwPaddingGranularity
            0x10,                 # dwFlags: AVIF_HASINDEX
            n,                    # dwTotalFrames
            0,                    # dwInitialFrames
            1,                    # dwStreams
            max_frame,            # dwSuggestedBufferSize
            video.width,
            video.height,
            0, 0, 0, 0,           # dwReserved
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,                    # dwFlags
            0, 0,                 # wPriority, wLanguage
            0,                    # dwInitialFrames
            1,                    # dwScale
            video.fps,            # dwRate (fps = rate/scale)
            0,                    # dwStart
            n,                    # dwLength (frames)
            max_frame,            # dwSuggestedBufferSize
            0xFFFFFFFF,           # dwQuality (default)
            0,                    # dwSampleSize (0 = varying)
            0, 0, video.width, video.height,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,                   # biSize
            video.width,
            video.height,
            1,                    # biPlanes
            24,                   # biBitCount
            b"MJPG",              # biCompression
            video.width * video.height * 3,  # biSizeImage (advisory)
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks: list[bytes] = []
    idx_entries: list[bytes] = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for frame in video.frames:
        ck = _chunk(b"00dc", frame)
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", 0x10, offset, len(frame))
        )
        movi_chunks.append(ck)
        offset += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_mjpeg_avi(payload: bytes) -> VideoData:
    """Parse an MJPEG AVI back into per-frame JPEG payloads by walking
    the RIFF chunk tree (no reliance on idx1)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    end = min(len(payload), 8 + riff_size)

    width = height = fps = 0
    n_declared = 0
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, fps, n_declared
        pos = lo
        while pos + 8 <= hi:
            fourcc = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body_lo, body_hi = pos + 8, pos + 8 + size
            if body_hi > hi:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type fourcc
            elif fourcc == b"avih":
                if size < 56:
                    raise ValueError("truncated AVI header chunk")
                fields = struct.unpack("<14I", payload[body_lo : body_lo + 56])
                n_declared = fields[4]
                width, height = fields[8], fields[9]
            elif fourcc == b"strh":
                if size < 28:
                    raise ValueError("truncated AVI header chunk")
                if payload[body_lo : body_lo + 4] == b"vids":
                    handler = payload[body_lo + 4 : body_lo + 8]
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI codec {handler!r} not supported (MJPG only)"
                        )
                    scale, rate = struct.unpack(
                        "<II", payload[body_lo + 20 : body_lo + 28]
                    )
                    fps = rate // max(1, scale)
                else:
                    raise NotImplementedError(
                        "non-video AVI streams not supported"
                    )
            elif fourcc in (b"00dc", b"00db"):
                frames.append(payload[body_lo:body_hi])
            pos = body_hi + (size % 2)  # even-byte chunk alignment

    walk(12, end)
    if n_declared and n_declared != len(frames):
        raise ValueError(
            f"AVI declares {n_declared} frames, found {len(frames)}"
        )
    return VideoData(width=width, height=height, fps=fps, frames=frames)
