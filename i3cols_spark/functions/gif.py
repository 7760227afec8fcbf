"""Pure-stdlib GIF87a/89a codec — palette-indexed images and
animations with real variable-width LZW compression.

Completes the image-format family (BMP/PNM/PNG/JPEG in
functions/codecs.py and functions/jpeg.py) with the one common
format built on LZW: the encoder emits spec-shaped files (logical
screen descriptor, global color table, graphic-control extensions
with per-frame delays, NETSCAPE2.0 loop block for animations,
sub-block-chunked LZW data), and the decoder is a real bit-level LZW
state machine — variable code width, clear/EOI codes, 4096-entry
dictionary reset — validated against a spec-derived external fixture
in tests (not just against our own encoder, so a matched
encoder/decoder bug pair cannot self-certify).

Supported: 8-bit palettes (global or per-frame local), multi-frame
animations, delays.  Gated per-feature (NotImplementedError):
interlaced images, transparency compositing beyond index
passthrough.  Decoded frames use the grayscale-or-RGB convention of
functions/codecs.ImageData: palette-grayscale GIFs decode to
channels=1, anything else to channels=3.

Scale note: like every codec here this runs inside Arrow-batched
``mapInPandas`` workers — per-payload buffers only.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from i3cols_spark.functions.codecs import ImageData

_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


@dataclass
class GifData:
    width: int
    height: int
    frames: list[ImageData]
    delays_cs: list[int]  # per-frame delay in centiseconds


# ------------------------------------------------------------------ LZW

def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable width starting at min+1 bits,
    little-endian bit packing, clear on dictionary overflow."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # mirror the decoder: width grows when the table fills the
            # current code space (decoder checks len(table) AFTER its
            # append, which equals next_code here)
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # tolerate missing explicit EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        # the decoder's table lags the encoder's next_code by one (no
        # append on the first post-clear code), so width grows at
        # (1<<width)-1 to mirror the encoder's next_code == 1<<width
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


# ------------------------------------------------------------ container

def _sub_blocks(payload: bytes) -> bytes:
    """Chunk payload into ≤255-byte sub-blocks with a terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def encode_gif(gif: GifData) -> bytes:
    """Serialize frames (all channels=1, full-size) as an animated
    GIF89a with a 256-entry grayscale global palette."""
    if len(gif.frames) != len(gif.delays_cs):
        raise ValueError(
            f"encode_gif: {len(gif.frames)} frames but "
            f"{len(gif.delays_cs)} delays"
        )
    for fr in gif.frames:
        if fr.channels != 1:
            raise NotImplementedError(
                "encode_gif: grayscale (channels=1) frames only"
            )
        if (fr.width, fr.height) != (gif.width, gif.height):
            raise ValueError("encode_gif: frame dims must match screen dims")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table flag, 8-bit color res,
    # 256-entry table (size field 7)
    out += struct.pack("<HHBBB", gif.width, gif.height, 0xF7, 0, 0)
    out += _GRAY_PALETTE
    if len(gif.frames) > 1:
        # NETSCAPE2.0 infinite-loop application extension
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")
    for fr, delay in zip(gif.frames, gif.delays_cs):
        out += b"\x21\xf9" + bytes([4]) + struct.pack("<BHB", 0, delay, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fr.width, fr.height, 0)
        min_code = 8
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(fr.pixels, min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> GifData:
    """Parse a GIF87a/89a into frames + delays by walking the block
    stream (real LZW decode per frame)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_pal = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        global_pal = payload[pos : pos + n]
        pos += n
    frames: list[ImageData] = []
    delays: list[int] = []
    pending_delay = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                _flags, pending_delay, _tidx = struct.unpack(
                    "<BHB", payload[pos + 1 : pos + 1 + size]
                )
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("unterminated graphic control block")
                pos += 1
            else:  # skip app/comment/plain-text sub-blocks
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, fpacked = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            if fpacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            pal = global_pal
            if fpacked & 0x80:
                n = 3 * (2 << (fpacked & 0x07))
                pal = payload[pos : pos + n]
                pos += n
            if (left, top) != (0, 0) or (fw, fh) != (w, h):
                raise NotImplementedError(
                    "partial-frame GIF compositing not supported"
                )
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(bytes(lzw), min_code)
            if len(idx) != fw * fh:
                raise ValueError(
                    f"GIF frame decodes to {len(idx)} px, expected {fw * fh}"
                )
            if not pal:
                raise ValueError("GIF frame has no color table")
            gray = all(
                pal[3 * i] == pal[3 * i + 1] == pal[3 * i + 2]
                for i in range(len(pal) // 3)
            )
            if gray:
                px = bytes(pal[3 * i] for i in idx)
                frames.append(
                    ImageData(width=fw, height=fh, channels=1, pixels=px)
                )
            else:
                px = bytes(
                    v for i in idx for v in pal[3 * i : 3 * i + 3]
                )
                frames.append(
                    ImageData(width=fw, height=fh, channels=3, pixels=px)
                )
            delays.append(pending_delay)
            pending_delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return GifData(width=w, height=h, frames=frames, delays_cs=delays)
