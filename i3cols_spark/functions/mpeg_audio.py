"""MPEG-1 audio (ISO/IEC 11172-3) — pure-stdlib frame parsing and
Layer I subband decode, the audio sibling of the JPEG/GIF/AVI codecs.

What is REAL here (and therefore testable bit-for-bit):
  * frame-stream parsing for all three layers — sync scan, header
    field decode (version / layer / bitrate / sample-rate / padding /
    channel mode), per-frame length arithmetic, whole-stream walk with
    truncation checks;
  * Layer I payload decode — bit-allocation table, scalefactor
    indices (closed-form value 2·2^(−idx/3), ISO table B.1), and the
    spec requantizer s''' = (s'' + 2^(1−nb)) · 2^nb/(2^nb−1) with
    s'' = code·2^(1−nb) − 1 (the MSB-inversion + sign-extension dance
    reduces to exactly that affine map), yielding the dequantized
    SUBBAND sample matrix;
  * a Layer I encoder (the fixture synthesizer) emitting spec-layout
    frames, so encode→decode round-trips are exact: requantization is
    closed-form arithmetic, not a lossy transform.

What stays gated, and why: the final subband→PCM synthesis filterbank
needs the 512-coefficient prototype window of ISO 11172-3 Annex B.3
(and Layer II payload decode needs the B.2 allocation tables).  Those
are DATA, not math — there is no closed form to derive them from, and
this container bundles no codec libraries to borrow them from, so
``synthesize_pcm`` raises ``NotImplementedError`` rather than shipping
a lookalike window that would decode real-world streams slightly
wrong.  Everything upstream of that gate is the genuine bitstream.

MPEG-2 / 2.5 extensions use different rate tables and frame lengths;
they are gated per-version the same way.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: MPEG-1 sample rates by the header's 2-bit index (11 = reserved).
SAMPLE_RATES = (44100, 48000, 32000)

#: MPEG-1 bitrates (kbps) by layer and 4-bit index; 0 = free format.
BITRATES = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}

#: Samples per frame per layer (MPEG-1).
SAMPLES_PER_FRAME = {1: 384, 2: 1152, 3: 1152}


@dataclass(frozen=True)
class FrameHeader:
    offset: int
    layer: int
    bitrate_kbps: int
    sample_rate: int
    padding: int
    channel_mode: int  # 0=stereo 1=joint 2=dual 3=single
    has_crc: bool
    frame_bytes: int

    @property
    def channels(self) -> int:
        return 1 if self.channel_mode == 3 else 2

    @property
    def samples(self) -> int:
        return SAMPLES_PER_FRAME[self.layer]


def parse_header(payload: bytes, offset: int = 0) -> FrameHeader:
    """Decode one 32-bit frame header at ``offset``."""
    if offset + 4 > len(payload):
        raise ValueError("mpeg: truncated header")
    b0, b1, b2, b3 = payload[offset : offset + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"mpeg: bad syncword at offset {offset}")
    version_bits = (b1 >> 3) & 0x3
    if version_bits != 0x3:  # 11 = MPEG-1
        raise NotImplementedError(
            "mpeg: only MPEG-1 supported (MPEG-2/2.5 use different "
            "rate tables and frame lengths)"
        )
    layer_bits = (b1 >> 1) & 0x3
    if layer_bits == 0:
        raise ValueError("mpeg: reserved layer bits")
    layer = 4 - layer_bits  # 11→Layer I, 10→II, 01→III
    has_crc = (b1 & 0x1) == 0
    bitrate_idx = (b2 >> 4) & 0xF
    if bitrate_idx == 0xF:
        raise ValueError("mpeg: forbidden bitrate index 15")
    if bitrate_idx == 0:
        raise NotImplementedError("mpeg: free-format bitrate not supported")
    rate_idx = (b2 >> 2) & 0x3
    if rate_idx == 0x3:
        raise ValueError("mpeg: reserved sample-rate index")
    padding = (b2 >> 1) & 0x1
    channel_mode = (b3 >> 6) & 0x3
    kbps = BITRATES[layer][bitrate_idx]
    rate = SAMPLE_RATES[rate_idx]
    if layer == 1:
        frame_bytes = (12 * kbps * 1000 // rate + padding) * 4
    else:
        frame_bytes = 144 * kbps * 1000 // rate + padding
    return FrameHeader(
        offset=offset, layer=layer, bitrate_kbps=kbps, sample_rate=rate,
        padding=padding, channel_mode=channel_mode, has_crc=has_crc,
        frame_bytes=frame_bytes,
    )


def _skip_leading_junk(payload: bytes) -> int:
    """Real-world streams rarely start at the first frame: ID3v2 tags
    and ripper junk precede it.  Skip ID3v2 via its declared syncsafe
    size (ISO-adjacent but ubiquitous), then scan forward to the first
    0xFFEx sync pattern — the standard decoder behaviour (ISO 11172-3
    §2.4.1.3 defines frames BY the syncword, not by file offset)."""
    off = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("mpeg: malformed ID3v2 syncsafe size")
            size = (size << 7) | b
        off = 10 + size
    while off + 4 <= len(payload):
        if payload[off] == 0xFF and (payload[off + 1] & 0xE0) == 0xE0:
            try:  # false syncs inside junk must not derail the scan
                parse_header(payload, off)
                return off
            except ValueError:
                pass
        off += 1
    raise ValueError("mpeg: no frame syncword found in payload")


def parse_frames(payload: bytes) -> list[FrameHeader]:
    """Walk the whole stream header-to-header, starting at the first
    syncword (leading junk / ID3v2 skipped — ADVICE r06).  From the
    first frame on, frames must be back-to-back and fully inside the
    payload; anything else is a malformed stream."""
    if len(payload) < 4:
        raise ValueError("mpeg: payload too short for a frame header")
    frames: list[FrameHeader] = []
    off = _skip_leading_junk(payload)
    while off < len(payload):
        hdr = parse_header(payload, off)
        if off + hdr.frame_bytes > len(payload):
            raise ValueError(
                f"mpeg: truncated frame at offset {off} "
                f"(need {hdr.frame_bytes} bytes)"
            )
        frames.append(hdr)
        off += hdr.frame_bytes
    return frames


def stream_info(payload: bytes) -> dict:
    """Stream-level metadata from a real frame walk (no payload-bit
    decode needed, so this works for Layers I–III)."""
    frames = parse_frames(payload)
    first = frames[0]
    n_samples = sum(f.samples for f in frames)
    return {
        "layer": first.layer,
        "sample_rate": first.sample_rate,
        "bitrate_kbps": first.bitrate_kbps,
        "channels": first.channels,
        "n_frames": len(frames),
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000.0 / first.sample_rate,
    }


def scalefactor(idx: int) -> float:
    """ISO table B.1 in closed form: 2.0 · 2^(−idx/3), idx 0..62."""
    if not 0 <= idx <= 62:
        raise ValueError(f"mpeg: scalefactor index {idx} out of range")
    return 2.0 * 2.0 ** (-idx / 3.0)


def _dequant_l1(code: int, nb: int) -> float:
    """Layer I requantizer.  The spec's MSB-inversion + sign-extension
    of the nb-bit code reduces to the affine map s'' = code·2^(1−nb)−1;
    the slope correction is 2^nb/(2^nb − 1)."""
    s2 = code * 2.0 ** (1 - nb) - 1.0
    return (s2 + 2.0 ** (1 - nb)) * (2.0**nb / (2.0**nb - 1.0))


class _BitReader:
    def __init__(self, data: bytes, bit_off: int = 0) -> None:
        self.data = data
        self.pos = bit_off

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("mpeg: bitstream underrun")
        v = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or value >> n:
            raise ValueError(f"mpeg encode: value {value} exceeds {n} bits")
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to(self, n_bytes: int) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        if len(self.buf) > n_bytes:
            raise ValueError("mpeg encode: frame payload overflows frame size")
        return bytes(self.buf) + b"\x00" * (n_bytes - len(self.buf))


@dataclass(frozen=True)
class Layer1Frame:
    """Decoded Layer I frame: dequantized subband samples and the
    allocation mask they came from."""
    header: FrameHeader
    #: float64 [12, 32, channels] — dequantized subband samples.
    subbands: np.ndarray
    #: bool [32, channels] — which subbands carried bits.
    allocated: np.ndarray


def decode_layer1(payload: bytes) -> list[Layer1Frame]:
    """Decode every Layer I frame's payload bits: bit allocation →
    scalefactors → 12 interleaved sample groups, requantized and
    scaled.  Joint (intensity) stereo is gated; stereo and mono walk
    the spec layout."""
    frames = parse_frames(payload)
    out: list[Layer1Frame] = []
    for hdr in frames:
        if hdr.layer != 1:
            raise NotImplementedError(
                "mpeg: Layer II/III payload decode needs the ISO Annex B "
                "allocation/Huffman tables (not bundled); Layer I only"
            )
        if hdr.channel_mode == 1:
            raise NotImplementedError("mpeg: intensity/joint stereo not supported")
        nch = hdr.channels
        body = payload[hdr.offset : hdr.offset + hdr.frame_bytes]
        br = _BitReader(body, bit_off=32 + (16 if hdr.has_crc else 0))
        nb = np.zeros((32, nch), dtype=np.int64)
        for sb in range(32):
            for ch in range(nch):
                alloc = br.read(4)
                if alloc == 15:
                    raise ValueError("mpeg: forbidden Layer I allocation 15")
                nb[sb, ch] = alloc + 1 if alloc else 0
        scf = np.zeros((32, nch), dtype=np.float64)
        for sb in range(32):
            for ch in range(nch):
                if nb[sb, ch]:
                    scf[sb, ch] = scalefactor(br.read(6))
        samples = np.zeros((12, 32, nch), dtype=np.float64)
        for s in range(12):
            for sb in range(32):
                for ch in range(nch):
                    n = int(nb[sb, ch])
                    if n:
                        samples[s, sb, ch] = scf[sb, ch] * _dequant_l1(
                            br.read(n), n
                        )
        out.append(
            Layer1Frame(header=hdr, subbands=samples, allocated=nb > 0)
        )
    return out


def encode_layer1(
    frame_specs: list[dict[int, tuple[int, int, list[int]]]],
    rate_idx: int,
    bitrate_idx: int,
) -> bytes:
    """Fixture encoder: one MONO Layer I frame per spec entry.  Each
    spec maps subband → (nb, scf_idx, 12 codes); unlisted subbands get
    allocation 0.  Emits genuine header + bit-allocation + scalefactor
    + sample layout, zero-padded to the exact frame length."""
    kbps = BITRATES[1][bitrate_idx]
    rate = SAMPLE_RATES[rate_idx]
    frame_bytes = (12 * kbps * 1000 // rate) * 4
    out = bytearray()
    for spec in frame_specs:
        for sb, (nb, scf_idx, codes) in spec.items():
            if not 2 <= nb <= 15:
                raise ValueError(f"mpeg encode: nb={nb} outside 2..15")
            if not 0 <= scf_idx <= 62:
                raise ValueError(f"mpeg encode: scf_idx={scf_idx}")
            if len(codes) != 12:
                raise ValueError("mpeg encode: need 12 codes per subband")
            if not 0 <= sb < 32:
                raise ValueError(f"mpeg encode: subband {sb}")
        hdr = bytes(
            [
                0xFF,
                0xE0 | (0x3 << 3) | (0x3 << 1) | 0x1,  # MPEG-1, Layer I, no CRC
                (bitrate_idx << 4) | (rate_idx << 2),
                0x3 << 6,  # single channel
            ]
        )
        bw = _BitWriter()
        for sb in range(32):
            bw.write(spec[sb][0] - 1 if sb in spec else 0, 4)
        for sb in range(32):
            if sb in spec:
                bw.write(spec[sb][1], 6)
        for s in range(12):
            for sb in range(32):
                if sb in spec:
                    nb, _, codes = spec[sb]
                    bw.write(codes[s], nb)
        out += hdr + bw.pad_to(frame_bytes - 4)
    return bytes(out)


def synthesize_pcm(frames: list[Layer1Frame]) -> np.ndarray:
    """Subband → PCM polyphase synthesis.  The matrixing cosines are
    closed-form, but the 512-tap prototype window is the ISO 11172-3
    Annex B.3 TABLE — data this container does not carry, and an
    approximated window would silently mis-decode real streams."""
    raise NotImplementedError(
        "mpeg: PCM synthesis requires the ISO 11172-3 Annex B.3 window "
        "table (512 coefficients); subband-domain decode is complete"
    )
