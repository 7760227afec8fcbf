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

  * subband→PCM synthesis (``synthesize_pcm``) and the matching PCM→
    subband analysis (``analyze_pcm``) — the ISO §A.2 / §C.1.3 buffer
    flowcharts with closed-form cosine matrixing, driven by an
    EMBEDDED 512-tap near-perfect-reconstruction prototype window
    (PROTOTYPE_WINDOW_B85, designed by
    scripts/design_qmf_window.py: round-trip SNR ≈ 78 dB, unity
    gain, delay exactly 481 samples — the ISO figure).  This is NOT
    the bit-exact ISO Annex B.3 table (this container carries no copy
    of the spec, and reproducing 512 tabulated values from memory
    risks silent, unlocalizable PCM corruption); third-party streams
    decode with ~−60 dB extra error and bit-exact parity with
    reference decoders is not claimed.  The ISO table, where
    available, is a one-constant swap.

What stays gated, and why: Layer II payload decode needs the ISO
Annex B.2 allocation-class tables and Layer III the Huffman tables —
irregular tabulated data with no closed form and no source in this
container, gated per-feature rather than approximated.  MPEG-2 / 2.5
extensions use different rate tables and frame lengths; they are
gated per-version the same way.
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
    gated: NotImplementedError | None = None
    while off + 4 <= len(payload):
        if payload[off] == 0xFF and (payload[off + 1] & 0xE0) == 0xE0:
            try:  # false syncs inside junk must not derail the scan
                parse_header(payload, off)
                return off
            except ValueError:
                pass
            except NotImplementedError as exc:
                gated = gated or exc  # real-but-unsupported candidate
        off += 1
    if gated is not None:  # stream was e.g. MPEG-2: surface the gate,
        raise gated  # not a misleading "no syncword"
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
    frame_specs_ch2: list[dict[int, tuple[int, int, list[int]]]] | None = None,
) -> bytes:
    """Fixture encoder: one Layer I frame per spec entry.  Each spec
    maps subband → (nb, scf_idx, 12 codes); unlisted subbands get
    allocation 0.  Mono by default; passing ``frame_specs_ch2``
    (parallel list, second channel) emits STEREO frames in the spec
    layout — allocation nibbles interleaved (sb-major, channel-minor),
    then scalefactors, then the 12 sample groups sb-major
    channel-minor.  Emits genuine header + payload, zero-padded to the
    exact frame length."""
    kbps = BITRATES[1][bitrate_idx]
    rate = SAMPLE_RATES[rate_idx]
    nch = 1 if frame_specs_ch2 is None else 2
    if frame_specs_ch2 is not None and len(frame_specs_ch2) != len(frame_specs):
        raise ValueError("mpeg encode: channel spec lists must align")
    frame_bytes = (12 * kbps * 1000 // rate) * 4
    out = bytearray()
    for f, spec in enumerate(frame_specs):
        chans = [spec] if nch == 1 else [spec, frame_specs_ch2[f]]
        for ch_spec in chans:
            for sb, (nb, scf_idx, codes) in ch_spec.items():
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
                (0x3 if nch == 1 else 0x0) << 6,  # single channel / stereo
            ]
        )
        bw = _BitWriter()
        for sb in range(32):
            for ch_spec in chans:
                bw.write(ch_spec[sb][0] - 1 if sb in ch_spec else 0, 4)
        for sb in range(32):
            for ch_spec in chans:
                if sb in ch_spec:
                    bw.write(ch_spec[sb][1], 6)
        for s in range(12):
            for sb in range(32):
                for ch_spec in chans:
                    if sb in ch_spec:
                        nb, _, codes = ch_spec[sb]
                        bw.write(codes[s], nb)
        out += hdr + bw.pad_to(frame_bytes - 4)
    return bytes(out)


#: 512-tap near-perfect-reconstruction pseudo-QMF prototype window,
#: float64 little-endian, base85.  Designed (NOT the bit-exact ISO
#: 11172-3 Annex B.3 table — this container carries no copy of the
#: spec, and reproducing 512 tabulated values from memory risks
#: silent unlocalizable PCM corruption) by the per-polyphase-branch
#: least-squares method in scripts/design_qmf_window.py: white-noise
#: round-trip SNR ≈ 78 dB, unity gain ±2e-6, delay exactly 481
#: samples (the ISO figure), worst per-phase impulse residual −63 dB.
#: Swapping in the ISO table is a one-constant change here.
PROTOTYPE_WINDOW_B85 = (
    "lf0(%9H_^>C@E~vH_^pDOPp`MH?74!e&<YchoQwjbasmlvq{B1iX}OAGlIlEieB@-el^2Bmf"
    "0fJ;%UJ?<etH+0-C-)=Y3uHpF6rfh`z=~1r@eFa$rHvM^dsr1hipt0r{;y@p$7Vfg7kkxLpM"
    "6{rjRmLPQfUHzb`t5Gx1q7J|#ZgTdmGTa1rBDz92%B6Ws7bDkoLd;x$yj@+;e=e&15YO&2m;"
    "w^JNSHC!zru1+=$uu<N4u5Sv7Wsaq4)|a`9LGgP>VILr0&%+{L&t}{lHWRc&aIxlQs)>382+"
    "!m`dXLNDMP-#60KeBGhNHR1xk+e=a<*M{8vvt=1s`HhxUYRn-lH6lDxq{8#3*_D4+-o*o5r9"
    "!XG_^OUvrMW31$;hzIDt%bqT05`*Nv8O|KA_RQeEWWQP6KIq!MpgkOoNRidP-o1*t)wa>T-7"
    "s5JD0|Mn=teR@{S3^$7HA0HDFMvBH8q7QFGSA1tdYQ_z*f<|N(jKJZ2RlJrn5yqZyMOX)T16"
    "}C;i*Lx18kE-oxL%JR_YGESurJi1K`sKpo@0Ak`kSm}%s`zvWRf`jF+mnz6NXySL`P8h|A}f"
    "*k0+@jUd@Z5rynLwD!4mL%=I$9mL|C*|<IpT-E^qjdDX04c0OV*&cUFx?JjO(OxnMm4I!7sd"
    "y_JPyRa%+cY#K0}eA428<RmdGpP)U(b$GZ%<<s7B{L-}&0f#VqqazFJCQYe)G$vUC!K+Uxv2"
    "<SG6%E8qP-q!9zdl)C&rzNa;+Usd`(Y37h)GG6ySOtJalR7CVXOU4%h%}wz>IAc}O7hml@<7"
    "N)sdNt`jhR<*sBc}ns^q`U^6>sG}@D+=ETPfx~Xw3Yc|BvWCBBgKEx@zn`BAd+j7P|00=t0l"
    "XX0!7?^arvk*aG)H<${R_Fq8T|G7p)Bj9mUcZ?K~{MmzyOBrtp!eT@S@@;l8Jja~*naxuC8*"
    "9r<h@Gm?5U~>;YIwFNnr}z^;XmxzD&zl)PIH<}#EuIQL=2Yg39xn<%aOGXV4b2BXPRXhH%O3"
    "<kh~C!0bnE{<3ZPqpY-jmCKJy6sXO{Oq*NfJN^7i{ak)d{0XYv9+V$+@l=I;qV_Q=FHIwTQ4"
    "m{q(i3&s^cs5wXa=D8X_?a^r1s^T9%Z6y4RB#$CL0cCINn!q(b{p|rUy^be8Y2LBm`NSzdW@"
    "B`VH@7Q4>)djXcwsF+^sQEviN-EJ7#(<!<?b&(C}%m4pmZ=l7UD!OI_5Ax{yN-ij$1K5Od{("
    "o!RawSCX))t!J{%i969Qt8Kg5m!eaL6GY~aDSjhzc$Wk{yOw-@@R?s>>cn##5+A}~uz9wV}h"
    "Ri@e%s(n-vB5w;B8@6!P`E%pkY)wW7_dM;#8H7>Go?U3oY(1~(v3hrf}&gMuTwxjln(FCNz6"
    "Y#dVrrp6M{ZJuy6nZ3DrD5(j9)7EY&(cK6U>?vWz%C8fX=QT>v&eLn_rl{xUN^Rt+aXx+pL|"
    "qM@}{SoY{Xx_G=es{0~891wV@O2`*K`<LA1L~;T@S?KtKcY*f4cDZ#KPrDSqrUYql?F}Noqz"
    "AkY5$h?xPK0_WC<QUU1W?D)Mocxos2-)?E$KPGtz#3*SP?(JjGX7;TYEyk==h~4KK(_%=o~G"
    "E3~5Tgh6Hon79LQ)N?7~bohnqnA%c5rrfOBcPjGmItJYS(M)5@NZ97=M{*DBYMW0!}(r2(5f"
    "&p8<(A`X)#AjT;PMI93y2D++r2*#b4i#U&%y3vJODkZ%NJXb&<-uUTl1xlPrA}eLOAv#T&e3"
    "7NpyAIn&q`vy_Wz83k+@>Nj8v)V#~EY4%BA;j@SbA7=c3X>hOuM6T;pZK@#SN`YWYvjlL=(M"
    "fV;j+q#I<v1Guv>SQ})&%J#&E)dyt1pymCWA>d=bxqm$ryrN^jUIX|b!%Snp<~YqtPuya^xE"
    "Qts%}rvz%0~2dd7NRt#xaCzm%d=Xev%Sjg=}BH+MSVz$s=9AVT(YpV6s}jGABD}y>D2*jwkN"
    "vX4F-`9m?d?6#r7cv3MdvT=Y-BzK6{5u53xa92KX+Q)@!MX97<=r=>N&l;^WLvw9Z4zSfoo5"
    ">qBW3Ula?0?9l-?wqnXQKLscJd5f@;iynQ$QiLSWw%v7YuPtX*85sNtT^I65jtQ$0R4=3A*^"
    "CQ6^6x>%KBwLe8`|yYW!$F_sEvoKN4&|wrIu$;yQ0X_B=3jfI4wMB!b=a&EIlA6?nt!VU2V@"
    "vR&iM97J|M6gQ_^ya0GVT)bo>C&qa{JdikRvxj>>`D?V#U`c&HtCUzpHuru%GG9pwC}4m;{5"
    "MxzG+co{(8IAm;e>)eRE1`1*>QtE?hkqGJzIo7_(KA7(LsejK3hE!(JF>Na=PFLs}6@hNn3@"
    "-T=IuMh;bf2Qpt!v7;t@CxtxhV<V-ewByfs9#*aKUTtACHQiS}J=?IKJ;=7S6eawtMwo=ccr"
    "iqO|V!)%o@IQ_}P4;25>F$m{O@ZpAubz)T<X+wNpBj)qAoERK?q!fa8jWvj)~t{}Q@OeaI`5"
    "D_;5iu*4lR*CDEj6TcxI75_ToIsCY+H!U{XOhTF;R`vbVJ8Uj30jJ*--sbt#fRm^Ocvgh`S="
    "_+R7O&0>;2v?N~Afn}0En1D3Uv~H3={!26}jd7Acx+^P5>td2W#F|73)n$@D9LW3t+gg%8Xp"
    "vkl4oH$e%m0L~LN<~=@nT_BMH`YovUV%D&Ha%-A|=!^iO!KfqWWu7iky)@NRglvOlpxo^6MA"
    "ZurrZA?9#@*;`fk0OBO!SIJb~Lu+{)b<#CWd%?VcN6ey5CCMnJD>$8tPb)0;7jT?_YpuEn%D"
    "PxX5U^yQff3J-{0C7)<>hz31lGI-q=rfEzMI19m_H2tkTo%D%k)Vn{aIgnl9M6eALffc7mH3"
    "E1mLcCQZW@R`ykbUIoHU0&)N0|q`A&vEa`IF3g=U36=$#|s2$h6CJsCFer?rDWhx$VJAI*Y4"
    "2Dtps<KBTk1U59qrPqKz-h3!QJK29fzX-9JIv0LFYN3(uW)XZpI&yKA5;}T6J7iahy*+q8{S"
    "xU|l+$)Uj34V->11_3p<%M5ZMt(mFn<QE%@1-vkYb~Sd2w(*!Q|V^&be(rYY+fI2&8I1{sQ|"
    "_dZK4P-9z#^54L1K%bU{GKy6_^G_c#+@;_cbWWzxokMCGNVh=Q8S<X{G<Af9cHndGYB-N5yH"
    "xxua6zJtWQw%jfB>Q?9f%54-BuyEsU7|L>I8PA(w(~~6GzYb$AY@X%<d~vk-WgWEmU?EX+!a"
    "~BsFIs1baYg|idOyfwi8vqg`#{X-Z@vl`_ayX;X_%!vrXkkvbtQqp9b6-Y}a1Dit+PqPfcLI"
    "z>Q|*c}`)!%cMJzDPCc}HsAR1`hsD<YTZ7t9XMjYdweR%pjcwRuA8L0`hjA<AjOd(QjTK3LI"
    "F-t^o(M^m~msC_IqN#nH?k)1zTdjTuz*hl`3Mt509eNVC!MOtZC=+K<;3_q^yzen?hl~5TU{"
    "LC)r@Xtv%aJ=wM*K5@ImHwy$5m%BfuIL~vfe2W2NfN#0z)^5tbZ$%0zH@rs*4m~vLX1qRPZL"
    "H$v`n^LS?1!P9QKH(gYdeuO`+BhJI(l9!|7BT=8GJR3M?i_W^H;_}mp0&osqoY#4azrzgRc="
    "wg{I>`5$E!%cw;YlH#UMn#21vD0&AvdtEqJ>aGcz&2&(E0t5py!XrdZNk4*V&<==!XE5oRL4"
    "w~n+SVm>Xu=cpvfyObusMcMI6YK<Si7mj}lT&EJhWFGJl33B(o26-M!p;P-l8s?rYs&5lN^!"
    "LLcQv@JC+1%gAa!d|Cy7ah=W}7TO{%vnyuv;-d>K%|Q(mpglFcOsdncy}*$AG&?04g~@+7&s"
    "Zlj1r*sJIa~WD`3-h@umiO9?hVU_l>3n}aexl+(iI1#ToiDd@6W8X*Qhjy~hO^0?_fJbPSjK"
    "(9AHloaC90%trwa=cUPpiewMru0LZJFh!GoHPdq`}HzECVN{gD||3NhS3LHv*#^85ip)Ai}M"
    "~o(&)~G3Zf)G`nw-CHQ^yY2~_`QwVfb8Aa5{v?|>{nBBmqN7#l1<lHb!9$W1FhN6<JAmVYWg"
    "47^zlnr<mS;Fog$ei0}?k$%X8j$S4|_}~ffP(ma>9L0CV4<j!>$?n3v9yJ|5_7~T=azz$D`r"
    "~+<@Q)2Yo9ofZKi~U4O4nn{G7Zwcvg=yOUN!^2P`K6C0c8=tp3Rc4FnkHW$SsvGc0Lxr0%a4"
    "%EWsYX*o%qfw_5nVgFXt5mofLgO8=pqh=~HfOLqwhr$gaBB`@M?Q_cTA3dg~kwr&eQ5qzA0^"
    "e_!S7+sWR4P*#EmA~s5vXKQpG%OP_Sts>A76*-zGcf%=e0_thXms{ITjPNbAY}GF>*!pMj3f"
    "9yg6h&9T`l%L6gf}pk7e>czKE4ORDte3Z0UUX+au{d`lLXucFyEJdLb+MoX6ol{r+AUCzs$p"
    "^dcd0rw0hXoP>CYms#dMxQU$5ZW8W3CIi22f_L;jXqR{4c0~I=z~r=6NTvZl#B0D~F);=|te"
    "FrKq!0=}`fMxivMvNaVP}AO{9pw?XdSTsap(p=Z<@<{xBB5evvp?1h=JZdlx{t!YK{Rvfn=8"
    "D9xd)ZJ&ojru}pwIKK^_vAsO<%r?7F1132@(uW$RKO2+KIP4pbkcf#ks_%<3;G4<5GZZ*yVT"
    "Ls^~u7y*3ZZgWgFf;Iu)_TIepog0y-kIaR)KN8uMu6nL1FSEUuRi0x2Bk!be^%nY0+i25<{R"
    "O@7dGhv1ohs&F0cI1RLa`EY^In2FsaqP_}{ZyglO|V9D?c!2_wV4Qt%N7@WidYDod8v;>nUe"
    "G`KsaX$-SI+<vq@LVUbF1-Tt|As)d#)P)?F*>b@?!CJ{H%>|miY*?Y@#Dn5KX;w7&&C=dJ!l"
    "vs>tgpVlP;0bh1a@aWI<Ye(7h>VQ=uLroMj7Y6itTV)KEUR_c8#2e&TQPiD7_l}^XR?4pc)^"
    "5T@RhUy0*YsDG^~ldZMX01cI18;xF^jA|a$ca}P$h+hC|Zgpzn~i0-sL*4dug%bturw(j=%y"
    "MlK<v(pMgU4Mi=z%#_@VKRX}y1eI~avOd=w2q$~&<%b*YUOgYMKpmvuylm@sbYpc+sNDC@K>"
    "=u@P4}P_^FpZ6jm2IY*?W_bs;>=<Ef}V7Ntilx#+My`>>yKt!%bFCaa{3>e;+Lq{SOL&xFA~"
    "oKmrT_CCEnq$1oeBw}tp5?@(U_oJUa#6&~j?4hGR|72QP-6o7aj7?&&3Wv%*^o+eCh04c1+>"
    "X2=HzmV9"
)

#: Reconstruction delay of the analysis→synthesis cascade, in PCM
#: samples — identical to the ISO filterbank's figure.
FILTERBANK_DELAY = 481

_NMAT = np.cos(
    (16 + np.arange(64))[:, None] * (2 * np.arange(32) + 1)[None, :] * np.pi / 64
)
_MMAT = np.cos(
    (2 * np.arange(32) + 1)[:, None] * (np.arange(64) - 16)[None, :] * np.pi / 64
)


def prototype_window_sha256() -> str:
    """Pin for the embedded window bytes (tests/test_codecs.py)."""
    return "062a2da39f17c1daee7d5f7f00e904595538f45f21d16ef0e31b0b5bce313c9d"


def prototype_window() -> np.ndarray:
    """The embedded 512-tap prototype (see PROTOTYPE_WINDOW_B85)."""
    import base64

    h = np.frombuffer(
        base64.b85decode(PROTOTYPE_WINDOW_B85), dtype="<f8"
    ).astype(np.float64)
    if h.shape != (512,):
        raise ValueError("mpeg: corrupt embedded prototype window")
    return h


def _signed(h: np.ndarray) -> np.ndarray:
    """ISO window-table convention: the buffer flowcharts fold the
    cosine's 64-sample anti-periodicity into the window, so the stored
    C/D tables are the prototype with alternate 64-blocks negated."""
    return h * np.where((np.arange(512) // 64) % 2 == 0, 1.0, -1.0)


def analyze_pcm(x: np.ndarray, window: np.ndarray | None = None) -> np.ndarray:
    """PCM → subband analysis per the ISO 11172-3 §C.1.3 flowchart:
    shift 32 samples into X (newest at X[0]), window with C, fold to
    64, matrix with M[k][i] = cos((2k+1)(i−16)π/64).  Returns
    float64 [n_groups, 32]; len(x) must be a multiple of 32."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 1 or len(x) % 32:
        raise ValueError("mpeg: analyze_pcm needs 1-D PCM, length % 32 == 0")
    C = _signed(prototype_window() if window is None else window)
    ngr = len(x) // 32
    # Vectorized form of the flowchart's rolling X buffer: at group g,
    # X[i] = x(32g + 31 − i)  ⇒  X_g = reverse(xp[32g : 32g+512]) with
    # xp zero-padded by 480 on the left.  One strided view + one
    # einsum replaces the per-group Python loop (the loop was the
    # bench hot spot at 1000 docs/task — round 7).
    xp = np.concatenate([np.zeros(480), x])
    X = np.lib.stride_tricks.sliding_window_view(xp, 512)[::32][:ngr, ::-1]
    Y = (X * C).reshape(ngr, 8, 64).sum(axis=1)
    return Y @ _MMAT.T


def synthesize_subbands(
    S: np.ndarray, window: np.ndarray | None = None
) -> np.ndarray:
    """Subband groups → PCM per the ISO 11172-3 §A.2 flowchart: shift
    V by 64, matrix with N[i][k] = cos((16+i)(2k+1)π/64), extract U,
    window with D, fold 16×32.  D = 4·32·prototype·σ so the
    analysis→synthesis cascade has unity gain (measured 1±2e-6)."""
    S = np.asarray(S, dtype=np.float64)
    if S.ndim != 2 or S.shape[1] != 32:
        raise ValueError("mpeg: synthesize_subbands needs [n_groups, 32]")
    D = 128.0 * _signed(prototype_window() if window is None else window)
    ngr = S.shape[0]
    # Vectorized form of the flowchart's rolling V buffer.  The
    # matrixed block at group g is VB[g] = N·S[g]; the V buffer at
    # group g holds blocks [g, g−1, …, g−15] (newest first), and the
    # U extraction picks U[64i+j] = block(g−2i)[j],
    # U[64i+32+j] = block(g−2i−1)[32+j] — 16 slice assignments over
    # [G, 32] views replace the per-group Python loop.
    VB = S @ _NMAT.T                      # [G, 64]
    VBp = np.vstack([np.zeros((16, 64)), VB])  # index g−b → VBp[16+g−b]
    g_idx = np.arange(ngr)
    U = np.empty((ngr, 512))
    for i in range(8):
        U[:, 64 * i : 64 * i + 32] = VBp[16 + g_idx - 2 * i, 0:32]
        U[:, 64 * i + 32 : 64 * i + 64] = VBp[16 + g_idx - 2 * i - 1, 32:64]
    return (U * D).reshape(ngr, 16, 32).sum(axis=1).reshape(-1)


def synthesize_pcm(frames: list[Layer1Frame]) -> np.ndarray:
    """Dequantized Layer I frames → PCM, float64 [n_samples, channels].

    The matrixing cosines are closed-form; the prototype window is the
    embedded near-perfect-reconstruction design (PROTOTYPE_WINDOW_B85
    — round-trip SNR ≈ 78 dB, NOT the bit-exact ISO Annex B.3 table,
    so third-party streams decode with ~−60 dB extra error and
    bit-exactness vs reference decoders is not claimed)."""
    if not frames:
        raise ValueError("mpeg: no frames to synthesize")
    nch = frames[0].header.channels
    S = np.concatenate([fr.subbands for fr in frames], axis=0)  # [12F, 32, nch]
    return np.stack(
        [synthesize_subbands(S[:, :, ch]) for ch in range(nch)], axis=1
    )
