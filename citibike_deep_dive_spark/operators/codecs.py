"""REAL compressed-media codecs in pure stdlib + numpy: GIF (LZW),
baseline JPEG (ITU-T T.81), and AVI/MJPEG video encode/decode — no
codec libraries.

These close the image and MJPEG-video entries of the documented stub
surface in ``operators/multimodal.py`` ("JPEG/GIF pixels ... video
frames ... remain STUBBED"): all three formats are fully specified
public documents (GIF89a specification; ITU-T T.81 / ISO 10918-1
Annex F baseline sequential DCT; Microsoft RIFF AVI) and need no
native library — GIF is LZW over palette indices (exact, lossless
roundtrip), JPEG is DCT + quantization + canonical Huffman (lossy;
decode is exact w.r.t. the bit stream, the loss is quantization by
construction), and MJPEG video is 'every frame is a JPEG' inside a
RIFF container. Progressive JPEG (SOF2: spectral selection +
successive approximation, T.81 Annex G) is fully decoded too, and the
progressive ENCODER emits the classic scan script (2-pass DC, banded
AC with refinement scans) so the grammar is roundtrip-tested.
ARITHMETIC-coded JPEG (SOF9/SOF10, the T.81 Annex D QM-coder) decodes
AND encodes, interop-verified against libjpeg-turbo fixtures; MS-RLE8
(BI_RLE8) adds a real INTER-frame video codec (delta chunks +
canvas-carrying skip codes). Only MP3/AAC audio, modern
motion-compensated video codecs (H.264/VP9), and lossless/hierarchical
JPEG remain genuinely codec-library-bound and stay stubbed.

Scale/shape notes: both decoders are per-payload pure functions used
inside Arrow-batched ``mapInPandas`` operators (see multimodal.py), so
the cost is embarrassingly data-parallel with zero shuffle — identical
to the BMP/PNG/WAV paths. The encoders exist to synthesize test
payloads and to keep ``resize_payload`` container-preserving.

Reference-parity note: the reference repo has no media decode at all;
this module belongs to the training-data-pipeline extension surface
(multimodal columns), not to reference parity.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# GIF — LZW codec (GIF89a specification, CompuServe 1990; public spec)
# ---------------------------------------------------------------------------

_GIF_MAX_CODE = 1 << 12  # LZW code width is capped at 12 bits


class _BitWriterLSB:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the code width when the
    next free code no longer fits, emits CLEAR + resets at the 4096-entry
    cap, terminates with END — the exact stream shape every GIF reader
    expects (deferred-clear streams are legal but we always clear)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = _BitWriterLSB()

    def fresh():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = fresh()
    out.write(clear, code_size)
    prefix: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        cand = prefix + (k,)
        if cand in table:
            prefix = cand
            continue
        out.write(table[prefix], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        prefix = (k,)
        if next_code == _GIF_MAX_CODE + 1:
            out.write(clear, code_size)
            table, next_code, code_size = fresh()
    if prefix:
        out.write(table[prefix], code_size)
    out.write(end, code_size)
    return out.flush()


def _lzw_decompress(data: bytes, min_code_size: int, limit: int):
    """Inverse of the GIF LZW stream: canonical table-rebuild decode with
    the KwKwK case (code == next free code), code-width growth when the
    table reaches the current width's capacity, and the 4096 cap (stop
    adding, keep decoding, until CLEAR). Returns a list of palette
    indices or None on a malformed stream."""
    clear = 1 << min_code_size
    end = clear + 1
    acc = nbits = pos = 0
    out: list[int] = []
    table: list[tuple[int, ...]] = []
    code_size = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset():
        nonlocal table, code_size, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        code_size = min_code_size + 1
        prev = None

    reset()
    while len(out) < limit:
        while nbits < code_size:
            if pos >= len(data):
                return out if out else None  # tolerate missing END
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            return None
        out.extend(entry)
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _sub_blocks(body: bytes) -> bytes:
    """Split an LZW byte stream into <=255-byte GIF sub-blocks."""
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """REAL GIF89a writer, stdlib+numpy: (H, W, 3) uint8 RGB with at
    most 256 distinct colors -> a complete single-frame GIF (global
    color table, real LZW compression, optional interlace). The
    synthesis half of the codec — ``decode_gif_pixels`` must invert it
    bit-for-bit (GIF is lossless), which the roundtrip tests pin."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    packed = (
        px[:, :, 0].astype(np.int64) << 16
        | px[:, :, 1].astype(np.int64) << 8
        | px[:, :, 2].astype(np.int64)
    ).reshape(-1)
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF supports <=256 colors, got {len(colors)}")
    # color-table size field: table holds 2^(n+1) entries
    n = max(1, (len(colors) - 1).bit_length()) - 1
    table_len = 1 << (n + 1)
    gct = bytearray()
    for c in colors:
        gct.extend((int(c) >> 16 & 0xFF, int(c) >> 8 & 0xFF, int(c) & 0xFF))
    gct.extend(b"\x00" * (3 * (table_len - len(colors))))
    min_code_size = max(2, (len(colors) - 1).bit_length())
    idx = inverse.reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    body = _lzw_compress(idx.reshape(-1), min_code_size)
    lsd_packed = 0x80 | (7 << 4) | n  # GCT present, 8-bit color resolution
    img_packed = 0x40 if interlace else 0
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, lsd_packed, 0, 0)
        + bytes(gct)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, img_packed)
        + bytes([min_code_size])
        + _sub_blocks(body)
        + b"\x3b"
    )


def decode_gif_pixels(payload: bytes):
    """REAL GIF pixel decode, stdlib+numpy: header + logical screen ->
    global/local color table -> LZW decode of the first image frame
    (skipping extension blocks) -> de-interlace if flagged -> palette
    lookup -> (H, W, 3) uint8 RGB. Frames smaller than the logical
    screen are composited onto the background color. Returns None for
    anything malformed or outside the single-frame-decode contract
    (no color table, truncated stream) — those fall back to
    ``decode_stub``. Animated GIFs decode to their first frame."""
    import numpy as np

    if len(payload) < 14 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct = None
        if packed & 0x80:
            size = 1 << ((packed & 7) + 1)
            gct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * size, offset=pos
            ).reshape(size, 3)
            pos += 3 * size
        while pos < len(payload):
            block = payload[pos]
            if block == 0x21:  # extension: label byte + sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                left, top, iw, ih, ipacked = struct.unpack(
                    "<HHHHB", payload[pos + 1 : pos + 10]
                )
                pos += 10
                ct = gct
                if ipacked & 0x80:
                    size = 1 << ((ipacked & 7) + 1)
                    ct = np.frombuffer(
                        payload, dtype=np.uint8, count=3 * size, offset=pos
                    ).reshape(size, 3)
                    pos += 3 * size
                if ct is None or iw == 0 or ih == 0:
                    return None
                min_code_size = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    data.extend(payload[pos + 1 : pos + 1 + ln])
                    pos += 1 + ln
                if min_code_size < 2 or min_code_size > 11:
                    return None
                idx = _lzw_decompress(bytes(data), min_code_size, iw * ih)
                if idx is None or len(idx) < iw * ih:
                    return None
                grid = np.asarray(idx[: iw * ih], dtype=np.int64).reshape(ih, iw)
                if ipacked & 0x40:  # interlaced: invert the pass order
                    order = _interlace_order(ih)
                    de = np.empty_like(grid)
                    de[order] = grid
                    grid = de
                if np.any(grid >= len(ct)):
                    return None
                frame = ct[grid]
                if (left, top, iw, ih) == (0, 0, w, h):
                    return np.ascontiguousarray(frame)
                canvas = np.zeros((h, w, 3), dtype=np.uint8)
                if gct is not None and bg < len(gct):
                    canvas[:, :] = gct[bg]
                canvas[top : top + ih, left : left + iw] = frame[
                    : max(0, h - top), : max(0, w - left)
                ]
                return canvas
            elif block == 0x3B:
                return None  # trailer before any image frame
            else:
                return None
    except (IndexError, ValueError, struct.error):
        return None
    return None


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU-T T.81 / ISO 10918-1; public spec)
# ---------------------------------------------------------------------------

# Annex K.1 example quantization tables (the de-facto standard ones),
# scaled by the libjpeg quality formula in _quant_tables().
_JPEG_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32


def _zigzag_positions() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in JPEG zigzag order, generated from
    the anti-diagonal walk (even diagonals ascend, odd descend) rather
    than hardcoded — the generator is verifiable against the spec's
    first entries (0,0)(0,1)(1,0)(2,0)(1,1)(0,2)..."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append((r, s - r))
    return out


_ZIGZAG = _zigzag_positions()


def _dct_matrix():
    """Orthonormal 8x8 DCT-II basis M[u, x] = c(u)/2 * cos((2x+1)u pi/16):
    forward F = M f M^T, inverse f = M^T F M (T.81 A.3.3)."""
    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _quant_tables(quality: int):
    """libjpeg quality scaling: 1..100 -> per-entry scaled Annex K
    tables clipped to [1, 255]."""
    import numpy as np

    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_LUMA_Q, _JPEG_CHROMA_Q):
        t = [(min(255, max(1, (v * scale + 50) // 100))) for v in base]
        out.append(np.array(t, dtype=np.int64).reshape(8, 8))
    return out


# Writer-side Huffman tables. Any tables satisfying the canonical-code
# constraints are legal JPEG (they are carried in DHT and the reader
# builds its decoder from the stream) — we use simple fixed-width
# canonical tables: 12 DC categories at 4 bits, 162 AC symbols at 8
# bits. Suboptimal compression, trivially correct, and keeps the
# entropy coder honest because the READER path is fully generic (it
# decodes any spec-valid DHT, including the Annex K tables real-world
# encoders emit).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriterMSB:
    """JPEG entropy data is MSB-first with 0x00 stuffing after 0xFF."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, size: int) -> None:
        self.acc = (self.acc << size) | (value & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1 bits (F.1.2.3)


def _amplitude(v: int) -> tuple[int, int]:
    """(size category, appended bits): negatives use the T.81
    ones-complement convention."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(out: _BitWriterMSB, coefs, pred: int) -> int:
    """Huffman-encode one quantized 8x8 block (zigzag, DC diff, AC
    run-length with ZRL/EOB). Returns the new DC predictor."""
    zz = [int(coefs[r][c]) for r, c in _ZIGZAG]
    diff = zz[0] - pred
    s, bits = _amplitude(diff)
    code, ln = _DC_CODES[s]
    out.write(code, ln)
    if s:
        out.write(bits, s)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_CODES[0xF0]
            out.write(code, ln)
            run -= 16
        s, bits = _amplitude(v)
        code, ln = _AC_CODES[(run << 4) | s]
        out.write(code, ln)
        out.write(bits, s)
        run = 0
    if run:
        code, ln = _AC_CODES[0x00]
        out.write(code, ln)
    return zz[0]


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + bits + vals)


def rgb_to_ycbcr(px):
    """JFIF full-range color transform (floats; caller rounds)."""
    import numpy as np

    f = px.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def encode_jpeg(
    pixels, quality: int = 90, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """REAL baseline JFIF writer, stdlib+numpy: (H, W, 3) uint8 RGB ->
    a complete JPEG (APP0, DQT x2, SOF0, DHT x4, optional DRI, SOS,
    entropy-coded scan with 0xFF stuffing and restart markers). 4:4:4
    by default; ``subsample=True`` emits 4:2:0 (2x2 box-mean chroma).
    Lossy by construction (quantization) — roundtrip tests bound the
    error instead of pinning bits."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    y, cb, cr = rgb_to_ycbcr(px)
    qt = _quant_tables(quality)
    dct = _dct_matrix()
    max_h = max_v = 2 if subsample else 1
    mcu_px = 8 * max_h
    pad_w = (w + mcu_px - 1) // mcu_px * mcu_px
    pad_h = (h + mcu_px - 1) // mcu_px * mcu_px

    def pad(plane):
        return np.pad(plane, ((0, pad_h - h), (0, pad_w - w)), mode="edge")

    y = pad(y)
    cb, cr = pad(cb), pad(cr)
    if subsample:
        cb = cb.reshape(pad_h // 2, 2, pad_w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(pad_h // 2, 2, pad_w // 2, 2).mean(axis=(1, 3))
    comps = [  # (plane, h_i, v_i, quant table index)
        (y, max_h, max_v, 0),
        (cb, 1, 1, 1),
        (cr, 1, 1, 1),
    ]

    out = _BitWriterMSB()
    preds = [0, 0, 0]
    mcus_x, mcus_y = pad_w // mcu_px, pad_h // mcu_px
    n_mcu = 0
    rst = 0
    chunks: list[bytes] = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                out.pad_to_byte()
                chunks.append(bytes(out.buf))
                chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                out = _BitWriterMSB()
                preds = [0, 0, 0]
            for ci, (plane, hi, vi, tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        block = plane[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                        coefs = np.round((dct @ block @ dct.T) / qt[tq]).astype(
                            np.int64
                        )
                        preds[ci] = _encode_block(out, coefs, preds[ci])
            n_mcu += 1
    out.pad_to_byte()
    chunks.append(bytes(out.buf))
    entropy = b"".join(chunks)

    zz_q = [
        bytes([tq]) + bytes(int(qt[tq][r][c]) for r, c in _ZIGZAG)
        for tq in (0, 1)
    ]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, (_, hi, vi, tq) in enumerate(comps, start=1):
        sof += bytes([cid, (hi << 4) | vi, tq])
    sos = bytes([3])
    for cid in (1, 2, 3):
        td_ta = 0 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    head = (
        b"\xff\xd8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _marker(0xDB, zz_q[0])
        + _marker(0xDB, zz_q[1])
        + _marker(0xC0, sof)
        + _marker(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
        + _marker(0xC4, _dht_body(1, 0, _AC_BITS, _AC_VALS))
        + _marker(0xC4, _dht_body(0, 1, _DC_BITS, _DC_VALS))
        + _marker(0xC4, _dht_body(1, 1, _AC_BITS, _AC_VALS))
    )
    if restart_interval:
        head += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    return head + _marker(0xDA, sos) + entropy + b"\xff\xd9"


class _SegBits:
    """Windowed MSB-first bit reader over one UNSTUFFED entropy segment
    (0xFF00 -> 0xFF already applied). Reads past the end are fed up to
    four 0xFF pad bytes (the spec pads with 1-bits); needing more is a
    truncated stream and raises EOFError."""

    __slots__ = ("data", "n", "pos", "acc", "nbits", "padded")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.padded = 0

    def _need(self, n: int) -> None:
        while self.nbits < n:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.padded += 1
                if self.padded > 4:
                    raise EOFError
                self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def peek16(self) -> int:
        self._need(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._need(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def decode(self, tab) -> int:
        """Canonical Huffman decode (T.81 F.2.2.3 shape): one 16-bit
        peek, then length-indexed maxcode range tests. A scan that
        references a table no DHT defined reaches here with tab=None —
        that is a malformed stream, not a crash: ValueError routes it
        to the decoder's None/stub fallback."""
        if tab is None:
            raise ValueError("scan references an undefined Huffman table")
        code16 = self.peek16()
        maxcode, mincode, valptr, vals = tab[0], tab[1], tab[2], tab[3]
        for length in range(1, 17):
            c = code16 >> (16 - length)
            if c <= maxcode[length]:
                self.skip(length)
                return vals[valptr[length] + c - mincode[length]]
        raise ValueError("invalid Huffman code")


def _decode_tables(bits: list[int], vals: list[int]):
    """Build the canonical (maxcode, mincode, valptr, vals) arrays the
    fast decoder walks, plus a 256-entry prefix LUT (fast_len,
    fast_val) covering every code of <= 8 bits — the libjpeg-style
    first-level table the sequential hot loop hits for virtually every
    symbol. maxcode[l] = -1 marks an empty length. The LUT is exact:
    for a canonical table the first length whose maxcode admits the
    peeked prefix is always >= its mincode, so filling
    [mincode, maxcode] ranges in increasing length order reproduces
    the F.2.2.3 walk bit-for-bit; codes longer than 8 bits leave
    fast_len at 0 and fall back to that walk."""
    maxcode = [-1] * 17
    mincode = [0] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    vals = list(vals)
    fast_len = [0] * 256
    fast_val = [0] * 256
    try:
        for length in range(1, 9):
            if maxcode[length] >= 0:
                shift = 8 - length
                for c in range(mincode[length], maxcode[length] + 1):
                    v = vals[valptr[length] + c - mincode[length]]
                    for i in range(c << shift, (c + 1) << shift):
                        if fast_len[i] == 0:  # walk returns the SHORTEST
                            fast_len[i] = length  # match on (malformed)
                            fast_val[i] = v  # overlapping tables

    except IndexError:
        # truncated DHT (sum(bits) > len(vals)): keep the old lazy
        # behavior — the slow walk only faults if the stream actually
        # references the missing code
        fast_len = [0] * 256
        fast_val = [0] * 256
    return maxcode, mincode, valptr, vals, fast_len, fast_val


def _split_entropy_segments(payload: bytes, pos: int):
    """Slice the post-SOS byte stream into restart-delimited segments
    with 0xFF00 stuffing removed — one segment per restart interval
    (a single segment when DRI is absent). Returns (segments, end)
    where end is the offset of the terminating marker's 0xFF (so a
    multi-scan progressive walk can resume there)."""
    segments: list[bytes] = []
    start = pos
    i = pos
    n = len(payload)
    find = payload.find
    while True:
        # jump straight to the next 0xFF (C-level scan) instead of
        # walking byte-by-byte in Python; search stops at n-2 so a
        # trailing lone 0xFF falls through like the old `i + 1 < n`
        i = find(0xFF, i, n - 1)
        if i < 0:
            break
        nxt = payload[i + 1]
        if nxt == 0x00:
            i += 2
            continue
        segments.append(payload[start:i].replace(b"\xff\x00", b"\xff"))
        if 0xD0 <= nxt <= 0xD7:
            i += 2
            start = i
            continue
        return segments, i  # EOI or another marker: scan data ends here
    segments.append(payload[start:].replace(b"\xff\x00", b"\xff"))
    return segments, n


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits back to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _prog_block(rd, comp, coef, ss, se, ah, al, dc_tab, ac_tab, state) -> None:
    """Decode ONE block's contribution from one progressive scan into
    its persistent zigzag coefficient list (T.81 G.2: DC first /
    DC refinement / AC first with EOB runs / AC refinement with
    correction bits)."""
    kstart = ss
    if ss == 0:
        if ah == 0:
            s = rd.decode(dc_tab)
            diff = _extend(rd.receive(s), s) if s else 0
            comp["pred"] += diff
            coef[0] = comp["pred"] << al
        elif rd.receive(1):
            coef[0] |= 1 << al
        if se == 0:
            return  # progressive DC scan (spec: Se == 0)
        kstart = 1  # sequential scan: continue into the AC band
    if ah == 0:  # AC first pass over the band
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = kstart
        while k <= se:
            sym = rd.decode(ac_tab)
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << run) - 1
                if run:
                    state["eobrun"] += rd.receive(run)
                break
            k += run
            if k > se:
                raise ValueError("AC run past band end")
            coef[k] = _extend(rd.receive(size), size) << al
            k += 1
        return
    # AC refinement (G.2.2.3): correction bits for known coefficients,
    # newly-significant coefficients appear at +-(1<<al)
    p1 = 1 << al
    m1 = -p1
    k = kstart
    if state["eobrun"] == 0:
        while k <= se:
            sym = rd.decode(ac_tab)
            run, size = sym >> 4, sym & 0xF
            newval = 0
            if size == 0:
                if run != 15:
                    # refinement EOBRUN counts the CURRENT block too —
                    # the tail-refine step below consumes one (unlike
                    # the first-pass convention above)
                    state["eobrun"] = 1 << run
                    if run:
                        state["eobrun"] += rd.receive(run)
                    break
            else:
                if size != 1:
                    raise ValueError("refinement size must be 1")
                newval = p1 if rd.receive(1) else m1
            while k <= se:
                if coef[k] != 0:
                    if rd.receive(1) and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if k <= se and newval:
                coef[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0 and rd.receive(1) and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


# bit masks / sign-extension thresholds indexed by width — shared by the
# fast sequential scan loop so no (1 << n) - 1 is rebuilt per symbol
_JMASK = tuple((1 << i) - 1 for i in range(288))
_JHALF = (0,) + tuple(1 << (i - 1) for i in range(1, 288))


def _decode_scan_seq_fast(
    payload, pos, scan_comps, htabs, restart_interval, mcus_x, mcus_y
):
    """Sequential-scan (ss=0, se=63, ah=al=0) entropy decode with the
    bit reader inlined into locals and the 8-bit Huffman LUT from
    ``_decode_tables`` — semantically identical to running
    ``_prog_block`` per block (same EOFError 0xFF-pad budget, same
    malformed-stream ValueErrors, same EOB-run carry), but one tight
    loop instead of ~8 method calls per symbol. This is the MJPEG /
    baseline-JPEG hot path: ~95% of decode time was the per-symbol
    Huffman walk (guide §4's per-payload constant)."""
    segments, end = _split_entropy_segments(payload, pos)
    nc = len(scan_comps)
    plan = []
    for c in scan_comps:
        dtab = htabs.get((0, c.get("td", 0)))
        atab = htabs.get((1, c.get("ta", 0)))
        plan.append(
            (
                dtab,
                dtab[4] if dtab is not None else None,
                dtab[5] if dtab is not None else None,
                atab,
                atab[4] if atab is not None else None,
                atab[5] if atab is not None else None,
            )
        )
    # flatten the scan's block order once: a list of (component index,
    # zigzag coefficient list) per MCU / per data unit
    if nc > 1:
        unit_blocks = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                ub = []
                for ci, c in enumerate(scan_comps):
                    grid, v, hh = c["coef"], c["v"], c["h"]
                    for by in range(v):
                        row = grid[my * v + by]
                        for bx in range(hh):
                            ub.append((ci, row[mx * hh + bx]))
                unit_blocks.append(ub)
    else:
        c0 = scan_comps[0]
        grid = c0["coef"]
        unit_blocks = [
            [(0, grid[br][bc])]
            for br in range(c0["bh"])
            for bc in range(c0["bw"])
        ]
    for c in scan_comps:
        c["pred"] = 0

    MASK = _JMASK
    HALF = _JHALF
    preds = [0] * nc
    data = segments[0]
    dn = len(data)
    dp = 0
    acc = 0
    nb = 0
    padded = 0
    eobrun = 0
    seg_idx = 0
    n_unit = 0
    for ub in unit_blocks:
        if restart_interval and n_unit and n_unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            data = segments[seg_idx]
            dn = len(data)
            dp = 0
            acc = 0
            nb = 0
            padded = 0
            eobrun = 0
            preds = [0] * nc
        n_unit += 1
        for ci, coef in ub:
            dtab, dfl, dfv, atab, afl, afv = plan[ci]
            if dtab is None:
                raise ValueError("scan references an undefined Huffman table")
            # ---- DC symbol
            while nb < 16:
                if dp < dn:
                    acc = (acc << 8) | data[dp]
                    dp += 1
                else:
                    padded += 1
                    if padded > 4:
                        raise EOFError
                    acc = (acc << 8) | 0xFF
                nb += 8
            L = dfl[(acc >> (nb - 8)) & 0xFF]
            if L:
                s = dfv[(acc >> (nb - 8)) & 0xFF]
            else:
                code16 = (acc >> (nb - 16)) & 0xFFFF
                dmax, dmin, dvp, dvals = dtab[0], dtab[1], dtab[2], dtab[3]
                for L in range(1, 17):
                    c16 = code16 >> (16 - L)
                    if c16 <= dmax[L]:
                        s = dvals[dvp[L] + c16 - dmin[L]]
                        break
                else:
                    raise ValueError("invalid Huffman code")
            nb -= L
            acc &= MASK[nb]
            if s:
                while nb < s:
                    if dp < dn:
                        acc = (acc << 8) | data[dp]
                        dp += 1
                    else:
                        padded += 1
                        if padded > 4:
                            raise EOFError
                        acc = (acc << 8) | 0xFF
                    nb += 8
                nb -= s
                v = (acc >> nb) & MASK[s]
                acc &= MASK[nb]
                pred = preds[ci] + (v if v >= HALF[s] else v - MASK[s])
            else:
                pred = preds[ci]
            preds[ci] = pred
            coef[0] = pred
            # ---- AC band
            if eobrun > 0:
                eobrun -= 1
                continue
            if atab is None:
                raise ValueError("scan references an undefined Huffman table")
            k = 1
            while k <= 63:
                while nb < 16:
                    if dp < dn:
                        acc = (acc << 8) | data[dp]
                        dp += 1
                    else:
                        padded += 1
                        if padded > 4:
                            raise EOFError
                        acc = (acc << 8) | 0xFF
                    nb += 8
                L = afl[(acc >> (nb - 8)) & 0xFF]
                if L:
                    sym = afv[(acc >> (nb - 8)) & 0xFF]
                else:
                    code16 = (acc >> (nb - 16)) & 0xFFFF
                    amax, amin, avp, avals = atab[0], atab[1], atab[2], atab[3]
                    for L in range(1, 17):
                        c16 = code16 >> (16 - L)
                        if c16 <= amax[L]:
                            sym = avals[avp[L] + c16 - amin[L]]
                            break
                    else:
                        raise ValueError("invalid Huffman code")
                nb -= L
                acc &= MASK[nb]
                size = sym & 0xF
                if size == 0:
                    run = sym >> 4
                    if run == 15:
                        k += 16
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        while nb < run:
                            if dp < dn:
                                acc = (acc << 8) | data[dp]
                                dp += 1
                            else:
                                padded += 1
                                if padded > 4:
                                    raise EOFError
                                acc = (acc << 8) | 0xFF
                            nb += 8
                        nb -= run
                        eobrun += (acc >> nb) & MASK[run]
                        acc &= MASK[nb]
                    break
                k += sym >> 4
                if k > 63:
                    raise ValueError("AC run past band end")
                while nb < size:
                    if dp < dn:
                        acc = (acc << 8) | data[dp]
                        dp += 1
                    else:
                        padded += 1
                        if padded > 4:
                            raise EOFError
                        acc = (acc << 8) | 0xFF
                    nb += 8
                nb -= size
                v = (acc >> nb) & MASK[size]
                acc &= MASK[nb]
                coef[k] = v if v >= HALF[size] else v - MASK[size]
                k += 1
    return end


def _decode_scan(
    payload, pos, comps, scan_comps, htabs, restart_interval, ss, se, ah, al,
    mcus_x, mcus_y,
):
    """Decode one (baseline or progressive) scan's entropy data into the
    components' persistent coefficient grids. Returns the offset just
    past the scan data."""
    if (ss, se, ah, al) == (0, 63, 0, 0):
        return _decode_scan_seq_fast(
            payload, pos, scan_comps, htabs, restart_interval, mcus_x, mcus_y
        )
    segments, end = _split_entropy_segments(payload, pos)
    rd = _SegBits(segments[0])
    seg_idx = 0
    state = {"eobrun": 0}
    for c in scan_comps:
        c["pred"] = 0
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
    else:
        c = scan_comps[0]
        units = [(br, bc) for br in range(c["bh"]) for bc in range(c["bw"])]
    n_unit = 0
    for uy, ux in units:
        if restart_interval and n_unit and n_unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            rd = _SegBits(segments[seg_idx])
            state["eobrun"] = 0
            for c in scan_comps:
                c["pred"] = 0
        for c in scan_comps:
            dc_tab = htabs.get((0, c.get("td", 0)))
            ac_tab = htabs.get((1, c.get("ta", 0)))
            grid = c["coef"]
            if interleaved:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = grid[uy * c["v"] + by][ux * c["h"] + bx]
                        _prog_block(
                            rd, c, coef, ss, se, ah, al, dc_tab, ac_tab, state
                        )
            else:
                _prog_block(
                    rd, c, grid[uy][ux], ss, se, ah, al, dc_tab, ac_tab, state
                )
        n_unit += 1
    return end


def decode_jpeg_pixels(payload: bytes):
    """REAL JPEG decode, stdlib+numpy (ITU-T T.81 Annexes D/F/G):
    marker walk (DQT 8/16-bit, generic DHT canonical rebuild,
    SOF0/SOF1/SOF2 Huffman + SOF9/SOF10 ARITHMETIC, DRI, DAC,
    multi-SOS) -> entropy decode with restart handling — Huffman
    baseline in one fast interleaved pass, progressive scan-by-scan
    into a persistent coefficient store (spectral selection +
    successive approximation, DC and AC refinement, EOB runs), and the
    QM-coder statistical models for the arithmetic classes (sequential
    and progressive, interop-verified against libjpeg-turbo fixtures)
    -> dequantize -> inverse zigzag -> float IDCT -> level shift ->
    per-component planes -> chroma upsample (sampling-factor generic,
    so 4:4:4 / 4:2:2 / 4:2:0 all work) -> YCbCr->RGB -> (H, W, 3)
    uint8. Grayscale replicates to 3 channels. Returns None for
    hierarchical, lossless, 12-bit, or malformed payloads — those fall
    back to ``decode_stub``."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        qtabs: dict[int, "np.ndarray"] = {}
        htabs: dict[tuple[int, int], tuple] = {}  # (tc, th) -> decode arrays
        comps: list[dict] = []
        h = w = 0
        mcus_x = mcus_y = 0
        restart_interval = 0
        progressive = False
        arith = False
        # DAC conditioning defaults (T.81 F.1.4.4.1.2 / F.1.4.4.2.1)
        dc_cond = {i: (0, 1) for i in range(4)}  # (L, U)
        ac_cond = {i: 5 for i in range(4)}  # Kx
        any_scan = False
        scanned_ids: set[int] = set()
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:  # optional fill bytes before a marker
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:  # EOI
                break
            ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            body = payload[pos + 4 : pos + 2 + ln]
            if marker == 0xDB:  # DQT: one or more tables
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0xF
                    i += 1
                    n = 64 * (2 if pq else 1)
                    vals = body[i : i + n]
                    i += n
                    if pq:
                        tab = [
                            int.from_bytes(vals[2 * k : 2 * k + 2], "big")
                            for k in range(64)
                        ]
                    else:
                        tab = list(vals)
                    q = np.zeros((8, 8), dtype=np.int64)
                    for k, (r, c) in enumerate(_ZIGZAG):
                        q[r, c] = tab[k]
                    qtabs[tq] = q
                pos += 2 + ln
            elif marker == 0xC4:  # DHT: one or more tables
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0xF
                    bits = list(body[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(body[i + 17 : i + 17 + n])
                    i += 17 + n
                    htabs[(tc, th)] = _decode_tables(bits, vals)
                pos += 2 + ln
            elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
                # sequential / progressive, Huffman or arithmetic
                if body[0] != 8:
                    return None  # 12-bit precision unsupported
                progressive = marker in (0xC2, 0xCA)
                arith = marker in (0xC9, 0xCA)
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nf = body[5]
                if nf not in (1, 3):
                    return None
                comps = []
                for k in range(nf):
                    cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                    # single-component images are non-interleaved by
                    # definition; sampling factors are irrelevant
                    hi, vi = (1, 1) if nf == 1 else (hv >> 4, hv & 0xF)
                    comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
                max_h = max(c["h"] for c in comps)
                max_v = max(c["v"] for c in comps)
                mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
                mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
                for c in comps:
                    # persistent zigzag coefficient grid + the
                    # non-interleaved block-grid dims (T.81 A.2.2)
                    c["bw"] = (-(-w * c["h"] // max_h) + 7) // 8
                    c["bh"] = (-(-h * c["v"] // max_v) + 7) // 8
                    c["coef"] = [
                        [[0] * 64 for _ in range(mcus_x * c["h"])]
                        for _ in range(mcus_y * c["v"])
                    ]
                    c["pred"] = 0
                pos += 2 + ln
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless / hierarchical
            elif marker == 0xCC:  # DAC: arithmetic conditioning
                i = 0
                while i + 1 < len(body):
                    tc, tb = body[i] >> 4, body[i] & 0xF
                    cs = body[i + 1]
                    i += 2
                    if tc == 0:
                        dc_cond[tb] = (cs & 0xF, cs >> 4)
                    else:
                        ac_cond[tb] = cs
                pos += 2 + ln
            elif marker == 0xDD:
                restart_interval = int.from_bytes(body[:2], "big")
                pos += 2 + ln
            elif marker == 0xDA:  # SOS: decode one scan, keep walking
                if not comps:
                    return None
                ns = body[0]
                scan_comps = []
                for k in range(ns):
                    cid, tdta = body[1 + 2 * k : 3 + 2 * k]
                    comp = next(c for c in comps if c["id"] == cid)
                    comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                    scan_comps.append(comp)
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
                if not progressive:
                    ss, se, ah, al = 0, 63, 0, 0
                if ss > se or se > 63:
                    return None
                if arith:
                    pos = _decode_scan_arith(
                        payload, pos + 2 + ln, scan_comps, dc_cond,
                        ac_cond, restart_interval, ss, se, ah, al,
                        mcus_x, mcus_y, progressive,
                    )
                else:
                    pos = _decode_scan(
                        payload, pos + 2 + ln, comps, scan_comps, htabs,
                        restart_interval, ss, se, ah, al, mcus_x, mcus_y,
                    )
                any_scan = True
                scanned_ids.update(c["id"] for c in scan_comps)
                # Sequential files may legally carry MULTIPLE scans
                # (e.g. one non-interleaved scan per component, T.81
                # Annex B note on SOS) — keep walking to EOI so every
                # component's coefficients land; the persistent grids
                # make later scans additive exactly as in progressive.
            else:  # APPn / COM / anything else: skip
                pos += 2 + ln
        if not any_scan or not h or not w:
            return None
        if not progressive and scanned_ids != {c["id"] for c in comps}:
            # a sequential file whose scans never covered some
            # component would silently emit zero coefficients for it
            # (flat chroma); route to the stub fallback instead
            return None

        max_h = max(c["h"] for c in comps)
        max_v = max(c["v"] for c in comps)
        dct = _dct_matrix()
        # dequant tables reordered to zigzag so decoded coefficient
        # vectors multiply without a per-block scatter
        zz_flat = np.array([r * 8 + cc for r, cc in _ZIGZAG], dtype=np.int64)
        for c in comps:
            c["blocks"] = [
                (c["coef"][br][bc], br, bc)
                for br in range(mcus_y * c["v"])
                for bc in range(mcus_x * c["h"])
            ]

        # batched dequant + inverse zigzag + IDCT per component (one
        # einsum over all blocks instead of two 8x8 matmuls per block)
        for c in comps:
            bh, bw_ = mcus_y * c["v"], mcus_x * c["h"]
            c["plane"] = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
            if not c["blocks"]:
                continue
            dqz = qtabs[c["tq"]].reshape(-1)[zz_flat].astype(np.float64)
            zzs = np.asarray([b[0] for b in c["blocks"]], dtype=np.float64)
            flat = np.zeros((len(zzs), 64), dtype=np.float64)
            flat[:, zz_flat] = zzs * dqz
            blocks = (
                np.einsum(
                    "ux,nuv,vy->nxy", dct, flat.reshape(-1, 8, 8), dct
                )
                + 128.0
            )
            for (zz, br, bc), blk in zip(c["blocks"], blocks):
                c["plane"][br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8] = blk

        planes = []
        for c in comps:
            p = c["plane"]
            if c["h"] < max_h or c["v"] < max_v:
                p = np.repeat(
                    np.repeat(p, max_v // c["v"], axis=0), max_h // c["h"], axis=1
                )
            planes.append(p[:h, :w])
        if len(planes) == 1:
            g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
            return np.ascontiguousarray(np.stack([g, g, g], axis=2))
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.ascontiguousarray(
            np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        )
    except (IndexError, EOFError, ValueError, KeyError, StopIteration, struct.error):
        return None


# ---------------------------------------------------------------------------
# JPEG arithmetic entropy coding — the QM-coder (ITU-T T.81 Annex D)
# and the DC/AC statistical models (T.81 F.1.4.4 / F.2.4), closing the
# former "arithmetic-coded JPEG" stub: SOF9 (extended sequential) and
# SOF10 (progressive) decode through the SAME coefficient store and
# IDCT back half as the Huffman paths — only the entropy decoder is
# swapped, exactly the structure the spec describes.
#
# Interop-verified against libjpeg-turbo 2.1.5 (the system libjpeg):
# tests/data/arith/ carries real libjpeg-encoded arithmetic files
# (sequential, progressive, restart-interval, grayscale, 4:2:0) each
# paired with its Huffman twin of the SAME quantized coefficients —
# decode must be bit-identical between the pair. The fixture generator
# (ctypes harness) is tests/tools/gen_arith_fixtures.py.
# ---------------------------------------------------------------------------

# T.81 Table D.3 — the QM-coder probability estimation state machine:
# (Qe, next-index-after-MPS, next-index-after-LPS, MPS-switch flag).
# Validated two ways: the structural test in tests/test_codecs.py and
# bit-exact decode of libjpeg-encoded streams (a single wrong row
# derails every later decision in the stream).
_QM_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    # index 113: non-adaptive ~0.5 state (self-loop) — the "fixed bin"
    # used for AC signs and refinement bits (T.81 uses a fixed estimate
    # there because those bits are uniformly distributed)
    (0x5A1D, 113, 113, 0),
]
_QM_FIXED_BIN = 113


class _QMDecoder:
    """T.81 Annex F QM arithmetic decoder over one scan's entropy data
    in the RAW payload (byte stuffing per D.1.6: 0xFF 0x00 delivers
    0xFF; 0xFF + marker ends the stream and feeds zeros). The code
    window is kept as ``c >> shift`` — renormalization widens the
    window bit by bit and reloads 8 bits per exhausted byte, which is
    exactly the spec's C-register discipline without its fixed-width
    register juggling."""

    __slots__ = ("data", "pos", "marker_hit", "c", "shift", "a")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.marker_hit = False
        b0 = self._byte()
        b1 = self._byte()
        self.c = (b0 << 8) | b1
        self.shift = 0
        self.a = 0x10000

    def _byte(self) -> int:
        d = self.data
        if self.marker_hit or self.pos >= len(d):
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.marker_hit = True  # marker terminates the entropy stream
        return 0

    def decode(self, st: list, i: int) -> int:
        """One binary decision against adaptive context st[i] =
        (state index, MPS value); T.81 Figure F.17 with conditional
        exchange (F.20/F.21) and lazy renormalization."""
        idx, mps = st[i]
        qe, nmps, nlps, sw = _QM_QE[idx]
        a2 = self.a - qe
        if (self.c >> self.shift) < a2:
            # code value in the bottom (MPS-ordered) subinterval
            if a2 < 0x8000:
                if a2 < qe:  # conditional exchange: MPS interval smaller
                    d = 1 - mps
                    st[i] = (nlps, mps ^ sw)
                else:
                    d = mps
                    st[i] = (nmps, mps)
                self.a = a2
                self._renorm()
            else:
                self.a = a2
                d = mps
        else:
            self.c -= a2 << self.shift
            if a2 < qe:  # conditional exchange
                d = mps
                st[i] = (nmps, mps)
            else:
                d = 1 - mps
                st[i] = (nlps, mps ^ sw)
            self.a = qe
            self._renorm()
        return d

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            if self.shift == 0:
                self.c = (self.c << 8) | self._byte()
                self.shift = 7
            else:
                self.shift -= 1


class _QMEncoder:
    """T.81 Annex D QM arithmetic encoder (CODELPS/CODEMPS with
    conditional exchange, BYTEOUT with carry propagation over stacked
    0xFF bytes, byte stuffing per D.1.6). Emits a stream any compliant
    decoder accepts; the trailing-zero suppression the spec permits is
    not applied (superfluous zero bytes are legal)."""

    __slots__ = ("a", "c", "ct", "buffer", "sc", "out")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # no byte pending yet
        self.sc = 0  # count of stacked (carry-susceptible) 0xFF bytes
        self.out = bytearray()

    def encode(self, st: list, i: int, val: int) -> None:
        idx, mps = st[i]
        qe, nmps, nlps, sw = _QM_QE[idx]
        self.a -= qe
        if val != mps:
            if self.a >= qe:  # no exchange: LPS takes the top interval
                self.c += self.a
                self.a = qe
            st[i] = (nlps, mps ^ sw)
        else:
            if self.a >= 0x8000:
                return  # no renormalization, no estimation
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            st[i] = (nmps, mps)
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def _byteout(self) -> None:
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: bump the pending byte, stacked 0xFFs become 0x00
            if self.buffer >= 0:
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.out.extend(b"\x00" * self.sc)
            self.sc = 0
            # the spacer bits guarantee temp & 0xFF < 0xFF here
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            for _ in range(self.sc):
                self.out.extend(b"\xff\x00")
            self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        # T.81 D.1.8: pick the value in the interval with the most
        # trailing zeros, then push the remaining C bits out
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            self.c = temp + 0x8000
        else:
            self.c = temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.out.extend(b"\x00" * self.sc)
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            for _ in range(self.sc):
                self.out.extend(b"\xff\x00")
        self.sc = 0
        self.buffer = -1
        for shift_pos in (19, 11):
            b = (self.c >> shift_pos) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _arith_dc_block(dec, comp, coef, dstats, lu, ah, al) -> None:
    """DC decision tree (T.81 F.2.4.1; the F.1.4.4.1 model): zero/sign
    decisions conditioned on the PREVIOUS diff's category, magnitude
    category up the X1.. ladder, then raw magnitude bits. ``ah`` > 0 is
    the progressive DC refinement scan (one fixed-estimate bit)."""
    if ah:  # DC successive-approximation refinement
        if dec.decode(dstats["fixed"], 0):
            coef[0] |= 1 << al
        return
    low, up = lu
    st = comp["dc_ctx"]
    stats = dstats["s"]
    if dec.decode(stats, st) == 0:
        comp["dc_ctx"] = 0
    else:
        sign = dec.decode(stats, st + 1)
        m = dec.decode(stats, st + 2 + sign)
        if m:
            sti = 20  # X1 (T.81 Table F.4)
            while dec.decode(stats, sti):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith DC magnitude overflow")
                sti += 1
        else:
            sti = st + 2 + sign
        # conditioning category of THIS diff gates the NEXT block
        # (F.1.4.4.1.2 with the L/U conditioning bounds)
        if m < ((1 << low) >> 1):
            comp["dc_ctx"] = 0
        elif m > ((1 << up) >> 1):
            comp["dc_ctx"] = 12 + sign * 4
        else:
            comp["dc_ctx"] = 4 + sign * 4
        v = m
        sti += 14  # magnitude bit-pattern contexts (Figure F.24)
        mm = m >> 1
        while mm:
            if dec.decode(stats, sti):
                v |= mm
            mm >>= 1
        v += 1
        comp["last_dc"] += -v if sign else v
    coef[0] = comp["last_dc"] << al


def _arith_ac_block(dec, coef, astats, kx, ss, se, al) -> None:
    """AC decision tree (T.81 F.2.4.2): per-index EOB decision,
    zero-run decisions, fixed-estimate sign, magnitude category with
    the low/high X ladder split at Kx, then magnitude bits."""
    stats = astats["s"]
    fixed = astats["fixed"]
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC run past band end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m and dec.decode(stats, st):
            m <<= 1
            sti = 189 if k <= kx else 217  # X2 ladders (Table F.5)
            while dec.decode(stats, sti):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith AC magnitude overflow")
                sti += 1
        else:
            sti = st
        if m > 1:
            sti += 14
        else:
            sti = st + 14
        v = m
        mm = m >> 1
        while mm:
            if dec.decode(stats, sti):
                v |= mm
            mm >>= 1
        v += 1
        coef[k] = (-v if sign else v) << al
        k += 1


def _arith_ac_refine(dec, coef, astats, ss, se, al) -> None:
    """Progressive AC successive-approximation refinement (the
    F.2.4.3.3 model as realized in the spec's decision order): EOB
    decisions only beyond the previous stage's last nonzero index;
    correction bits for known coefficients, sign via the fixed bin for
    newly significant ones."""
    stats = astats["s"]
    fixed = astats["fixed"]
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and coef[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):
                return  # EOB
        while True:
            if coef[k]:
                if dec.decode(stats, st + 2):
                    coef[k] += m1 if coef[k] < 0 else p1
                break
            if dec.decode(stats, st + 1):
                coef[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refine past band end")
        k += 1


def _fresh_arith_stats(n: int) -> dict:
    return {"s": [(0, 0)] * n, "fixed": [(_QM_FIXED_BIN, 0)]}


def _decode_scan_arith(
    payload, pos, scan_comps, dc_cond, ac_cond, restart_interval,
    ss, se, ah, al, mcus_x, mcus_y, progressive,
):
    """Arithmetic twin of ``_decode_scan``: one QM decoder per
    restart interval, statistics areas shared per table id and reset at
    scan/restart boundaries (F.2.4), decoding into the same persistent
    zigzag coefficient grids. Returns the offset of the next marker."""
    dec = _QMDecoder(payload, pos)

    def fresh_state():
        dstats = {c["td"]: _fresh_arith_stats(64) for c in scan_comps}
        astats = {c["ta"]: _fresh_arith_stats(256) for c in scan_comps}
        for c in scan_comps:
            c["last_dc"] = 0
            c["dc_ctx"] = 0
        return dstats, astats

    dstats, astats = fresh_state()
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
    else:
        c = scan_comps[0]
        units = [(br, bc) for br in range(c["bh"]) for bc in range(c["bw"])]
    is_dc_scan = progressive and ss == 0
    n_unit = 0
    for uy, ux in units:
        if restart_interval and n_unit and n_unit % restart_interval == 0:
            # resync at the RSTn marker: fresh decoder + statistics
            p = dec.pos
            while p + 1 < len(payload) and not (
                payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
            ):
                p += 1
            if p + 1 >= len(payload):
                raise ValueError("missing arith restart marker")
            dec = _QMDecoder(payload, p + 2)
            dstats, astats = fresh_state()
        for c in scan_comps:
            if interleaved:
                blocks = [
                    c["coef"][uy * c["v"] + by][ux * c["h"] + bx]
                    for by in range(c["v"])
                    for bx in range(c["h"])
                ]
            else:
                blocks = [c["coef"][uy][ux]]
            for coef in blocks:
                if not progressive:
                    _arith_dc_block(
                        dec, c, coef, dstats[c["td"]], dc_cond[c["td"]], 0, 0
                    )
                    _arith_ac_block(dec, coef, astats[c["ta"]],
                                    ac_cond[c["ta"]], 1, 63, 0)
                elif is_dc_scan:
                    _arith_dc_block(
                        dec, c, coef, dstats[c["td"]], dc_cond[c["td"]], ah, al
                    )
                elif ah == 0:
                    _arith_ac_block(dec, coef, astats[c["ta"]],
                                    ac_cond[c["ta"]], ss, se, al)
                else:
                    _arith_ac_refine(dec, coef, astats[c["ta"]], ss, se, al)
        n_unit += 1
    # hand the marker walk the offset of the next 0xFF marker
    p = dec.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            return p
        p += 1
    return len(payload)


def encode_jpeg_arith(pixels, quality: int = 90) -> bytes:
    """REAL arithmetic-coded JFIF writer (SOF9, 4:4:4): the same
    quantized coefficients as ``encode_jpeg(pixels, quality)`` entropy-
    coded with the QM-coder instead of Huffman — T.81's exact framing
    (DAC conditioning marker with the default L=0/U=1/Kx=5, byte
    stuffing, D.1.8 termination). Decoded by ``decode_jpeg_pixels`` to
    pixels bit-identical to the Huffman stream's (pinned by tests, and
    cross-checked against libjpeg-turbo's decoder via the fixture
    harness)."""
    grids, h, w = _component_zz_blocks(pixels, quality)
    qt = _quant_tables(quality)
    zz_q = [
        bytes([tq]) + bytes(int(qt[tq][r][c]) for r, c in _ZIGZAG)
        for tq in (0, 1)
    ]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    # DAC: defaults made explicit — DC tables 0/1: Cs = (U<<4)|L = 0x10;
    # AC tables 0/1: Cs = Kx = 5
    dac = bytes([0x00, 0x10, 0x01, 0x10, 0x10, 0x05, 0x11, 0x05])
    head = (
        b"\xff\xd8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _marker(0xDB, zz_q[0])
        + _marker(0xDB, zz_q[1])
        + _marker(0xC9, sof)
        + _marker(0xCC, dac)
    )
    enc = _QMEncoder()
    dstats = {t: _fresh_arith_stats(64) for t in (0, 1)}
    astats = {t: _fresh_arith_stats(256) for t in (0, 1)}
    state = [
        {"last_dc": 0, "dc_ctx": 0, "td": 0 if ci == 0 else 1,
         "ta": 0 if ci == 0 else 1}
        for ci in range(3)
    ]
    bh, bw_ = len(grids[0]), len(grids[0][0])
    for br in range(bh):
        for bc in range(bw_):
            for ci in range(3):
                _arith_encode_block(
                    enc, state[ci], grids[ci][br][bc],
                    dstats[state[ci]["td"]], astats[state[ci]["ta"]],
                )
    entropy = enc.flush()
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    return head + _marker(0xDA, sos) + entropy + b"\xff\xd9"


def _arith_encode_block(enc, comp, zz, dstats, astats) -> None:
    """Sequential DC+AC statistical encode (T.81 F.1.4.4.1/F.1.4.4.2,
    default L=0 / U=1 / Kx=5 conditioning) — the exact mirror of the
    decode decision trees above."""
    stats = dstats["s"]
    st = comp["dc_ctx"]
    v = int(zz[0]) - comp["last_dc"]
    comp["last_dc"] = int(zz[0])
    if v == 0:
        enc.encode(stats, st, 0)
        comp["dc_ctx"] = 0
    else:
        enc.encode(stats, st, 1)
        sign = 1 if v < 0 else 0
        if sign:
            v = -v
        enc.encode(stats, st + 1, sign)
        st += 2 + sign
        m = 0
        v -= 1
        if v:
            enc.encode(stats, st, 1)
            m = 1
            sti = 20
            v2 = v >> 1
            while v2:
                enc.encode(stats, sti, 1)
                m <<= 1
                sti += 1
                v2 >>= 1
            enc.encode(stats, sti, 0)
        else:
            enc.encode(stats, st, 0)
            sti = st
        # conditioning category (L=0, U=1): m == 0 -> zero, m == 1
        # (i.e. |diff| in (0,1]) -> small, else large
        if m < (1 >> 1):
            comp["dc_ctx"] = 0
        elif m > (2 >> 1):
            comp["dc_ctx"] = 12 + sign * 4
        else:
            comp["dc_ctx"] = 4 + sign * 4
        sti += 14
        mm = m >> 1
        while mm:
            enc.encode(stats, sti, 1 if (mm & v) else 0)
            mm >>= 1
    # ---- AC ----
    stats = astats["s"]
    fixed = astats["fixed"]
    ke = 63
    while ke > 0 and int(zz[ke]) == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while int(zz[k]) == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        if sign:
            v = -v
        enc.encode(fixed, 0, sign)
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(stats, st, 1)
            m = 1
            v2 = v >> 1
            if v2:
                enc.encode(stats, st, 1)
                m <<= 1
                sti = 189 if k <= 5 else 217
                v2 >>= 1
                while v2:
                    enc.encode(stats, sti, 1)
                    m <<= 1
                    sti += 1
                    v2 >>= 1
                enc.encode(stats, sti, 0)
            else:
                enc.encode(stats, st, 0)
                sti = st
        else:
            enc.encode(stats, st, 0)
            sti = st
        if m > 1:
            sti += 14
        else:
            sti = st + 14
        mm = m >> 1
        while mm:
            enc.encode(stats, sti, 1 if (mm & v) else 0)
            mm >>= 1
        k += 1
    if ke < 63:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# AVI — MJPEG video container (Microsoft RIFF AVI, public format; the
# frames themselves are the baseline JPEGs implemented above, so video
# frame decode needs no codec library for this class either)
# ---------------------------------------------------------------------------


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + len(body).to_bytes(4, "little") + body + pad


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


def _build_avi(payloads, fps, w, h, handler, strf_body, keyframes=None):
    """Shared AVI container writer: avih + strl headers, movi LIST of
    per-frame '00dc' chunks, idx1 index. ``keyframes`` marks which
    chunks get AVIIF_KEYFRAME (all, when None — every MJPEG frame is
    independently decodable; only frame 0 for delta codecs)."""
    movi_body = bytearray(b"movi")
    index = bytearray()
    for fi, p in enumerate(payloads):
        offset = len(movi_body)  # offset of the ckid, relative to 'movi'
        movi_body.extend(_riff_chunk(b"00dc", p))
        index.extend(b"00dc")
        key = keyframes is None or fi in keyframes
        index.extend((0x10 if key else 0).to_bytes(4, "little"))
        index.extend(offset.to_bytes(4, "little"))
        index.extend(len(p).to_bytes(4, "little"))
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(payloads),
        0,  # initial frames
        1,  # streams
        max_bytes,  # suggested buffer
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + handler
        # dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale,
        # dwRate, dwStart, dwLength, dwSuggestedBufferSize, dwQuality,
        # dwSampleSize, rcFrame
        + struct.pack(
            "<I2H8I", 0, 0, 0, 0, 1, fps, 0, len(payloads),
            max_bytes, 0xFFFFFFFF, 0,
        )
        + struct.pack("<4h", 0, 0, w, h)
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl",
            _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf_body),
        ),
    )
    body = (
        b"AVI "
        + hdrl
        + _riff_chunk(b"LIST", bytes(movi_body))
        + _riff_chunk(b"idx1", bytes(index))
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """REAL AVI/MJPEG writer, stdlib+numpy: a list of (H, W, 3) uint8
    RGB frames -> a complete RIFF AVI (avih + strl headers, movi LIST
    of per-frame '00dc' baseline-JPEG chunks, idx1 index). Every frame
    is independently encoded by ``encode_jpeg`` — MJPEG is exactly
    'each frame is a JPEG', which is why this class of video needs no
    codec library."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    first = np.asarray(frames[0])
    h, w, _ = first.shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0
    )  # BITMAPINFOHEADER, biCompression 'MJPG'
    return _build_avi(payloads, fps, w, h, b"MJPG", strf)


def index_avi(payload: bytes):
    """RIFF walk WITHOUT frame decode: returns (fps, chunks) where
    chunks is ``[(offset, length), ...]`` of the '00dc'/'00db' video
    chunks in stream order, or None if the payload is not an AVI. This
    is the cheap pass sampling callers use to decode ONLY the chunk
    indices they need (``video_frame_stats`` at every_ms samples a
    small fraction of a long clip — indexing first avoids fully
    JPEG-decoding the frames the stride would discard)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    us_per_frame = 0
    chunks: list[tuple[int, int]] = []
    try:
        def walk(start: int, end: int) -> None:
            nonlocal us_per_frame
            pos = start
            while pos + 8 <= end:
                tag = payload[pos : pos + 4]
                ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                body_start = pos + 8
                if tag == b"LIST":
                    kind = payload[body_start : body_start + 4]
                    if kind in (b"hdrl", b"movi", b"strl"):
                        walk(body_start + 4, body_start + ln)
                elif tag == b"avih" and ln >= 4:
                    us_per_frame = int.from_bytes(
                        payload[body_start : body_start + 4], "little"
                    )
                elif tag in (b"00dc", b"00db"):
                    chunks.append((body_start, ln))
                pos = body_start + ln + (ln & 1)

        walk(12, min(len(payload), 8 + int.from_bytes(payload[4:8], "little")))
    except (IndexError, ValueError, TypeError, struct.error):
        return None
    fps = round(1_000_000 / us_per_frame) if us_per_frame else 0
    return fps, chunks


def decode_avi_frames(payload: bytes, max_frames: int | None = None):
    """REAL AVI/MJPEG frame decode, stdlib+numpy: ``index_avi`` RIFF
    walk -> each '00dc'/'00db' chunk through ``decode_jpeg_pixels``.
    Returns (frames, fps) where frames is a list of (H, W, 3) uint8
    arrays, or None if the payload is not an AVI or no frame decodes
    (non-MJPEG codecs land here: the chunk bytes are not JPEG and the
    frame decoder rejects them — those fall back to the stub path).
    ``max_frames`` bounds decode work for sampling callers that only
    need the first frames."""
    import numpy as np

    idx = index_avi(payload)
    if idx is None:
        return None
    fps, chunks = idx
    fmt = parse_avi_video_format(payload)
    if fmt is not None and fmt["compression"] == 1 and fmt["bitcount"] == 8:
        # MS-RLE8: a genuinely INTER-FRAME codec — delta chunks encode
        # only changed pixels (skip codes leave the canvas, i.e. the
        # previous frame, in place), so decode is sequential from the
        # keyframe; max_frames bounds the OUTPUT but every chunk up to
        # it must be composited.
        pal = fmt["palette"]
        if pal is None:
            return None
        canvas = np.zeros((fmt["height"], fmt["width"]), dtype=np.uint8)
        frames = []
        for off, ln in chunks:
            if max_frames is not None and len(frames) >= max_frames:
                break
            if _rle8_decode_chunk(payload[off : off + ln], canvas) is None:
                return None
            frames.append(np.ascontiguousarray(pal[canvas]))
        if not frames:
            return None
        return frames, fps
    frames = []
    for off, ln in chunks:
        if max_frames is not None and len(frames) >= max_frames:
            break
        px = decode_jpeg_pixels(payload[off : off + ln])
        if px is not None:
            frames.append(px)
    if not frames:
        return None
    return frames, fps


def parse_avi_video_format(payload: bytes):
    """Parse the first video stream's strh/strf out of an AVI: returns
    {handler, compression, bitcount, width, height, palette} (palette
    is an (N, 3) uint8 RGB array for 8-bit formats, else None), or
    None if no video stream header is found. Pure header walk — no
    frame decode."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    found: dict | None = None
    try:
        def walk(start: int, end: int) -> None:
            nonlocal found
            pos = start
            is_video = False
            handler = b""
            while pos + 8 <= end and found is None:
                tag = payload[pos : pos + 4]
                ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                body_start = pos + 8
                if tag == b"LIST":
                    kind = payload[body_start : body_start + 4]
                    if kind in (b"hdrl", b"strl"):
                        walk(body_start + 4, body_start + ln)
                elif tag == b"strh" and ln >= 8:
                    is_video = payload[body_start : body_start + 4] == b"vids"
                    handler = payload[body_start + 4 : body_start + 8]
                elif tag == b"strf" and is_video and ln >= 40:
                    b = payload[body_start : body_start + ln]
                    w = int.from_bytes(b[4:8], "little", signed=True)
                    h = int.from_bytes(b[8:12], "little", signed=True)
                    bitcount = int.from_bytes(b[14:16], "little")
                    compression = int.from_bytes(b[16:20], "little")
                    palette = None
                    if bitcount == 8:
                        n = int.from_bytes(b[32:36], "little") or 256
                        quads = b[40 : 40 + 4 * n]
                        if len(quads) == 4 * n:
                            q = np.frombuffer(quads, dtype=np.uint8)
                            q = q.reshape(-1, 4)
                            palette = np.ascontiguousarray(
                                q[:, [2, 1, 0]]  # RGBQUAD is B,G,R,0
                            )
                    found = {
                        "handler": handler,
                        "compression": compression,
                        "bitcount": bitcount,
                        "width": w,
                        "height": abs(h),
                        "palette": palette,
                    }
                pos = body_start + ln + (ln & 1)

        walk(12, min(len(payload), 8 + int.from_bytes(payload[4:8], "little")))
    except (IndexError, ValueError, TypeError, struct.error):
        return None
    return found


def _rle8_decode_chunk(data: bytes, canvas) -> object | None:
    """Decode one MS-RLE8 (BI_RLE8) chunk ONTO the canvas (bottom-up
    row order; escape codes: 00 00 = end of line, 00 01 = end of
    bitmap, 00 02 dx dy = delta move leaving skipped pixels untouched
    — the temporal-prediction primitive — 00 n>=3 = absolute run,
    word-padded). Returns the canvas, or None on a malformed chunk."""
    import numpy as np

    h, w = canvas.shape
    r = 0
    x = 0
    i = 0
    while i + 2 <= len(data):
        b0 = data[i]
        b1 = data[i + 1]
        i += 2
        if b0 > 0:  # encoded run
            if r >= h or x > w:
                return None
            y = h - 1 - r
            end = min(x + b0, w)
            canvas[y, x:end] = b1
            x += b0
        elif b1 == 0:  # end of line
            r += 1
            x = 0
        elif b1 == 1:  # end of bitmap
            return canvas
        elif b1 == 2:  # delta: skip (dx, dy), canvas retained
            if i + 2 > len(data):
                return None
            x += data[i]
            r += data[i + 1]
            i += 2
        else:  # absolute mode: b1 literal indices, word-padded
            n = b1
            if i + n > len(data) or r >= h or x > w:
                return None
            y = h - 1 - r
            end = min(x + n, w)
            canvas[y, x:end] = np.frombuffer(
                data[i : i + n], dtype=np.uint8
            )[: end - x]
            x += n
            i += n + (n & 1)
    return None  # ran out of data without an end-of-bitmap code


def _rle8_encode_frame(idx, prev) -> bytes:
    """Encode one frame of palette indices as an MS-RLE8 chunk.
    ``prev`` is the previous frame's indices (None for the keyframe):
    unchanged pixels are SKIPPED with delta codes so the decoder's
    canvas carries them over — real temporal prediction."""
    import numpy as np

    h, w = idx.shape
    out = bytearray()
    for r in range(h):
        y = h - 1 - r
        row = idx[y]
        changed = (
            np.ones(w, dtype=bool) if prev is None else row != prev[y]
        )
        pos = np.nonzero(changed)[0]
        x = 0
        si = 0
        while si < len(pos):
            a = int(pos[si])
            sj = si
            while sj + 1 < len(pos) and pos[sj + 1] == pos[sj] + 1:
                sj += 1
            b = int(pos[sj]) + 1
            si = sj + 1
            gap = a - x
            while gap > 0:  # skip unchanged pixels (delta move)
                d = min(gap, 255)
                out += bytes([0, 2, d, 0])
                gap -= d
            i = a
            while i < b:
                j = i + 1
                while j < b and row[j] == row[i] and j - i < 255:
                    j += 1
                if j - i >= 3:  # encoded run
                    out += bytes([j - i, int(row[i])])
                    i = j
                    continue
                # literal stretch: extend until the next >=3 run
                k = i
                while k < b:
                    j2 = k + 1
                    while j2 < b and row[j2] == row[k] and j2 - k < 3:
                        j2 += 1
                    if j2 - k >= 3:
                        break
                    k = j2
                n = k - i
                while n >= 3:
                    take = min(n, 255)
                    out += bytes([0, take]) + bytes(
                        int(v) for v in row[i : i + take]
                    )
                    if take & 1:
                        out += b"\x00"  # word padding
                    i += take
                    n -= take
                while n > 0:  # 1-2 leftovers: encoded pairs
                    out += bytes([1, int(row[i])])
                    i += 1
                    n -= 1
            x = b
        out += bytes([0, 0])  # end of line
    out[-2:] = bytes([0, 1])  # final EOL becomes end-of-bitmap
    return bytes(out)


def encode_avi_rle8(frames, fps: int = 10) -> bytes:
    """REAL AVI/MS-RLE8 writer — a genuinely INTER-FRAME public video
    codec (Microsoft Video RLE, BI_RLE8; the BMP/AVI RLE escape
    grammar): frames share one <=256-color palette; frame 0 is the
    keyframe, later frames encode only CHANGED pixels with delta-skip
    codes referencing the decoder's canvas (temporal prediction).
    Lossless for palettizable content, so roundtrips are bit-exact —
    the GIF contract, but with real inter-frame dependency."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    n, h, w, _ = stack.shape
    packed = (
        stack[:, :, :, 0].astype(np.int64) << 16
        | stack[:, :, :, 1].astype(np.int64) << 8
        | stack[:, :, :, 2].astype(np.int64)
    )
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"RLE8 supports <=256 colors, got {len(colors)}")
    idx = inverse.reshape(n, h, w).astype(np.uint8)
    payloads = [
        _rle8_encode_frame(idx[f], idx[f - 1] if f else None)
        for f in range(n)
    ]
    ncolors = len(colors)
    quads = bytearray()
    for c in colors:
        quads.extend(
            (int(c) & 0xFF, int(c) >> 8 & 0xFF, int(c) >> 16 & 0xFF, 0)
        )  # RGBQUAD: B, G, R, reserved
    strf = (
        struct.pack(
            "<I2i2H2I2i2I", 40, w, h, 1, 8, 1, w * h, 0, 0, ncolors, 0
        )  # BITMAPINFOHEADER, biCompression 1 = BI_RLE8
        + bytes(quads)
    )
    return _build_avi(payloads, fps, w, h, b"MRLE", strf, keyframes={0})


# ---------------------------------------------------------------------------
# Audio — G.711 mu-law / A-law (ITU-T G.711) and IMA/DVI ADPCM (WAV
# format tags 7, 6, 0x11). All three are fully public specifications
# with well-known reference arithmetic; implemented vectorized in
# numpy. These are the compressed-AUDIO formats that need no codec
# library — MP3/AAC (perceptual transforms + licensed huffman banks)
# remain the honestly-stubbed remainder.
# ---------------------------------------------------------------------------

_G711_SEG_END = (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)
_ULAW_BIAS = 0x84


def ulaw_encode(samples):
    """int16 PCM -> G.711 mu-law bytes (segmented 8-bit companding)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    neg = s < 0
    mag = np.where(neg, _ULAW_BIAS - s, s + _ULAW_BIAS)
    mag = np.minimum(mag, 0x7FFF)
    seg = np.searchsorted(np.asarray(_G711_SEG_END), mag)
    uval = (seg << 4) | ((mag >> (seg + 3)) & 0xF)
    mask = np.where(neg, 0x7F, 0xFF)
    return (uval ^ mask).astype(np.uint8)


def ulaw_decode(data):
    """G.711 mu-law bytes -> int16 PCM (exact inverse of the companding
    table: re-encoding the decoded value returns the identical byte)."""
    import numpy as np

    u = ~np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int64) & 0xFF
    t = (((u & 0xF) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def alaw_encode(samples):
    """int16 PCM -> G.711 A-law bytes (13-bit segmented companding with
    the 0x55 toggle pattern)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    neg = s < 0
    mag = np.where(neg, -s - 8, s)
    mag = np.clip(mag, 0, 0x7FFF)
    seg = np.searchsorted(np.asarray(_G711_SEG_END), mag)
    low = np.where(seg < 2, (mag >> 4) & 0xF, (mag >> (seg + 3)) & 0xF)
    aval = (seg << 4) | low
    mask = np.where(neg, 0x55, 0xD5)
    return (aval ^ mask).astype(np.uint8)


def alaw_decode(data):
    """G.711 A-law bytes -> int16 PCM (exact table inverse, same
    idempotence property as mu-law)."""
    import numpy as np

    a = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int64) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, 0))
    t = np.where(seg >= 2, ((a & 0xF) << 4) + 0x108 << np.maximum(seg - 1, 0), t)
    return np.where(a & 0x80, t, -t).astype(np.int16)


_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_reconstruct(code: int, step: int) -> int:
    diff = step >> 3
    if code & 4:
        diff += step
    if code & 2:
        diff += step >> 1
    if code & 1:
        diff += step >> 2
    return -diff if code & 8 else diff


def ima_adpcm_encode_block(samples, predictor: int, index: int):
    """Encode one mono IMA-ADPCM block body: (nibble bytes, predictor,
    index) after the block. The caller stores the INITIAL predictor +
    index in the 4-byte block header (WAV DVI/IMA layout)."""
    nibbles = []
    step = _IMA_STEP_TABLE[index]
    for s in samples:
        s = int(s)
        diff = s - predictor
        code = 8 if diff < 0 else 0
        diff = abs(diff)
        tmp = step
        if diff >= tmp:
            code |= 4
            diff -= tmp
        tmp >>= 1
        if diff >= tmp:
            code |= 2
            diff -= tmp
        tmp >>= 1
        if diff >= tmp:
            code |= 1
        predictor += _ima_reconstruct(code, step)
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + _IMA_INDEX_TABLE[code & 7]))
        step = _IMA_STEP_TABLE[index]
        nibbles.append(code)
    body = bytearray()
    for i in range(0, len(nibbles), 2):
        lo = nibbles[i]
        hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
        body.append(lo | (hi << 4))
    return bytes(body), predictor, index


def ima_adpcm_decode_block(body: bytes, predictor: int, index: int, n: int):
    """Decode one mono IMA-ADPCM block body (low nibble first) into n
    int16 samples starting AFTER the header sample. The recurrence is
    inherently sequential (predictor/step state), so the loop is inline
    integer arithmetic with table lookups — no per-sample call
    overhead."""
    out = []
    append = out.append
    steps = _IMA_STEP_TABLE
    idx_tab = _IMA_INDEX_TABLE
    index = max(0, min(88, index))
    step = steps[index]
    for i in range(n):
        byte = body[i >> 1]
        code = (byte >> 4) if i & 1 else (byte & 0xF)
        diff = step >> 3
        if code & 4:
            diff += step
        if code & 2:
            diff += step >> 1
        if code & 1:
            diff += step >> 2
        predictor += -diff if code & 8 else diff
        if predictor > 32767:
            predictor = 32767
        elif predictor < -32768:
            predictor = -32768
        index += idx_tab[code & 7]
        if index < 0:
            index = 0
        elif index > 88:
            index = 88
        step = steps[index]
        append(predictor)
    return out


def encode_wav_compressed(samples, sample_rate: int = 8000, codec: str = "ulaw") -> bytes:
    """REAL compressed-WAV writer: int16 samples -> a complete RIFF/WAVE
    file in G.711 mu-law (format tag 7), A-law (6), or mono IMA ADPCM
    (0x11, 505 samples per 256-byte block, fact chunk with the true
    sample count). The synthesis half that the extended
    ``decode_wav_samples`` must invert."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if codec == "ulaw":
        tag, bits, data = 7, 8, ulaw_encode(s).tobytes()
        block_align, extra = 1, b""
    elif codec == "alaw":
        tag, bits, data = 6, 8, alaw_encode(s).tobytes()
        block_align, extra = 1, b""
    elif codec == "ima":
        tag, bits = 0x11, 4
        block_align = 256
        spb = (block_align - 4) * 2 + 1  # 505
        extra = (2).to_bytes(2, "little") + spb.to_bytes(2, "little")
        chunks = bytearray()
        predictor, index = 0, 0
        for off in range(0, len(s), spb):
            blk = s[off : off + spb]
            predictor = int(blk[0])
            header = (
                (predictor & 0xFFFF).to_bytes(2, "little")
                + bytes([index, 0])
            )
            body, predictor, index = ima_adpcm_encode_block(
                blk[1:], predictor, index
            )
            body = body.ljust(block_align - 4, b"\x00")
            chunks.extend(header + body)
        data = bytes(chunks)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    byte_rate = sample_rate * block_align if tag == 0x11 else sample_rate
    fmt = (
        tag.to_bytes(2, "little")
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + extra
    )
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"fact"
        + (4).to_bytes(4, "little")
        + len(s).to_bytes(4, "little")
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav_compressed(
    audio_format: int,
    data: bytes,
    n_channels: int,
    block_align: int,
    samples_per_block: int,
    n_samples: int | None,
):
    """Decode the non-PCM WAV formats this engine covers: G.711 mu-law
    (7), A-law (6), mono IMA ADPCM (0x11). Returns an int16 numpy array
    or None for anything else (MP3-in-WAV etc. stay stubbed).
    ``n_samples`` comes from the fact chunk when present and trims
    block padding."""
    import numpy as np

    if audio_format == 7:
        out = ulaw_decode(data)
    elif audio_format == 6:
        out = alaw_decode(data)
    elif audio_format == 0x11:
        if n_channels != 1 or block_align < 5:
            return None
        spb = samples_per_block or (block_align - 4) * 2 + 1
        decoded: list[int] = []
        for off in range(0, len(data) - 4, block_align):
            block = data[off : off + block_align]
            if len(block) < 5:
                break
            predictor = int.from_bytes(block[0:2], "little", signed=True)
            index = block[2]
            decoded.append(predictor)
            body = block[4:]
            n = min(spb - 1, len(body) * 2)
            decoded.extend(ima_adpcm_decode_block(body, predictor, index, n))
        out = np.asarray(decoded, dtype=np.int16)
    else:
        return None
    if n_samples is not None and 0 < n_samples <= len(out):
        out = out[:n_samples]
    return out


# ---------------------------------------------------------------------------
# TIFF — baseline 8-bit strips (TIFF 6.0 specification, Adobe 1992;
# public). Uncompressed, PackBits and LZW compression (the TIFF
# early-change LZW variant, §13, with the horizontal-differencing
# predictor tag 317); gray (both photometric polarities), RGB(A), and
# 16-bit-colormap palette images; both byte orders. JPEG-in-TIFF stays
# out of scope (JPEG payloads are handled standalone).
# ---------------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): literal runs up to 128, repeat
    runs up to 128, encoded per spec."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append((257 - run) & 0xFF)  # -(run-1) as signed byte
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out.extend(data[lit_start:i])
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes | None:
    """Inverse PackBits; None on malformed stream."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal: next n+1 bytes
            if i + n + 1 > len(data):
                return None
            out.extend(data[i : i + n + 1])
            i += n + 1
        elif n > 128:  # repeat: next byte 257-n times
            if i >= len(data):
                return None
            out.extend(bytes([data[i]]) * (257 - n))
            i += 1
        # n == 128: noop
    return bytes(out[:expected]) if len(out) >= expected else None


def encode_tiff(
    pixels,
    photometric: int = 2,
    packbits: bool = False,
    lzw: bool = False,
    predictor: bool = False,
) -> bytes:
    """REAL little-endian TIFF 6.0 writer: (H, W, 3) uint8 RGB
    (photometric 2) or (H, W) grayscale (photometric 1), single strip,
    optionally PackBits- or LZW-compressed (the latter optionally with
    the horizontal-differencing predictor, tag 317 = 2 — the standard
    LZW pairing). The synthesis half that ``decode_tiff_pixels`` must
    invert."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if photometric == 2:
        h, w, spp = px.shape
    else:
        h, w = px.shape
        spp = 1
    plane = px.reshape(h, w * spp).astype(np.int64)
    if predictor:
        diffed = plane.copy()
        diffed[:, spp:] = plane[:, spp:] - plane[:, :-spp]
        raw = (diffed % 256).astype(np.uint8).tobytes()
    else:
        raw = px.tobytes()
    if lzw:
        data = tiff_lzw_encode(raw)
    elif packbits:
        data = packbits_encode(raw)
    else:
        data = raw

    entries = []  # (tag, type, count, value) — SHORT=3, LONG=4

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    # header(8) + entry count(2) + entries(12 each) + next-IFD(4), then
    # the out-of-line bits-per-sample array (RGB only), then strip data
    n_entries = 8 + (1 if predictor else 0)
    ifd_size = 2 + 12 * n_entries + 4
    bps_off = 8 + ifd_size
    data_off = bps_off + (6 if spp == 3 else 0)
    entry(256, 4, 1, w)  # ImageWidth
    entry(257, 4, 1, h)  # ImageLength
    if spp == 3:
        entry(258, 3, 3, bps_off)  # BitsPerSample -> offset
    else:
        entry(258, 3, 1, 8)
    entry(259, 3, 1, 5 if lzw else (32773 if packbits else 1))  # Compression
    entry(262, 3, 1, photometric)
    entry(273, 4, 1, data_off)  # StripOffsets
    entry(277, 3, 1, spp)  # SamplesPerPixel
    entry(279, 4, 1, len(data))  # StripByteCounts
    if predictor:
        entry(317, 3, 1, 2)  # horizontal differencing
    out = bytearray(b"II*\x00" + (8).to_bytes(4, "little"))
    out.extend(len(entries).to_bytes(2, "little"))
    for tag, typ, count, value in entries:
        out.extend(tag.to_bytes(2, "little"))
        out.extend(typ.to_bytes(2, "little"))
        out.extend(count.to_bytes(4, "little"))
        if typ == 3 and count == 1:
            out.extend(value.to_bytes(2, "little") + b"\x00\x00")
        else:
            out.extend(value.to_bytes(4, "little"))
    out.extend((0).to_bytes(4, "little"))  # no next IFD
    if spp == 3:
        out.extend(b"".join((8).to_bytes(2, "little") for _ in range(3)))
    out.extend(data)
    return bytes(out)


def decode_tiff_pixels(payload: bytes):
    """REAL TIFF pixel decode, stdlib+numpy: header + first IFD (both
    byte orders, inline and out-of-line values) -> strip assembly
    (uncompressed or PackBits) -> photometric interpretation (gray
    either polarity, RGB(A), 16-bit-colormap palette) -> (H, W, 3)
    uint8 RGB. Returns None for anything outside the 8-bit-strip
    contract (JPEG-in-TIFF compression, tiles, planar config 2) — those
    fall back to ``decode_stub``."""
    import numpy as np

    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        return None

    def rd(off, n):
        b = payload[off : off + n]
        if len(b) != n:
            raise IndexError
        return int.from_bytes(b, bo)

    try:
        ifd = rd(4, 4)
        n_entries = rd(ifd, 2)
        tags: dict[int, tuple[int, int, int]] = {}
        for k in range(n_entries):
            off = ifd + 2 + 12 * k
            tags[rd(off, 2)] = (rd(off + 2, 2), rd(off + 4, 4), off + 8)

        type_size = {1: 1, 3: 2, 4: 4}

        def values(tag, default=None):
            if tag not in tags:
                return default
            typ, count, voff = tags[tag]
            if typ not in type_size:
                # entry typed outside {BYTE,SHORT,LONG} (e.g. a
                # RATIONAL-typed Compression tag in a corrupt file):
                # treat as absent so callers see their default instead
                # of subscripting None
                return default
            size = type_size[typ]
            off = voff if count * size <= 4 else rd(voff, 4)
            return [rd(off + i * size, size) for i in range(count)]

        w = (values(256) or [0])[0]
        h = (values(257) or [0])[0]
        bps = values(258, [1])
        compression = (values(259, [1]))[0]
        photometric = (values(262, [1]))[0]
        offsets = values(273)
        spp = (values(277, [1]))[0]
        counts = values(279)
        rows_per_strip = (values(278, [h]))[0] or h
        planar = (values(284, [1]))[0]
        predictor = (values(317, [1]))[0]
        if (
            not w
            or not h
            or offsets is None
            or counts is None
            or len(offsets) != len(counts)
            or compression not in (1, 5, 32773)
            or planar != 1
            or predictor not in (1, 2)
            or photometric not in (0, 1, 2, 3)
            or any(b != 8 for b in (bps or []))
        ):
            return None
        stride = w * spp
        raw = bytearray()
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            strip = payload[off : off + cnt]
            if len(strip) != cnt:
                return None
            n_rows = min(rows_per_strip, h - idx * rows_per_strip)
            if compression == 32773:
                dec = packbits_decode(strip, n_rows * stride)
                if dec is None:
                    return None
                raw.extend(dec)
            elif compression == 5:
                dec = tiff_lzw_decode(strip, n_rows * stride)
                if dec is None:
                    return None
                raw.extend(dec)
            else:
                raw.extend(strip)
        if len(raw) < h * stride:
            return None
        px = np.frombuffer(bytes(raw[: h * stride]), dtype=np.uint8).reshape(
            h, w, spp
        )
        if predictor == 2:  # undo horizontal differencing (tag 317)
            acc = px.reshape(h, w, spp).astype(np.int64)
            px = np.cumsum(acc, axis=1, dtype=np.int64) % 256
            px = px.astype(np.uint8)
        if photometric == 2:
            if spp < 3:
                return None
            return np.ascontiguousarray(px[:, :, :3])
        if photometric == 3:
            cmap = values(320)
            if cmap is None or len(cmap) < 3 * 256 or spp != 1:
                return None
            # ColorMap is 3 planes of 2^bits 16-bit values; 8->per spec
            n = len(cmap) // 3
            table = (
                np.asarray(cmap, dtype=np.int64).reshape(3, n).T >> 8
            ).astype(np.uint8)
            idx = px[:, :, 0].astype(np.int64)
            if int(idx.max(initial=0)) >= n:
                return None
            return np.ascontiguousarray(table[idx])
        g = px[:, :, 0]
        if photometric == 0:  # WhiteIsZero
            g = (255 - g.astype(np.int64)).astype(np.uint8)
        return np.ascontiguousarray(np.stack([g, g, g], axis=2))
    except (IndexError, ValueError, struct.error):
        return None


# ---------------------------------------------------------------------------
# FLAC — Free Lossless Audio Codec (xiph.org specification / RFC 9639;
# public). Decode covers the full frame grammar: CONSTANT / VERBATIM /
# FIXED(0-4) / LPC subframes, rice + rice2 residual partitions with
# escape codes, wasted bits, stereo decorrelation (left/side,
# right/side, mid/side), CRC-8-verified headers. The encoder emits the
# FIXED-predictor subset (the classic "flac -0..-2" shape) so
# roundtrips are bit-exact — FLAC is lossless, same contract as GIF.
# ---------------------------------------------------------------------------


def _crc_tables():
    """Byte-indexed CRC tables (the standard table-driven form): one
    table lookup per input byte instead of the 8-step bitwise loop —
    the bitwise loops were ~26% of a FLAC decode (every frame is
    CRC-16'd whole)."""
    t8 = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        t8.append(crc)
    t16 = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        t16.append(crc)
    return t8, t16


_CRC8_TAB, _CRC16_TAB = _crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame header)."""
    crc = 0
    tab = _CRC8_TAB
    for b in data:
        crc = tab[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC frame footer)."""
    crc = 0
    tab = _CRC16_TAB
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ tab[(crc >> 8) ^ b]
    return crc


class _FlacBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _FlacBitReader:
    """MSB-first bit reader with a windowed accumulator (byte-granular
    refills, no per-bit loop and no per-read bytes slicing): the rice
    hot path costs one read_unary + one read per residual, each a few
    integer ops. Invariant: nbits < 8 between calls, so ``align`` just
    drops the partial byte."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        acc = self.acc
        nb = self.nbits
        d = self.data
        p = self.pos
        while nb < n:
            acc = (acc << 8) | d[p]
            p += 1
            nb += 8
        nb -= n
        v = (acc >> nb) & ((1 << n) - 1)
        self.acc = acc & ((1 << nb) - 1)
        self.nbits = nb
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        acc = self.acc
        nb = self.nbits
        d = self.data
        p = self.pos
        q = 0
        while True:
            if nb == 0:
                acc = d[p]
                p += 1
                nb = 8
            if acc == 0:
                q += nb
                nb = 0
                continue
            top = acc.bit_length()
            q += nb - top
            nb = top - 1
            self.acc = acc & ((1 << nb) - 1)
            self.nbits = nb
            self.pos = p
            return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def byte_pos(self) -> int:
        return (self.pos * 8 - self.nbits) >> 3


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 6 * (n_bytes - 1) + (7 - n_bytes):
        n_bytes += 1
    lead = (0xFF << (8 - n_bytes)) & 0xFF
    shift = 6 * (n_bytes - 1)
    out.append(lead | (n >> shift))
    for k in range(n_bytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(rd: _FlacBitReader) -> int:
    first = rd.read(8)
    if first < 0x80:
        return first
    n_bytes = 0
    mask = 0x80
    while first & mask:
        n_bytes += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_bytes - 1):
        b = rd.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad coded number")
        v = (v << 6) | (b & 0x3F)
    return v


_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _zigzag_encode(v: int) -> int:
    return v << 1 if v >= 0 else ((-v) << 1) - 1


def encode_flac(samples, sample_rate: int = 16000, block_size: int = 4096) -> bytes:
    """REAL FLAC writer (mono 16-bit, FIXED-predictor subset): int16
    samples -> a complete FLAC stream (fLaC magic, STREAMINFO, fixed
    4096-sample frames, per-frame best-of-orders-0..4 fixed predictor,
    one rice partition with a mean-magnitude-fit parameter, CRC-8 +
    CRC-16). Lossless: ``decode_flac_samples`` must invert it
    bit-for-bit, which the roundtrip tests pin."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16).astype(np.int64)
    n = len(s)
    out = bytearray(b"fLaC")
    streaminfo = bytearray()
    streaminfo += block_size.to_bytes(2, "big") * 2  # min/max block size
    streaminfo += (0).to_bytes(3, "big") * 2  # min/max frame size unknown
    # 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total samples
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | n
    streaminfo += packed.to_bytes(8, "big")
    streaminfo += bytes(16)  # MD5 unset
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for frame_idx, off in enumerate(range(0, n, block_size)):
        blk = s[off : off + block_size]
        bs = len(blk)
        # pick the fixed order with the smallest residual magnitude sum
        best_order, best_res, best_cost = 0, blk, None
        for order in range(5):
            if bs <= order:
                break
            res = blk.copy()
            for _ in range(order):
                res = np.diff(res)
            cost = int(np.abs(res).sum())
            if best_cost is None or cost < best_cost:
                best_order, best_res, best_cost = order, res, cost
        order = best_order
        residual = best_res  # len bs - order
        header = bytearray()
        header += b"\xff\xf8"  # sync + reserved + fixed blocking
        # block size code 0b0111 (16-bit at end), rate code 0 (streaminfo)
        header.append(0x70)
        header.append((0 << 4) | (4 << 1))  # mono | 16-bit | reserved 0
        header += _utf8_coded(frame_idx)
        header += (bs - 1).to_bytes(2, "big")
        header.append(_crc8(bytes(header)))
        bw = _FlacBitWriter()
        bw.buf.extend(header)
        bw.write(0, 1)  # subframe pad bit
        bw.write(8 + order, 6)  # FIXED subframe type
        bw.write(0, 1)  # no wasted bits
        for k in range(order):
            bw.write(int(blk[k]) & 0xFFFF, 16)  # warmup samples
        bw.write(0, 2)  # residual method: 4-bit rice
        bw.write(0, 4)  # partition order 0
        zz = [_zigzag_encode(int(v)) for v in residual]
        mean = (sum(zz) / len(zz)) if zz else 0.0
        param = 0
        while (1 << (param + 1)) < mean + 1 and param < 14:
            param += 1
        bw.write(param, 4)
        for u in zz:
            bw.write_unary(u >> param)
            bw.write(u, param)
        bw.align()
        body = bytes(bw.buf)
        out += body + _crc16(body).to_bytes(2, "big")
    return bytes(out)


_FLAC_BLOCKSIZES = (
    0, 192, 576, 1152, 2304, 4608, -8, -16, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768,
)
_FLAC_RATES = (
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100,
    48000, 96000, -8, -16, -160, -1,
)
_FLAC_BPS = (0, 8, 12, 0, 16, 20, 24, 32)


def _flac_residual(rd: _FlacBitReader, bs: int, order: int):
    """Decode one residual section: rice/rice2 partitions with escapes.
    The rice hot loop keeps the whole bit-reader state (byte pos,
    accumulator, bit count) in locals — one fused unary+remainder+
    zigzag per residual with zero method calls; state is written back
    to ``rd`` at every exit so the surrounding subframe/header reads
    see the exact same stream position as the method-call form."""
    method = rd.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = rd.read(4)
    n_parts = 1 << part_order
    res: list[int] = []
    MASK = _JMASK
    d = rd.data
    p = rd.pos
    acc = rd.acc
    nb = rd.nbits
    try:
        for part in range(n_parts):
            count = (bs >> part_order) - (order if part == 0 else 0)
            if count < 0:
                raise ValueError("bad partition layout")
            while nb < plen:
                acc = (acc << 8) | d[p]
                p += 1
                nb += 8
            nb -= plen
            param = (acc >> nb) & MASK[plen]
            acc &= MASK[nb]
            if param == escape:
                rd.pos, rd.acc, rd.nbits = p, acc, nb
                nbits = rd.read(5)
                if nbits:
                    for _ in range(count):
                        res.append(rd.read_signed(nbits))
                else:
                    res.extend([0] * count)
                p, acc, nb = rd.pos, rd.acc, rd.nbits
            else:
                append = res.append
                pm = MASK[param]
                for _ in range(count):
                    if acc:
                        t = acc.bit_length()
                        q = nb - t
                        nb = t - 1
                        acc &= MASK[nb]
                    else:
                        q = nb
                        while True:
                            b = d[p]
                            p += 1
                            if b:
                                break
                            q += 8
                        t = b.bit_length()
                        q += 8 - t
                        nb = t - 1
                        acc = b & MASK[nb]
                    if param:
                        while nb < param:
                            acc = (acc << 8) | d[p]
                            p += 1
                            nb += 8
                        nb -= param
                        u = (q << param) | ((acc >> nb) & pm)
                        acc &= MASK[nb]
                    else:
                        u = q
                    append((u >> 1) ^ -(u & 1))
    finally:
        rd.pos, rd.acc, rd.nbits = p, acc, nb
    return res


def _flac_subframe(rd: _FlacBitReader, bs: int, bps: int):
    """Decode one subframe to an int64 array of bs samples. The FIXED
    recurrences are exact k-fold cumulative sums (an order-k fixed
    predictor is, by construction, D^k x = residual), so they run as
    ``order`` numpy cumsums seeded from the warmup's finite
    differences instead of a per-sample Python loop — bit-identical
    because every intermediate is itself a stream value difference
    bounded far inside int64."""
    import numpy as np

    if rd.read(1):
        raise ValueError("bad subframe pad bit")
    stype = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = rd.read_signed(bps)
        out = np.full(bs, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.asarray(
            [rd.read_signed(bps) for _ in range(bs)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.asarray(
            [rd.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        z = np.asarray(_flac_residual(rd, bs, order), dtype=np.int64)
        # z holds D^order x for i >= order; integrate down one
        # difference level at a time, seeding each level with the
        # corresponding finite difference of the warmup samples
        for j in range(order - 1, -1, -1):
            z = int(np.diff(warm, n=j)[-1]) + np.cumsum(z)
        out = np.concatenate([warm, z]) if order else z
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        out = [rd.read_signed(bps) for _ in range(order)]
        precision = rd.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = rd.read_signed(5)
        coefs = [rd.read_signed(precision) for _ in range(order)]
        res = _flac_residual(rd, bs, order)
        for r in res:
            pred = sum(c * out[-k - 1] for k, c in enumerate(coefs)) >> shift
            out.append(r + pred)
        out = np.asarray(out, dtype=np.int64)
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        out = out << wasted
    return out


def decode_flac_samples(payload: bytes):
    """REAL FLAC decode, pure Python bit arithmetic: STREAMINFO ->
    frame-by-frame decode of the full subframe grammar (CONSTANT /
    VERBATIM / FIXED / LPC, rice + rice2 partitions with escape codes,
    wasted bits, left/side / right/side / mid/side stereo
    decorrelation), CRC-8-checked headers. Returns (interleaved int32
    sample array, sample_rate, n_channels) — int16-ranged for 16-bit
    streams, same contract as ``decode_wav_samples`` — or None for
    malformed/non-FLAC payloads (those fall back to ``decode_stub``)."""
    import numpy as np

    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    try:
        pos = 4
        info = None
        while pos + 4 <= len(payload):
            head = payload[pos]
            ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + ln]
            if len(body) != ln:
                return None
            if head & 0x7F == 0:  # STREAMINFO
                packed = int.from_bytes(body[10:18], "big")
                info = {
                    "rate": packed >> 44,
                    "channels": ((packed >> 41) & 7) + 1,
                    "bps": ((packed >> 36) & 0x1F) + 1,
                    "total": packed & ((1 << 36) - 1),
                }
            pos += 4 + ln
            if head & 0x80:
                break
        if info is None or not info["rate"]:
            return None

        channels_out: list[list] = [[] for _ in range(info["channels"])]
        nsamp = 0
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
                return None
            rd = _FlacBitReader(payload, pos)
            header_start = pos
            rd.read(16)  # sync + reserved + blocking strategy
            bs_code = rd.read(4)
            rate_code = rd.read(4)
            chan_code = rd.read(4)
            bps_code = rd.read(3)
            if rd.read(1):
                return None
            _read_utf8_coded(rd)
            bs = _FLAC_BLOCKSIZES[bs_code]
            if bs == -8:
                bs = rd.read(8) + 1
            elif bs == -16:
                bs = rd.read(16) + 1
            elif bs == 0:
                return None
            rate = _FLAC_RATES[rate_code]
            if rate == -8:
                rate = rd.read(8) * 1000
            elif rate == -16:
                rate = rd.read(16)
            elif rate == -160:
                rate = rd.read(16) * 10
            elif rate == -1:
                return None
            elif rate == 0:
                rate = info["rate"]
            bps = _FLAC_BPS[bps_code] or info["bps"]
            crc_end = rd.byte_pos()
            header_crc = rd.read(8)
            if _crc8(payload[header_start:crc_end]) != header_crc:
                return None
            if chan_code < 8:
                n_ch = chan_code + 1
                if n_ch != info["channels"]:
                    return None
                subs = [_flac_subframe(rd, bs, bps) for _ in range(n_ch)]
            elif chan_code in (8, 9, 10):
                if info["channels"] != 2:
                    return None
                extra0 = 1 if chan_code == 9 else 0
                extra1 = 1 if chan_code in (8, 10) else 0
                a = _flac_subframe(rd, bs, bps + extra0)
                b = _flac_subframe(rd, bs, bps + extra1)
                if chan_code == 8:  # left/side
                    subs = [a, a - b]
                elif chan_code == 9:  # side/right
                    subs = [a + b, b]
                else:  # mid/side
                    m2 = (a << 1) | (b & 1)
                    subs = [(m2 + b) >> 1, (m2 - b) >> 1]
            else:
                return None
            rd.align()
            frame_end = rd.byte_pos()
            footer_crc = int.from_bytes(payload[frame_end : frame_end + 2], "big")
            if _crc16(payload[header_start:frame_end]) != footer_crc:
                return None
            for ch, sub in enumerate(subs):
                channels_out[ch].append(sub)
            nsamp += len(subs[0])
            pos = frame_end + 2
            total = info["total"]
            if total and nsamp >= total:
                break
        if not nsamp:
            return None
        n = nsamp
        total = info["total"]
        if total:
            n = min(n, total)
        inter = np.empty(n * info["channels"], dtype=np.int64)
        for ch in range(info["channels"]):
            inter[ch :: info["channels"]] = np.concatenate(channels_out[ch])[:n]
        return inter.astype(np.int32), rate, info["channels"]
    except (IndexError, ValueError, struct.error):
        return None


def _component_zz_blocks(pixels, quality: int):
    """Quantized zigzag coefficient grids for 4:4:4 (one 8x8 block grid
    per YCbCr component) — the shared front half of the progressive
    encoder."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    planes = rgb_to_ycbcr(px)
    qt = _quant_tables(quality)
    dct = _dct_matrix()
    pad_h = (h + 7) // 8 * 8
    pad_w = (w + 7) // 8 * 8
    grids = []
    for ci, plane in enumerate(planes):
        tq = 0 if ci == 0 else 1
        p = np.pad(plane, ((0, pad_h - h), (0, pad_w - w)), mode="edge")
        grid = []
        for br in range(pad_h // 8):
            row = []
            for bc in range(pad_w // 8):
                block = p[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8] - 128.0
                coefs = np.round((dct @ block @ dct.T) / qt[tq]).astype(
                    np.int64
                )
                row.append([int(coefs[r][c]) for r, c in _ZIGZAG])
            grid.append(row)
        grids.append(grid)
    return grids, h, w


def _encode_ac_band(out: _BitWriterMSB, zz, ss: int, se: int, al: int = 0) -> None:
    """Spectral-selection AC first pass for one block: point transform
    truncates magnitudes (T.81 G.1.2.2: v/2^Al toward zero), EOBRUN=1
    EOBs."""
    run = 0
    for k in range(ss, se + 1):
        t = abs(zz[k]) >> al
        if t == 0:
            run += 1
            continue
        v = t if zz[k] >= 0 else -t
        while run >= 16:
            code, ln = _AC_CODES[0xF0]
            out.write(code, ln)
            run -= 16
        s, bits = _amplitude(v)
        code, ln = _AC_CODES[(run << 4) | s]
        out.write(code, ln)
        out.write(bits, s)
        run = 0
    if run:
        code, ln = _AC_CODES[0x00]  # EOB (EOBRUN of exactly 1)
        out.write(code, ln)


def _encode_ac_band_refine(
    out: _BitWriterMSB, zz, ss: int, se: int, al: int
) -> None:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / the libjpeg encode_mcu_AC_refine shape): newly
    significant coefficients as (run, 1) + sign bit, correction bits
    for already-significant coefficients appended after each symbol,
    EOB followed by the tail's correction bits."""
    run = 0
    pending: list[int] = []

    def flush():
        for b in pending:
            out.write(b, 1)
        pending.clear()

    # last newly-significant position: ZRLs past it fold into the EOB
    # (the jcphuff.c "but not if they can be folded into EOB" rule,
    # which also keeps the flushed correction bits a correct prefix)
    eob_k = ss - 1
    for k in range(ss, se + 1):
        if (abs(zz[k]) >> al) == 1:
            eob_k = k
    for k in range(ss, se + 1):
        t = abs(zz[k]) >> al
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob_k:
            code, ln = _AC_CODES[0xF0]
            out.write(code, ln)
            flush()
            run -= 16
        if t > 1:  # already significant: correction bit only
            pending.append(t & 1)
            continue
        # newly significant (t == 1)
        code, ln = _AC_CODES[(run << 4) | 1]
        out.write(code, ln)
        out.write(1 if zz[k] > 0 else 0, 1)
        flush()
        run = 0
    if run or pending:
        code, ln = _AC_CODES[0x00]  # EOB
        out.write(code, ln)
        flush()


def encode_jpeg_progressive(pixels, quality: int = 90) -> bytes:
    """REAL progressive JFIF writer (SOF2, 4:4:4): a 2-pass DC
    successive approximation (first pass at Al=1, then a raw-bit
    refinement scan at Ah=1) followed by per-component
    spectral-selection AC scans (bands 1-5 and 6-63) — the classic
    progressive scan script shape. Decoded by the same
    ``decode_jpeg_pixels`` to the IDENTICAL pixels as an equivalent
    sequential stream of the same coefficients (pinned by tests)."""
    grids, h, w = _component_zz_blocks(pixels, quality)
    qt = _quant_tables(quality)
    zz_q = [
        bytes([tq]) + bytes(int(qt[tq][r][c]) for r, c in _ZIGZAG)
        for tq in (0, 1)
    ]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    head = (
        b"\xff\xd8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _marker(0xDB, zz_q[0])
        + _marker(0xDB, zz_q[1])
        + _marker(0xC2, sof)
        + _marker(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
        + _marker(0xC4, _dht_body(1, 0, _AC_BITS, _AC_VALS))
        + _marker(0xC4, _dht_body(0, 1, _DC_BITS, _DC_VALS))
        + _marker(0xC4, _dht_body(1, 1, _AC_BITS, _AC_VALS))
    )
    bh, bw_ = len(grids[0]), len(grids[0][0])
    scans = []

    def sos(comp_specs, ss, se, ah, al):
        body = bytes([len(comp_specs)])
        for cid, tdta in comp_specs:
            body += bytes([cid, tdta])
        return _marker(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: interleaved DC first pass, Al=1
    out = _BitWriterMSB()
    preds = [0, 0, 0]
    for br in range(bh):
        for bc in range(bw_):
            for ci in range(3):
                v = grids[ci][br][bc][0] >> 1
                s, bits = _amplitude(v - preds[ci])
                code, ln = _DC_CODES[s]
                out.write(code, ln)
                if s:
                    out.write(bits, s)
                preds[ci] = v
    out.pad_to_byte()
    scans.append(
        sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 1) + bytes(out.buf)
    )
    # scan 2: interleaved DC refinement, Ah=1 Al=0 (raw bits)
    out = _BitWriterMSB()
    for br in range(bh):
        for bc in range(bw_):
            for ci in range(3):
                out.write(grids[ci][br][bc][0] & 1, 1)
    out.pad_to_byte()
    scans.append(
        sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0) + bytes(out.buf)
    )
    # scans 3+: per-component spectral-selection AC bands, each as a
    # successive-approximation pair (first pass at Al=1, refinement at
    # Ah=1 -> Al=0) — the full progressive grammar the decoder covers
    for ci, cid in enumerate((1, 2, 3)):
        ta = 0 if ci == 0 else 1
        for ss, se in ((1, 5), (6, 63)):
            out = _BitWriterMSB()
            for br in range(bh):
                for bc in range(bw_):
                    _encode_ac_band(out, grids[ci][br][bc], ss, se, al=1)
            out.pad_to_byte()
            scans.append(sos([(cid, ta)], ss, se, 0, 1) + bytes(out.buf))
    for ci, cid in enumerate((1, 2, 3)):
        ta = 0 if ci == 0 else 1
        for ss, se in ((1, 5), (6, 63)):
            out = _BitWriterMSB()
            for br in range(bh):
                for bc in range(bw_):
                    _encode_ac_band_refine(out, grids[ci][br][bc], ss, se, al=0)
            out.pad_to_byte()
            scans.append(sos([(cid, ta)], ss, se, 1, 0) + bytes(out.buf))
    return head + b"".join(scans) + b"\xff\xd9"


def _encode_zz_block(out: _BitWriterMSB, zz, pred: int) -> int:
    """``_encode_block`` over an already-zigzagged 64-vector (the
    ``_component_zz_blocks`` representation). Returns the new DC
    predictor."""
    diff = int(zz[0]) - pred
    s, bits = _amplitude(diff)
    code, ln = _DC_CODES[s]
    out.write(code, ln)
    if s:
        out.write(bits, s)
    run = 0
    for v in zz[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_CODES[0xF0]
            out.write(code, ln)
            run -= 16
        s, bits = _amplitude(v)
        code, ln = _AC_CODES[(run << 4) | s]
        out.write(code, ln)
        out.write(bits, s)
        run = 0
    if run:
        code, ln = _AC_CODES[0x00]
        out.write(code, ln)
    return int(zz[0])


def encode_jpeg_multiscan(pixels, quality: int = 90) -> bytes:
    """Baseline (SOF0, 4:4:4) JFIF writer emitting ONE NON-INTERLEAVED
    SCAN PER COMPONENT — a legal sequential form (T.81 B.2.3 allows
    1-4 components per scan; libjpeg reads these). Quantized
    coefficients are identical to ``encode_jpeg(pixels, quality)``'s,
    so decoding both to the same pixels pins the decoder's multi-scan
    sequential path (the marker walk must continue past the first SOS
    to EOI or chroma comes back flat)."""
    grids, h, w = _component_zz_blocks(pixels, quality)
    qt = _quant_tables(quality)
    zz_q = [
        bytes([tq]) + bytes(int(qt[tq][r][c]) for r, c in _ZIGZAG)
        for tq in (0, 1)
    ]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    head = (
        b"\xff\xd8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _marker(0xDB, zz_q[0])
        + _marker(0xDB, zz_q[1])
        + _marker(0xC0, sof)
        + _marker(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
        + _marker(0xC4, _dht_body(1, 0, _AC_BITS, _AC_VALS))
        + _marker(0xC4, _dht_body(0, 1, _DC_BITS, _DC_VALS))
        + _marker(0xC4, _dht_body(1, 1, _AC_BITS, _AC_VALS))
    )
    bh, bw_ = len(grids[0]), len(grids[0][0])
    scans = []
    for ci, cid in enumerate((1, 2, 3)):
        td_ta = 0x00 if ci == 0 else 0x11
        out = _BitWriterMSB()
        pred = 0
        for br in range(bh):
            for bc in range(bw_):
                pred = _encode_zz_block(out, grids[ci][br][bc], pred)
        out.pad_to_byte()
        sos = bytes([1, cid, td_ta, 0, 63, 0])
        scans.append(_marker(0xDA, sos) + bytes(out.buf))
    return head + b"".join(scans) + b"\xff\xd9"


def encode_gif_animated(frames, delay_ms: int = 100) -> bytes:
    """REAL animated GIF89a writer: frames share one global color
    table; frame 0 is full, later frames are delta-encoded as the
    bounding box of changed pixels with unchanged pixels marked
    transparent (the classic inter-frame GIF optimization), each
    preceded by a Graphic Control Extension carrying the delay and a
    transparency index. Exercises the decoder's compositing path for
    real."""
    import numpy as np

    if not frames:
        raise ValueError("need at least one frame")
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    n, h, w, _ = stack.shape
    packed = (
        stack[:, :, :, 0].astype(np.int64) << 16
        | stack[:, :, :, 1].astype(np.int64) << 8
        | stack[:, :, :, 2].astype(np.int64)
    )
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 255:  # one slot reserved for transparency
        raise ValueError(f"animated GIF here supports <=255 colors, got {len(colors)}")
    idx = inverse.reshape(n, h, w)
    trans = len(colors)  # transparent index, one past the palette
    ncolors = trans + 1
    bits = max(1, (ncolors - 1).bit_length())
    table_len = 1 << bits
    gct = bytearray()
    for c in colors:
        gct.extend((int(c) >> 16 & 0xFF, int(c) >> 8 & 0xFF, int(c) & 0xFF))
    gct.extend(b"\x00" * (3 * (table_len - len(colors))))
    min_code_size = max(2, bits)
    delay_cs = max(1, delay_ms // 10)
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | (bits - 1), 0, 0)
        + bytes(gct)
    )
    for f in range(n):
        # packed GCE field: disposal 1 (leave), transparency flag on
        # delta frames
        gce = bytes(
            [0x21, 0xF9, 4, (1 << 2) | (1 if f else 0)]
        ) + delay_cs.to_bytes(2, "little") + bytes([trans if f else 0, 0])
        out += gce
        if f == 0:
            sub = idx[0]
            left = top = 0
        else:
            diff = idx[f] != idx[f - 1]
            if not diff.any():
                left = top = 0
                sub = np.full((1, 1), trans, dtype=np.int64)
            else:
                rows = np.nonzero(diff.any(axis=1))[0]
                cols = np.nonzero(diff.any(axis=0))[0]
                top, bot = int(rows[0]), int(rows[-1]) + 1
                left, right = int(cols[0]), int(cols[-1]) + 1
                sub = np.where(
                    diff[top:bot, left:right],
                    idx[f][top:bot, left:right],
                    trans,
                )
        ih, iw = sub.shape
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        out += bytes([min_code_size])
        out += _sub_blocks(_lzw_compress(sub.reshape(-1), min_code_size))
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """REAL animated-GIF decode with compositing: walks every image
    descriptor, honors each frame's Graphic Control Extension
    (delay, transparency index, disposal: leave / restore-background /
    restore-previous), and composites onto the logical-screen canvas.
    Returns (frames, delays_ms) — frames as (H, W, 3) uint8 RGB
    snapshots after each draw — or None for malformed payloads.
    ``decode_gif_pixels`` remains the single-frame fast path."""
    import numpy as np

    if len(payload) < 14 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct = None
        if packed & 0x80:
            size = 1 << ((packed & 7) + 1)
            gct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * size, offset=pos
            ).reshape(size, 3)
            pos += 3 * size
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
        if gct is not None and bg < len(gct):
            canvas[:, :] = gct[bg]
        background = canvas.copy()
        frames: list = []
        delays: list[int] = []
        delay_ms = 0
        transparent = -1
        disposal = 0
        while pos < len(payload):
            block = payload[pos]
            if block == 0x21:
                label = payload[pos + 1]
                pos += 2
                if label == 0xF9 and payload[pos] >= 4:
                    gpacked = payload[pos + 1]
                    disposal = (gpacked >> 2) & 7
                    delay_ms = (
                        int.from_bytes(payload[pos + 2 : pos + 4], "little") * 10
                    )
                    transparent = payload[pos + 4] if gpacked & 1 else -1
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif block == 0x2C:
                left, top, iw, ih, ipacked = struct.unpack(
                    "<HHHHB", payload[pos + 1 : pos + 10]
                )
                pos += 10
                ct = gct
                if ipacked & 0x80:
                    size = 1 << ((ipacked & 7) + 1)
                    ct = np.frombuffer(
                        payload, dtype=np.uint8, count=3 * size, offset=pos
                    ).reshape(size, 3)
                    pos += 3 * size
                if ct is None or iw == 0 or ih == 0:
                    return None
                min_code_size = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    data.extend(payload[pos + 1 : pos + 1 + ln])
                    pos += 1 + ln
                pos += 1
                if min_code_size < 2 or min_code_size > 11:
                    return None
                raw = _lzw_decompress(bytes(data), min_code_size, iw * ih)
                if raw is None or len(raw) < iw * ih:
                    return None
                grid = np.asarray(raw[: iw * ih], dtype=np.int64).reshape(ih, iw)
                if ipacked & 0x40:
                    order = _interlace_order(ih)
                    de = np.empty_like(grid)
                    de[order] = grid
                    grid = de
                opaque = (
                    grid != transparent
                    if transparent >= 0
                    else np.ones_like(grid, dtype=bool)
                )
                if np.any(grid[opaque] >= len(ct)):
                    return None
                prev = canvas.copy() if disposal == 3 else None
                region = canvas[top : top + ih, left : left + iw]
                safe = grid[: region.shape[0], : region.shape[1]]
                safe_op = opaque[: region.shape[0], : region.shape[1]]
                region[safe_op] = ct[np.clip(safe, 0, len(ct) - 1)][safe_op]
                frames.append(canvas.copy())
                delays.append(delay_ms)
                if max_frames is not None and len(frames) >= max_frames:
                    return frames, delays
                if disposal == 2:
                    canvas[top : top + ih, left : left + iw] = background[
                        top : top + ih, left : left + iw
                    ]
                elif disposal == 3 and prev is not None:
                    canvas = prev
                transparent = -1
                disposal = 0
                delay_ms = 0
            elif block == 0x3B:
                break
            else:
                return None
        return (frames, delays) if frames else None
    except (IndexError, ValueError, struct.error):
        return None


# ---------------------------------------------------------------------------
# TIFF-LZW (TIFF 6.0 §13): byte-alphabet LZW, codes packed MSB-first,
# with the "early change" quirk — the code width grows one code
# EARLIER than in GIF's variant (at 2^w - 1, not 2^w). ClearCode=256,
# EOI=257.
# ---------------------------------------------------------------------------


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compress (early change, MSB-first)."""
    out = _BitWriterMSB()  # MSB-first, but NO 0xFF stuffing wanted
    out_bits: list[tuple[int, int]] = []

    def emit(code: int, width: int) -> None:
        out_bits.append((code, width))

    CLEAR, EOI = 256, 257

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    emit(CLEAR, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # early change: the encoder runs one table entry ahead of the
        # decoder, so its width bump lands at 2^w where the decoder's
        # lands at 2^w - 1
        if next_code == (1 << width) and width < 12:
            width += 1
        prefix = bytes([b])
        if next_code == 4094:  # libtiff's CODE_MAX-1 clear point
            emit(CLEAR, width)
            table, next_code, width = fresh()
    if prefix:
        emit(table[prefix], width)
    emit(EOI, width)
    # pack MSB-first without byte stuffing
    buf = bytearray()
    acc = nbits = 0
    for code, w_ in out_bits:
        acc = (acc << w_) | code
        nbits += w_
        while nbits >= 8:
            buf.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def tiff_lzw_decode(data: bytes, expected: int) -> bytes | None:
    """TIFF-variant LZW decompress; None on malformed stream."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = pos = 0
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out[:expected]) if len(out) >= expected else None
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table) or code > 255:
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            return None
        out.extend(entry)
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:  # early change
                width += 1
        prev = entry
    return bytes(out[:expected]) if len(out) >= expected else None


# ---------------------------------------------------------------------------
# Sun-AU (.au/.snd, Sun Microsystems; public format, the classic Unix
# / Java telephony container): 24-byte big-endian header + raw G.711
# or PCM payload — all codecs already implemented above.
# ---------------------------------------------------------------------------

_AU_MAGIC = b".snd"


def encode_au(samples, sample_rate: int = 8000, encoding: int = 1) -> bytes:
    """REAL Sun-AU writer: int16 samples -> .au in mu-law (encoding 1),
    16-bit big-endian PCM (3), or A-law (27), mono."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if encoding == 1:
        data = ulaw_encode(s).tobytes()
    elif encoding == 3:
        data = s.astype(">i2").tobytes()
    elif encoding == 27:
        data = alaw_encode(s).tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    return (
        _AU_MAGIC
        + (24).to_bytes(4, "big")  # data offset
        + len(data).to_bytes(4, "big")
        + encoding.to_bytes(4, "big")
        + sample_rate.to_bytes(4, "big")
        + (1).to_bytes(4, "big")  # channels
        + data
    )


def decode_au_samples(payload: bytes):
    """REAL Sun-AU decode: (int16 samples, rate, channels) for mu-law /
    A-law / 8-bit linear / 16-bit big-endian PCM payloads; None for
    other encodings (ADPCM-in-AU, float) or malformed headers."""
    import numpy as np

    if len(payload) < 24 or payload[:4] != _AU_MAGIC:
        return None
    offset = int.from_bytes(payload[4:8], "big")
    size = int.from_bytes(payload[8:12], "big")
    encoding = int.from_bytes(payload[12:16], "big")
    rate = int.from_bytes(payload[16:20], "big")
    channels = int.from_bytes(payload[20:24], "big")
    if offset < 24 or not rate or not channels:
        return None
    data = payload[offset:]
    if size != 0xFFFFFFFF:
        data = data[:size]
    if encoding == 1:
        out = ulaw_decode(data)
    elif encoding == 27:
        out = alaw_decode(data)
    elif encoding == 2:  # 8-bit linear PCM (signed)
        out = (
            np.frombuffer(data, dtype=np.int8).astype(np.int16) << 8
        )
    elif encoding == 3:  # 16-bit big-endian PCM
        out = np.frombuffer(data[: len(data) & ~1], dtype=">i2").astype(
            np.int16
        )
    else:
        return None
    return out, rate, channels


# ---------------------------------------------------------------------------
# ICO (Windows icon container; public format, ubiquitous in web-crawl
# corpora as favicons): a directory of images, each either a PNG
# payload (Vista+) or a headerless BMP DIB with doubled height
# (XOR pixels + AND mask). Both inner formats are already implemented.
# ---------------------------------------------------------------------------


def encode_ico(images) -> bytes:
    """REAL ICO writer: a list of (H, W, 3) uint8 RGB arrays -> an icon
    container holding each as an embedded PNG entry (the modern form;
    dimension bytes are 0 for 256)."""
    from .multimodal import encode_png

    payloads = [encode_png(px) for px in images]
    dims = [(px.shape[1], px.shape[0]) for px in images]
    out = bytearray(struct.pack("<HHH", 0, 1, len(payloads)))
    off = 6 + 16 * len(payloads)
    for (w, h), p in zip(dims, payloads):
        out += struct.pack(
            "<BBBBHHII",
            w if w < 256 else 0,
            h if h < 256 else 0,
            0, 0, 1, 32, len(p), off,
        )
        off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def decode_ico_pixels(payload: bytes):
    """REAL ICO decode: picks the largest directory entry and decodes
    it — PNG entries via ``decode_png_pixels``, classic DIB entries by
    reconstructing a BMP header around the XOR block (the stored
    height is doubled for the AND mask; 24/32-bit DIBs only). Returns
    (H, W, 3) uint8 RGB or None."""
    import numpy as np

    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        return None
    try:
        count = int.from_bytes(payload[4:6], "little")
        if not count:
            return None
        best = None
        for k in range(count):
            e = payload[6 + 16 * k : 22 + 16 * k]
            if len(e) != 16:
                return None
            w = e[0] or 256
            h = e[1] or 256
            size = int.from_bytes(e[8:12], "little")
            off = int.from_bytes(e[12:16], "little")
            if best is None or w * h > best[0] * best[1]:
                best = (w, h, size, off)
        w, h, size, off = best
        body = payload[off : off + size]
        if len(body) != size:
            return None
        from .multimodal import decode_png_pixels

        px = decode_png_pixels(body)
        if px is not None:
            return px
        # classic DIB: BITMAPINFOHEADER with doubled height; rebuild a
        # BMP file around the XOR block and reuse the BMP decoder
        if len(body) < 40:
            return None
        hdr_size = int.from_bytes(body[0:4], "little")
        if hdr_size != 40:
            return None
        dib_h = int.from_bytes(body[8:12], "little", signed=True)
        bpp = int.from_bytes(body[14:16], "little")
        if bpp not in (24, 32):
            return None
        # halve the doubled height and drop the AND mask rows
        xor_h = abs(dib_h) // 2
        stride = (w * (bpp // 8) + 3) & ~3
        patched = bytearray(body)
        patched[8:12] = xor_h.to_bytes(4, "little", signed=True)
        pixel_bytes = 40 + stride * xor_h
        bmp = (
            b"BM"
            + (14 + pixel_bytes).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")
            + bytes(patched[:pixel_bytes])
        )
        return decode_bmp_pixels_compat(bmp)
    except (IndexError, ValueError, struct.error):
        return None


def decode_bmp_pixels_compat(payload: bytes):
    """Local import shim so the ICO path reuses multimodal's BMP
    decoder without a circular module import at load time."""
    from .multimodal import decode_bmp_pixels

    return decode_bmp_pixels(payload)
