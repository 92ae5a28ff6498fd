"""Vectorized single-block MD5 (RFC 1321) over numpy uint32 lanes.

``md5_hash60_windows16`` computes, for every 16-byte sliding window of a
byte string, the SAME 60-bit value as
``int(hashlib.md5(window).hexdigest()[:15], 16)`` — the engine's
portable_hash64 gram key — without a Python call per gram. A 16-byte
message is always a single MD5 block (16B payload + 0x80 pad + zeros +
64-bit bit-length = one 64-byte block), so the whole compression
function runs as 64 fixed rounds of uint32 numpy arithmetic with every
gram in its own SIMD lane; unsigned overflow wraps mod 2^32 exactly as
the spec requires.

Cost model: ~500 elementwise uint32 ops per gram regardless of gram
count, versus ~5 us of interpreter + hashlib object churn per gram for
the scalar form (one md5() construction, one hexdigest string, one
15-char int parse). The digest prefix is reconstructed from the A/B
state words directly: hexdigest[:15] is the big-endian read of the
first 7.5 digest bytes, i.e. (byteswap(A) << 32 | byteswap(B)) >> 4.

Used by the repeated_substring_spans gram map; bit-exactness vs hashlib
is pinned by tests/test_round14.py across ASCII, binary and
non-aligned inputs.
"""

from __future__ import annotations

import math

import numpy as np

_K = np.array(
    [int(abs(math.sin(i + 1.0)) * 4294967296.0) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_S = (
    [7, 12, 17, 22] * 4
    + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4
)
# message-word index per round (RFC 1321 round permutations)
_G = (
    list(range(16))
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)]
)

_A0 = np.uint32(0x67452301)
_B0 = np.uint32(0xEFCDAB89)
_C0 = np.uint32(0x98BADCFE)
_D0 = np.uint32(0x10325476)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def md5_hash60_block16(msgs32: np.ndarray) -> np.ndarray:
    """MD5 of N 16-byte messages given as an (N, 4) little-endian uint32
    word matrix; returns int64 of the top 60 digest bits (= the
    ``hexdigest()[:15]`` base-16 parse)."""
    n = msgs32.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # single-block schedule: words 0-3 payload, 4 = 0x80 pad, 14 = bit length
    m4 = np.uint32(0x80)
    m14 = np.uint32(128)
    zero = np.uint32(0)
    a = np.full(n, _A0, dtype=np.uint32)
    b = np.full(n, _B0, dtype=np.uint32)
    c = np.full(n, _C0, dtype=np.uint32)
    d = np.full(n, _D0, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            g = _G[i]
            mg = msgs32[:, g] if g < 4 else (m4 if g == 4 else (m14 if g == 14 else zero))
            x = a + f + _K[i] + mg
            a, d, c, b = d, c, b, b + _rotl(x, _S[i])
    a = (a + _A0).byteswap()  # digest bytes 0-3 read big-endian
    b = (b + _B0).byteswap()  # digest bytes 4-7
    return (
        ((a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64))
        >> np.uint64(4)
    ).astype(np.int64)


def windows16_words(data: bytes, width: int = 16) -> np.ndarray:
    """The (N, 4) little-endian uint32 word matrix of every ``width``-byte
    sliding window of ``data`` — the input shape ``md5_hash60_block16``
    wants. Split out so a caller hashing MANY strings can concatenate the
    word matrices and run the 64-round kernel ONCE per Arrow batch
    (the kernel's ~500 elementwise ops amortize over lane count; per-doc
    launches pay them per doc)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(buf, width)
    return np.ascontiguousarray(win).view("<u4")


def md5_hash60_windows16(data: bytes, width: int = 16) -> np.ndarray:
    """60-bit MD5 gram keys for every ``width``-byte sliding window of
    ``data`` (``len(data) - width + 1`` of them), vectorized."""
    return md5_hash60_block16(windows16_words(data, width))
