"""Regenerate the arithmetic-JPEG interop fixtures (tests/data/arith/).

DEV-ONLY: drives the SYSTEM libjpeg (libjpeg-turbo, the reference JPEG
implementation) through ctypes to produce REAL arithmetic-coded JPEGs
(SOF9/SOF10 + DAC) paired with Huffman twins of the SAME quantized
coefficients. The committed fixtures let the test suite prove interop
(our decoder vs the reference encoder) without any codec library at
test time. Generated with libjpeg-turbo 2.1.5 (libjpeg.so.62).

Struct-size discovery is empirical (the library reports its own sizes
in the "parameter struct mismatch" error); the handful of field
offsets used (image_width .. in_color_space, arith_code,
restart_interval) are the stable v6.2-ABI prefix, sanity-checked after
jpeg_set_defaults.

Usage:  python tests/tools/gen_arith_fixtures.py  (from the repo root)
"""
from __future__ import annotations

import ctypes
import os
import struct
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
CSIZE, DSIZE = 520, 632  # jpeg_{compress,decompress}_struct, v62 ABI
OUT = os.path.join(os.path.dirname(__file__), "..", "data", "arith")

LJ = ctypes.CDLL(LIB)
LJ.jpeg_std_error.restype = ctypes.c_void_p
LJ.jpeg_std_error.argtypes = [ctypes.c_void_p]
_EXITFUNC = ctypes.CFUNCTYPE(None, ctypes.c_void_p)
_KEEPALIVE = []


def _make_err():
    err = ctypes.create_string_buffer(512)
    LJ.jpeg_std_error(ctypes.cast(err, ctypes.c_void_p))

    def on_error(cinfo):
        buf = ctypes.create_string_buffer(200)
        fmt = int.from_bytes(err.raw[24:32], "little")  # format_message
        ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_char_p)(fmt)(cinfo, buf)
        print("libjpeg error:", buf.value.decode(), flush=True)
        os._exit(3)

    cb = _EXITFUNC(on_error)
    _KEEPALIVE.append(cb)
    for i, b in enumerate(ctypes.cast(cb, ctypes.c_void_p).value.to_bytes(8, "little")):
        err[i] = b
    return err


def compress(raw, w, h, quality=90, arith=True, progressive=False,
             restart=0, gray=False):
    err = _make_err()
    cinfo = ctypes.create_string_buffer(CSIZE)
    struct.pack_into("<Q", cinfo, 0,
                     ctypes.cast(ctypes.cast(err, ctypes.c_void_p),
                                 ctypes.c_void_p).value)
    LJ.jpeg_CreateCompress.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]
    LJ.jpeg_CreateCompress(ctypes.cast(cinfo, ctypes.c_void_p), 62, CSIZE)
    outbuf, outsize = ctypes.c_void_p(None), ctypes.c_ulong(0)
    LJ.jpeg_mem_dest.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 2
    LJ.jpeg_mem_dest(ctypes.cast(cinfo, ctypes.c_void_p),
                     ctypes.byref(outbuf), ctypes.byref(outsize))
    struct.pack_into("<I", cinfo, 48, w)
    struct.pack_into("<I", cinfo, 52, h)
    struct.pack_into("<i", cinfo, 56, 1 if gray else 3)
    struct.pack_into("<i", cinfo, 60, 1 if gray else 2)  # GRAYSCALE / RGB
    LJ.jpeg_set_defaults.argtypes = [ctypes.c_void_p]
    LJ.jpeg_set_defaults(ctypes.cast(cinfo, ctypes.c_void_p))
    assert struct.unpack_from("<i", cinfo, 72)[0] == 8  # data_precision
    assert struct.unpack_from("<i", cinfo, 76)[0] == (1 if gray else 3)
    LJ.jpeg_set_quality.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    LJ.jpeg_set_quality(ctypes.cast(cinfo, ctypes.c_void_p), quality, 1)
    if arith:
        struct.pack_into("<i", cinfo, 260, 1)  # arith_code
    if restart:
        struct.pack_into("<I", cinfo, 280, restart)  # restart_interval
    if progressive:
        LJ.jpeg_simple_progression.argtypes = [ctypes.c_void_p]
        LJ.jpeg_simple_progression(ctypes.cast(cinfo, ctypes.c_void_p))
    LJ.jpeg_start_compress.argtypes = [ctypes.c_void_p, ctypes.c_int]
    LJ.jpeg_start_compress(ctypes.cast(cinfo, ctypes.c_void_p), 1)
    LJ.jpeg_write_scanlines.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint]
    LJ.jpeg_write_scanlines.restype = ctypes.c_uint
    rowbytes = w * (1 if gray else 3)
    for y in range(h):
        row = ctypes.create_string_buffer(
            bytes(raw[y * rowbytes:(y + 1) * rowbytes]), rowbytes)
        rowptr = (ctypes.c_void_p * 1)(ctypes.cast(row, ctypes.c_void_p))
        assert LJ.jpeg_write_scanlines(
            ctypes.cast(cinfo, ctypes.c_void_p), rowptr, 1) == 1
    LJ.jpeg_finish_compress.argtypes = [ctypes.c_void_p]
    LJ.jpeg_finish_compress(ctypes.cast(cinfo, ctypes.c_void_p))
    data = ctypes.string_at(outbuf, outsize.value)
    LJ.jpeg_destroy_compress.argtypes = [ctypes.c_void_p]
    LJ.jpeg_destroy_compress(ctypes.cast(cinfo, ctypes.c_void_p))
    return data


def main():
    import numpy as np

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260817)
    cases = {
        "seq_rgb": (48, 37, 80, dict()),
        "seq_gray": (17, 24, 85, dict(gray=True)),
        "seq_restart": (40, 32, 75, dict(restart=2)),
        "prog_rgb": (40, 32, 80, dict(progressive=True)),
        "prog_gray": (24, 16, 70, dict(progressive=True, gray=True)),
        "prog_restart": (48, 40, 60, dict(progressive=True, restart=3)),
    }
    for name, (w, h, q, kw) in cases.items():
        shape = (h, w) if kw.get("gray") else (h, w, 3)
        raw = rng.integers(0, 256, shape).astype(np.uint8).tobytes()
        for variant, arith in (("arith", True), ("huff", False)):
            data = compress(raw, w, h, q, arith=arith, **kw)
            path = os.path.join(OUT, f"{name}_{variant}.jpg")
            with open(path, "wb") as f:
                f.write(data)
            print(f"{path}: {len(data)} bytes")


if __name__ == "__main__":
    sys.exit(main())
