"""Minimal PNG codec in pure stdlib (zlib + struct), public spec
(RFC 2083 / www.w3.org/TR/png): signature, chunk framing, IHDR/PLTE/
IDAT/IEND, all five scanline filters, 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced.

This exists because the container has no image libraries (no Pillow /
opencv), yet the multimodal pipeline (SURVEY §2.11) needs a REAL decode
step to be exercised end-to-end. A production deployment swaps
``decode_png`` for libpng-backed decoding; the Spark-side plumbing in
``operators/multimodal.py`` is unchanged by that swap.

Perf note: unfiltering is numpy-vectorized per scanline except the
inherently sequential Sub/Paeth carry, which runs per-pixel across a
row slice — adequate for thumbnail-scale payloads in an Arrow batch;
big imagery belongs in a native codec.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@dataclass(frozen=True)
class Image:
    """Decoded raster: ``pixels`` is (height, width, channels) uint8;
    palette images are expanded to RGB."""

    width: int
    height: int
    channels: int
    pixels: np.ndarray


def _chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        yield ctype, body
        i += 12 + length  # len + type + body + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.intp)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub (sequential carry in x)
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> Image:
    """PNG bytes → :class:`Image` (8-bit, non-interlaced)."""
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("missing IHDR")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    flat = _unfilter(raw, width, height, bpp)
    pixels = flat.reshape(height, width, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        pixels = palette[pixels[:, :, 0]]
        bpp = 3
    return Image(width=width, height=height, channels=bpp, pixels=pixels)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes (filter 0 rows,
    gray/gray-alpha/RGB/RGBA by channel count)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: Image, out_w: int, out_h: int) -> Image:
    """Nearest-neighbor resize (the deterministic, oracle-friendly
    choice; bilinear belongs to a native codec)."""
    ys = (np.arange(out_h) * img.height // out_h).clip(0, img.height - 1)
    xs = (np.arange(out_w) * img.width // out_w).clip(0, img.width - 1)
    return Image(
        width=out_w,
        height=out_h,
        channels=img.channels,
        pixels=img.pixels[np.ix_(ys, xs)],
    )
