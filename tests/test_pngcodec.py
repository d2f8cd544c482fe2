"""PNG codec + image-feature pipeline tests (SURVEY §2.11 multimodal).

The encoder writes filter-0 rows only, so decoding of filters 1-4 is
exercised against hand-filtered scanlines, not just roundtrips."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from nabatshy_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    image_features,
)
from nabatshy_spark.operators.pngcodec import (
    decode_png,
    encode_png,
    resize_nearest,
)


def _rand(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_color_types(channels):
    arr = _rand((13, 9, channels) if channels > 1 else (13, 9))
    img = decode_png(encode_png(arr))
    expect = arr if arr.ndim == 3 else arr[:, :, None]
    assert (img.height, img.width, img.channels) == (13, 9, channels)
    assert np.array_equal(img.pixels, expect)


def _png_with_filters(rows_and_filters, width, bpp, color_type):
    """Build a PNG whose scanlines use explicit filter types, applying
    the spec's forward-filter transform by hand."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    h = len(rows_and_filters)
    ihdr = struct.pack(">IIBBBBB", width, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(width * bpp, dtype=np.int64)
    for pixels, ftype in rows_and_filters:
        cur = np.asarray(pixels, dtype=np.int64).reshape(-1)
        assert cur.size == width * bpp
        filt = np.zeros_like(cur)
        for x in range(cur.size):
            left = cur[x - bpp] if x >= bpp else 0
            ul = prev[x - bpp] if x >= bpp else 0
            up = prev[x]
            if ftype == 0:
                filt[x] = cur[x]
            elif ftype == 1:
                filt[x] = cur[x] - left
            elif ftype == 2:
                filt[x] = cur[x] - up
            elif ftype == 3:
                filt[x] = cur[x] - ((left + up) >> 1)
            elif ftype == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                filt[x] = cur[x] - pred
        raw += bytes([ftype]) + bytes((filt & 0xFF).astype(np.uint8))
        prev = cur
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_all_filter_types_decode():
    w, bpp = 6, 3
    rows = [(_rand((w, bpp), seed=i), f) for i, f in enumerate([0, 1, 2, 3, 4, 4, 3, 1])]
    data = _png_with_filters(rows, w, bpp, color_type=2)
    img = decode_png(data)
    expect = np.stack([r.reshape(w, bpp) for r, _ in rows])
    assert np.array_equal(img.pixels, expect)


def test_palette_expansion():
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    img = decode_png(data)
    assert img.channels == 3
    assert img.pixels[0, 0].tolist() == [255, 0, 0]
    assert img.pixels[0, 1].tolist() == [0, 255, 0]
    assert img.pixels[1, 0].tolist() == [0, 0, 255]


def test_resize_nearest():
    arr = _rand((8, 8, 3))
    img = decode_png(encode_png(arr))
    small = resize_nearest(img, 4, 4)
    assert (small.height, small.width) == (4, 4)
    assert np.array_equal(small.pixels, arr[::2, ::2])


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_image_features_pipeline(spark):
    """End-to-end: binary PNG payload column → mapInPandas decode →
    dimensions + mean; a poison payload lands in decode_error."""
    payloads = [
        (1, bytearray(encode_png(np.full((4, 6), 10, dtype=np.uint8)))),
        (2, bytearray(encode_png(_rand((3, 5, 4))))),
        (3, bytearray(b"corrupt bytes")),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary").select(
        "doc_id", F.lit("image/png").alias("media_type"), "payload"
    )
    rows = {r.doc_id: r for r in image_features(df).collect()}
    assert rows[1].width == 6 and rows[1].height == 4 and rows[1].channels == 1
    assert rows[1].mean_pixel == 10.0
    assert rows[2].channels == 4
    assert rows[3].decode_error and rows[3].width is None
    assert attach_binary  # plumbing import intact
