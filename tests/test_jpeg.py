"""Baseline JPEG codec tests (sources/jpeg.py): roundtrip fidelity,
header metadata, format guards, and the mixed-format image pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from dais2021imageprocessingondeltalake_spark.sources.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
    jpeg_size,
)


def test_roundtrip_smooth_gradient_tight():
    """Smooth content survives quantization nearly unchanged at q=90."""
    h, w = 24, 33  # non-multiple-of-8 dims exercise edge padding/cropping
    px = np.fromfunction(lambda y, x: (x * 3 + y * 2) % 200 + 20, (h, w)).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(px, quality=90))
    assert dec.shape == (h, w)
    assert float(np.abs(dec.astype(int) - px.astype(int)).mean()) < 2.0


def test_roundtrip_noise_bounded():
    """High-frequency noise is the worst case — error stays bounded."""
    px = np.random.RandomState(7).randint(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(px, quality=90))
    assert float(np.abs(dec.astype(int) - px.astype(int)).mean()) < 8.0


def test_roundtrip_flat_exact():
    px = np.full((8, 8), 128, np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(px, quality=75)) == px).all()


def test_jpeg_size_header_only():
    px = np.zeros((10, 21), np.uint8)
    assert jpeg_size(encode_jpeg_gray(px)) == (21, 10)


def test_rejects_progressive():
    """A SOF2 (progressive) frame must fail loudly, not mis-decode."""
    enc = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    sof = bytes(enc).find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(bytes(enc))


def test_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\nxxxx")


def test_image_size_dispatch():
    from dais2021imageprocessingondeltalake_spark.sources.binaryfiles import (
        image_size,
        make_png,
    )

    assert image_size(make_png(9, 5, gray=10)) == (9, 5)
    assert image_size(encode_jpeg_gray(np.zeros((5, 9), np.uint8))) == (9, 5)
    with pytest.raises(ValueError, match="unsupported"):
        image_size(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")


def test_mixed_format_scan_and_decode(spark):
    """The image-source scan sees PNG + JPEG fixtures through one glob,
    and every payload decodes to its header-declared dimensions."""
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_image
    from dais2021imageprocessingondeltalake_spark.sources.binaryfiles import scan_images
    from dais2021imageprocessingondeltalake_spark.sources.fixtures import (
        IMAGES_PER_LABEL,
        JPEGS_PER_LABEL,
        LABELS,
        image_fixture_dir,
    )

    df = scan_images(spark, image_fixture_dir())
    rows = df.collect()
    assert len(rows) == len(LABELS) * (IMAGES_PER_LABEL + JPEGS_PER_LABEL)
    jpgs = [r for r in rows if r["image"]["origin"].endswith(".jpg")]
    assert len(jpgs) == len(LABELS) * JPEGS_PER_LABEL
    for r in rows[:6] + jpgs[:4]:
        px = decode_image(bytes(r["content"]))
        assert px.shape == (r["image"]["size"]["height"], r["image"]["size"]["width"])
