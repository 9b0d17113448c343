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


# ---------------------------------------------------------------------------
# Full PNG decode: all five filters, all 8-bit color types (r6 seam closure)
# ---------------------------------------------------------------------------
def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct as _s
    import zlib as _z

    return (
        _s.pack(">I", len(data))
        + tag
        + data
        + _s.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
    )


def _encode_png_filtered(arr, color_type: int, filter_type: int, plte=None) -> bytes:
    """Reference PNG encoder applying ONE filter type to every scanline —
    the spec's filter definitions written forward, so a decoder that
    inverts them must reproduce `arr` exactly."""
    import struct as _s
    import zlib as _z

    h = arr.shape[0]
    w = arr.shape[1]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    lines = []
    for y in range(h):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = [
                (cur[x] - (cur[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(w * ch)
            ]
        elif filter_type == 2:
            enc = (cur - prior) & 0xFF
        elif filter_type == 3:
            enc = [
                (cur[x] - (((cur[x - bpp] if x >= bpp else 0) + prior[x]) >> 1)) & 0xFF
                for x in range(w * ch)
            ]
        else:  # Paeth
            enc = []
            for x in range(w * ch):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((int(cur[x]) - pred) & 0xFF)
        lines.append(bytes([filter_type]) + bytes(np.asarray(enc, dtype=np.uint8)))
    ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(np.asarray(plte, dtype=np.uint8).ravel()))
    out += _png_chunk(b"IDAT", _z.compress(b"".join(lines)))
    return out + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_decode_every_filter_gray(filter_type):
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(7 + filter_type)
    arr = rng.randint(0, 256, size=(11, 13), dtype=np.uint8)
    png = _encode_png_filtered(arr, color_type=0, filter_type=filter_type)
    assert (decode_png(png) == arr).all()


@pytest.mark.parametrize("color_type,ch", [(2, 3), (4, 2), (6, 4)])
def test_png_decode_color_types_paeth(color_type, ch):
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import (
        decode_png,
        decode_png_gray,
    )

    rng = np.random.RandomState(color_type)
    arr = rng.randint(0, 256, size=(7, 9, ch), dtype=np.uint8)
    png = _encode_png_filtered(arr, color_type=color_type, filter_type=4)
    got = decode_png(png)
    assert (got == arr).all()
    gray = decode_png_gray(png)
    assert gray.shape == (7, 9) and gray.dtype == np.uint8
    if color_type == 4:  # gray+alpha: luma is channel 0 exactly
        assert (gray == arr[:, :, 0]).all()
    else:  # BT.601 integer luma
        rgb = arr[:, :, :3].astype(np.uint32)
        want = ((77 * rgb[:, :, 0] + 150 * rgb[:, :, 1] + 29 * rgb[:, :, 2]) >> 8)
        assert (gray == want.astype(np.uint8)).all()


def test_png_decode_palette():
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(3)
    plte = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(6, 8), dtype=np.uint8)
    png = _encode_png_filtered(idx, color_type=3, filter_type=1, plte=plte)
    assert (decode_png(png) == plte[idx]).all()


def _encode_png_subbyte(samples, depth: int, color_type: int, plte=None) -> bytes:
    """Sub-byte encoder: pack samples MSB-first at `depth` bits each,
    pad rows to byte boundaries (spec §7.2), filter 0."""
    import struct as _s
    import zlib as _z

    h, w = samples.shape
    lines = []
    for y in range(h):
        bits = []
        for x in range(w):
            v = int(samples[y, x])
            bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
        while len(bits) % 8:
            bits.append(0)
        packed = np.packbits(np.array(bits, dtype=np.uint8))
        lines.append(b"\x00" + packed.tobytes())
    ihdr = _s.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(np.asarray(plte, dtype=np.uint8).ravel()))
    out += _png_chunk(b"IDAT", _z.compress(b"".join(lines)))
    return out + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_decode_sub_byte_gray(depth):
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(depth)
    maxv = (1 << depth) - 1
    samples = rng.randint(0, maxv + 1, size=(5, 11), dtype=np.uint8)
    png = _encode_png_subbyte(samples, depth, color_type=0)
    # grayscale presents scaled to 8-bit: max sample -> 255, exact
    assert (decode_png(png) == samples * (255 // maxv)).all()


def test_png_decode_sub_byte_palette():
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(11)
    plte = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(6, 9), dtype=np.uint8)
    png = _encode_png_subbyte(idx, 4, color_type=3, plte=plte)
    assert (decode_png(png) == plte[idx]).all()


def _encode_png16_gray(arr16, filter_type: int) -> bytes:
    """16-bit grayscale encoder: big-endian sample bytes, one filter
    type applied BYTEWISE with bpp=2 (the spec's rule)."""
    import struct as _s
    import zlib as _z

    h, w = arr16.shape
    be = arr16.astype(">u2").tobytes()
    flat = np.frombuffer(be, dtype=np.uint8).reshape(h, w * 2).astype(np.int32)
    bpp = 2
    lines = []
    for y in range(h):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(w * 2, dtype=np.int32)
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = [(cur[x] - (cur[x - bpp] if x >= bpp else 0)) & 0xFF for x in range(w * 2)]
        elif filter_type == 2:
            enc = (cur - prior) & 0xFF
        else:  # Paeth
            enc = []
            for x in range(w * 2):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((int(cur[x]) - pred) & 0xFF)
        lines.append(bytes([filter_type]) + bytes(np.asarray(enc, dtype=np.uint8)))
    ihdr = _s.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 4])
def test_png_decode_16bit_gray(filter_type):
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import (
        decode_png,
        decode_png_gray,
    )

    rng = np.random.RandomState(40 + filter_type)
    arr = rng.randint(0, 65536, size=(9, 7), dtype=np.uint16)
    png = _encode_png16_gray(arr, filter_type)
    got = decode_png(png)
    assert got.dtype == np.uint16 and (got == arr).all()
    assert (decode_png_gray(png) == (arr >> 8).astype(np.uint8)).all()


_ADAM7_TEST = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_png_adam7(arr, color_type: int, filter_type: int) -> bytes:
    """Adam7 reference encoder: extract the seven sub-images on the
    spec grids, filter each independently (reusing the sequential
    filter from _encode_png_filtered via a body-only re-encode),
    concatenate the passes into one IDAT."""
    import struct as _s
    import zlib as _z

    h = arr.shape[0]
    w = arr.shape[1]
    body = b""
    for x0, y0, dx, dy in _ADAM7_TEST:
        sub = arr[y0::dy, x0::dx]
        if sub.ndim == 3:
            sub = sub[:, :, :]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        full = _encode_png_filtered(np.ascontiguousarray(sub), color_type, filter_type)
        # pull the raw (filtered) scanline body back out of the sub-image PNG
        pos, idat = 8, b""
        while pos < len(full):
            (length,) = _s.unpack(">I", full[pos : pos + 4])
            if full[pos + 4 : pos + 8] == b"IDAT":
                idat += full[pos + 8 : pos + 8 + length]
            pos += 12 + length
        body += _z.decompress(idat)
    ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(body))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("color_type,shape", [(0, (13, 11)), (6, (13, 11, 4))])
def test_png_decode_adam7_interlaced(color_type, shape):
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(77 + color_type)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    png = _encode_png_adam7(arr, color_type=color_type, filter_type=4)
    assert (decode_png(png) == arr).all()


def test_png_decode_adam7_tiny_image_skips_empty_passes():
    """A 1x1 interlaced PNG exercises the empty-pass skipping (six of
    the seven Adam7 passes contain no pixels)."""
    from dais2021imageprocessingondeltalake_spark.operators.multimodal import decode_png

    arr = np.array([[123]], dtype=np.uint8)
    png = _encode_png_adam7(arr, color_type=0, filter_type=0)
    assert (decode_png(png) == arr).all()
