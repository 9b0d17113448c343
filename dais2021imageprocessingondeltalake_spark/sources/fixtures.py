"""Deterministic multimodal fixtures (FIXTURES.md Part 2).

Synthesizes the reference-shaped image directory tree
`flower_photos/<label>/<name>.png` with tiny stdlib-generated PNGs
(FIXTURES.md F1) so the binaryFile scan, path-regex label extraction,
size-struct UDF, grouped-map augmentation, and streaming fixtures all run
without any image library or external dataset.
"""

from __future__ import annotations

import os
from pathlib import Path

from .binaryfiles import make_png

LABELS = ("daisy", "dandelion", "roses", "sunflowers", "tulips")
IMAGES_PER_LABEL = 4
JPEGS_PER_LABEL = 2  # reference parity: tf_flowers is JPEG (`01. Ingest.py:35`)
CLIPS = 8
CLIP_SAMPLES = 1600  # 0.1 s at 16 kHz
_DEFAULT_ROOT = "/tmp/dais2021_spark_fixtures"
_FIXTURE_VERSION = "v2"  # bump when fixture contents change (cached in /tmp)


def image_fixture_dir(root: str | None = None) -> str:
    """Create (idempotently) the deterministic image tree — PNGs plus
    baseline JPEGs (pure-numpy encoder, sources/jpeg.py), mirroring the
    reference's JPEG corpus; returns the `flower_photos` directory path."""
    import numpy as np

    from .jpeg import encode_jpeg_gray

    root = root or os.environ.get("SPARK_GRAFT_FIXTURE_DIR", _DEFAULT_ROOT)
    base = Path(root) / "flower_photos"
    marker = base / ".complete"
    if marker.exists() and marker.read_text() == _FIXTURE_VERSION:
        return str(base)
    for li, label in enumerate(LABELS):
        d = base / label
        d.mkdir(parents=True, exist_ok=True)
        for i in range(IMAGES_PER_LABEL):
            # deterministic size + gray seed per (label, index)
            w, h = 8 + li, 8 + i
            (d / f"img_{li}_{i}.png").write_bytes(make_png(w, h, gray=li * 40 + i * 7))
        for i in range(JPEGS_PER_LABEL):
            w, h = 12 + li, 10 + i
            px = np.fromfunction(
                lambda y, x: (x * (3 + li) + y * (2 + i)) % 200 + 20, (h, w)
            ).astype(np.uint8)
            (d / f"img_{li}_{i}.jpg").write_bytes(encode_jpeg_gray(px, quality=90))
    marker.write_text(_FIXTURE_VERSION)
    return str(base)


def audio_fixture_dir(root: str | None = None) -> str:
    """Deterministic raw-PCM audio tree `audio_clips/clip_<i>.pcm`:
    int16 LE mono sine waves at clip-dependent frequency/amplitude."""
    import math

    root = root or os.environ.get("SPARK_GRAFT_FIXTURE_DIR", _DEFAULT_ROOT)
    base = Path(root) / "audio_clips"
    marker = base / ".complete"
    if marker.exists():
        return str(base)
    base.mkdir(parents=True, exist_ok=True)
    for i in range(CLIPS):
        freq, amp = 110 * (i + 1), 0.2 + 0.1 * (i % 5)
        samples = bytearray()
        for t in range(CLIP_SAMPLES):
            v = int(32767 * amp * math.sin(2 * math.pi * freq * t / 16000))
            samples += v.to_bytes(2, "little", signed=True)
        (base / f"clip_{i}.pcm").write_bytes(bytes(samples))
    marker.write_text("ok")
    return str(base)


TEXTURED_BASES = 12
TEXTURED_VARIANTS = 4  # bases 0..3 get a near-duplicate variant


def textured_image_fixture_dir(root: str | None = None) -> str:
    """Textured PNG corpus for perceptual-hash tests: per-image
    interference pattern px[y,x] = (x*a + y*b) % 256 with image-specific
    frequencies, plus, for the first TEXTURED_VARIANTS bases, a
    near-duplicate variant (same pattern with one corner block
    brightened) — planted ground truth for image near-dup detection.
    Uniform-gray fixtures are useless here: every pixel equals the mean,
    so an average hash degenerates."""
    import numpy as np

    from ..operators.multimodal import encode_png_gray

    root = root or os.environ.get("SPARK_GRAFT_FIXTURE_DIR", _DEFAULT_ROOT)
    base = Path(root) / "textured_photos"
    marker = base / ".complete"
    if marker.exists():
        return str(base)
    base.mkdir(parents=True, exist_ok=True)
    size = 16
    for i in range(TEXTURED_BASES):
        # independent seeded-random textures: expected pairwise aHash
        # hamming ≈ 32 bits, so distinct bases never read as near-dups
        # (structured interference patterns alias under the 8x8
        # downsample and DO collide — learned the hard way)
        px = np.random.RandomState(1000 + i).randint(0, 256, (size, size)).astype(np.uint8)
        (base / f"base_{i}.png").write_bytes(encode_png_gray(px))
        if i < TEXTURED_VARIANTS:
            variant = px.copy()
            variant[:2, :2] = np.minimum(255, variant[:2, :2].astype(int) + 100).astype(
                np.uint8
            )
            (base / f"variant_{i}.png").write_bytes(encode_png_gray(variant))
    marker.write_text("ok")
    return str(base)
