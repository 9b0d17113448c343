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
_DEFAULT_ROOT = "/tmp/dais2021_spark_fixtures"


def image_fixture_dir(root: str | None = None) -> str:
    """Create (idempotently) the deterministic image tree; returns the
    `flower_photos` directory path."""
    root = root or os.environ.get("SPARK_GRAFT_FIXTURE_DIR", _DEFAULT_ROOT)
    base = Path(root) / "flower_photos"
    marker = base / ".complete"
    if marker.exists():
        return str(base)
    for li, label in enumerate(LABELS):
        d = base / label
        d.mkdir(parents=True, exist_ok=True)
        for i in range(IMAGES_PER_LABEL):
            # deterministic size + gray seed per (label, index)
            w, h = 8 + li, 8 + i
            (d / f"img_{li}_{i}.png").write_bytes(make_png(w, h, gray=li * 40 + i * 7))
    marker.write_text("ok")
    return str(base)
