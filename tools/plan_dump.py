#!/usr/bin/env python
"""Dump .explain("formatted") for headline (or named) registry queries to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence trail
(guide §1: capture the plan shape before and after every change).

Usage:
    python tools/plan_dump.py --suffix before            # all headline queries
    python tools/plan_dump.py --suffix after --queries q_dedup_end2end
    python tools/plan_dump.py --suffix before --tag r11 --sf-dir /root/testdata/sf0.1

Plan capture only PLANS the query (no job execution), except where a query's
fn() itself runs driver-side work at build time (sized miners run their
measured ladder; those are cached per-process, so the dump pays it once).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--queries", nargs="*", default=None,
                    help="subset of query ids (default: every headline query)")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from dais2021imageprocessingondeltalake_spark import queries_all as q
    from dais2021imageprocessingondeltalake_spark.session import get_spark

    out_dir = REPO / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    names = args.queries or sorted(q.headline_queries())
    unknown = [n for n in names if n not in q.REGISTRY]
    if unknown:
        ap.error(f"not registered: {unknown}")

    spark = get_spark(app_name="plan-dump")
    for name in names:
        spec = q.REGISTRY[name]
        df = spec.fn(spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
