"""Partitionless-window audit (VERDICT r3 item 5): every
`Window.orderBy(...)` WITHOUT a partitionBy is a single-reducer sort of
its input, which only survives at 100 TB when that input is provably
bounded (post-agg dimension table, post-limit top-k, |bins|/|centroids|
rows). This lint makes the audit permanent: each such site must carry a
`dim-sized window:` comment within the eight preceding lines (or inline)
stating WHY the windowed input is bounded — so a new global window over
data-sized input can't land undocumented, and the grep the verdict asked
for ("only documented/pinned sites") is enforced on every test run.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "dais2021imageprocessingondeltalake_spark"

MARKER = "dim-sized window:"


def _violations() -> list[str]:
    bad: list[str] = []
    for py in sorted(PKG.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if "Window.orderBy(" not in line or "partitionBy" in line:
                continue
            window = "\n".join(lines[max(0, i - 8) : i + 1])
            if MARKER not in window:
                bad.append(f"{py.relative_to(PKG.parent)}:{i + 1}: {line.strip()}")
    return bad


def test_every_partitionless_window_documents_bounded_input():
    bad = _violations()
    assert not bad, (
        "Window.orderBy without partitionBy and without a 'dim-sized "
        "window:' bound justification:\n" + "\n".join(bad)
    )


def test_customer_rank_sites_use_parallel_global_rank():
    """VERDICT r6 item 3: |customers| scales WITH the corpus (TPC-H:
    150k x SF), so q_gini_spend and q_pareto_deciles must rank through
    parallel_global_rank, never a partitionless window — 'dim-sized'
    comments cannot re-justify a global window in these two functions."""
    text = (PKG / "queries_advanced.py").read_text()
    for fn in ("def q_gini_spend", "def q_pareto_deciles"):
        start = text.index(fn)
        end = text.find("\n@query", start)
        body = text[start : end if end != -1 else len(text)]
        assert "parallel_global_rank" in body, f"{fn} lost its scale-safe rank"
        # the 10-row decile cumulative window may stay; a row_number rank
        # over the per-customer table may not
        assert "row_number().over(" not in body.replace(" ", "").replace(
            "F.", ""
        ), f"{fn} reintroduced a windowed rank over per-customer rows"


def test_lint_actually_matches_known_sites():
    """The regex scan must see the known documented sites (guards against
    the lint silently matching nothing after a refactor)."""
    n_sites = 0
    for py in PKG.rglob("*.py"):
        text = py.read_text()
        n_sites += len(
            [
                m
                for m in re.finditer(r"Window\.orderBy\(", text)
                if "partitionBy" not in text[max(0, m.start() - 200) : m.start() + 80]
            ]
        )
    assert n_sites >= 10, f"expected >= 10 partitionless window sites, found {n_sites}"
