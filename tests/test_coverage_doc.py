"""COVERAGE.md is the auditor's entry point — keep it in lockstep with
the registry (the r01 verdict flagged drift here). No SparkSession
needed; pure text checks."""

from __future__ import annotations

import re
from pathlib import Path

from dais2021imageprocessingondeltalake_spark import queries_all as q

COV = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()


def test_every_registry_query_is_documented():
    mentioned = set(re.findall(r"(?<![a-z0-9_])q_[a-z0-9_]+", COV))
    missing = sorted(set(q.REGISTRY) - mentioned)
    assert not missing, f"COVERAGE.md is missing registry queries: {missing}"


def test_no_stale_query_ids():
    mentioned = set(re.findall(r"(?<![a-z0-9_])q_[a-z0-9_]+", COV))
    stale = sorted(m for m in mentioned if m not in q.REGISTRY)
    assert not stale, f"COVERAGE.md mentions unregistered queries: {stale}"


def test_header_counts_match_registry():
    m = re.search(r"Registry: (\d+) queries, (\d+) oracle-checked", COV)
    assert m, "COVERAGE.md header count line missing"
    n_q, n_o = int(m.group(1)), int(m.group(2))
    assert n_q == len(q.REGISTRY), f"header says {n_q}, registry has {len(q.REGISTRY)}"
    n_oracle = sum(1 for s in q.REGISTRY.values() if s.oracle)
    assert n_o == n_oracle, f"header says {n_o}, registry has {n_oracle} oracles"
