"""Import every query module so the registry is fully populated.

`__spark_entry__.py`, bench.py, and the tests all import this module to
get the complete driver-contract surface.
"""

from __future__ import annotations

from . import queries_relational  # noqa: F401
from . import queries_functions  # noqa: F401

# Populated in later build steps (SURVEY.md §7):
for _mod in ("queries_llm", "queries_pyboundary", "queries_streaming"):
    try:  # pragma: no cover - best-effort during incremental build
        __import__(f"{__package__}.{_mod}")
    except ImportError:
        pass

from .registry import REGISTRY, headline_queries, oracle_sql, queries  # noqa: F401,E402
