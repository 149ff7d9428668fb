"""Query catalog: every operator from SURVEY.md §2 is exposed as a
named query over the testdata tables, each paired (where SQL can
express it) with a DuckDB oracle string for the correctness harness.

Importing this package populates the registry.
"""

from .registry import REGISTRY, Query, register  # noqa: F401

from . import crm, datapipe, events, mlmetrics, olap, relational  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "all_queries"]


def all_queries() -> dict[str, "Query"]:
    return dict(REGISTRY)
