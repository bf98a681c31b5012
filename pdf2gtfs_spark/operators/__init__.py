"""Operator library exposed through __spark_entry__.queries().

Each operator from SURVEY.md §2 (plus the training-data-pipeline ops)
is registered as a (spark_fn, oracle_sql) pair; the driver runs both at
sf=0.01 and value-hash-compares the results. Registration helper keeps
names/aliases in one place so Spark and DuckDB column names never
drift.
"""

from __future__ import annotations

from typing import Callable, Optional

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: Callable):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import all operator modules so their registrations run."""
    from pdf2gtfs_spark.operators import (  # noqa: F401
        feed, gtfs, htmlstrip, locate, locate_route, multimodal, osm,
        relational, scalars, textops,
    )
