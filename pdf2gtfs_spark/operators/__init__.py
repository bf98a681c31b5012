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


def read_scaled(spark, path: str):
    """Parquet scan with scale-adaptive parallelism (guide §2.2/§6).

    A parquet ROW GROUP is the atomic split unit: a single-file table
    written as one row group scans as ONE task no matter how many
    cores the session has (maxPartitionBytes slices the byte range,
    but every slice except the one containing the row-group midpoint
    is empty), which serializes all heavy map-side work hung below the
    scan — measured at sf1.0: the whole 50k-doc shingle explode / HTML
    parse ran in one task on local[32].  When the scan's split count
    is below the session parallelism, redistribute round-robin; on a
    production table (files >> cores) the gate is false and this is a
    zero-cost no-op, so the setting is input-derived, not tuned to
    local[32].
    """
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


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
