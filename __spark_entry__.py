"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 plus
the training-data ops, checked against DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (transcripts -> salted
    repartition -> Arrow kernel -> reassembly window) on deterministic
    synthetic transcripts that include the reference golden fixtures,
    plus a scan of the sf0.001 documents table to anchor on driver
    testdata. Returns the per-turn extraction summary."""
    from pyspark.sql import functions as F

    from pdf2gtfs_spark.plans.pipeline import run_extract, turn_csvs
    from pdf2gtfs_spark.sources.transcripts import generate_transcripts

    transcripts, expected = generate_transcripts(
        n_convs=6, base_turns=2, skew_every=5, skew_factor=4)
    tdf = spark.createDataFrame(transcripts)
    edf = spark.createDataFrame(expected)
    extracted = run_extract(tdf, num_partitions=8)
    per_turn = turn_csvs(extracted).join(edf, ["conv_id", "turn_idx"])
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return (per_turn
            .withColumn(
                "match",
                (F.col("extracted_csvs") == F.col("expected_csvs")))
            .select("conv_id", "turn_idx", "n_tables", "n_chars",
                    "malformed", "match")
            .withColumn("n_corpus_docs", F.lit(docs.count()))
            .orderBy("conv_id", "turn_idx"))


# The driver's correctness artifact records at most 50 rows in
# registration order, but the registry holds >50 queries.  Rotate the
# queries with the least driver-green history to the front so every
# registered operator accumulates an externally-verified row across
# rounds (VERDICT r3 ask #1).  Names listed here lead; the rest keep
# registration order.
_PRIORITY = [
    # never (or least recently) captured in a CORRECTNESS_r* artifact:
    "training_data_clean",
    "dedup_connected_components",
    "doc_fingerprint",
    "langid_stopword_vote",
    "quality_score",
    "token_count",
    # new in round 4:
    "locate_route_tail",
    "extract_skewed_salted",
]


def _rotate(mapping: dict) -> dict:
    lead = {k: mapping[k] for k in _PRIORITY if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in lead}
    return {**lead, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pdf2gtfs_spark.operators import QUERIES, load_all

    load_all()
    return _rotate(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    kernel-backed extraction queries -> rows-only check)."""
    from pdf2gtfs_spark.operators import ORACLES, load_all

    load_all()
    return _rotate(dict(ORACLES))
