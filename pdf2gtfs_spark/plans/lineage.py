"""Lineage + checkpoint/resume (north_rule requirement; FIXTURES.md §7).

The checkpoint unit is a *conversation bucket*: pmod(xxhash64(conv_id),
n_buckets). A run processes pending buckets in groups; after each group
commits its output (parquet append partitioned by bucket), one lineage
row per bucket is appended. A killed job resumes by anti-joining
pending buckets against the committed lineage — finished partitions are
never recomputed (reference precedent: the fingerprinted OSM cache
protocol, locate/osm_fetcher.py:40-100).

On Iceberg this becomes snapshot-id bookkeeping; the sandbox uses
parquet + an input fingerprint column with identical semantics.
"""

from __future__ import annotations

import time
from pathlib import Path

LINEAGE_COLUMNS = (
    "run_id string, input_snapshot_id string, bucket int, "
    "input_rows long, extracted_tables long, malformed_turns long, "
    "started_ts double, committed_ts double"
)


def bucket_col(n_buckets: int):
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


def committed_buckets(spark, lineage_dir: str) -> set[int]:
    p = Path(lineage_dir)
    if not p.exists() or not any(p.glob("*.parquet")):
        return set()
    rows = spark.read.parquet(lineage_dir).select("bucket").distinct()
    return {r["bucket"] for r in rows.collect()}


def run_with_checkpoint(spark, transcripts_df, out_dir: str,
                        run_id: str, input_snapshot_id: str,
                        n_buckets: int = 8, group_size: int = 4,
                        max_groups: int | None = None,
                        cfg=None, num_partitions: int | None = None
                        ) -> list[int]:
    """Process pending buckets in commit groups; returns the buckets
    processed this invocation. ``max_groups`` simulates a mid-run kill
    for resume tests."""
    from pyspark.sql import functions as F

    from pdf2gtfs_spark.config import DEFAULT_CONFIG
    from pdf2gtfs_spark.plans.pipeline import run_extract

    cfg = cfg or DEFAULT_CONFIG
    out = Path(out_dir)
    lineage_dir = str(out / "lineage")
    tables_dir = str(out / "tables")

    done = committed_buckets(spark, lineage_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    groups = [pending[i:i + group_size]
              for i in range(0, len(pending), group_size)]
    if max_groups is not None:
        groups = groups[:max_groups]

    processed: list[int] = []
    with_bucket = transcripts_df.withColumn("bucket", bucket_col(n_buckets))
    for group in groups:
        started = time.time()
        part = with_bucket.where(F.col("bucket").isin(group))
        extracted = run_extract(
            part.select("conv_id", "turn_idx", "text"), cfg,
            num_partitions=num_partitions)
        extracted = extracted.withColumn("bucket", bucket_col(n_buckets))
        # persist: the write and the metrics agg are two actions — without
        # it the kernel (the expensive stage) would run twice per group
        extracted = extracted.persist()
        # commit output first, lineage second: a crash between the two
        # re-processes the group idempotently (same bucket partition is
        # overwritten on retry via dynamic partition overwrite)
        (extracted.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(tables_dir))
        metrics = (extracted.groupBy("bucket").agg(
            F.countDistinct("conv_id", "turn_idx").alias("input_rows"),
            F.count(F.col("table_id")).alias("extracted_tables"),
            F.sum(F.col("malformed").cast("long")).alias("malformed_turns"),
        ).collect())
        rows = [(run_id, input_snapshot_id, m["bucket"], m["input_rows"],
                 m["extracted_tables"], m["malformed_turns"] or 0,
                 started, time.time()) for m in metrics]
        missing = set(group) - {m["bucket"] for m in metrics}
        rows += [(run_id, input_snapshot_id, b, 0, 0, 0, started,
                  time.time()) for b in missing]
        spark.createDataFrame(rows, LINEAGE_COLUMNS).write.mode(
            "append").parquet(lineage_dir)
        extracted.unpersist()
        processed += group
    return processed
