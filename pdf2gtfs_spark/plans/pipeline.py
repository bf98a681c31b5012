"""The distributed extraction pipeline (BASELINE.json north_rule).

Dataflow (SURVEY.md §3.1 Spark recast):

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      -> repartition(hash(conv_id, turn_idx))        # salt: per-turn
         the kernel is stateless per turn, so skewed long conversations
         spread across all executors; conv-level grouping happens only
         at the cheap reassembly window afterwards
      -> mapInPandas(extract kernel)                 # Arrow-batched
      -> per-table rows with nested cells/entries/stops
      -> exploded relational outputs (Catalyst-side, codegen)
      -> per-conversation reassembly under
         Window.partitionBy(conv_id).orderBy(turn_idx)

One kernel pass produces every output; the nested row avoids running
the extraction once per output table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pdf2gtfs_spark.config import DEFAULT_CONFIG, ExtractConfig
from pdf2gtfs_spark.kernel.extract import extract_turn
from pdf2gtfs_spark.sources.transcripts import TABLE_SEP

# Grain: one row per (turn, table); turns without tables emit one row
# with table_id NULL so metrics/lineage cover every input turn.
EXTRACT_SCHEMA = (
    "conv_id string, turn_idx int, table_id int, csv_text string, "
    "n_chars int, n_fields int, malformed boolean, "
    "cells array<struct<row_idx:int,col_idx:int,text:string,"
    "row_type:string,col_type:string,"
    "x0:double,y0:double,x1:double,y1:double>>, "
    "entries array<struct<entry_id:int,kind:string,header_text:string,"
    "route_name:string,annotations:array<string>,days:array<string>,"
    "repeat_intervals:array<int>,stop_pos:int,stop_row_idx:int,"
    "stop_name:string,stop_annot:string,is_connection:boolean,"
    "value:string>>, "
    "stops array<struct<stop_pos:int,row_idx:int,stop_name:string,"
    "stop_annot:string,is_connection:boolean>>"
)

_ENTRY_STRUCT_COLS = [
    "entry_id", "kind", "header_text", "route_name", "annotations",
    "days", "repeat_intervals", "stop_pos", "stop_row_idx",
    "stop_name", "stop_annot", "is_connection", "value"]
_STOP_STRUCT_COLS = ["stop_pos", "row_idx", "stop_name", "stop_annot",
                     "is_connection"]
_CELL_STRUCT_COLS = ["row_idx", "col_idx", "text", "row_type", "col_type",
                     "x0", "y0", "x1", "y1"]

# text-surface-only schema (emit="csv"): the per-turn equality surface
# without the nested per-cell detail — Arrow/JVM cost per turn drops
# ~3x, which is what the turns/sec headline measures (BASELINE.json's
# metric is per-turn text equality, not grid shipping)
EXTRACT_SCHEMA_CSV = (
    "conv_id string, turn_idx int, table_id int, csv_text string, "
    "n_chars int, n_fields int, malformed boolean"
)


def make_extract_kernel(cfg: ExtractConfig = DEFAULT_CONFIG,
                        emit: str = "full", with_ts: bool = False):
    """Build the mapInPandas kernel closure (cfg is broadcast by value).

    ``emit``: "full" ships nested cells/entries/stops per table;
    "csv" ships only the text surface (see EXTRACT_SCHEMA_CSV).
    ``with_ts``: pass event time through (streaming reassembly); the
    caller's output schema must then include a ``ts`` field.
    """
    light = emit == "csv"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf2gtfs_spark.kernel.payload import decode_payload_batch

        for pdf in batches:
            out: list[dict] = []
            tss = pdf["ts"] if with_ts else None
            # one vectorized CSV parse for the whole Arrow batch
            # (pyarrow C++ reader) instead of per-line str.split per
            # turn — decode was ~35% of kernel time (guide §4.5)
            decs = decode_payload_batch(list(pdf["text"]))
            for k, (conv_id, turn_idx, payload) in enumerate(zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"])):
                res = extract_turn(payload, cfg, light=light,
                                   decoded=decs[k])
                base = {"conv_id": conv_id, "turn_idx": int(turn_idx),
                        "n_chars": res.n_chars, "n_fields": res.n_fields,
                        "malformed": res.malformed}
                if tss is not None:
                    base["ts"] = tss.iloc[k]
                if not res.tables:
                    row = {**base, "table_id": None, "csv_text": None}
                    if not light:
                        row.update(cells=None, entries=None, stops=None)
                    out.append(row)
                    continue
                for tid, t in enumerate(res.tables):
                    row = {**base, "table_id": tid, "csv_text": t.csv_text}
                    if not light:
                        # allow_extra: Arrow's struct conversion maps
                        # dict keys by name and drops extras, so the
                        # stored records (which carry table_id for the
                        # frame accessors) ship without a per-record
                        # copy (~27% of this kernel, measured)
                        row.update(
                            cells=t.records("cells", _CELL_STRUCT_COLS),
                            entries=t.records("entries",
                                              _ENTRY_STRUCT_COLS,
                                              allow_extra=("table_id",)),
                            stops=t.records("stops", _STOP_STRUCT_COLS,
                                            allow_extra=("table_id",)))
                    out.append(row)
            yield pd.DataFrame(out)

    return kernel


def run_extract(transcripts_df, cfg: ExtractConfig = DEFAULT_CONFIG,
                num_partitions: int | None = None, emit: str = "full"):
    """transcripts -> nested per-table extraction DataFrame.

    The kernel is stateless per turn, so by default it runs directly on
    the scan partitions — shuffling multi-KB payloads before a map-only
    stage would double the stage's I/O for nothing. Pass
    ``num_partitions`` to force a salted repartition on
    (conv_id, turn_idx): needed only when the *input layout* is skewed
    (e.g. one file per conversation with 10^4-turn outliers, SURVEY.md
    §4 item 1); salting at turn grain is safe because no per-conv state
    exists before the reassembly window, which shuffles the far smaller
    extracted rows.

    At 100 TB the scan parallelism comes from Iceberg file splits —
    keep spark.sql.files.maxPartitionBytes small enough that wide
    payload rows still yield >= 2-3 splits per executor core.
    """
    from pyspark.sql import functions as F

    df = transcripts_df
    if num_partitions:
        df = df.repartition(num_partitions, F.col("conv_id"),
                            F.col("turn_idx"))
    schema = EXTRACT_SCHEMA if emit == "full" else EXTRACT_SCHEMA_CSV
    return df.mapInPandas(make_extract_kernel(cfg, emit=emit), schema)


def cells_table(extracted):
    """Exploded per-cell grid (FIXTURES.md §4)."""
    from pyspark.sql import functions as F

    return (extracted
            .where(F.col("table_id").isNotNull())
            .select("conv_id", "turn_idx", "table_id",
                    F.explode("cells").alias("c"))
            .select("conv_id", "turn_idx", "table_id", "c.*"))


def entries_table(extracted):
    """Exploded normalized timetable entries (FIXTURES.md §5)."""
    from pyspark.sql import functions as F

    return (extracted
            .where(F.col("table_id").isNotNull())
            .select("conv_id", "turn_idx", "table_id",
                    F.explode("entries").alias("e"))
            .select("conv_id", "turn_idx", "table_id", "e.*"))


def stops_table(extracted):
    from pyspark.sql import functions as F

    return (extracted
            .where(F.col("table_id").isNotNull())
            .select("conv_id", "turn_idx", "table_id",
                    F.explode("stops").alias("s"))
            .select("conv_id", "turn_idx", "table_id", "s.*"))


def turn_csvs(extracted):
    """Per-turn concatenation of table CSVs in deterministic table order
    (the per-turn text-equality surface)."""
    from pyspark.sql import functions as F

    return (extracted
            .groupBy("conv_id", "turn_idx")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("table_id", "csv_text"))),
                        lambda s: s["csv_text"]),
                    TABLE_SEP).alias("extracted_csvs"),
                F.max("n_chars").alias("n_chars"),
                F.max("n_fields").alias("n_fields"),
                F.max(F.col("malformed").cast("int")).cast("boolean")
                .alias("malformed"),
                F.count(F.col("table_id")).alias("n_tables"),
            ))


def reassemble_conversations(extracted):
    """W12: stable per-conversation output under
    Window.partitionBy(conv_id).orderBy(turn_idx) — implemented as a
    sort_array over collected (turn_idx, table_id) structs, which is a
    single conv-grain shuffle with map-side partial aggregation (no
    second windowing pass)."""
    from pyspark.sql import functions as F

    per_turn = turn_csvs(extracted)
    return (per_turn
            .groupBy("conv_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("turn_idx", "extracted_csvs"))),
                        lambda s: s["extracted_csvs"]),
                    "\n\x1e\n").alias("conversation_doc"),
                F.count("*").alias("n_turns"),
                F.sum("n_tables").alias("n_tables"),
            ))


def match_rate(extracted, expected_df):
    """Per-turn text equality vs ground truth; returns (per_turn, rate).

    expected_df: (conv_id, turn_idx, expected_csvs).
    """
    from pyspark.sql import functions as F

    per_turn = turn_csvs(extracted).join(
        expected_df, ["conv_id", "turn_idx"], "full_outer")
    per_turn = per_turn.withColumn(
        "match",
        F.coalesce(F.col("extracted_csvs") == F.col("expected_csvs"),
                   F.lit(False)))
    rate = per_turn.agg(
        F.avg(F.col("match").cast("double")).alias("match_rate"))
    return per_turn, rate
