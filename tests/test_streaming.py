"""Structured Streaming incremental extraction (Trigger.AvailableNow)."""

from pdf2gtfs_spark.sources.transcripts import generate_transcripts
from pdf2gtfs_spark.streaming.availablenow import (
    TRANSCRIPT_DDL, stream_extract,
)


class TestAvailableNow:
    def test_incremental_exactly_once(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        t1, _ = generate_transcripts(n_convs=2, base_turns=2, skew_every=0,
                                     include_fixtures=False)
        spark.createDataFrame(t1, TRANSCRIPT_DDL).write.mode(
            "append").parquet(inp)
        stream_extract(spark, inp, out, ckpt)
        n1 = spark.read.parquet(out).count()
        assert n1 > 0

        # second batch of files: only the new ones are processed
        t2, _ = generate_transcripts(n_convs=2, base_turns=2, skew_every=0,
                                     include_fixtures=False)
        t2 = t2.assign(conv_id=t2["conv_id"] + "_b2")
        spark.createDataFrame(t2, TRANSCRIPT_DDL).write.mode(
            "append").parquet(inp)
        stream_extract(spark, inp, out, ckpt)
        got = spark.read.parquet(out)
        n2 = got.count()
        assert n2 > n1
        # exactly-once: no duplicate (conv, turn, table) keys
        assert got.select("conv_id", "turn_idx", "table_id").distinct() \
                  .count() == n2

        # re-run with no new files: nothing added
        stream_extract(spark, inp, out, ckpt)
        assert spark.read.parquet(out).count() == n2
