"""Stage-wise scaling probe: separates kernel-only throughput from the
reassembly tail so scaling losses can be attributed (used to tune
bench/scaling settings; not part of the driver contract)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    batch = sys.argv[3] if len(sys.argv) > 3 else "8"

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
             .config("spark.driver.host", "127.0.0.1")
             .config("spark.driver.bindAddress", "127.0.0.1")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.files.maxPartitionBytes", "4m")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import bench

    bench.N_TURNS = n_turns
    tmp = tempfile.mkdtemp(prefix="probe_")
    n = bench.build_transcripts_parquet(spark, f"{tmp}/t")
    transcripts = spark.read.parquet(f"{tmp}/t")

    from pdf2gtfs_spark.plans.pipeline import run_extract, turn_csvs

    results = {}
    for name, df_fn in [
            ("kernel_only", lambda: run_extract(transcripts)
             .select("conv_id", "n_fields")),
            ("with_reassembly", lambda: turn_csvs(run_extract(transcripts)))]:
        df_fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results[name] = {"sec": round(dt, 2),
                         "tps": round(n / dt, 1)}
    print(json.dumps({"cpus": cpus, "turns": n, "batch": batch,
                      **results}))
    spark.stop()


if __name__ == "__main__":
    main()
