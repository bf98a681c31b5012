"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

bench.py is frozen for measurement; this file exists so optimization
rounds can time individual declared queries with the noop sink, count
scan tasks, and capture .explain("formatted") without paying for the
whole suite.  Uses the same session config as bench.py so numbers are
comparable.

Usage:
    python bench_extra.py <query> [<query> ...] [--reps N] [--plan DIR]
    python bench_extra.py --all-docs            # the documents family
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOC_QUERIES = [
    "dedup_exact", "dedup_ngram_jaccard", "minhash_lsh_pairs",
    "simhash_fingerprints", "langid_stopword_vote", "quality_score",
    "doc_fingerprint", "training_data_clean", "html_main_content",
]


def build_session(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("pdf2gtfs_spark-bench-extra")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.driver.host", "127.0.0.1")
            .config("spark.driver.bindAddress", "127.0.0.1")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled",
                    "false")
            .config("spark.sql.files.maxPartitionBytes", "4m")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                    os.environ.get("SPARK_GRAFT_ARROW_BATCH", "64"))
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    reps = 3
    plan_dir = None
    for f in flags:
        if f.startswith("--reps="):
            reps = int(f.split("=", 1)[1])
        elif f.startswith("--plan="):
            plan_dir = f.split("=", 1)[1]
        elif f == "--all-docs":
            args = DOC_QUERIES + args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pdf2gtfs_spark.operators import QUERIES, load_all
    load_all()

    out = {}
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = fn(spark, sf_dir)
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        # warm (codegen/JIT) then timed reps, same as bench.py protocol
        df.write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.time() - t0, 3))
        samples.sort()
        out[name] = {"median": samples[len(samples) // 2],
                     "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
