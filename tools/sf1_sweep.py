"""sf0.1 -> sf1 operator scaling sweep (VERDICT r3 ask #7).

The driver testdata stops at sf0.1, so both scales come from
tools/gen_sf.py (same generator, same seed family) — ratios are
within-generator and therefore meaningful; the gen_sf0.1 timings are
also compared against the driver sf0.1 dir as a sanity anchor.

Runs every BENCH_QUERIES operator at the two scales on local[32]
(steady-state: warm pass + median of N reps, load-normalized via
bench._timed) and prints one JSON line with per-query seconds and the
sf1/sf0.1 ratio.  A ratio <= ~10 on 10x rows is at-worst-linear;
ratios well above 10 flag shuffle-bound superlinearity.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _timed + session config)

DIRS = {
    "sf0.1": "/root/repo/.bench_data/gen_sf0.1",
    "sf1": "/root/repo/.bench_data/gen_sf1",
}


def main() -> None:
    from pyspark.sql import SparkSession

    from pdf2gtfs_spark.operators import QUERIES, load_all

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("sf1-sweep")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.host", "127.0.0.1")
             .config("spark.driver.bindAddress", "127.0.0.1")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    load_all()

    out: dict[str, dict] = {k: {} for k in DIRS}
    windows: dict[str, dict] = {k: {} for k in DIRS}
    names = sys.argv[1:] or bench.BENCH_QUERIES
    for name in names:
        fn = QUERIES[name]
        for scale, d in DIRS.items():
            def run(fn=fn, d=d):
                fn(spark, d).write.format("noop").mode(
                    "overwrite").save()
            run()  # warm
            med, cv, meta = bench._timed(run)
            out[scale][name] = round(med, 3)
            windows[scale][name] = meta
            print(f"{name:32s} {scale:6s} {med:7.2f}s cv={cv:.2f} "
                  f"spin={meta['spin_ratio']}", flush=True)

    ratios = {q: round(out["sf1"][q] / out["sf0.1"][q], 2)
              for q in out["sf1"]}
    print(json.dumps({
        "metric": "sf1_over_sf01_ratio",
        "queries_sf01": out["sf0.1"],
        "queries_sf1": out["sf1"],
        "ratio": ratios,
        "query_window": windows,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
