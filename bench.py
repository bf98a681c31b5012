"""Benchmark harness (driver contract).

Runs the extraction pipeline + headline operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "extract_turns_per_sec": ...}

The extraction workload is a deterministic synthetic transcripts table
(fixed seed + golden fixtures; FIXTURES.md §1) — identical across runs
and parallelism levels so local[8]-vs-local[32] scaling efficiency is
measured on the same input (see tools/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "agg_pricing_summary", "join_broadcast_dims", "semi_join_heavy_orders",
    "topk_orders_per_customer", "window_gap_sessions",
    "window_time_rollover", "window_forward_fill", "range_join_ship_window",
    "asof_last_click_before_purchase", "dedup_exact",
    "dedup_ngram_jaccard", "minhash_lsh_pairs", "simhash_fingerprints",
    "embedding_cosine_topk", "embedding_ivf_topk", "langid_stopword_vote",
    "quality_score", "doc_fingerprint", "training_data_clean",
    "html_main_content",
    "locate_travel_cost",
    "locate_interpolation", "locate_name_cost",
]

# fixed extraction workload: 96 unique turn payloads tiled over many
# turns (generation is driver-side; extraction cost dominates)
N_UNIQUE_TURNS = 96
N_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "6144"))
RUN_QUERIES = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "1") == "1"
RUN_NEWPATH = os.environ.get("SPARK_GRAFT_BENCH_NEWPATH", "1") == "1"
# timed repetitions per workload (after one untimed warm pass); the
# sandbox host shows 2-4x CPU drift (BASELINE.md), so single-shot
# timings are not comparable round over round — report median + CV
N_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
# steady-state extraction measurement at 10x the standard workload:
# the 6k-turn headline is fixed-overhead-bound (~1 s/job of stage
# setup + python-worker spin-up; BENCH/BASELINE.md round-5 section)
# and underestimates production throughput ~2x, so the per-round
# artifact also records turns/sec at a production-sized stage count.
RUN_STEADY = os.environ.get("SPARK_GRAFT_BENCH_STEADY", "1") == "1"
N_TURNS_STEADY = int(os.environ.get("SPARK_GRAFT_BENCH_STEADY_TURNS",
                                    str(N_TURNS * 10)))


_SPIN_BASELINE: list[float] = []   # session-min spin time (seconds)


def _loadavg() -> float:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return -1.0


def _spin() -> float:
    """Fixed CPU calibration loop (~30 ms on an idle core).  Host-level
    contention is invisible to in-VM loadavg (this sandbox runs under
    a shared hypervisor), but it inflates this single-thread spin the
    same way it inflates Spark's task times, so spin/baseline is the
    dirty-window detector loadavg can't be."""
    t0 = time.perf_counter()
    x = 0
    for i in range(1_500_000):
        x += i
    dt = time.perf_counter() - t0
    _SPIN_BASELINE.append(dt)
    return dt


def _timed(fn) -> tuple[float, float, dict]:
    """Median seconds + CV over N_REPS runs, with load-normalization
    (VERDICT r3 #2): stamp loadavg + calibration-spin around the
    window; if the sample CV exceeds 0.2 or the spin ran >=1.5x the
    session baseline (a poisoned window), run up to N_REPS more reps
    and take the median of ALL samples.  The meta dict records what
    happened so round-over-round artifacts are interpretable."""
    import statistics

    def cv_of(samples):
        return (statistics.pstdev(samples) / statistics.mean(samples)
                if len(samples) > 1 and statistics.mean(samples) > 0
                else 0.0)

    la0, spin0 = _loadavg(), _spin()
    samples = []
    for _ in range(N_REPS):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    spin1, la1 = _spin(), _loadavg()
    base = min(_SPIN_BASELINE)
    dirty = (cv_of(samples) > 0.2
             or max(spin0, spin1) >= 1.5 * base)
    retried = False
    if dirty and N_REPS > 1:
        retried = True
        retry_samples = []
        for _ in range(N_REPS):
            t0 = time.time()
            fn()
            retry_samples.append(time.time() - t0)
        spin1, la1 = _spin(), _loadavg()
        samples += retry_samples
    meta = {"load": [round(la0, 2), round(la1, 2)],
            "spin_ratio": round(max(spin0, spin1) / base, 2),
            "retried": retried}
    if retried:
        # the poisoned pre-retry samples stay in the headline median
        # (conservative), but record the clean-tail median so a
        # contention-hit window is auditable in-artifact (ADVICE r4)
        meta["retry_median"] = round(statistics.median(retry_samples), 3)
    return statistics.median(samples), cv_of(samples), meta


def build_transcripts_parquet(spark, path: str,
                              n_turns: int | None = None) -> int:
    import pandas as pd

    from pdf2gtfs_spark.sources.transcripts import (
        fixture_turns, synth_turn_payload)

    payloads = [synth_turn_payload(f"bench_{i:03d}", 0)[0]
                for i in range(N_UNIQUE_TURNS)]
    payloads += [p for _, p, _ in fixture_turns()]
    rows = []
    for t in range(n_turns if n_turns is not None else N_TURNS):
        conv = f"conv_{t % 97:05d}"   # ~97 convs, skewed turn counts
        rows.append((conv, t // 97, payloads[t % len(payloads)]))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    n_files = int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 8
    spark.createDataFrame(pdf).repartition(n_files).write.mode(
        "overwrite").parquet(path)
    return len(rows)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    # Calibrate the spin baseline BEFORE any timed window (ADVICE r4:
    # without this the first window's own spins ARE the baseline, so a
    # contention-poisoned first window — the headline — can never be
    # spin-flagged).  A handful of samples; the session minimum is the
    # baseline.
    for _ in range(5):
        _spin()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("pdf2gtfs_spark-bench")
             .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
             .config("spark.driver.host", "127.0.0.1")
             .config("spark.driver.bindAddress", "127.0.0.1")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             # runtime skew-split for the join-heavy operator queries
             # (default-on, pinned so the skew story is config-stable;
             # gate: tests/test_plans.py::test_skew_salting_and_aqe)
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             # AQE's size-based coalescing sees the reassembly shuffle
             # as "small" (~3KB/turn of CSV text) and folds it into one
             # partition — but this reduce is CPU-bound (string agg),
             # so that serializes the tail and caps scaling (measured:
             # 1463 -> 1763 turns/s at local[8] with coalescing off).
             # On a real cluster the equivalent is a lower
             # advisoryPartitionSizeInBytes for CPU-heavy stages.
             .config("spark.sql.adaptive.coalescePartitions.enabled",
                     "false")
             .config("spark.sql.files.maxPartitionBytes", "4m")
             # r1 tuned this to 8 when the kernel cost 55 ms/turn; at
             # ~8 ms/turn the per-batch overhead dominates instead and
             # 64 measures ~40% faster at local[8]
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     os.environ.get("SPARK_GRAFT_ARROW_BATCH", "64"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pdf2gtfs_spark.operators import QUERIES, load_all
    from pdf2gtfs_spark.plans.pipeline import run_extract, turn_csvs

    load_all()

    tmp = tempfile.mkdtemp(prefix="p2gs_bench_")
    timings: dict[str, float] = {}
    try:
        tpath = f"{tmp}/transcripts"
        n_turns = build_transcripts_parquet(spark, tpath)
        transcripts = spark.read.parquet(tpath)

        # Steady-state protocol (BASELINE.md): one untimed full pass
        # warms JIT/codegen/python workers/page cache; the second pass
        # is measured. First-pass penalty observed at ~2-3x.
        # Headline = the per-turn text-equality surface (emit="csv",
        # BASELINE.json metric); the nested-output pipeline is timed
        # separately below as extract_full_outputs.
        turn_csvs(run_extract(transcripts, emit="csv")).write.format(
            "noop").mode("overwrite").save()

        cvs: dict[str, float] = {}
        metas: dict[str, dict] = {}

        def run_headline():
            turn_csvs(run_extract(transcripts, emit="csv")).write.format(
                "noop").mode("overwrite").save()

        extract_s, cv, meta = _timed(run_headline)
        timings["extract_pipeline"] = round(extract_s, 3)
        cvs["extract_pipeline"] = round(cv, 3)
        metas["extract_pipeline"] = meta
        turns_per_sec = n_turns / extract_s

        if RUN_QUERIES:
            turn_csvs(run_extract(transcripts)).write.format("noop").mode(
                "overwrite").save()  # warm full mode

            def run_full():
                turn_csvs(run_extract(transcripts)).write.format(
                    "noop").mode("overwrite").save()

            med, cv, meta = _timed(run_full)
            timings["extract_full_outputs"] = round(med, 3)
            cvs["extract_full_outputs"] = round(cv, 3)
            metas["extract_full_outputs"] = meta

        # new (default reference) extraction path on a 1/4 subset:
        # heavier per turn (inference fixpoint), reported separately
        import dataclasses

        from pyspark.sql import functions as F

        from pdf2gtfs_spark.config import DEFAULT_CONFIG

        newpath_tps, n_new = 0.0, 0
        if RUN_NEWPATH:
            new_cfg = dataclasses.replace(DEFAULT_CONFIG,
                                          extraction_path="new")
            sub = transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(4)) == 0)
            # The 1/4 filter leaves ~6-row scan splits (256 files), so
            # per-task overhead — not the kernel — dominates the
            # measurement. Materialize the subset at one healthy split
            # per core (how a real table's splits are sized relative to
            # cluster parallelism) and time the same emit="csv"
            # per-turn text surface as the legacy headline.
            spath = f"{tmp}/newpath_sub"
            sub.repartition(cpus).write.mode("overwrite").parquet(spath)
            sub = spark.read.parquet(spath)
            n_new = sub.count()
            newpath_q = turn_csvs(run_extract(sub, new_cfg, emit="csv"))
            newpath_q.write.format("noop").mode("overwrite").save()  # warm

            def run_newpath():
                newpath_q.write.format("noop").mode("overwrite").save()

            newpath_s, cv, meta = _timed(run_newpath)
            timings["extract_newpath"] = round(newpath_s, 3)
            cvs["extract_newpath"] = round(cv, 3)
            metas["extract_newpath"] = meta
            newpath_tps = n_new / newpath_s

        steady_tps, n_steady = 0.0, 0
        newpath_steady_tps, n_new_steady = 0.0, 0
        if RUN_STEADY and N_TURNS_STEADY > N_TURNS:
            spath10 = f"{tmp}/transcripts_steady"
            n_steady = build_transcripts_parquet(spark, spath10,
                                                 N_TURNS_STEADY)
            steady = spark.read.parquet(spath10)
            q10 = turn_csvs(run_extract(steady, emit="csv"))
            q10.write.format("noop").mode("overwrite").save()  # warm

            def run_steady():
                q10.write.format("noop").mode("overwrite").save()

            med, cv, meta = _timed(run_steady)
            timings["extract_steady"] = round(med, 3)
            cvs["extract_steady"] = round(cv, 3)
            metas["extract_steady"] = meta
            steady_tps = n_steady / med

            if RUN_NEWPATH:
                sub10 = steady.where(
                    F.pmod(F.xxhash64("conv_id", "turn_idx"),
                           F.lit(4)) == 0)
                np10 = f"{tmp}/newpath_steady"
                sub10.repartition(cpus).write.mode(
                    "overwrite").parquet(np10)
                sub10 = spark.read.parquet(np10)
                n_new_steady = sub10.count()
                nq10 = turn_csvs(run_extract(sub10, new_cfg,
                                             emit="csv"))
                nq10.write.format("noop").mode("overwrite").save()

                def run_newpath_steady():
                    nq10.write.format("noop").mode("overwrite").save()

                med, cv, meta = _timed(run_newpath_steady)
                timings["extract_newpath_steady"] = round(med, 3)
                cvs["extract_newpath_steady"] = round(cv, 3)
                metas["extract_newpath_steady"] = meta
                newpath_steady_tps = n_new_steady / med

        for name in (BENCH_QUERIES if RUN_QUERIES else []):
            fn = QUERIES[name]
            # steady-state per query: the first run pays codegen/JIT
            # (measured 3-5x on the heavier shuffle queries) and is
            # not what a recurring production job sees
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()

            def run_query(fn=fn):
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()

            med, cv, meta = _timed(run_query)
            timings[name] = round(med, 3)
            cvs[name] = round(cv, 3)
            metas[name] = meta

        total = round(sum(timings.values()), 3)
        compact = {
            "metric": "bench_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,          # median of N_REPS timed runs
            "reps": N_REPS,
            "sf": sf,
            "extract_turns_per_sec": round(turns_per_sec, 2),
            "extract_turns": n_turns,
            "newpath_turns_per_sec": round(newpath_tps, 2),
            "newpath_turns": n_new,
            "steady_turns_per_sec": round(steady_tps, 2),
            "steady_turns": n_steady,
            "newpath_steady_turns_per_sec": round(newpath_steady_tps, 2),
            "newpath_steady_turns": n_new_steady,
            "cpus": cpus,
        }
        # Full record (per-query CV + loadavg/spin window stamps) goes
        # to a file; the stdout metric line stays compact so the
        # driver's bounded tail capture always holds the whole JSON
        # (BENCH_r04 lost its per-query seconds to truncation when the
        # window stamps doubled the line length — VERDICT r4 ask #2).
        full = {**compact, "query_cv": cvs, "query_window": metas}
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH")
        try:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "latest.json"), "w") as f:
                json.dump(full, f, indent=1)
                f.write("\n")
        except OSError:
            pass
        print(json.dumps(compact))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
