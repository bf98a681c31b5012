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
# registration order, but the registry holds >50 queries.  Rotation
# policy (VERDICT r4 ask #1): queries whose implementing code changed
# since the last CORRECTNESS_r* artifact landed go FIRST (changed code
# must hit the same round's driver check), then queries never captured
# in any artifact, then ascending last-captured round — so every
# registered operator keeps accumulating externally-verified rows and
# a regression in displaced code is re-checked the round it happens.

_REPO = os.path.dirname(os.path.abspath(__file__))


def _module_file(mod: str) -> str | None:
    """Repo path for a pdf2gtfs_spark module/package name, or None."""
    base = os.path.join(_REPO, *mod.split("."))
    for cand in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.exists(cand):
            return cand
    return None


def _local_imports(path: str) -> set[str]:
    """pdf2gtfs_spark modules imported (directly) by a source file."""
    import re

    try:
        with open(path, encoding="utf-8") as f:
            src = f.read()
    except OSError:
        return set()
    mods: set[str] = set()
    for m in re.finditer(
            r"^\s*from\s+(pdf2gtfs_spark[.\w]*)\s+import\s+([^\n]+)",
            src, re.M):
        base, names = m.group(1), m.group(2)
        if _module_file(base):
            mods.add(base)
        for n in re.split(r"[,\s()\\]+", names):
            if n and n != "as" and _module_file(f"{base}.{n}"):
                mods.add(f"{base}.{n}")
    for m in re.finditer(r"^\s*import\s+(pdf2gtfs_spark[.\w]*)", src, re.M):
        if _module_file(m.group(1)):
            mods.add(m.group(1))
    return mods


def _closure_files(mod: str) -> set[str]:
    """Transitive repo-file closure of a module's local imports."""
    seen: set[str] = set()
    todo = [mod]
    files: set[str] = set()
    while todo:
        cur = todo.pop()
        if cur in seen:
            continue
        seen.add(cur)
        path = _module_file(cur)
        if path is None:
            continue
        files.add(os.path.relpath(path, _REPO))
        todo.extend(_local_imports(path))
    return files


def _changed_files() -> set[str]:
    """Repo files changed since the newest CORRECTNESS_r*.json commit
    (plus uncommitted working-tree changes).  Empty set if git or the
    artifact history is unavailable — rotation then falls back to
    snapshot age alone."""
    import glob
    import subprocess

    arts = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    if not arts:
        return set()
    try:
        ref = subprocess.run(
            ["git", "-C", _REPO, "log", "-n1", "--format=%H", "--",
             os.path.basename(arts[-1])],
            capture_output=True, text=True, timeout=30).stdout.strip()
        if not ref:
            return set()
        diff = subprocess.run(
            ["git", "-C", _REPO, "diff", "--name-only", ref, "HEAD"],
            capture_output=True, text=True, timeout=30).stdout.split()
        status = subprocess.run(
            ["git", "-C", _REPO, "status", "--porcelain"],
            capture_output=True, text=True, timeout=30).stdout
        dirty = [line[3:].split(" -> ")[-1]
                 for line in status.splitlines() if len(line) > 3]
        return set(diff) | set(dirty)
    except (OSError, subprocess.SubprocessError):
        return set()


def _last_seen_rounds() -> dict[str, int]:
    """query name -> newest CORRECTNESS round it appeared in (-1 never)."""
    import glob
    import json
    import re

    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            seen[name] = max(seen.get(name, -1), rnd)
    return seen


def _rotation_order(registry: dict) -> list[str]:
    changed = _changed_files()
    seen = _last_seen_rounds()
    names = list(registry)
    touched: set[str] = set()
    if changed:
        closure_cache: dict[str, set[str]] = {}
        for idx, name in enumerate(names):
            fn = registry[name]
            mod = getattr(fn, "__module__", "")
            if not mod.startswith("pdf2gtfs_spark"):
                continue
            files = closure_cache.setdefault(mod, _closure_files(mod))
            if files & changed:
                touched.add(name)
    return sorted(
        names,
        key=lambda n: (0 if n in touched else 1,
                       seen.get(n, -1), names.index(n)))


def _rotate(mapping: dict, order: list[str]) -> dict:
    return {k: mapping[k] for k in order if k in mapping}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pdf2gtfs_spark.operators import QUERIES, load_all

    load_all()
    return _rotate(dict(QUERIES), _rotation_order(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    kernel-backed extraction queries -> rows-only check)."""
    from pdf2gtfs_spark.operators import ORACLES, QUERIES, load_all

    load_all()
    return _rotate(dict(ORACLES), _rotation_order(QUERIES))
