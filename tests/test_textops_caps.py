"""Candidate-pruning cap observability (VERDICT r4 ask #3).

The caps themselves (JACCARD_DF_CAP / LSH_BUCKET_CAP) are cut-in
points the dedup queries already oracle-check; these tests pin the
*drop accounting*: cap_drop_metrics must report exactly how many
groups/rows a cap excludes, and zero when nothing crosses it.
"""

import pandas as pd
import pytest


def _shingle_set(text: str) -> set:
    return {text[i:i + 4] for i in range(len(text) - 3)}


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    # 6 identical boilerplate docs + 1 unique doc
    boiler = "the same boilerplate text"
    other = "completely different words"
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(7)],
        "text": [boiler] * 6 + [other],
    })
    return spark.createDataFrame(pdf), boiler, other


def _metrics(spark, d, **caps):
    from pdf2gtfs_spark.operators.textops import cap_drop_metrics
    return {r["cap"]: r.asDict()
            for r in cap_drop_metrics(spark, d, **caps).collect()}


def test_cap_drop_counts_on_degenerate_corpus(spark, degenerate_docs):
    d, boiler, other = degenerate_docs
    m = _metrics(spark, d, jaccard_cap=4, lsh_cap=4)

    shared = _shingle_set(boiler) & _shingle_set(other)
    hot = _shingle_set(boiler)  # df=6 (or 7 where shared) > cap
    assert m["jaccard_df"]["threshold"] == 4
    assert m["jaccard_df"]["n_dropped_groups"] == len(hot)
    assert (m["jaccard_df"]["n_dropped_rows"]
            == 6 * len(hot) + len(shared))

    # 6 identical docs -> identical minhash signatures -> all 3 bands
    # land in buckets of size 6 > cap; the unique doc's buckets are 1
    assert m["lsh_bucket"]["n_dropped_groups"] == 3
    assert m["lsh_bucket"]["n_dropped_rows"] == 18


def test_cap_drop_zero_under_default_caps(spark, degenerate_docs):
    d, _, _ = degenerate_docs
    m = _metrics(spark, d)  # defaults: 64 / 512 — nothing crosses
    assert m["jaccard_df"]["n_dropped_groups"] == 0
    assert m["jaccard_df"]["n_dropped_rows"] == 0
    assert m["lsh_bucket"]["n_dropped_groups"] == 0
    assert m["lsh_bucket"]["n_dropped_rows"] == 0
