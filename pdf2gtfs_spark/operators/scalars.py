"""Scalar-function operators from SURVEY.md §2.8 exposed as
oracle-checked queries: the cell-type recognizers, letter ratio, geo
distance, node scoring and weekday mapping, each over driver testdata
so DuckDB can verify them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf2gtfs_spark.operators import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- X7/X8/X15: cell-content recognizers -------------------------------------
# repeat-value (celltype.py:211-251 simplified to the legacy regex),
# legend '^\S+\s?[:=]\s?\S+$' (celltype.py:254-261), letter ratio
# (celltype.py:653-680). Evaluated over tokenized event props + docs.
@register("celltype_recognizers", oracle=r"""
SELECT doc_id,
       CASE WHEN regexp_matches(substr(text, 1, 24),
                 '^\d{1,3}[-,] ?\d{1,3}$|^\d{1,3}$')
            THEN 1 ELSE 0 END AS is_repeat_value,
       CASE WHEN regexp_matches(substr(text, 1, 24),
                 '^\S+\s?[:=]\s?\S+$') THEN 1 ELSE 0 END AS is_legend,
       CAST(round(1000.0 *
            length(regexp_replace(substr(text, 1, 200),
                                  '[^a-zA-Z ]', '', 'g'))
            / length(substr(text, 1, 200))) AS BIGINT) AS letter_millis
FROM documents ORDER BY doc_id
""")
def celltype_recognizers(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    head = F.substring("text", 1, 24)
    head200 = F.substring("text", 1, 200)
    return (d.select(
                "doc_id",
                F.when(head.rlike(r"^\d{1,3}[-,] ?\d{1,3}$|^\d{1,3}$"),
                       1).otherwise(0).alias("is_repeat_value"),
                F.when(head.rlike(r"^\S+\s?[:=]\s?\S+$"), 1)
                .otherwise(0).alias("is_legend"),
                F.round(1000.0 * F.length(
                    F.regexp_replace(head200, "[^a-zA-Z ]", ""))
                    / F.length(head200)).cast("bigint")
                .alias("letter_millis"))
            .orderBy("doc_id"))


# --- X12: equirectangular geo distance (loc_nodes.py:156-163) ----------------
# No geo table in the testdata; coordinates are derived
# deterministically from customer keys in BOTH engines, so the formula
# itself is what's checked.
@register("geo_distance", oracle="""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 1800) / 10.0 - 90.0 AS lat,
         (c_custkey % 3600) / 10.0 - 180.0 AS lon
  FROM customer
)
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(round(sqrt(
           pow((b.lat - a.lat) * 111320.0, 2)
           + pow((b.lon - a.lon) * 111320.0
                 * cos(radians((a.lat + b.lat) / 2)), 2))) AS BIGINT)
           AS dist_m
FROM pts a JOIN pts b ON b.c_custkey = a.c_custkey + 1
ORDER BY key_a
""")
def geo_distance(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 1800) / 10.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") % 3600) / 10.0 - 180.0).alias("lon"))
    a = pts.alias("a")
    b = pts.alias("b")
    dist = F.sqrt(
        F.pow((F.col("b.lat") - F.col("a.lat")) * 111320.0, 2)
        + F.pow((F.col("b.lon") - F.col("a.lon")) * 111320.0
                * F.cos(F.radians((F.col("a.lat") + F.col("b.lat")) / 2)),
                2))
    return (a.join(b, F.col("b.c_custkey") == F.col("a.c_custkey") + 1)
            .select(F.col("a.c_custkey").alias("key_a"),
                    F.col("b.c_custkey").alias("key_b"),
                    F.round(dist).cast("bigint").alias("dist_m"))
            .orderBy("key_a"))


# --- X14: node scoring when-ladder (locate/__init__.py:213-257) --------------
@register("node_scoring_ladder", oracle="""
SELECT s_suppkey,
       CAST(CASE
         WHEN s_acctbal < 0 THEN 999999
         WHEN s_acctbal > 9000 THEN CAST(floor(s_acctbal / 1000)
                                         AS BIGINT) * 5
         ELSE 20
       END AS BIGINT) AS node_cost,
       CAST(floor(pow(CAST(s_suppkey % 7 AS BIGINT) + s_suppkey % 3, 2)
                  / 20) AS BIGINT) AS combined_cost
FROM supplier ORDER BY s_suppkey
""")
def node_scoring_ladder(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    # NB: DuckDB CAST(double AS BIGINT) rounds, Spark truncates — the
    # oracle contract always goes through explicit floor()/round()
    cost = (F.when(F.col("s_acctbal") < 0, 999999)
            .when(F.col("s_acctbal") > 9000,
                  F.floor(F.col("s_acctbal") / 1000).cast("bigint") * 5)
            .otherwise(20)).cast("bigint")
    combined = F.floor(
        F.pow((F.col("s_suppkey") % 7).cast("bigint")
              + F.col("s_suppkey") % 3, 2) / 20).cast("bigint")
    return (s.select("s_suppkey", cost.alias("node_cost"),
                     combined.alias("combined_cost"))
            .orderBy("s_suppkey"))


# --- X17: weekday-header mapping (timetable/entries.py:14-23) ----------------
_HEADER_ROWS = ", ".join([
    "('montag - freitag', '0,1,2,3,4')",
    "('samstag', '5')",
    "('sonntag', '6')",
    "('sonn- und feiertag', '6,h')",
])


@register("weekday_header_mapping", oracle=f"""
WITH hv(header, days) AS (VALUES {_HEADER_ROWS}),
ev AS (SELECT event_id,
              CASE event_type WHEN 'click' THEN 'Montag - Freitag'
                              WHEN 'view' THEN 'Samstag'
                              WHEN 'purchase' THEN 'Sonntag'
                              ELSE 'Sonn- und Feiertag' END AS header_text
       FROM events)
SELECT e.event_id, e.header_text,
       coalesce(h.days, '') AS days_key,
       CASE WHEN h.days LIKE '%0%' THEN 1 ELSE 0 END AS runs_monday
FROM ev e LEFT JOIN hv h ON lower(trim(e.header_text)) = h.header
ORDER BY e.event_id
""")
def weekday_header_mapping(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    header = (F.when(F.col("event_type") == "click", "Montag - Freitag")
              .when(F.col("event_type") == "view", "Samstag")
              .when(F.col("event_type") == "purchase", "Sonntag")
              .otherwise("Sonn- und Feiertag"))
    hv = spark.createDataFrame(
        [("montag - freitag", "0,1,2,3,4"), ("samstag", "5"),
         ("sonntag", "6"), ("sonn- und feiertag", "6,h")],
        "header string, days string")
    ev = e.select("event_id", header.alias("header_text"))
    return (ev.join(F.broadcast(hv),
                    F.lower(F.trim("header_text")) == hv.header, "left")
            .select("event_id", "header_text",
                    F.coalesce("days", F.lit("")).alias("days_key"),
                    F.when(F.col("days").contains("0"), 1).otherwise(0)
                    .alias("runs_monday"))
            .orderBy("event_id"))


# --- §2.10 probabilistic guess_type: kernel vs SQL ---------------------------
# The Spark side runs the REAL new-path kernel (celltypes.guess_list +
# strict_guess, i.e. CellType.guess_type incl. dict-insertion-order
# argmax) in an Arrow batch over the documents corpus; DuckDB
# recomputes the indicator ladder, the probability normalization
# (round to 3 decimals) and the tie-break order independently in SQL.
_GUESS_SCHEMA = ("doc_id bigint, top_type string, top_p_millis int, "
                 "fallback int")


def _guess_kernel(batches):
    import pandas as pd

    from pdf2gtfs_spark.kernel import celltypes as ct

    m = ct.TypeMatchers()
    for pdf in batches:
        texts = [t.strip() for t in pdf["text"]]
        P, fb = m.guess_list(texts)
        top = ct.strict_guess(P, fb)
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "top_type": [ct.TYPE_NAMES[t] for t in top],
            "top_p_millis": [int(round(1000 * P[i, t]))
                             for i, t in enumerate(top)],
            "fallback": fb.astype(int),
        })
        yield out


@register("celltype_guess_probs", oracle=r"""
WITH g AS (
  SELECT doc_id, trim(text) AS t FROM documents
), ind AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(t, '^(\d{1,2})\.(\d{1,2})$')
          AND CAST(regexp_extract(t, '^(\d{1,2})\.(\d{1,2})$', 1) AS INT)
              <= 23
          AND CAST(regexp_extract(t, '^(\d{1,2})\.(\d{1,2})$', 2) AS INT)
              <= 59
         THEN 1 ELSE 0 END AS i_time,
    CASE WHEN lower(t) IN ('montag - freitag', 'samstag', 'sonntag',
                           'sonn- und feiertag', 'sonn- / feiertag')
         THEN 1 ELSE 0 END AS i_days,
    CASE WHEN lower(t) IN ('alle', 'min', 'min.') THEN 1 ELSE 0
         END AS i_repeat,
    CASE WHEN lower(t) IN ('an', 'ab') THEN 1 ELSE 0 END AS i_stopannot,
    CASE WHEN lower(t) IN ('linie', 'zugnummer', 'fahrtnummer')
         THEN 1 ELSE 0 END AS i_route,
    CASE WHEN lower(t) IN ('verkehrshinweis', 'verkehrsbeschränkung',
                           'verkehrshinweise') THEN 1 ELSE 0
         END AS i_annot,
    CASE WHEN regexp_matches(t, '^\S+\s?[:=]\s?\S+$') THEN 1 ELSE 0
         END AS i_legend
  FROM g
), scored AS (
  SELECT doc_id,
         i_time + i_days + i_repeat + i_stopannot + i_route + i_annot
           + i_legend AS n_fired,
         i_time, i_days, i_repeat, i_stopannot, i_route, i_annot, i_legend
  FROM ind
)
SELECT doc_id,
  CASE WHEN n_fired = 0 THEN 'Other'
       WHEN i_time = 1 THEN 'Time'
       WHEN i_days = 1 THEN 'Days'
       WHEN i_repeat = 1 THEN 'RepeatIdent'
       WHEN i_stopannot = 1 THEN 'StopAnnot'
       WHEN i_route = 1 THEN 'RouteAnnotIdent'
       WHEN i_annot = 1 THEN 'EntryAnnotIdent'
       ELSE 'LegendIdent' END AS top_type,
  CAST(CASE WHEN n_fired = 0
            THEN round(1000 * round(2.0 / 9, 3))
            ELSE round(1000 * round(1.0 / (n_fired + 0.5), 3))
       END AS INT) AS top_p_millis,
  CASE WHEN n_fired = 0 THEN 1 ELSE 0 END AS fallback
FROM scored ORDER BY doc_id
""")
def celltype_guess_probs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return (d.mapInPandas(_guess_kernel, _GUESS_SCHEMA)
            .orderBy("doc_id"))
