"""Relational operators (SURVEY.md §2.2-2.8) over the driver testdata.

Every query is expressed declaratively with pyspark.sql.functions only
(JVM-side, codegen) and carries an ANSI-SQL DuckDB oracle. Aggregated
money/ratio outputs are integer-ized (cents / rounded) so value hashes
match bit-exactly across engines.

Scale notes are attached per query: what shuffles, what broadcasts,
what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf2gtfs_spark.operators import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A2/A3: decomposable aggregation (TPC-H Q1 shape) ---------------------
# Scale: map-side partial agg -> tiny shuffle (|groups| ~ 6); scan-bound.
@register("agg_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT)                    AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)         AS sum_base_cents,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                                                                 AS sum_disc_cents,
       count(*)                                                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast(
                "timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity")).cast("bigint").alias("sum_qty"),
                 F.round(F.sum("l_extendedprice") * 100).cast("bigint")
                 .alias("sum_base_cents"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))) * 100)
                 .cast("bigint").alias("sum_disc_cents"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


# --- J5/J8: dim joins (broadcast) ------------------------------------------
# Scale: nation/region broadcast (<1MB even at 100TB fact scale); the
# only shuffle is the final group on r_name (5 groups).
@register("join_broadcast_dims", oracle="""
SELECT r_name,
       count(*) AS n_customers,
       CAST(round(sum(c_acctbal) * 100) AS BIGINT) AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""")
def join_broadcast_dims(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n),
                   c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("c_acctbal") * 100).cast("bigint")
                 .alias("acctbal_cents"))
            .orderBy("r_name"))


# --- J9: semi join ----------------------------------------------------------
@register("semi_join_heavy_orders", oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def semi_join_heavy_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where("l_quantity > 45")
    return (o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"))
            .orderBy("o_orderpriority"))


# --- J9 remove_unused: anti join (handler.py:259-264 analog) ---------------
@register("anti_join_unused", oracle="""
SELECT c_mktsegment, count(*) AS n_without_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment
""")
def anti_join_unused(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        "o_orderpriority = '1-URGENT'")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_without_orders"))
            .orderBy("c_mktsegment"))


# --- O2/O3: deterministic top-k per group (rank) ----------------------------
# Scale: single shuffle on custkey; no global sort. Ties broken by key.
@register("topk_orders_per_customer", oracle="""
SELECT o_custkey, rk, o_orderkey
FROM (SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)
                 AS rk
      FROM orders)
WHERE rk <= 3 ORDER BY o_custkey, rk
""")
def topk_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
            .where("rk <= 3")
            .select("o_custkey", "rk", "o_orderkey")
            .orderBy("o_custkey", "rk"))


# --- A4: deterministic first-wins dedup (gtfs_output/__init__.py:89-104) ---
@register("dedup_first_wins", oracle="""
SELECT o_custkey, o_orderkey AS first_orderkey
FROM (SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
WHERE rn = 1 ORDER BY o_custkey
""")
def dedup_first_wins(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
            .orderBy("o_custkey"))


# --- W1/W3: gap-based session clustering (reader.py:369-383 pattern) -------
# Scale: one shuffle on user_id; lag+cumsum stays in a single window
# pass. AQE skew-join handles hot users; no driver-side state.
@register("window_gap_sessions", oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events
FROM sessions GROUP BY user_id ORDER BY user_id
""")
def window_gap_sessions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return (sessions.groupBy("user_id")
            .agg(F.countDistinct("session_id").alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .orderBy("user_id"))


# --- W7: 24h service-day rollover (stop_times.py:199-213) -------------------
# The prefix-sum window: offset grows each time the clock goes backwards.
@register("window_time_rollover", oracle="""
WITH t AS (
  SELECT user_id, event_id, ts,
         strftime(ts, '%-H.%M') AS time_str
  FROM events WHERE event_type = 'purchase'
), parsed AS (
  SELECT user_id, event_id, ts, time_str,
         CAST(regexp_extract(time_str, '^(\\d+)\\.', 1) AS INT) * 3600
         + CAST(regexp_extract(time_str, '\\.(\\d+)$', 1) AS INT) * 60
             AS day_seconds
  FROM t
), flagged AS (
  SELECT *, CASE WHEN day_seconds < lag(day_seconds) OVER w
                 THEN 1 ELSE 0 END AS wrapped
  FROM parsed
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, time_str,
       CAST(day_seconds + 86400 * sum(wrapped)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS service_seconds
FROM flagged ORDER BY user_id, ts, event_id
""")
def window_time_rollover(spark, sf_dir):
    e = _t(spark, sf_dir, "events").where("event_type = 'purchase'")
    t = e.withColumn("time_str", F.date_format("ts", "H.mm"))
    day_seconds = (
        F.regexp_extract("time_str", r"^(\d+)\.", 1).cast("int") * 3600
        + F.regexp_extract("time_str", r"\.(\d+)$", 1).cast("int") * 60)
    parsed = t.withColumn("day_seconds", day_seconds)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = parsed.withColumn(
        "wrapped",
        F.when(F.col("day_seconds")
               < F.lag("day_seconds").over(w), 1).otherwise(0))
    return (flagged.withColumn(
                "service_seconds",
                F.col("day_seconds") + 86400 * F.sum("wrapped").over(run))
            .select("user_id", "event_id", "time_str", "service_seconds")
            .orderBy("user_id", "ts", "event_id"))


# --- W8: forward-fill ignore-nulls (table/table.py:668-679) -----------------
@register("window_forward_fill", oracle="""
WITH src AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type <> 'view' THEN props END AS p
  FROM events
)
SELECT user_id, event_id,
       last_value(p IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS filled_props
FROM src ORDER BY user_id, ts, event_id
""")
def window_forward_fill(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    src = e.withColumn(
        "p", F.when(F.col("event_type") != "view", F.col("props")))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0)
    return (src.withColumn(
                "filled_props", F.last("p", ignorenulls=True).over(run))
            .select("user_id", "event_id", "filled_props")
            .orderBy("user_id", "ts", "event_id"))


# --- J2/J3: equi + range join (bounds.py:82-124 analog) ---------------------
# Scale: equi key carries the shuffle; range predicate applied post-join
# (Catalyst pushes it into the sort-merge join condition).
@register("range_join_ship_window", oracle="""
SELECT o_orderpriority,
       count(*) AS n_lines,
       CAST(round(avg(date_diff('day', o_orderdate, l_shipdate))) AS BIGINT)
           AS avg_delay_days
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def range_join_ship_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .where((F.col("l_shipdate") >= F.col("o_orderdate"))
                & (F.col("l_shipdate")
                   <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))))
    return (j.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines"),
                 F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")))
                 .cast("bigint").alias("avg_delay_days"))
            .orderBy("o_orderpriority"))


# --- J4: as-of join via window (no join at all) -----------------------------
# merge-join analog of table/table.py:1261-1288; expressing as-of as a
# forward-fill window removes the join entirely — at 100TB this is one
# shuffle instead of a skew-prone range join.
@register("asof_last_click_before_purchase", oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_click_ts
  FROM events
)
SELECT user_id,
       count(*) AS n_purchases,
       count(last_click_ts) AS n_with_prior_click,
       CAST(round(avg(CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(last_click_ts)) AS BIGINT)))
            AS BIGINT) AS avg_delay_s
FROM ordered WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id
""")
def asof_last_click_before_purchase(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1)
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    ordered = e.withColumn(
        "last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
    return (ordered.where("event_type = 'purchase'")
            .groupBy("user_id")
            .agg(F.count("*").alias("n_purchases"),
                 F.count("last_click_ts").alias("n_with_prior_click"),
                 F.round(F.avg(F.unix_timestamp("ts")
                               - F.unix_timestamp("last_click_ts")))
                 .cast("bigint").alias("avg_delay_s"))
            .orderBy("user_id"))


# --- X10: interval expansion via sequence+explode (entries.py:86-120) -------
@register("interval_expand", oracle="""
SELECT p_brand,
       count(*) AS n_expanded,
       CAST(sum(step) AS BIGINT) AS sum_steps
FROM (SELECT p_brand, unnest(generate_series(1, p_size)) AS step FROM part)
GROUP BY p_brand ORDER BY p_brand
""")
def interval_expand(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (p.select("p_brand",
                     F.explode(F.sequence(F.lit(1), F.col("p_size")))
                     .alias("step"))
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_expanded"),
                 F.sum("step").alias("sum_steps"))
            .orderBy("p_brand"))


# --- X3 (structural core): name normalization -------------------------------
@register("normalize_names", oracle="""
SELECT c_custkey,
       array_to_string(list_sort(list_distinct(list_filter(
           string_split_regex(
               lower(regexp_replace(c_name, '[^a-zA-Z0-9| ]', ' ', 'g')),
               '\\s+'),
           x -> x <> ''))), ' ') AS normalized
FROM customer ORDER BY c_custkey
""")
def normalize_names(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    cleaned = F.lower(F.regexp_replace("c_name", r"[^a-zA-Z0-9| ]", " "))
    norm = F.array_join(
        F.array_sort(F.array_distinct(
            F.filter(F.split(cleaned, r"\s+"), lambda x: x != ""))), " ")
    return (c.select("c_custkey", norm.alias("normalized"))
            .orderBy("c_custkey"))


# --- X20: date bucketing (calendar.py:37-69 analog) --------------------------
@register("date_month_buckets", oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       count(*) AS n_orders,
       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_cents
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
""")
def date_month_buckets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").cast("int").alias("y"),
                      F.month("o_orderdate").cast("int").alias("m"))
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice") * 100).cast("bigint")
                 .alias("total_cents"))
            .orderBy("y", "m"))


# --- U1/U4: union + complementary partition (reader.py:215-220) -------------
@register("union_partition_split", oracle="""
SELECT side, count(*) AS n, CAST(round(sum(value) * 100) AS BIGINT)
           AS value_cents
FROM (
  SELECT 'error' AS side, value FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT 'ok' AS side, value FROM events WHERE event_type <> 'error'
)
GROUP BY side ORDER BY side
""")
def union_partition_split(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    err = e.where("event_type = 'error'").select(
        F.lit("error").alias("side"), "value")
    ok = e.where("event_type <> 'error'").select(
        F.lit("ok").alias("side"), "value")
    return (err.unionByName(ok)
            .groupBy("side")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value") * 100).cast("bigint")
                 .alias("value_cents"))
            .orderBy("side"))


# --- A5: mode / argmax per group (locate/__init__.py:260-277) ----------------
@register("argmax_event_type_per_user", oracle="""
SELECT user_id, event_type AS top_type, n
FROM (SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rk
      FROM events GROUP BY user_id, event_type)
WHERE rk = 1 ORDER BY user_id
""")
def argmax_event_type_per_user(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (counts.withColumn("rk", F.row_number().over(w))
            .where("rk = 1")
            .select("user_id", F.col("event_type").alias("top_type"), "n")
            .orderBy("user_id"))


# --- J6: theta join via regex containment (locate/__init__.py:138-175) ------
# Broadcast nested-loop join with a non-equi predicate: the small side
# broadcasts (like the reference's stop list), the big side scans once.
@register("theta_containment_join", oracle="""
WITH sizes AS (SELECT DISTINCT p_size FROM part WHERE p_size <= 12)
SELECT p_size, count(*) AS n_events
FROM events e JOIN sizes s
  ON regexp_matches(e.props, concat(': ', CAST(p_size AS VARCHAR), '}'))
GROUP BY p_size ORDER BY p_size
""")
def theta_containment_join(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    sizes = (_t(spark, sf_dir, "part")
             .where("p_size <= 12").select("p_size").distinct())
    pred = F.expr(
        "props rlike concat(': ', cast(p_size as string), '\\}')")
    return (e.join(F.broadcast(sizes), pred)
            .groupBy("p_size").agg(F.count("*").alias("n_events"))
            .orderBy("p_size"))


# --- J12: positional zip-strict join (table/table.py:40-55) ------------------
@register("zip_positional_join", oracle="""
WITH c AS (SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal DESC,
                                                c_custkey) AS rn
           FROM customer LIMIT 10),
s AS (SELECT s_suppkey, row_number() OVER (ORDER BY s_acctbal DESC,
                                           s_suppkey) AS rn
      FROM supplier LIMIT 10)
SELECT c.rn AS pos, c_custkey, s_suppkey
FROM c JOIN s ON c.rn = s.rn ORDER BY pos
""")
def zip_positional_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    # limit-first: Spark plans orderBy+limit as TakeOrderedAndProject
    # (per-partition top-k + merge), so the unpartitioned row_number
    # window only ever sees the 10 surviving rows
    wc = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    ws = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    top_c = (c.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")).limit(10)
             .withColumn("rn", F.row_number().over(wc))
             .select("rn", "c_custkey"))
    top_s = (s.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey")).limit(10)
             .withColumn("rn", F.row_number().over(ws))
             .select("rn", "s_suppkey"))
    return (top_c.join(top_s, "rn")
            .select(F.col("rn").alias("pos"), "c_custkey", "s_suppkey")
            .orderBy("pos"))
