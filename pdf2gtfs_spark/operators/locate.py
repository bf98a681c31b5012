"""Per-route location search (SURVEY.md §2.10, reference
locate/finder/*): the one genuinely iterative per-group algorithm.

The reference runs Dijkstra over a layered graph (stop index = layer,
candidate OSM nodes = layer members; loc_nodes.py:546-671). Over a
layered DAG that search is exactly a forward dynamic program:

    best(l, n) = node_cost(n) + min over m in layer l-1
                 [ best(l-1, m) + travel(m, n) ]

Spark shape: ``groupBy(route_id).applyInPandas`` — each route's graph
fits in memory (hundreds of candidates), routes parallelize across the
cluster; numpy evaluates each layer transition as one vectorized
(prev x cur) matrix op, no per-node Python.

The DuckDB oracle unrolls the DP as a chain of CTE layers (fixed layer
count in the synthetic input), proving the applyInPandas result
relationally. Costs are integers (Manhattan travel on integer grid
coords) so both engines agree bit-exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pdf2gtfs_spark.operators import register

N_LAYERS = 6
RESULT_SCHEMA = ("route_id int, stop_idx int, frontier_min bigint, "
                 "best_node bigint")

_CAND_SQL = """
SELECT CAST(p_partkey % 4 AS INT) AS route_id,
       CAST((p_partkey // 4) % 6 AS INT) AS stop_idx,
       p_partkey AS node_id,
       CAST(p_partkey % 100 AS BIGINT) AS gx,
       CAST((p_partkey // 7) % 100 AS BIGINT) AS gy,
       CAST(p_size AS BIGINT) AS node_cost
FROM part
"""


def candidates_df(spark, sf_dir: str):
    """Deterministic layered candidate graph derived from `part`."""
    from pyspark.sql import functions as F

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return p.select(
        (F.col("p_partkey") % 4).cast("int").alias("route_id"),
        (F.floor(F.col("p_partkey") / 4) % 6).cast("int").alias("stop_idx"),
        F.col("p_partkey").alias("node_id"),
        (F.col("p_partkey") % 100).cast("bigint").alias("gx"),
        (F.floor(F.col("p_partkey") / 7) % 100).cast("bigint").alias("gy"),
        F.col("p_size").cast("bigint").alias("node_cost"))


def _route_dp(route: pd.DataFrame) -> pd.DataFrame:
    """Vectorized layered DP for one route (numpy, no per-node loops
    beyond the layer chain)."""
    route_id = int(route["route_id"].iloc[0])
    layers = sorted(route["stop_idx"].unique())
    out = []
    prev_cum = None
    prev_gx = prev_gy = None
    for layer in layers:
        g = route[route["stop_idx"] == layer].sort_values("node_id")
        gx = g["gx"].to_numpy(np.int64)
        gy = g["gy"].to_numpy(np.int64)
        cost = g["node_cost"].to_numpy(np.int64)
        if prev_cum is None:
            cum = cost.copy()
        else:
            # travel = Manhattan distance on the integer grid (X12/X13
            # integer surrogate); (prev x cur) matrix, vectorized
            travel = (np.abs(prev_gx[:, None] - gx[None, :])
                      + np.abs(prev_gy[:, None] - gy[None, :]))
            cum = cost + (prev_cum[:, None] + travel).min(axis=0)
        best_i = int(np.argmin(cum))  # ties: lowest index = lowest node_id
        out.append((route_id, int(layer), int(cum[best_i]),
                    int(g["node_id"].to_numpy()[best_i])))
        prev_cum, prev_gx, prev_gy = cum, gx, gy
    return pd.DataFrame(out, columns=["route_id", "stop_idx",
                                      "frontier_min", "best_node"])


def _dp_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    return _route_dp(pdf)


def _oracle_sql() -> str:
    """Unrolled layered-DP oracle (fixed N_LAYERS)."""
    parts = [f"cand AS ({_CAND_SQL})",
             "l0 AS (SELECT route_id, node_id, gx, gy, "
             "node_cost AS cum FROM cand WHERE stop_idx = 0)"]
    for layer in range(1, N_LAYERS):
        parts.append(f"""
l{layer} AS (
  SELECT c.route_id, c.node_id, c.gx, c.gy,
         c.node_cost + min(p.cum + abs(p.gx - c.gx) + abs(p.gy - c.gy))
             AS cum
  FROM cand c JOIN l{layer - 1} p ON p.route_id = c.route_id
  WHERE c.stop_idx = {layer}
  GROUP BY c.route_id, c.node_id, c.gx, c.gy, c.node_cost
)""")
    selects = [
        f"""SELECT route_id, {layer} AS stop_idx,
           min(cum) AS frontier_min,
           min(node_id) FILTER (WHERE cum = (
               SELECT min(cum) FROM l{layer} i
               WHERE i.route_id = l{layer}.route_id)) AS best_node
    FROM l{layer} GROUP BY route_id"""
        for layer in range(N_LAYERS)]
    return ("WITH " + ",".join(parts) + "\n"
            + "\nUNION ALL\n".join(selects)
            + "\nORDER BY route_id, stop_idx")


@register("route_dijkstra_dp", oracle=_oracle_sql())
def route_dijkstra_dp(spark, sf_dir):
    cand = candidates_df(spark, sf_dir)
    return (cand.groupBy("route_id")
            .applyInPandas(_dp_kernel, RESULT_SCHEMA)
            .orderBy("route_id", "stop_idx"))


# ---------------------------------------------------------------------------
# X13: clamped-log travel cost (reference loc_nodes.py:470-496)
# ---------------------------------------------------------------------------

def travel_cost_col(dist, lower, mid, upper, min_travel_distance=30.0):
    """calculate_travel_cost_between as a Column expression: the cost
    grows double-logarithmically around the expected distance band
    [lower, upper]; distances outside the band shrink the log base
    (coster); too-close nodes are unreachable (NULL here = the
    reference's inf). Pure JVM-side math, no UDF."""
    from pyspark.sql import functions as F

    dist_to_mid = F.greatest(F.lit(1.0), F.abs(dist - mid))
    log_base = F.lit(8.0)
    log_base = F.when(dist < lower, log_base / F.floor(lower / dist)) \
        .otherwise(log_base)
    log_base = F.when(dist > upper, log_base / F.floor(dist / upper)) \
        .otherwise(log_base)
    log_base = F.greatest(F.lit(1.001), log_base)
    inner = F.floor(F.pow(F.log(dist_to_mid) / F.log(log_base), 4.0))
    cost = F.floor(F.log(F.greatest(F.lit(1.0), inner)) / F.log(F.lit(2.0)))
    cost = F.greatest(F.lit(1.0), cost)
    return F.when(dist < min_travel_distance, None).otherwise(cost) \
        .cast("bigint")


_COST_DIM_SQL = """
SELECT p_partkey AS pair_id,
       CAST(20 + (p_partkey * 37) % 4000 AS DOUBLE) AS dist,
       CAST(400 + (p_partkey % 5) * 50 AS DOUBLE) AS lower,
       CAST(900 + (p_partkey % 7) * 40 AS DOUBLE) AS mid,
       CAST(1900 + (p_partkey % 3) * 100 AS DOUBLE) AS upper
FROM part
"""


@register("locate_travel_cost", oracle=f"""
WITH d AS ({_COST_DIM_SQL}),
c AS (
  SELECT pair_id, dist,
         greatest(1.001,
             8.0 / (CASE WHEN dist < lower
                         THEN floor(lower / dist) ELSE 1 END)
                 / (CASE WHEN dist > upper
                         THEN floor(dist / upper) ELSE 1 END)) AS log_base,
         greatest(1.0, abs(dist - mid)) AS dist_to_mid
  FROM d
)
SELECT pair_id,
       CASE WHEN dist < 30 THEN NULL
            ELSE CAST(greatest(1.0, floor(ln(greatest(1.0,
                 floor(pow(ln(dist_to_mid) / ln(log_base), 4.0))))
                 / ln(2.0))) AS BIGINT) END AS travel_cost
FROM c ORDER BY pair_id
""")
def locate_travel_cost(spark, sf_dir):
    """Clamped double-log travel cost over a deterministic distance
    dim derived from `part` (distances 20..4020, bands per key)."""
    from pyspark.sql import functions as F

    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    d = p.select(
        F.col("p_partkey").alias("pair_id"),
        (20 + (F.col("p_partkey") * 37) % 4000).cast("double")
        .alias("dist"),
        (400 + (F.col("p_partkey") % 5) * 50).cast("double").alias("lower"),
        (900 + (F.col("p_partkey") % 7) * 40).cast("double").alias("mid"),
        (1900 + (F.col("p_partkey") % 3) * 100).cast("double")
        .alias("upper"))
    return (d.select(
                "pair_id",
                travel_cost_col(F.col("dist"), F.col("lower"),
                                F.col("mid"), F.col("upper"))
                .alias("travel_cost"))
            .orderBy("pair_id"))


# ---------------------------------------------------------------------------
# 3-phase location interpolation (reference finder/__init__.py:84-163)
# ---------------------------------------------------------------------------

def interpolate_locations(nodes, route_col="route_id", idx_col="stop_idx",
                          lat_col="lat", lon_col="lon"):
    """Window-based port of interpolate_missing_node_locations:

    1. intermediate missing nodes blend linearly between the previous
       and next valid nodes (equal spacing);
    2. trailing missing nodes extend the last valid step vector;
    3. leading missing nodes extend the first valid step backwards
       (the reference's reversed pass).

    Routes with fewer than two valid nodes keep their NULLs (the
    reference bails, finder/__init__.py:149-159). Two window passes +
    one broadcastable per-route boundary join — no UDF.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w_prev = (Window.partitionBy(route_col).orderBy(idx_col)
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(route_col).orderBy(idx_col)
              .rowsBetween(0, Window.unboundedFollowing))
    # materialize validity BEFORE phase 1 overwrites the columns —
    # otherwise later expressions would see the filled values
    df = nodes.withColumn("_valid", F.col(lat_col).isNotNull())
    valid = F.col("_valid")
    vidx = F.when(valid, F.col(idx_col))
    for c in (lat_col, lon_col):
        df = (df.withColumn(f"_p_{c}", F.last(F.when(valid, F.col(c)),
                                              True).over(w_prev))
              .withColumn(f"_n_{c}", F.first(F.when(valid, F.col(c)),
                                             True).over(w_next)))
    df = (df.withColumn("_p_i", F.last(vidx, True).over(w_prev))
          .withColumn("_n_i", F.first(vidx, True).over(w_next)))

    # phase 1: intermediate
    frac = ((F.col(idx_col) - F.col("_p_i"))
            / (F.col("_n_i") - F.col("_p_i")))
    for c in (lat_col, lon_col):
        df = df.withColumn(
            c,
            F.when(valid, F.col(c))
            .when(F.col("_p_i").isNotNull() & F.col("_n_i").isNotNull(),
                  F.col(f"_p_{c}")
                  + (F.col(f"_n_{c}") - F.col(f"_p_{c}")) * frac))

    # per-route boundary steps from the phase-1 result
    w_all = Window.partitionBy(route_col).orderBy(idx_col)
    filled = df.withColumn("_lag_lat", F.lag(lat_col).over(w_all)) \
               .withColumn("_lag_lon", F.lag(lon_col).over(w_all)) \
               .withColumn("_lead_lat", F.lead(lat_col).over(w_all)) \
               .withColumn("_lead_lon", F.lead(lon_col).over(w_all))
    agg = (filled.groupBy(route_col).agg(
        F.min(F.when(valid, F.col(idx_col))).alias("_fv"),
        F.max(F.when(valid, F.col(idx_col))).alias("_lv"),
        F.count(F.when(valid, 1)).alias("_nv"),
        # step into the last valid node (end extrapolation vector)
        F.max_by(F.col(lat_col) - F.col("_lag_lat"),
                 F.when(valid & F.col("_lag_lat").isNotNull(),
                        F.col(idx_col))).alias("_se_lat"),
        F.max_by(F.col(lon_col) - F.col("_lag_lon"),
                 F.when(valid & F.col("_lag_lon").isNotNull(),
                        F.col(idx_col))).alias("_se_lon"),
        # step out of the first valid node (start extrapolation vector)
        F.min_by(F.col("_lead_lat") - F.col(lat_col),
                 F.when(valid & F.col("_lead_lat").isNotNull(),
                        F.col(idx_col))).alias("_ss_lat"),
        F.min_by(F.col("_lead_lon") - F.col(lon_col),
                 F.when(valid & F.col("_lead_lon").isNotNull(),
                        F.col(idx_col))).alias("_ss_lon"),
        # boundary locations
        F.min_by(F.when(valid, F.col(lat_col)),
                 F.when(valid, F.col(idx_col))).alias("_fl_lat"),
        F.min_by(F.when(valid, F.col(lon_col)),
                 F.when(valid, F.col(idx_col))).alias("_fl_lon"),
        F.max_by(F.when(valid, F.col(lat_col)),
                 F.when(valid, F.col(idx_col))).alias("_ll_lat"),
        F.max_by(F.when(valid, F.col(lon_col)),
                 F.when(valid, F.col(idx_col))).alias("_ll_lon")))
    out = df.join(F.broadcast(agg), route_col)
    enough = F.col("_nv") >= 2
    for c, sl, ll, ss, fl in (
            (lat_col, "_se_lat", "_ll_lat", "_ss_lat", "_fl_lat"),
            (lon_col, "_se_lon", "_ll_lon", "_ss_lon", "_fl_lon")):
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(enough & (F.col(idx_col) > F.col("_lv")),
                  F.col(ll) + F.col(sl)
                  * (F.col(idx_col) - F.col("_lv")))
            .when(enough & (F.col(idx_col) < F.col("_fv")),
                  F.col(fl) - F.col(ss)
                  * (F.col("_fv") - F.col(idx_col))))
    keep = [route_col, idx_col, lat_col, lon_col]
    return out.select(*keep)


@register("locate_interpolation", oracle="""
WITH nodes AS (
  SELECT CAST(i // 12 AS INT) AS route_id, CAST(i % 12 AS INT) AS stop_idx,
         CASE WHEN (i % 12) IN (5, 6) OR (i * i + i // 12) % 3 = 0
              THEN CAST(2520 * ((i * 7) % 50) AS DOUBLE) END AS lat,
         CASE WHEN (i % 12) IN (5, 6) OR (i * i + i // 12) % 3 = 0
              THEN CAST(2520 * ((i * 11) % 50) AS DOUBLE) END AS lon
  FROM (SELECT unnest(generate_series(0, 95)) AS i)
), q AS (
  SELECT route_id, stop_idx, lat, lon,
    max(CASE WHEN lat IS NOT NULL THEN stop_idx END) OVER wp AS p_i,
    min(CASE WHEN lat IS NOT NULL THEN stop_idx END) OVER wn AS n_i,
    last_value(lat IGNORE NULLS) OVER wp AS p_lat,
    last_value(lon IGNORE NULLS) OVER wp AS p_lon,
    first_value(lat IGNORE NULLS) OVER wn AS n_lat,
    first_value(lon IGNORE NULLS) OVER wn AS n_lon
  FROM nodes
  WINDOW wp AS (PARTITION BY route_id ORDER BY stop_idx
                ROWS UNBOUNDED PRECEDING),
         wn AS (PARTITION BY route_id ORDER BY stop_idx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), ph1 AS (
  SELECT route_id, stop_idx,
    CASE WHEN lat IS NOT NULL THEN lat
         WHEN p_i IS NOT NULL AND n_i IS NOT NULL
         THEN p_lat + (n_lat - p_lat) * (stop_idx - p_i)
              / CAST(n_i - p_i AS DOUBLE) END AS lat,
    CASE WHEN lon IS NOT NULL THEN lon
         WHEN p_i IS NOT NULL AND n_i IS NOT NULL
         THEN p_lon + (n_lon - p_lon) * (stop_idx - p_i)
              / CAST(n_i - p_i AS DOUBLE) END AS lon,
    lat IS NOT NULL AS valid
  FROM q
), steps AS (
  SELECT route_id,
    min(CASE WHEN valid THEN stop_idx END) AS fv,
    max(CASE WHEN valid THEN stop_idx END) AS lv,
    count(CASE WHEN valid THEN 1 END) AS nv,
    arg_max(lat - lag_lat, CASE WHEN valid AND lag_lat IS NOT NULL
                                THEN stop_idx END) AS se_lat,
    arg_max(lon - lag_lon, CASE WHEN valid AND lag_lon IS NOT NULL
                                THEN stop_idx END) AS se_lon,
    arg_min(lead_lat - lat, CASE WHEN valid AND lead_lat IS NOT NULL
                                 THEN stop_idx END) AS ss_lat,
    arg_min(lead_lon - lon, CASE WHEN valid AND lead_lon IS NOT NULL
                                 THEN stop_idx END) AS ss_lon,
    arg_min(CASE WHEN valid THEN lat END,
            CASE WHEN valid THEN stop_idx END) AS fl_lat,
    arg_min(CASE WHEN valid THEN lon END,
            CASE WHEN valid THEN stop_idx END) AS fl_lon,
    arg_max(CASE WHEN valid THEN lat END,
            CASE WHEN valid THEN stop_idx END) AS ll_lat,
    arg_max(CASE WHEN valid THEN lon END,
            CASE WHEN valid THEN stop_idx END) AS ll_lon
  FROM (SELECT *,
          lag(lat) OVER w AS lag_lat, lag(lon) OVER w AS lag_lon,
          lead(lat) OVER w AS lead_lat, lead(lon) OVER w AS lead_lon
        FROM ph1 WINDOW w AS (PARTITION BY route_id ORDER BY stop_idx))
  GROUP BY route_id
)
SELECT p.route_id, p.stop_idx,
  CAST(round(coalesce(p.lat,
      CASE WHEN s.nv >= 2 AND p.stop_idx > s.lv
           THEN s.ll_lat + s.se_lat * (p.stop_idx - s.lv)
           WHEN s.nv >= 2 AND p.stop_idx < s.fv
           THEN s.fl_lat - s.ss_lat * (s.fv - p.stop_idx) END))
      AS BIGINT) AS lat_i,
  CAST(round(coalesce(p.lon,
      CASE WHEN s.nv >= 2 AND p.stop_idx > s.lv
           THEN s.ll_lon + s.se_lon * (p.stop_idx - s.lv)
           WHEN s.nv >= 2 AND p.stop_idx < s.fv
           THEN s.fl_lon - s.ss_lon * (s.fv - p.stop_idx) END))
      AS BIGINT) AS lon_i
FROM ph1 p JOIN steps s USING (route_id)
ORDER BY p.route_id, p.stop_idx
""")
def locate_interpolation(spark, sf_dir):
    """3-phase missing-location interpolation on a deterministic
    8-route x 12-stop dim (locations are multiples of 2520 so every
    blend divides exactly; at least two valid nodes per route by
    construction: stop 5 and 6 always valid)."""
    from pyspark.sql import functions as F

    base = spark.range(96).select(
        F.floor(F.col("id") / 12).cast("int").alias("route_id"),
        (F.col("id") % 12).cast("int").alias("stop_idx"),
        F.col("id").alias("i"))
    known = ((F.col("stop_idx").isin(5, 6))
             | ((F.col("i") * F.col("i")
                 + F.floor(F.col("i") / 12)) % 3 == 0))
    nodes = base.select(
        "route_id", "stop_idx",
        F.when(known, (2520 * ((F.col("i") * 7) % 50)).cast("double"))
        .alias("lat"),
        F.when(known, (2520 * ((F.col("i") * 11) % 50)).cast("double"))
        .alias("lon"))
    out = interpolate_locations(nodes)
    return (out.select("route_id", "stop_idx",
                       F.round("lat").cast("bigint").alias("lat_i"),
                       F.round("lon").cast("bigint").alias("lon_i"))
            .orderBy("route_id", "stop_idx"))


# ---------------------------------------------------------------------------
# J6 + name_cost (reference locate/__init__.py:138-175)
# ---------------------------------------------------------------------------

@register("locate_name_cost", oracle="""
WITH stops AS (
  SELECT n_nationkey AS stop_id, lower(n_name) AS stop_name,
         length(replace(lower(n_name), ' ', '')) AS stop_len
  FROM nation
), nodes AS (
  -- OSM-ish node names: the customer's nation name plus a suffix
  SELECT c_custkey AS node_id,
         concat(lower(n_name), ' halt ',
                CAST(c_custkey % 10 AS VARCHAR)) AS names
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_custkey % 13 = 0
)
SELECT s.stop_id, n.node_id,
       abs(s.stop_len - length(replace(n.names, ' ', ''))) AS name_cost
FROM stops s JOIN nodes n
  ON regexp_matches(n.names, concat('\\b', s.stop_name, '\\b'))
ORDER BY stop_id, node_id
""")
def locate_name_cost(spark, sf_dir):
    """J6 theta join (node names must contain the stop's words) plus
    the per-pair name_cost = length difference ignoring spaces
    (locate/__init__.py:152-175). Stops side broadcast."""
    from pyspark.sql import functions as F

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    stops = n.select(
        F.col("n_nationkey").alias("stop_id"),
        F.lower("n_name").alias("stop_name"),
        F.length(F.regexp_replace(F.lower("n_name"), " ", ""))
        .alias("stop_len"))
    nodes = (c.where("c_custkey % 13 = 0")
             .join(n, c.c_nationkey == n.n_nationkey)
             .select(F.col("c_custkey").alias("node_id"),
                     F.concat(F.lower("n_name"), F.lit(" halt "),
                              (F.col("c_custkey") % 10).cast("string"))
                     .alias("names")))
    joined = nodes.join(
        F.broadcast(stops),
        F.expr(r"names rlike concat('\\b', stop_name, '\\b')"))
    return (joined.select(
                "stop_id", "node_id",
                F.abs(F.col("stop_len")
                      - F.length(F.regexp_replace("names", " ", "")))
                .alias("name_cost"))
            .orderBy("stop_id", "node_id"))
