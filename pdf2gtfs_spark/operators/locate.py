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


def _dp_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
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
