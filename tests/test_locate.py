"""Per-route layered DP (Dijkstra equivalent) kernel unit tests."""

import pandas as pd

from pdf2gtfs_spark.operators.locate import _route_dp


def _cand(route_id, stop_idx, node_id, gx, gy, cost):
    return dict(route_id=route_id, stop_idx=stop_idx, node_id=node_id,
                gx=gx, gy=gy, node_cost=cost)


class TestRouteDp:
    def test_two_layer_known_answer(self):
        # layer0: A(0,0,c1), B(10,10,c1); layer1: C(1,0,c5)
        # best: A->C = 1 + (1 travel) + 5 = 7 vs B->C = 1+19+5=25
        df = pd.DataFrame([
            _cand(0, 0, 100, 0, 0, 1),
            _cand(0, 0, 101, 10, 10, 1),
            _cand(0, 1, 200, 1, 0, 5),
        ])
        out = _route_dp(df)
        assert list(out["frontier_min"]) == [1, 7]
        assert list(out["best_node"]) == [100, 200]

    def test_tie_breaks_to_lowest_node_id(self):
        df = pd.DataFrame([
            _cand(1, 0, 7, 0, 0, 3),
            _cand(1, 0, 5, 0, 0, 3),
        ])
        out = _route_dp(df)
        assert out["best_node"].iloc[0] == 5


class TestTravelCost:
    """Reference truth: calculate_travel_cost_between
    (loc_nodes.py:470-496) evaluated in pure Python."""

    @staticmethod
    def _ref(dist, lower, mid, upper, min_travel=30.0):
        from math import inf, log
        if dist < min_travel:
            return None  # reference: inf (we emit NULL)
        dist_to_mid = max(1, abs(dist - mid))
        log_base = 8
        if dist < lower:
            log_base /= lower // dist
        if dist > upper:
            log_base /= dist // upper
        log_base = max(1.001, log_base)
        cost = int(log(max(1, int(log(dist_to_mid, log_base) ** 4)), 2))
        return max(1, cost)

    def test_column_matches_reference_formula(self, spark):
        from pyspark.sql import functions as F

        from pdf2gtfs_spark.operators.locate import travel_cost_col

        cases = [(10.0,), (35.0,), (120.0,), (450.0,), (999.0,),
                 (1000.0,), (1500.0,), (2500.0,), (3999.0,)]
        lower, mid, upper = 400.0, 1000.0, 2000.0
        df = spark.createDataFrame(cases, "dist double").select(
            "dist", travel_cost_col(F.col("dist"), F.lit(lower),
                                    F.lit(mid), F.lit(upper))
            .alias("cost"))
        for r in df.collect():
            assert r["cost"] == self._ref(r["dist"], lower, mid, upper), \
                r["dist"]


class TestInterpolation:
    def test_three_phases(self, spark):
        from pdf2gtfs_spark.operators.locate import interpolate_locations

        # route 0: missing at idx 0 (start), 2-3 (middle), 5 (end)
        rows = [(0, 0, None, None), (0, 1, 100.0, 10.0),
                (0, 2, None, None), (0, 3, None, None),
                (0, 4, 400.0, 40.0), (0, 5, None, None),
                # route 1: single valid node -> stays null
                (1, 0, None, None), (1, 1, 7.0, 7.0), (1, 2, None, None)]
        df = spark.createDataFrame(
            rows, "route_id int, stop_idx int, lat double, lon double")
        out = {(r["route_id"], r["stop_idx"]): (r["lat"], r["lon"])
               for r in interpolate_locations(df).collect()}
        # intermediate: equal spacing 100->400 over 3 steps
        assert out[(0, 2)] == (200.0, 20.0)
        assert out[(0, 3)] == (300.0, 30.0)
        # end: extend the last step (400-300 = 100)
        assert out[(0, 5)] == (500.0, 50.0)
        # start: extend the first step backwards (200-100 = 100)
        assert out[(0, 0)] == (0.0, 0.0)
        # <2 valid nodes: untouched
        assert out[(1, 0)] == (None, None)
        assert out[(1, 2)] == (None, None)


class TestRouteSearchInvariants:
    def test_all_invariants_hold(self, spark):
        """Heap-interior invariants (VERDICT r4 ask #5): the oracle
        hash match only pins cross-engine consistency; this asserts
        the flags are actually TRUE — chain completeness, cost
        monotonicity, candidate membership, missing-node shape, start
        cost and per-step cost accounting."""
        from pdf2gtfs_spark.operators.locate_route import (
            locate_route_invariants_query)

        rows = locate_route_invariants_query(
            spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 2
        flags = ["chain_complete", "stop_ids_match", "cost_monotone",
                 "found_in_candidates", "missing_well_formed",
                 "start_cost_ok", "cost_steps_ok"]
        for r in rows:
            for f in flags:
                assert r[f] is True, (r["route_id"], f)
