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
