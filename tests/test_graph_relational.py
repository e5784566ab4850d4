"""Integer-exact PageRank (stages/cluster.py) and the round-3 relational
additions (Q5-shape local-supplier revenue, grouped co-moments)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from deepblocker_ray.config import EngineConfig
from deepblocker_ray.stages.cluster import pagerank
from deepblocker_ray.stages.relational import (
    group_comoments,
    local_supplier_revenue,
)


def _cfg(**kw):
    return EngineConfig(num_buckets=8, **kw)


def _pr_reference(edges, iters, scale=10**9, d=85):
    """Same integer formula, plain Python."""
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    pr = {v: scale for v in od}
    base = scale * (100 - d) // 100
    for _ in range(iters):
        inc = {v: 0 for v in od}
        for s, t in edges:
            inc[t] += pr[s] // od[s]
        pr = {v: base + d * inc[v] // 100 for v in od}
    return pr


class TestPageRank:
    def _run(self, edges, iters=3):
        ds = rd.from_pandas(
            pd.DataFrame(edges, columns=["src", "dst"])
        )
        out = pagerank(ds, _cfg(), iters=iters).to_pandas()
        return dict(zip(out["vec_id"], out["pr"]))

    def test_cycle_uniform(self, ray_session):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        got = self._run(edges)
        want = _pr_reference(edges, 3)
        assert got == want
        # symmetric graph ⇒ identical ranks
        assert len(set(got.values())) == 1

    def test_star_hub_dominates(self, ray_session):
        # spokes point at hub; hub points back at one spoke
        edges = [("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1")]
        got = self._run(edges)
        want = _pr_reference(edges, 3)
        assert got == want
        assert got["h"] > got["s2"] > got["s3"] - 1  # s2 == s3

    def test_multi_outdegree_truncation(self, ray_session):
        # outdeg 3 → pr // 3 truncates; the engine must truncate the same
        edges = [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "a"), ("c", "a"), ("d", "a"),
        ]
        for iters in (1, 2, 4):
            assert self._run(edges, iters) == _pr_reference(edges, iters)

    def test_random_graph_matches_reference(self, ray_session):
        rng = np.random.default_rng(11)
        nodes = [f"n{i}" for i in range(30)]
        edges = []
        for s in nodes:
            for t in rng.choice(30, size=4, replace=False):
                if nodes[t] != s:
                    edges.append((s, nodes[t]))
        assert self._run(edges) == _pr_reference(edges, 3)


class TestGroupComoments:
    def test_hand_computed(self, ray_session):
        li = rd.from_pandas(
            pd.DataFrame(
                {
                    "l_returnflag": ["A", "A", "B"],
                    "l_quantity": [2.0, 3.0, 10.0],
                    "l_discount": [0.05, 0.10, 0.0],
                }
            )
        )
        out = group_comoments(li, _cfg()).to_pandas().set_index(
            "l_returnflag"
        )
        a = out.loc["A"]
        assert (a["n"], a["sum_q"], a["sum_d"]) == (2, 5, 15)
        assert (a["sum_qq"], a["sum_dd"], a["sum_qd"]) == (13, 125, 40)
        b = out.loc["B"]
        assert (b["n"], b["sum_q"], b["sum_d"], b["sum_qd"]) == (1, 10, 0, 0)


class TestLocalSupplierRevenue:
    def _tables(self):
        region = pd.DataFrame(
            {"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]}
        )
        nation = pd.DataFrame(
            {
                "n_nationkey": [0, 1, 2],
                "n_name": ["JAPAN", "CHINA", "FRANCE"],
                "n_regionkey": [0, 0, 1],
            }
        )
        supplier = pd.DataFrame(
            {"s_suppkey": [10, 11, 12], "s_nationkey": [0, 1, 2]}
        )
        customer = pd.DataFrame(
            {"c_custkey": [100, 101, 102], "c_nationkey": [0, 1, 2]}
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": [1000, 1001, 1002],
                "o_custkey": [100, 101, 102],
                "o_orderdate": pd.to_datetime(
                    ["1997-06-01", "1997-07-01", "1997-08-01"]
                ).astype("datetime64[us]"),
            }
        )
        lineitem = pd.DataFrame(
            {
                # order 1000 (cust JAPAN): supp 10 (JAPAN, local → counts),
                #   supp 11 (CHINA, non-local → dropped)
                # order 1001 (cust CHINA): supp 11 (CHINA, local → counts)
                # order 1002 (cust FRANCE): supp 12 — FRANCE not in ASIA
                "l_orderkey": [1000, 1000, 1001, 1002],
                "l_suppkey": [10, 11, 11, 12],
                "l_extendedprice": [100.0, 50.0, 200.0, 70.0],
                "l_discount": [0.10, 0.0, 0.05, 0.0],
            }
        )
        return customer, orders, lineitem, supplier, nation, region

    def _want(self):
        # JAPAN: 10000 cents × (100-10) = 900000
        # CHINA: 20000 cents × (100-5)  = 1900000
        return [("CHINA", 1900000), ("JAPAN", 900000)]

    def _run(self, cfg):
        dss = [rd.from_pandas(t) for t in self._tables()]
        out = local_supplier_revenue(
            *dss,
            cfg,
            region_name="ASIA",
            date_lo_us=852076800000000,
            date_hi_us=883612800000000,
        ).to_pandas()
        return list(map(tuple, out[["n_name", "revenue_e4"]].to_numpy()))

    def test_broadcast_path(self, ray_session):
        assert self._run(_cfg()) == self._want()

    def test_join_fallback_path(self, ray_session):
        # supplier above the broadcast cap → hash-join attach, same result
        assert self._run(_cfg(broadcast_rows_max=1)) == self._want()


class TestLocalClustering:
    def _pairs(self, edges):
        return rd.from_pandas(
            pd.DataFrame(edges, columns=["left_id", "right_id"])
        )

    def test_triangle_plus_pendant(self, ray_session):
        from deepblocker_ray.stages.cluster import local_clustering

        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
        out = (
            local_clustering(self._pairs(edges), _cfg())
            .to_pandas()
            .set_index("vec_id")
        )
        assert dict(out["deg"]) == {"a": 2, "b": 2, "c": 3, "d": 1}
        assert dict(out["n_tri"]) == {"a": 1, "b": 1, "c": 1, "d": 0}

    def test_max_degree_cap_reports_minus_one(self, ray_session):
        from deepblocker_ray.stages.cluster import local_clustering

        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
        out = (
            local_clustering(self._pairs(edges), _cfg(), max_degree=2)
            .to_pandas()
            .set_index("vec_id")
        )
        # c (deg 3) is capped → no silent wrong count, −1 sentinel;
        # a and b still close their wedge through the (b, c) edge
        assert out.loc["c", "n_tri"] == -1
        assert out.loc["a", "n_tri"] == 1
        assert out.loc["b", "n_tri"] == 1
        assert out.loc["d", "n_tri"] == 0

    def test_k4_complete(self, ray_session):
        from deepblocker_ray.stages.cluster import local_clustering

        nodes = ["w", "x", "y", "z"]
        edges = [
            (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]
        ]
        out = (
            local_clustering(self._pairs(edges), _cfg())
            .to_pandas()
            .set_index("vec_id")
        )
        # K4: every node has deg 3 and sits in C(3,2) = 3 triangles
        assert set(out["deg"]) == {3}
        assert set(out["n_tri"]) == {3}


class TestMultipassBlocking:
    def test_provenance_bitmask(self, ray_session):
        from deepblocker_ray.stages.matching import multipass_blocking

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(4, dtype=np.int64),
                    "text": [
                        "alpha beta gamma delta",
                        "alpha beta gamma delta",
                        "alpha beta gamma delta",
                        "",
                    ],
                }
            )
        )
        out = multipass_blocking(docs, _cfg()).to_pandas()
        got = {
            (l, r): s
            for l, r, s in out[
                ["left_id", "right_id", "sources"]
            ].to_numpy()
        }
        # three identical docs: SNM+JW finds all 3 pairs (bit 1) AND
        # meta-blocking keeps all 3 gram edges (bit 2) → sources = 3;
        # the empty doc pairs with nothing on either pass
        assert got == {("0", "1"): 3, ("0", "2"): 3, ("1", "2"): 3}


class TestNeighborMajorityLabel:
    def test_mode_and_tiebreak(self, ray_session):
        from deepblocker_ray.stages.cluster import neighbor_majority_label

        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": ["a", "a", "a", "b"],
                    "right_id": ["b", "c", "d", "c"],
                }
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": ["a", "b", "c", "d"],
                    "label": np.array([9, 2, 2, 1], np.int64),
                }
            )
        )
        out = (
            neighbor_majority_label(pairs, labels, _cfg())
            .to_pandas()
            .set_index("vec_id")
        )
        # a's nbrs: b(2), c(2), d(1) → 2; b's nbrs: a(9), c(2) → tie 1-1
        #   → smaller label 2; c's nbrs: a(9), b(2) → 2; d's nbrs: a → 9
        assert dict(out["maj_label"]) == {"a": 2, "b": 2, "c": 2, "d": 9}


class TestFKOrphans:
    def _run(self, child_keys, parent_keys, cfg, swap=False):
        from deepblocker_ray.stages.relational import fk_orphans

        child = rd.from_pandas(
            pd.DataFrame({"ck": np.asarray(child_keys, np.int64)})
        )
        parent = rd.from_pandas(
            pd.DataFrame({"pk": np.asarray(parent_keys, np.int64)})
        )
        out = fk_orphans(
            child, parent, cfg, child_key="ck", parent_key="pk",
            relation="t",
        ).to_pandas()
        assert list(out["relation"]) == ["t"]
        return int(out["n_orphans"].iloc[0])

    def test_planted_orphans(self, ray_session):
        # children 0..9; parents cover 0..6 → orphans 7, 8, 9 (+dup 8)
        assert self._run([*range(10), 8], range(7), _cfg()) == 4

    def test_no_orphans(self, ray_session):
        assert self._run(range(5), range(9), _cfg()) == 0

    def test_join_fallback_path(self, ray_session):
        cfg = _cfg(broadcast_rows_max=2)
        assert self._run([*range(10), 8], range(7), cfg) == 4


class TestJoinSizeEstimate:
    def test_exact_cardinality(self, ray_session):
        from deepblocker_ray.stages.relational import join_size_estimate

        l = rd.from_pandas(
            pd.DataFrame({"k": np.array([1, 1, 2, 3, 3, 3], np.int64)})
        )
        r = rd.from_pandas(
            pd.DataFrame({"k": np.array([1, 3, 3, 4], np.int64)})
        )
        out = join_size_estimate(
            l, r, _cfg(), left_key="k", right_key="k"
        ).to_pandas()
        row = out.iloc[0]
        # 1: 2×1=2 ; 3: 3×2=6 → 8
        assert row["join_rows"] == 8
        assert row["left_rows"] == 6 and row["right_rows"] == 4
        assert row["left_keys"] == 3 and row["right_keys"] == 3


class TestGraphModularity:
    """Hand-computed Newman Q + attach-path parity."""

    def _data(self, rd):
        import pandas as pd

        # two triangles joined by one bridge edge; labels = the triangles.
        # m = 7, e_A = e_B = 3, d_A = d_B = 7 (bridge adds 1 to each side).
        # Q = (4·7·6 − 2·49) / (4·49) = (168 − 98) / 196 = 70/196
        edges = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": ["a1", "a1", "a2", "b1", "b1", "b2", "a3"],
                    "right_id": ["a2", "a3", "a3", "b2", "b3", "b3", "b1"],
                }
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": ["a1", "a2", "a3", "b1", "b2", "b3"],
                    "cluster_id": ["A", "A", "A", "B", "B", "B"],
                }
            )
        )
        return edges, labels

    def test_hand_computed(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import graph_modularity

        edges, labels = self._data(rd)
        out = graph_modularity(
            edges, labels, EngineConfig(num_buckets=4)
        ).to_pandas()
        assert out.loc[0, "n_edges"] == 7
        assert out.loc[0, "n_clusters"] == 2
        assert out.loc[0, "q"] == 70.0 / 196.0

    def test_attach_paths_equal(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import graph_modularity

        edges, labels = self._data(rd)
        a = graph_modularity(
            edges, labels, EngineConfig(num_buckets=4)
        ).to_pandas()
        edges, labels = self._data(rd)
        b = graph_modularity(
            edges, labels, EngineConfig(num_buckets=4, broadcast_rows_max=0)
        ).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_singleton_labels_zero_internal(self, ray_session):
        """Every node its own cluster: no within-cluster edges, Q < 0."""
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import graph_modularity

        edges = rd.from_pandas(
            pd.DataFrame({"left_id": ["x"], "right_id": ["y"]})
        )
        labels = rd.from_pandas(
            pd.DataFrame({"doc_id": ["x", "y"], "cluster_id": ["x", "y"]})
        )
        out = graph_modularity(
            edges, labels, EngineConfig(num_buckets=4)
        ).to_pandas()
        # m=1, Σe=0, d_x=d_y=1 → Q = (0 − 2)/4 = −0.5
        assert out.loc[0, "q"] == -0.5


class TestKCorePeel:
    def _edges(self, rd, pairs):
        import pandas as pd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [a for a, _ in pairs],
                    "right_id": [b for _, b in pairs],
                }
            )
        )

    def test_k4_with_pendant(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import kcore_peel

        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
              ("b", "d"), ("c", "d"), ("a", "e")]
        out = (
            kcore_peel(self._edges(rd, k4), EngineConfig(num_buckets=4),
                       k=3, rounds=2)
            .to_pandas().set_index("node")["degree"].to_dict()
        )
        # pendant e peels in round 1; the K4 is the exact 3-core
        assert out == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_chain_peels_to_empty(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import kcore_peel

        chain = [("a", "b"), ("b", "c"), ("c", "d")]
        out = kcore_peel(
            self._edges(rd, chain), EngineConfig(num_buckets=4),
            k=2, rounds=2,
        ).to_pandas()
        assert len(out) == 0   # ends peel first, then the middle edge

    def test_semi_join_paths_equal(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import kcore_peel

        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
              ("b", "d"), ("c", "d"), ("a", "e"), ("e", "f")]
        a = (
            kcore_peel(self._edges(rd, k4), EngineConfig(num_buckets=4),
                       k=2, rounds=2)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        b = (
            kcore_peel(
                self._edges(rd, k4),
                EngineConfig(num_buckets=4, broadcast_rows_max=0),
                k=2, rounds=2,
            )
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestLargeOrders:
    def test_hand_computed(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import large_orders

        li = rd.from_pandas(
            pd.DataFrame(
                {
                    "l_orderkey": [1, 1, 2, 3, 3, 3],
                    "l_quantity": [200.0, 150.5, 100.0, 120.0, 90.0, 95.0],
                }
            )
        )
        orders = rd.from_pandas(
            pd.DataFrame(
                {
                    "o_orderkey": [1, 2, 3],
                    "o_custkey": [10, 20, 10],
                    "o_totalprice": [1000.25, 50.0, 700.0],
                }
            )
        )
        cust = rd.from_pandas(
            pd.DataFrame({"c_custkey": [10, 20], "c_name": ["alice", "bob"]})
        )
        out = (
            large_orders(li, orders, cust, EngineConfig(num_buckets=4),
                         min_qty_cents=30000)
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True)
        )
        # order1: 35050 > 30000; order2: 10000 no; order3: 30500 > 30000
        assert list(out["o_orderkey"]) == [1, 3]
        assert list(out["sum_qty_cents"]) == [35050, 30500]
        assert list(out["o_total_cents"]) == [100025, 70000]
        assert list(out["c_name"]) == ["alice", "alice"]


class TestPromoRevenue:
    def test_hand_computed(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import promo_revenue

        li = rd.from_pandas(
            pd.DataFrame(
                {
                    "l_partkey": [1, 2, 1],
                    "l_extendedprice": [10.0, 20.0, 5.5],
                    "l_discount": [0.10, 0.0, 0.05],
                }
            )
        )
        part = rd.from_pandas(
            pd.DataFrame(
                {"p_partkey": [1, 2], "p_type": ["PROMO", "STANDARD"]}
            )
        )
        row = (
            promo_revenue(li, part, EngineConfig(num_buckets=4))
            .to_pandas().iloc[0]
        )
        # rev units: 1000·90=90000 (promo), 2000·100=200000, 550·95=52250 (promo)
        assert row["promo_revenue"] == 142250
        assert row["total_revenue"] == 342250
        assert row["promo_pct"] == (100.0 * 142250.0) / 342250.0

    def test_empty_total_pins_zero(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import promo_revenue

        li = rd.from_pandas(
            pd.DataFrame(
                {
                    "l_partkey": [9],
                    "l_extendedprice": [10.0],
                    "l_discount": [0.0],
                }
            )
        )
        part = rd.from_pandas(
            pd.DataFrame({"p_partkey": [1], "p_type": ["PROMO"]})
        )
        row = (
            promo_revenue(li, part, EngineConfig(num_buckets=4))
            .to_pandas().iloc[0]
        )
        # inner join drops the orphan lineitem: nothing qualifies
        assert row["total_revenue"] == 0 and row["promo_pct"] == 0.0


class TestReturnedRevenueTopK:
    def test_hand_computed(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import returned_revenue_topk

        li = rd.from_pandas(
            pd.DataFrame(
                {
                    "l_orderkey": [1, 1, 2, 3],
                    "l_returnflag": ["R", "N", "R", "R"],
                    "l_extendedprice": [10.0, 99.0, 20.0, 5.0],
                    "l_discount": [0.0, 0.0, 0.10, 0.0],
                }
            )
        )
        orders = rd.from_pandas(
            pd.DataFrame(
                {"o_orderkey": [1, 2, 3], "o_custkey": [7, 8, 7]}
            )
        )
        cust = rd.from_pandas(
            pd.DataFrame({"c_custkey": [7, 8], "c_name": ["ann", "bo"]})
        )
        out = (
            returned_revenue_topk(
                li, orders, cust, EngineConfig(num_buckets=4), k=2
            )
            .to_pandas().sort_values("rank").reset_index(drop=True)
        )
        # cust 7: order1 R 1000·100 + order3 R 500·100 = 150000
        # cust 8: order2 R 2000·90 = 180000 → rank 1
        assert list(out["rank"]) == [1, 2]
        assert list(out["c_custkey"]) == [8, 7]
        assert list(out["revenue"]) == [180000, 150000]
        assert list(out["c_name"]) == ["bo", "ann"]


class TestClusterSizeHistogram:
    def test_hand_computed(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import cluster_size_histogram

        labeled = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": list("abcdefg"),
                    "cluster_id": ["x", "x", "x", "y", "y", "z", "w"],
                }
            )
        ).repartition(3)
        out = (
            cluster_size_histogram(labeled, EngineConfig(num_buckets=4))
            .to_pandas().set_index("cluster_size")["n_clusters"].to_dict()
        )
        assert out == {3: 1, 2: 1, 1: 2}


class TestForecastRevenue:
    def test_hand_computed(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import forecast_revenue

        li = rd.from_pandas(
            pd.DataFrame(
                {
                    "l_shipdate": pd.to_datetime(
                        ["1997-06-01", "1997-06-02", "1996-12-31",
                         "1997-06-03", "1997-06-04"]
                    ),
                    "l_discount": [0.06, 0.05, 0.06, 0.04, 0.06],
                    "l_quantity": [10.0, 23.99, 10.0, 10.0, 24.0],
                    "l_extendedprice": [100.0, 200.0, 300.0, 400.0, 500.0],
                }
            )
        ).repartition(2)
        row = (
            forecast_revenue(
                li, EngineConfig(num_buckets=4),
                ts_lo_us=852076800000000, ts_hi_us=883612800000000,
                disc_lo_pct=5, disc_hi_pct=7, max_qty_cents=2400,
            )
            .to_pandas().iloc[0]
        )
        # rows 1, 2 qualify (row 3 out of window, row 4 disc 4%, row 5 qty=24)
        # revenue = 10000·6 + 20000·5 = 160000 (1e-6-dollar units)
        assert row["n_items"] == 2
        assert row["revenue"] == 160000


_ACFG = EngineConfig(num_buckets=8)


class TestDegreeAssortativity:
    def _pairs(self, edges):
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [str(a) for a, _ in edges],
                    "right_id": [str(b) for _, b in edges],
                }
            )
        )

    def test_star_is_perfectly_disassortative(self, ray_session):
        from deepblocker_ray.stages.cluster import degree_assortativity

        out = degree_assortativity(
            self._pairs([(0, 1), (0, 2), (0, 3)]), _ACFG
        ).to_pandas()
        row = out.iloc[0]
        assert row["n_nodes"] == 4
        assert row["n_edges"] == 3
        assert row["assortativity"] == -1.0

    def test_regular_graph_is_degenerate_null(self, ray_session):
        from deepblocker_ray.stages.cluster import degree_assortativity

        # triangle: every degree 2 -> zero variance -> NULL
        out = degree_assortativity(
            self._pairs([(0, 1), (1, 2), (0, 2)]), _ACFG
        ).to_pandas()
        assert pd.isna(out.iloc[0]["assortativity"])

    def test_path_matches_hand_value(self, ray_session):
        from deepblocker_ray.stages.cluster import degree_assortativity

        # path 0-1-2-3: stubs x,y pairs:
        # (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
        # m=6 s1=10 sxy=16 sxx=18 -> r=(96-100)/(108-100) = -0.5
        out = degree_assortativity(
            self._pairs([(0, 1), (1, 2), (2, 3)]), _ACFG
        ).to_pandas()
        assert out.iloc[0]["assortativity"] == -0.5


class TestBfsHops:
    def test_min_hops_and_bound(self, ray_session):
        from deepblocker_ray.stages.cluster import bfs_hops

        # path 0-1-2-3-4 plus shortcut 0-3: hops 0,1,2,1,2; node 9 isolated
        edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (8, 9)]
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [str(a) for a, _ in edges],
                    "right_id": [str(b) for _, b in edges],
                }
            )
        )
        out = (
            bfs_hops(pairs, ["0"], _ACFG, max_hops=6)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        got = dict(zip(out["id"], out["hop"]))
        assert got == {"0": 0, "1": 1, "2": 2, "3": 1, "4": 2}

    def test_multi_seed_and_round_bound(self, ray_session):
        from deepblocker_ray.stages.cluster import bfs_hops

        # chain 0-1-2-3-4-5; seeds 0 and 5; max_hops=1 -> only 1 hop out
        edges = [(i, i + 1) for i in range(5)]
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [str(a) for a, _ in edges],
                    "right_id": [str(b) for _, b in edges],
                }
            )
        )
        out = bfs_hops(pairs, ["0", "5"], _ACFG, max_hops=1).to_pandas()
        got = dict(zip(out["id"], out["hop"]))
        assert got == {"0": 0, "5": 0, "1": 1, "4": 1}


class TestHits:
    def _edges(self, pairs):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "src": [str(a) for a, _ in pairs],
                    "dst": [str(b) for _, b in pairs],
                }
            )
        )

    def test_matches_numpy_power_steps(self, ray_session):
        from deepblocker_ray.stages.cluster import hits

        rng = np.random.RandomState(11)
        n = 12
        # every node emits 3 edges (kNN-graph shape: all dsts are srcs)
        pairs = []
        for u in range(n):
            for v in rng.choice(
                [x for x in range(n) if x != u], 3, replace=False
            ):
                pairs.append((u, int(v)))
        A = np.zeros((n, n), np.int64)
        for u, v in pairs:
            A[u, v] = 1
        hub = np.ones(n, np.int64)
        for _ in range(2):
            auth = A.T @ hub
            hub = A @ auth
        out = (
            hits(self._edges(pairs), _ACFG, iters=2, id_col="vec_id")
            .to_pandas()
            .sort_values("vec_id", key=lambda s: s.astype(int))
            .reset_index(drop=True)
        )
        assert list(out.columns) == ["vec_id", "hub", "auth"]
        np.testing.assert_array_equal(out["hub"].to_numpy(np.int64), hub)
        np.testing.assert_array_equal(out["auth"].to_numpy(np.int64), auth)

    def test_star_graph_hand_values(self, ray_session):
        from deepblocker_ray.stages.cluster import hits

        # 1,2,3 -> 0 and 0 -> 1 (so 0 is a src too).
        # auth1 = in-deg = [1,3,0,0]... wait hand-compute:
        # auth1(0)=3, auth1(1)=1; hub1(0)=auth1(1)=1, hub1(k)=auth1(0)=3
        # auth2(0)=hub1(1)+hub1(2)+hub1(3)=9, auth2(1)=hub1(0)=1
        # hub2(0)=auth2(1)=1, hub2(k)=auth2(0)=9
        pairs = [(1, 0), (2, 0), (3, 0), (0, 1)]
        out = hits(self._edges(pairs), _ACFG, iters=2).to_pandas()
        got = {
            r["vec_id"]: (r["hub"], r["auth"]) for _, r in out.iterrows()
        }
        assert got == {
            "0": (1, 9),
            "1": (9, 1),
            "2": (9, 0),
            "3": (9, 0),
        }


class TestLabelProp:
    def _pairs_ds(self, edges):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [str(a) for a, _ in edges],
                    "right_id": [str(b) for _, b in edges],
                }
            )
        )

    def _brute(self, edges, iters):
        adj = {}
        for a, b in edges:
            adj.setdefault(str(a), []).append(str(b))
            adj.setdefault(str(b), []).append(str(a))
        lab = {v: v for v in adj}
        for _ in range(iters):
            new = {}
            for v, ns in adj.items():
                cnt = {}
                for u in ns:
                    cnt[lab[u]] = cnt.get(lab[u], 0) + 1
                best = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))[0]
                new[v] = best[0]
            lab = new
        return lab

    def test_matches_brute_force_sync(self, ray_session):
        from deepblocker_ray.stages.cluster import label_prop

        # two triangles bridged by one edge + a random tail
        edges = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
                 ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
                 ("a3", "b1"), ("b3", "c1")]
        out = label_prop(
            self._pairs_ds(edges), _ACFG, iters=2, id_col="vec_id"
        ).to_pandas()
        got = dict(zip(out["vec_id"], out["label"]))
        assert got == self._brute(edges, 2)

    def test_random_graph_three_rounds(self, ray_session):
        from deepblocker_ray.stages.cluster import label_prop

        r = np.random.RandomState(5)
        edges = set()
        for _ in range(60):
            a, b = r.randint(0, 25, 2)
            if a != b:
                edges.add((str(min(a, b)), str(max(a, b))))
        edges = sorted(edges)
        out = label_prop(
            self._pairs_ds(edges), _ACFG, iters=3
        ).to_pandas()
        got = dict(zip(out["vec_id"], out["label"]))
        assert got == self._brute(edges, 3)


class TestWLSignature:
    def _brute(self, edges, iters):
        from deepblocker_ray.stages.dedup import hash64_strs

        adj = {}
        for a, b in edges:
            adj.setdefault(str(a), []).append(str(b))
            adj.setdefault(str(b), []).append(str(a))
        sig = {v: v for v in adj}
        for _ in range(iters):
            new = {}
            for v, ns in adj.items():
                comp = sig[v] + "|" + ",".join(sorted(sig[u] for u in ns))
                new[v] = str(int(hash64_strs(np.array([comp], object))[0]))
            sig = new
        return sig

    def test_matches_brute_force(self, ray_session):
        from deepblocker_ray.stages.cluster import wl_signature

        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                 ("a", "c"), ("d", "e")]
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [x for x, _ in edges],
                    "right_id": [y for _, y in edges],
                }
            )
        )
        out = wl_signature(pairs, _ACFG, iters=2).to_pandas()
        got = dict(zip(out["vec_id"], out["wl_sig"]))
        assert got == self._brute(edges, 2)

    def test_structural_twins_share_signature(self, ray_session):
        from deepblocker_ray.stages.cluster import wl_signature

        # two leaves hanging off the same hub are structurally identical
        # ONLY if their own ids are ignored — with sig0 = id they differ;
        # use a 6-cycle instead: all nodes are structurally identical
        # after anonymizing... they aren't (ids differ). Instead check
        # determinism: same input twice -> identical output.
        edges = [(str(i), str((i + 1) % 6)) for i in range(6)]
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [x for x, _ in edges],
                    "right_id": [y for _, y in edges],
                }
            )
        )
        a = wl_signature(pairs, _ACFG, iters=3).to_pandas()
        b = wl_signature(pairs, _ACFG, iters=3).to_pandas()
        ga = dict(zip(a["vec_id"], a["wl_sig"]))
        gb = dict(zip(b["vec_id"], b["wl_sig"]))
        assert ga == gb
        assert len(set(ga)) == 6


class TestEdgeFeatures:
    def test_matches_brute_force(self, ray_session):
        from deepblocker_ray.stages.cluster import edge_features

        r = np.random.RandomState(13)
        edges = set()
        for _ in range(50):
            a, b = (str(x) for x in r.randint(0, 18, 2))
            if a != b:
                # the stage contract: left < right as STRINGS
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [x for x, _ in edges],
                    "right_id": [y for _, y in edges],
                }
            )
        )
        out = edge_features(pairs, _ACFG).to_pandas()
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        got = {
            (r2["left_id"], r2["right_id"]): (
                r2["deg_l"], r2["deg_r"], r2["n_common"]
            )
            for _, r2 in out.iterrows()
        }
        want = {
            (a, b): (len(adj[a]), len(adj[b]), len(adj[a] & adj[b]))
            for a, b in edges
        }
        assert got == want

    def test_triangle_and_path(self, ray_session):
        from deepblocker_ray.stages.cluster import edge_features

        # triangle abc + pendant d off c
        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
        pairs = rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [x for x, _ in edges],
                    "right_id": [y for _, y in edges],
                }
            )
        )
        out = edge_features(pairs, _ACFG).to_pandas()
        got = {
            (r["left_id"], r["right_id"]): (
                r["deg_l"], r["deg_r"], r["n_common"]
            )
            for _, r in out.iterrows()
        }
        assert got == {
            ("a", "b"): (2, 2, 1),
            ("a", "c"): (2, 3, 1),
            ("b", "c"): (2, 3, 1),
            ("c", "d"): (3, 1, 0),
        }


class TestKtrussAndFof:
    def _pairs(self, edges):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "left_id": [x for x, _ in edges],
                    "right_id": [y for _, y in edges],
                }
            )
        )

    def test_ktruss_peels_bridge_then_dependents(self, ray_session):
        from deepblocker_ray.stages.cluster import ktruss

        # K4 on a,b,c,d (every edge has 2 common nbrs) plus a triangle
        # d-e-f attached: triangle edges have 1 common nbr -> peeled in
        # round 1; K4 edges keep support 2 -> survive both rounds
        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
              ("b", "d"), ("c", "d")]
        tri = [("d", "e"), ("d", "f"), ("e", "f")]
        out = ktruss(
            self._pairs(k4 + tri), _ACFG, k=4, rounds=2
        ).to_pandas()
        got = {
            (r["left_id"], r["right_id"]) for _, r in out.iterrows()
        }
        assert got == set(k4)

    def test_ktruss_cascade(self, ray_session):
        from deepblocker_ray.stages.cluster import ktruss

        # two triangles sharing an edge: every edge has support >= 1;
        # k=3 (need >= 1) keeps all, k=4 (need >= 2) keeps only the
        # shared edge in round 1, which then dies in round 2
        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
                 ("c", "d")]
        keep3 = ktruss(self._pairs(edges), _ACFG, k=3, rounds=2).to_pandas()
        assert len(keep3) == 5
        keep4 = ktruss(self._pairs(edges), _ACFG, k=4, rounds=2).to_pandas()
        assert len(keep4) == 0

    def test_fof_matches_brute_force(self, ray_session):
        from deepblocker_ray.stages.cluster import fof_candidates

        r = np.random.RandomState(19)
        edges = set()
        for _ in range(60):
            a, b = (str(x) for x in r.randint(0, 20, 2))
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        out = fof_candidates(
            self._pairs(edges), _ACFG, min_common=2
        ).to_pandas()
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        nodes = sorted(adj)
        eset = set(edges)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                if (u, v) in eset:
                    continue
                n = len(adj[u] & adj[v])
                if n >= 2:
                    want[(u, v)] = n
        got = {
            (r2["left_id"], r2["right_id"]): r2["n_common"]
            for _, r2 in out.iterrows()
        }
        assert got == want
