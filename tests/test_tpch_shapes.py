"""Hand-computed oracles for the round-4 TPC-H join shapes — the edge
rules the sf-parity sweep can't isolate: exactly-one-late-supplier (Q21),
zero-order customers in the distribution (Q13), the STRICT above-average
threshold (Q22), and the integer 0.2·avg cross-multiplication (Q17)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deepblocker_ray.config import EngineConfig


def _cfg():
    return EngineConfig(num_buckets=8)


def ts(*dates):
    return pd.to_datetime(list(dates)).astype("datetime64[us]")


class TestWaitingSupplier:
    def test_exactly_one_late_rule(self, ray_session):
        from deepblocker_ray.stages.relational import waiting_supplier

        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_orderdate": ts("2020-01-01", "2020-01-01",
                                  "2020-01-01", "2020-01-01"),
            }
        )
        # order 1: supp 10 late, supp 11 on time  -> supp 10 counts
        # order 2: supp 10 late, supp 11 late     -> two late, nobody
        # order 3: supp 10 late only supplier     -> single-supplier, nobody
        # order 4: supp 11 late, supp 12 on time  -> supp 11 counts
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
                "l_suppkey": [10, 11, 10, 11, 10, 11, 12],
                "l_shipdate": ts(
                    "2020-02-15", "2020-01-05", "2020-02-15", "2020-02-15",
                    "2020-02-15", "2020-02-15", "2020-01-05"
                ),
            }
        )
        supplier = pd.DataFrame(
            {"s_suppkey": [10, 11, 12],
             "s_name": ["S10", "S11", "S12"]}
        )
        out = waiting_supplier(
            rd.from_pandas(orders), rd.from_pandas(li),
            rd.from_pandas(supplier), _cfg(), late_days=20,
        ).to_pandas().sort_values("s_name").reset_index(drop=True)
        assert out.values.tolist() == [["S10", 1], ["S11", 1]]


class TestCustomerDistribution:
    def test_zero_order_customers_counted(self, ray_session):
        from deepblocker_ray.stages.relational import customer_distribution

        customer = pd.DataFrame({"c_custkey": [1, 2, 3, 4]})
        # cust 1: two kept orders; cust 2: one kept + one excluded ('F');
        # cust 3: only an excluded order -> c_count 0; cust 4: none -> 0
        orders = pd.DataFrame(
            {
                "o_custkey": [1, 1, 2, 2, 3],
                "o_orderstatus": ["O", "P", "O", "F", "F"],
            }
        )
        out = customer_distribution(
            rd.from_pandas(customer), rd.from_pandas(orders), _cfg(),
            exclude_status="F",
        ).to_pandas()
        got = {int(r.c_count): int(r.custdist) for r in out.itertuples()}
        assert got == {0: 2, 1: 1, 2: 1}
        # ordering: custdist DESC then c_count DESC
        assert out["c_count"].tolist() == [0, 2, 1] or \
            out["custdist"].tolist() == sorted(
                out["custdist"].tolist(), reverse=True)


class TestSalesOpportunity:
    def test_strict_threshold_and_anti_join(self, ray_session):
        from deepblocker_ray.stages.relational import sales_opportunity

        # positive balances: 100, 200, 300 cents -> avg 200
        # cust 1: 1.00 (below), cust 2: 2.00 (== avg, STRICT > excludes),
        # cust 3: 3.00 above & no orders -> counted,
        # cust 4: 5.00 above but HAS an order -> excluded,
        # cust 5: negative, never counted
        customer = pd.DataFrame(
            {
                "c_custkey": [1, 2, 3, 4, 5],
                "c_nationkey": [7, 7, 7, 7, 7],
                "c_acctbal": [1.0, 2.0, 3.0, 5.0, -4.0],
            }
        )
        orders = pd.DataFrame({"o_custkey": [4]})
        out = sales_opportunity(
            rd.from_pandas(customer), rd.from_pandas(orders), _cfg()
        ).to_pandas()
        # avg positive = (100+200+300+500)/4 = 275 -> above: cust 3 (300),
        # cust 4 (500, has order). Only cust 3 survives.
        assert out.values.tolist() == [[7, 1, 300]]

    def test_empty_when_no_rich_customers(self, ray_session):
        from deepblocker_ray.stages.relational import sales_opportunity

        customer = pd.DataFrame(
            {"c_custkey": [1], "c_nationkey": [0], "c_acctbal": [2.0]}
        )
        orders = pd.DataFrame({"o_custkey": [9]})
        res = sales_opportunity(
            rd.from_pandas(customer), rd.from_pandas(orders), _cfg()
        )
        # single customer == its own average; strict > keeps nothing,
        # and the schema must survive the empty result
        assert res.count() == 0
        assert set(res.schema().names) == {
            "c_nationkey", "numcust", "totacctbal_cents"
        }


class TestSmallQuantity:
    def test_integer_cross_multiplication_threshold(self, ray_session):
        from deepblocker_ray.stages.relational import small_quantity_revenue

        part = pd.DataFrame(
            {"p_partkey": [1, 2], "p_brand": ["Brand#23", "Other"]}
        )
        # part 1 lineitems: qty 0.5, 1, 4, 5 (n=4, sum_q100=1050) —
        # the qty-0.5 row tests the q100 (hundredth-unit) granularity.
        li = pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 1, 2],
                "l_quantity": [0.5, 1.0, 4.0, 5.0, 1.0],
                "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 99.0],
            }
        )
        out = small_quantity_revenue(
            rd.from_pandas(li), rd.from_pandas(part), _cfg(),
            brand="Brand#23",
        ).to_pandas()
        # part 1: n=4, sum_q100 = 50+100+400+500 = 1050;
        # keep iff 5*q100*4 < 1050 ⟺ q100 < 52.5 -> only q100=50 (qty .5)
        assert out.values.tolist() == [[1, 1000]]


class TestSetJoinFamilies:
    def _docs(self):
        return rd.from_pandas(pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta",
                    "alpha beta gamma delta",      # identical to 1
                    "alpha beta gamma epsilon",    # 3/5 jaccard vs 1
                ],
            }
        ))

    def test_dice_vs_jaccard_thresholds(self, ray_session):
        from deepblocker_ray.stages.setjoin import set_similarity_join

        # pair (1,3): |∩|=3, sizes 4,4 -> J=3/5=0.6, Dice=6/8=0.75,
        # cosine=3/4=0.75. tau=7/10 keeps dice+cosine, drops jaccard.
        jac = set_similarity_join(
            self._docs(), _cfg(), tau_num=7, tau_den=10, sim="jaccard"
        ).to_pandas()
        dic = set_similarity_join(
            self._docs(), _cfg(), tau_num=7, tau_den=10, sim="dice"
        ).to_pandas()
        cos = set_similarity_join(
            self._docs(), _cfg(), tau_num=7, tau_den=10, sim="cosine"
        ).to_pandas()
        pairs = lambda df: set(
            map(tuple, df[["left_id", "right_id"]].values)
        )
        assert pairs(jac) == {("1", "2")}
        assert pairs(dic) == {("1", "2"), ("1", "3"), ("2", "3")}
        assert pairs(cos) == {("1", "2"), ("1", "3"), ("2", "3")}
        # exact boundary inclusion: >= keeps the exactly-at-threshold pair
        dic75 = set_similarity_join(
            self._docs(), _cfg(), tau_num=3, tau_den=4, sim="dice"
        ).to_pandas()
        assert pairs(dic75) == {("1", "2"), ("1", "3"), ("2", "3")}


class TestMinhashDelta:
    def test_old_old_pairs_never_emitted(self, ray_session):
        from deepblocker_ray.stages.dedup import minhash_delta_pairs

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        corpus = pd.DataFrame(
            {"doc_id": [1, 2], "text": [base, base]}  # old dup pair
        )
        delta = pd.DataFrame(
            {"doc_id": [3], "text": [base + " extra"]}
        )
        out = minhash_delta_pairs(
            rd.from_pandas(corpus), rd.from_pandas(delta), cfg=_cfg()
        ).to_pandas()
        pairs = set(map(tuple, out[["left_id", "right_id"]].values))
        # (1,2) is old-old -> absent even though they are exact dups
        assert ("1", "2") not in pairs
        assert ("1", "3") in pairs and ("2", "3") in pairs


class TestDimensionGuardPathsEqual:
    """The round-5 scale guards: every operator that used to materialize a
    scale-dependent dimension table (part / supplier) driver-side now
    routes it through the guarded broadcast machinery. Force the
    above-cap fallback (broadcast_rows_max=0 → hash-join / bucketed
    marker exchange) and pin it equal to the broadcast path."""

    def _li(self):
        rng = np.random.default_rng(5)
        n = 400
        return pd.DataFrame(
            {
                "l_orderkey": rng.integers(1, 60, n),
                "l_partkey": rng.integers(1, 40, n),
                "l_suppkey": rng.integers(1, 12, n),
                "l_quantity": rng.integers(1, 50, n).astype(float),
                "l_extendedprice": np.round(rng.uniform(10, 2000, n), 2),
                "l_discount": np.round(rng.integers(0, 10, n) / 100, 2),
                "l_shipdate": pd.to_datetime("2020-01-01")
                + pd.to_timedelta(rng.integers(0, 400, n), unit="D"),
            }
        ).astype({"l_shipdate": "datetime64[us]"})

    def _part(self):
        rng = np.random.default_rng(6)
        n = 40
        return pd.DataFrame(
            {
                "p_partkey": np.arange(1, n + 1),
                "p_name": [f"part {i}" for i in range(1, n + 1)],
                "p_brand": rng.choice(
                    ["Brand#12", "Brand#23", "Brand#34", "Brand#45"], n
                ),
                "p_size": rng.integers(1, 35, n),
                "p_type": rng.choice(
                    ["ECONOMY ANODIZED STEEL", "SMALL PLATED COPPER"], n
                ),
            }
        )

    def _supp(self):
        rng = np.random.default_rng(7)
        n = 12
        return pd.DataFrame(
            {
                "s_suppkey": np.arange(1, n + 1),
                "s_name": [f"Supplier#{i:09d}" for i in range(1, n + 1)],
                "s_acctbal": np.round(rng.uniform(-500, 5000, n), 2),
                "s_nationkey": rng.integers(0, 5, n),
            }
        )

    def _both(self, fn):
        import dataclasses

        broad = fn(_cfg())
        joiny = fn(dataclasses.replace(_cfg(), broadcast_rows_max=0))

        def norm(ds):
            df = ds.to_pandas()
            return (
                df.sort_values(list(df.columns))
                .reset_index(drop=True)
                .astype(str)
            )

        pd.testing.assert_frame_equal(norm(broad), norm(joiny))
        return broad.to_pandas()

    def test_min_balance_supplier(self, ray_session):
        from deepblocker_ray.stages.relational import min_balance_supplier

        out = self._both(
            lambda cfg: min_balance_supplier(
                rd.from_pandas(self._li()), rd.from_pandas(self._supp()),
                rd.from_pandas(self._part()), cfg,
            )
        )
        assert len(out) > 0
        assert list(out.columns) == [
            "p_partkey", "p_name", "s_suppkey", "s_name", "acctbal_cents"
        ]

    def test_small_quantity_revenue(self, ray_session):
        from deepblocker_ray.stages.relational import small_quantity_revenue

        out = self._both(
            lambda cfg: small_quantity_revenue(
                rd.from_pandas(self._li()), rd.from_pandas(self._part()),
                cfg, brand="Brand#23",
            )
        )
        assert len(out) == 1

    def test_disjunctive_revenue(self, ray_session):
        from deepblocker_ray.stages.relational import disjunctive_revenue

        out = self._both(
            lambda cfg: disjunctive_revenue(
                rd.from_pandas(self._li()), rd.from_pandas(self._part()), cfg,
            )
        )
        assert len(out) == 1

    def test_waiting_supplier(self, ray_session):
        from deepblocker_ray.stages.relational import waiting_supplier

        rng = np.random.default_rng(8)
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 61),
                "o_orderdate": pd.to_datetime("2020-01-01")
                + pd.to_timedelta(rng.integers(0, 300, 60), unit="D"),
            }
        ).astype({"o_orderdate": "datetime64[us]"})
        self._both(
            lambda cfg: waiting_supplier(
                rd.from_pandas(orders), rd.from_pandas(self._li()),
                rd.from_pandas(self._supp()), cfg, late_days=20,
            )
        )

    def test_top_revenue_supplier(self, ray_session):
        from deepblocker_ray.stages.relational import top_revenue_supplier

        lo = int(pd.Timestamp("2020-01-01").value // 1000)
        hi = int(pd.Timestamp("2020-07-01").value // 1000)
        out = self._both(
            lambda cfg: top_revenue_supplier(
                rd.from_pandas(self._li()), rd.from_pandas(self._supp()),
                cfg, date_lo_us=lo, date_hi_us=hi,
            )
        )
        assert len(out) >= 1

    def test_market_share(self, ray_session):
        from deepblocker_ray.stages.relational import market_share

        rng = np.random.default_rng(9)
        nation = pd.DataFrame(
            {"n_nationkey": np.arange(5),
             "n_name": ["ALPHA", "BETA", "GAMMA", "DELTA", "EPSILON"],
             "n_regionkey": [0, 0, 1, 1, 1]}
        )
        region = pd.DataFrame(
            {"r_regionkey": [0, 1], "r_name": ["AMERICA", "ASIA"]}
        )
        customer = pd.DataFrame(
            {"c_custkey": np.arange(1, 31),
             "c_nationkey": rng.integers(0, 5, 30)}
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 61),
                "o_custkey": rng.integers(1, 31, 60),
                "o_orderdate": pd.to_datetime("2019-06-01")
                + pd.to_timedelta(rng.integers(0, 600, 60), unit="D"),
            }
        ).astype({"o_orderdate": "datetime64[us]"})
        self._both(
            lambda cfg: market_share(
                rd.from_pandas(customer), rd.from_pandas(orders),
                rd.from_pandas(self._li()), rd.from_pandas(self._supp()),
                rd.from_pandas(nation), rd.from_pandas(region), cfg,
                region_name="ASIA", nation_name="BETA",
                p_type="ECONOMY ANODIZED STEEL",
                part=rd.from_pandas(self._part()),
            )
        )
