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
