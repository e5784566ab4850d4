"""Driver simulation: run each __ray_entry__ query and its DuckDB oracle at
sf0.001 and compare row-count + schema-names + order-insensitive values —
the same contract CORRECTNESS_r{N}.json grades."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        try:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        except duckdb.IOException:
            pass
    return c


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    df = result.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        # Ray's to_pandas drops the schema of an all-empty Dataset;
        # rebuild the columns from the Dataset schema so a legitimately
        # empty result (e.g. zero blocking pairs at sf0.001) still
        # compares by column names against the oracle
        df = pd.DataFrame({n: pd.Series(dtype=object)
                           for n in result.schema().names})
    return df


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    got = canonical(to_pandas(entrymod.queries()[name](SF_DIR)))
    want = canonical(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        got.columns,
        want.columns,
    )
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), w.astype(float), check_names=False,
                rtol=1e-12, atol=1e-12,
            )
        else:
            assert (
                g.astype(str).tolist() == w.astype(str).tolist()
            ), f"column {c} mismatch"


ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    got = to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(got) >= 0
    assert len(got.columns) >= 1


def test_entry_smoke(ray_session):
    out = to_pandas(entrymod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"conv_id", "cluster_id"}


class TestRollupCounts:
    def test_grains_and_null_disambiguation(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import rollup_counts

        df = pd.DataFrame(
            {
                "lang": ["en", "en", None, "de", "de"],
                "source": ["web", "pdf", "web", None, "web"],
            }
        )
        out = rollup_counts(
            rd.from_pandas(df), EngineConfig(num_buckets=8)
        ).to_pandas()
        got = [
            (r.lang, r.source, int(r.n), int(r.grp))
            for r in out.itertuples()
        ]
        want = sorted(
            [
                # finest (grp 0) — genuine NULL values stay distinct cells
                ("en", "web", 1, 0),
                ("en", "pdf", 1, 0),
                (None, "web", 1, 0),
                ("de", None, 1, 0),
                ("de", "web", 1, 0),
                # lang grain (grp 1)
                ("en", None, 2, 1),
                (None, None, 1, 1),
                ("de", None, 2, 1),
                # source grain (grp 2)
                (None, "web", 3, 2),
                (None, "pdf", 1, 2),
                (None, None, 1, 2),
                # total (grp 3)
                (None, None, 5, 3),
            ],
            key=lambda t: (str(t[0]), str(t[1]), t[2], t[3]),
        )
        assert sorted(
            got, key=lambda t: (str(t[0]), str(t[1]), t[2], t[3])
        ) == want

    def test_sums_are_consistent_across_grains(self, ray_session):
        import numpy as np
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import rollup_counts

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "lang": rng.choice(["en", "de", "fr"], 500),
                "source": rng.choice(["w", "p", "a", "x"], 500),
            }
        )
        out = rollup_counts(
            rd.from_pandas(df), EngineConfig(num_buckets=8)
        ).to_pandas()
        for g in (0, 1, 2, 3):
            assert out[out["grp"] == g]["n"].sum() == 500


class TestPricingSummary:
    def test_fixed_point_exactness_and_cutoff(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import pricing_summary

        df = pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "N", "A"],
                "l_linestatus": ["F", "F", "O", "F"],
                "l_quantity": [3.0, 5.0, 1.0, 9.0],
                "l_extendedprice": [10.01, 0.07, 5.00, 1.00],
                "l_discount": [0.05, 0.00, 0.10, 0.02],
                "l_tax": [0.08, 0.02, 0.00, 0.01],
                "l_shipdate": pd.to_datetime(
                    ["1998-01-01", "1998-09-02", "1998-09-03", "1999-01-01"]
                ),
            }
        )
        # cutoff 1998-09-02 inclusive → rows 0,1 kept (A,F); rows 2,3 cut
        out = pricing_summary(
            rd.from_pandas(df), EngineConfig(num_buckets=8),
            cutoff_us=904694400000000,
        ).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["l_returnflag"], r["l_linestatus"]) == ("A", "F")
        assert int(r["sum_qty"]) == 8
        assert int(r["sum_base_cents"]) == 1001 + 7
        assert int(r["sum_disc_e4"]) == 1001 * 95 + 7 * 100
        assert int(r["sum_charge_e6"]) == 1001 * 95 * 108 + 7 * 100 * 102
        assert int(r["count_order"]) == 2

    def test_empty_after_filter(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import pricing_summary

        df = pd.DataFrame(
            {
                "l_returnflag": ["A"],
                "l_linestatus": ["F"],
                "l_quantity": [1.0],
                "l_extendedprice": [1.0],
                "l_discount": [0.0],
                "l_tax": [0.0],
                "l_shipdate": pd.to_datetime(["2001-01-01"]),
            }
        )
        out = pricing_summary(
            rd.from_pandas(df), EngineConfig(num_buckets=8),
            cutoff_us=904694400000000,
        ).to_pandas()
        assert len(out) == 0


class TestShipLatency:
    def test_latency_and_median_rules(self, ray_session):
        import numpy as np
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import ship_latency

        D = 86_400_000_000
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_orderdate": pd.to_datetime(
                    ["2020-01-10"] * 4
                ),
                "o_orderpriority": ["P1", "P1", "P1", "P2"],
            }
        )
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 3, 9],  # 9: no order → dropped
                "l_shipdate": pd.to_datetime(
                    ["2020-01-11", "2020-01-15", "2020-01-12",
                     "2020-01-05", "2020-01-01"]
                ),
            }
        )
        out = ship_latency(
            rd.from_pandas(orders), rd.from_pandas(li),
            EngineConfig(num_buckets=8),
        ).to_pandas().sort_values("priority").reset_index(drop=True)
        # order 4 has no lineitems → dropped; P1 latencies: o1 max=5,
        # o2=2, o3=-5 → sorted [-5,2,5], lower median = 2
        assert out.values.tolist() == [["P1", 3, 2, 5]]

    def test_trunc_division_matches_duckdb(self):
        import numpy as np

        # engine rule: trunc toward zero (DuckDB //), not numpy floor
        diff = np.array([-7, 7, -4, 4], np.int64)
        day = np.int64(2)
        days = np.where(diff < 0, -(-diff // day), diff // day)
        assert days.tolist() == [-3, 3, -2, 2]


class TestNonAsciiByteShingleParity:
    """Pin the byte-exact hex-window twins on a NON-ASCII corpus: the
    engine shingles UTF-8 bytes (dedup._shingle_hashes_batch), so its
    twins window hex(encode(text)). On multi-byte text a character-substr
    twin would diverge; these fixtures prove the hex twins don't."""

    QUERIES = ["minhash_dedup", "novelty", "top_shared_pairs",
               "duplicate_spans"]

    @pytest.fixture(scope="class")
    def sf_dir(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("nonascii_sf")
        base = (
            "héllo wörld — naïve café über straße 東京タワー is tall. "
            "Ĉiuj homoj estas denaske liberaj kaj egalaj laŭ digno. "
        )
        texts = []
        for i in range(40):
            if i % 4 == 0:
                texts.append(base * 3)                    # exact dups
            elif i % 4 == 1:
                texts.append(base * 3 + f" extra{i % 8}")  # near dups
            elif i % 4 == 2:
                texts.append(f"уникальный документ №{i} с текстом "
                             f"「{i * 37}」 αβγδε {i}" * 2)
            else:
                texts.append("☃" * (i % 7))                # short docs
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    @pytest.mark.parametrize("name", QUERIES)
    def test_byte_twin_matches_on_non_ascii(self, ray_session, sf_dir,
                                            name):
        c = duckdb.connect()
        c.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        got = canonical(to_pandas(entrymod.queries()[name](sf_dir)))
        want = canonical(c.execute(entrymod.oracle_sql()[name]).df())
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want), (len(got), len(want))
        for col in got.columns:
            g, w = got[col], want[col]
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                pd.testing.assert_series_equal(
                    g.astype(float), w.astype(float), check_names=False,
                    rtol=1e-12, atol=1e-12,
                )
            else:
                assert g.astype(str).tolist() == w.astype(str).tolist()
