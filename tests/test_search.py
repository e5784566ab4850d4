"""Unit tests for TF-IDF keyword retrieval (stages/search.tfidf_search):
brute-force pandas oracle parity, tie ranks, OOV / empty-query / no-match
edges, and the k cap. The driver twin (`tfidf_search`) is regression-covered
by the correctness sweep."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig

CFG = EngineConfig(num_buckets=8)


def _ds(df, blocks=1):
    import ray.data as rd

    if blocks == 1:
        return rd.from_pandas(df)
    parts = np.array_split(df, blocks)
    return rd.from_pandas([p for p in parts if len(p)])


def _brute(docs: pd.DataFrame, queries: pd.DataFrame, k: int) -> pd.DataFrame:
    """Single-process oracle: integer weights n_docs // df, score = sum of
    tf * weight over distinct query terms, rank by (score desc, doc_id)."""
    from deepblocker_ray.functions.tokenizer import tokenize

    n_docs = len(docs)
    tok = {r.doc_id: tokenize(r.text) for r in docs.itertuples()}
    df_map: dict[str, int] = {}
    for ts in tok.values():
        for t in set(ts):
            df_map[t] = df_map.get(t, 0) + 1
    rows = []
    for q in queries.itertuples():
        terms = set(tokenize(q.text))
        for doc_id, ts in tok.items():
            score = sum(
                ts.count(t) * (n_docs // df_map[t])
                for t in terms
                if t in df_map and ts.count(t)
            )
            if score > 0:
                rows.append((str(q.query_id), doc_id, score))
    out = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
    out = out.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[out["rank"] <= k][
        ["query_id", "rank", "doc_id", "score"]
    ].reset_index(drop=True)


DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "apple banana apple cherry",
            "banana cherry cherry",
            "apple apple apple zebra",
            "date elderberry fig",
            "cherry date apple",
        ],
    }
)


class TestTfidfSearch:
    def _run(self, docs, queries, k, blocks=3):
        from deepblocker_ray.stages.search import tfidf_search

        out = (
            tfidf_search(
                _ds(docs, blocks=blocks),
                _ds(queries),
                CFG,
                k=k,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        return out[["query_id", "rank", "doc_id", "score"]]

    def test_brute_force_parity(self, ray_session):
        queries = pd.DataFrame(
            {
                "query_id": [10, 11, 12],
                "text": ["apple cherry", "zebra", "banana banana date"],
            }
        )
        got = self._run(DOCS, queries, k=10)
        want = _brute(DOCS, queries, k=10)
        pd.testing.assert_frame_equal(
            got.astype({"doc_id": "int64", "score": "int64"}),
            want.astype({"doc_id": "int64", "score": "int64"}),
            check_dtype=False,
        )

    def test_k_cap_and_tie_break(self, ray_session):
        # docs 2 and 5 each contain "cherry" once → tied score; doc_id asc
        queries = pd.DataFrame({"query_id": ["q"], "text": ["cherry"]})
        got = self._run(DOCS, queries, k=2)
        # df(cherry)=4, weight = 5 // 4 = 1; doc 2 has tf=2 → score 2
        assert got["doc_id"].tolist() == [2, 1]
        assert got["score"].tolist() == [2, 1]
        assert got["rank"].tolist() == [1, 2]
        full = self._run(DOCS, queries, k=10)
        assert full["doc_id"].tolist() == [2, 1, 5]

    def test_oov_and_empty_query(self, ray_session):
        queries = pd.DataFrame(
            {"query_id": [1, 2, 3], "text": ["nosuchterm", "", "fig"]}
        )
        got = self._run(DOCS, queries, k=5)
        # q1 matches nothing, q2 tokenizes empty, q3 hits doc 4 only
        assert got["query_id"].tolist() == ["3"]
        assert got["doc_id"].tolist() == [4]
        # weight = 5 // 1 = 5 for the unique term
        assert got["score"].tolist() == [5]

    def test_all_queries_empty_returns_empty(self, ray_session):
        from deepblocker_ray.stages.search import tfidf_search

        queries = pd.DataFrame({"query_id": [1], "text": [""]})
        out = tfidf_search(_ds(DOCS, blocks=3), _ds(queries), CFG, k=3)
        assert out.count() == 0
        # (to_pandas() on an empty arrow dataset drops columns — Ray quirk;
        # assert the typed schema instead)
        assert out.schema().names == ["query_id", "rank", "doc_id", "score"]

    def test_k_validation(self, ray_session):
        from deepblocker_ray.stages.search import tfidf_search

        with pytest.raises(ValueError, match="k must be >= 1"):
            tfidf_search(
                _ds(DOCS), _ds(pd.DataFrame({"query_id": [1], "text": ["a"]})),
                CFG, k=0,
            )

    def test_stats_out(self, ray_session):
        from deepblocker_ray.stages.search import tfidf_search

        stats: dict = {}
        queries = pd.DataFrame(
            {"query_id": [1, 2], "text": ["apple cherry", "apple"]}
        )
        tfidf_search(
            _ds(DOCS), _ds(queries), CFG, k=1, stats_out=stats
        ).materialize()
        assert stats == {"n_queries": 2, "n_query_terms": 2}


class TestInvertedIndex:
    def test_postings_df_and_cap(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.search import inverted_index

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(4, dtype=np.int64),
                    "text": [
                        "apple banana apple",
                        "banana cherry",
                        "apple",
                        None,
                    ],
                }
            )
        )
        out = (
            inverted_index(docs, EngineConfig(num_buckets=4))
            .to_pandas()
            .set_index("token")
        )
        assert out.loc["apple", "df"] == 2
        assert out.loc["apple", "postings"] == "0,2"
        assert out.loc["banana", "postings"] == "0,1"
        assert out.loc["cherry", "postings"] == "1"
        capped = (
            inverted_index(docs, EngineConfig(num_buckets=4), df_cap=1)
            .to_pandas()
            .set_index("token")
        )
        assert set(capped.index) == {"cherry"}
