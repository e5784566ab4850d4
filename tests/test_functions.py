"""Unit tests for scalar functions: tokenizer, hash embedding, string sims."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.functions.hash_embedding import HashEmbedding, mean_pool_embed
from deepblocker_ray.functions.textsim import (
    jaro,
    jaro_winkler,
    levenshtein,
    levenshtein_ratio,
)
from deepblocker_ray.functions.tokenizer import tokenize


class TestTokenizer:
    # expected outputs follow torchtext basic_english's published rules
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("You can now install TorchText using pip!",
             ["you", "can", "now", "install", "torchtext", "using", "pip", "!"]),
            ("Hello, World!", ["hello", ",", "world", "!"]),
            ("don't stop", ["don", "'", "t", "stop"]),
            ('she said "hi"', ["she", "said", "hi"]),
            ("a.b.c", ["a", ".", "b", ".", "c"]),
            ("semi;colon:here", ["semi", "colon", "here"]),
            ("(parens)?", ["(", "parens", ")", "?"]),
            ("line<br />break", ["line", "break"]),
            ("  multiple   spaces  ", ["multiple", "spaces"]),
            ("", []),
            (" ", []),
            ("Price: 7.5", ["price", "7", ".", "5"]),
        ],
    )
    def test_basic_english(self, text, expected):
        assert tokenize(text) == expected


class TestHashEmbedding:
    def test_deterministic_across_instances(self):
        t1 = HashEmbedding(dim=32, seed=7)
        t2 = HashEmbedding(dim=32, seed=7)
        v1 = t1.get_word_vector("hello")
        t2.get_word_vector("other")  # different insertion order
        v2 = t2.get_word_vector("hello")
        np.testing.assert_array_equal(v1, v2)

    def test_seed_changes_vectors(self):
        a = HashEmbedding(dim=32, seed=1).get_word_vector("x")
        b = HashEmbedding(dim=32, seed=2).get_word_vector("x")
        assert not np.array_equal(a, b)

    def test_mean_pool_matches_reference_loop(self):
        table = HashEmbedding(dim=16, seed=3)
        tok_lists = [["a", "b", "a"], ["c"], [], ["b", "c"]]
        out, empty = mean_pool_embed(tok_lists, table)
        assert empty.tolist() == [False, False, True, False]
        # reference semantics: np.mean over occurrence vectors
        exp0 = np.mean(
            [table.get_word_vector(t) for t in ["a", "b", "a"]], axis=0
        )
        np.testing.assert_allclose(out[0], exp0, rtol=1e-6)
        np.testing.assert_array_equal(out[2], np.zeros(16))

    def test_mean_pool_weighted(self):
        table = HashEmbedding(dim=8, seed=3)
        w = {"a": 0.5, "b": 2.0}
        out, _ = mean_pool_embed([["a", "b"]], table, weights=w)
        exp = (
            table.get_word_vector("a") * 0.5 + table.get_word_vector("b") * 2.0
        ) / 2.0
        np.testing.assert_allclose(out[0], exp, rtol=1e-6)

    def test_oov_weight(self):
        table = HashEmbedding(dim=8, seed=3)
        out, _ = mean_pool_embed([["zzz"]], table, weights={}, oov_weight=1.0)
        np.testing.assert_allclose(
            out[0], table.get_word_vector("zzz"), rtol=1e-6
        )


class TestLevenshtein:
    @pytest.mark.parametrize(
        "s1,s2,d",
        [
            ("kitten", "sitting", 3),
            ("", "", 0),
            ("abc", "", 3),
            ("", "abc", 3),
            ("abc", "abc", 0),
            ("flaw", "lawn", 2),
            ("gumbo", "gambol", 2),
            ("ab", "ba", 2),
            ("saturday", "sunday", 3),
        ],
    )
    def test_known_values(self, s1, s2, d):
        assert levenshtein(s1, s2) == d
        assert levenshtein(s2, s1) == d

    def test_against_bruteforce(self):
        import random

        def slow(a, b):
            dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(len(a) + 1):
                dp[i][0] = i
            for j in range(len(b) + 1):
                dp[0][j] = j
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    dp[i][j] = min(
                        dp[i - 1][j] + 1,
                        dp[i][j - 1] + 1,
                        dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return dp[-1][-1]

        rng = random.Random(42)
        for _ in range(60):
            a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
            b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
            assert levenshtein(a, b) == slow(a, b), (a, b)

    def test_ratio(self):
        assert levenshtein_ratio("", "") == 1.0
        assert levenshtein_ratio("abc", "abc") == 1.0
        assert levenshtein_ratio("abc", "abd") == pytest.approx(2 / 3)

    def test_cap(self):
        assert levenshtein("aaaaXX", "aaaaYY", cap=4) == 0


class TestJaroWinkler:
    @pytest.mark.parametrize(
        "s1,s2,expected",
        [
            ("MARTHA", "MARHTA", 0.9444444),
            ("DIXON", "DICKSONX", 0.7666666),
            ("JELLYFISH", "SMELLYFISH", 0.8962962),
            ("abc", "abc", 1.0),
            ("", "", 1.0),
            ("a", "", 0.0),
        ],
    )
    def test_jaro_known(self, s1, s2, expected):
        assert jaro(s1, s2) == pytest.approx(expected, abs=1e-6)

    @pytest.mark.parametrize(
        "s1,s2,expected",
        [
            ("MARTHA", "MARHTA", 0.9611111),
            ("DIXON", "DICKSONX", 0.8133333),
            ("duane", "dwayne", 0.8400000),
        ],
    )
    def test_jaro_winkler_known(self, s1, s2, expected):
        assert jaro_winkler(s1, s2) == pytest.approx(expected, abs=1e-6)


class TestKernelPathParity:
    """The batch kernels pick among bit-parallel (1-word / 2-word) and
    matrix/DP fallback paths per pair by size and alphabet; every path must
    agree exactly with the scalar reference implementations."""

    def _cases(self, seed, max_len):
        rng = np.random.default_rng(seed)
        alph = list("abcdefgh ")
        ca, cb = [], []
        for _ in range(600):
            la, lb = rng.integers(0, max_len, 2)
            ca.append("".join(rng.choice(alph, la)))
            cb.append("".join(rng.choice(alph, lb)))
        # forced edges: equal, empty, unicode (non-Latin-1 → fallback),
        # exactly 64/65/128/129 chars (word-boundary crossings)
        ca += ["same", "", "日本語テキスト" * 12, "a" * 64, "b" * 65,
               "c" * 128, "d" * 129]
        cb += ["same", "x", "日本語テスト" * 12, "a" * 63 + "z", "b" * 65,
               "c" * 127 + "z", "d" * 130]
        return ca, cb

    def test_levenshtein_all_paths(self):
        from deepblocker_ray.functions.textsim import (
            levenshtein,
            levenshtein_batch,
        )

        ca, cb = self._cases(11, 140)
        got = levenshtein_batch(ca, cb)
        for a, b, d in zip(ca, cb, got):
            assert levenshtein(a, b) == d, (a, b)

    def test_jaro_winkler_all_paths(self):
        from deepblocker_ray.functions.textsim import (
            jaro_winkler,
            jaro_winkler_batch,
        )

        ca, cb = self._cases(12, 140)
        got = jaro_winkler_batch(ca, cb)
        for a, b, v in zip(ca, cb, got):
            assert abs(jaro_winkler(a, b) - v) < 1e-12, (a, b)

    def test_minhash_batch_matches_scalar(self):
        from deepblocker_ray.stages.dedup import (
            _minhash_params,
            _shingle_hashes,
            _shingle_hashes_batch,
            minhash_signature,
            minhash_signatures_batch,
        )

        texts = ["hello world example", "abc", "", "x" * 7,
                 "the quick brown fox jumps over the lazy dog"]
        vals, offs = _shingle_hashes_batch(texts, 8)
        a, b = _minhash_params(128, 1234)
        sig = minhash_signatures_batch(vals, offs, a, b)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t, 8)
            assert np.array_equal(sh, vals[offs[i] : offs[i + 1]])
            assert np.array_equal(minhash_signature(sh, a, b), sig[i])

    def test_rolling64_scalar_parity(self):
        from deepblocker_ray.stages.textstats import (
            _FP_INIT,
            _FP_P,
            rolling64_batch,
        )

        def scalar(buf: bytes):
            h = _FP_INIT
            with np.errstate(over="ignore"):
                for x in buf:
                    h = h * _FP_P + np.uint64(x)
            return int(h)

        cases = [b"", b"a", b"hello world", bytes(range(256)) * 2]
        got = rolling64_batch(cases)
        assert [int(x) for x in got] == [scalar(c) for c in cases]


class TestHashedWeightsProbe:
    """Pure-numpy probe semantics of state/lookup.HashedWeights (no Ray):
    the sorted-hash arrays are driven directly, including the h1-collision
    run walk that plasma-built instances can essentially never hit."""

    def _hw(self, h1, h2, w):
        from deepblocker_ray.state.lookup import HashedWeights

        hw = HashedWeights.__new__(HashedWeights)
        hw.default = 1.0
        hw.total = 0
        order = np.argsort(np.asarray(h1, np.uint64), kind="stable")
        hw.h1 = np.asarray(h1, np.uint64)[order]
        hw.h2 = np.asarray(h2, np.uint64)[order]
        hw.w = np.asarray(w, np.float64)[order]
        return hw

    def test_collision_run_walk(self):
        from deepblocker_ray.state.lookup import hash_tokens_2x

        toks = np.array(["alpha", "gamma"], dtype=object)
        k1, k2 = hash_tokens_2x(toks)
        # plant an h1 collision: a junk-h2 entry sits FIRST in alpha's
        # equal-h1 run, so the probe's initial landing mismatches on h2 and
        # must walk the run to alpha's true entry
        h1 = np.array([k1[0], k1[0], k1[1]], np.uint64)
        h2 = np.array([np.uint64(99), k2[0], k2[1]], np.uint64)
        hw = self._hw(h1, h2, [0.9, 0.1, 0.3])
        got = hw.get_many(toks)
        assert got[0] == 0.1  # found via the run walk, not the landing slot
        assert got[1] == 0.3
        # h1 present but h2 of a never-stored token → default, not a
        # false hit
        fake = np.array(["delta"], dtype=object)
        f1, _f2 = hash_tokens_2x(fake)
        hw2 = self._hw([f1[0]], [np.uint64(12345)], [0.5])
        assert hw2.get_many(fake)[0] == 1.0
        assert hw2.get_many(fake, 0.0)[0] == 0.0

    def test_empty_map(self):
        hw = self._hw([], [], [])
        assert hw.get("anything") == 1.0
        assert len(hw) == 0


class TestBpeTokenCount:
    """bpe_token_count: cross-engine count parity (pyarrow RE2 kernel vs
    Python re vs the DuckDB oracle pattern) on punctuation-rich inputs where
    the BPE pre-token count genuinely diverges from the whitespace count —
    the driver corpora are plain lowercase words, so the oracle-parity row
    alone would not distinguish the two columns."""

    TEXTS = [
        "Hello world, it's 2026!",
        "don't stop-me now... 42x7",
        "",
        "  leading  spaces and trailing  ",
        "a,b,c;d:e.f!g?h",
        "it's they're we've I'm you'll he'd can't",
    ]

    def test_counts_match_python_re_and_duckdb(self, ray_session):
        import re

        import duckdb
        import ray.data as rd

        from deepblocker_ray.stages.textstats import (
            BPE_PRETOKEN_RE,
            bpe_token_count,
        )

        df = pd.DataFrame({"doc_id": range(len(self.TEXTS)), "text": self.TEXTS})
        out = (
            bpe_token_count(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want_bpe = [len(re.findall(BPE_PRETOKEN_RE, t)) for t in self.TEXTS]
        want_ws = [len(t.split()) for t in self.TEXTS]
        assert out["n_bpe_tokens"].tolist() == want_bpe
        assert out["n_ws_tokens"].tolist() == want_ws
        # the two columns must actually diverge on this input
        assert want_bpe != want_ws

        con = duckdb.connect()
        sql_counts = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, BPE_PRETOKEN_RE]
            ).fetchone()[0]
            for t in self.TEXTS
        ]
        assert sql_counts == want_bpe


class TestSoundex:
    def test_classic_vectors(self):
        from deepblocker_ray.functions.phonetic import soundex

        assert soundex("Robert") == "R163"
        assert soundex("Rupert") == "R163"
        assert soundex("Honeyman") == "H555"
        assert soundex("Tymczak") == "T522"
        # simplified variant: H/W are vowels, so no H/W bridging
        assert soundex("Ashcraft") == "A226"
        assert soundex("Pfister") == "P236"

    def test_edge_inputs(self):
        from deepblocker_ray.functions.phonetic import soundex

        assert soundex("") == ""
        assert soundex(None) == ""
        assert soundex("123 !?") == ""
        assert soundex("A") == "A000"
        assert soundex("  o'Brien-X ") == "O165"

    def test_series_matches_scalar_and_dedups(self):
        import numpy as np

        from deepblocker_ray.functions.phonetic import (
            soundex,
            soundex_series,
        )

        vals = ["Robert", None, "robert", "", "Smith", "Robert"]
        got = soundex_series(vals)
        assert list(got) == [soundex(v) for v in vals]
        assert got[0] == got[5]

    def test_sql_twin_parity(self):
        import duckdb

        from deepblocker_ray.functions.phonetic import (
            soundex,
            sql_soundex_expr,
        )

        names = [
            "Robert", "Rupert", "Ashcraft", "Tymczak", "Honeyman",
            "", "42", "aaaa", "LLOYD", "schwarz", "o'brien",
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE t(s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in names])
        rows = con.execute(
            f"SELECT s, {sql_soundex_expr('s')} FROM t"
        ).fetchall()
        for s, sx in rows:
            assert sx == soundex(s), (s, sx, soundex(s))


class TestBlocklistFilter:
    def test_whole_word_and_case(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.stages.textstats import blocklist_filter

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        "Slow batch slow",     # 3 hits (case-insensitive)
                        "dedup dups duplicate",  # 0: 'dup' only whole-word
                        "dup",                  # 1
                        "clean text here",      # 0
                    ],
                }
            )
        )
        out = (
            blocklist_filter(docs, ["slow", "dup", "batch"])
            .to_pandas().set_index("doc_id")
        )
        assert out["n_blocked"].to_dict() == {1: 3, 2: 0, 3: 1, 4: 0}
        assert out["flagged"].to_dict() == {
            1: True, 2: False, 3: True, 4: False,
        }

    def test_invalid_terms_raise(self, ray_session):
        import pytest as _pytest

        from deepblocker_ray.stages.textstats import blocklist_regex

        with _pytest.raises(ValueError):
            blocklist_regex(["ok", "Bad Term"])


class TestTemplateShapes:
    def test_digit_collapse_and_threshold(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.textstats import template_shapes

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "text": [
                        "job 17 failed after 300ms",
                        "job 9 failed after 12ms",
                        "disk /dev/sda1 at 93%",
                        "one of a kind line",
                    ]
                }
            )
        ).repartition(2)
        out = (
            template_shapes(docs, EngineConfig(num_buckets=4), min_docs=2)
            .to_pandas()
        )
        assert len(out) == 1
        assert out.iloc[0]["shape"] == "job # failed after #ms"
        assert out.iloc[0]["n_docs"] == 2


class TestGazetteerTag:
    def test_explode_whole_word(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.stages.textstats import gazetteer_tag

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "Spark and spark again",       # spark ×2 (case-fold)
                        "sparkle is not a match",      # whole-word only
                        "vector merge vector",         # two terms
                    ],
                }
            )
        ).repartition(2)
        out = (
            gazetteer_tag(docs, ["spark", "merge", "vector"])
            .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
        )
        rows = list(zip(out["doc_id"], out["term"], out["n_hits"]))
        assert rows == [(1, "spark", 2), (3, "merge", 1), (3, "vector", 2)]
