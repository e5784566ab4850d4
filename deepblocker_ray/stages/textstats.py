"""Text-analysis operators over a document table (training-data-pipeline ops;
the reference has no equivalents — its scalar surface ends at tokenize,
SURVEY §2.8). All are stateless vectorized map_batches stages; the ones with
SQL twins are cross-checked by the driver via __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenizer import tokenize

_PUNCT_RE = re.compile(r"[.,!?;:]")
_WS_RE = re.compile(r"\s+")

# GPT-2-style pre-tokenizer regex, restricted to constructs RE2 supports
# (no lookahead) and to ASCII letter/digit classes so pyarrow's RE2 kernel,
# Python re, and DuckDB regexp_extract_all count the same pre-tokens on the
# ASCII driver corpora (cross-engine parity pinned in tests): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs.
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)

# tiny per-language stopword lists for the n-gram/stopword lang-id heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "you", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "por"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"},
}


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_chars, n_tokens, n_words, punct_count): basic_english token
    count + whitespace word count + punctuation count. SQL twin in
    __ray_entry__."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n_chars = np.asarray([len(t or "") for t in texts], np.int64)
        n_tokens = np.asarray([len(tokenize(t or "")) for t in texts], np.int64)
        n_words = np.asarray(
            [len((t or "").split()) for t in texts], np.int64
        )
        punct = np.asarray(
            [len(_PUNCT_RE.findall(t or "")) for t in texts], np.int64
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "n_words": pa.array(n_words),
                "punct_count": pa.array(punct),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def bpe_token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_bpe_tokens, n_ws_tokens): BPE-ish pre-token count (GPT-2
    pre-tokenizer regex shape, see BPE_PRETOKEN_RE) + whitespace token count.
    Fully vectorized — both counts run through pyarrow's RE2 kernel
    (count_substring_regex), no per-row Python; the SQL twin uses DuckDB's
    regexp_extract_all, which is the same RE2 engine, so counts are exact.
    Whitespace runs count as pre-tokens (they become part of the next token
    in a real BPE; counting them keeps the regex twin lookahead-free)."""

    def count(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column(text_col), "")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(texts, BPE_PRETOKEN_RE),
                    pa.int64(),
                ),
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(texts, r"\S+"), pa.int64()
                ),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Heuristic quality signals: length, stopword ratio, mean word length,
    alpha ratio; combined score in [0,1]. (Gopher/C4-style filters reduced to
    deterministic arithmetic — no external models.)"""

    stop_en = STOPWORDS["en"]

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        stop_ratio = np.zeros(n)
        mean_wlen = np.zeros(n)
        alpha_ratio = np.zeros(n)
        length_ok = np.zeros(n)
        for i, t in enumerate(texts):
            t = t or ""
            words = t.split()
            if words:
                stop_ratio[i] = sum(w.lower() in stop_en for w in words) / len(words)
                mean_wlen[i] = float(np.mean([len(w) for w in words]))
            if t:
                alpha_ratio[i] = sum(c.isalpha() or c.isspace() for c in t) / len(t)
            length_ok[i] = 1.0 if 20 <= len(t) <= 100_000 else 0.0
        wlen_ok = np.clip(1.0 - np.abs(mean_wlen - 5.0) / 10.0, 0.0, 1.0)
        combined = (
            0.25 * length_ok
            + 0.25 * np.clip(stop_ratio * 5, 0, 1)
            + 0.25 * wlen_ok
            + 0.25 * alpha_ratio
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "stop_ratio": pa.array(stop_ratio),
                "mean_word_len": pa.array(mean_wlen),
                "alpha_ratio": pa.array(alpha_ratio),
                "quality": pa.array(combined),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Stopword/charset language-ID heuristic → (doc_id, lang_pred, lang_conf).
    CJK is detected by codepoint range; Latin languages by stopword votes."""

    def detect(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        preds, confs = [], []
        for t in texts:
            t = t or ""
            if any("一" <= c <= "鿿" for c in t[:500]):
                preds.append("zh")
                confs.append(1.0)
                continue
            words = [w.lower() for w in t.split()[:200]]
            if not words:
                preds.append("unknown")
                confs.append(0.0)
                continue
            votes = {
                lang: sum(w in sw for w in words) for lang, sw in STOPWORDS.items()
            }
            best = max(votes, key=lambda k: (votes[k], k))
            total = sum(votes.values())
            if votes[best] == 0:
                preds.append("unknown")
                confs.append(0.0)
            else:
                preds.append(best)
                confs.append(votes[best] / total if total else 0.0)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "lang_pred": pa.array(preds, pa.string()),
                "lang_conf": pa.array(np.asarray(confs, np.float64)),
            }
        )

    return ds.map_batches(detect, batch_format="pyarrow")


def normalize_for_fingerprint(text: str) -> str:
    return _WS_RE.sub(" ", (text or "").lower()).strip()


_FP_INIT = np.uint64(1469598103934665603)
_FP_P = np.uint64(1099511628211)
# p is odd ⇒ invertible mod 2^64: lets the per-doc polynomial be evaluated
# with ONE global power ladder over the batch concatenation instead of a
# per-byte Python loop (h_d = init·p^L + Σ b_j·pinv^j · p^{end-1}, mod 2^64)
_FP_PINV = np.uint64(pow(int(_FP_P), -1, 1 << 64))


def rolling64_batch(norms: list[bytes]) -> np.ndarray:
    """64-bit polynomial rolling hash per doc, fully vectorized: Horner's
    h = init; h = h·p + byte — evaluated in closed form over one
    concatenated buffer using modular-inverse position weights.

    NOTE (round 2): this replaced the round-1 FNV-1a-style recurrence
    h = (h ^ byte)·p, whose xor-inside-multiply has no vectorizable closed
    form — rolling64 VALUES changed between rounds. rolling64 is an
    engine-defined auxiliary fingerprint; the cross-round-stable, oracled
    fingerprint is the md5 column."""
    n = len(norms)
    out = np.full(n, _FP_INIT, np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in norms), np.int64, n)
    total = int(lens.sum())
    if total == 0:
        return out
    cat = np.frombuffer(b"".join(norms), np.uint8).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    with np.errstate(over="ignore"):
        pows = np.empty(total + 1, np.uint64)
        pows[0] = np.uint64(1)
        np.cumprod(np.full(total, _FP_P, np.uint64), out=pows[1:])
        inv_pows = np.empty(total, np.uint64)
        inv_pows[0] = np.uint64(1)
        if total > 1:
            np.cumprod(np.full(total - 1, _FP_PINV, np.uint64), out=inv_pows[1:])
        g = cat * inv_pows
        nz = lens > 0
        seg = np.add.reduceat(g, starts[nz])
        out[nz] = _FP_INIT * pows[lens[nz]] + seg * pows[ends[nz] - 1]
    return out


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Document fingerprints: md5 of whitespace-normalized lowercased text
    (SQL twin: DuckDB md5()) plus a 64-bit polynomial rolling hash
    (rolling64_batch — engine-defined, vectorized Horner evaluation)."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        norms = [normalize_for_fingerprint(t).encode() for t in texts]
        md5s = [hashlib.md5(b).hexdigest() for b in norms]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "md5": pa.array(md5s, pa.string()),
                "rolling64": pa.array(rolling64_batch(norms)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
