"""Deduplication operators over a document table (training-data-pipeline ops;
no reference equivalent — the reference has no dedup at all, SURVEY §2.7-U3).

All operators are Dataset-in / Dataset-out and follow the same scale shape:
vectorized per-batch signatures → hash-keyed groupby (the one shuffle) →
candidate pairs verified per group → connected components → one row per
document with its cluster id.

  - exact_dedup: content hash → bucket groupby → keep min id per text.
  - minhash_lsh_dedup: char-shingles → 128-perm MinHash → banded LSH buckets
    → exact-Jaccard verify → components.
  - simhash_dedup: 64-bit SimHash over token hashes → 4×16-bit band buckets
    → Hamming-distance verify → components.
  - ngram_jaccard_dedup: rarest-shingle blocking → exact n-gram Jaccard.
  - embedding_neardup: cosine ≥ τ pairs from the exact pairer → components.

Buckets with more than ``max_bucket`` docs are truncated and counted (hot
buckets = degenerate shingles; salting them would only produce O(B²) junk
pairs) — the truncation is reported, never silent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig
from ..stages.canonicalize import bucket_of
from ..stages.cluster import connected_components

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char-shingle hashes (uint64, stable across processes)."""
    if len(text) < k:
        data = text.encode()
        return np.asarray([_stable_hash64(data)], np.uint64)
    b = text.encode("utf-8", "surrogatepass")
    # byte-level rolling shingles (cheap, deterministic); decode-safe because
    # we only hash
    n = len(b) - k + 1
    view = np.frombuffer(b, np.uint8)
    # polynomial hash per window, vectorized via cumulative powers
    p = np.uint64(1099511628211)
    pows = np.empty(k, np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # intentional mod-2^64 wraparound
        for i in range(1, k):
            pows[i] = pows[i - 1] * p
    windows = np.lib.stride_tricks.sliding_window_view(view, k).astype(np.uint64)
    h = (windows * pows[::-1]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def _stable_hash64(data: bytes) -> np.uint64:
    import hashlib

    return np.uint64(
        int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
    )


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(a·x + b) mod p universal hashing, min per permutation."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, np.uint64)
    x = shingles[:, None]
    with np.errstate(over="ignore"):
        h = (x * a[None, :] + b[None, :]) % _MERSENNE
    return h.min(axis=0)


def exact_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig | None = None,
):
    """Keep one row (min id) per distinct text; output
    (doc_id, text, n_dups). Hash-bucket groupby — shuffle key is a small int,
    dedup inside the bucket is vectorized pandas."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, text_col]].copy()
        out["_bucket"] = bucket_of(out[text_col], nb)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(text_col, sort=False).agg(
            doc_id=(id_col, "min"), n_dups=(id_col, "size")
        )
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].values,
                text_col: agg.index.values,
                "n_dups": agg["n_dups"].values.astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _pairs_from_keys(
    keyed,
    id_col: str,
    max_bucket: int,
    cfg: EngineConfig,
    key_col: str = "bkey",
):
    """rows (id, bkey) → intra-key candidate pairs (left_id < right_id).

    One groupby on a small int hash bucket; inside each bucket the self-join
    per key is a vectorized pandas merge (not a Python call per LSH key —
    LSH produces thousands of tiny keys). Keys with more than ``max_bucket``
    members are truncated to their first members by id (hot keys =
    degenerate shingles; all-pairs there is O(B²) junk) — truncation is
    surfaced in an ``n_truncated_keys`` column on the first output row, not
    silent."""
    nb = cfg.num_buckets

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, key_col]].copy()
        out[id_col] = out[id_col].astype(str)
        out["_bucket"] = (
            out[key_col].astype(np.uint64) % np.uint64(nb)
        ).astype(np.int32)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([id_col, key_col]).sort_values([key_col, id_col])
        sizes = g.groupby(key_col, sort=False)[id_col].transform("size")
        truncated = 0
        over = sizes > max_bucket
        if over.any():
            rank = g.groupby(key_col, sort=False).cumcount()
            truncated = g.loc[over, key_col].nunique()
            g = g[rank < max_bucket]
        m = g.merge(g, on=key_col)
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = pd.DataFrame(
            {
                "left_id": pd.array(m[f"{id_col}_x"].values, dtype="string"),
                "right_id": pd.array(m[f"{id_col}_y"].values, dtype="string"),
            }
        ).drop_duplicates()
        out["n_truncated_keys"] = np.int64(truncated)
        return out

    return (
        keyed.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def _dedup_pairs(pairs_ds, cfg: EngineConfig):
    """Exact pair-dedup (U3): buckets overlap, a pair can appear twice."""
    nb = cfg.num_buckets

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = bucket_of(df["left_id"] + "\x00" + df["right_id"], nb)
        return df

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.drop_duplicates(["left_id", "right_id"])[
                ["left_id", "right_id"]
            ],
            batch_format="pandas",
        )
    )


def _attach_pair_texts(pairs_ds, ds, id_col: str, text_col: str, cfg):
    """Scale path: attach both sides' text to candidate pairs via two hash
    joins (Dataset.join) instead of a driver-built broadcast dict."""
    import pyarrow.compute as pc

    from ..config import default_parallelism

    nparts = max(default_parallelism(), 8)

    def side(name, alias):
        return ds.map_batches(
            lambda t, n=name, a=alias: pa.table(
                {n: t.column(id_col).cast(pa.string()), a: t.column(text_col)}
            ),
            batch_format="pyarrow",
        )

    return pairs_ds.join(
        side("left_id", "_lt"), join_type="inner", num_partitions=nparts,
        on=("left_id",),
    ).join(
        side("right_id", "_rt"), join_type="inner", num_partitions=nparts,
        on=("right_id",),
    )


def _verify_pairs(cand, ds, id_col, text_col, cfg, pair_fn):
    """Run ``pair_fn(left_text, right_text) -> keep`` over candidate pairs.
    Broadcast-dict mode under broadcast_rows_max; join mode above it."""
    import ray

    if ds.count() <= cfg.broadcast_rows_max:
        texts = {}
        for b in ds.select_columns([id_col, text_col]).iter_batches(
            batch_format="pyarrow", batch_size=8192
        ):
            for did, t in zip(
                b.column(id_col).to_pylist(), b.column(text_col).to_pylist()
            ):
                texts[str(did)] = t
        texts_ref = ray.put(texts)

        def verify(batch: pa.Table) -> pa.Table:
            from ..state.broadcast import cached_get

            lookup = cached_get(texts_ref)
            ls = batch.column("left_id").to_pylist()
            rs = batch.column("right_id").to_pylist()
            return pair_fn(
                ls, rs, [lookup.get(l) for l in ls],
                [lookup.get(r) for r in rs],
            )

        return cand.map_batches(verify, batch_format="pyarrow")

    joined = _attach_pair_texts(cand, ds, id_col, text_col, cfg)

    def verify_joined(batch: pa.Table) -> pa.Table:
        return pair_fn(
            batch.column("left_id").to_pylist(),
            batch.column("right_id").to_pylist(),
            batch.column("_lt").to_pylist(),
            batch.column("_rt").to_pylist(),
        )

    return joined.map_batches(verify_joined, batch_format="pyarrow")


def _components_output(ds, pairs, cfg, id_col):
    """edges → components; every doc labeled (singletons = own id).
    Component labels are broadcast under broadcast_rows_max, else attached
    via a left-outer hash join."""
    import pyarrow.compute as pc

    import ray

    comp = connected_components(pairs, cfg, src="left_id", dst="right_id")
    n_comp = comp.count()
    if n_comp <= cfg.broadcast_rows_max:
        if n_comp > 0:
            comp_df = comp.to_pandas()
            labeled = dict(zip(comp_df["conv_id"], comp_df["cluster_id"]))
        else:
            labeled = {}
        labeled_ref = ray.put(labeled)

        def assign(batch: pa.Table) -> pa.Table:
            from ..state.broadcast import cached_get

            labeled = cached_get(labeled_ref)
            ids = [str(x) for x in batch.column(id_col).to_pylist()]
            cl = [labeled.get(i, i) for i in ids]
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.string()),
                    "cluster_id": pa.array(cl, pa.string()),
                    "is_duplicate": pa.array(
                        [c != i for i, c in zip(ids, cl)]
                    ),
                }
            )

        return ds.map_batches(assign, batch_format="pyarrow")

    from ..config import default_parallelism

    docs = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column(id_col).cast(pa.string())}),
        batch_format="pyarrow",
    )
    joined = docs.join(
        comp.rename_columns({"conv_id": "doc_id"}),
        join_type="left_outer",
        num_partitions=max(default_parallelism(), 8),
        on=("doc_id",),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "cluster_id": pc.coalesce(
                    t.column("cluster_id"), t.column("doc_id")
                ),
                "is_duplicate": pc.invert(
                    pc.equal(
                        pc.coalesce(t.column("cluster_id"), t.column("doc_id")),
                        t.column("doc_id"),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )


class _MinHashBatch:
    """Signature actor: shingle + minhash + band keys per batch."""

    def __init__(self, num_perm, bands, shingle_k, seed, id_col, text_col):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bkeys = [], []
        mix = np.uint64(0x9E3779B97F4A7C15)
        for did, text in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            sig = minhash_signature(
                _shingle_hashes(text or "", self.k), self.a, self.b
            )
            for b in range(self.bands):
                seg = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                ids.append(str(did))
                with np.errstate(over="ignore"):
                    bkeys.append(
                        _stable_hash64(seg.tobytes()) ^ (np.uint64(b + 1) * mix)
                    )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "bkey": pa.array(np.asarray(bkeys, dtype=np.uint64)),
            }
        )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig | None = None,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    max_bucket: int = 200,
):
    """MinHash+LSH near-dup: shingle→minhash→band→bucket groupby→verify→CC.
    Output: (doc_id, cluster_id, is_duplicate)."""
    from ..config import actor_pool_size

    cfg = cfg or EngineConfig()
    ds = ds.materialize()
    sigs = ds.map_batches(
        _MinHashBatch,
        fn_constructor_kwargs=dict(
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            seed=cfg.seed,
            id_col=id_col,
            text_col=text_col,
        ),
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
        concurrency=actor_pool_size(None),
    ).materialize()
    # ^ seam before the LSH groupby: a compute-heavy map feeding an AllToAll
    # in one execution gets throttled by shuffle resource reservation
    # (see pipelines/linkage.py query→dedup note); signatures are skinny.
    cand = _pairs_from_keys(sigs, "doc_id", max_bucket, cfg)
    cand = _dedup_pairs(cand, cfg)

    def jaccard_verify(ls, rs, lt, rt) -> pa.Table:
        keep_l, keep_r, sims = [], [], []
        for l, r, a, b in zip(ls, rs, lt, rt):
            ja = jaccard(
                _shingle_hashes(a or "", shingle_k),
                _shingle_hashes(b or "", shingle_k),
            )
            if ja >= threshold:
                keep_l.append(l)
                keep_r.append(r)
                sims.append(ja)
        return pa.table(
            {
                "left_id": pa.array(keep_l, pa.string()),
                "right_id": pa.array(keep_r, pa.string()),
                "jaccard": pa.array(np.asarray(sims, np.float32)),
            }
        )

    verified = _verify_pairs(
        cand, ds, id_col, text_col, cfg, jaccard_verify
    ).materialize()
    return _components_output(ds, verified, cfg, id_col)


class _SimHashBatch:
    def __init__(self, id_col, text_col, seed):
        self.id_col = id_col
        self.text_col = text_col
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenizer import tokenize

        ids = [str(d) for d in batch.column(self.id_col).to_pylist()]
        tok_lists = [
            tokenize(t or "") for t in batch.column(self.text_col).to_pylist()
        ]
        n = len(ids)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n)
        total = int(counts.sum())
        fps = np.zeros(n, np.uint64)
        if total:
            # hash each occurrence once; bit-expand all occurrences at once
            # and segment-sum the ±1 contributions per doc (same math as the
            # former per-token loop, minus the per-token numpy dispatch)
            import pandas as pd

            flat = np.empty(total, object)
            pos = 0
            for toks in tok_lists:
                flat[pos : pos + len(toks)] = toks
                pos += len(toks)
            inv, uniq = pd.factorize(flat, sort=False)
            uh = np.fromiter(
                (_stable_hash64(t.encode()) for t in uniq), np.uint64, len(uniq)
            )
            shifts = np.arange(64, dtype=np.uint64)
            ubits = (
                (uh[:, None] >> shifts[None, :]) & np.uint64(1)
            ).astype(np.int8)
            contrib = (2 * ubits - 1).astype(np.int32)  # (n_uniq, 64) ±1
            rows = np.repeat(np.arange(n, dtype=np.int64), counts)
            # occurrence-weighted: count matrix (doc × uniq) @ contrib
            nu = len(uniq)
            acc = np.zeros((n, 64), np.int64)
            chunk_rows = max(64, (64 << 20) // (8 * max(nu, 1)))
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            for r0 in range(0, n, chunk_rows):
                r1 = min(r0 + chunk_rows, n)
                lo, hi = offsets[r0], offsets[r1]
                if lo == hi:
                    continue
                key = (rows[lo:hi] - r0) * nu + inv[lo:hi]
                c = np.bincount(key, minlength=(r1 - r0) * nu).reshape(
                    r1 - r0, nu
                )
                acc[r0:r1] = c @ contrib.astype(np.int64)
            pos_bits = (acc > 0).astype(np.uint64)
            fps = (pos_bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "simhash": pa.array(fps),
            }
        )


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig | None = None,
    max_hamming: int = 3,
    max_bucket: int = 200,
):
    """SimHash near-dup: 64-bit fingerprint, 4×16-bit band blocking (any pair
    within Hamming ≤ 3 shares at least one exact band), Hamming verify, CC."""
    from ..config import actor_pool_size

    cfg = cfg or EngineConfig()
    ds = ds.materialize()
    fps = ds.map_batches(
        _SimHashBatch,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col, seed=cfg.seed),
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
        concurrency=actor_pool_size(None),
    ).materialize()

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = np.asarray(batch.column("simhash"))
        mix = np.uint64(0x9E3779B97F4A7C15)
        out_id, out_key = [], []
        for b in range(4):
            seg = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):
                key = seg ^ (np.uint64(b + 1) * mix)
            out_id.extend(ids)
            out_key.extend(key.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.string()),
                "bkey": pa.array(np.asarray(out_key, np.uint64)),
            }
        )

    cand = _pairs_from_keys(
        fps.map_batches(explode_bands, batch_format="pyarrow"),
        "doc_id",
        max_bucket,
        cfg,
    )
    cand = _dedup_pairs(cand, cfg)

    def hamming_verify(ls, rs, lfp, rfp) -> pa.Table:
        keep_l, keep_r, dists = [], [], []
        for l, r, a, b in zip(ls, rs, lfp, rfp):
            d = bin(int(a or 0) ^ int(b or 0)).count("1")
            if d <= max_hamming:
                keep_l.append(l)
                keep_r.append(r)
                dists.append(d)
        return pa.table(
            {
                "left_id": pa.array(keep_l, pa.string()),
                "right_id": pa.array(keep_r, pa.string()),
                "hamming": pa.array(np.asarray(dists, np.int32)),
            }
        )

    # fingerprints (8 B/doc) are the broadcast side; join fallback beyond cap
    verified = _verify_pairs(
        cand, fps, "doc_id", "simhash", cfg, hamming_verify
    ).materialize()
    return _components_output(ds, verified, cfg, id_col)


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig | None = None,
    ngram: int = 3,
    threshold: float = 0.5,
    num_anchors: int = 4,
    max_bucket: int = 200,
):
    """Word n-gram Jaccard near-dup with rare-shingle anchor blocking: each
    doc emits its ``num_anchors`` smallest n-gram hashes as block keys (two
    docs with Jaccard ≥ 0.5 share a smallest-hash anchor with high
    probability — this is 1-perm MinHash with k anchors)."""
    from ..config import actor_pool_size
    from ..functions.tokenizer import tokenize

    cfg = cfg or EngineConfig()
    ds = ds.materialize()

    def ngram_set(text: str) -> np.ndarray:
        toks = tokenize(text or "")
        if len(toks) < ngram:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [
                " ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)
            ]
        if not grams:
            return np.asarray([], np.uint64)
        return np.unique(
            np.asarray([_stable_hash64(g.encode()) for g in grams], np.uint64)
        )

    def anchors(batch: pa.Table) -> pa.Table:
        out_id, out_anchor = [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            grams = ngram_set(text)
            for a in np.sort(grams)[:num_anchors]:
                out_id.append(str(did))
                out_anchor.append(int(a))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.string()),
                "bkey": pa.array(np.asarray(out_anchor, np.uint64)),
            }
        )

    cand = _pairs_from_keys(
        # seam before the groupby — same shuffle-reservation throttling note
        # as minhash_lsh_dedup; anchor rows are skinny
        ds.map_batches(anchors, batch_format="pyarrow").materialize(),
        "doc_id",
        max_bucket,
        cfg,
    )
    cand = _dedup_pairs(cand, cfg)

    def ngram_verify(ls, rs, lt, rt) -> pa.Table:
        keep_l, keep_r, sims = [], [], []
        for l, r, a, b in zip(ls, rs, lt, rt):
            ja = jaccard(ngram_set(a or ""), ngram_set(b or ""))
            if ja >= threshold:
                keep_l.append(l)
                keep_r.append(r)
                sims.append(ja)
        return pa.table(
            {
                "left_id": pa.array(keep_l, pa.string()),
                "right_id": pa.array(keep_r, pa.string()),
                "jaccard": pa.array(np.asarray(sims, np.float32)),
            }
        )

    verified = _verify_pairs(
        cand, ds, id_col, text_col, cfg, ngram_verify
    ).materialize()
    return _components_output(ds, verified, cfg, id_col)


def embedding_neardup(
    emb_ds,
    cfg: EngineConfig | None = None,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    k: int = 10,
):
    """Embedding-cosine near-dup: exact top-K self-join (the pairing stage),
    keep cosine ≥ τ, components. Output (doc_id, cluster_id, is_duplicate)."""
    from ..stages.pairing import ExactTopKPairer

    cfg = cfg or EngineConfig()
    emb_ds = emb_ds.materialize()
    pairer = ExactTopKPairer(k=k, cfg=cfg, exclude_self=True).index(
        emb_ds, id_col=id_col
    )
    cand = pairer.query(emb_ds, id_col=id_col)
    near = cand.filter(expr=f"cosine >= {threshold}")
    from ..pipelines.evaluate import normalize_pairs

    pairs = normalize_pairs(near).map_batches(
        lambda t: pa.table(
            {"left_id": t.column("ltable_id"), "right_id": t.column("rtable_id")}
        ),
        batch_format="pyarrow",
    ).materialize()
    return _components_output(emb_ds, pairs, cfg, id_col)
