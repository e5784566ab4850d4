"""Blocking / matching evaluation (A6, J4).

Reference: blocking_utils.py:19-33 — recall = |cand ∩ golden| / |golden|,
CSSR = |cand| / (|L|·|R|). The golden table is small by construction, so the
intersection is a broadcast set-membership filter inside map_batches, not a
shuffle join. Pair-level precision/recall/F1 (north_rule) use the same
broadcast, on unordered normalized pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..config import EngineConfig
from ..stages.canonicalize import bucket_of


def normalize_pairs(ds, left_col: str = "left_id", right_col: str = "right_id"):
    """(a,b) → unordered (ltable_id=min, rtable_id=max), self-pairs dropped,
    exact-deduped via hash-bucket groupby (U3)."""
    cfg = EngineConfig()

    def norm(batch: pa.Table) -> pa.Table:
        a = batch.column(left_col).cast(pa.string())
        b = batch.column(right_col).cast(pa.string())
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        keep = pc.not_equal(lo, hi)
        t = pa.table({"ltable_id": lo, "rtable_id": hi}).filter(keep)
        key = pc.binary_join_element_wise(
            t.column("ltable_id"), t.column("rtable_id"), "\x00"
        )
        import numpy as np

        bucket = bucket_of(key.to_pandas(), cfg.num_buckets)
        return t.append_column("_bucket", pa.array(bucket))

    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["ltable_id", "rtable_id"])[
            ["ltable_id", "rtable_id"]
        ]

    return (
        ds.map_batches(norm, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
    )


def _pair_key_set(golden: pd.DataFrame) -> set[tuple[str, str]]:
    out = set()
    for a, b in zip(golden["ltable_id"].astype(str), golden["rtable_id"].astype(str)):
        out.add((a, b) if a <= b else (b, a))
    return out


def count_hits(pairs_ds, golden_ref) -> int:
    """|pairs ∩ golden| via broadcast membership (golden is the small side)."""

    def hit_count(batch: pa.Table) -> pa.Table:
        golden = ray.get(golden_ref)
        n = 0
        for a, b in zip(
            batch.column("ltable_id").to_pylist(),
            batch.column("rtable_id").to_pylist(),
        ):
            if (a, b) in golden:
                n += 1
        return pa.table({"hits": pa.array([n], pa.int64())})

    total = 0
    for b in pairs_ds.map_batches(hit_count, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        total += int(pc.sum(b.column("hits")).as_py() or 0)
    return total


def blocking_statistics(
    candidates_ds,
    golden: pd.DataFrame,
    n_left: int,
    n_right: int,
    already_normalized: bool = False,
) -> dict:
    """blocking_utils.py:19-33, distributed counts."""
    pairs = candidates_ds if already_normalized else normalize_pairs(candidates_ds)
    pairs = pairs.materialize()
    golden_ref = ray.put(_pair_key_set(golden))
    hits = count_hits(pairs, golden_ref)
    n_cand = pairs.count()
    return {
        "left_num_tuples": n_left,
        "right_num_tuples": n_right,
        "candidates": n_cand,
        "golden": len(golden),
        "recall": hits / len(golden) if len(golden) else 1.0,
        "cssr": n_cand / (n_left * n_right) if n_left and n_right else 0.0,
    }


def pair_f1(matches_ds, golden: pd.DataFrame, already_normalized: bool = False) -> dict:
    """Precision/recall/F1 of predicted match pairs vs labeled pairs."""
    pairs = matches_ds if already_normalized else normalize_pairs(matches_ds)
    pairs = pairs.materialize()
    golden_ref = ray.put(_pair_key_set(golden))
    tp = count_hits(pairs, golden_ref)
    n_pred = pairs.count()
    precision = tp / n_pred if n_pred else 1.0
    recall = tp / len(golden) if len(golden) else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "tp": tp,
        "predicted": n_pred,
        "golden": len(golden),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def blocking_stats_from_labels(
    cands,
    labels_ds,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    cfg: EngineConfig | None = None,
):
    """Blocking quality (A6) against a LABELED item table: golden pairs =
    all same-label pairs — but the golden set is never materialized; its
    size comes from the label histogram (Σ c·(c−1)/2) and hits from label
    equality on the candidate pairs (labels attached via the size-aware
    broadcast join, hash-join fallback past the cap).

    One-row output (n_items, n_golden, n_candidates, n_hits, recall, cssr),
    every count an exact int64 and both ratios single IEEE divisions of
    those ints — bit-reproducible in the SQL twin. cssr uses the self-
    blocking denominator n·(n−1)/2 (the reference's |L|·|R| for L = R,
    blocking_utils.py:30, self-pairs excluded)."""
    import numpy as np

    from ..stages.relational import broadcast_join

    cfg = cfg or EngineConfig()

    def lab_tbl(suffix: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_lid" + suffix: pc.cast(t.column(id_col), pa.string()),
                    "_lab" + suffix: pc.cast(t.column(label_col), pa.int64()),
                }
            )

        return labels_ds.map_batches(f, batch_format="pyarrow")

    lab = lab_tbl("").materialize()
    n_items = lab.count()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("_lab", sort=False).agg(c=("_lab", "size"))
            .reset_index()
        )

    counts = (
        lab.map_batches(hist_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda df: df.groupby("_lab", sort=False).agg(c=("c", "sum"))
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    c = counts["c"].to_numpy(np.int64) if len(counts) else np.empty(0, np.int64)
    n_golden = int((c * (c - 1) // 2).sum())

    cands = cands.materialize()
    n_cand = cands.count()

    j = broadcast_join(
        cands, lab_tbl("_l"), big_key="left_id", small_key="_lid_l",
        payload_cols=["_lab_l"], cfg=cfg,
    )
    j = broadcast_join(
        j, lab_tbl("_r"), big_key="right_id", small_key="_lid_r",
        payload_cols=["_lab_r"], cfg=cfg,
    )
    n_hits = int(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"h": [int((df["_lab_l"] == df["_lab_r"]).sum())]}
            ),
            batch_format="pandas",
        ).sum("h")
        or 0
    )

    recall = n_hits / n_golden if n_golden else 1.0
    cssr = n_cand / (float(n_items) * (n_items - 1) / 2) if n_items > 1 else 0.0
    return pd.DataFrame(
        [
            {
                "n_items": np.int64(n_items),
                "n_golden": np.int64(n_golden),
                "n_candidates": np.int64(n_cand),
                "n_hits": np.int64(n_hits),
                "recall": recall,
                "cssr": cssr,
            }
        ]
    )


def clusters_to_pairs(clusters: pd.DataFrame, id_col="conv_id", label_col="entity_id") -> pd.DataFrame:
    """Ground-truth clusters → all unordered within-cluster pairs."""
    from ..fixtures import golden_pairs

    df = clusters.rename(columns={id_col: "conv_id", label_col: "entity_id"})
    return golden_pairs(df)


def pairwise_cluster_eval(
    pred,
    labels_ds,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    pred_id_col: str = "doc_id",
    pred_col: str = "cluster_id",
    cfg: EngineConfig | None = None,
):
    """Pairwise precision / recall / F1 of predicted clusters against gold
    labels — the north_rule's own acceptance metric (pairwise F1 ≥ 0.99) as
    a distributed one-row query.

    TP/FP/FN are derived from HISTOGRAMS, never from materialized pairs
    (a big cluster's pair set is quadratic; its histogram row is one int):
    pred_pairs = Σ_c C(n_c,2), gold_pairs = Σ_l C(n_l,2),
    tp = Σ_{(c,l)} C(n_{c,l},2). Labels attach via the size-aware broadcast
    join (hash-join fallback past the cap); each Σ runs as one bucketed
    count exchange whose partials are (key, count) rows, with per-bucket
    C(n,2) sums — driver state is O(num_buckets), not O(#clusters). Metrics
    are defined over items present on BOTH sides (inner join), every count
    an exact int64 and each ratio a single IEEE division — bit-reproducible
    in the SQL twin."""
    import numpy as np

    from ..stages.relational import broadcast_join

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def lab_f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_lid": pc.cast(t.column(id_col), pa.string()),
                "_lab": pc.cast(t.column(label_col), pa.int64()),
            }
        )

    lab = labels_ds.map_batches(lab_f, batch_format="pyarrow").materialize()
    n_items = lab.count()

    j = broadcast_join(
        pred, lab, big_key=pred_id_col, small_key="_lid",
        payload_cols=["_lab"], cfg=cfg,
    ).map_batches(
        lambda t: pa.table(
            {"_cl": pc.cast(t.column(pred_col), pa.string()),
             "_lab": t.column("_lab")}
        ),
        batch_format="pyarrow",
    ).materialize()

    def sum_pairs(ds_in, keys: list[str]) -> int:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = (
                df.groupby(keys, sort=False).size().rename("c").reset_index()
            )
            key = g[keys[0]].astype(str)
            for k in keys[1:]:
                key = key + "\x00" + g[k].astype(str)
            g["_bucket"] = bucket_of(key, nb)
            return g[keys + ["c", "_bucket"]]

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(keys, sort=False)["c"].sum().to_numpy(np.int64)
            return pd.DataFrame({"p": [int((s * (s - 1) // 2).sum())]})

        out = (
            ds_in.map_batches(partial, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .to_pandas()
        )
        return int(out["p"].sum()) if len(out) else 0

    pred_pairs = sum_pairs(j, ["_cl"])
    tp_pairs = sum_pairs(j, ["_cl", "_lab"])
    gold_pairs = sum_pairs(
        j.map_batches(
            lambda t: pa.table({"_lab": t.column("_lab")}),
            batch_format="pyarrow",
        ),
        ["_lab"],
    )

    precision = tp_pairs / pred_pairs if pred_pairs else 0.0
    recall = tp_pairs / gold_pairs if gold_pairs else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return pd.DataFrame(
        [
            {
                "n_items": np.int64(n_items),
                "pred_pairs": np.int64(pred_pairs),
                "gold_pairs": np.int64(gold_pairs),
                "tp_pairs": np.int64(tp_pairs),
                "pair_precision": precision,
                "pair_recall": recall,
                "pair_f1": f1,
            }
        ]
    )


def cluster_contingency(
    pred,
    labels_ds,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    pred_id_col: str = "doc_id",
    pred_col: str = "cluster_id",
    cfg: EngineConfig | None = None,
):
    """Exact cluster-vs-gold contingency table — the integer core behind
    B-cubed, purity and NMI: one row per occupied (cluster, label) cell
    over items present on BOTH sides, annotated with the cell count and
    both marginals. Emits (cluster_id, label, n_cl, n_c, n_l), all exact
    int64 — B³ precision = Σ n_cl²/n_c / N and recall = Σ n_cl²/n_l / N
    are one vectorized pass over this table; they are deliberately NOT
    emitted so every output column stays integer-exact (a distributed
    float Σ is addition-order-dependent and would break the SQL twin).
    Items with a NULL gold label are EXCLUDED up front (both engine and
    twin) — otherwise pandas' NaN-dropping groupby would silently omit
    their cells while still counting them in n_c.

    Scale shape: labels attach via the size-aware broadcast join
    (hash-join fallback past the cap); cell counts and both marginals are
    each ONE bucketed count exchange with per-batch partials (a cluster's
    rows pre-combine inside each batch, so the exchange carries (key, cnt)
    rows, not items); marginals — small by construction (≤ #clusters /
    #labels rows) — broadcast back onto the cell table. Driver state is
    O(num_buckets)."""
    import numpy as np

    from ..stages.relational import broadcast_join

    cfg = cfg or EngineConfig()

    def lab_f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(label_col)))
        return pa.table(
            {
                "_lid": pc.cast(t.column(id_col), pa.string()),
                "_lab": pc.cast(t.column(label_col), pa.int64()),
            }
        )

    lab = labels_ds.map_batches(lab_f, batch_format="pyarrow").materialize()
    j = broadcast_join(
        pred, lab, big_key=pred_id_col, small_key="_lid",
        payload_cols=["_lab"], cfg=cfg,
    ).map_batches(
        lambda t: pa.table(
            {"_cl": pc.cast(t.column(pred_col), pa.string()),
             "_lab": t.column("_lab")}
        ),
        batch_format="pyarrow",
    ).materialize()

    def counts_of(keys: list[str]):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(keys, sort=False).size().rename("c").reset_index()
            key = g[keys[0]].astype(str)
            for k in keys[1:]:
                key = key + "\x00" + g[k].astype(str)
            g["_bucket"] = bucket_of(key, cfg.num_buckets)
            return g[keys + ["c", "_bucket"]]

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(keys, sort=False)["c"].sum().reset_index()
            s["c"] = s["c"].astype("int64")
            return s

        return (
            j.map_batches(partial, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas")
        )

    cells = counts_of(["_cl", "_lab"]).map_batches(
        lambda df: df.rename(columns={"c": "n_cl"}), batch_format="pandas"
    )
    csize = counts_of(["_cl"]).map_batches(
        lambda df: df.rename(columns={"c": "n_c"}), batch_format="pandas"
    )
    lsize = counts_of(["_lab"]).map_batches(
        lambda df: df.rename(columns={"c": "n_l", "_lab": "_lab2"}),
        batch_format="pandas",
    )

    out = broadcast_join(
        cells, csize, big_key="_cl", small_key="_cl",
        payload_cols=["n_c"], cfg=cfg,
    )
    out = broadcast_join(
        out.map_batches(
            lambda df: df.rename(columns={"_lab": "_lab2"}),
            batch_format="pandas",
        ),
        lsize, big_key="_lab2", small_key="_lab2",
        payload_cols=["n_l"], cfg=cfg,
    )
    return out.map_batches(
        lambda df: pd.DataFrame(
            {
                "cluster_id": df["_cl"],
                "label": df["_lab2"].astype("int64"),
                "n_cl": df["n_cl"].astype("int64"),
                "n_c": df["n_c"].astype("int64"),
                "n_l": df["n_l"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def adjusted_rand_index(
    pred,
    labels_ds,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    pred_id_col: str = "doc_id",
    pred_col: str = "cluster_id",
    cfg: EngineConfig | None = None,
):
    """Adjusted Rand Index of predicted clusters against gold labels — the
    chance-corrected agreement score next to pairwise F1. Derived ENTIRELY
    from pairwise_cluster_eval's histogram sufficient statistics (pair sums
    never materialize pairs):

        ARI = 2·(tot·tp − pp·gp) / (tot·(pp + gp) − 2·pp·gp)

    with tot = C(n,2), pp = Σ_c C(n_c,2), gp = Σ_l C(n_l,2),
    tp = Σ_{c,l} C(n_{c,l},2). The numerator and denominator are exact
    arbitrary-precision integers (Python ints; the products overflow int64
    near ~10⁹ items — the SQL twin uses HUGEINT); ARI is the single final
    IEEE division. Degenerate case (denominator 0: both partitions all-
    singleton or all-one-cluster) pins ARI = 0.0. One row out:
    (n_items, pred_pairs, gold_pairs, tp_pairs, ari)."""
    base = pairwise_cluster_eval(
        pred, labels_ds,
        id_col=id_col, label_col=label_col,
        pred_id_col=pred_id_col, pred_col=pred_col, cfg=cfg,
    ).iloc[0]
    n = int(base["n_items"])
    pp = int(base["pred_pairs"])
    gp = int(base["gold_pairs"])
    tp = int(base["tp_pairs"])
    tot = n * (n - 1) // 2
    num = 2 * (tot * tp - pp * gp)
    den = tot * (pp + gp) - 2 * pp * gp
    ari = float(num) / float(den) if den != 0 else 0.0
    import numpy as np

    return pd.DataFrame(
        [
            {
                "n_items": np.int64(n),
                "pred_pairs": np.int64(pp),
                "gold_pairs": np.int64(gp),
                "tp_pairs": np.int64(tp),
                "ari": ari,
            }
        ]
    )


def pair_score_auc(
    emb_ds,
    cfg=None,
    *,
    n_queries: int = 32,
    id_col: str = "vec_id",
    list_col: str = "embedding",
    label_col: str = "label",
):
    """Exact tie-aware ROC AUC of a candidate-pair score against same-label
    ground truth — the threshold-free matcher-quality metric next to
    ``pairwise_cluster_eval``'s P/R/F1. Pairs are (query panel
    ``id < n_queries``) × (every other vector); score = the int8-quantized
    dot product (integer, exact — the ``knn_int8`` rule, so engine and SQL
    agree bit-for-bit on every tie group); positive ⇔ equal labels. AUC is
    the Mann-Whitney rank statistic with AVERAGE ranks for ties:
    AUC = (Σ_pos 2·avg_rank − n_pos(n_pos+1)) / (2·n_pos·n_neg), where
    2·avg_rank = 2·(count below) + ties + 1 stays integer throughout; the
    one float division happens at the very end (NULL if a class is empty).

    Scale shape: the panel is collected once (≤ n_queries rows by
    construction) and broadcast; the corpus streams through ONE map pass
    (float64 GEMM per batch — int8 products are exact below 2^53 — then a
    per-batch np.unique pre-reduce to (score, pos, cnt) partials), ONE
    score-bucketed exchange aggregates per-score counts, and the final
    task walks the ≤ min(n_pairs, 254²·dim+1) distinct scores with
    object-dtype (Python-int) cumsums so nothing wraps at any corpus size.
    Output: one row (n_pairs, n_pos, n_neg, auc)."""
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    from ..config import EngineConfig
    from ..stages.annsearch import _quantize_rows

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def _mat(t: pa.Table) -> np.ndarray:
        col = t.column(list_col).combine_chunks()
        if pa.types.is_fixed_size_list(col.type):
            width = col.type.list_size
        else:
            offs = np.asarray(col.offsets)
            widths = np.diff(offs)
            if len(widths) and (widths != widths[0]).any():
                raise ValueError(f"ragged {list_col!r} column")
            width = int(widths[0]) if len(widths) else 0
        flat = np.asarray(col.flatten()).astype(np.float64)
        return flat.reshape(len(col), width)

    # query panel: small by construction -> one driver collect + broadcast
    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column(id_col), pa.scalar(n_queries)))

    panel = (
        emb_ds.map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
    )
    pt = pa.Table.from_pandas(panel, preserve_index=False)
    qmat = _quantize_rows(_mat(pt))
    qids = panel[id_col].to_numpy(np.int64)
    qlabels = panel[label_col].to_numpy(np.int64)
    panel_ref = ray.put((qmat, qids, qlabels))

    empty = pa.table(
        {
            "score": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int8()),
            "cnt": pa.array([], pa.int64()),
            "_bucket": pa.array([], pa.int32()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_get

        qm, qi, ql = cached_get(panel_ref)
        if len(t) == 0 or len(qi) == 0:
            return empty
        xm = _quantize_rows(_mat(t))
        dim = xm.shape[1]
        bound = np.int64(127 * 127) * dim
        ids = np.asarray(t.column(id_col), np.int64)
        labels = np.asarray(t.column(label_col), np.int64)
        # int8 products are exact in float64 (|dot| <= 127^2 * dim << 2^53)
        dots = (qm @ xm.T).astype(np.int64)
        pos = (ql[:, None] == labels[None, :]).astype(np.int64)
        keep = (qi[:, None] != ids[None, :]).ravel()
        score = dots.ravel()[keep]
        posf = pos.ravel()[keep]
        # pre-reduce: one row per distinct (score, pos) in the batch
        comp = score * 2 + posf
        uniq, cnt = np.unique(comp, return_counts=True)
        u_score = uniq >> 1
        u_pos = (uniq & 1).astype(np.int8)
        # fixed equal-width ranges over the KNOWN score domain [-B, B]
        bucket = (
            (u_score + bound) * nb // (2 * bound + 1)
        ).astype(np.int32)
        return pa.table(
            {
                "score": pa.array(u_score),
                "pos": pa.array(u_pos),
                "cnt": pa.array(cnt.astype(np.int64)),
                "_bucket": pa.array(bucket),
            }
        )

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["score", "pos"], sort=False, as_index=False)[
            "cnt"
        ].sum()
        agg["_bucket"] = np.int32(g["_bucket"].iloc[0])
        return agg

    def combine(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("n_pairs", pa.int64()),
                ("n_pos", pa.int64()),
                ("n_neg", pa.int64()),
                ("auc", pa.float64()),
            ]
        )
        if len(df) == 0:
            return pa.table(
                {
                    "n_pairs": [0],
                    "n_pos": [0],
                    "n_neg": [0],
                    "auc": pa.array([None], pa.float64()),
                },
                schema=out_schema,
            )
        s = (
            df.pivot_table(
                index="score", columns="pos", values="cnt",
                aggfunc="sum", fill_value=0,
            )
            .reindex(columns=[0, 1], fill_value=0)
            .sort_index()
        )
        # object dtype = Python-int arithmetic: rank sums reach O(n_pairs^2)
        t_s = (s[0] + s[1]).to_numpy(np.int64).astype(object)
        p_s = s[1].to_numpy(np.int64).astype(object)
        c_below = np.concatenate(([0], np.cumsum(t_s)[:-1]))
        s2 = int((p_s * (2 * c_below + t_s + 1)).sum())
        n_pos = int(p_s.sum())
        n = int(t_s.sum())
        n_neg = n - n_pos
        num = s2 - n_pos * (n_pos + 1)
        den = 2 * n_pos * n_neg
        auc = float(num) / float(den) if den != 0 else None
        return pa.table(
            {
                "n_pairs": [n],
                "n_pos": [n_pos],
                "n_neg": [n_neg],
                "auc": pa.array([auc], pa.float64()),
            },
            schema=out_schema,
        )

    return (
        emb_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_range, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )
