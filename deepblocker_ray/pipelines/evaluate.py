"""Blocking / matching evaluation (A6, J4).

Reference: blocking_utils.py:19-33 — recall = |cand ∩ golden| / |golden|,
CSSR = |cand| / (|L|·|R|). The golden table is small by construction, so the
intersection is a broadcast set-membership filter inside map_batches, not a
shuffle join. Pair-level precision/recall/F1 (north_rule) use the same
broadcast, on unordered normalized pairs.
"""

from __future__ import annotations

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


def clusters_to_pairs(clusters: pd.DataFrame, id_col="conv_id", label_col="entity_id") -> pd.DataFrame:
    """Ground-truth clusters → all unordered within-cluster pairs."""
    from ..fixtures import golden_pairs

    df = clusters.rename(columns={id_col: "conv_id", label_col: "entity_id"})
    return golden_pairs(df)
