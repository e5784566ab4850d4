"""Flagship pipeline: transcript record linkage end-to-end (north_rule).

read transcripts → canonicalize (groupby conv_id, stable turn sort) →
fit + embed (SIF / AutoEncoder / CTT / Hybrid) → top-K cosine blocking
(exact or IVF) → pairwise scoring (cosine + Jaro-Winkler + Levenshtein on
per-turn text) → threshold → transitive clustering → (conv_id, cluster_id).

Every stage is a Dataset transform; the only driver-side work is bounded
(training sample, weight dicts, cluster fast path).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import EngineConfig, parallel_blocks
from ..stages.canonicalize import canonicalize
from ..stages.cluster import connected_components
from ..stages.deep_embed import AutoEncoderEmbedder, CTTEmbedder, HybridEmbedder
from ..stages.embed import AverageEmbedder, SIFEmbedder
from ..stages.pairing import ExactTopKPairer, IVFTopKPairer
from ..stages.scoring import score_candidates
from .evaluate import normalize_pairs

EMBEDDERS = {
    "average": AverageEmbedder,
    "sif": SIFEmbedder,
    "autoencoder": AutoEncoderEmbedder,
    "ctt": CTTEmbedder,
    "hybrid": HybridEmbedder,
}


def make_embedder(name_or_obj, cfg: EngineConfig):
    if not isinstance(name_or_obj, str):
        return name_or_obj
    try:
        return EMBEDDERS[name_or_obj](cfg)
    except KeyError:
        raise KeyError(
            f"unknown embedder {name_or_obj!r}; choose from {sorted(EMBEDDERS)}"
        ) from None


def _dedup_candidates(candidates, cfg: EngineConfig):
    """Orient candidate pairs (min,max) and exact-dedup so self-linkage
    scores each unordered pair ONCE — the query stage emits both directions
    for mutual nearest neighbors, which would double the (dominant) pairwise
    scoring cost. Cosine is symmetric so either orientation's value is kept;
    rank keeps the smaller (better) of the two. One skinny-row shuffle keyed
    on the pair hash (same bucket scheme as every other key exchange)."""
    import numpy as np

    from ..stages.canonicalize import bucket_of

    nb = cfg.num_buckets

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df["left_id"].to_numpy(object)
        b = df["right_id"].to_numpy(object)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        out = pd.DataFrame(
            {
                "left_id": lo,
                "right_id": hi,
                "rank": df["rank"].to_numpy(),
                "cosine": df["cosine"].to_numpy(),
            }
        )
        out["_bucket"] = bucket_of(lo + hi, nb)
        return out

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["left_id", "right_id", "rank"], kind="stable")
        return g.drop_duplicates(["left_id", "right_id"])[
            ["left_id", "right_id", "rank", "cosine"]
        ]

    return (
        candidates.map_batches(orient, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
    )


def assign_cluster_labels(ids_ds, comp, cfg: EngineConfig):
    """Attach component labels to every conversation id: unmatched ids form
    singletons (cluster_id = own id). The label side is broadcast via
    ray.put when it fits ``broadcast_rows_max``, else attached with a
    left-outer hash join — the single guarded implementation shared by the
    in-memory pipeline and the manifest (resume) pipeline.

    ``ids_ds`` must have a ``conv_id`` column; ``comp`` is the
    (conv_id, cluster_id) components Dataset."""
    n_comp = comp.count()
    if n_comp == 0:
        # no matches at all — every conversation is its own cluster (an empty
        # Dataset has no schema, so the broadcast path below would KeyError)
        return ids_ds.select_columns(["conv_id"]).map_batches(
            lambda t: pa.table(
                {"conv_id": t.column("conv_id"),
                 "cluster_id": t.column("conv_id")}
            ),
            batch_format="pyarrow",
        )
    if n_comp <= cfg.broadcast_rows_max:
        import ray

        comp_df = comp.to_pandas()
        labeled_ref = ray.put(
            dict(zip(comp_df["conv_id"], comp_df["cluster_id"]))
        )

        def assign(batch: pa.Table) -> pa.Table:
            from ..state.broadcast import cached_get

            labeled = cached_get(labeled_ref)
            ids = batch.column("conv_id").to_pylist()
            return pa.table(
                {
                    "conv_id": pa.array(ids, pa.string()),
                    "cluster_id": pa.array(
                        [labeled.get(i, i) for i in ids], pa.string()
                    ),
                }
            )

        return ids_ds.select_columns(["conv_id"]).map_batches(
            assign, batch_format="pyarrow"
        )
    from ..config import join_partitions

    joined = ids_ds.select_columns(["conv_id"]).join(
        comp,
        join_type="left_outer",
        num_partitions=join_partitions(),
        on=("conv_id",),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "conv_id": t.column("conv_id"),
                "cluster_id": pa.compute.coalesce(
                    t.column("cluster_id"), t.column("conv_id")
                ),
            }
        ),
        batch_format="pyarrow",
    )


def link_transcripts(
    transcripts,
    cfg: EngineConfig | None = None,
    embedder="sif",
    k: int = 10,
    pairing: str = "exact",
    threshold: float | None = None,
    turn_cap: int | None = 10_000,
) -> dict:
    """Self-linkage over one transcript table. Returns a dict of Datasets:
    tuples, candidates, scored, matches (normalized pairs), clusters
    (every conversation labeled; unmatched ones form singletons)."""
    cfg = cfg or EngineConfig()
    emb_model = make_embedder(embedder, cfg)

    from ..config import parallel_blocks_sized

    tuples = parallel_blocks_sized(
        canonicalize(transcripts, cfg, turn_cap=turn_cap).materialize()
    )
    emb_model.fit(tuples, text_col="tuple_text")
    emb = emb_model.transform(tuples, id_col="conv_id").materialize()
    res = link_from_embeddings(
        tuples, emb, cfg, k=k, pairing=pairing, threshold=threshold
    )
    res["embedder"] = emb_model  # fitted state, reusable by link_incremental
    return res


def link_from_embeddings(
    tuples,
    emb,
    cfg: EngineConfig | None = None,
    k: int = 10,
    pairing: str = "exact",
    threshold: float | None = None,
) -> dict:
    """Linkage back half over PRECOMPUTED embeddings: top-K cosine blocking →
    candidate-pair dedup → pairwise scoring (cosine + Jaro-Winkler +
    Levenshtein on turn texts) → threshold → transitive clustering.

    ``tuples`` must have (conv_id, turn_texts); ``emb`` must have
    (conv_id, emb: fixed_size_list<float32, D>). This is both the tail of
    link_transcripts and the standalone entry point for tables that ship
    their own embedding column (e.g. the driver's ``embeddings`` view) —
    with no hash embedding in the loop, every stage of the chain has an
    exact DuckDB twin (__ray_entry__: blocking_vec / linkage_vec)."""
    cfg = cfg or EngineConfig()
    if pairing == "exact":
        pairer = ExactTopKPairer(k=k, cfg=cfg, exclude_self=True)
    elif pairing == "ivf":
        pairer = IVFTopKPairer(k=k, cfg=cfg, exclude_self=True)
    else:
        raise KeyError(f"unknown pairing mode {pairing!r}")
    pairer.index(emb, id_col="conv_id")
    # materialize between the heavy query map and the dedup shuffle: when a
    # compute-heavy map feeds an AllToAll in one streaming execution, the
    # executor's resource reservation for the shuffle throttles the map to
    # 1-2 concurrent tasks on small-CPU sessions (observed 280s vs 104s for
    # the same query at 8 CPUs). Candidates are skinny rows — cheap to pin.
    raw_candidates = pairer.query(emb, id_col="conv_id").materialize()
    candidates = _dedup_candidates(raw_candidates, cfg)

    # barrier between score and the normalize_pairs exchange: measured A/B at
    # 8 CPUs on 428k turns, fusing the compute-heavy score map into the same
    # execution as the downstream groupby costs 39.6s → 67.0s (the executor's
    # shuffle resource reservation throttles the map) — the same hazard as
    # the query→dedup seam above. Do NOT collapse this materialize.
    scored = score_candidates(
        candidates, tuples, cfg=cfg, threshold=threshold
    ).materialize()
    matches = normalize_pairs(
        scored.filter(expr="is_match == True")
    ).materialize()
    comp = connected_components(matches, cfg, src="ltable_id", dst="rtable_id")
    clusters = assign_cluster_labels(tuples, comp, cfg)
    return {
        "tuples": tuples,
        "embeddings": emb,
        "candidates": candidates,
        "scored": scored,
        "matches": matches,
        "clusters": clusters,
    }


def _reject_id_overlap(prior_tuples, new_tuples, cfg: EngineConfig) -> None:
    """Raise if any delta conv_id already exists in the prior corpus.

    A re-delivered/updated conv_id would ride the union twice and emit two
    (conv_id, cluster_id) rows from ``assign_cluster_labels`` — silent
    corruption for any consumer keyed on conv_id. Updates need
    delete-and-relink (or the periodic full re-link); an explicit error
    here beats either happening silently.

    Cost per delta: one skinny scan of each side's id column plus the
    semi-join machinery (delta-sized broadcast below ``broadcast_rows_max``,
    hash join above it) — the corpora themselves never move. Ids are
    compared by md5-lower64, so a hash collision can only raise a spurious
    error (p ≈ n²·2⁻⁶⁴), never let a real overlap through."""
    import numpy as np

    from ..stages.dedup import hash64_strs
    from ..stages.relational import broadcast_exists_join

    def idh(t: pa.Table) -> pa.Table:
        vals = t.column("conv_id").to_pylist()
        return pa.table(
            {"_idh": pa.array(hash64_strs(vals).view(np.int64))}
        )

    prior_ids = prior_tuples.select_columns(["conv_id"]).map_batches(
        idh, batch_format="pyarrow"
    )
    new_ids = new_tuples.select_columns(["conv_id"]).map_batches(
        idh, batch_format="pyarrow"
    )
    n = broadcast_exists_join(
        prior_ids, new_ids, big_key="_idh", small_key="_idh", cfg=cfg
    ).count()
    if n:
        raise ValueError(
            f"{n} delta conv_id(s) already exist in the prior corpus; "
            "link_incremental absorbs NEW records only — drop or re-key "
            "re-delivered ids, or re-link the full corpus to apply updates"
        )


def link_incremental(
    prior: dict,
    new_transcripts,
    cfg: EngineConfig | None = None,
    embedder=None,
    k: int = 10,
    pairing: str = "exact",
    threshold: float | None = None,
    turn_cap: int | None = 10_000,
) -> dict:
    """Incremental linkage: absorb a NEW batch of transcripts into an
    already-linked corpus without re-linking it — the daily-delta shape.
    At 100 TB the anti-pattern is re-running O(corpus²) blocking per delta;
    here the delta costs O(new × index): only the new records are embedded
    and queried, old-old pairs are never re-blocked or re-scored.

    ``prior`` is the dict returned by ``link_transcripts`` (or a previous
    ``link_incremental``): its ``tuples``/``embeddings``/``clusters`` (and
    fitted ``embedder``, unless one is passed explicitly) are reused. The
    embedder is applied FROZEN — refitting would silently invalidate every
    stored embedding (for fit-sensitive embedders like SIF, periodically
    re-fit + re-link the full corpus; the hash AverageEmbedder is
    fit-free and exactly incremental).

    Steps: canonicalize new → embed with the frozen model → top-K query of
    the new side against old ∪ new → score → threshold → connected
    components over (new match edges ∪ prior cluster assignment edges) →
    relabel everyone. Because a cluster label is the MINIMUM member
    conv_id, absorbing new members preserves existing labels, a new record
    bridging two clusters merges them to the smaller label, and the result
    equals a full-batch run over the same match set.

    Documented deviation from full-batch: candidates are the NEW side's
    top-K only (an old record's own top-K list is not revisited when new
    records arrive) — the standard incremental-ER trade; new↔old pairs are
    still found from the new direction.

    Delta conv_ids must be NEW: an id already present in the prior corpus
    is rejected with ValueError (see ``_reject_id_overlap``). Returned dict:
    ``tuples``/``embeddings``/``matches``/``clusters`` describe the WHOLE
    grown corpus; ``candidates``/``scored``/``delta_matches`` are the delta
    increment only.
    """
    cfg = cfg or EngineConfig()
    embedder = embedder or prior.get("embedder")
    if embedder is None:
        raise ValueError(
            "link_incremental needs the FITTED embedder: pass embedder= or "
            "use a prior dict returned by link_transcripts"
        )

    from ..config import parallel_blocks_sized

    new_tuples = parallel_blocks_sized(
        canonicalize(new_transcripts, cfg, turn_cap=turn_cap).materialize()
    )
    # fail fast on re-delivered ids BEFORE paying the frozen-embedder
    # transform over the whole delta (the guard is one skinny id scan; the
    # embedding pass is O(new) full-text work)
    _reject_id_overlap(prior["tuples"], new_tuples, cfg)
    new_emb = embedder.transform(new_tuples, id_col="conv_id").materialize()
    res = link_incremental_from_embeddings(
        prior, new_tuples, new_emb, cfg, k=k, pairing=pairing,
        threshold=threshold, check_overlap=False,
    )
    res["embedder"] = embedder
    return res


def link_incremental_from_embeddings(
    prior: dict,
    new_tuples,
    new_emb,
    cfg: EngineConfig | None = None,
    k: int = 10,
    pairing: str = "exact",
    threshold: float | None = None,
    check_overlap: bool = True,
) -> dict:
    """Core of link_incremental over PRECOMPUTED delta embeddings (the tail
    shared with the SQL-twinnable ``linkage_vec_inc`` driver query — with no
    hash embedding in the loop every stage has an exact DuckDB twin).
    ``new_tuples`` needs (conv_id, turn_texts); ``new_emb`` (conv_id, emb)
    in the SAME embedding space as ``prior['embeddings']``.
    ``check_overlap=False`` skips the re-delivered-id guard when the caller
    already ran it (link_incremental runs it before embedding)."""
    cfg = cfg or EngineConfig()
    if check_overlap:
        _reject_id_overlap(prior["tuples"], new_tuples, cfg)
    all_emb = prior["embeddings"].union(new_emb).materialize()
    all_tuples = prior["tuples"].union(new_tuples).materialize()

    if pairing == "exact":
        pairer = ExactTopKPairer(k=k, cfg=cfg, exclude_self=True)
    elif pairing == "ivf":
        pairer = IVFTopKPairer(k=k, cfg=cfg, exclude_self=True)
    else:
        raise KeyError(f"unknown pairing mode {pairing!r}")
    pairer.index(all_emb, id_col="conv_id")
    # same load-bearing seams as link_from_embeddings (see the A/B notes
    # there): materialize between heavy maps and AllToAll exchanges
    raw_candidates = pairer.query(new_emb, id_col="conv_id").materialize()
    candidates = _dedup_candidates(raw_candidates, cfg)
    scored = score_candidates(
        candidates, all_tuples, cfg=cfg, threshold=threshold
    ).materialize()
    matches = normalize_pairs(
        scored.filter(expr="is_match == True")
    ).materialize()

    # prior assignments ride into CC as (conv_id, cluster_id) edges;
    # normalize_pairs drops the singleton self-edges (assign_cluster_labels
    # re-defaults unmatched ids to themselves) and dedups
    prior_edges = normalize_pairs(
        prior["clusters"], left_col="conv_id", right_col="cluster_id"
    )
    edges = matches.union(prior_edges)
    comp = connected_components(edges, cfg, src="ltable_id", dst="rtable_id")
    clusters = assign_cluster_labels(all_tuples, comp, cfg)
    # "matches" must describe the WHOLE corpus like tuples/embeddings/
    # clusters do — a consumer of the dict (or the CLI's matches output)
    # would otherwise silently lose every base-base pair. Delta-only edges
    # stay available as "delta_matches". The union is duplicate-free:
    # delta edges always have a NEW record on one side, prior edges never
    # do (the overlap guard above enforces id disjointness).
    all_matches = (
        prior["matches"].union(matches) if "matches" in prior else matches
    )
    return {
        "tuples": all_tuples,
        "embeddings": all_emb,
        "candidates": candidates,
        "scored": scored,
        "matches": all_matches,
        "delta_matches": matches,
        "clusters": clusters,
    }
