"""End-to-end pretraining-data curation: the composition every LLM data
pipeline runs, chained from this engine's already-twinned stages —

    normalize → exact-dedup (keep min id) → quality gate → pack

Each stage keeps its own scale shape (RE2 kernels / metadata-only dedup
exchange / skinny id semi-join / prefix-scan packing), so the composition
adds NO new exchange beyond its parts; the corpus text rides only the
map-side streams. Because every stage is individually hash-exact vs DuckDB,
the whole chain has one composite SQL twin (__ray_entry__: pretrain_curate)
whose output — the packed-sequence layout of the cleaned corpus — matches
bit-for-bit.
"""

from __future__ import annotations

from ..config import EngineConfig


def pretrain_curate(
    docs,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    tokens_per_seq: int = 256,
):
    """Curate ``docs`` into a packed training layout:

    1. ``text_normalize`` — control-strip / whitespace-collapse / trim /
       lowercase (RE2 kernels).
    2. ``exact_dedup`` on the NORMALIZED text (min-id winner, metadata-only
       exchange) — near-identical copies differing only in case/whitespace
       collapse to one.
    3. quality gate: ``quality_score`` ≥ ``quality_min`` (the score is
       bit-identical to its SQL twin, so any threshold filters identically);
       survivors selected via the skinny id semi-join — the deduped corpus
       streams, only ids broadcast.
    4. ``sequence_pack`` — concat-and-chunk offsets over ascending id.

    Output: (doc_id, n_tokens, start_tok, first_seq, last_seq) of surviving
    documents."""
    from ..stages.dedup import exact_dedup
    from ..stages.packing import sequence_pack
    from ..stages.relational import broadcast_exists_join
    from ..stages.textstats import quality_score, text_normalize

    cfg = cfg or EngineConfig()

    norm = text_normalize(docs, text_col=text_col, id_col=id_col)
    ded = exact_dedup(
        norm, text_col="norm_text", id_col=id_col, cfg=cfg
    ).materialize()  # consumed twice: quality scan + survivor stream
    kept_ids = quality_score(
        ded, text_col="norm_text", id_col="doc_id"
    ).filter(expr=f"quality >= {quality_min}").select_columns(["doc_id"])
    kept = broadcast_exists_join(
        ded, kept_ids, big_key="doc_id", small_key="doc_id", cfg=cfg
    )
    return sequence_pack(
        kept, cfg, id_col="doc_id", text_col="norm_text",
        tokens_per_seq=tokens_per_seq,
    )
