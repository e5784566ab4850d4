"""Deep tuple embedders: AutoEncoder, CTT, Hybrid (T3/T5/T6).

Reference flow (/root/reference/tuple_embedding_models.py:148-328): fit SIF on
the corpus, embed the corpus, train a small MLP on those embeddings, then at
inference either encode (AutoEncoder, :173-177) or — reference quirk — return
the *aggregator* embeddings with the trained model unused (CTT :271-273,
Hybrid :319-321). We preserve the quirk behind ``apply_summarizer``
(default False = released-code behavior; True = the VLDB paper semantics,
dl_models.py:135-137).

Ray-Data-native split: the distributed part (SIF fit, corpus embedding,
inference) runs as Dataset stages; the tiny MLP trains on a driver-side
bounded sample (EngineConfig.train_sample_cap — the fit corpus at 10^12-turn
scale cannot be materialized; documented deviation), and the resulting weight
dict is broadcast once via ray.put to the inference actor pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, actor_pool_size
from .embed import SIFEmbedder, emb_to_numpy, numpy_to_emb
from .train import (
    AutoEncoderNet,
    CTTNet,
    generate_synthetic_training_data,
    train_autoencoder,
    train_ctt,
)


def sample_tuples(ds, cap: int, seed: int, text_col: str = "tuple_text") -> list[str]:
    """Bounded, seeded driver-side sample of tuple strings for training."""
    n = ds.count()
    if n > cap:
        ds = ds.random_sample(min(1.0, cap * 1.2 / n), seed=seed).limit(cap)
    return [r[text_col] for r in ds.select_columns([text_col]).take_all()]


def _collect_matrix(emb_ds, dim: int) -> tuple[list[str], np.ndarray]:
    ids: list[str] = []
    mats = []
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids.extend(b.column(b.column_names[0]).to_pylist())
        mats.append(emb_to_numpy(b.column("emb"), dim).astype(np.float64))
    if not mats:
        return ids, np.zeros((0, dim))
    return ids, np.vstack(mats)


def _forward_stage(ds, cfg: EngineConfig, weights_ref, kind: str):
    """Inference map stage applying broadcast numpy weights (MLP forward) —
    task pool with per-process weight cache (see state/broadcast.py)."""

    def forward_fn(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_get

        params = cached_get(weights_ref)
        x = emb_to_numpy(batch.column("emb")).astype(np.float64)
        if kind == "ae":
            out = AutoEncoderNet.encode(params, x)
        else:
            out = CTTNet.summarize(params, x)
        cols = {n: batch.column(n) for n in batch.column_names if n != "emb"}
        cols["emb"] = numpy_to_emb(out)
        return pa.table(cols)

    from ..config import gpu_kwargs

    return ds.map_batches(
        forward_fn, batch_format="pyarrow", batch_size=cfg.embed_batch_size,
        **gpu_kwargs(cfg),
    )


def _embed_texts_distributed(sif: SIFEmbedder, texts: list[str], dim: int) -> np.ndarray:
    """SIF-embed a list of strings through the distributed transform (the
    reference embeds synthetic pair lists the same way it embeds the corpus,
    tuple_embedding_models.py:265-267)."""
    import ray.data as rd

    t = pa.table(
        {
            "_row": pa.array(np.arange(len(texts))),
            "tuple_text": pa.array(texts, pa.string()),
        }
    )
    emb = sif.transform(rd.from_arrow(t), id_col="_row", text_col="tuple_text")
    ids, mat = _collect_matrix(emb, dim)
    order = np.argsort(np.asarray(ids, np.int64))
    return mat[order]


class AutoEncoderEmbedder:
    """T3 (tuple_embedding_models.py:148-178)."""

    def __init__(self, cfg: EngineConfig | None = None, hidden_dims=None):
        self.cfg = cfg or EngineConfig()
        self.hidden_dims = hidden_dims or (self.cfg.ae_dim * 2, self.cfg.ae_dim)
        self.sif = SIFEmbedder(self.cfg)
        self.weights_ref = None

    def fit(self, ds, text_col: str = "tuple_text"):
        cfg = self.cfg
        self.sif.fit(ds, text_col)
        texts = sample_tuples(ds, cfg.train_sample_cap, cfg.seed, text_col)
        x = _embed_texts_distributed(self.sif, texts, cfg.emb_dim)
        params = train_autoencoder(
            x, self.hidden_dims, num_epochs=cfg.num_epochs, seed=cfg.seed
        )
        self.weights_ref = ray.put(params)
        return self

    def transform(self, ds, id_col: str = "conv_id", text_col: str = "tuple_text"):
        if self.weights_ref is None:
            raise RuntimeError("AutoEncoderEmbedder.transform before fit")
        cfg = self.cfg
        sif_emb = self.sif.transform(ds, id_col=id_col, text_col=text_col)
        return _forward_stage(sif_emb, cfg, self.weights_ref, "ae")

    @property
    def output_dim(self) -> int:
        return self.hidden_dims[1]


class CTTEmbedder:
    """T5 (tuple_embedding_models.py:236-280). ``apply_summarizer=False``
    reproduces the released behavior (trained model unused at inference,
    :271-273)."""

    def __init__(
        self,
        cfg: EngineConfig | None = None,
        hidden_dims=None,
        apply_summarizer: bool = False,
        aggregator=None,
    ):
        self.cfg = cfg or EngineConfig()
        self.hidden_dims = hidden_dims or (self.cfg.ae_dim * 2, self.cfg.ae_dim)
        self.apply_summarizer = apply_summarizer
        # default aggregator is SIF (tuple_embedding_models.py:247); Hybrid
        # passes an AutoEncoderEmbedder instead (:284-297)
        self.aggregator = aggregator or SIFEmbedder(self.cfg)
        self.weights_ref = None

    def _aggregate_texts(self, texts: list[str]) -> np.ndarray:
        cfg = self.cfg
        if isinstance(self.aggregator, SIFEmbedder):
            return _embed_texts_distributed(self.aggregator, texts, cfg.emb_dim)
        # AE aggregator: SIF then encode, driver-side via broadcast weights
        x = _embed_texts_distributed(self.aggregator.sif, texts, cfg.emb_dim)
        return AutoEncoderNet.encode(ray.get(self.aggregator.weights_ref), x)

    def fit(self, ds, text_col: str = "tuple_text"):
        cfg = self.cfg
        self.aggregator.fit(ds, text_col)
        texts = sample_tuples(
            ds, min(cfg.train_sample_cap, 20_000), cfg.seed, text_col
        )
        left, right, labels = generate_synthetic_training_data(
            texts, seed=cfg.seed
        )
        lm = self._aggregate_texts(left)
        rm = self._aggregate_texts(right)
        # input dim follows the aggregator's actual output (fixes the
        # reference Hybrid defect, tuple_embedding_models.py:288,311)
        params = train_ctt(
            lm,
            rm,
            np.asarray(labels),
            self.hidden_dims,
            num_epochs=cfg.num_epochs,
            seed=cfg.seed,
        )
        self.weights_ref = ray.put(params)
        return self

    def transform(self, ds, id_col: str = "conv_id", text_col: str = "tuple_text"):
        if self.weights_ref is None:
            raise RuntimeError("CTTEmbedder.transform before fit")
        agg = self.aggregator.transform(ds, id_col=id_col, text_col=text_col)
        if not self.apply_summarizer:
            return agg  # reference quirk: trained model unused (:271-273)
        return _forward_stage(agg, self.cfg, self.weights_ref, "ctt")

    def _agg_dim(self) -> int:
        if isinstance(self.aggregator, SIFEmbedder):
            return self.cfg.emb_dim
        return self.aggregator.output_dim

    @property
    def output_dim(self) -> int:
        if self.apply_summarizer:
            return self.hidden_dims[1]
        return self._agg_dim()


def HybridEmbedder(
    cfg: EngineConfig | None = None,
    hidden_dims=None,
    apply_summarizer: bool = False,
) -> CTTEmbedder:
    """T6 (tuple_embedding_models.py:284-328): CTT over an AutoEncoder
    aggregator."""
    cfg = cfg or EngineConfig()
    return CTTEmbedder(
        cfg,
        hidden_dims=hidden_dims,
        apply_summarizer=apply_summarizer,
        aggregator=AutoEncoderEmbedder(cfg),
    )
