"""Numpy re-implementations of the reference's training components.

The reference trains two tiny torch MLPs (/root/reference/dl_models.py):
  - AutoEncoder (:47-69): encoder Linear(300,300)+ReLU+Linear(300,150),
    decoder mirror, MSE, Adam lr=1e-3, 50 epochs, batch 256, shuffled.
  - CTTModel (:115-137): siamese summarizer Linear(300,300)+ReLU+
    Linear(300,150)+ReLU, classifier Linear(150,1), BCE on
    sigmoid(classifier(|s(t1)−s(t2)|)).

torch is not in this environment and this is a from-scratch engine, so the
nets + Adam are re-implemented in numpy (~the same LoC as the torch originals)
with torch-default initialization (Kaiming-uniform fan_in for W and b).
Deviations, both documented in SURVEY §7.4:
  - training is seeded (the reference's torch training is unseeded,
    dl_models.py:78-105 — its AE/CTT embeddings vary run to run; ours don't,
    which retries at cluster scale require);
  - training runs on a driver-side bounded sample of the fit corpus
    (EngineConfig.train_sample_cap) instead of the full corpus.

Synthetic pair generation replicates tuple_embedding_models.py:187-232
verbatim (same ``random`` stream: seed, randint/choice call order) so its
output is bit-identical to the reference for the same tuple list.
"""

from __future__ import annotations

import random

import numpy as np

from ..config import (
    BATCH_SIZE,
    LEARNING_RATE,
    MAX_PERTURBATION,
    NUM_EPOCHS,
    POS_TO_NEG_RATIO,
    RANDOM_SEED,
    SYNTH_TUPLES_PER_TUPLE,
)
from ..functions.tokenizer import tokenize


import contextlib


@contextlib.contextmanager
def blas_threads(n: int = 8):
    """Temporarily raise OpenBLAS's thread count around the seeded
    training loops. The session pins OMP_NUM_THREADS=1 (right for Ray
    map tasks — oversubscribed BLAS threads fight the task pool), but
    the driver-side trainer is ONE process doing thousands of small
    GEMMs; threaded OpenBLAS splits the OUTPUT matrix across threads
    while each element's K-accumulation order is unchanged, so results
    stay BIT-IDENTICAL (pinned by the bit-parity tests in
    tests/test_train.py) and the wall drops ~3-4×. No-ops gracefully if
    the OpenBLAS control symbols can't be found."""
    import ctypes
    import glob
    import os

    import numpy as _np

    setn = getn = None
    try:
        libdir = os.path.join(
            os.path.dirname(os.path.dirname(_np.__file__)), "numpy.libs"
        )
        for so in glob.glob(os.path.join(libdir, "*openblas*")):
            lib = ctypes.CDLL(so)
            setn = getattr(lib, "openblas_set_num_threads64_", None) or \
                getattr(lib, "openblas_set_num_threads", None)
            getn = getattr(lib, "openblas_get_num_threads64_", None) or \
                getattr(lib, "openblas_get_num_threads", None)
            if setn is not None:
                break
    except Exception:
        setn = getn = None
    if setn is None or getn is None:
        yield
        return
    prev = getn()
    setn(int(n))
    try:
        yield
    finally:
        setn(prev)



def _init_linear(
    rng: np.random.Generator, fan_in: int, fan_out: int
) -> tuple[np.ndarray, np.ndarray]:
    """torch nn.Linear default init: U(−1/√fan_in, 1/√fan_in) for W and b."""
    bound = 1.0 / np.sqrt(fan_in)
    w = rng.uniform(-bound, bound, size=(fan_in, fan_out))
    b = rng.uniform(-bound, bound, size=fan_out)
    return w, b


class Adam:
    """Adam with torch defaults (lr handled by caller, β=(0.9,0.999), ε=1e-8)."""

    def __init__(self, params: dict[str, np.ndarray], lr: float = LEARNING_RATE):
        self.params = params
        self.lr = lr
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}
        self.t = 0

    def step(self, grads: dict[str, np.ndarray]) -> None:
        self.t += 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        bc1 = 1 - b1**self.t
        bc2 = 1 - b2**self.t
        for k, g in grads.items():
            self.m[k] = b1 * self.m[k] + (1 - b1) * g
            self.v[k] = b2 * self.v[k] + (1 - b2) * g * g
            self.params[k] -= (
                self.lr * (self.m[k] / bc1) / (np.sqrt(self.v[k] / bc2) + eps)
            )


class AutoEncoderNet:
    """dl_models.py:47-69 in numpy. Weights are a plain dict — broadcast to
    inference actors via ray.put, no framework state."""

    def __init__(self, input_dim: int, hidden_dims: tuple[int, int], seed: int):
        rng = np.random.default_rng(seed)
        h0, h1 = hidden_dims
        p = {}
        p["e_w1"], p["e_b1"] = _init_linear(rng, input_dim, h0)
        p["e_w2"], p["e_b2"] = _init_linear(rng, h0, h1)
        p["d_w1"], p["d_b1"] = _init_linear(rng, h1, h0)
        p["d_w2"], p["d_b2"] = _init_linear(rng, h0, input_dim)
        self.params = p

    @staticmethod
    def encode(params: dict, x: np.ndarray) -> np.ndarray:
        h = np.maximum(x @ params["e_w1"] + params["e_b1"], 0.0)
        return h @ params["e_w2"] + params["e_b2"]

    def forward_backward(self, x: np.ndarray) -> tuple[float, dict]:
        p = self.params
        n = len(x)
        h1_pre = x @ p["e_w1"] + p["e_b1"]
        h1 = np.maximum(h1_pre, 0.0)
        z = h1 @ p["e_w2"] + p["e_b2"]
        h2_pre = z @ p["d_w1"] + p["d_b1"]
        h2 = np.maximum(h2_pre, 0.0)
        out = h2 @ p["d_w2"] + p["d_b2"]
        diff = out - x
        loss = float((diff**2).mean())
        # MSELoss mean over all elements
        g_out = 2.0 * diff / diff.size
        g = {}
        g["d_w2"] = h2.T @ g_out
        g["d_b2"] = g_out.sum(0)
        g_h2 = (g_out @ p["d_w2"].T) * (h2_pre > 0)
        g["d_w1"] = z.T @ g_h2
        g["d_b1"] = g_h2.sum(0)
        g_z = g_h2 @ p["d_w1"].T
        g["e_w2"] = h1.T @ g_z
        g["e_b2"] = g_z.sum(0)
        g_h1 = (g_z @ p["e_w2"].T) * (h1_pre > 0)
        g["e_w1"] = x.T @ g_h1
        g["e_b1"] = g_h1.sum(0)
        return loss, g


class CTTNet:
    """dl_models.py:115-137 in numpy (siamese summarizer + 1-unit classifier)."""

    def __init__(self, input_dim: int, hidden_dims: tuple[int, int], seed: int):
        rng = np.random.default_rng(seed)
        h0, h1 = hidden_dims
        p = {}
        p["s_w1"], p["s_b1"] = _init_linear(rng, input_dim, h0)
        p["s_w2"], p["s_b2"] = _init_linear(rng, h0, h1)
        p["c_w"], p["c_b"] = _init_linear(rng, h1, 1)
        self.params = p

    @staticmethod
    def summarize(params: dict, x: np.ndarray) -> np.ndarray:
        h = np.maximum(x @ params["s_w1"] + params["s_b1"], 0.0)
        return np.maximum(h @ params["s_w2"] + params["s_b2"], 0.0)

    def forward_backward(
        self, t1: np.ndarray, t2: np.ndarray, y: np.ndarray
    ) -> tuple[float, dict]:
        p = self.params
        n = len(t1)

        def fwd(x):
            h_pre = x @ p["s_w1"] + p["s_b1"]
            h = np.maximum(h_pre, 0.0)
            s_pre = h @ p["s_w2"] + p["s_b2"]
            s = np.maximum(s_pre, 0.0)
            return h_pre, h, s_pre, s

        h1_pre, h1, s1_pre, s1 = fwd(t1)
        h2_pre, h2, s2_pre, s2 = fwd(t2)
        d = s1 - s2
        a = np.abs(d)
        logit = a @ p["c_w"] + p["c_b"]
        prob = 1.0 / (1.0 + np.exp(-logit))
        eps = 1e-12
        y = y.reshape(-1, 1)
        loss = float(
            -(y * np.log(prob + eps) + (1 - y) * np.log(1 - prob + eps)).mean()
        )
        g_logit = (prob - y) / n           # BCE mean
        g = {}
        g["c_w"] = a.T @ g_logit
        g["c_b"] = g_logit.sum(0)
        g_a = g_logit @ p["c_w"].T
        g_d = g_a * np.sign(d)
        # branch 1 (+g_d), branch 2 (−g_d) share weights
        def bwd(g_s, h_pre, h, s_pre, x):
            g_s = g_s * (s_pre > 0)
            gw2 = h.T @ g_s
            gb2 = g_s.sum(0)
            g_h = (g_s @ p["s_w2"].T) * (h_pre > 0)
            gw1 = x.T @ g_h
            gb1 = g_h.sum(0)
            return gw1, gb1, gw2, gb2

        w1a, b1a, w2a, b2a = bwd(g_d, h1_pre, h1, s1_pre, t1)
        w1b, b1b, w2b, b2b = bwd(-g_d, h2_pre, h2, s2_pre, t2)
        g["s_w1"] = w1a + w1b
        g["s_b1"] = b1a + b1b
        g["s_w2"] = w2a + w2b
        g["s_b2"] = b2a + b2b
        return loss, g


def train_autoencoder(
    x: np.ndarray,
    hidden_dims: tuple[int, int],
    num_epochs: int = NUM_EPOCHS,
    batch_size: int = BATCH_SIZE,
    lr: float = LEARNING_RATE,
    seed: int = RANDOM_SEED,
) -> dict[str, np.ndarray]:
    """dl_models.py:78-105 (AutoEncoderTrainer.train) — seeded."""
    net = AutoEncoderNet(x.shape[1], hidden_dims, seed)
    opt = Adam(net.params, lr)
    rng = np.random.default_rng(seed)
    with blas_threads():
        for _epoch in range(num_epochs):
            order = rng.permutation(len(x))
            for s in range(0, len(x), batch_size):
                _loss, grads = net.forward_backward(
                    x[order[s : s + batch_size]]
                )
                opt.step(grads)
    return net.params


def train_ctt(
    left: np.ndarray,
    right: np.ndarray,
    labels: np.ndarray,
    hidden_dims: tuple[int, int],
    num_epochs: int = NUM_EPOCHS,
    batch_size: int = BATCH_SIZE,
    lr: float = LEARNING_RATE,
    seed: int = RANDOM_SEED,
) -> dict[str, np.ndarray]:
    """dl_models.py:144-177 (CTTModelTrainer.train) — seeded. The trainer's
    input dim is wired to the actual aggregator output dim, fixing the
    reference's Hybrid dim-mismatch defect (tuple_embedding_models.py:288,311
    passes 300 while AE embeddings are 150-d)."""
    net = CTTNet(left.shape[1], hidden_dims, seed)
    opt = Adam(net.params, lr)
    rng = np.random.default_rng(seed)
    y = np.asarray(labels, np.float64)
    with blas_threads():
        for _epoch in range(num_epochs):
            order = rng.permutation(len(left))
            for s in range(0, len(left), batch_size):
                b = order[s : s + batch_size]
                _loss, grads = net.forward_backward(left[b], right[b], y[b])
                opt.step(grads)
    return net.params


def save_weights(params: dict[str, np.ndarray], path: str) -> None:
    """S4 (dl_models.py:107-113): persist trained weights. npz instead of a
    torch state_dict; atomic via temp + rename so a crashed save never leaves
    a half-written checkpoint."""
    import os

    tmp = path + ".tmp.npz"
    np.savez(tmp, **params)
    os.replace(tmp, path)


def load_weights(path: str) -> dict[str, np.ndarray]:
    """S4 (dl_models.py:179-185)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def generate_synthetic_training_data(
    list_of_tuples: list[str],
    synth_tuples_per_tuple: int = SYNTH_TUPLES_PER_TUPLE,
    pos_to_neg_ratio: int = POS_TO_NEG_RATIO,
    max_perturbation: float = MAX_PERTURBATION,
    seed: int = RANDOM_SEED,
) -> tuple[list[str], list[str], list[int]]:
    """Bit-exact replay of tuple_embedding_models.py:187-232: per tuple, 5
    positive pairs (drop ≤40% random tokens) + 5 uniform negatives, one global
    seeded ``random`` stream."""
    num_pos = synth_tuples_per_tuple
    num_neg = synth_tuples_per_tuple * pos_to_neg_ratio
    total = len(list_of_tuples) * (num_pos + num_neg)
    left: list[str | None] = [None] * total
    right: list[str | None] = [None] * total
    labels = [0] * total

    random.seed(seed)
    for index, tup in enumerate(list_of_tuples):
        toks = tokenize(tup)
        max_rm = int(len(toks) * max_perturbation)
        i = index * (num_pos + num_neg)
        for _ in range(num_pos):
            copy = toks[:]
            n_rm = random.randint(0, max_rm)
            for _ in range(n_rm):
                copy.pop(random.randint(0, len(copy) - 1))
            left[i] = tup
            right[i] = " ".join(copy)
            labels[i] = 1
            i += 1
        for _ in range(num_neg):
            left[i] = tup
            right[i] = random.choice(list_of_tuples)
            labels[i] = 0
            i += 1
    return left, right, labels


def synthetic_pairs_dataset(
    tuples_ds,
    text_col: str = "tuple_text",
    synth_tuples_per_tuple: int = SYNTH_TUPLES_PER_TUPLE,
    pos_to_neg_ratio: int = POS_TO_NEG_RATIO,
    max_perturbation: float = MAX_PERTURBATION,
    seed: int = RANDOM_SEED,
    reservoir_size: int = 10_000,
):
    """Distributed T4: the reference's synthetic-pair generator as a Dataset
    transform for corpora too big to collect.

    Deviations vs tuple_embedding_models.py:187-232 (both deliberate,
    SURVEY §2.6-O5): RNG streams are derived per batch from
    (seed, first-tuple hash) so output is deterministic across retries and
    cluster sizes but not the reference's single global stream; negatives are
    drawn uniformly from a seeded broadcast reservoir sample instead of the
    full corpus (labels are self-supervised, semantics unchanged).
    Output rows: (left_text, right_text, label).
    """
    import pyarrow as pa

    import ray

    n = tuples_ds.count()
    frac = min(1.0, reservoir_size * 1.2 / max(n, 1))
    reservoir = [
        r[text_col]
        for r in tuples_ds.random_sample(frac, seed=seed)
        .limit(reservoir_size)
        .select_columns([text_col])
        .take_all()
    ]
    reservoir_ref = ray.put(reservoir)
    num_pos = synth_tuples_per_tuple
    num_neg = synth_tuples_per_tuple * pos_to_neg_ratio

    def gen(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_get

        res = cached_get(reservoir_ref)
        texts = batch.column(text_col).to_pylist()
        if not texts:
            return pa.table(
                {
                    "left_text": pa.array([], pa.string()),
                    "right_text": pa.array([], pa.string()),
                    "label": pa.array([], pa.int32()),
                }
            )
        import hashlib

        h = hashlib.blake2b(
            (texts[0] or "").encode(), digest_size=8,
            key=seed.to_bytes(8, "little"),
        )
        rng = np.random.default_rng(int.from_bytes(h.digest(), "little"))
        out_l, out_r, out_y = [], [], []
        for tup in texts:
            toks = tokenize(tup or "")
            max_rm = int(len(toks) * max_perturbation)
            for _ in range(num_pos):
                copy = toks[:]
                n_rm = int(rng.integers(0, max_rm + 1))
                for _ in range(n_rm):
                    copy.pop(int(rng.integers(0, len(copy))))
                out_l.append(tup)
                out_r.append(" ".join(copy))
                out_y.append(1)
            for _ in range(num_neg):
                out_l.append(tup)
                out_r.append(res[int(rng.integers(0, len(res)))])
                out_y.append(0)
        return pa.table(
            {
                "left_text": pa.array(out_l, pa.string()),
                "right_text": pa.array(out_r, pa.string()),
                "label": pa.array(np.asarray(out_y, np.int32)),
            }
        )

    return tuples_ds.map_batches(gen, batch_format="pyarrow")
