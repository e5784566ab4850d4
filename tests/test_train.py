"""Trainers: gradient checks vs finite differences, training convergence,
synthetic-pair generation semantics, deep embedder wiring."""

import numpy as np
import pytest

from deepblocker_ray.config import EngineConfig
from deepblocker_ray.stages.train import (
    Adam,
    AutoEncoderNet,
    CTTNet,
    generate_synthetic_training_data,
    train_autoencoder,
    train_ctt,
)


def numerical_grad(f, params, key, eps=1e-6):
    p = params[key]
    g = np.zeros_like(p)
    it = np.nditer(p, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        old = p[i]
        p[i] = old + eps
        lp = f()
        p[i] = old - eps
        lm = f()
        p[i] = old
        g[i] = (lp - lm) / (2 * eps)
        it.iternext()
    return g


class TestGradients:
    def test_autoencoder_grads(self):
        rng = np.random.default_rng(0)
        net = AutoEncoderNet(5, (4, 3), seed=1)
        x = rng.standard_normal((7, 5))
        _loss, grads = net.forward_backward(x)
        for key in net.params:
            num = numerical_grad(
                lambda: net.forward_backward(x)[0], net.params, key
            )
            np.testing.assert_allclose(grads[key], num, atol=1e-5, err_msg=key)

    def test_ctt_grads(self):
        rng = np.random.default_rng(0)
        net = CTTNet(5, (4, 3), seed=1)
        t1 = rng.standard_normal((6, 5))
        t2 = rng.standard_normal((6, 5))
        y = (rng.random(6) > 0.5).astype(float)
        _loss, grads = net.forward_backward(t1, t2, y)
        for key in net.params:
            num = numerical_grad(
                lambda: net.forward_backward(t1, t2, y)[0], net.params, key
            )
            np.testing.assert_allclose(grads[key], num, atol=1e-5, err_msg=key)


class TestTraining:
    def test_ae_converges_and_deterministic(self):
        rng = np.random.default_rng(3)
        # rank-3 data — compressible through the 4-d bottleneck
        x = rng.standard_normal((200, 3)) @ rng.standard_normal((3, 12))
        p1 = train_autoencoder(x, (8, 4), num_epochs=300, seed=9)
        p2 = train_autoencoder(x, (8, 4), num_epochs=300, seed=9)
        for k in p1:
            np.testing.assert_array_equal(p1[k], p2[k])
        net0 = AutoEncoderNet(12, (8, 4), seed=9)
        loss0, _ = net0.forward_backward(x)
        net1 = AutoEncoderNet(12, (8, 4), seed=9)
        net1.params = p1
        loss1, _ = net1.forward_backward(x)
        assert loss1 < loss0 * 0.8

    def test_ctt_converges(self):
        rng = np.random.default_rng(4)
        base = rng.standard_normal((100, 10))
        pos_r = base + rng.normal(0, 0.05, base.shape)
        neg_r = rng.standard_normal((100, 10))
        left = np.vstack([base, base])
        right = np.vstack([pos_r, neg_r])
        y = np.concatenate([np.ones(100), np.zeros(100)])
        params = train_ctt(left, right, y, (8, 4), num_epochs=500, seed=5)
        net = CTTNet(10, (8, 4), seed=5)
        net.params = params
        loss, _ = net.forward_backward(left, right, y)
        assert loss < 0.5  # well below chance BCE (~0.69)


class TestSyntheticPairs:
    def test_shape_and_labels(self):
        tuples = [f"alpha bravo charlie delta echo {i}" for i in range(10)]
        left, right, labels = generate_synthetic_training_data(tuples)
        assert len(left) == len(right) == len(labels) == 10 * 10
        # layout per reference: 5 positives then 5 negatives per tuple
        for i in range(10):
            seg = labels[i * 10 : (i + 1) * 10]
            assert seg == [1] * 5 + [0] * 5
            assert all(left[i * 10 + j] == tuples[i] for j in range(10))

    def test_positive_perturbation_bound(self):
        tuples = ["one two three four five six seven eight nine ten"] * 3
        left, right, labels = generate_synthetic_training_data(tuples)
        for l, r, y in zip(left, right, labels):
            if y == 1:
                lt, rt = l.split(), r.split()
                assert len(rt) >= len(lt) - int(len(lt) * 0.4)
                # perturbed tokens are a subsequence of the original
                it = iter(lt)
                assert all(t in it for t in rt)

    def test_negatives_from_corpus(self):
        tuples = [f"tuple number {i}" for i in range(8)]
        _left, right, labels = generate_synthetic_training_data(tuples)
        for r, y in zip(right, labels):
            if y == 0:
                assert r in tuples

    def test_deterministic(self):
        tuples = [f"alpha bravo {i}" for i in range(5)]
        a = generate_synthetic_training_data(tuples)
        b = generate_synthetic_training_data(tuples)
        assert a == b


class TestDeepEmbedders:
    def _tuples_ds(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.fixtures import synth_transcripts
        from deepblocker_ray.stages.canonicalize import canonicalize

        df, _ = synth_transcripts(n_base=40, seed=5)
        cfg = EngineConfig(
            emb_dim=24, ae_dim=8, num_epochs=5, embed_batch_size=64, num_buckets=4
        )
        return canonicalize(rd.from_pandas(df), cfg), cfg

    def test_autoencoder_embedder(self, ray_session):
        from deepblocker_ray.stages.deep_embed import AutoEncoderEmbedder

        tuples, cfg = self._tuples_ds(ray_session)
        tuples = tuples.materialize()
        emb = AutoEncoderEmbedder(cfg).fit(tuples).transform(tuples)
        pdf = emb.to_pandas()
        assert len(pdf) == tuples.count()
        assert all(len(e) == cfg.ae_dim for e in pdf["emb"])

    def test_ctt_quirk_returns_aggregator(self, ray_session):
        from deepblocker_ray.stages.deep_embed import CTTEmbedder
        from deepblocker_ray.stages.embed import SIFEmbedder

        tuples, cfg = self._tuples_ds(ray_session)
        tuples = tuples.materialize()
        ctt = CTTEmbedder(cfg, apply_summarizer=False).fit(tuples)
        got = (
            ctt.transform(tuples).to_pandas().sort_values("conv_id")
        )
        sif = SIFEmbedder(cfg).fit(tuples)
        want = sif.transform(tuples).to_pandas().sort_values("conv_id")
        # reference-released behavior: CTT inference output == aggregator output
        for g, w in zip(got["emb"], want["emb"]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-6
            )

    def test_ctt_summarizer_path(self, ray_session):
        from deepblocker_ray.stages.deep_embed import CTTEmbedder

        tuples, cfg = self._tuples_ds(ray_session)
        tuples = tuples.materialize()
        ctt = CTTEmbedder(cfg, apply_summarizer=True).fit(tuples)
        pdf = ctt.transform(tuples).to_pandas()
        assert all(len(e) == cfg.ae_dim for e in pdf["emb"])
        assert ctt.output_dim == cfg.ae_dim

    def test_hybrid_dims(self, ray_session):
        """The reference Hybrid defect (300-d trainer on 150-d AE output)
        must not reproduce: fit succeeds with consistent dims."""
        from deepblocker_ray.stages.deep_embed import HybridEmbedder

        tuples, cfg = self._tuples_ds(ray_session)
        tuples = tuples.materialize()
        hyb = HybridEmbedder(cfg).fit(tuples)
        pdf = hyb.transform(tuples).to_pandas()
        assert all(len(e) == cfg.ae_dim for e in pdf["emb"])
