"""Multimodal column plumbing (training-data-pipeline ops).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata.
The decode/resize/frame-sample kernels need codec libraries that are NOT in
this container, so the kernels are stubbed two ways — a clearly-marked
NotImplementedError for real decoding and a deterministic fake
(``fake_decode=True``) that exercises the real Ray-side plumbing: schema,
actor-pool signature, batch sizing (binary payloads → small batches), output
layout. Swapping in PIL/ffmpeg later only replaces the kernel body.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, actor_pool_size

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic fake media rows (binary payloads) for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
        rows["media_id"].append(f"m-{i:05d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload.tobytes())
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(16, 256)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 256)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 10_000)) if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtract:
    """Actor-pool stage: binary payload → fixed-dim feature vector.

    Real decoding (PIL / soundfile / ffmpeg) is unavailable in this
    container: ``fake_decode=False`` raises NotImplementedError at the first
    batch; ``fake_decode=True`` derives a deterministic pseudo-feature from
    the payload hash so the distributed plumbing is fully exercised.
    """

    def __init__(self, feat_dim: int = 32, fake_decode: bool = True):
        self.feat_dim = feat_dim
        self.fake_decode = fake_decode

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake_decode:
            raise NotImplementedError(
                "real media decoding requires codec libraries not present in "
                "this environment; construct with fake_decode=True for the "
                "deterministic test kernel"
            )
        digest = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(digest, "little"))
        return rng.standard_normal(self.feat_dim, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .embed import numpy_to_emb

        feats = np.stack(
            [
                self._decode(p, k)
                for p, k in zip(
                    batch.column("payload").to_pylist(),
                    batch.column("kind").to_pylist(),
                )
            ]
        ) if len(batch) else np.zeros((0, self.feat_dim), np.float32)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": numpy_to_emb(feats),
            }
        )


def extract_media_features(
    ds, cfg: EngineConfig | None = None, feat_dim: int = 32, fake_decode: bool = True
):
    """Binary payloads are heavy → small batches (64) so batch × concurrency
    stays inside a worker heap even for multi-MB media rows."""
    cfg = cfg or EngineConfig()
    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs=dict(feat_dim=feat_dim, fake_decode=fake_decode),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=actor_pool_size(None),
    )
