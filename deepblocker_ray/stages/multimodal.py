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
import re

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
    magic = {
        "image": b"\x89PNG\r\n\x1a\n",
        "audio": b"RIFF\x24\x00\x00\x00WAVE",
        "video": b"\x00\x00\x00\x18ftypmp42",
    }
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
        rows["media_id"].append(f"m-{i:05d}")
        rows["kind"].append(kind)
        # realistic container headers so magic sniffing has something to
        # detect; every 7th row is deliberately headerless (corrupt/mislabeled)
        head = b"" if i % 7 == 0 else magic[kind]
        rows["payload"].append(head + payload.tobytes())
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(16, 256)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 256)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 10_000)) if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


# media_from_documents: every byte of the payload is reproducible in SQL.
# The magic prefixes are ASCII-only (GIF8/RIFF/ftyp — PNG/JPEG sigs contain
# bytes that can never begin valid UTF-8, so they cannot occur here) and the
# text is sanitized to printable ASCII, which makes DuckDB's character-based
# substr/strlen/md5 coincide exactly with the engine's byte semantics.
_ASCII_RE = re.compile(r"[^\x20-\x7e]")
_DERIVED_KINDS = ["image", "audio", "video"]
_DERIVED_MIME = {"image": "image/gif", "audio": "audio/wav", "video": "video/mp4"}
_DERIVED_MAGIC = {"image": b"GIF89a", "audio": b"RIFF", "video": b"0000ftyp"}


def media_from_documents(ds):
    """Deterministic media table derived from a ``documents``-shaped dataset
    (doc_id, text): kind cycles image/audio/video on ``doc_id % 3``, payload
    is an ASCII container magic + the ASCII-sanitized text, and every 7th row
    (``doc_id % 7 == 0``) is deliberately headerless so magic sniffing sees
    corrupt/mislabeled rows. Unlike ``synth_media_table`` (random bytes, for
    plumbing tests), this derivation has an exact DuckDB twin — see
    ``__ray_entry__.oracle_sql()['media_features']`` — so n_bytes / sniffed
    mime / mismatch flag / md5 are all hash-checkable end-to-end."""

    def derive(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id"))
        texts = batch.column("text").to_pylist()
        kinds = [_DERIVED_KINDS[int(d) % 3] for d in doc_ids]
        payloads = []
        for d, k, t in zip(doc_ids, kinds, texts):
            head = b"" if int(d) % 7 == 0 else _DERIVED_MAGIC[k]
            payloads.append(head + _ASCII_RE.sub("", t or "").encode("ascii"))
        return pa.table(
            {
                "media_id": pa.array(
                    [f"m-{int(d)}" for d in doc_ids], pa.string()
                ),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array([_DERIVED_MIME[k] for k in kinds], pa.string()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


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


# (mime, signature bytes, offset) — container formats detectable from the
# payload header alone, no codec library needed
_MAGIC = [
    ("image/png", b"\x89PNG\r\n\x1a\n", 0),
    ("image/jpeg", b"\xff\xd8\xff", 0),
    ("image/gif", b"GIF8", 0),
    ("audio/wav", b"RIFF", 0),
    ("video/mp4", b"ftyp", 4),
]


def media_stats(ds, cfg: EngineConfig | None = None):
    """REAL (codec-free) binary analysis of media payloads — the filters a
    training-data pipeline runs before any decode: payload size, byte
    entropy (bits/byte; flags truncated/constant/corrupt files), mean byte
    value, container sniffing from magic bytes (mismatch vs the declared
    mime flags mislabeled rows), and content md5. Fully vectorized: one
    concatenated buffer, per-row histograms via a single bincount.
    Output: (media_id, kind, n_bytes, entropy_bits, mean_byte,
    sniffed_mime, mime_matches, md5)."""
    import hashlib as _hashlib

    def stats(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        n = len(payloads)
        lens = np.fromiter((len(p or b"") for p in payloads), np.int64, n)
        total = int(lens.sum())
        ent = np.zeros(n, np.float64)
        meanb = np.zeros(n, np.float64)
        if total:
            cat = np.frombuffer(b"".join(p or b"" for p in payloads), np.uint8)
            doc = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = np.bincount(
                doc * 256 + cat, minlength=n * 256
            ).reshape(n, 256)
            nz = lens > 0
            p = hist[nz] / lens[nz, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                logp = np.where(p > 0, np.log2(p, where=p > 0), 0.0)
            ent[nz] = -(p * logp).sum(axis=1)
            meanb[nz] = (hist[nz] @ np.arange(256)) / lens[nz]
        sniffed, matches, md5s = [], [], []
        for pay, mime in zip(payloads, mimes):
            pay = pay or b""
            found = "application/octet-stream"
            for m, sig, off in _MAGIC:
                if pay[off : off + len(sig)] == sig:
                    found = m
                    break
            sniffed.append(found)
            matches.append(found == mime)
            md5s.append(_hashlib.md5(pay).hexdigest())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array(lens),
                "entropy_bits": pa.array(np.round(ent, 6)),
                "mean_byte": pa.array(np.round(meanb, 6)),
                "sniffed_mime": pa.array(sniffed, pa.string()),
                "mime_matches": pa.array(matches),
                "md5": pa.array(md5s, pa.string()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=256)


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


# ----------------------------------------------------- resize / frame-sample --


def _resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, C) array — REAL kernel (no
    codec needed once pixels exist): standard pixel-center index mapping
    src = floor((dst + 0.5) · in/out), fully vectorized via index grids."""
    in_h, in_w = img.shape[:2]
    rows = np.minimum(
        ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1
    )
    cols = np.minimum(
        ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64), in_w - 1
    )
    return img[rows[:, None], cols[None, :]]


def _frame_indices(n_frames: int, n_sample: int) -> np.ndarray:
    """Uniform frame-sampling rule — REAL kernel: pixel-center positions
    floor((i + 0.5) · T / n) over the clip, deduplicated in order (short
    clips yield fewer than n_sample frames rather than repeats)."""
    n_sample = max(1, min(n_sample, n_frames))
    idx = ((np.arange(n_sample) + 0.5) * n_frames / n_sample).astype(np.int64)
    idx = np.minimum(idx, n_frames - 1)
    keep = np.ones(len(idx), bool)
    keep[1:] = idx[1:] != idx[:-1]
    return idx[keep]


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-decode: payload hash → (h, w, 3) uint8 pixels.
    Stands in for the absent image codec so the resize plumbing and the real
    resample kernel run end-to-end."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little"))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class MediaResize:
    """Actor-pool stage: image payload → fixed-size RGB raster.

    Decode is the stubbed step (``fake_decode=False`` raises
    NotImplementedError; True pseudo-decodes deterministically at the row's
    declared width/height); the nearest-neighbor resample itself is a real,
    exactly-tested kernel. Output rows carry the raw RGB buffer
    (out_h × out_w × 3 bytes) plus the new dimensions."""

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 fake_decode: bool = True):
        self.out_h = out_h
        self.out_w = out_w
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode and len(batch):
            raise NotImplementedError(
                "real image decoding requires codec libraries not present "
                "in this environment; construct with fake_decode=True for "
                "the deterministic test kernel"
            )
        outs = []
        for payload, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            img = _fake_pixels(payload, max(int(h or 1), 1), max(int(w or 1), 1))
            outs.append(_resize_nn(img, self.out_h, self.out_w).tobytes())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array([self.out_h] * len(batch), pa.int32()),
                "width": pa.array([self.out_w] * len(batch), pa.int32()),
                "pixels": pa.array(outs, pa.binary()),
            }
        )


class MediaFrameSample:
    """Actor-pool stage: video payload → one row per sampled frame
    (media_id, frame_idx, n_frames, frame). The uniform-sampling rule is a
    real, exactly-tested kernel; the per-frame decode is the stubbed step
    (fake: clip length from duration_ms at a nominal fps, frames
    pseudo-decoded per index)."""

    def __init__(self, n_sample: int = 4, fps: float = 1.0,
                 frame_h: int = 16, frame_w: int = 16,
                 fake_decode: bool = True):
        self.n_sample = n_sample
        self.fps = fps
        self.frame_h = frame_h
        self.frame_w = frame_w
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode and len(batch):
            raise NotImplementedError(
                "real video decoding requires codec libraries not present "
                "in this environment; construct with fake_decode=True for "
                "the deterministic test kernel"
            )
        ids, fidx, totals, frames = [], [], [], []
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            n_frames = max(1, int(round((dur or 1000) / 1000.0 * self.fps)))
            for i in _frame_indices(n_frames, self.n_sample):
                ids.append(mid)
                fidx.append(int(i))
                totals.append(n_frames)
                frames.append(
                    _fake_pixels(
                        payload + i.tobytes(), self.frame_h, self.frame_w
                    ).tobytes()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "n_frames": pa.array(totals, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def resize_media(ds, cfg: EngineConfig | None = None, out_h: int = 32,
                 out_w: int = 32, fake_decode: bool = True):
    """Image payloads are heavy → small batches, actor pool (state: none
    today, a decoder context once real codecs exist)."""
    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs=dict(
            out_h=out_h, out_w=out_w, fake_decode=fake_decode
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=actor_pool_size(None),
    )


def sample_media_frames(ds, cfg: EngineConfig | None = None,
                        n_sample: int = 4, fps: float = 1.0,
                        fake_decode: bool = True):
    """Row-expanding stage (≤ n_sample output rows per video): even smaller
    batches since each input row fans out into multiple frame buffers."""
    return ds.map_batches(
        MediaFrameSample,
        fn_constructor_kwargs=dict(
            n_sample=n_sample, fps=fps, fake_decode=fake_decode
        ),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=actor_pool_size(None),
    )


def media_block_overlap(media_ds, cfg=None, *, block: int = 32,
                        min_shared: int = 2, df_cap: int = 50,
                        id_col: str = "media_id",
                        payload_col: str = "payload"):
    """Partial-duplicate detection for BINARY payloads — the fixed-block
    complement to text shingling (codecs unavailable, bytes are the
    truth): media pairs sharing ≥ ``min_shared`` distinct ``block``-byte
    ALIGNED blocks (block j = payload[j·B : (j+1)·B], full blocks only —
    the dedup signal for re-containerized / header-swapped copies whose
    bodies align). Blocks with document frequency > ``df_cap`` are
    purged (container boilerplate; the block-purging rule). Output
    (left_id, right_id, n_shared_blocks:int64), left < right as strings.

    Scale shape: one vectorized pass hashes every aligned block (gather
    + one uint64 polynomial matmul per batch, no per-media loop); ONE
    hash(block) exchange fans ≤ C(df_cap, 2) pairs per block with
    per-bucket pre-reduce; ONE hash(pair) exchange sums and applies the
    threshold.

    Collision caveat: blocks are matched by their 64-bit polynomial hash,
    not byte equality (raw blocks never ride the exchange), so two
    distinct blocks colliding under the hash would inflate
    n_shared_blocks vs the byte-equality contract the SQL twin checks.
    At 64 bits the expected collision count stays < 1 below ~5·10⁹
    distinct blocks per run (birthday bound); callers needing strict
    byte equality at larger scale should verify shared blocks by
    payload-slice comparison on the emitted pairs."""
    import pandas as pd

    from .canonicalize import bucket_of
    from .dedup import _POLY

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    if block < 1:
        raise ValueError(f"block must be >= 1, got {block}")
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")

    pows = np.empty(block, np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, block):
            pows[i] = pows[i - 1] * _POLY
    rev_pows = pows[::-1].copy()

    def emit(t: pa.Table) -> pd.DataFrame:
        payloads = t.column(payload_col).to_pylist()
        ids = t.column(id_col).to_pandas().astype(str)
        bufs = [p or b"" for p in payloads]
        nblk = np.fromiter(
            (len(b) // block for b in bufs), np.int64, len(bufs)
        )
        total = int(nblk.sum())
        if total == 0:
            return pd.DataFrame(
                {"h": pd.Series(dtype=np.uint64),
                 "doc": pd.Series(dtype=object),
                 "_bucket": pd.Series(dtype=np.int32)}
            )
        cat = np.frombuffer(b"".join(bufs), np.uint8)
        media_starts = np.concatenate(
            ([0], np.cumsum([len(b) for b in bufs])[:-1])
        ).astype(np.int64)
        # start offset of every full block: per media j·B + its start
        first = np.concatenate(
            ([0], np.cumsum(nblk)[:-1])
        )
        j = np.arange(total, dtype=np.int64) - np.repeat(first, nblk)
        starts = np.repeat(media_starts, nblk) + j * block
        with np.errstate(over="ignore"):
            mat = cat[starts[:, None] + np.arange(block)]
            h = (mat.astype(np.uint64) * rev_pows[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        df = pd.DataFrame(
            {
                "h": h,
                "doc": np.repeat(ids.to_numpy(object), nblk),
            }
        ).drop_duplicates()
        df["_bucket"] = (
            df["h"].to_numpy(np.uint64) % np.uint64(nb)
        ).astype(np.int32)
        return df

    def fan_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["h", "doc"]).sort_values(
            ["h", "doc"], kind="mergesort"
        )
        h = g["h"].to_numpy(np.uint64)
        doc = g["doc"].to_numpy(object)
        starts = np.nonzero(
            np.concatenate(([True], h[1:] != h[:-1]))
        )[0]
        cnt = np.diff(np.concatenate((starts, [len(h)])))
        ok = (cnt >= 2) & (cnt <= df_cap)
        row_in_run = np.arange(len(h), dtype=np.int64) - np.repeat(
            starts, cnt
        )
        reps = np.where(
            np.repeat(ok, cnt), np.repeat(cnt, cnt) - row_in_run - 1, 0
        )
        if int(reps.sum()) == 0:
            return pd.DataFrame(
                {"l": pd.Series(dtype=object),
                 "r": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64),
                 "_pb": pd.Series(dtype=np.int32)}
            )
        i_idx = np.repeat(np.arange(len(h), dtype=np.int64), reps)
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        j_idx = i_idx + 1 + off
        p = (
            pd.DataFrame({"l": doc[i_idx], "r": doc[j_idx]})
            .groupby(["l", "r"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        p["_pb"] = bucket_of(
            p["l"].astype(str) + "|" + p["r"].astype(str), nb
        )
        return p

    def fold(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["l", "r"], sort=False)["n"].sum().reset_index()
        s = s[s["n"] >= min_shared]
        return pa.table(
            {
                "left_id": pa.array(s["l"].to_numpy(object), pa.string()),
                "right_id": pa.array(s["r"].to_numpy(object),
                                     pa.string()),
                "n_shared_blocks": pa.array(s["n"].to_numpy(np.int64)),
            }
        )

    return (
        media_ds.map_batches(emit, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fan_pairs, batch_format="pandas")
        .groupby("_pb")
        .map_groups(fold, batch_format="pandas")
    )
