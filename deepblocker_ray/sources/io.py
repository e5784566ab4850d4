"""Sources / sinks (S1-S2).

Reference: pd.read_csv whole-table loads (main.py:14-15) and a single CSV
writer (blocking_utils.py:51). Here: parquet-first with column pruning at the
read; CSV kept for DeepMatcher-format conformance fixtures; writes are
partitioned parquet directories (resumable output, never one giant file).
"""

from __future__ import annotations

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str, columns: list[str] | None = None):
    """Read a transcript parquet table, pruning to the needed columns.
    The canonicalize stage needs everything except ts by default."""
    import ray.data as rd

    cols = columns or [c for c in TRANSCRIPT_COLUMNS if c != "ts"]
    return rd.read_parquet(path, columns=cols)


def read_table(path: str, columns: list[str] | None = None):
    import ray.data as rd

    if path.endswith(".csv"):
        ds = rd.read_csv(path)
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns)


def write_partitioned(ds, path: str, min_rows_per_file: int = 500_000) -> None:
    """Partitioned parquet sink — one directory of part files."""
    ds.write_parquet(path, min_rows_per_file=min_rows_per_file)


def process_match_files(folder_root: str, out_path: str | None = None):
    """blocking_utils.process_files (/root/reference/blocking_utils.py:40-51)
    rebuilt: read train/valid/test (csv or parquet), keep label==1, union,
    project (ltable_id, rtable_id), optionally write matches parquet.
    NB the reference's comment says it 'filters the duplicates' but the code
    only filters label==1 — we reproduce the code, not the comment."""
    import os

    parts = []
    for name in ["train", "valid", "test"]:
        for ext in [".parquet", ".csv"]:
            p = os.path.join(folder_root, name + ext)
            if os.path.exists(p):
                parts.append(read_table(p))
                break
    if not parts:
        raise FileNotFoundError(f"no train/valid/test files in {folder_root}")
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    out = ds.filter(expr="label == 1").select_columns(["ltable_id", "rtable_id"])
    if out_path:
        out.write_parquet(out_path)
    return out


def union_by_name(a, b):
    """Schema-aligning union — ingest heterogeneous shards (an evolving
    schema across crawl generations) into one stream: columns are matched
    BY NAME, a column missing on one side is typed NULL there, and the
    output column order is sorted by name (deterministic regardless of
    argument order). Same-name columns with different Arrow types raise —
    silent casts are how mixed-shard corpora corrupt.

    Pure map-side alignment (one projection per batch, typed-null arrays
    are O(1) Arrow buffers) + Ray's zero-copy union — no shuffle, both
    inputs keep streaming.
    """
    import pyarrow as pa

    types: dict[str, pa.DataType] = {}
    for s in (a.schema(), b.schema()):
        for n, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):  # pandas-block schema
                import numpy as np

                t = (
                    pa.string()  # object columns hold strings (house rule)
                    if np.dtype(t) == np.dtype(object)
                    else pa.from_numpy_dtype(np.dtype(t))
                )
            if n in types and types[n] != t:
                raise ValueError(
                    f"union_by_name: column {n!r} has conflicting types "
                    f"{types[n]} vs {t}"
                )
            types.setdefault(n, t)
    names = sorted(types)

    def align(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                n: (
                    t.column(n)
                    if n in t.column_names
                    else pa.nulls(len(t), types[n])
                )
                for n in names
            }
        )

    return a.map_batches(align, batch_format="pyarrow").union(
        b.map_batches(align, batch_format="pyarrow")
    )


def read_jsonl(path: str, columns: list[str] | None = None):
    """JSONL source: newline-delimited JSON records → Dataset, optionally
    pruned to ``columns`` right after parse (Arrow's JSON reader parses
    whole lines, so projection happens at the first map, not the read —
    at 100 TB prefer parquet; this exists for ingest conformance with
    crawl/export dumps)."""
    import ray.data as rd

    ds = rd.read_json(path)
    return ds.select_columns(columns) if columns else ds


def write_jsonl(ds, path: str, min_rows_per_file: int = 500_000) -> None:
    """Partitioned JSONL sink — one directory of .json part files
    (resumable, never one giant file), mirroring ``write_partitioned``."""
    ds.write_json(path, min_rows_per_file=min_rows_per_file)
