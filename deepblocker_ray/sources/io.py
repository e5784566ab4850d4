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
