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
