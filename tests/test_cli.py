"""CLI smoke: `python -m deepblocker_ray` runs end-to-end in a fresh
process, writes partitioned parquet + metrics.json."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, tmp):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", "deepblocker_ray", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


@pytest.mark.slow
def test_cli_dedup_and_link(tmp_path):
    # docs with one exact duplicate pair
    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [f"unique document text number {i} alpha beta" for i in range(29)]
            + ["unique document text number 0 alpha beta"],
        }
    )
    docs_path = tmp_path / "docs.parquet"
    docs.to_parquet(docs_path)
    out1 = tmp_path / "out_dedup"
    r = _run(
        ["dedup", "--input", str(docs_path), "--method", "minhash",
         "--out", str(out1)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(out1 / "metrics.json"))
    assert metrics["rows"] == 30
    assert "skew_stats" in metrics
    assert os.path.isdir(out1 / "dedup")

    from deepblocker_ray.fixtures import synth_transcripts

    df, _ = synth_transcripts(n_base=40, seed=3, dup_fraction=0.3)
    tr_path = tmp_path / "transcripts.parquet"
    df.to_parquet(tr_path)
    out2 = tmp_path / "out_link"
    r = _run(
        ["link", "--input", str(tr_path), "--k", "4", "--out", str(out2)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(out2 / "metrics.json"))
    assert metrics["clusters"] > 0
    assert os.path.isdir(out2 / "clusters")


@pytest.mark.slow
def test_cli_link_delta(tmp_path):
    """link --delta absorbs a second batch incrementally: the clusters
    output covers BOTH batches' conversations."""
    from deepblocker_ray.fixtures import synth_transcripts

    df, _ = synth_transcripts(n_base=40, seed=5, dup_fraction=0.3)
    convs = sorted(df["conv_id"].unique())
    delta_set = set(convs[::4])
    base_path = tmp_path / "base.parquet"
    delta_path = tmp_path / "delta.parquet"
    df[~df["conv_id"].isin(delta_set)].to_parquet(base_path)
    df[df["conv_id"].isin(delta_set)].to_parquet(delta_path)

    out = tmp_path / "out_delta"
    r = _run(
        ["link", "--input", str(base_path), "--delta", str(delta_path),
         "--k", "4", "--out", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.load(open(out / "metrics.json"))
    assert metrics["clusters"] == len(convs)


@pytest.mark.slow
def test_cli_curate(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": [
                f"The quick brown fox number {i} jumps over the lazy dog "
                "and it is a fine day" for i in range(19)
            ]
            + ["  The QUICK brown fox number 0 jumps over the lazy dog "
               "and it is a fine day  "],  # dup of 0 after normalize
        }
    )
    docs_path = tmp_path / "docs.parquet"
    docs.to_parquet(docs_path)
    out = tmp_path / "out_curate"
    r = _run(
        ["curate", "--input", str(docs_path), "--tokens-per-seq", "16",
         "--out", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["rows"] == 19  # 20 docs − 1 normalized duplicate


@pytest.mark.slow
def test_cli_profile(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": ["dup text"] * 3 + [f"text {i}" for i in range(7)],
            "lang": ["en"] * 9 + [None],
        }
    )
    p = tmp_path / "docs.parquet"
    docs.to_parquet(p)
    out = tmp_path / "out_profile"
    r = _run(
        ["profile", "--input", str(p), "--cols", "text,lang",
         "--text-col", "text", "--out", str(out)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["columns"] == 2
    prof = pd.read_parquet(out / "columns").set_index("column")
    assert prof.loc["lang", "n_nulls"] == 1
    assert prof.loc["text", "n_distinct"] == 8
    hist = pd.read_parquet(out / "dup_histogram")
    assert dict(zip(hist["cluster_size"], hist["n_clusters"])) == {1: 7, 3: 1}
