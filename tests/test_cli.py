"""CLI surface: subcommands run end-to-end in a subprocess (own Ray session)."""

import json
import subprocess
import sys

import pytest


def _run(args, timeout=300):
    r = subprocess.run([sys.executable, "-m", "stats_ray.cli", *args],
                       capture_output=True, text=True, timeout=timeout,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_stats_and_reports(small_corpus, tmp_path):
    out = _run(["stats", "--corpus", small_corpus,
                "--out", str(tmp_path / "flag"),
                "--families", "usage,battles"])
    assert out["usage"] > 0 and out["battles"] > 0

    rep = _run(["reports", "--corpus", small_corpus,
                "--out", str(tmp_path / "rep"), "--formats", "gen9ou"])
    assert len(rep) == 4


@pytest.mark.slow
def test_cli_db_and_anon(small_corpus, tmp_path):
    db = _run(["db", "--corpus", small_corpus, "--out", str(tmp_path / "db")])
    assert db["rows"] > 0
    an = _run(["anon", "--corpus", small_corpus,
               "--out", str(tmp_path / "anon"), "--rate", "0.5"])
    assert 0 < an["rows"] < 400


def test_cli_quarantine(ray_session, small_corpus, tmp_path):
    import pandas as pd

    from stats_ray.cli import main
    out = str(tmp_path / "q")
    main(["quarantine", "--corpus", small_corpus, "--out", out])
    import glob
    assert glob.glob(f"{out}/parsed/**/*.parquet", recursive=True)
    err = pd.read_parquet(f"{out}/errors/errors.parquet")
    assert list(err.columns) == ["doc_id", "source", "parse_error"]
    assert len(err) == 0  # clean synth corpus has no malformed battles


def test_curate_resumable(ray_session, tmp_path):
    """curate writes clean + shard-partitioned packed output; a rerun skips
    both completed stages (manifest hit, identical counts)."""
    import json
    import os

    from stats_ray.pipelines.curate import run_curation
    out = str(tmp_path / "curated")
    c1 = run_curation("/root/testdata/sf0.001", out, n_shards=4)
    assert c1["packed"] > 0 and c1["clean"] >= c1["packed"]
    shards = [d for d in os.listdir(os.path.join(out, "packed"))
              if d.startswith("shard=")]
    assert 1 <= len(shards) <= 4
    with open(os.path.join(out, "manifest.jsonl")) as f:
        n_entries = len(f.read().strip().splitlines())
    c2 = run_curation("/root/testdata/sf0.001", out, n_shards=4)  # resume
    assert c2 == c1
    with open(os.path.join(out, "manifest.jsonl")) as f:
        assert len(f.read().strip().splitlines()) == n_entries  # no rework


@pytest.mark.slow
def test_cli_db_analyses(small_corpus, tmp_path):
    """db-cutoff / db-sizes / db-display run end-to-end over a written db."""
    db_dir = str(tmp_path / "db")
    _run(["db", "--corpus", small_corpus, "--out", db_dir])

    cut = _run(["db-cutoff", "--db", db_dir, "--percentile", "0.9"])
    assert cut and all(r["n_ratings"] > 0 for r in cut)

    sizes = _run(["db-sizes", "--db", db_dir])
    assert len(sizes) % 101 == 0                  # 0..100% per format

    disp = _run(["db-display", "--db", db_dir, "--moves", "3"])
    fmt = next(iter(disp))
    sp = next(iter(disp[fmt]))
    assert {"usage", "lead", "moves", "items"} <= set(disp[fmt][sp])
