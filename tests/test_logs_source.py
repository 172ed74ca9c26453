"""Raw battle-log tree ingestion (S2 front-end): the reference reads
<root>/<format>/<day>/*.log.json(.gz) directly (logs/src/storage.ts:33-56,
fs.ts:70-78); read_logs_tree must produce rows identical to the Parquet
tokens path on the same documents."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def log_tree(ray_session, small_corpus, tmp_path_factory):
    """The small corpus re-materialized as a raw log tree (every 3rd file
    gzipped to exercise the transparent-gunzip path)."""
    import ray.data

    from stats_ray.sources.logs import write_log_tree

    root = str(tmp_path_factory.mktemp("logtree"))
    battles = ray.data.read_parquet(f"{small_corpus}/battles")
    n = write_log_tree(battles, root, gz_every=3)
    assert n == battles.count()
    return root


def _key_frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["tokens"] = df["tokens"].map(lambda a: bytes(list(a)))
    return (df.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "tokens", "n_tok", "source"]])


def test_logs_tree_matches_parquet_path(ray_session, small_corpus, log_tree):
    import ray.data

    from stats_ray.sources.logs import read_logs_tree

    raw = _key_frame(read_logs_tree(log_tree))
    pq = _key_frame(ray.data.read_parquet(f"{small_corpus}/battles"))
    pd.testing.assert_frame_equal(raw, pq)


def test_logs_tree_day_range_and_format_select(ray_session, log_tree):
    import os

    from stats_ray.sources.logs import list_log_tree, read_logs_tree

    fmts = sorted(os.listdir(log_tree))
    days = sorted(os.listdir(os.path.join(log_tree, fmts[0])))
    assert len(days) >= 3
    begin, end = days[1], days[-2]
    ds = read_logs_tree(log_tree, begin=begin, end=end, formats=[fmts[0]])
    df = ds.to_pandas()
    got_days = sorted({s.split("/", 1)[1] for s in df["source"]})
    # inclusive on both ends (storage.ts:45-47), format allowlist applied
    assert got_days[0] >= begin and got_days[-1] <= end
    assert {s.split("/", 1)[0] for s in df["source"]} == {fmts[0]}
    assert len(df) == len(list_log_tree(log_tree, begin=begin, end=end,
                                        formats=[fmts[0]]))
    # a repeated format in the allowlist must not double-ingest its files
    assert list_log_tree(log_tree, formats=[fmts[0], fmts[0]]) == \
        list_log_tree(log_tree, formats=[fmts[0]])
    # empty range yields a typed empty dataset, not an error
    empty = read_logs_tree(log_tree, begin="2099-01-01")
    assert empty.count() == 0
    assert [f.name for f in empty.schema().base_schema] == \
        ["doc_id", "tokens", "n_tok", "source"]


def test_parse_pipeline_consumes_raw_logs(ray_session, small_corpus,
                                          log_tree, tmp_path):
    """End-to-end: the flagship parse runs on raw-ingested rows and its
    per-format battle counts equal the Parquet path's."""
    import ray.data

    from stats_ray.pipelines import usage as pl
    from stats_ray.sources.logs import read_logs_tree

    staged = str(tmp_path / "staged")
    read_logs_tree(log_tree).write_parquet(f"{staged}/battles")
    a = (pl.parse_pipeline(staged).to_pandas()
         .groupby("format").size().sort_index())
    b = (pl.parse_pipeline(small_corpus).to_pandas()
         .groupby("format").size().sort_index())
    pd.testing.assert_series_equal(a, b)


def test_list_log_tree_numeric_collation(tmp_path):
    """O8: file listing uses numeric collation (storage.ts CMP) — the
    battle number sorts as an integer, not a string."""
    import gzip
    import os

    from stats_ray.sources.logs import list_log_tree

    d = tmp_path / "gen9ou" / "2026-07-01"
    os.makedirs(d)
    for n in (10, 2, 1):
        (d / f"battle-gen9ou-{n}.log.json").write_text("{}")
    with open(d / "battle-gen9ou-3.log.json.gz", "wb") as f:
        f.write(gzip.compress(b"{}"))
    names = [os.path.basename(p) for p in list_log_tree(str(tmp_path))]
    assert names == ["battle-gen9ou-1.log.json", "battle-gen9ou-2.log.json",
                     "battle-gen9ou-3.log.json.gz",
                     "battle-gen9ou-10.log.json"]


def test_tree_fingerprint_tracks_arrivals(tmp_path):
    """The ingest marker keys on a content fingerprint: a file ARRIVING
    inside an already-ingested range must change the fingerprint (else
    re-runs skip the ingest and the new battles are excluded forever);
    an unchanged tree must fingerprint identically across calls."""
    import os

    from stats_ray.sources.logs import tree_fingerprint

    d = tmp_path / "gen9ou" / "2026-07-01"
    os.makedirs(d)
    (d / "battle-gen9ou-1.log.json").write_text("{}")
    fp1 = tree_fingerprint(str(tmp_path))
    assert fp1 == tree_fingerprint(str(tmp_path))  # stable
    (d / "battle-gen9ou-2.log.json").write_text("{}")
    fp2 = tree_fingerprint(str(tmp_path))
    assert fp2 != fp1  # arrival detected
    # selection-scoped: a file outside the day range doesn't perturb it
    fp_r = tree_fingerprint(str(tmp_path), end="2026-06-30")
    (d / "battle-gen9ou-3.log.json").write_text("{}")
    assert tree_fingerprint(str(tmp_path), end="2026-06-30") == fp_r


@pytest.mark.slow
def test_cli_stats_from_logs_idempotent(log_tree, tmp_path):
    """Re-running stats --from-logs must not duplicate ingested battles
    (write_parquet appends files; the ingest is marker-gated)."""
    import glob
    import json
    import subprocess
    import sys

    out = str(tmp_path / "flag")
    cmd = [sys.executable, "-m", "stats_ray.cli", "stats",
           "--corpus", log_tree, "--out", out, "--from-logs",
           "--families", "battles"]
    runs = []
    for _ in range(2):
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        runs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    assert runs[0] == runs[1]
    n_files = len(glob.glob(f"{out}/ingested/battles/**/*.parquet",
                            recursive=True))
    import pandas as pd
    total = sum(len(pd.read_parquet(p)) for p in glob.glob(
        f"{out}/ingested/battles/**/*.parquet", recursive=True))
    assert total == 400  # the 400-battle corpus, exactly once
    assert n_files > 0
