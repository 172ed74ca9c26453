"""Binary codec (M11/S9), checkpoint manifest (S4), monotype shards,
rating percentile (A15)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def parsed(small_corpus):
    from stats_ray.pipelines import usage as pl
    return pl.parse_pipeline(small_corpus).materialize()


def test_binary_roundtrip(parsed):
    from stats_ray.stages.binary import DecodeBinary, EncodeBinary, ROW_SIZE
    t = parsed.limit(50).take_batch(50, batch_format="pyarrow")
    import pyarrow as pa
    tab = pa.table(t)
    enc = EncodeBinary()(tab)
    assert all(len(r) == ROW_SIZE for r in enc["row"].to_pylist())
    dec = DecodeBinary()(enc)
    assert dec["turns"].to_pylist() == tab["turns"].to_pylist()
    assert dec["winner"].to_pylist() == tab["winner"].to_pylist()
    assert dec["ts_ms"].to_pylist() == tab["ts_ms"].to_pylist()
    assert dec["end_type"].to_pylist() == tab["end_type"].to_pylist()
    # species survive the ordinal roundtrip
    slots = tab["slots"].combine_chunks()
    for i in range(10):
        mons = {f"mon{(s['side'] - 1) * 6 + s['slot']}": s["species"]
                for s in slots[i].as_py()}
        for j in range(12):
            got = dec[f"mon{j}"][i].as_py()
            assert got == mons.get(f"mon{j}", "empty")


def test_binary_db_sorted(parsed, tmp_path):
    """O5: the db layout is range-queryable — every file internally sorted
    by (format, ts_ms) and file ranges disjoint (a global sort's blocks)."""
    import glob

    import pyarrow.parquet as pq
    from stats_ray.stages.binary import binary_db
    out = str(tmp_path / "db")
    binary_db(parsed, out)
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert files
    total = 0
    ranges = []
    for f in files:
        df = pq.read_table(f, columns=["format", "ts_ms"]).to_pandas()
        total += len(df)
        key = list(zip(df["format"], df["ts_ms"]))
        assert key == sorted(key)
        ranges.append((key[0], key[-1]))
    assert total == parsed.count()
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint, contiguous key ranges


def test_manifest_resume(tmp_path):
    from stats_ray.state.checkpoints import Manifest
    root = str(tmp_path / "ckpt")
    m = Manifest(root, lineage={"corpus": "x", "v": 1})
    calls = []

    def work(out_dir):
        calls.append(out_dir)
        with open(os.path.join(out_dir, "part.json"), "w") as f:
            json.dump({"rows": 7}, f)
        return {"rows": 7}

    e1 = m.run("gen9ou/day=01", work)
    assert e1["metrics"]["rows"] == 7
    assert os.path.exists(os.path.join(m.partition_dir("gen9ou/day=01"),
                                       "part.json"))
    # resume in a fresh Manifest: skipped
    m2 = Manifest(root, lineage={"corpus": "x", "v": 1})
    m2.run("gen9ou/day=01", work)
    assert len(calls) == 1
    # different lineage -> re-runs
    m3 = Manifest(root, lineage={"corpus": "x", "v": 2})
    m3.run("gen9ou/day=01", work)
    assert len(calls) == 2


def test_manifest_partial_write_not_marked(tmp_path):
    from stats_ray.state.checkpoints import Manifest
    m = Manifest(str(tmp_path / "c2"), lineage={})

    def boom(out_dir):
        raise RuntimeError("crash mid-write")

    with pytest.raises(RuntimeError):
        m.run("p1", boom)
    assert not m.done("p1")
    assert not os.path.exists(m.partition_dir("p1"))


def test_mono_usage_gated_by_player_tag(parsed):
    from stats_ray.stages import aggregate as agg
    df = agg.mono_usage_stats(parsed).to_pandas()
    if df.empty:
        pytest.skip("no monotype battles in tiny corpus")
    assert df["tag"].str.startswith("mono").all()
    assert set(df.columns) == {"tag", "cutoff", "species", "usage_raw",
                               "usage_weighted"}


def test_rating_percentile(parsed):
    from stats_ray.stages import aggregate as agg
    df = agg.rating_percentile(parsed).to_pandas()
    assert (df["percentile"] >= 1000).all()
    assert (df["percentile"] <= 2400).all()
    assert (df["n_ratings"] > 0).all()
