"""Binary codec (M11/S9), checkpoint manifest (S4), monotype shards,
rating percentile (A15)."""

import json
import os

import numpy as np
import pandas as pd
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


def test_manifest_lineage_flip_flop_not_stale(tmp_path):
    """A->B->A lineage: run under lineage A, re-run under lineage B (disk
    now holds B's data), then come back to lineage A. The old A entry must
    NOT satisfy resume — the partition dir was overwritten by B, so A must
    recompute (last manifest entry per key wins, regardless of lineage)."""
    from stats_ray.state.checkpoints import Manifest
    root = str(tmp_path / "flip")

    def writer(tag):
        def work(out_dir):
            with open(os.path.join(out_dir, "part.json"), "w") as f:
                json.dump({"tag": tag}, f)
            return {"rows": 1}
        return work

    L1, L2 = {"range": "jan"}, {"range": "feb"}
    Manifest(root, lineage=L1).run("k", writer("JAN"))
    Manifest(root, lineage=L2).run("k", writer("FEB"))
    m = Manifest(root, lineage=L1)
    assert not m.done("k")  # stale: disk holds FEB
    m.run("k", writer("JAN"))
    with open(os.path.join(m.partition_dir("k"), "part.json")) as f:
        assert json.load(f)["tag"] == "JAN"
    # and a fresh L1 manifest now resumes (its entry IS the last one)
    assert Manifest(root, lineage=L1).done("k")


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


# --- tools/stats CLI analogues (cutoff / sizes / display) -------------------

def test_ptile_matches_numpy_linear():
    from stats_ray.stages.binary import _hist_ptile, _ptile
    rng = np.random.RandomState(3)
    vals = np.sort(rng.randint(1000, 2000, 137))
    for p in (0.0, 0.1, 0.25, 0.5, 0.9, 0.999, 1.0):
        want = float(np.percentile(vals, p * 100, method="linear"))
        assert _ptile(vals, p) == pytest.approx(want), p
        # histogram form agrees with the expanded form
        u, c = np.unique(vals, return_counts=True)
        assert _hist_ptile(u, c, p) == pytest.approx(want), p
    assert _ptile(np.array([]), 0.5) == 0.0


def test_db_rating_percentile_matches_direct(parsed, tmp_path):
    """db_rating_percentile over the encoded db == linear percentile over
    the directly-collected codec-rounded ratings."""
    import ray.data
    from stats_ray.stages.binary import (_ptile, binary_db,
                                         db_rating_percentile)

    out = str(tmp_path / "db")
    binary_db(parsed, out)
    got = db_rating_percentile(ray.data.read_parquet(out), 0.9)

    df = parsed.to_pandas()
    rows = []
    for side in ("p1", "p2"):
        has = df[f"{side}_has_rating"].to_numpy()
        rpr = np.clip(np.round(df[f"{side}_rpr"].to_numpy()), 0, 0xFFFE)
        rows.append(pd.DataFrame({"format": df["format"][has],
                                  "rpr": rpr[has]}))
    direct = pd.concat(rows, ignore_index=True)
    for _, r in got.iterrows():
        vals = np.sort(direct.loc[direct["format"] == r["format"], "rpr"]
                       .to_numpy())
        assert r["n_ratings"] == len(vals)
        assert r["percentile"] == pytest.approx(_ptile(vals, 0.9))


def test_db_sizes_and_display(parsed, tmp_path):
    import ray.data
    from stats_ray.stages.binary import (binary_db, binary_stats_tables,
                                         db_display_pokemon, db_sizes_table)

    out = str(tmp_path / "db2")
    binary_db(parsed, out)
    stats = binary_stats_tables(ray.data.read_parquet(out),
                                cutoff=1630.0).to_pandas()

    sizes = db_sizes_table(stats)
    for fmt, g in sizes.groupby("format"):
        assert len(g) == 101                      # 0..100% table
        assert g.sort_values("pct")["moves"].is_monotonic_increasing
        assert (g["moves"] >= 0).all() and (g["items"] >= 0).all()

    disp = db_display_pokemon(stats, n_moves=5, n_items=3)
    for fmt, by_sp in disp.items():
        usages = [e["usage"] for e in by_sp.values()]
        assert usages == sorted(usages, reverse=True)   # usage-desc order
        assert sum(usages) == pytest.approx(100, abs=0.5)
        for e in by_sp.values():
            assert len(e["moves"]) <= 5 and len(e["items"]) <= 3
            for v in list(e["moves"].values()) + list(e["items"].values()):
                assert 0 <= v <= 400 + 1e-9        # 4 move slots x 100%


def test_manifest_cleanup_and_tombstone(tmp_path):
    """--cleanup analogue (logs/DESIGN.md:39-87): orphaned *.tmp-* scratch
    is always GC'd, manifest-unreferenced partitions only on request, and
    tombstoning reclaims a completed partition's space while keeping its
    resume marker."""
    from stats_ray.state.checkpoints import Manifest, cleanup_root
    root = str(tmp_path / "gc")
    m = Manifest(root, lineage={"v": 1})

    def work(out_dir):
        with open(os.path.join(out_dir, "part.json"), "w") as f:
            json.dump({"rows": 1}, f)
        return {"rows": 1}

    m.run("gen9ou/day=01", work)
    m.run("flat", work)
    # plant a SIGKILL-style orphan next to a nested partition, plus a
    # stale dir no manifest entry references
    os.makedirs(os.path.join(root, "gen9ou", "day=02.tmp-deadbeef"))
    os.makedirs(os.path.join(root, "stale", "old"))

    removed = cleanup_root(root)
    assert removed["tmp"] == ["gen9ou/day=02.tmp-deadbeef"]
    assert removed["unreferenced"] == []  # not asked to
    assert os.path.isdir(os.path.join(root, "stale"))

    removed = cleanup_root(root, remove_unreferenced=True)
    assert removed["unreferenced"] == ["stale"]
    # referenced partitions (nested and flat) survive both passes
    assert os.path.exists(os.path.join(root, "gen9ou", "day=01",
                                       "part.json"))
    assert os.path.exists(os.path.join(root, "flat", "part.json"))

    # tombstone: data reclaimed, resume marker kept
    assert m.tombstone("flat")
    assert not os.path.isdir(os.path.join(root, "flat"))
    assert os.path.exists(os.path.join(root, "flat.tombstone"))
    calls = []
    m2 = Manifest(root, lineage={"v": 1})
    m2.run("flat", lambda d: calls.append(d))
    assert calls == []  # still done
    assert not m.tombstone("never-ran")

    # a DIFFERENT lineage recomputing the tombstoned key resurrects the
    # data and drops the placeholder — disk never says "reclaimed" next
    # to a live partition dir
    m3 = Manifest(root, lineage={"v": 2})
    m3.run("flat", work)
    assert os.path.exists(os.path.join(root, "flat", "part.json"))
    assert not os.path.exists(os.path.join(root, "flat.tombstone"))


def test_manifest_crash_window_invalidates(tmp_path):
    """A crash between mutating an existing partition dir and appending
    the new manifest entry must not leave the OLD lineage's entry live —
    resume would silently serve the other run's data (A->B->A)."""
    from stats_ray.state.checkpoints import Manifest
    root = str(tmp_path / "cw")

    def work(tag):
        def fn(out_dir):
            with open(os.path.join(out_dir, "part.json"), "w") as f:
                json.dump({"tag": tag}, f)
            return {"rows": 1}
        return fn

    a = Manifest(root, lineage={"run": "A"})
    a.run("k", work("A"))
    # lineage B re-runs the key but is "SIGKILLed" after the rename and
    # before mark(): simulate by making fn succeed, then crashing mark
    b = Manifest(root, lineage={"run": "B"})
    orig_mark = b.mark
    b.mark = lambda *args, **kw: (_ for _ in ()).throw(KeyboardInterrupt)
    try:
        b.run("k", work("B"))
    except KeyboardInterrupt:
        pass
    b.mark = orig_mark
    # the dir now holds B's data; a resumed A-run must treat the key as
    # NOT done (the invalidation masks A's old entry) and recompute
    a2 = Manifest(root, lineage={"run": "A"})
    assert not a2.done("k")
    a2.run("k", work("A"))
    with open(os.path.join(root, "k", "part.json")) as f:
        assert json.load(f)["tag"] == "A"
    # and once recomputed, resume skips again
    a3 = Manifest(root, lineage={"run": "A"})
    assert a3.done("k")


def test_cleanup_tmp_age_guard_and_tombstone_gc(tmp_path):
    from stats_ray.state.checkpoints import Manifest, cleanup_root
    root = str(tmp_path / "age")
    m = Manifest(root, lineage={"v": 1})
    m.run("keep", lambda d: {"rows": 0})
    os.makedirs(os.path.join(root, "live.tmp-aaaaaaaa"))
    removed = cleanup_root(root, min_tmp_age_sec=3600)
    assert removed["tmp"] == []          # fresh scratch protected
    assert os.path.isdir(os.path.join(root, "live.tmp-aaaaaaaa"))
    removed = cleanup_root(root, min_tmp_age_sec=0)
    assert removed["tmp"] == ["live.tmp-aaaaaaaa"]
    # a stale placeholder next to a LIVE partition dir is contradictory
    # state: always GC'd
    with open(os.path.join(root, "keep.tombstone"), "w") as f:
        json.dump({"key": "keep"}, f)
    removed = cleanup_root(root)
    assert removed["tombstones"] == ["keep.tombstone"]
    # an unreferenced placeholder goes with --unreferenced only
    with open(os.path.join(root, "ghost.tombstone"), "w") as f:
        json.dump({"key": "ghost"}, f)
    assert cleanup_root(root)["tombstones"] == []
    removed = cleanup_root(root, remove_unreferenced=True)
    assert removed["tombstones"] == ["ghost.tombstone"]


def test_cli_cleanup(tmp_path, capsys):
    from stats_ray.cli import main
    from stats_ray.state.checkpoints import Manifest
    root = str(tmp_path / "gcc")
    m = Manifest(root, lineage={"v": 1})
    m.run("a", lambda d: {"rows": 0})
    m.run("b", lambda d: {"rows": 0})
    os.makedirs(os.path.join(root, "a.tmp-12345678"))
    os.makedirs(os.path.join(root, "junk"))
    # default --tmp-age (1h) protects fresh scratch: a concurrently
    # running job's live tmp dir must survive an operator's cleanup
    main(["cleanup", "--root", root])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tmp"] == []
    assert os.path.isdir(os.path.join(root, "a.tmp-12345678"))
    main(["cleanup", "--root", root, "--unreferenced", "--tombstone", "b",
          "--tmp-age", "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"tmp": ["a.tmp-12345678"], "unreferenced": ["junk"],
                   "tombstones": [], "tombstoned": ["b"]}
    assert os.path.isdir(os.path.join(root, "a"))
    assert os.path.exists(os.path.join(root, "b.tombstone"))
