"""HLL sketches, the convert CLI (S11), and the roomid public filter (F3)."""

import json

import numpy as np
import pytest


def test_hll_accuracy():
    from stats_ray.ops.sketch import HLL
    h = HLL(p=12)
    vals = [f"user-{i}" for i in range(20000)]
    h.add_many(vals)
    est = h.estimate()
    assert abs(est - 20000) / 20000 < 0.05


def test_hll_merge_equals_union():
    from stats_ray.ops.sketch import HLL
    a = HLL(p=10).add_many([f"x{i}" for i in range(5000)])
    b = HLL(p=10).add_many([f"x{i}" for i in range(2500, 7500)])
    u = HLL(p=10).add_many([f"x{i}" for i in range(7500)])
    merged = HLL.deserialize(a.serialize(), 10).merge(
        HLL.deserialize(b.serialize(), 10))
    assert merged.estimate() == pytest.approx(u.estimate())


def test_approx_distinct_vs_exact(ray_session):
    import duckdb
    from stats_ray.ops.sketch import approx_distinct
    import ray.data
    ds = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                               columns=["event_type", "user_id"])
    approx = approx_distinct(ds, "event_type", "user_id")
    exact = duckdb.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet') GROUP BY 1").df()
    m = approx.merge(exact, on="event_type")
    rel = (m["approx_distinct"] - m["n"]).abs() / m["n"]
    assert (rel < 0.1).all(), m


def test_convert_reports(small_corpus, tmp_path):
    from stats_ray.pipelines import usage as pl
    from stats_ray.stages.convert import convert_reports
    parsed = pl.parse_pipeline(small_corpus).materialize()
    rep_dir = str(tmp_path / "reports")
    pl.render_reports(parsed, rep_dir, formats=["gen9ou"])
    out = convert_reports(rep_dir, str(tmp_path / "unified"))
    assert len(out) == 4
    one = json.load(open(next(iter(out.values()))))
    assert one["format"] == "gen9ou"
    assert one["battles"] >= 0
    assert "pokemon" in one and "metagame" in one
    # split mode
    out2 = convert_reports(rep_dir, str(tmp_path / "split"), split=True)
    import os
    d = next(iter(out2.values()))
    assert os.path.isdir(d) and len(os.listdir(d)) > 0


def test_roomid_public_filter():
    import pyarrow as pa
    from stats_ray import synth
    from stats_ray.stages.anon import AnonymizeBattles
    from stats_ray.tokens import encode_strings

    rows = [synth.gen_battle(i) for i in range(6)]
    docs = []
    for i, r in enumerate(rows):
        d = json.loads(r["doc"])
        if i % 2 == 0:
            d["roomid"] = f"battle-x-{i}pw"  # private
        docs.append(json.dumps(d, sort_keys=True, separators=(",", ":")))
    t = pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "source": [r["source"] for r in rows],
        "tokens": encode_strings(docs),
        "n_tok": pa.array([len(d) for d in docs], pa.int32()),
    })
    out = AnonymizeBattles(public_only=True)(t)
    assert len(out) == 3
    out_all = AnonymizeBattles(public_only=False)(t)
    assert len(out_all) == 6
