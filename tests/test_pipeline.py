"""End-to-end Ray Data pipeline tests against the DuckDB oracle on a small
throwaway corpus (the same comparison the evaluation driver runs at sf0.01)."""

import duckdb
import pandas as pd
import pytest


def _norm(df):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            out[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def parsed(small_corpus):
    from stats_ray.pipelines import usage as pl
    return pl.parse_pipeline(small_corpus).materialize()


def test_parse_counts(small_corpus, parsed):
    import ray.data
    total = ray.data.read_parquet(f"{small_corpus}/battles").count()
    kept = parsed.count()
    assert 0 < kept < total  # skip formats filtered out


@pytest.mark.parametrize("name", [
    "battle_usage", "battle_leads", "battle_battles", "battle_encounters",
    "battle_teammates", "battle_metagame", "battle_unique_players",
    "battle_movesets",
])
def test_aggregates_vs_oracle(small_corpus, parsed, name, monkeypatch):
    import __ray_entry__ as E
    # point the cached-parse helper at the test corpus
    monkeypatch.setitem(E._PARSED_CACHE, small_corpus, parsed)
    monkeypatch.setattr(E, "_corpus", lambda sf_dir: small_corpus)
    mine = _norm(E.queries()[name](small_corpus))
    sql = E.oracle_sql_for(small_corpus)[name]
    oracle = _norm(duckdb.sql(sql).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle)


def test_routed_sink_roundtrip(small_corpus, parsed, tmp_path):
    import ray.data
    from stats_ray.pipelines import usage as pl
    out = str(tmp_path / "parsed")
    pl.route_parsed(parsed, out)
    back = ray.data.read_parquet(out)
    assert back.count() == parsed.count()
    names = [f.name for f in back.schema().base_schema]
    assert "format" in names  # hive partition column restored


def test_fused_aggregate_invariant_to_batch_size(parsed):
    """The fused high-cardinality aggregate is batch-size invariant: a
    different explode batch size (different partial-combine grouping) must
    yield the same groups, counts, and weights. Weights are compared at
    ulp tolerance — partial sums are associative only up to FP rounding
    (the reference documents the same combine-order caveat); bit-exactness
    holds for a FIXED batching via the stable-order presort."""
    from stats_ray.stages import aggregate as agg

    saved = agg._EXPLODE_BATCH
    try:
        agg._EXPLODE_BATCH = 256
        a = (agg.fused_highcard(parsed).to_pandas()
             .sort_values(["family", "format", "k1", "k2", "k3"])
             .reset_index(drop=True))
        agg._EXPLODE_BATCH = 4096
        b = (agg.fused_highcard(parsed).to_pandas()
             .sort_values(["family", "format", "k1", "k2", "k3"])
             .reset_index(drop=True))
    finally:
        agg._EXPLODE_BATCH = saved
    import numpy as np
    key_cols = ["family", "format", "k1", "k2", "k3", "i1"]
    assert a[key_cols].equals(b[key_cols])          # identical group sets
    for c in ("w0", "w1", "w2", "w3"):
        np.testing.assert_allclose(a[c].to_numpy(), b[c].to_numpy(),
                                   rtol=1e-9, atol=1e-12)


def test_fused_exchange_hot_key_bound_and_salt(parsed):
    """Hot-key safety of the fused battle exchange, both halves:

    1. The bound the unsalted exchange relies on: every explode feeding
       `_hash_grouped` partial-combines inside its batch, so each block
       emits AT MOST ONE row per (family, format, k1, k2, k3) key — a
       90%-hot key can only put #blocks partial rows in one bucket, never
       #battles.
    2. The pressure valve: `fused_highcard(salt=K)` (two-phase salted
       combine) must produce the identical group set and weights."""
    import numpy as np
    import pyarrow as pa

    from stats_ray.stages import aggregate as agg

    # (1) per-batch partial-combine invariant, on a batch with planted
    # 90% skew: replicate one battle row many times so one species/key
    # cell dominates the explode
    t = next(iter(parsed.iter_batches(batch_size=64,
                                      batch_format="pyarrow")))
    hot = pa.concat_tables([t.slice(0, 1)] * 576 + [t])
    out = agg._explode_fused(hot)
    keys = out.select(["family", "format", "k1", "k2", "k3"]).to_pandas()
    assert keys.duplicated().sum() == 0, \
        "explode must emit <=1 row per key per batch"

    # (2) salted == unsalted on the real parsed corpus
    a = (agg.fused_highcard(parsed).to_pandas()
         .sort_values(["family", "format", "k1", "k2", "k3"])
         .reset_index(drop=True))
    b = (agg.fused_highcard(parsed, salt=4).to_pandas()
         .sort_values(["family", "format", "k1", "k2", "k3"])
         .reset_index(drop=True))
    key_cols = ["family", "format", "k1", "k2", "k3", "i1"]
    assert a[key_cols].equals(b[key_cols])
    for c in ("w0", "w1", "w2", "w3"):
        np.testing.assert_allclose(a[c].to_numpy(), b[c].to_numpy(),
                                   rtol=1e-9, atol=1e-12)


def test_flagship_sharded_parse_resume(ray_session, small_corpus, tmp_path):
    """run_flagship checkpoints the parse at input-shard granularity: a
    crash that loses some shards re-runs ONLY those shards on resume, and
    the sharded parse's total row count equals the unsharded parse."""
    import glob
    import json
    import os
    import shutil

    from stats_ray.pipelines.usage import parse_pipeline, run_flagship

    out = str(tmp_path / "flag")
    c1 = run_flagship(small_corpus, out, families=["battles"],
                      parse_shards=4)
    dirs = sorted(d for d in glob.glob(f"{out}/parsed-*")
                  if not d.endswith(".jsonl"))
    assert len(dirs) == 4

    manifest = [json.loads(line) for line in open(f"{out}/manifest.jsonl")]
    shard_rows = sum(e["metrics"]["rows"] for e in manifest
                     if e["key"].startswith("parsed-"))
    assert shard_rows == parse_pipeline(small_corpus).count()

    # simulate a crash that lost shards 2 and 3: drop their partition dirs
    # and manifest entries, keep everything else
    lost = {"parsed-0002", "parsed-0003"}
    for k in lost:
        shutil.rmtree(os.path.join(out, k))
    with open(f"{out}/manifest.jsonl", "w") as f:
        for e in manifest:
            if e["key"] not in lost:
                f.write(json.dumps(e) + "\n")
    kept_mtime = os.path.getmtime(os.path.join(out, "parsed-0000"))

    c2 = run_flagship(small_corpus, out, families=["battles"],
                      parse_shards=4)
    assert c2 == c1                                  # same family counts
    assert sorted(d for d in glob.glob(f"{out}/parsed-*")
                  if not d.endswith(".jsonl")) == dirs
    # untouched shard was NOT re-written (resume really skipped it)
    assert os.path.getmtime(os.path.join(out, "parsed-0000")) == kept_mtime
    manifest2 = [json.loads(line) for line in open(f"{out}/manifest.jsonl")]
    redone = [e["key"] for e in manifest2 if e["key"] in lost]
    assert sorted(redone) == sorted(lost)


def test_flagship_partial_group_resume(ray_session, small_corpus, tmp_path):
    """The fused/per-player aggregate groups keep PER-FAMILY resume
    granularity: losing one member of a shared-intermediate group
    recomputes only that member (the group rebuilds its intermediate but
    writes nothing over the surviving members' partitions)."""
    import json
    import os
    import shutil

    from stats_ray.pipelines.usage import run_flagship

    fams = ["movesets", "encounters", "unique", "viability"]
    out = str(tmp_path / "pg")
    c1 = run_flagship(small_corpus, out, families=fams, parse_shards=2)
    assert set(c1) == set(fams) and c1["movesets"] > 0

    # lose ONE fused member and ONE player member; keep the others
    manifest = [json.loads(line) for line in open(f"{out}/manifest.jsonl")]
    lost = {"agg-encounters", "agg-viability"}
    for k in lost:
        shutil.rmtree(os.path.join(out, k))
    with open(f"{out}/manifest.jsonl", "w") as f:
        for e in manifest:
            if e["key"] not in lost:
                f.write(json.dumps(e) + "\n")
    kept = {k: os.path.getmtime(os.path.join(out, k))
            for k in ("agg-movesets", "agg-unique")}

    c2 = run_flagship(small_corpus, out, families=fams, parse_shards=2)
    assert c2 == c1
    # surviving group members were NOT re-written
    for k, mt in kept.items():
        assert os.path.getmtime(os.path.join(out, k)) == mt
    manifest2 = [json.loads(line) for line in open(f"{out}/manifest.jsonl")]
    redone = [e["key"] for e in manifest2 if e["key"] in lost]
    assert sorted(redone) == sorted(lost)


def test_aggregates_on_empty_parsed(ray_session, parsed):
    """Production empty-partition scenario (e.g. an empty day/format
    selection): every aggregate family must yield a typed 0-row result,
    not crash — a fully-empty Dataset drops its schema in to_pandas, so
    consumers go through the typed-empty _pd fallback."""
    from stats_ray.stages import aggregate as agg

    empty = parsed.filter(
        lambda r: r["format"] == "no-such-format").materialize()
    assert empty.count() == 0
    fams = [agg.usage_stats, agg.lead_stats, agg.battle_counts,
            agg.metagame_stats, agg.encounter_stats,
            agg.checks_counters_stats, agg.teammate_stats,
            agg.stalliness_stats, agg.mono_usage_stats,
            agg.rating_percentile]
    for fn in fams:
        assert fn(empty).count() == 0
    uniq, viab = agg.unique_and_viability(empty)
    assert uniq.count() == 0 and viab.count() == 0
    assert agg.fused_highcard(empty).materialize().count() == 0
