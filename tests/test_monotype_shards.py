"""Per-shard monotype report fan-out (workflows/smogon/stats.ts:110-121):
full report set per mono<type> shard, consistent with the oracle-checked
mono_usage aggregate family."""

import os

import pytest


@pytest.fixture(scope="module")
def shard_ctx(ray_session, small_corpus, tmp_path_factory):
    from stats_ray.pipelines import usage as pl
    parsed = pl.parse_pipeline(small_corpus).materialize()
    out = str(tmp_path_factory.mktemp("mono"))
    written = pl.render_monotype_reports(parsed, out, tags=["monowater"])
    return parsed, out, written


def test_shard_reports_written(shard_ctx):
    _parsed, out, written = shard_ctx
    if not written:
        pytest.skip("corpus sample produced no monowater teams")
    for (_tag, _cutoff), paths in written.items():
        assert set(paths) == {"usage", "leads", "moveset", "chaos",
                              "metagame", "display"}
        for p in paths.values():
            assert os.path.getsize(p) > 0


def test_shard_usage_matches_mono_family(shard_ctx):
    from stats_ray.pipelines import usage as pl
    from stats_ray.stages import aggregate as agg, reports as R
    parsed, _out, written = shard_ctx
    if not written:
        pytest.skip("corpus sample produced no monowater teams")
    mono = agg.mono_usage_stats(parsed).to_pandas()
    tagdf = mono[(mono.tag == "monowater") & (mono.cutoff == 1630)]
    shard = pl.project_tag(parsed, "gen9monotype", "monowater").materialize()
    aggs = {n: pl.AGG_FAMILIES[n](shard).to_pandas()
            for n in ("usage", "battles")}
    view = R.collect_view(aggs, "gen9monotype", 1630)
    for r in tagdf.itertuples():
        p = view.pokemon.get(r.species)
        got = p.usage_weighted if p else 0.0
        assert abs(got - r.usage_weighted) < 1e-6, r.species
