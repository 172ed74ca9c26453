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


def test_fused_shard_bytes_match_single_tag_path(shard_ctx):
    """The one-pass composite-key fan-out must render byte-identical
    reports to an independent single-shard aggregation (project_tag with
    the format key unchanged -> per-shard families -> render)."""
    from stats_ray import dex as dexmod
    from stats_ray.pipelines import usage as pl
    from stats_ray.stages import reports as R

    parsed, _out, written = shard_ctx
    if not written:
        pytest.skip("corpus sample produced no gen9monotype battles")
    fmt, tag = "gen9monotype", "monowater"
    shard = pl.project_tag(parsed, fmt, tag).materialize()
    aggs = {n: pl.AGG_FAMILIES[n](shard).to_pandas()
            for n in pl.REPORT_FAMILIES}
    for cutoff in dexmod.cutoffs_for(fmt):
        view = R.collect_view(aggs, fmt, cutoff)
        movesets = R.to_moveset_statistics(view, fmt)
        expect = {
            "usage": R.usage_report(view),
            "leads": R.leads_report(view),
            "moveset": R.moveset_report(view, movesets),
            "chaos": R.detailed_moveset_report(view, tag=tag,
                                               movesets=movesets),
            "metagame": R.metagame_report(view),
            "display": R.display_statistics(view),
        }
        for kind, text in expect.items():
            with open(written[(tag, cutoff)][kind]) as f:
                assert f.read() == text, (tag, cutoff, kind)


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "monotype")


def test_shard_self_golden(shard_ctx):
    """Pinned byte snapshot of the monowater shard's report set over the
    deterministic 400-battle synth corpus — regression net for the
    tag-shard projection semantics. Regenerate with
    tests/goldens/regen_monotype.py after INTENDED semantic changes."""
    _parsed, _out, written = shard_ctx
    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip("goldens not generated yet")
    if not written:
        pytest.skip("corpus sample produced no gen9monotype battles")
    for (tag, cutoff), paths in written.items():
        for kind, path in paths.items():
            golden = os.path.join(GOLDEN_DIR, os.path.basename(path))
            assert os.path.exists(golden), f"missing golden {golden}"
            with open(golden, "rb") as g, open(path, "rb") as p:
                assert g.read() == p.read(), (tag, cutoff, kind)
