"""Report renderers: structure, roundtrip via the inverse parsers (S10),
and internal consistency with the aggregate tables."""

import json

import pytest


@pytest.fixture(scope="module")
def views(small_corpus):
    from stats_ray.pipelines import usage as pl
    from stats_ray.stages import reports as R

    parsed = pl.parse_pipeline(small_corpus).materialize()
    aggs = {name: pl.AGG_FAMILIES[name](parsed).to_pandas()
            for name in pl.REPORT_FAMILIES}
    return aggs


@pytest.fixture(scope="module")
def view(views):
    from stats_ray.stages import reports as R
    return R.collect_view(views, "gen9ou", 0)


def test_usage_report_roundtrip(view):
    from stats_ray.stages import reports as R
    text = R.usage_report(view)
    parsed = R.parse_usage_report(text)
    assert parsed["battles"] == view.battles
    # every listed species' raw count matches the aggregate
    for name, row in parsed["usage"].items():
        sid = next(s for s in view.pokemon
                   if R.display_species(s) == name)
        assert row["raw"] == view.pokemon[sid].usage_raw
    # ranked by weighted usage descending
    pcts = [r["usage_pct"] for r in parsed["usage"].values()]
    assert pcts == sorted(pcts, reverse=True)


def test_leads_report_roundtrip(view):
    from stats_ray.stages import reports as R
    text = R.leads_report(view)
    parsed = R.parse_leads_report(text)
    assert parsed["total_leads"] == view.battles * 2
    total_raw = sum(r["raw"] for r in parsed["leads"].values())
    assert total_raw == view.lead_raw


def test_moveset_report_structure(view):
    from stats_ray.stages import reports as R
    text = R.moveset_report(view)
    assert "Abilities" in text and "Items" in text and "Moves" in text
    assert "Raw count:" in text and "Viability Ceiling:" in text
    # section separators balanced
    assert text.count("+" + "-" * 40 + "+") > 4


def test_detailed_moveset_json(view):
    from stats_ray.stages import reports as R
    data = json.loads(R.detailed_moveset_report(view))
    assert data["info"]["metagame"] == "gen9ou"
    assert data["info"]["cutoff"] == 0
    assert data["info"]["number of battles"] == view.battles
    some = next(iter(data["data"].values()))
    for key in ("Raw count", "usage", "Viability Ceiling", "Abilities",
                "Items", "Spreads", "Moves", "Teammates",
                "Checks and Counters"):
        assert key in some


def test_metagame_report(view):
    from stats_ray.stages import reports as R
    text = R.metagame_report(view)
    parsed = R.parse_metagame_report(text)
    assert parsed["tags"]  # archetype tags present
    # tag percentages sorted descending
    vals = list(parsed["tags"].values())
    assert vals == sorted(vals, reverse=True)
    if parsed["histogram"]:
        assert "one # = " in text
        assert parsed["legend"] > 0


def test_display_statistics_json(view):
    from stats_ray.stages import reports as R
    data = json.loads(R.display_statistics(view))
    assert data["battles"] == view.battles
    some = next(iter(data["pokemon"].values()))
    for key in ("lead", "usage", "count", "viability", "abilities", "items",
                "moves", "teammates", "counters"):
        assert key in some
    # percentages rounded to 1e-4 and nonzero
    for v in some["abilities"].values():
        assert v == round(v, 4) and v > 0


def test_render_reports_fanout(small_corpus, tmp_path):
    from stats_ray.pipelines import usage as pl
    parsed = pl.parse_pipeline(small_corpus).materialize()
    written = pl.render_reports(parsed, str(tmp_path / "reports"),
                                formats=["gen9ou"])
    assert len(written) == 4  # 4 cutoffs
    for (_fmt, _cutoff), paths in written.items():
        assert set(paths) == {"usage", "leads", "moveset", "chaos",
                              "metagame", "display"}
        for p in paths.values():
            assert open(p).read()
