"""Tier-update join (J3): month combination, BBCode tables, movements."""

import pytest


def _fake_report(battles, rows):
    from stats_ray.stages.reports import FormatView, SpeciesView, usage_report
    v = FormatView("gen9ou", 1695)
    v.battles = battles
    for sid, (raw, weighted) in rows.items():
        p = v.poke(sid)
        p.usage_raw = raw
        p.usage_weighted = weighted
        v.usage_raw += raw
        v.usage_weighted += weighted
    return usage_report(v)


def test_tier_update_combines_months_and_moves():
    from stats_ray.stages.tiers import TIERS, tier_update_report
    # garchomp dominant in OU all months; pikachu marginal
    # pikachu < 4.5% on the x6 scale in OU (0.75/100.25*600 ~ 4.49%)
    r_ou = {m: _fake_report(100, {"garchomp": (99, 99.5),
                                  "pikachu": (1, 0.75)}) for m in range(3)}
    r_uu = {m: _fake_report(50, {"pikachu": (45, 45.0),
                                 "blissey": (5, 5.0)}) for m in range(3)}
    reports = {}
    for m in range(3):
        reports[(m, "gen9ou")] = r_ou[m]
        reports[(m, "gen9uu")] = r_uu[m]
    current = {"Garchomp": "OU", "Pikachu": "OU", "Blissey": "UU"}
    out = tier_update_report(reports, current,
                             {"gen9ou": 1695, "gen9uu": 1630})
    assert "[HIDE=OU (1695 stats)][CODE]" in out
    assert "Combined usage for UU (1630 stats)" in out
    # garchomp's OU usage ~ 90/total*6 fraction > rise threshold -> stays OU
    assert "Garchomp moved" not in out
    # pikachu low in OU but high in UU -> drops
    assert "Pikachu moved from OU to UU" in out


def test_monthly_reports_windows(small_corpus):
    from stats_ray.pipelines import usage as pl
    from stats_ray.stages.tiers import monthly_reports, tier_update_report
    parsed = pl.parse_pipeline(small_corpus).materialize()
    reports = monthly_reports(parsed)
    assert len(reports) == 6  # 3 windows x 2 tier formats
    for text in reports.values():
        assert text.startswith("Total battles:")
    out = tier_update_report(reports, {},
                             {"gen9ou": 1695, "gen9uu": 1630})
    assert "[HIDE=OU" in out and "[HIDE=UU" in out
