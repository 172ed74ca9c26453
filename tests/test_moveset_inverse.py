"""S10 moveset partial inverse parser, validated against the reference's
own golden reports: every species/weight recovered from movesets.<c>.txt
must be consistent with the checked-in detailed.<c>.json."""

import json
import os

import pytest

from stats_ray.stages.reports import partial_parse_moveset_report

GOLDENS = "/root/reference/stats/src/test/testdata/reports"

pytestmark = pytest.mark.skipif(not os.path.isdir(GOLDENS),
                                reason="reference testdata not available")


@pytest.mark.parametrize("fmt", ["gen7ubers", "gen1ou", "gen7anythinggoes"])
def test_partial_parse_matches_detailed(fmt):
    with open(os.path.join(GOLDENS, fmt, "movesets.0.txt")) as f:
        pmr = partial_parse_moveset_report(f.read())
    with open(os.path.join(GOLDENS, fmt, "detailed.0.json")) as f:
        detailed = json.load(f)["data"]

    assert pmr, "no species parsed"
    assert set(pmr) == set(detailed)
    for species, rec in pmr.items():
        assert rec["weight"] is not None
        # every parsed counter appears in detailed's Checks and Counters
        cc = detailed[species]["Checks and Counters"]
        for opp, oc in rec["outcomes"].items():
            assert opp in cc, (species, opp)
            assert 0.0 <= oc["koedn"] <= 1.0
            assert 0.0 <= oc["switchedn"] <= 1.0


def test_outcome_percentages_roundtrip():
    with open(os.path.join(GOLDENS, "gen7ubers", "movesets.1500.txt")) as f:
        pmr = partial_parse_moveset_report(f.read())
    total = sum(len(r["outcomes"]) for r in pmr.values())
    assert total > 10  # the fixture has a populated CC section
