"""Independent classifier/stat-math fixture vectors.

The 38 teams here are the reference's real test-log teams (canonicalized);
the expected (bias, stalliness, tags) triples were produced by the engine
run that matched ALL 144 of the reference's checked-in golden reports
byte-for-byte (tests/test_reference_parity.py) — the metagame/display
goldens pin the stalliness mass and tag weights, so these vectors are
transitively validated against pkmn/stats itself, independent of the
synthetic corpus (which imports the engine classifier and therefore cannot
catch semantic drift on its own).

This test needs no reference checkout and runs in milliseconds, so any
classifier regression is caught even where the full parity suite can't run.
"""

import json
import os

import pytest

from stats_ray.gendex import gen_for_format, get_dex
from stats_ray.stages.classify import classify_team

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "classifier_real_teams.json")


@pytest.fixture(scope="module")
def fixtures():
    with open(FIXTURES) as f:
        return json.load(f)


def test_fixture_count(fixtures):
    assert len(fixtures) == 38  # 18 logs x 2 sides + 2 extra-format sides


def test_classifier_matches_pinned_vectors(fixtures):
    dx = get_dex("legacy")
    bad = []
    for fx in fixtures:
        bias, stall, tags = classify_team(
            fx["team"], dx, gen_for_format(fx["format"]))
        if (bias != fx["bias"] or repr(stall) != fx["stalliness"]
                or tags != fx["tags"]):
            bad.append((fx["format"], fx["log"], fx["side"],
                        bias, repr(stall), tags))
    assert not bad, f"classifier drifted on {len(bad)} teams: {bad[:3]}"


def test_stalliness_spans_archetypes(fixtures):
    # sanity: the vectors exercise multiple archetype buckets
    buckets = set()
    for fx in fixtures:
        buckets.update({"hyperoffense", "offense", "balance", "semistall",
                        "stall"} & set(fx["tags"]))
    assert len(buckets) >= 3
