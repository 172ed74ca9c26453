"""Display.fromReports (display.ts:174-292): rebuild the unified display
object from published legacy text reports.

The unit fixture is a port of the reference's own display.test.ts:180-286
(both Checks-and-Counters encodings); the end-to-end case feeds the
reference's checked-in gen7ubers golden reports through from_reports with
the legacy dex slice."""

import json
import math

import pytest

REF = "/root/reference/stats/src/test/testdata/reports/gen7ubers"

MOVESETS = "\n".join([
    " +---+",
    " | Snorlax  |",
    " +---+",
    " | Raw count: 2  |",
    " | Avg. weight: 1.0  |",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " +---+",
    " | Checks and Counters |",
    " | Tauros 1.0 (1.00±0.00) |",
    " |  (100.0% KOed / 0.0% switched out) |",
])

USAGE_REPORT = "\n".join([
    " Total battles: 1",
    " Avg. weight/team: 1.0",
    " + ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + ",
    " | Rank | Pokemon            | Usage %   | Raw    | %       | Real   | %       | ",
    " + ---- + ------------------ + --------- + ------ + ------- + ------ + ------- + ",
    " | 1    | Snorlax            | 100.0000% | 2      | 100.000%| 2      | 100.000%| ",
])

BASE_POKEMON = {
    "Raw count": 2,
    "usage": 1.0,
    "Viability Ceiling": [2, 89, 89, 89],
    "Abilities": {"illuminate": 2},
    "Items": {"nothing": 2},
    "Tera Types": {"nothing": 2},
    "Spreads": {"Serious:252/252/252/252/252/252": 2},
    "Moves": {"bodyslam": 2},
    "Teammates": {},
}

BASE_DETAILED = {
    "info": {"metagame": "gen1ou", "cutoff": 0, "cutoff deviation": 0,
             "team type": None, "number of battles": 1},
}


@pytest.fixture(scope="module")
def legacy_dex():
    from stats_ray.gendex import get_dex
    return get_dex("legacy")


# display.test.ts:273-286 — CnC changed from [n, p, d] to {n, p, d}
@pytest.mark.parametrize("cnc", [
    {"Tauros": [1, 1.0, 0.0]},           # old array format
    {"Tauros": {"n": 1, "p": 1.0, "d": 0.0}},  # new object format
])
def test_from_reports_counters(legacy_dex, cnc):
    from stats_ray.stages.reports import from_reports

    detailed = json.dumps({
        **BASE_DETAILED,
        "data": {"Snorlax": {**BASE_POKEMON, "Checks and Counters": cnc}},
    })
    result = from_reports(legacy_dex, USAGE_REPORT, MOVESETS, detailed)
    assert result["pokemon"]["Snorlax"]["counters"] == {"Tauros": [1, 1, 0]}
    assert result["battles"] == 1
    assert result["pokemon"]["Snorlax"]["usage"] == {
        "raw": 1, "real": 1, "weighted": 1}
    assert result["pokemon"]["Snorlax"]["weight"] == 1


def test_from_reports_weight_ge_1(legacy_dex):
    from stats_ray.stages.reports import from_reports

    detailed = json.dumps({
        **BASE_DETAILED,
        "data": {"Snorlax": {**BASE_POKEMON, "Checks and Counters": {}}},
    })
    report = MOVESETS.replace("Avg. weight: 1.0", "Avg. weight: 1.5")
    result = from_reports(legacy_dex, USAGE_REPORT, report, detailed)
    assert result["pokemon"]["Snorlax"]["weight"] == 1.5


@pytest.mark.parametrize("cutoff", ["0", "1760"])
def test_from_reports_reference_goldens(legacy_dex, cutoff):
    """End-to-end over the reference's checked-in gen7ubers reports."""
    from stats_ray.stages.reports import from_reports

    def rd(name):
        with open(f"{REF}/{name}") as f:
            return f.read()

    result = from_reports(
        legacy_dex, rd(f"usage.{cutoff}.txt"), rd(f"movesets.{cutoff}.txt"),
        rd(f"detailed.{cutoff}.json"), rd(f"metagame.{cutoff}.txt"),
        rd(f"leads.{cutoff}.txt"))

    detailed = json.loads(rd(f"detailed.{cutoff}.json"))
    assert result["battles"] == detailed["info"]["number of battles"]
    assert result["pokemon"]  # a non-trivial set reconstructed

    # every reconstructed mon mirrors its detailed-report counterpart
    # (output keys are canonical species names, e.g. 'Nidoran-M'; golden
    # keys are legacy display names, e.g. 'NidoranM' — compare by id)
    from stats_ray.gendex import to_id
    by_id = {to_id(k): v for k, v in detailed["data"].items()}
    for name, p in result["pokemon"].items():
        dp = by_id[to_id(name)]
        assert p["count"] == dp["Raw count"]
        assert p["viability"] == dp["Viability Ceiling"]
        # percentages are fractions of the ability-sum weight
        total = sum(v for v in p["abilities"].values())
        assert total <= 1.0 + 1e-6
        u = p["usage"]
        assert 0 < u["weighted"] <= 1 and 0 <= u["raw"] <= 1

    # metagame tags parsed as fractions, descending
    tags = list(result["metagame"]["tags"].values())
    assert tags and tags == sorted(tags, reverse=True)
    assert all(not math.isnan(t) for t in tags)
    hist = result["metagame"]["stalliness"]["histogram"]
    assert hist and all(len(x) == 2 for x in hist)
