"""Unit tests for the scalar/vector math kernels."""

import math

import numpy as np
import pytest

from stats_ray.functions.erf import erf
from stats_ray.functions.statmath import (
    calc_stat, hidden_power_type, spread_and_stats, stat_to_ev)
from stats_ray.functions.weights import (
    effective_rating, gxe, victory_chance, weighting)


def test_erf_matches_stdlib():
    xs = np.linspace(-6, 6, 20001)
    got = erf(xs)
    want = np.array([math.erf(x) for x in xs])
    assert np.abs(got - want).max() < 1e-16 * 10


def test_erf_edges():
    assert erf(0.0) == 0.0
    assert erf(1e300) == 1.0
    assert erf(-1e300) == -1.0
    # branch boundaries
    for x in (0.46875, 0.46876, 4.0, 4.0001):
        assert abs(float(erf(x)) - math.erf(x)) < 1e-15


def test_weighting_rules():
    # rd>100 & cutoff>1500 -> 0 (util.ts:416-419)
    assert weighting(1800.0, 130.0, 1630) == 0.0
    assert weighting(1800.0, 130.0, 1500) > 0.98
    # cutoff 0 -> ~1
    assert weighting(1500.0, 130.0, 0) > 0.999


def test_effective_rating_imputation():
    # invalid rating + win/loss -> imputed constants (stats.ts:255-258)
    r, d, valid = effective_rating([False, False, False], [0, 0, 0], [0, 0, 0],
                                   [1, 2, 0])
    assert not valid.any()
    assert r[0] == pytest.approx(1540.16061434)
    assert r[1] == pytest.approx(1459.83938566)
    assert d[0] == d[1] == pytest.approx(122.858308077)
    assert (r[2], d[2]) == (1500.0, 130.0)
    # rprd == 0 counts as invalid (stats.ts:249)
    _, _, v2 = effective_rating([True], [1700.0], [0.0], [1])
    assert not v2[0]


def test_gxe_rounding_half_up():
    # JS Math.round(100 * vc): half-up, not banker's
    vc = victory_chance(1500.0, 130.0, 1500.0, 130.0)
    assert float(vc) == pytest.approx(0.5)
    assert float(gxe(1500.0, 130.0)) == 50.0


def test_calc_stat_formula():
    # public gen-3+ formula spot checks
    # floor((2*108+31+floor(252/4))*100/100) + 100 + 10
    assert calc_stat("hp", 108, 31, 252, 100, "adamant") == 420
    # (floor((2*130+31+63)*100/100)+5) * 1.1 -> floor
    assert calc_stat("atk", 130, 31, 252, 100, "adamant") == 394
    assert calc_stat("atk", 130, 31, 252, 100, "modest") == 323
    assert calc_stat("hp", 1, 31, 252, 100, "hardy") == 1  # shedinja


def test_stat_to_ev_roundtrip():
    for base, iv, ev, level, nat, stat in [
        (130, 31, 252, 100, "adamant", "atk"),
        (95, 31, 0, 100, "hardy", "def"),
        (108, 31, 4, 50, "jolly", "hp"),
        (60, 0, 128, 100, "modest", "spa"),
    ]:
        val = calc_stat(stat, base, iv, ev, level, nat)
        rev = stat_to_ev(stat, val, base, iv, level, nat)
        # reconstructed EV must reproduce the same displayed stat
        assert calc_stat(stat, base, iv, rev, level, nat) == val


def test_spread_key_shape():
    ivs = {k: 31 for k in ("hp", "atk", "def", "spa", "spd", "spe")}
    evs = {"hp": 0, "atk": 252, "def": 0, "spa": 0, "spd": 4, "spe": 252}
    spread, stats = spread_and_stats("garchomp", "adamant", ivs, evs, 100)
    assert spread.startswith("Adamant:")
    assert len(spread.split(":")[1].split("/")) == 6
    assert len(stats.split("/")) == 6
    # neutral natures fold to Hardy (stats.ts:330-334)
    spread2, _ = spread_and_stats("garchomp", "serious", ivs, evs, 100)
    assert spread2.startswith("Hardy:")


def test_hidden_power_type():
    assert hidden_power_type({k: 31 for k in
                              ("hp", "atk", "def", "spa", "spd", "spe")}) == "Dark"
    assert hidden_power_type({"hp": 31, "atk": 0, "def": 31, "spa": 31,
                              "spd": 31, "spe": 31}) in (
        "Fighting", "Flying", "Poison", "Ground", "Rock", "Bug", "Ghost",
        "Steel", "Fire", "Water", "Grass", "Electric", "Psychic", "Ice",
        "Dragon", "Dark")
