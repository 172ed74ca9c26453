"""Tier-update golden parity (J3): the full tierUpdateReport semantics
(reports.ts:414-649) — suffix fan-in weighted by battle counts, complete
singles/doubles/nationaldex/littlecup ladders, banlists, NFE and mega-base
movement suppression — against the reference's checked-in update goldens
(integration.ts:86-102,186-189, testdata/stats/update/*.txt)."""

import json
import os

import pytest

from stats_ray.stages.tiers import reference_tier_update

STATS = "/root/reference/stats/src/test/testdata/stats"

pytestmark = pytest.mark.skipif(not os.path.isdir(STATS),
                                reason="reference testdata not available")

# integration.ts:118-130 — the banlist state at the time of the fixtures
BL = {
    "UU": {"espathra", "baxcalibur", "hydreigon"},
    "RU": {"haxorus", "lycanrocdusk", "drednaw", "toxtricity", "flamigo",
           "hawlucha", "polteageist", "oricoriopompom"},
    "NU": {"florges", "indeedee", "oricoriopompom", "venomoth", "goodra",
           "cetitan", "oricoriosensu", "barraskewda"},
    "PU": {"oricorio", "oricoriopau", "magneton", "vivillon",
           "sneaselhisui"},
    "ZU": set(),
}


@pytest.fixture(scope="module")
def tiers_data():
    with open(os.path.join(STATS, "tiers.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("rtype,fname", [
    ("singles", "singles.txt"),
    ("doubles", "doublesTier.txt"),
    ("nationaldex", "nationaldex.txt"),
    ("littlecup", "littlecup.txt"),
])
def test_tier_update_byte_exact(tiers_data, rtype, fname):
    got = reference_tier_update(STATS, rtype, tiers_data, BL)
    with open(os.path.join(STATS, "update", fname)) as f:
        want = f.read()
    assert got == want, f"{rtype} tier update drifted from golden"
