"""Reference-fixture parity: the engine parses the reference's real test
logs (legacy mode, hand-authored gen-9 dex slice) and must reproduce all
144 checked-in golden reports byte-for-byte
(stats/src/test/integration.ts:29-103, testdata/reports/<format>/).

Skipped when the reference checkout is not present.
"""

import os

import pytest

from stats_ray.pipelines import parity

pytestmark = pytest.mark.skipif(
    not os.path.isdir(parity.DEFAULT_LOGS),
    reason="reference testdata not available")


@pytest.fixture(scope="module")
def results(ray_session):
    return parity.run_parity()


FORMATS = ["gen1ou", "gen6doublesou", "gen7anythinggoes",
           "gen7challengecup1v1", "gen7ubers", "gen9ubers"]


@pytest.mark.parametrize("fmt", FORMATS)
def test_format_byte_exact(results, fmt):
    bad = [f"{r['kind']}.{r['cutoff']}" for r in results
           if r["format"] == fmt and not r["match"]]
    total = sum(1 for r in results if r["format"] == fmt)
    assert total == 24, f"expected 24 golden files for {fmt}, saw {total}"
    assert not bad, f"{fmt}: {len(bad)}/{total} reports drifted: {bad}"


def test_all_144(results):
    assert len(results) == 144
    assert all(r["match"] for r in results)
