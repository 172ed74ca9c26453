"""Byte-for-byte golden report regression (the reference's test strategy,
SURVEY.md §5: 144 checked-in goldens compared exactly).

Goldens were rendered from the deterministic 400-battle corpus at
SYNTH_VERSION 3; regenerate with the snippet in this file's history after a
deliberate synth/semantics change (and bump the pin below)."""

import os

import pytest

GOLDEN_SYNTH_VERSION = 4
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def rendered(ray_session, tmp_path_factory):
    from stats_ray import synth
    from stats_ray.pipelines import usage as pl
    if synth.SYNTH_VERSION != GOLDEN_SYNTH_VERSION:
        pytest.skip("goldens pinned to an older SYNTH_VERSION — regenerate")
    out = tmp_path_factory.mktemp("golden")
    corpus = str(out / "corpus")
    synth.build_corpus(corpus, 400)
    parsed = pl.parse_pipeline(corpus).materialize()
    return pl.render_reports(parsed, str(out / "reports"), formats=["gen9ou"])


@pytest.mark.parametrize("kind,ext", [
    ("usage", "txt"), ("leads", "txt"), ("moveset", "txt"),
    ("metagame", "txt"), ("chaos", "json"), ("display", "json"),
])
def test_report_matches_golden(rendered, kind, ext):
    paths = rendered[("gen9ou", 1695)]
    with open(paths[kind]) as f:
        got = f.read()
    with open(os.path.join(GOLDEN_DIR, f"gen9ou-1695.{kind}.{ext}")) as f:
        want = f.read()
    assert got == want, f"{kind} report drifted from golden (byte-exact check)"
