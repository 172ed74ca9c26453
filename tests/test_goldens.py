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
def rendered(tmp_path_factory):
    """Render in a SUBPROCESS (fresh Ray session): distributed FP sums are
    reproducible only up to reordering — batch composition follows block
    ARRIVAL order, so a long shared session can regroup partial sums by an
    ulp and flip print-precision ties. The byte-exact pin therefore renders
    under the same controlled conditions the goldens were generated in.
    (Value correctness under reordering is covered by the rounded DuckDB
    oracles; reference parity uses exact dyadic weights and is immune.)"""
    import subprocess
    import sys

    from stats_ray import synth
    if synth.SYNTH_VERSION != GOLDEN_SYNTH_VERSION:
        pytest.skip("goldens pinned to an older SYNTH_VERSION — regenerate")
    out = tmp_path_factory.mktemp("golden")
    script = f"""
import logging, ray
from ray.data import DataContext
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
from stats_ray import synth
from stats_ray.pipelines import usage as pl
synth.build_corpus({str(out / 'corpus')!r}, 400)
parsed = pl.parse_pipeline({str(out / 'corpus')!r}).materialize()
pl.render_reports(parsed, {str(out / 'reports')!r}, formats=["gen9ou"])
ray.shutdown()
"""
    subprocess.run([sys.executable, "-c", script], check=True,
                   cwd="/root/repo", capture_output=True)
    base = str(out / "reports")
    return {("gen9ou", 1695): {
        kind: os.path.join(base, kind, f"gen9ou-1695.{ext}")
        for kind, ext in [("usage", "txt"), ("leads", "txt"),
                          ("moveset", "txt"), ("metagame", "txt"),
                          ("chaos", "json"), ("display", "json")]}}


_NUM = __import__("re").compile(r"-?\d+(?:\.\d+)?")


def _canonical_ties(text: str) -> str:
    """Byte-exact comparison EXCEPT among printed ties: distributed FP
    summation is exact only up to reordering (batch composition follows
    block arrival), so entries whose true sums are equal can land an ulp
    apart and swap order between runs — the one ordering the engine
    legitimately does not pin. Consecutive lines with identical numeric
    content are sorted on both sides; everything else must match exactly.
    (Reference parity stays strictly byte-exact: its fixture weights are
    bit-stable.)"""
    lines = text.split("\n")
    out: list[str] = []
    i = 0
    while i < len(lines):
        nums = tuple(_NUM.findall(lines[i]))
        j = i + 1
        if nums:
            while j < len(lines) and tuple(_NUM.findall(lines[j])) == nums:
                j += 1
        out.extend(sorted(lines[i:j]))
        i = j
    return "\n".join(out)


def _json_close(a, b, path="$"):
    """Structural equality with ulp-scale float tolerance. The chaos/display
    goldens serialize raw double sums; distributed summation is exact only
    up to reordering, so two correct runs can differ in the last couple of
    digits. Everything non-float must match exactly."""
    import math
    if isinstance(a, float) or isinstance(b, float):
        assert math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12), \
            f"{path}: {a!r} != {b!r}"
    elif isinstance(a, dict):
        assert isinstance(b, dict) and a.keys() == b.keys(), \
            f"{path}: key sets differ"
        for k in a:
            _json_close(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert isinstance(b, list) and len(a) == len(b), \
            f"{path}: lengths differ"
        for i, (x, y) in enumerate(zip(a, b)):
            _json_close(x, y, f"{path}[{i}]")
    else:
        assert a == b, f"{path}: {a!r} != {b!r}"


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
    if got == want:
        return
    if ext == "json":
        import json
        _json_close(json.loads(got), json.loads(want))
        return
    assert _canonical_ties(got) == _canonical_ties(want), \
        f"{kind} report drifted from golden (beyond printed-tie reordering)"
