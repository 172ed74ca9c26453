"""bench.py driver contract: one parseable JSON line carrying the headline
value, per-pass samples with post-pass probes, and the recorded scaling
pair — the fields BENCH_r{N}.json consumers read."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_json_contract():
    env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.001",
               RAY_GRAFT_CPUS="4", BENCH_PASSES="1", BENCH_PROBE_REPS="1")
    r = subprocess.run([sys.executable, "bench.py"], env=env,
                       capture_output=True, text=True, timeout=600,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.loads(r.stdout.strip().splitlines()[-1])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                "battles", "battles_per_sec", "pipeline_battles_per_sec",
                "host_probe", "probe_seconds", "samples"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert len(d["samples"]) == 1
    s = d["samples"][0]
    assert {"value", "queries", "probe", "probe_seconds"} <= set(s)
    assert s["probe_seconds"] == pytest.approx(
        s["value"] * s["probe"]["saturation_efficiency"], abs=0.02)
    # the headline is the best pass, normalized by its own post-pass probe
    assert d["value"] == min(x["value"] for x in d["samples"])
    # SCALING.json is committed in this repo, so the pair must be embedded
    assert d["scaling_recorded"]["scaling_efficiency"] > 0
    assert "host_probe" in d["scaling_recorded"]
