"""Benchmark: flagship battle-log pipeline throughput.

Runs parse -> enrich -> aggregate (all families) over the synthetic corpus
matching $GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {stage: sec}, "sf": ..., "num_cpus": N,
   "battles": n, "battles_per_sec": r}

--scaling: runs the same job in two fresh processes (num_cpus=8 and 32) and
prints both throughputs plus scaling efficiency (BASELINE.md criterion).

Corpus synthesis is one-time and untimed (cached under /tmp/stats_ray_corpus);
an untimed warm-up read precedes measurement so page-cache effects don't
pollute the first stage.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray
    import ray.data
    from ray.data import DataContext

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from stats_ray import synth
    from stats_ray.pipelines import usage as pl

    corpus = synth.ensure_corpus(sf_dir)  # untimed, cached
    n_battles = ray.data.read_parquet(f"{corpus}/battles").count()  # warms cache

    queries: dict[str, float] = {}
    t_all = time.time()

    t0 = time.time()
    parsed = pl.parse_pipeline(corpus).materialize()
    queries["parse"] = round(time.time() - t0, 3)

    for name, fn in pl.AGG_FAMILIES.items():
        t0 = time.time()
        fn(parsed).count()
        queries[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_all, 3)
    return {
        "metric": "flagship battle pipeline (parse+enrich+aggregate) wall sec",
        "value": total, "unit": "sec", "queries": queries,
        "sf": synth.sf_of_dir(sf_dir), "num_cpus": ncpus,
        "battles": n_battles,
        "battles_per_sec": round(n_battles / queries["parse"], 1),
        "pipeline_battles_per_sec": round(n_battles / total, 1),
    }


def run_scaling() -> dict:
    """Same input, two parallelism levels in fresh processes (N vs 4N)."""
    lo, hi = 8, 32
    out = {}
    for n in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True, check=True)
        out[n] = json.loads(r.stdout.strip().splitlines()[-1])
    t_lo, t_hi = out[lo]["value"], out[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (fresh ray.init at 8 vs 32 CPUs)",
        "sf": out[lo]["sf"], "battles": out[lo]["battles"],
        f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
        f"battles_per_sec_{lo}": out[lo]["pipeline_battles_per_sec"],
        f"battles_per_sec_{hi}": out[hi]["pipeline_battles_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "queries": {f"cpus_{k}": v["queries"] for k, v in out.items()},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray
        ray.shutdown()
        print(json.dumps(result))
