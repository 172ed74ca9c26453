"""Self-report the FULL query registry vs the DuckDB oracles.

The evaluation driver samples a prefix of ``__ray_entry__.queries()`` into
``CORRECTNESS_r{N}.json``; this script runs every entry and writes the same
per-query record shape to ``CORRECTNESS_SELF.json`` so each round carries a
complete machine-readable correctness artifact regardless of what the
driver sampled.

Usage: python selfcheck.py [--sf-dir DIR] [--out FILE] [query ...]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(df):
    """Driver-equivalent normalization: sort columns by name, widen ints/
    floats, stringify the rest, sort rows."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(df, pa.Table):
        df = df.to_pandas()
    if hasattr(df, "to_pandas") and not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "CORRECTNESS_SELF.json"))
    p.add_argument("queries", nargs="*")
    args = p.parse_args(argv)

    import duckdb
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    qs = E.queries()
    if args.sf_dir.rstrip("/").endswith("sf0.01"):
        oracles = E.oracle_sql()
    else:
        # battle oracles read ground truth from the SYNTH corpus for this
        # scale factor (materialized on demand), not from sf_dir itself
        from stats_ray import synth
        oracles = E.oracle_sql_for(synth.ensure_corpus(args.sf_dir))
    con = duckdb.connect()
    for t in TABLES:
        # battle-only sweeps run at scale factors that exist ONLY as a
        # synth corpus (no testdata tables) — register what's present
        if os.path.exists(f"{args.sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{args.sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    fails = 0
    for name in (args.queries or list(qs)):
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            got = _norm(qs[name](args.sf_dir))
            rec["spark_rows"] = int(len(got))
            if name in oracles:
                exp = _norm(con.execute(oracles[name]).df())
                rec["oracle_rows"] = int(len(exp))
                rec["rows_match"] = len(got) == len(exp)
                rec["schema_match"] = list(got.columns) == list(exp.columns)
                rec["hash_match"] = (rec["rows_match"] and
                                     rec["schema_match"] and got.equals(exp))
                if not rec["hash_match"]:
                    fails += 1
            else:
                rec["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001 — per-query fault isolation
            rec["err"] = f"{type(e).__name__}: {e}"
            fails += 1
        results[name] = rec
        status = ("ERR " + rec["err"] if rec["err"] not in (None, "no_oracle")
                  else "rows-only" if rec["err"] == "no_oracle"
                  else "OK" if rec["hash_match"] else "FAIL")
        print(f"{name}: {status} rows={rec['spark_rows']}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    exact = sum(1 for r in results.values() if r["hash_match"])
    print(json.dumps({"queries": len(results), "exact_ok": exact,
                      "rows_only": sum(1 for r in results.values()
                                       if r["err"] == "no_oracle"),
                      "fails": fails, "out": args.out}))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
