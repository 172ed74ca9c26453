"""Training-data export: seeded global shuffle + sharded Parquet layout.

The last stage of a curation pipeline: deal the corpus into N shards in a
deterministic pseudo-random order so downstream trainers stream shards
round-robin and see a well-mixed corpus without any global
`random_shuffle` (an all-to-all exchange of every byte — the single most
expensive operation at 100 TB).

Shape:
- shard assignment and intra-shard order are CONTENT-ADDRESSED:
  h = md5(f"{seed}:{doc_id}"); shard = int(h[:8], 16) % n_shards and rows
  within a shard sort by the hex digest. Deterministic across runs,
  engines, cluster sizes and repartitioning — the same property
  `ops/text.sample_deterministic` uses, so resumes and re-runs produce
  byte-identical shards. Changing `seed` is a fresh shuffle.
- the only exchange is ONE hash shuffle keyed by the small int ``shard``
  column (the bucketed exchange with nbuckets = n_shards); each shard's
  rows are then ordered by a LOCAL ``sort_values(sort_key)`` inside its
  bucket.  No global range sort: a global ``sort(["shard","sort_key"])``
  would sample boundaries and range-partition every corpus byte — the
  hash exchange moves the same bytes exactly once with no sample stage.
  Partitioning assumption (documented per the 100-TB contract): pick
  ``n_shards`` so one shard fits a worker's heap — required anyway for
  trainers that stream a shard sequentially.
- the write is ONE `write_parquet(partition_cols=["shard"])` pass (hive
  layout, one directory per shard -> a failed run resumes by skipping
  finished shard directories; never one giant file). The internal
  ``sort_key`` is dropped before the write — it is recomputable from
  (seed, doc_id) and is not part of the export contract.
- the accounting output (per shard: docs, chars, hash range) is a 16-row
  rollup — in-batch partials, then a shard-keyed reduce.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from ray.data import Dataset

from ..exchange import bucketed_group_map
from .text import read_documents


def _assign(df: pd.DataFrame, seed: int, n_shards: int) -> pd.DataFrame:
    h = df["doc_id"].map(
        lambda i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
    out = df.copy()
    out["sort_key"] = h
    out["shard"] = (h.str.slice(0, 8).map(lambda s: int(s, 16))
                    % n_shards).astype("int64")
    return out


def export_shards(sf_dir: str, n_shards: int = 16, seed: int = 7,
                  out_dir: str | None = None) -> Dataset:
    """Shard the documents table and (optionally) write the hive-partitioned
    Parquet export; returns the per-shard accounting Dataset
    (shard, n_docs, n_chars, min_key, max_key)."""
    docs = read_documents(sf_dir, ["doc_id", "text", "n_chars"])
    assigned = docs.map_batches(lambda df: _assign(df, seed, n_shards),
                                batch_format="pandas")

    if out_dir is not None:
        def order_shard(g: pd.DataFrame) -> pd.DataFrame:
            # one KEY group == one shard; local sort, no global exchange
            return (g.sort_values("sort_key", kind="mergesort")
                    .drop(columns=["sort_key"]))

        (bucketed_group_map(assigned, ["shard"], order_shard,
                            nbuckets=n_shards, per_group=True)
         .write_parquet(out_dir, partition_cols=["shard"]))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("shard", as_index=False)
                .agg(n_docs=("doc_id", "size"), n_chars=("n_chars", "sum"),
                     min_key=("sort_key", "min"), max_key=("sort_key", "max")))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "shard": [int(g["shard"].iloc[0])],
            "n_docs": [int(g["n_docs"].sum())],
            "n_chars": [int(g["n_chars"].sum())],
            "min_key": [g["min_key"].min()],
            "max_key": [g["max_key"].max()],
        })

    return (assigned.map_batches(partial, batch_format="pandas")
            .groupby("shard").map_groups(final, batch_format="pandas"))
