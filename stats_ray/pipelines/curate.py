"""Resumable document-curation pipeline: clean -> pack -> sharded Parquet.

The LLM-data counterpart of `pipelines.usage.run_flagship`: every stage is
a checkpointed partition (state/checkpoints.py Manifest — lineage + row/wall
metrics, atomic rename), so a rerun after a crash skips completed stages.
Output layout:

  <out_dir>/clean/    (doc_id, status)       — per-doc gate accounting
  <out_dir>/packed/   shard=NN/*.parquet     — (doc_id, n_tokens,
                      prefix_tokens, seq_id) for the survivors, hive-
                      partitioned by shard = seq_id % n_shards so a reader
                      (or a failed export rerun) addresses one shard at a
                      time and no single file is corpus-sized.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def run_curation(sf_dir: str, out_dir: str, *, capacity: int = 512,
                 n_shards: int = 16) -> dict[str, int]:
    from .. import __version__
    from ..ops.decontam import clean_corpus
    from ..state.checkpoints import Manifest

    manifest = Manifest(out_dir, lineage={"sf_dir": sf_dir,
                                          "capacity": capacity,
                                          "n_shards": n_shards,
                                          "engine": __version__})

    def do_clean(tmp: str) -> dict:
        # persist the gate's token counts so the pack stage reuses this
        # output instead of re-running the whole gate pipeline
        clean_corpus(sf_dir, with_counts=True).write_parquet(tmp)
        return {"rows": ray.data.read_parquet(tmp).count()}

    clean_dir = manifest.partition_dir("clean")

    def do_pack(tmp: str) -> dict:
        from ..ops.text import pack_sequences
        kept = (ray.data.read_parquet(clean_dir,
                                      columns=["doc_id", "status",
                                               "n_tokens"])
                .filter(expr="status == 'kept'"))
        packed = pack_sequences(sf_dir, capacity=capacity, counts_in=kept)

        def shard(df: pd.DataFrame) -> pd.DataFrame:
            df["shard"] = (df["seq_id"] % n_shards).astype("int64")
            return df

        (packed.map_batches(shard, batch_format="pandas")
               .write_parquet(tmp, partition_cols=["shard"]))
        return {"rows": ray.data.read_parquet(tmp).count()}

    counts = {}
    counts["clean"] = manifest.run("clean", do_clean)["metrics"]["rows"]
    counts["packed"] = manifest.run("packed", do_pack)["metrics"]["rows"]
    return counts
