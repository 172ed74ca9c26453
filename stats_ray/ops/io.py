"""Shared parquet read helper for the driver-provided tables.

The harness-written testdata parquet files carry a ``b'pandas'`` schema
metadata blob (they were written via pandas). Schemas with metadata are
unhashable in this pyarrow build, so every shuffle reduce downstream of
such a read logs "Failed to hash the schemas (for deduplication)" and
falls back to the slow unify path. Stripping the metadata is a zero-copy
schema rewrite, so every table read goes through here.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data import Dataset


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def strip_schema_metadata(ds: Dataset) -> Dataset:
    """Zero-copy schema-metadata strip; fuses with downstream map stages."""
    return ds.map_batches(_strip_meta, batch_format="pyarrow",
                          zero_copy_batch=True)


def read_table(sf_dir: str, name: str, columns=None) -> Dataset:
    """Read one driver table with a metadata-free explicit schema.

    Passing the schema (one local footer read) means the read tasks
    themselves emit clean blocks — a post-read strip stage would still
    leave the warning inside ReadParquet's own schema dedup."""
    import pyarrow.parquet as pq
    path = f"{sf_dir}/{name}.parquet"
    full = pq.read_schema(path)
    fields = [full.field(c).remove_metadata() for c in (columns or full.names)]
    return ray.data.read_parquet(path, schema=pa.schema(fields),
                                 columns=list(columns) if columns else None)


def compact_parquet(in_dir: str, out_dir: str, target_mb: int = 256,
                    partition_cols: list | None = None) -> dict:
    """Small-file compaction — the operational fix for the reference's
    core pain (10M+ battle-log files/month, logs/DESIGN.md:6-7): read a
    directory of many tiny Parquet files, re-emit it as files sized near
    `target_mb` (per partition value when `partition_cols` is given).

    Shape: ONE streaming read -> repartition to ceil(bytes/target)
    blocks -> one write. `repartition` without shuffle=True only splits /
    coalesces block boundaries (no all-to-all of the data), so the cost
    is a copy through the object store, not an exchange. Returns
    {files_in, files_out, bytes} accounting."""
    import glob
    import os

    files_in = len([p for p in
                    glob.glob(os.path.join(in_dir, "**", "*"),
                              recursive=True) if os.path.isfile(p)])
    ds = ray.data.read_parquet(in_dir)
    total = ds.size_bytes() or 1
    n_blocks = max(1, -(-total // (target_mb * 1024 * 1024)))
    ds = ds.repartition(int(n_blocks))
    if partition_cols:
        ds.write_parquet(out_dir, partition_cols=list(partition_cols))
    else:
        ds.write_parquet(out_dir)
    files_out = len([p for p in
                     glob.glob(os.path.join(out_dir, "**", "*"),
                               recursive=True) if os.path.isfile(p)])
    return {"files_in": files_in, "files_out": files_out,
            "bytes": int(total)}
