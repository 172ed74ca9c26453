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
