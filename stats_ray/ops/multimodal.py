"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with struct metadata; decode /
resize / frame-sample are actor-pool map_batches stages. The actual codec
libraries are not in this container, so the decode kernel is STUBBED:
`ImageDecode(fake=False)` raises NotImplementedError, while `fake=True`
substitutes a deterministic byte-statistics "decode" so the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested.

Scale notes: binary payloads force small `batch_size` (payload x batch x
concurrency must fit worker heaps) and a larger `target_max_block_size` so
blocks aren't split absurdly small; both are exposed as knobs here.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("sample_rate", pa.int32()), ("n_frames", pa.int32())])),
])


def synthesize_media(n: int = 256, seed: int = 5) -> Dataset:
    """Deterministic fake media table (stands in for a real binary source)."""
    def gen(t: pa.Table) -> pa.Table:
        ids = t["id"].to_pylist()
        rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
        for i in ids:
            rng = np.random.RandomState(seed * 100003 + i)
            kind = ("image", "audio", "video")[i % 3]
            size = int(rng.randint(1_000, 20_000))
            rows["media_id"].append(f"m{i:06d}")
            rows["kind"].append(kind)
            rows["payload"].append(rng.bytes(size))
            rows["meta"].append({"width": int(rng.randint(16, 512)),
                                 "height": int(rng.randint(16, 512)),
                                 "sample_rate": 16000 if kind == "audio" else 0,
                                 "n_frames": int(rng.randint(1, 300))
                                             if kind == "video" else 1})
        return pa.table(rows, schema=MEDIA_SCHEMA)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow",
                                         batch_size=64)


class ImageDecode:
    """Actor-pool decode stage. Real decode requires PIL/ffmpeg (absent here):
    construct with fake=True for the deterministic byte-stats stand-in."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image/audio decode requires codec libraries not present in "
                "this container; construct ImageDecode(fake=True) for the "
                "deterministic stand-in")
        payloads = t["payload"].to_pylist()
        feats = []
        for p in payloads:
            a = np.frombuffer(p, dtype=np.uint8)
            feats.append({
                "n_bytes": int(a.size),
                "mean_byte": float(a.mean()),
                "std_byte": float(a.std()),
                "digest": hashlib.blake2b(p, digest_size=8).hexdigest(),
            })
        return pa.table({
            "media_id": t["media_id"], "kind": t["kind"],
            "features": pa.array(feats, type=pa.struct([
                ("n_bytes", pa.int64()), ("mean_byte", pa.float64()),
                ("std_byte", pa.float64()), ("digest", pa.string())])),
        })


def media_features(n: int = 256, *, batch_size: int = 32,
                   concurrency=(1, 4)) -> Dataset:
    """synthesize -> actor-pool decode (fake) -> features table."""
    return synthesize_media(n).map_batches(
        ImageDecode, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def documents_as_media(sf_dir: str) -> Dataset:
    """Wrap the documents table as a media table: each doc's UTF-8 bytes
    become the opaque payload (the deterministic stand-in for a real binary
    source — same schema, batch-size and actor contract as real media)."""
    def wrap(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        kinds = [("image", "audio", "video")[i % 3] for i in ids]
        return pa.table({
            "media_id": pa.array([f"d{i}" for i in ids]),
            "kind": pa.array(kinds),
            "payload": pa.array([s.encode() for s in texts], type=pa.binary()),
            "meta": pa.array([{"width": 0, "height": 0,
                               "sample_rate": 16000 if k == "audio" else 0,
                               "n_frames": 1} for k in kinds],
                             type=MEDIA_SCHEMA.field("meta").type),
        }, schema=MEDIA_SCHEMA)

    from .io import read_table
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]
                      ).map_batches(wrap, batch_format="pyarrow", batch_size=64)


def document_media_features(sf_dir: str):
    """Driver query for the multimodal plumbing: payload -> actor-pool
    decode (deterministic fake) -> per-item features. The byte-statistics
    columns are SQL-expressible, so this surface is oracle-checked; the
    digest column is pinned by pytest instead."""
    import pandas as pd

    ds = documents_as_media(sf_dir).map_batches(
        ImageDecode, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 4))

    def project(t: pa.Table) -> pa.Table:
        f = t["features"].combine_chunks()
        mean = np.asarray(f.field("mean_byte"))
        r = np.sign(mean) * np.floor(np.abs(mean) * 1e4 + 0.5) / 1e4
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "n_bytes": f.field("n_bytes"),
            "mean_byte": pa.array(r),
        })

    return ds.map_batches(project, batch_format="pyarrow").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
