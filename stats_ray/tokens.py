"""Token codec: battle-log JSON document <-> list<int32> token sequence.

The engine's input contract (BASELINE.json input_hint) is a Parquet table of
pre-tokenized sequences (doc_id, tokens:list<int32>, n_tok, source). Our
vocabulary is deterministic and invertible: UTF-8 bytes of the canonically
serialized document (sorted keys, compact separators), one token per byte.
Per-row invariant: decode -> re-encode reproduces `tokens` exactly.

Decode/encode are vectorized over Arrow list columns (numpy views over the
flattened values buffer — no per-token Python).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def canonical_json(doc: dict) -> str:
    return json.dumps(doc, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def encode_doc(doc: dict) -> np.ndarray:
    """dict -> int32 token array."""
    return np.frombuffer(canonical_json(doc).encode("utf-8"), dtype=np.uint8).astype(np.int32)


def encode_str(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.int32)


def _list_array(col) -> pa.ListArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def decode_column(col) -> list[str]:
    """Arrow list<int32> column -> list of decoded document strings.

    One numpy cast for the whole flattened buffer, then per-row slicing of a
    single bytes object (no per-token work).
    """
    arr = _list_array(col)
    if isinstance(arr, pa.LargeListArray):
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    # offsets index into the (unsliced) child values array directly
    buf = values.astype(np.uint8).tobytes()
    return [buf[offsets[i]:offsets[i + 1]].decode("utf-8") for i in range(len(arr))]


def encode_strings(strs: list[str]) -> pa.ListArray:
    """list of strings -> Arrow list<int32> token column (vectorized)."""
    bufs = [s.encode("utf-8") for s in strs]
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    offsets = np.zeros(len(bufs) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat))
