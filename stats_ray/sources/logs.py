"""Raw battle-log tree ingestion — the S2 front-end.

The reference reads stored logs straight off the filesystem hierarchy
``<root>/<format>/<YYYY-MM-DD>/battle-<format>-<N>.log.json(.gz)``:
`logs/src/storage.ts:33-56` lists format/day directories and selects an
inclusive ``begin <= day <= end`` range with numeric collation, and
`logs/src/fs.ts:31-47,70-78` reads each file with transparent gunzip.
This module maps that tree onto the engine's tokens contract
``(doc_id, tokens: list<int32>, n_tok, source = "format/YYYY-MM-DD")`` so
every downstream pipeline (parse, anon, binary db, reports) runs on raw
logs unchanged.

Scale shape: the driver only LISTS the tree (directory metadata — the
same altitude as the reference's readdir); file BYTES are read inside
``read_binary_files`` tasks, and gunzip + JSON canonicalization + byte
tokenization run per batch in ``map_batches``. Format/day/doc_id are
derived from each file's own path inside the task (no driver-side
per-file state is broadcast), and begin/end/formats prune at the
listing, so out-of-range days never leave storage.
"""

from __future__ import annotations

import gzip
import json
import os
import re

import pyarrow as pa
from ray.data import Dataset

from ..tokens import canonical_json, encode_strings

_LOG_SUFFIXES = (".log.json", ".log.json.gz")

_NUM_RE = re.compile(r"(\d+)")


def _numeric_key(name: str):
    """Numeric-collation sort key (O8): the reference lists with
    Intl.Collator(numeric) so battle-x-2 precedes battle-x-10
    (logs/src/storage.ts CMP)."""
    return [int(p) if p.isdigit() else p for p in _NUM_RE.split(name)]


def _strip_suffix(name: str) -> str:
    return name[:-len(".log.json.gz")] if name.endswith(".gz") \
        else name[:-len(".log.json")]


def list_log_tree(root: str, *, begin: str | None = None,
                  end: str | None = None,
                  formats: list[str] | None = None) -> list[str]:
    """Enumerate log file paths. Mirrors `LogFileStorage.select`
    (storage.ts:41-56): every format dir under root, each day dir kept iff
    begin <= day <= end (both inclusive; zero-padded ISO days collate
    correctly as plain strings), files sorted for deterministic shard
    membership."""
    paths: list[str] = []
    # dedup the allowlist: a repeated format would list (and ingest) every
    # one of its files once per occurrence
    fmts = sorted(set(formats)) if formats else sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    for fmt in fmts:
        fmt_dir = os.path.join(root, fmt)
        if not os.path.isdir(fmt_dir):
            raise FileNotFoundError(f"log tree has no format dir: {fmt_dir}")
        for day in sorted(d for d in os.listdir(fmt_dir)
                          if os.path.isdir(os.path.join(fmt_dir, d))):
            if begin and day < begin:
                continue
            if end and day > end:
                continue
            day_dir = os.path.join(fmt_dir, day)
            paths.extend(os.path.join(day_dir, name)
                         for name in sorted(os.listdir(day_dir),
                                            key=_numeric_key)
                         if name.endswith(_LOG_SUFFIXES))
    return paths


def tree_fingerprint(root: str, *, begin: str | None = None,
                     end: str | None = None,
                     formats: list[str] | None = None) -> str:
    """Cheap content fingerprint of the selected slice of a log tree:
    blake2b over every selected file's (relative path, size, mtime_ns).
    One driver-side walk (the same one ingestion does), no file reads —
    used by the --from-logs ingest marker so files that ARRIVE after the
    first ingest within the same (root, begin, end, formats) selection
    force a re-ingest instead of being silently excluded forever."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    for p in list_log_tree(root, begin=begin, end=end, formats=formats):
        st = os.stat(p)
        h.update(f"{os.path.relpath(p, root)}\0{st.st_size}\0"
                 f"{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _tokenize_logs(t: pa.Table) -> pa.Table:
    """Batch kernel: raw file bytes -> tokens-contract rows. Gunzip is
    per-file (transparent, fs.ts:70-72); the JSON canonicalization matches
    the synth corpus exactly (sorted keys, compact separators), so the
    per-row invariant decode -> re-encode == tokens holds for raw-ingested
    rows too. format/day/doc_id come from the file's own path segments."""
    docs, ids, srcs = [], [], []
    for p, b in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
        # Transparent gunzip (fs.ts:70-72) — sniff the gzip magic rather
        # than the extension: Ray's read_binary_files may already have
        # decompressed .gz via Arrow's detection, and JSON bytes can never
        # start with \x1f\x8b, so the sniff is correct either way.
        if b[:2] == b"\x1f\x8b":
            b = gzip.decompress(b)
        doc = json.loads(b)
        day_dir, name = os.path.split(p)
        fmt_dir, day = os.path.split(day_dir)
        fmt = os.path.basename(fmt_dir)
        docs.append(canonical_json(doc))
        ids.append(_strip_suffix(name))
        srcs.append(f"{fmt}/{day}")
    tokens = encode_strings(docs)
    n_tok = pa.compute.list_value_length(tokens).cast(pa.int32())
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "tokens": tokens,
                     "n_tok": n_tok,
                     "source": pa.array(srcs, pa.string())})


def read_logs_tree(root: str, *, begin: str | None = None,
                   end: str | None = None,
                   formats: list[str] | None = None) -> Dataset:
    """Dataset over a raw log tree in the battles/tokens contract.

    The result is schema-identical to ``read_battles`` on the Parquet
    corpus, so ``parse_pipeline`` / ``anonymize_pipeline`` / ``binary_db``
    consume it unchanged."""
    import ray.data

    paths = list_log_tree(root, begin=begin, end=end, formats=formats)
    if not paths:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_tok": pa.array([], pa.int32()),
            "source": pa.array([], pa.string())}))
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_tokenize_logs, batch_format="pyarrow")


def write_log_tree(ds_or_table, root: str, *, gz_every: int = 0) -> int:
    """Inverse helper (tests / fixtures): write tokens-contract rows back
    out as a raw log tree. ``gz_every=N`` gzips every Nth file to exercise
    the transparent-gunzip path. Returns files written."""
    from ..tokens import decode_column

    if isinstance(ds_or_table, Dataset):
        tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                  for b in ds_or_table.iter_batches(batch_format="pyarrow")]
    else:
        tables = [ds_or_table]
    n = 0
    for t in tables:
        texts = decode_column(t["tokens"])
        for i in range(len(t)):
            doc_id = t["doc_id"][i].as_py()
            fmt, day = t["source"][i].as_py().split("/", 1)
            d = os.path.join(root, fmt, day)
            os.makedirs(d, exist_ok=True)
            payload = texts[i].encode("utf-8")
            if gz_every and n % gz_every == 0:
                with open(os.path.join(d, f"{doc_id}.log.json.gz"),
                          "wb") as f:
                    f.write(gzip.compress(payload))
            else:
                with open(os.path.join(d, f"{doc_id}.log.json"), "wb") as f:
                    f.write(payload)
            n += 1
    return n
