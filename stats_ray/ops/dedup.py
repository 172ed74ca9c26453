"""Deduplication operators over the `documents` table.

- exact:        content-hash partition + per-group first   (SQL oracle)
- minhash+LSH:  shingle -> minhash -> banded groupby -> verified pairs
- simhash:      64-bit simhash, banded hamming candidate pairs
- n-gram jaccard: exact verification kernel (used by both LSH paths)
- embedding near-dup: see ops.ann

Scale shape: every candidate-generation step is a map_batches explode
followed by a hash groupby on the bucket key — no all-pairs stage ever
materializes; only same-bucket pairs are verified. At 100 TB the bucket
groupby is the shuffle; buckets are salted by construction (band_id is part
of the key).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data
from ray.data import Dataset

from .text import read_documents

# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(sf_dir: str) -> Dataset:
    """(md5, keep_doc_id = min doc_id, n copies) per distinct content."""
    from ray.data.aggregate import Count, Min

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "md5": df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()),
        })

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        hash_batch, batch_format="pandas")
    return ds.groupby("md5").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n"))


# ---------------------------------------------------------------------------
# shingles + minhash

def _shingle_set(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def _hash64(s: str) -> np.uint64:
    return np.uint64(int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                                    "little"))


class MinHasher:
    """num_perm minhash signatures via the (a*x+b) mod p universal family.
    Coefficients are seeded-deterministic; built once per actor."""

    P = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rs = np.random.RandomState(seed)
        self.a = rs.randint(1, 1 << 31, size=num_perm).astype(np.uint64) * 2 + 1
        self.b = rs.randint(0, 1 << 31, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        hs = np.fromiter((_hash64(s) for s in shingles), dtype=np.uint64,
                         count=len(shingles))
        # (a * h + b) mod p, rowwise min
        vals = (self.a[None, :] * hs[:, None] + self.b[None, :]) % self.P
        return vals.min(axis=0)


class MinHashBands:
    """doc -> (band_id, band_hash) rows for LSH bucketing."""

    def __init__(self, num_perm: int = 64, bands: int = 16):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.mh.signature(_shingle_set(text.split()))
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(hashlib.blake2b(chunk.tobytes(),
                                                digest_size=8).hexdigest())
        return pd.DataFrame({"doc_id": out_doc, "band": np.array(out_band, np.int32),
                             "band_hash": out_hash})


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def minhash_dup_pairs(sf_dir: str, threshold: float = 0.5,
                      num_perm: int = 64, bands: int = 16) -> pd.DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact shingle Jaccard.

    Candidate generation is fully distributed (banded groupby); the verify
    step re-reads only candidate docs (broadcast of the candidate id set)."""
    docs = read_documents(sf_dir, ["doc_id", "text"])
    banded = docs.map_batches(MinHashBands,
                              fn_constructor_kwargs={"num_perm": num_perm,
                                                     "bands": bands},
                              batch_format="pandas", concurrency=(1, 8))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        ids = np.asarray(ids)
        return pd.DataFrame({"id1": ids[a], "id2": ids[b]})

    cands = (banded.groupby(["band", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    cand_df = cands.to_pandas().drop_duplicates()
    if cand_df.empty:
        return pd.DataFrame({"id1": [], "id2": [], "jaccard": []})

    # verify: fetch texts of candidate docs only (small side), exact jaccard
    need = set(cand_df["id1"]) | set(cand_df["id2"])
    texts = (docs.map_batches(
        lambda df: df[df["doc_id"].isin(need)], batch_format="pandas")
        .to_pandas().set_index("doc_id")["text"].to_dict())
    sh = {i: _shingle_set(t.split()) for i, t in texts.items()}
    jac = [jaccard(sh[i], sh[j]) for i, j in zip(cand_df["id1"], cand_df["id2"])]
    cand_df = cand_df.assign(jaccard=np.round(jac, 6))
    return (cand_df[cand_df["jaccard"] >= threshold]
            .sort_values(["id1", "id2"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# simhash

class SimHash:
    """64-bit simhash over token hashes; emits 4 x 16-bit bands for
    hamming-distance candidate bucketing."""

    def __init__(self):
        pass

    @staticmethod
    def _simhash(tokens: list[str]) -> np.uint64:
        if not tokens:
            return np.uint64(0)
        hs = np.fromiter((_hash64(t) for t in tokens), dtype=np.uint64,
                         count=len(tokens))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i in np.nonzero(vote > 0)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = df["text"].map(lambda t: self._simhash(t.split())).astype("uint64")
        out = {"doc_id": df["doc_id"], "simhash": sigs}
        for b in range(4):
            out[f"band{b}"] = (sigs.to_numpy() >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        return pd.DataFrame(out)


def simhash_signatures(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        SimHash, batch_format="pandas", concurrency=(1, 8))


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 8) -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, candidates via
    the 4-band pigeonhole (any identical 16-bit band)."""
    sigs = simhash_signatures(sf_dir)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64"),
                                 "h1": pd.Series(dtype="uint64"),
                                 "h2": pd.Series(dtype="uint64")})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id1": ids[a], "id2": ids[b], "h1": hs[a], "h2": hs[b]})

    frames = []
    for b in range(4):
        cands = (sigs.select_columns(["doc_id", "simhash", f"band{b}"])
                 .groupby(f"band{b}")
                 .map_groups(bucket_pairs, batch_format="pandas"))
        frames.append(cands.to_pandas())
    cand = pd.concat(frames, ignore_index=True).drop_duplicates(["id1", "id2"])
    if cand.empty:
        return pd.DataFrame({"id1": [], "id2": [], "hamming": []})
    x = cand["h1"].to_numpy().astype(np.uint64) ^ cand["h2"].to_numpy().astype(np.uint64)
    ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
    cand = cand.assign(hamming=ham)
    return (cand[cand["hamming"] <= max_hamming][["id1", "id2", "hamming"]]
            .sort_values(["id1", "id2"]).reset_index(drop=True))
