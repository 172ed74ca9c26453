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
import pyarrow as pa
import ray.data
from ray.data import Dataset

from ..exchange import bucketed_agg, bucketed_group_map

from .text import read_documents

# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(sf_dir: str) -> Dataset:
    """(md5, keep_doc_id = min doc_id, n copies) per distinct content.

    md5 cardinality ~= corpus size, so the finish goes through the bucketed
    exchange (per-batch partials first — duplicate-heavy batches shrink
    before the shuffle)."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
        return (pd.DataFrame({"md5": h, "keep_doc_id": df["doc_id"],
                              "n": np.int64(1)})
                .groupby("md5", as_index=False)
                .agg(keep_doc_id=("keep_doc_id", "min"), n=("n", "sum")))

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        hash_batch, batch_format="pandas")
    return bucketed_agg(ds, ["md5"],
                        {"keep_doc_id": ("keep_doc_id", "min"),
                         "n": ("n", "sum")})


# ---------------------------------------------------------------------------
# shingles + minhash

def _shingle_set(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def _hash64(s: str) -> np.uint64:
    """Scalar 64-bit string hash — kept for tests/one-off keys only; hot
    paths use the vectorized batch kernels below (one C pass per batch
    instead of one Python hashlib call per shingle)."""
    return np.uint64(int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                                    "little"))


def _hash_str_array(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a string array (pandas' SipHash-based
    ``hash_array`` — a single Cython pass with value interning, so repeated
    words hash once). This is the batch replacement for per-element
    ``hashlib`` calls, the dominant compute of the 100-TB near-dup path."""
    a = np.asarray(arr, dtype=object)
    if len(a) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(a)


def _flat_words(texts, tokenize=None) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize every doc (default: whitespace split); return (flat object
    array of all words in doc order, int64 word count per doc)."""
    words = [tokenize(t) for t in texts] if tokenize else \
        [t.split() for t in texts]
    lens = np.fromiter((len(w) for w in words), dtype=np.int64,
                       count=len(words))
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for w in words:
        flat[pos:pos + len(w)] = w
        pos += len(w)
    return flat, lens


def _fold_k(hw: np.ndarray, k: int) -> np.ndarray:
    """Order-sensitive fold of every k consecutive 64-bit hashes into one
    (vectorized over all window positions): acc <- mix64(acc) ^ next."""
    m = len(hw) - k + 1
    acc = hw[:m].copy()
    for j in range(1, k):
        acc = _mix64(acc) ^ hw[j:j + m]
    return acc


def _batch_shingle_hashes(texts: list[str], k: int = 3
                          ) -> tuple[np.ndarray, np.ndarray]:
    """64-bit k-word shingle hashes for a whole batch in vectorized passes:
    ONE string-hash pass over all words, then k-1 mix/xor folds over the
    global window array with doc-boundary windows masked out. Returns
    (hashes uint64, doc index int64 per hash), sorted by doc index.

    Mirrors `_shingle_set` semantics hash-side: docs with 0 < n < k words
    contribute ONE shingle (the fold of all their words — the old
    whole-doc shingle); empty docs contribute none. Multiplicity is kept
    (minhash is multiset-invariant; set consumers np.unique per doc)."""
    flat, lens = _flat_words(texts)
    ndocs = len(lens)
    hw = _hash_str_array(flat)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    total = len(hw)
    parts_h, parts_d = [], []
    if total >= k:
        win = _fold_k(hw, k)
        valid = doc_of[:total - k + 1] == doc_of[k - 1:]
        parts_h.append(win[valid])
        parts_d.append(doc_of[:total - k + 1][valid])
    short = np.nonzero((lens > 0) & (lens < k))[0]
    if len(short):
        offs = np.concatenate(([0], np.cumsum(lens)))
        sh = np.empty(len(short), dtype=np.uint64)
        for i, d in enumerate(short):       # <= k-1 words each, rare docs
            seg = hw[offs[d]:offs[d + 1]]
            acc = seg[0]
            for x in seg[1:]:
                acc = (_mix64(np.asarray([acc], dtype=np.uint64)) ^ x)[0]
            sh[i] = acc
        parts_h.append(sh)
        parts_d.append(short.astype(np.int64))
    if not parts_h:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    h = np.concatenate(parts_h)
    d = np.concatenate(parts_d)
    order = np.argsort(d, kind="stable")
    return h[order], d[order]


class MinHasher:
    """num_perm minhash signatures via the (a*x+b) mod 2^64 family: `a` is
    odd, so each permutation is a bijection on uint64 and the min is a
    valid minwise sample — and the wrapping multiply vectorizes where a
    mod-prime pays a hardware division per element (measured 7x).
    Coefficients are seeded-deterministic; built once per actor."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rs = np.random.RandomState(seed)
        self.a = rs.randint(1, 1 << 31, size=num_perm).astype(np.uint64) * 2 + 1
        self.b = rs.randint(0, 1 << 31, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signatures(self, hashes: np.ndarray, doc_idx: np.ndarray,
                   ndocs: int) -> np.ndarray:
        """(ndocs, num_perm) signature matrix from batch shingle hashes
        (`_batch_shingle_hashes` output: doc_idx ascending). Shingle-less
        docs get the all-MAX signature. One 1-D multiply/add/reduceat pass
        per permutation: the temps are the shingle vector itself (L2/L3
        resident), ~7x faster than the (n_shingles x perms) 2-D chunks
        whose 50 MB temps are DRAM-bound."""
        sig = np.full((ndocs, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        if len(hashes) == 0:
            return sig
        first = np.nonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])[0]
        present = doc_idx[first]
        tmp = np.empty_like(hashes)
        col = np.empty(len(first), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.num_perm):
                np.multiply(hashes, self.a[i], out=tmp)
                np.add(tmp, self.b[i], out=tmp)
                np.minimum.reduceat(tmp, first, out=col)
                sig[present, i] = col
        return sig


class MinHashBands:
    """doc -> (band_id, band_hash) rows for LSH bucketing; the whole batch
    is shingled, permuted and banded in vectorized passes (no per-shingle
    Python). band_hash is an int64 fold of the band's signature rows —
    fixed-width exchange keys instead of hex strings."""

    def __init__(self, num_perm: int = 64, bands: int = 16):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = list(df["text"])
        h, d = _batch_shingle_hashes(texts)
        sig = self.mh.signatures(h, d, len(texts))
        s3 = sig.reshape(len(texts), self.bands, self.rows_per_band)
        acc = s3[:, :, 0].copy()
        for j in range(1, self.rows_per_band):
            acc = _mix64(acc) ^ s3[:, :, j]
        n = len(texts)
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), self.bands),
            "band": np.tile(np.arange(self.bands, dtype=np.int32), n),
            "band_hash": acc.reshape(-1).view(np.int64),
        })


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class ShingleHashes:
    """doc -> sorted array of 64-bit shingle hashes (one list<uint64> row).

    Jaccard over the hash sets equals shingle-set Jaccard up to 64-bit
    collisions (negligible); arrays ship as Arrow lists, so the verify join
    moves fixed-width buffers, not text. Hashing is the batched vectorized
    kernel; the only per-doc work is one np.unique over its segment."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        h, d = _batch_shingle_hashes(list(df["text"]))
        first = np.nonzero(np.r_[True, d[1:] != d[:-1]])[0] if len(d) \
            else np.empty(0, np.int64)
        bounds = np.r_[first, len(d)]
        seg_of = {int(doc): i for i, doc in enumerate(d[first])} \
            if len(d) else {}
        # serialized as bytes: plain object columns dodge Ray's pandas
        # tensor-extension coercion of ndarray-valued cells
        empty = np.empty(0, np.uint64).tobytes()
        sh = []
        for i in range(len(df)):
            j = seg_of.get(i)
            sh.append(empty if j is None else
                      np.unique(h[bounds[j]:bounds[j + 1]]).tobytes())
        return pd.DataFrame({"doc_id": df["doc_id"], "sh": sh})


def _sorted_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def _attach_by_key(pairs: Dataset, sigs: Dataset, key_col: str,
                   carry: list[str], out_col: str) -> Dataset:
    """Distributed equi-join of one signature column onto pair rows via the
    union + groupby pattern: both sides co-partition on the key with the
    same exchange the aggregate layer uses. (Ray's experimental hash-join
    operator is avoided — it stalls on small local clusters.)

    pairs columns: [id1, id2] + carry; output adds `out_col` (the matched
    doc's shingle array)."""
    cols = ["id1", "id2"] + carry
    # explicit Arrow schemas everywhere: zero-row groups must not emit
    # null-typed byte columns (pandas object -> pa.null()) that diverge
    # from the binary type of non-empty blocks and break block unification
    tagged_schema = pa.schema(
        [("key_", pa.int64()), ("id1", pa.int64()), ("id2", pa.int64())]
        + [(c, pa.binary()) for c in carry]
        + [("sig_", pa.binary()), ("is_sig_", pa.int8())])
    out_schema = pa.schema(
        [("id1", pa.int64()), ("id2", pa.int64())]
        + [(c, pa.binary()) for c in carry] + [(out_col, pa.binary())])

    def tag_pairs(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        arrs = {"key_": df[key_col].to_numpy(dtype=np.int64),
                "id1": df["id1"].to_numpy(dtype=np.int64),
                "id2": df["id2"].to_numpy(dtype=np.int64),
                "sig_": [b""] * n, "is_sig_": np.zeros(n, dtype=np.int8)}
        for c in carry:
            arrs[c] = list(df[c])
        return pa.table({f.name: pa.array(arrs[f.name], type=f.type)
                         for f in tagged_schema})

    def tag_sigs(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        arrs = {"key_": df["doc_id"].to_numpy(dtype=np.int64),
                "id1": np.full(n, -1, dtype=np.int64),
                "id2": np.full(n, -1, dtype=np.int64),
                "sig_": list(df["sh"]), "is_sig_": np.ones(n, dtype=np.int8)}
        for c in carry:
            arrs[c] = [b""] * n
        return pa.table({f.name: pa.array(arrs[f.name], type=f.type)
                         for f in tagged_schema})

    tagged = pairs.map_batches(tag_pairs, batch_format="pandas").union(
        sigs.map_batches(tag_sigs, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pa.Table:
        # vectorized over every key in the bucket: sig lookup via a Series
        # map, pairs whose key has no sig drop (the reference join
        # semantics) — no per-key frames
        sig_rows = df[df["is_sig_"] == 1]
        pair_rows = df[df["is_sig_"] == 0]
        lut = pd.Series(sig_rows["sig_"].to_numpy(),
                        index=sig_rows["key_"].to_numpy())
        lut = lut[~lut.index.duplicated()]
        sig = pair_rows["key_"].map(lut)
        pair_rows = pair_rows[sig.notna()]
        arrs = {"id1": pair_rows["id1"].to_numpy(dtype=np.int64),
                "id2": pair_rows["id2"].to_numpy(dtype=np.int64),
                out_col: list(sig[sig.notna()])}
        for c in carry:
            arrs[c] = list(pair_rows[c])
        return pa.table({f.name: pa.array(arrs[f.name], type=f.type)
                         for f in out_schema})

    return bucketed_group_map(tagged, ["key_"], merge)


def minhash_dup_pairs(sf_dir: str, threshold: float = 0.5,
                      num_perm: int = 64, bands: int = 16) -> pd.DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact shingle Jaccard.

    Fully distributed: banded groupby generates same-bucket candidate
    pairs, a (id1, id2) groupby dedups them, and verification joins the
    docs' shingle-hash arrays onto the pairs (two key-partitioned
    exchanges) and computes Jaccard inside the workers — no driver-side
    text dict or per-pair driver loop. Only the final (small)
    verified-pair table materializes."""
    docs = read_documents(sf_dir, ["doc_id", "text"])
    banded = docs.map_batches(MinHashBands,
                              fn_constructor_kwargs={"num_perm": num_perm,
                                                     "bands": bands},
                              batch_format="pandas", concurrency=(1, 8))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id1": ids[a], "id2": ids[b]})

    cands = bucketed_group_map(banded, ["band", "band_hash"], bucket_pairs,
                               per_group=True)
    # distributed pair dedup (a pair can surface from several bands)
    cands = bucketed_group_map(
        cands, ["id1", "id2"],
        lambda df: df.drop_duplicates(["id1", "id2"]))

    # materialized once: consumed by BOTH attach passes (re-deriving the
    # signatures per consumer would double the actor pools and recompute
    # the shingling; the signature table is fixed-width and spills cleanly)
    sigs = docs.map_batches(ShingleHashes, batch_format="pandas",
                            concurrency=2).materialize()
    j1 = _attach_by_key(cands, sigs, "id1", [], "sh1")
    j2 = _attach_by_key(j1, sigs, "id2", ["sh1"], "sh2")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        jac = np.array([_sorted_jaccard(np.frombuffer(a, dtype=np.uint64),
                                        np.frombuffer(b, dtype=np.uint64))
                        for a, b in zip(df["sh1"], df["sh2"])])
        out = pd.DataFrame({"id1": df["id1"], "id2": df["id2"],
                            "jaccard": np.round(jac, 6)})
        return out[out["jaccard"] >= threshold]

    verified = j2.map_batches(verify, batch_format="pandas").to_pandas()
    if verified.empty:
        return pd.DataFrame({"id1": [], "id2": [], "jaccard": []})
    return verified.sort_values(["id1", "id2"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash

class SimHash:
    """64-bit simhash over token hashes; emits 4 x 16-bit bands for
    hamming-distance candidate bucketing. The whole batch is hashed in one
    vectorized pass and the per-bit votes reduce per doc via add.reduceat —
    no per-token Python."""

    def __init__(self):
        pass

    @staticmethod
    def _simhash_batch(texts: list[str]) -> np.ndarray:
        flat, lens = _flat_words(texts)
        sigs = np.zeros(len(texts), dtype=np.uint64)
        if not len(flat):
            return sigs
        hw = _hash_str_array(flat)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        present = lens > 0
        st = starts[present]
        lp = lens[present]
        packed = np.zeros(len(st), dtype=np.uint64)
        # 16 bit-planes at a time: bounds the (n_words x chunk) temp.
        # int16 halves the memory traffic of the dominant expansion; a doc
        # over 32k words could overflow the int16 segment sum, so such
        # batches fall back to int32.
        bt = np.int16 if lp.max() < 32000 else np.int32
        # extract planes one at a time through a reusable 1-D uint64
        # scratch, casting into the int16 matrix on assignment: peak temp
        # is 8 bytes/word + the 2-byte/word/plane bits matrix, instead of
        # two full (n_words x 16) uint64 temps per group
        scratch = np.empty(len(hw), dtype=np.uint64)
        bits = np.empty((len(hw), 16), dtype=bt)
        for g in range(0, 64, 16):
            shifts = np.arange(g, g + 16, dtype=np.uint64)
            for j, s in enumerate(shifts):
                np.right_shift(hw, s, out=scratch)
                np.bitwise_and(scratch, np.uint64(1), out=scratch)
                bits[:, j] = scratch
            counts = np.add.reduceat(bits, st, axis=0).astype(np.int64)
            votes = 2 * counts - lp[:, None]
            packed |= np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64) << shifts[None, :], axis=1)
        sigs[present] = packed
        return sigs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = self._simhash_batch(list(df["text"]))
        out = {"doc_id": df["doc_id"],
               "simhash": pd.Series(sigs, index=df.index, dtype="uint64")}
        for b in range(4):
            out[f"band{b}"] = (sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        return pd.DataFrame(out)


def simhash_signatures(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        SimHash, batch_format="pandas", concurrency=(1, 8))


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 8,
                      all_pairs_cap: int = 512,
                      window: int = 64) -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, candidates via
    the 4-band pigeonhole (any identical 16-bit band).

    One fused exchange: every doc explodes into 4 (band, value) rows and a
    single groupby buckets all bands together (vs. 4 sequential driver
    passes). Hot buckets are bounded: a bucket of n docs emits all pairs
    only when n <= all_pairs_cap; beyond that it sorts members by full
    simhash and pairs each doc with its next `window` neighbors, so the
    per-bucket pair count is <= max(all_pairs_cap^2/2, n*window) instead of
    O(n^2) — degenerate band values (e.g. near-zero hashes of short docs)
    cannot blow up a worker. Hamming is computed and filtered inside the
    group; only verified pairs leave the bucket."""
    sigs = simhash_signatures(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in range(4):
            frames.append(pd.DataFrame({
                "doc_id": df["doc_id"], "simhash": df["simhash"],
                "band": np.int32(b), "value": df[f"band{b}"]}))
        return pd.concat(frames, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id1": pd.Series(dtype="int64"),
                              "id2": pd.Series(dtype="int64"),
                              "hamming": pd.Series(dtype="int64")})
        g = g.drop_duplicates("doc_id")
        n = len(g)
        if n < 2:
            return empty
        hs = g["simhash"].to_numpy().astype(np.uint64)
        ids = g["doc_id"].to_numpy()
        if n <= all_pairs_cap:
            a, b = np.triu_indices(n, k=1)
        else:
            order = np.argsort(hs, kind="stable")
            ids, hs = ids[order], hs[order]
            offs = np.arange(1, window + 1)
            a = np.repeat(np.arange(n), window)
            b = (a + np.tile(offs, n))
            keep = b < n
            a, b = a[keep], b[keep]
        x = hs[a] ^ hs[b]
        # popcount via 8-bit lookup over the byte view
        bytes_ = x.view(np.uint8).reshape(len(x), 8)
        ham = _POPCOUNT[bytes_].sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        i1, i2 = ids[a[keep]], ids[b[keep]]
        lo, hi = np.minimum(i1, i2), np.maximum(i1, i2)
        return pd.DataFrame({"id1": lo, "id2": hi, "hamming": ham[keep]})

    pairs = bucketed_group_map(exploded, ["band", "value"], bucket_pairs,
                               per_group=True)
    # distributed dedup (a pair can match on several bands)
    pairs = bucketed_group_map(
        pairs, ["id1", "id2"],
        lambda df: df.drop_duplicates(["id1", "id2"]))
    out = pairs.to_pandas()
    if out.empty:
        return pd.DataFrame({"id1": [], "id2": [], "hamming": []})
    return (out[["id1", "id2", "hamming"]]
            .sort_values(["id1", "id2"]).reset_index(drop=True))


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# ---------------------------------------------------------------------------
# incremental dedup: new shard vs seen corpus

def incremental_dedup(sf_dir: str) -> Dataset:
    """Anti-join dedup of a "new" shard against a "seen" corpus: keep the
    new docs whose content hash never appears in the seen set (here the
    deterministic split doc_id % 3 == 0 plays the new shard; the rest is
    the seen corpus).

    Scale shape: tag both sides with their md5, union (no exchange), ONE
    hash co-partition on the digest, emit new ids from groups with no seen
    row — the same union+groupby join the LSH verify uses. Neither side is
    collected or broadcast, so the seen corpus can be 100 TB."""
    docs = read_documents(sf_dir, ["doc_id", "text"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        md5 = df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
        return pd.DataFrame({
            "md5": md5,
            "doc_id": df["doc_id"].astype("int64"),
            "is_new": (df["doc_id"] % 3 == 0).astype("int8"),
        })

    def keep_new_only(df: pd.DataFrame) -> pd.DataFrame:
        # anti-join, vectorized across the bucket: new docs whose digest
        # never appears on the seen side
        seen = df.loc[df["is_new"] == 0, "md5"].unique()
        out = df[(df["is_new"] == 1) & ~df["md5"].isin(seen)]
        return out[["doc_id", "md5"]]

    return bucketed_group_map(docs.map_batches(tag, batch_format="pandas"),
                              ["md5"], keep_new_only)


# ---------------------------------------------------------------------------
# Bloom-filter prefilter (approximate membership, zero false negatives)

_BLOOM_BITS = 1 << 20        # default bitmap size (128 KiB)
_BLOOM_HASHES = 4
_BLOOM_BITS_PER_KEY = 10     # ~1% FP at k=4 hashes (textbook sizing)


def bloom_bits_for(expected_keys: int) -> int:
    """Bitmap size (power of two, >= the 2^20 default) for an expected key
    count at ~_BLOOM_BITS_PER_KEY bits/key — at 100 TB the seen-corpus key
    count is known from its table metadata, so size the filter from it
    instead of hardcoding 2^20 bits (~0.8M keys @ 1% FP)."""
    need = max(_BLOOM_BITS, expected_keys * _BLOOM_BITS_PER_KEY)
    return 1 << int(need - 1).bit_length()


# two 16-byte pandas hash keys -> two independent SipHash streams driving
# the standard double-hash scheme (Kirsch-Mitzenmacher), fully vectorized
_BLOOM_HK1 = "graftbloomhash01"
_BLOOM_HK2 = "graftbloomhash02"


def _bloom_positions(keys, n_bits: int = _BLOOM_BITS) -> np.ndarray:
    """k positions per STRING key — vectorized double-hash (one hash_array
    pass per stream, no per-key hashlib)."""
    a = np.asarray(keys, dtype=object)
    if not len(a):
        return np.empty((0, _BLOOM_HASHES), dtype=np.int64)
    h1 = pd.util.hash_array(a, hash_key=_BLOOM_HK1)
    h2 = pd.util.hash_array(a, hash_key=_BLOOM_HK2) | np.uint64(1)
    j = np.arange(_BLOOM_HASHES, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(n_bits)
    return pos.astype(np.int64)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant mix), vectorized."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_positions_int(keys: np.ndarray, n_bits: int) -> np.ndarray:
    """Vectorized k positions per INTEGER key (no per-row hashlib): two
    independent splitmix64 mixes drive the standard double-hash scheme."""
    keys = np.asarray(keys)
    if not np.issubdtype(keys.dtype, np.integer):
        # an int Arrow column with nulls materializes as float + NaN, and
        # NaN→uint64 is undefined — fail loudly instead of mis-hashing
        raise ValueError(
            "bloom int-key path: key column must be integer-typed and "
            f"non-null (got dtype {keys.dtype}); use the string bloom_build "
            "or filter/fill nulls upstream")
    k = keys.astype(np.uint64)
    h1 = _mix64(k)
    h2 = _mix64(k ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    j = np.arange(_BLOOM_HASHES, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(n_bits)
    return pos.astype(np.int64)


def bloom_build_int(ds: Dataset, key_col: str,
                    n_bits: int = _BLOOM_BITS) -> np.ndarray:
    """bloom_build for integer key columns — fully vectorized per batch
    (the string variant below pays a per-row hashlib call)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _bloom_positions_int(df[key_col].to_numpy(), n_bits)
        np.bitwise_or.at(bits, pos.ravel() // 8,
                         np.uint8(1) << (pos.ravel() % 8).astype(np.uint8))
        return pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    for b in parts["bitmap"]:
        bitmap |= np.frombuffer(b, dtype=np.uint8)
    return bitmap


def bloom_maybe_contains_int(bitmap: np.ndarray, keys: np.ndarray
                             ) -> np.ndarray:
    n_bits = len(bitmap) * 8
    pos = _bloom_positions_int(np.asarray(keys), n_bits)
    hit = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
    return hit.all(axis=1).astype(bool)


def bloom_build(ds: Dataset, key_col: str,
                n_bits: int = _BLOOM_BITS) -> np.ndarray:
    """Mergeable Bloom filter over a key column: each batch sets its bits
    into a fixed-size partial bitmap; partials OR together on the driver
    (n_bits/8 bytes each — size independent of row count, like the HLL
    sketch). Size n_bits with bloom_bits_for(expected_keys)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _bloom_positions(list(df[key_col]), n_bits)
        np.bitwise_or.at(bits, pos.ravel() // 8,
                         np.uint8(1) << (pos.ravel() % 8).astype(np.uint8))
        return pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    for b in parts["bitmap"]:
        bitmap |= np.frombuffer(b, dtype=np.uint8)
    return bitmap


def bloom_maybe_contains(bitmap: np.ndarray, keys) -> np.ndarray:
    n_bits = len(bitmap) * 8
    pos = _bloom_positions(list(keys), n_bits)
    hit = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
    return hit.all(axis=1).astype(bool)


def bloom_prefilter_new(sf_dir: str) -> pd.DataFrame:
    """Bloom-prefiltered incremental dedup: build the filter over the seen
    corpus' hashes, broadcast it (ray.put, read once per actor), and drop
    new docs the filter says are definitely-unseen... inverted: keep docs
    that are POSSIBLY seen for the exact co-partition check, pass through
    definitely-new ones immediately. Guarantees zero false negatives (a
    truly-new doc is never dropped); false-positive rate set by bits/key."""
    import ray

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def md5_col(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "md5": df["text"].map(
                lambda t: hashlib.md5(t.encode()).hexdigest()),
        })

    hashed = docs.map_batches(md5_col, batch_format="pandas")
    # expr filters don't support modulo — plain vectorized masks
    seen = hashed.map_batches(lambda df: df[df["doc_id"] % 3 != 0],
                              batch_format="pandas")
    new = hashed.map_batches(lambda df: df[df["doc_id"] % 3 == 0],
                             batch_format="pandas")
    # size the filter from the table's (metadata-only) row count — an upper
    # bound on the seen-side key count
    bitmap_ref = ray.put(bloom_build(seen, "md5",
                                     bloom_bits_for(docs.count())))

    class Filter:
        def __init__(self):
            self.bitmap = ray.get(bitmap_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            maybe = bloom_maybe_contains(self.bitmap, list(df["md5"]))
            out = df[["doc_id", "md5"]].copy()
            out["maybe_seen"] = maybe
            return out

    return (new.map_batches(Filter, batch_format="pandas",
                            concurrency=(1, 4))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (pairs -> representatives)

def resolve_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over near-dup pairs (id1, id2) -> (doc_id, keep_doc_id)
    with the cluster minimum as representative. Pair lists are small
    relative to the corpus (near-dup density), so driver-side union-find is
    the right altitude; for pathological densities use
    `propagate_min_labels` below — the same contract, fully distributed."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id1"], pairs["id2"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "keep_doc_id"])


# ---------------------------------------------------------------------------
# standalone n-gram Jaccard pair scoring

def pair_jaccard(sf_dir: str) -> Dataset:
    """Exact word-set Jaccard for consecutive doc pairs (2i, 2i+1) — the
    standalone surface for the Jaccard verification kernel the LSH paths
    use (there with 3-word shingle-hash sets; here with n=1 word sets so
    the DuckDB oracle can mirror it with list functions).

    Scale shape: each doc maps to its pair id, ONE co-partition groupby
    brings the two members together, the set kernel runs per group — the
    same exchange pattern as the LSH verify, no driver pairing."""
    import re as _re

    split = _re.compile(r"[^a-z0-9]+")
    docs = read_documents(sf_dir, ["doc_id", "text"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        words = [sorted({w for w in split.split(t.lower()) if w})
                 for t in df["text"]]
        return pd.DataFrame({
            "pair_id": (df["doc_id"] // 2).astype("int64"),
            "doc_id": df["doc_id"].astype("int64"),
            "words": words,
        })

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # all pairs in the bucket in one pass: sort by (pair, doc) and zip
        # complete pairs — the set kernel is per pair, the dispatch is not
        df = df.sort_values(["pair_id", "doc_id"])
        sizes = df.groupby("pair_id", sort=False)["doc_id"].transform("size")
        df = df[sizes == 2]
        lo, hi = df.iloc[0::2], df.iloc[1::2]
        f = 1e6
        ids1, ids2, jac = [], [], []
        for d1, w1, d2, w2 in zip(lo["doc_id"], lo["words"],
                                  hi["doc_id"], hi["words"]):
            a, b = set(w1), set(w2)
            union = len(a | b)
            j = len(a & b) / union if union else 1.0
            ids1.append(int(d1))
            ids2.append(int(d2))
            jac.append(np.sign(j) * np.floor(abs(j) * f + 0.5) / f)
        return pd.DataFrame({"id1": pd.Series(ids1, dtype="int64"),
                             "id2": pd.Series(ids2, dtype="int64"),
                             "jaccard": pd.Series(jac, dtype="float64")})

    return bucketed_group_map(docs.map_batches(tag, batch_format="pandas"),
                              ["pair_id"], score)


# ---------------------------------------------------------------------------
# exact duplicate-span detection (substring-level dedup)

def _gram_windows(sf_dir: str, k: int, hash_grams: bool = False) -> Dataset:
    """(gram, doc_id, pos) rows: one per word k-gram window per document
    (words = ASCII-whitespace split of lower(text), the ops-wide contract).

    hash_grams=True is the 100-TB exchange shape: grams never exist as
    strings at all — per-word 64-bit hashes (one vectorized hash_array
    pass per batch) fold into window hashes with k-1 mix/xor passes,
    cutting both the kernel cost and the shuffle bytes by the mean gram
    length. A hash collision can merge two unrelated gram groups
    (probability ~n²/2⁶⁴), so the oracle-exact string mode stays the
    default."""
    from .decontam import _words

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def explode_hashed(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_words(df["text"], tokenize=_words)
        hw = _hash_str_array(flat)
        total = len(hw)
        empty = pd.DataFrame({"gram": pd.Series(dtype="int64"),
                              "doc_id": pd.Series(dtype="int64"),
                              "pos": pd.Series(dtype="int64")})
        if total < k:
            return empty
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        win = _fold_k(hw, k)
        m = total - k + 1
        valid = doc_of[:m] == doc_of[k - 1:]
        if not valid.any():
            return empty
        d = doc_of[:m][valid]
        offs = np.concatenate(([0], np.cumsum(lens)))
        pos = np.nonzero(valid)[0] - offs[d]
        return pd.DataFrame({
            "gram": win[valid].view(np.int64),
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64)[d],
            "pos": pos,
        })

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_doc: list[int] = []
        out_pos: list[int] = []
        out_gram: list[str] = []
        for did, text in zip(df["doc_id"].to_numpy(), df["text"]):
            w = _words(text)
            n = len(w) - k + 1
            if n <= 0:
                continue
            out_doc.extend([int(did)] * n)
            out_pos.extend(range(n))
            out_gram.extend(" ".join(w[i:i + k]) for i in range(n))
        return pd.DataFrame({
            "gram": pd.Series(out_gram, dtype="object"),
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "pos": pd.Series(out_pos, dtype="int64"),
        })

    return docs.map_batches(explode_hashed if hash_grams else explode,
                            batch_format="pandas")


def dup_spans(sf_dir: str, k: int = 5, hash_grams: bool = False) -> Dataset:
    """Exact duplicate k-gram span detection — substring-level dedup in the
    style of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), at word granularity so a DuckDB oracle can mirror it
    exactly.

    A word k-gram window (position = 0-based index of its first word, words
    = ASCII-whitespace split of lower(text), the ops-wide tokenization
    contract) is *duplicated* iff the identical k-gram occurs in >=2
    distinct documents. Per document, OVERLAPPING duplicated windows
    (position gap <= k-1; merely adjacent spans stay separate) merge into
    maximal spans. Output: (doc_id, span_start, span_end, n_words), span
    bounds inclusive word indices.

    Scale shape: a batch map explodes (gram, doc_id, pos) rows; ONE
    groupby(gram) keeps the cross-doc groups; ONE groupby(doc_id) merges
    sorted window positions into islands with a vectorized diff/cumsum.
    No driver-side state. The exchange key is the gram string for oracle
    exactness; hash_grams=True is the production shape (64-bit hashed
    keys — see `_gram_windows`).
    """
    def keep_cross_doc(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every gram in the bucket: a window is duplicated
        # iff its gram spans >= 2 distinct docs
        nun = df.groupby("gram", sort=False)["doc_id"].transform("nunique")
        return df.loc[nun >= 2, ["doc_id", "pos"]]

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        # islands across ALL docs in the bucket in one diff/cumsum scan:
        # an island breaks on a doc boundary or a position gap > k-1
        df = df.drop_duplicates(["doc_id", "pos"]) \
            .sort_values(["doc_id", "pos"])
        did = df["doc_id"].to_numpy(dtype=np.int64)
        pos = df["pos"].to_numpy(dtype=np.int64)
        if not len(pos):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "span_start": pd.Series(dtype="int64"),
                                 "span_end": pd.Series(dtype="int64"),
                                 "n_words": pd.Series(dtype="int64")})
        brk = np.empty(len(pos), dtype=bool)
        brk[0] = True
        brk[1:] = (did[1:] != did[:-1]) | ((pos[1:] - pos[:-1]) > (k - 1))
        island = np.cumsum(brk) - 1
        gb = pd.DataFrame({"island": island, "pos": pos}) \
            .groupby("island", sort=False)["pos"]
        start = gb.min().to_numpy(dtype=np.int64)
        end = gb.max().to_numpy(dtype=np.int64) + (k - 1)
        return pd.DataFrame({
            "doc_id": did[brk],
            "span_start": start,
            "span_end": end,
            "n_words": end - start + 1,
        })

    windows = _gram_windows(sf_dir, k, hash_grams)
    dup_windows = bucketed_group_map(windows, ["gram"], keep_cross_doc)
    return bucketed_group_map(dup_windows, ["doc_id"], merge_spans)


# ---------------------------------------------------------------------------
# distributed duplicate-cluster resolution (min-label propagation)

def propagate_min_labels(pairs: Dataset, max_iters: int = 50,
                         n_buckets: int = 64) -> Dataset:
    """Distributed connected components over near-dup pairs (id1, id2) ->
    (doc_id, keep_doc_id) with the component minimum as representative —
    the scale path for `resolve_clusters` when the pair list is too dense
    to collect on the driver. Requires non-negative ids (−1 is the label
    sentinel in the fused exchange).

    Each round is two bucketed co-partition exchanges, no driver graph:
      1. union(labels, edge ends) keyed by hash bucket; inside each bucket
         group a vectorized pandas merge attaches every node's current
         label to its incident edge ends, emitting (other_end, label)
         messages plus the node's own (node, label);
      2. a bucketed groupby takes the min message per node.
    Labels only ever decrease, so sum(label) is a strictly decreasing
    fixpoint monitor: the loop stops when it stops changing (≤ component
    diameter rounds). Driver state per round is one scalar.
    """
    ends = pairs.map_batches(
        lambda df: pd.DataFrame({
            "key": np.concatenate([df["id1"].to_numpy(np.int64),
                                   df["id2"].to_numpy(np.int64)]),
            "other": np.concatenate([df["id2"].to_numpy(np.int64),
                                     df["id1"].to_numpy(np.int64)]),
        }), batch_format="pandas")
    edges = ends.map_batches(
        lambda df: df.assign(bucket=(df["key"] % n_buckets).astype("int64"),
                             lab=np.int64(-1)),
        batch_format="pandas").materialize()
    if edges.count() == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "keep_doc_id": pd.Series(dtype="int64")}))

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(g["key"].to_numpy(np.int64))
        return pd.DataFrame({"key": nodes, "other": np.int64(-1),
                             "bucket": g["bucket"].iloc[0], "lab": nodes})

    labels = (edges.groupby("bucket")
              .map_groups(dedup_nodes, batch_format="pandas").materialize())

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["other"] < 0]
        e = g[g["other"] >= 0]
        m = e[["key", "other"]].merge(lab[["key", "lab"]], on="key")
        node = np.concatenate([m["other"].to_numpy(np.int64),
                               lab["key"].to_numpy(np.int64)])
        msg = np.concatenate([m["lab"].to_numpy(np.int64),
                              lab["lab"].to_numpy(np.int64)])
        return pd.DataFrame({"node": node, "lab": msg,
                             "bucket": (node % n_buckets).astype("int64")})

    def minimize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["lab"].min()
        return pd.DataFrame({"key": out["node"].astype("int64"),
                             "other": np.int64(-1),
                             "bucket": g["bucket"].iloc[0],
                             "lab": out["lab"].astype("int64")})

    prev_sum = None
    for _ in range(max_iters):
        labels = (labels.union(edges)
                  .groupby("bucket").map_groups(attach, batch_format="pandas")
                  .groupby("bucket").map_groups(minimize,
                                                batch_format="pandas")
                  .materialize())
        s = labels.sum("lab")
        if s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["key"].astype("int64"),
                                 "keep_doc_id": df["lab"].astype("int64")}),
        batch_format="pandas")


def dup_clusters(sf_dir: str, k: int = 5, hash_grams: bool = False) -> Dataset:
    """Duplicate-content families: connected components over "docs sharing
    a duplicated word k-gram" (star edges per gram preserve components),
    resolved fully distributed with `propagate_min_labels`. Output:
    (doc_id, keep_doc_id = component min) for every doc in >=1 cross-doc
    gram."""
    def star_edges(df: pd.DataFrame) -> pd.DataFrame:
        # every gram in the bucket in one scan: connect each gram's min doc
        # to its other docs (a star preserves the component)
        df = (df.drop_duplicates(["gram", "doc_id"])
              .sort_values(["gram", "doc_id"]))
        g = df["gram"].to_numpy()
        d = df["doc_id"].to_numpy(np.int64)
        if not len(g):
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64")})
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = g[1:] != g[:-1]
        grp = np.cumsum(first) - 1
        head = d[first]
        out = pd.DataFrame({"id1": head[grp[~first]], "id2": d[~first]})
        return out.drop_duplicates()

    pairs = bucketed_group_map(_gram_windows(sf_dir, k, hash_grams),
                               ["gram"], star_edges)
    return propagate_min_labels(pairs)


def corpus_diff(left: Dataset, right: Dataset,
                n_buckets: int = 64) -> Dataset:
    """Dataset-versioning diff: classify every doc_id as 'added' (right
    only), 'removed' (left only) or 'changed' (both sides, different
    content md5) between two corpus versions — the audit every managed
    training-set pipeline runs before promoting a new snapshot.

    Scale shape: each side reduces to (doc_id, md5) in its map pass (text
    never crosses the exchange), sides are tagged and co-partitioned by
    ONE doc_id-bucket hash exchange (the union+groupby pattern the as-of
    join and incremental dedup use), and each bucket classifies its rows
    vectorized. Unchanged docs are dropped in-bucket, so the output is
    |diff|, not |corpus|."""

    def digest(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "md5": df["text"].map(
                    lambda t: hashlib.md5(t.encode()).hexdigest()),
                "side": side,
            })
        return fn

    tagged = left.map_batches(digest("l"), batch_format="pandas").union(
        right.map_batches(digest("r"), batch_format="pandas"))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        piv = (df.pivot_table(index="doc_id", columns="side", values="md5",
                              aggfunc="first").reset_index())
        for c in ("l", "r"):
            if c not in piv.columns:
                piv[c] = None
        added = piv["l"].isna()
        removed = piv["r"].isna()
        changed = piv["l"].notna() & piv["r"].notna() & (piv["l"] != piv["r"])
        keep = added | removed | changed
        out = piv.loc[keep, ["doc_id"]].copy()
        out["status"] = np.where(added[keep], "added",
                                 np.where(removed[keep], "removed",
                                          "changed"))
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    from ..exchange import bucketed_group_map
    return bucketed_group_map(tagged, ["doc_id"], classify,
                              nbuckets=n_buckets)
