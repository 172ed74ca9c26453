"""Mergeable sketches for approximate distinct counts (the scale path for
exact dedups like A9 unique players / events_user_stats when exact
cardinality state would dominate the shuffle).

HyperLogLog with 2^p registers: each map_batches task emits ONE serialized
sketch per key (a partial), a tiny groupby merges them (register-wise max),
and the estimate is read off the merged registers — the SURVEY guide's
"sketches are designed to be mergeable" pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


class HLL:
    """Classic HyperLogLog (Flajolet et al. 2007 public algorithm)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    @staticmethod
    def _hash64(values) -> np.ndarray:
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            out[i] = np.uint64(int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "little"))
        return out

    def add_many(self, values) -> "HLL":
        h = self._hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        done = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            hit = (~done) & ((rest_work & mask) != 0)
            lz[hit] = r
            done |= hit
            rest_work = rest_work << np.uint64(1)
            if done.all():
                break
        np.maximum.at(self.registers, idx, lz)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def approx_distinct(ds: Dataset, key_col: str, value_col: str,
                    p: int = 12) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) per key.

    Stage 1 (map_batches): one serialized HLL per key per batch.
    Stage 2 (groupby key, map_groups): register-wise max merge + estimate.
    Shuffle volume: n_keys x 4 KiB per block — independent of row count."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in df.groupby(key_col, sort=False):
            h = HLL(p).add_many(g[value_col].tolist())
            rows.append({key_col: k, "sketch": h.serialize()})
        return pd.DataFrame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = HLL(p)
        for b in g["sketch"]:
            h.merge(HLL.deserialize(bytes(b), p))
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "approx_distinct": [h.estimate()]})

    part = ds.map_batches(partial, batch_format="pandas")
    return (part.groupby(key_col).map_groups(merge, batch_format="pandas")
            .to_pandas())


def approx_unique_players(sf_dir_corpus_parsed, p: int = 12) -> pd.DataFrame:
    """A9 scale path: approximate distinct players per (format, species)."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        slots = t["slots"].combine_chunks()
        par = pc.list_parent_indices(slots).to_numpy()
        flat = slots.flatten()
        fmt = t["format"].to_numpy(zero_copy_only=False)[par]
        return pa.table({
            "key": pa.array([f"{f}|{s}" for f, s in
                             zip(fmt, flat.field("species").to_pylist())]),
            "player": flat.field("player"),
        })

    ds = sf_dir_corpus_parsed.map_batches(explode, batch_format="pyarrow")
    out = approx_distinct(ds, "key", "player", p)
    out[["format", "species"]] = out["key"].str.split("|", expand=True)
    return out[["format", "species", "approx_distinct"]]


class TDigest:
    """Mergeable t-digest quantile sketch (Dunning & Ertl, public algorithm),
    vectorized: clustering assigns every point/centroid to a k1-scale bin
    (arcsine scale function) in one numpy pass instead of a per-centroid
    loop, so per-batch cost is O(n log n) for the sort.

    Centroid count is bounded by ~delta, so one sketch is a few KiB
    regardless of input size — the same shuffle-volume contract as HLL."""

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    def _cluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        if len(means) == 0:
            self.means, self.weights = means, weights
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # mid-rank quantile of each centroid -> k1 scale -> integer bin
        cum = np.cumsum(weights) - weights / 2.0
        q = np.clip(cum / total, 0.0, 1.0)
        k = (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5) * self.delta
        bins = np.floor(k).astype(np.int64)
        # reduce per bin: weighted mean + weight sum
        uniq, start = np.unique(bins, return_index=True)
        wsum = np.add.reduceat(weights, start)
        msum = np.add.reduceat(means * weights, start)
        self.means = msum / wsum
        self.weights = wsum

    def add_many(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        all_m = np.concatenate([self.means, v])
        all_w = np.concatenate([self.weights, np.ones(len(v))])
        self._cluster(all_m, all_w)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._cluster(np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def serialize(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def deserialize(cls, b: bytes, delta: int = 200) -> "TDigest":
        arr = np.frombuffer(b, dtype=np.float64)
        n = len(arr) // 2
        return cls(delta, arr[:n].copy(), arr[n:].copy())


def approx_quantiles(ds: Dataset, key_col: str, value_col: str,
                     qs=(0.5, 0.9, 0.99), delta: int = 200) -> pd.DataFrame:
    """Approximate per-key quantiles via mergeable t-digests — the scale
    path for `events_value_quantiles` when one key's values no longer fit a
    single worker (the exact kernel) or the key count explodes.

    Same two-stage shape as approx_distinct: one serialized digest per key
    per batch, tiny groupby merge, estimates read off the merged digest."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in df.groupby(key_col, sort=False):
            d = TDigest(delta).add_many(g[value_col].to_numpy())
            rows.append({key_col: k, "sketch": d.serialize()})
        return pd.DataFrame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(delta)
        for b in g["sketch"]:
            d.merge(TDigest.deserialize(bytes(b), delta))
        row = {key_col: g[key_col].iloc[0]}
        for q in qs:
            row[f"p{int(q * 100)}"] = round(d.quantile(q), 4)
        return pd.DataFrame([row])

    part = ds.map_batches(partial, batch_format="pandas")
    return (part.groupby(key_col).map_groups(merge, batch_format="pandas")
            .to_pandas())
