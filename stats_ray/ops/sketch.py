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


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates + exact distributed recount.
# ---------------------------------------------------------------------------

def _misra_gries(values, counts, k: int) -> dict:
    """Classic Misra-Gries summary (public 1982 algorithm) over pre-counted
    (value, count) pairs; at most k counters, per-item undercount bounded by
    (total weight)/(k+1)."""
    ctr: dict = {}
    for v, c in zip(values, counts):
        if v in ctr:
            ctr[v] += c
        elif len(ctr) < k:
            ctr[v] = c
        else:
            # decrement all by the smallest amount that frees a slot
            dec = min(c, min(ctr.values()))
            ctr = {u: n - dec for u, n in ctr.items() if n > dec}
            if c > dec:
                ctr[v] = c - dec
    return ctr


def heavy_hitters(ds: Dataset, key_col: str, phi: float = 0.0075,
                  k: int = 256) -> pd.DataFrame:
    """EXACT frequent-items query at sketch cost: all keys with frequency
    >= phi * N, computed in two streaming passes.

    Pass 1 (candidates): each batch emits a Misra-Gries summary of at most
    k counters (rows, not Python state) plus its row count; the driver sums
    the summaries. Summed MG counters undercount any key's true frequency
    by at most N/(k+1) total, so every key with true count >= phi*N has
    merged count >= phi*N - N/(k+1): with k chosen so 1/(k+1) < phi the
    candidate set provably contains all true heavy hitters. Driver state is
    O(batches * k), independent of N and of key cardinality.

    Pass 2 (verify): broadcast the candidate set, recount it exactly with
    an in-batch value_counts + one candidate-sized groupby-sum, and apply
    the threshold to EXACT counts — so the output matches the plain SQL
    `GROUP BY ... HAVING count(*) >= phi * N` oracle while never holding a
    full-cardinality count map anywhere."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key_col].value_counts()
        mg = _misra_gries(vc.index.to_numpy(), vc.to_numpy(), k)
        out = pd.DataFrame({key_col: list(mg), "c": list(mg.values())})
        out["rows_"] = np.int64(0)
        return pd.concat(
            [out, pd.DataFrame({key_col: [vc.index[0] if len(vc) else 0],
                                "c": [0], "rows_": [len(df)]})],
            ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    total = int(parts["rows_"].sum())
    thresh = phi * total
    if total and 1.0 / (k + 1) >= phi:
        raise ValueError(f"k={k} too small for phi={phi}: need k+1 > 1/phi")
    merged = parts.groupby(key_col)["c"].sum()
    cand = set(merged[merged >= thresh - total / (k + 1)].index)
    if not cand:
        # provably no heavy hitters (any true HH would have merged count
        # >= thresh - N/(k+1)); an all-empty recount would drop the schema
        return pd.DataFrame({
            key_col: pd.Series([], dtype=parts[key_col].dtype),
            "n": pd.Series([], dtype="int64")})
    cand_ref = ray.put(cand)

    class Recount:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df[key_col].isin(self.cand)]
            vc = sub[key_col].value_counts()
            return pd.DataFrame({key_col: vc.index, "n": vc.to_numpy()})

    exact = (ds.map_batches(Recount, batch_format="pandas",
                            concurrency=(1, 4))
             .groupby(key_col).sum("n").to_pandas())
    exact = exact.rename(columns={"sum(n)": "n"})
    exact["n"] = exact["n"].astype("int64")
    out = exact[exact["n"] >= thresh].sort_values(key_col)
    return out.reset_index(drop=True)
