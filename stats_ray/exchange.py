"""Bucketed hash exchange: the repo's standard high-cardinality groupby.

Ray Data's native ``groupby(keys)`` sort-shuffles every row on the full key
tuple and then pays a fixed per-group overhead (~0.2-4 ms each for
``aggregate()`` / ``map_groups()``).  Fine for dozens of groups; pathological
for the 10k-1M+ key cardinalities of token counts, per-user rollups, pair
dedup and species matrices (measured: 23.8 s for a native (string,int)-keyed
aggregate over 58k rows vs 0.4 s for this pattern — 60x).

Pattern: append ONE small int column ``bucket = hash(keys) % nbuckets``,
shuffle on that alone, and run the real keyed aggregation as a vectorized
pandas groupby inside each bucket.  Every group is complete within its bucket
(same keys => same hash => same bucket), per-task memory is bounded by
``nbuckets``, and the exchange sorts a single int32 instead of wide string
tuples.  Skewed KEYS spread uniformly under the hash; a single pathological
group (one key holding most rows) would need salting + a second combine,
which callers with non-additive kernels must opt into themselves.

This generalizes `stages/aggregate.py:_hash_grouped` (the battle path's
fused exchange) for reuse across ops/; that module keeps its wrapper.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def append_bucket(t: pa.Table, keys: list[str], nbuckets: int,
                  col: str = "bkt__") -> pa.Table:
    """Append an int32 hash-bucket column derived from ``keys``."""
    h = np.zeros(len(t), dtype=np.uint64)
    for kcol in keys:
        arr = t[kcol].to_numpy(zero_copy_only=False)
        h = h * np.uint64(1000003) + pd.util.hash_array(arr)
    bucket = (h % np.uint64(nbuckets)).astype(np.int32)
    return t.append_column(col, pa.array(bucket))


def _stable_sort(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical row order before an FP reduction: batch composition follows
    block ARRIVAL order (scheduling-dependent); summing in a different order
    shifts float results by an ulp. One deterministic row-hash argsort makes
    the reduction a pure function of the data."""
    order = np.argsort(
        pd.util.hash_pandas_object(df, index=False).to_numpy(), kind="stable")
    return df.iloc[order]


def bucketed_group_map(ds: Dataset, keys: list[str],
                       fn: Callable[[pd.DataFrame], pd.DataFrame | pa.Table],
                       *, nbuckets: int = 64,
                       stable_order: bool = False,
                       per_group: bool = False,
                       empty: pd.DataFrame | None = None) -> Dataset:
    """One int-keyed exchange + a vectorized per-bucket kernel.

    Default (``per_group=False``): ``fn`` receives a pandas DataFrame
    holding ALL rows of every key-group whose hash lands in the bucket
    (the bucket column already dropped) and must itself be group-aware —
    i.e. do ``df.groupby(keys)`` internally, vectorized over the whole
    bucket. This replaces per-group ``map_groups`` kernels at high
    cardinality.

    ``per_group=True``: ``fn`` receives each KEY group's frame instead —
    a LOCAL pandas dispatch inside the bucket (~100x cheaper than Ray's
    per-group task dispatch) for kernels that genuinely need one group at
    a time (all-pairs scoring, order statistics).

    Empty-bucket contract: an empty bucket calls ``fn`` once with the
    empty frame so output schemas stay concrete — the kernel must return
    a typed empty result for empty input. Kernels that can't (e.g. they
    index ``iloc[0]``) pass ``empty=`` a typed zero-row DataFrame with
    the output schema; it is returned directly and ``fn`` is never called
    on empty input."""

    def bucketize(t: pa.Table) -> pa.Table:
        return append_bucket(t, keys, nbuckets)

    def run(df: pd.DataFrame):
        df = df.drop(columns="bkt__")
        if df.empty and empty is not None:
            out = empty.copy()
        else:
            if stable_order:
                df = _stable_sort(df)
            if per_group:
                parts = [fn(g) for _, g in df.groupby(keys, sort=False)]
                out = (pd.concat(parts, ignore_index=True) if parts
                       else fn(df))
            else:
                out = fn(df)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)
        return out

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bkt__").map_groups(run, batch_format="pandas"))


def bucketed_agg(ds: Dataset, keys: list[str],
                 spec: dict[str, tuple[str, str]] | str = "sum",
                 *, nbuckets: int = 64,
                 salt: int | None = None) -> Dataset:
    """Keyed aggregation via the bucket exchange.

    ``spec`` is either a plain reduction name applied to every non-key
    column ("sum" / "max" / "min" / "count"), or a pandas named-agg dict
    ``{out_col: (in_col, how)}``. Sums are made deterministic with the
    row-hash presort (see _stable_sort).

    ``salt``: hot-KEY pressure valve for mergeable reductions. The hash
    exchange spreads distinct keys uniformly, but one pathological key
    (a gen9ou-style hot format cell holding most rows) still lands whole
    in a single bucket. ``salt=K`` splits every key's rows across K salt
    values by deterministic row hash, aggregates (keys + salt) first, and
    re-combines the ≤K partials per key in a second, tiny exchange — the
    classic two-phase salted combine. Only valid for re-aggregable
    reductions (sum / min / max / count — count re-combines as sum);
    ``mean`` raises."""

    if salt is not None:
        if isinstance(spec, str):
            if spec == "mean":
                raise ValueError("bucketed_agg: salt= requires a mergeable "
                                 "reduction; mean is not (pre-sum + count "
                                 "instead)")
            first_spec: dict | str = spec
            second_spec = "sum" if spec == "count" else spec
        else:
            if any(h == "mean" for _, h in spec.values()):
                raise ValueError("bucketed_agg: salt= requires mergeable "
                                 "reductions; mean is not")
            first_spec = dict(spec)
            second_spec = {out: (out, "sum" if h in ("count", "size")
                                 else h)
                           for out, (_, h) in spec.items()}

        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["salt__"] = (
                pd.util.hash_pandas_object(df, index=False).to_numpy()
                % np.uint64(salt)).astype(np.int64)
            return df

        salted = ds.map_batches(add_salt, batch_format="pandas")
        first = bucketed_agg(salted, keys + ["salt__"], first_spec,
                             nbuckets=nbuckets)
        dropped = first.map_batches(
            lambda df: df.drop(columns="salt__"), batch_format="pandas")
        # second level: ≤ salt partial rows per key — a tiny exchange
        return bucketed_agg(dropped, keys, second_spec,
                            nbuckets=max(8, nbuckets // 4))

    if isinstance(spec, str):
        how = spec
        reduced_cols = None  # every non-key column

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(keys, as_index=False, sort=False)
            return getattr(g, how)()

        order_sensitive = how in ("sum", "mean")
    else:
        named = dict(spec)
        reduced_cols = [c for c, h in named.values()
                        if h in ("sum", "mean")]

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(keys, as_index=False, sort=False).agg(**named)

        order_sensitive = bool(reduced_cols)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        if order_sensitive:
            # integer sums are exact in any order — only float reductions
            # need the canonical row-hash presort for determinism
            cols = reduced_cols if reduced_cols is not None \
                else [c for c in df.columns if c not in keys]
            if any(pd.api.types.is_float_dtype(df[c]) for c in cols
                   if c in df.columns):
                df = _stable_sort(df)
        return agg(df)

    return bucketed_group_map(ds, keys, run, nbuckets=nbuckets)
