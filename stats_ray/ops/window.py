"""Windowed / ordered operators Ray Data lacks natively: as-of join,
cumulative (running) windows, sliding windows, grouped quantiles.

Each is expressed as the composition the task allows (per the custom-operator
ladder): a key-partitioned exchange (`groupby(key)`) + sort-within-group +
a vectorized pandas kernel inside `map_groups`. The partitioning assumption
every operator here relies on: one *key's* rows fit in one worker's heap
(true for per-user event streams; for a pathological hot key the same
kernels run over sub-windows after salting by time range).

No reference-repo analogue — these are the training-data-pipeline
extensions (SURVEY.md §8 scope); semantics are pinned by DuckDB window/ASOF
SQL oracles in ops/queries.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data import Dataset

from ..exchange import bucketed_agg, bucketed_group_map

_EVENT_COLS = ["event_id", "user_id", "ts", "event_type", "value"]


def _events(sf_dir: str, columns=None) -> Dataset:
    from .io import read_table
    return read_table(sf_dir, "events", columns=columns)


# --- as-of join --------------------------------------------------------------

def asof_join_grouped(left: Dataset, right: Dataset, key: str, ts: str,
                      left_cols: list[str], right_cols: list[str],
                      suffix: str = "_r") -> Dataset:
    """Distributed as-of join (backward, inclusive): for each left row, the
    right row with the greatest `ts` <= left.`ts` within the same `key`.

    Shape: tag both sides, union (no extra exchange), co-partition with ONE
    hash shuffle on `key`, then `pandas.merge_asof` inside each group —
    the same union+groupby pattern the dedup verify join uses (Ray's
    experimental hash-join operator stalls on small local clusters).

    Right side must be unique per (key, ts) — pre-dedupe upstream for
    deterministic results. Unmatched left rows carry NaN in right columns.
    """
    lc, rc = list(left_cols), list(right_cols)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, ts] + lc].copy()
        for c in rc:
            out[c + suffix] = np.nan
        out["side_"] = np.int8(0)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, ts]].copy()
        for c in lc:
            out[c] = np.nan
        for c in rc:
            out[c + suffix] = df[c].to_numpy()
        out["side_"] = np.int8(1)
        return out[[key, ts] + lc + [c + suffix for c in rc] + ["side_"]]

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # merge_asof(by=key) handles EVERY key in the bucket in one
        # vectorized pass — both sides sorted by ts as it requires
        l = df[df["side_"] == 0][[key, ts] + lc].sort_values(ts, kind="stable")
        r = (df[df["side_"] == 1][[key, ts] + [c + suffix for c in rc]]
             .sort_values(ts, kind="stable"))
        if l.empty:
            return l.assign(**{c + suffix: np.nan for c in rc}).iloc[0:0]
        return pd.merge_asof(l, r, on=ts, by=key, direction="backward",
                             allow_exact_matches=True)

    return bucketed_group_map(tagged, [key], merge)


def events_asof_prior_view(sf_dir: str) -> pd.DataFrame:
    """For every `purchase` event: the same user's most recent `view` event
    at or before it (ASOF LEFT JOIN semantics), plus the time gap.

    Views are deduped to one per (user, ts) (max event_id) so the as-of
    pick is deterministic. Missing matches encode as -1 (int columns hash
    stably across engines, unlike nullable doubles)."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'")
    views = bucketed_agg(
        ev.filter(expr="event_type == 'view'")
        .map_batches(lambda df: df[["user_id", "ts", "event_id"]],
                     batch_format="pandas"),
        ["user_id", "ts"], {"view_id": ("event_id", "max")})

    def add_view_ts(df: pd.DataFrame) -> pd.DataFrame:
        # merge_asof keeps only the join ts; ride the view's own ts along
        # as an int payload column so the gap survives the join
        df["view_ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        return df

    views = views.map_batches(add_view_ts, batch_format="pandas")

    joined = asof_join_grouped(
        purchases, views, key="user_id", ts="ts",
        left_cols=["event_id"], right_cols=["view_id", "view_ts_us"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        view_id = df["view_id_r"].fillna(-1).astype("int64")
        view_ts = df["view_ts_us_r"].fillna(-1).astype("int64")
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts_us": ts_us,
            "view_id": view_id,
            "gap_us": np.where(view_id >= 0, ts_us - view_ts, -1),
        })

    out = joined.map_batches(project, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# --- running (cumulative) window --------------------------------------------

def cumulative_per_key(ds: Dataset, key: str, order: list[str],
                       fn, empty: "pd.DataFrame | None" = None) -> Dataset:
    """Running-window scaffold: ONE bucketed hash exchange on `key`, stable
    sort by (key, *order) inside the bucket, then the per-key kernel runs as
    a LOCAL pandas groupby-apply — Ray-level per-group dispatch at user
    cardinality is what this avoids. Kernels that vectorize across key
    boundaries (grouped cumsum/cumcount) should bypass this scaffold and
    write a bucket-level kernel directly (see events_cum_user).

    Empty-bucket contract (see exchange.bucketed_group_map): `fn` may be
    called once with a zero-row frame and must return a typed empty result;
    kernels that can't (positional indexing etc.) pass `empty=` a typed
    zero-row DataFrame with the output schema instead."""
    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.sort_values(order, kind="stable").reset_index(drop=True))

    return bucketed_group_map(ds, [key], run, per_group=True, empty=empty)


def events_cum_user(sf_dir: str) -> pd.DataFrame:
    """Per-user running event count and running value sum (in exact integer
    cents — running float sums are order-exact but round-boundary fragile
    across engines) ordered by (ts, event_id)."""
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # grouped cumsum/cumcount vectorize across every user in the bucket
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = pd.Series(
            np.round(df["value"].to_numpy() * 100.0).astype("int64"),
            index=df.index)
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "cum_n": (g.cumcount() + 1).astype("int64"),
            "cum_cents": cents.groupby(df["user_id"], sort=False).cumsum(),
        })

    out = bucketed_group_map(ev, ["user_id"], kernel)
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


# --- sliding window over an aggregated series --------------------------------

def events_sliding_7d(sf_dir: str) -> pd.DataFrame:
    """7-day moving average of daily event counts: the heavy rollup is a
    distributed partial-combine + groupby-sum; the window then runs over the
    (tiny, date-cardinality) aggregated series — the scale-correct split for
    sliding windows whose frame is small after aggregation."""
    from ray.data.aggregate import Sum
    ev = _events(sf_dir, ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.strftime("%Y-%m-%d")
        out = day.value_counts().rename_axis("day").reset_index(name="n")
        return out

    daily = (ev.map_batches(partial, batch_format="pandas")
             .groupby("day").aggregate(Sum("n", alias_name="n"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    n = daily["n"].astype("int64")
    ma = n.rolling(window=7, min_periods=1).mean()
    f = 1e4
    daily["n"] = n
    daily["ma7"] = np.sign(ma) * np.floor(np.abs(ma) * f + 0.5) / f
    return daily


# --- grouped quantiles -------------------------------------------------------

def events_value_quantiles(sf_dir: str,
                           qs=(0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Exact per-event_type value quantiles (linear interpolation — matches
    SQL quantile_cont). Key cardinality is tiny, so one group per worker is
    the right layout; for high-cardinality keys swap the kernel onto the
    hash-bucket exchange, and for 100-TB single-key data use a mergeable
    t-digest (the HLL sketch in ops/sketch.py shows the pattern)."""
    ev = _events(sf_dir, ["event_type", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        row = {"event_type": g["event_type"].iloc[0]}
        f = 1e4
        for q in qs:
            x = float(np.quantile(v, q))
            row[f"p{int(q * 100)}"] = np.sign(x) * np.floor(abs(x) * f + 0.5) / f
        return pd.DataFrame([row])

    return (ev.groupby("event_type").map_groups(kernel, batch_format="pandas")
            .to_pandas().sort_values("event_type").reset_index(drop=True))
