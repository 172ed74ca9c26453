"""Generic relational operators over the driver-provided TPC-H-ish tables —
the engine's groupby/sort/limit/broadcast-join building blocks exercised
standalone (SURVEY.md §2.6-2.7 analogues on neutral data)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Sum


from ..exchange import bucketed_agg, bucketed_group_map
from .io import read_table as _t  # noqa: E402  (shared metadata-stripping read)


def tpch_q1(sf_dir: str) -> Dataset:
    """Pricing summary: grouped sums over computed revenue columns, with the
    partial-aggregate-then-shuffle shape (combiner inside map_batches).

    Money columns are exact 2dp decimals, so the sums accumulate in
    fixed-point int64 units (cents for base price, 1e-4 dollars for the
    discounted price, 1e-6 for the charge) — TPC-H's own DECIMAL(15,2)
    semantics, and bitwise order/partitioning-independent at any scale.
    Float sums diverge from the oracle's summation order once group sums
    pass ~1e9 (caught by the sf0.1 cross-check). int64 headroom: charge
    units overflow only past ~7e12 dollars of charge per group."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                 "l_extendedprice", "l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        i64 = pa.int64()
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), i64)
        disc_u = pc.subtract(pa.scalar(100, i64), pc.cast(pc.round(
            pc.multiply(t["l_discount"], pa.scalar(100.0))), i64))
        tax_u = pc.add(pa.scalar(100, i64), pc.cast(pc.round(
            pc.multiply(t["l_tax"], pa.scalar(100.0))), i64))
        disc_price = pc.multiply(cents, disc_u)
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "l_linestatus": t["l_linestatus"].to_numpy(zero_copy_only=False),
            "sum_qty": pc.cast(pc.round(t["l_quantity"]), i64).to_numpy(),
            "sum_base_price": cents.to_numpy(),
            "sum_disc_price": disc_price.to_numpy(),
            "sum_charge": pc.multiply(disc_price, tax_u).to_numpy(),
            "count_order": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False,
                       sort=False).sum(),
            preserve_index=False).replace_schema_metadata(None)

    def finish(t: pa.Table) -> pa.Table:
        f64 = pa.float64()
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.cast(t["sum_qty"], f64),
            "sum_base_price": pc.divide(pc.cast(t["sum_base_price"], f64),
                                        pa.scalar(100.0)),
            "sum_disc_price": pc.divide(pc.cast(t["sum_disc_price"], f64),
                                        pa.scalar(10_000.0)),
            "sum_charge": pc.divide(pc.cast(t["sum_charge"], f64),
                                    pa.scalar(1_000_000.0)),
            "count_order": t["count_order"],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("sum_base_price", alias_name="sum_base_price"),
                       Sum("sum_disc_price", alias_name="sum_disc_price"),
                       Sum("sum_charge", alias_name="sum_charge"),
                       Sum("count_order", alias_name="count_order"))
            .map_batches(finish, batch_format="pyarrow"))


def top_orders(sf_dir: str, n: int = 10) -> Dataset:
    """sort desc + deterministic tiebreak + limit (O6 analogue)."""
    return (_t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
            .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .limit(n))


def orders_by_nation(sf_dir: str) -> Dataset:
    """Broadcast small-side join: customer+nation dim (ray.put once) looked
    up inside map_batches over orders — no shuffle join (J1 analogue)."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    lookup = dict(zip(dim["c_custkey"].astype(np.int64), dim["n_name"]))
    ref = ray.put(lookup)

    class Enrich:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["n_name"] = df["o_custkey"].map(self.lookup)
            # 2dp money summed as exact int64 cents: order-independent at
            # any scale (float sums drift past the oracle's 4dp tolerance
            # once group totals reach ~1e9 — see tpch_q1)
            df["cents"] = np.round(df["o_totalprice"] * 100.0).astype(
                np.int64)
            out = (df.groupby("n_name", as_index=False)
                   .agg(n_orders=("o_orderkey", "size"),
                        total_cents=("cents", "sum")))
            return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["total_price"] = df["total_cents"].astype(np.float64) / 100.0
        return df.drop(columns=["total_cents"])

    return (_t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
            .map_batches(Enrich, batch_format="pandas", concurrency=(1, 4))
            .groupby("n_name")
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("total_cents", alias_name="total_cents"))
            .map_batches(finish, batch_format="pandas"))


def events_daily(sf_dir: str) -> Dataset:
    """Event-log rollup per (event_type, day) — F6/A13-style routing keys."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return (df.groupby(["event_type", "day"], as_index=False)
                .agg(n=("value", "size"), sum_value=("value", "sum")))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["event_type", "day"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_value", alias_name="sum_value")))


def events_user_stats(sf_dir: str) -> Dataset:
    """Exact distinct users per event_type (two-level dedup, A9 shape).

    Scale shape: per-batch partial (event_type,user) counts, ONE
    user-bucketed exchange finishing the dedup and rolling each bucket up
    to (event_type, n_users, n_events) partials, then a tiny final combine
    over nbuckets*n_types rows — never a (type,user)-cardinality groupby."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "user_id"], as_index=False).agg(
            n_events=("user_id", "size"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pu = df.groupby(["event_type", "user_id"], as_index=False).agg(
            n_events=("n_events", "sum"))
        return pu.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size"), n_events=("n_events", "sum"))

    parts = bucketed_group_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], per_bucket, nbuckets=64)
    return bucketed_agg(parts, ["event_type"],
                        {"n_users": ("n_users", "sum"),
                         "n_events": ("n_events", "sum")}, nbuckets=8)


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> Dataset:
    """Session windows over the event log: per user, a new session starts
    when the gap to the previous event exceeds gap_minutes. Partition by
    user (hash shuffle), sort within group, scan — the Ray-Data shape for
    event-time windowing (no watermarks needed for batch logs).

    Returns (user_id, session_id, n_events, start_ts, end_ts, sum_value)."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL users in the bucket: one sort, boundary-aware
        # gap scan, one grouped agg — no per-user pandas frames
        df = df.sort_values(["user_id", "ts"], kind="mergesort") \
            .reset_index(drop=True)
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        gsid = (new_user | gap).cumsum()
        out = (df.assign(gsid=gsid)
               .groupby("gsid", as_index=False)
               .agg(user_id=("user_id", "first"), n_events=("value", "size"),
                    start_ts=("ts", "min"), end_ts=("ts", "max"),
                    sum_value=("value", "sum")))
        out["session_id"] = out.groupby("user_id", sort=False).cumcount() \
            .astype("int64")
        return out[["user_id", "session_id", "n_events", "start_ts",
                    "end_ts", "sum_value"]]

    return bucketed_group_map(ds, ["user_id"], sessions, nbuckets=64)


QUANTITY_BANDS = [(0.0, 10.0), (10.0, 20.0), (20.0, 30.0),
                  (30.0, 40.0), (40.0, 60.0)]


def range_join_bands(sf_dir: str) -> Dataset:
    """Broadcast range join: each lineitem row lands in the quantity band
    whose [lo, hi) interval contains it, then a grouped rollup per
    (band, returnflag). The small side (band edges) is bound into the task
    closure once — an interval join with NO shuffle of the big side, the
    100-TB shape for joining facts to a small set of ranges
    (np.searchsorted per batch, not a per-row comparison join)."""
    edges = np.array([b[0] for b in QUANTITY_BANDS[1:]])
    labels = np.array([f"[{int(lo)},{int(hi)})" for lo, hi in QUANTITY_BANDS])
    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_returnflag",
                                 "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(edges, df["l_quantity"].to_numpy(), side="right")
        out = pd.DataFrame({
            "band": labels[idx],
            "l_returnflag": df["l_returnflag"],
            "n": np.int64(1),
            # exact int64 cents — scale-stable money sums (see tpch_q1)
            "price_c": np.round(df["l_extendedprice"].to_numpy()
                                * 100.0).astype(np.int64),
        })
        return out.groupby(["band", "l_returnflag"], as_index=False).sum()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["price_c"].astype(np.float64) / 100.0
        return df.drop(columns=["price_c"])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["band", "l_returnflag"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("price_c", alias_name="price_c"))
            .map_batches(finish, batch_format="pandas"))


def price_percentiles(sf_dir: str) -> pd.DataFrame:
    """A15 analogue: exact percentile of order totalprice via distributed
    sort + indexed block fetch (matches SQL quantile_disc lower-index
    semantics). `split_at_indices` + `take(1)` reads ONLY the block
    containing each rank — the driver never materializes the sorted column
    (the t-digest in ops/sketch.py is the one-pass approximate path)."""
    ds = (_t(sf_dir, "orders", ["o_totalprice"])
          .sort("o_totalprice").materialize())
    n = ds.count()
    rows = []
    for q in (0.5, 0.9, 0.99):
        idx = int(np.floor(q * (n - 1)))  # quantile_disc lower-rank index
        tail = ds.split_at_indices([idx])[1]
        rows.append({"q": q,
                     "value": float(tail.take(1)[0]["o_totalprice"])})
    return pd.DataFrame(rows)


def top_parts_per_nation(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k: the k highest-revenue parts per supplier nation.

    Scale shape: revenue rolls up distributed (partial combine + groupby),
    then per-group top-k runs as a map_groups kernel over the (already
    aggregated, nation×part-sized) rows — never a global sort of the fact
    table. Deterministic (revenue desc, partkey asc) tiebreak."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey",
                                 "l_extendedprice", "l_discount"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    lookup = dict(zip(dim["s_suppkey"].astype(np.int64), dim["n_name"]))
    ref = ray.put(lookup)

    class Partial:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "n_name": df["l_suppkey"].map(self.lookup),
                "l_partkey": df["l_partkey"].astype("int64"),
                "revenue": df["l_extendedprice"] * (1 - df["l_discount"]),
            })
            return out.groupby(["n_name", "l_partkey"], as_index=False).sum()

    def rolled_topk(df: pd.DataFrame) -> pd.DataFrame:
        # complete nations per bucket: roll up part revenue, then top-k per
        # nation, all inside the one exchange
        g = df.groupby(["n_name", "l_partkey"], as_index=False).sum()
        g = (g.sort_values(["n_name", "revenue", "l_partkey"],
                           ascending=[True, False, True])
             .groupby("n_name", sort=False).head(k))
        f = 1e4
        r = g["revenue"].to_numpy()
        g = g.copy()
        g["revenue"] = np.sign(r) * np.floor(np.abs(r) * f + 0.5) / f
        return g

    out = (bucketed_group_map(
               li.map_batches(Partial, batch_format="pandas",
                              concurrency=(1, 4)),
               ["n_name"], rolled_topk, nbuckets=32, stable_order=True)
           .to_pandas().sort_values(["n_name", "revenue", "l_partkey"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    out["l_partkey"] = out["l_partkey"].astype("int64")
    return out


def stratified_sample(sf_dir: str, k: int = 5) -> Dataset:
    """Deterministic stratified sampling: exactly k events per event_type,
    chosen by smallest md5(event_id) — content-addressed, so the sample is
    stable under repartitioning, resumes, and cluster size (the same
    property `doc_sample_det` uses for Bernoulli sampling, applied per
    stratum with an exact-k guarantee).

    Scale shape: each batch pre-selects its own top-k per stratum (a
    candidate set of <= k * strata * batches tiny rows), then one
    stratum-keyed exchange picks the global top-k per stratum — the full
    event log is never shuffled or sorted."""
    import hashlib

    ds = _t(sf_dir, "events", ["event_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["event_id"].map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest())
        out = pd.DataFrame({"event_type": df["event_type"],
                            "event_id": df["event_id"].astype("int64"),
                            "h": h})
        return (out.sort_values(["h", "event_id"])
                .groupby("event_type", sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["h", "event_id"]).head(k)
                [["event_type", "event_id"]])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(final, batch_format="pandas"))


def events_json_props(sf_dir: str) -> Dataset:
    """JSON field extraction over a log table: pull the numeric `k` field out
    of the `props` JSON column and roll it up per event_type — the
    ubiquitous semi-structured-log step (cf. DuckDB json_extract).

    Scale shape: a compiled-regex scalar fast path extracts the field
    vectorized (the simdjson-style trick: most log lines are flat, schema-
    stable JSON); rows the fast path cannot parse fall back to a real
    json.loads — per-row Python only on the rare irregular line. One
    in-batch partial combine, then a tiny per-type exchange."""
    import json
    import re

    ds = _t(sf_dir, "events", ["event_type", "props"])
    fast = re.compile(r'^\s*\{\s*"k"\s*:\s*(-?\d+)\s*\}\s*$')

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ext = df["props"].str.extract(fast, expand=False)
        m = ext.notna().to_numpy()
        # exact int64 parse of the regex capture (a float round-trip would
        # silently lose precision for |k| > 2^53)
        k = np.zeros(len(df), dtype=np.int64)
        if m.any():
            k[m] = ext[m].to_numpy().astype(np.int64)
        miss = (~m) & df["props"].notna().to_numpy()
        if miss.any():  # irregular lines: real JSON parse, rare by contract
            # missing/null 'k' contributes 0 — SQL SUM skips NULLs while
            # COUNT(*) still counts the row
            k[np.flatnonzero(miss)] = [
                int(v) if (v := json.loads(s).get("k")) is not None else 0
                for s in df.loc[miss, "props"]]
        out = pd.DataFrame({"event_type": df["event_type"],
                            "n": 1, "sum_k": k})
        return out.groupby("event_type", as_index=False).sum()

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_k", alias_name="sum_k")))


def events_retention(sf_dir: str) -> Dataset:
    """Cohort retention matrix: users grouped by first-active day (cohort),
    counted at each day offset they return. The classic product-analytics
    rollup over an event log.

    Scale shape: stage 1 dedups (user, day) inside each batch (activity is
    bursty, so this collapses most rows before any exchange); stage 2 is ONE
    user-keyed exchange whose groups emit <= active-days tiny rows
    (cohort_day, day_offset); stage 3 aggregates over the small
    cohort x offset grid. The raw log is never globally sorted.

    The user-keyed stage groups by a COARSE hash bucket (user_id % n_buckets)
    so each task processes thousands of users with vectorized pandas
    transforms — per-USER map_groups would build one tiny DataFrame per
    user, which dominates wall time at millions of users."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    n_buckets = 64

    def distinct_days(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": df["user_id"],
                            "day": df["ts"].dt.normalize()})
        out = out.drop_duplicates()
        out["b_"] = (out["user_id"] % n_buckets).astype("int64")
        return out

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        # whole bucket at once: global (user, day) dedup is complete here
        # because a user's rows all hash to this bucket
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id")["day"].transform("min")
        part = pd.DataFrame({
            "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
            "day_offset": (g["day"] - cohort).dt.days.astype("int64"),
            "n_users": 1,
        })
        return part.groupby(["cohort_day", "day_offset"],
                            as_index=False).sum()

    per_bucket = (ds.map_batches(distinct_days, batch_format="pandas")
                  .groupby("b_").map_groups(offsets, batch_format="pandas"))
    return bucketed_agg(per_bucket, ["cohort_day", "day_offset"],
                        {"n_users": ("n_users", "sum")}, nbuckets=16)


# --- generic large x large equi-join -----------------------------------------

_JOIN_BUCKETS = 64  # default co-partition width; ~cluster cores x small factor


def hash_join(left: Dataset, right: Dataset, on: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner", n_buckets: int = _JOIN_BUCKETS) -> Dataset:
    """Distributed equi-join of two LARGE datasets (neither side broadcast).

    Shape: tag each side, union (no exchange), co-partition with ONE hash
    exchange on a COARSE bucket of the join key, then a vectorized
    `pandas.merge` inside each bucket — thousands of keys per task, never a
    per-key group. This is the union+groupby co-partition pattern the as-of
    join and the dedup verify join already use (Ray's experimental
    `Dataset.join` hash operator stalls on small local clusters, and a
    broadcast join is wrong when neither side fits in one heap).

    Partitioning assumption: key skew is bounded by the bucket, not the key
    — one pathological key cannot be split across tasks (same contract as a
    SQL hash join's build side). `n_buckets` should be ~(cluster cores x
    2-4) at scale so buckets stay heap-sized; the exchange volume is the
    two projected sides, once.

    `how` is 'inner' or 'left' (left = keep unmatched left rows with NaN
    right columns). Join-key column must be integer-typed on both sides."""
    if how not in ("inner", "left"):
        raise ValueError(f"hash_join: unsupported how={how!r}")
    lc, rc = list(left_cols), list(right_cols)
    if set(lc) & set(rc):
        raise ValueError(f"hash_join: overlapping payload columns "
                         f"{sorted(set(lc) & set(rc))} — rename one side")
    # Off-side filler columns must carry the OWNING side's Arrow type or the
    # union's blocks won't unify (an all-NaN float64 filler next to a string
    # column is a schema conflict). schema() costs at most one upstream block.
    def _arrow_type(t) -> pa.DataType:
        # pandas-block schemas report numpy dtypes / `object`, Arrow blocks
        # report pa.DataType; normalize (object = string under our contract:
        # join payload columns are scalars)
        if isinstance(t, pa.DataType):
            return t
        if t is object or getattr(t, "kind", "") == "O":
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    ls, rs = left.schema(), right.schema()
    l_types = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    r_types = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}

    # enforce the documented integer-key contract up front: a string key
    # would die with a cryptic numpy cast deep in the pipeline, and a
    # nullable key (NaN float) would mis-bucket silently
    for side, types in (("left", l_types), ("right", r_types)):
        kt = types.get(on)
        if kt is None or not pa.types.is_integer(kt):
            raise ValueError(
                f"hash_join: join key {on!r} on the {side} side must be an "
                f"integer column (got {kt}); cast or re-key upstream")

    # uint64 splitmix-style mix so sequential int keys spread across buckets
    mult = np.uint64(0x9E3779B97F4A7C15)

    def bucket_of(keys: pa.ChunkedArray) -> pa.Array:
        k = keys.to_numpy(zero_copy_only=False)
        if not np.issubdtype(k.dtype, np.integer):
            # an int Arrow column with nulls materializes as float + NaN
            raise ValueError(
                f"hash_join: join key {on!r} contains nulls — NaN→uint64 "
                "conversion would mis-bucket rows; filter or fill upstream")
        k = k.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = k * mult
            h ^= h >> np.uint64(29)
        return pa.array((h % np.uint64(n_buckets)).astype(np.int64))

    # Arrow-native tagging: owning-side columns pass through zero-copy, the
    # off side is typed nulls — the union's blocks share one exact schema.
    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {on: t[on]}
        for c in lc:
            cols[c] = t[c]
        for c in rc:
            cols[c] = pa.nulls(n, r_types[c])
        cols["side_"] = pa.array(np.zeros(n, dtype=np.int8))
        cols["b_"] = bucket_of(t[on])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {on: t[on]}
        for c in lc:
            cols[c] = pa.nulls(n, l_types[c])
        for c in rc:
            cols[c] = t[c]
        cols["side_"] = pa.array(np.ones(n, dtype=np.int8))
        cols["b_"] = bucket_of(t[on])
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["side_"] == 0, [on] + lc]
        r = g.loc[g["side_"] == 1, [on] + rc]
        return l.merge(r, on=on, how=how)

    return tagged.groupby("b_").map_groups(merge, batch_format="pandas")


def order_lineitem_revenue(sf_dir: str) -> pd.DataFrame:
    """Large x large inner join: lineitem |><| orders on orderkey, revenue per
    (o_orderpriority, l_returnflag).

    Scale shape: lineitem is partially combined per (orderkey, returnflag)
    INSIDE each batch before the join (revenue/count are additive, so
    partials of the same orderkey in different batches join independently
    and still sum right) — the exchange carries near-per-order rows, not
    per-line rows; the join is one co-partition exchange; the final groupby
    is over a handful of (priority, flag) cells."""
    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # exact 1e-4-dollar units (cents x (100 - disc%)): int64 sums are
        # order/partitioning-independent at any scale — see tpch_q1
        cents = np.round(df["l_extendedprice"] * 100.0).astype(np.int64)
        disc_u = 100 - np.round(df["l_discount"] * 100.0).astype(np.int64)
        df = df.assign(revenue_u=cents * disc_u, n_items=1)
        return (df.groupby(["l_orderkey", "l_returnflag"], as_index=False)
                [["revenue_u", "n_items"]].sum())

    lpart = line.map_batches(partial, batch_format="pandas").map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = hash_join(lpart, orders, on="o_orderkey",
                       left_cols=["l_returnflag", "revenue_u", "n_items"],
                       right_cols=["o_orderpriority"], how="inner")
    out = bucketed_agg(joined, ["o_orderpriority", "l_returnflag"],
                       {"revenue_u": ("revenue_u", "sum"),
                        "n_items": ("n_items", "sum")},
                       nbuckets=8).to_pandas()
    out["revenue"] = out["revenue_u"].astype("float64") / 10_000.0
    out = out.drop(columns=["revenue_u"])
    out["n_items"] = out["n_items"].astype("int64")
    return out[["o_orderpriority", "l_returnflag", "revenue", "n_items"]] \
        .sort_values(["o_orderpriority", "l_returnflag"], ignore_index=True)


def customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT join keeping zero-order customers: customer |><| per-customer
    order partials on custkey, rolled up per market segment.

    Scale shape: orders are FULLY aggregated per custkey first (in-batch
    partial combine + one custkey exchange) so the join's right side is
    unique per key — required for the count-distinct-customers semantics
    (duplicate right rows would fan out the left side). The left join is
    then one more co-partition exchange, and unmatched customers ride
    through with NaN -> 0 so the segment rollup counts them."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def opart(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(n_orders=1)
        return (df.groupby("o_custkey", as_index=False)
                .agg(n_orders=("n_orders", "sum"),
                     total_spend=("o_totalprice", "sum")))

    opartials = (bucketed_agg(
                     orders.map_batches(opart, batch_format="pandas"),
                     ["o_custkey"],
                     {"n_orders": ("n_orders", "sum"),
                      "total_spend": ("total_spend", "sum")})
                 .map_batches(lambda df: df.rename(
                     columns={"o_custkey": "c_custkey"}),
                     batch_format="pandas"))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(cust, opartials, on="c_custkey",
                       left_cols=["c_mktsegment"],
                       right_cols=["n_orders", "total_spend"], how="left")

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            n_customers=1,
            no_order=(df["n_orders"].isna()).astype("int64"),
            n_orders=df["n_orders"].fillna(0.0),
            total_spend=df["total_spend"].fillna(0.0))
        return (df.groupby("c_mktsegment", as_index=False)
                [["n_customers", "no_order", "n_orders", "total_spend"]]
                .sum())

    out = bucketed_agg(joined.map_batches(seg_partial, batch_format="pandas"),
                       ["c_mktsegment"],
                       {"n_customers": ("n_customers", "sum"),
                        "n_zero_order": ("no_order", "sum"),
                        "n_orders": ("n_orders", "sum"),
                        "total_spend": ("total_spend", "sum")},
                       nbuckets=8).to_pandas()
    for c in ("n_customers", "n_zero_order", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_mktsegment", ignore_index=True)


def bloom_semi_join(fact: Dataset, keys: Dataset, on: str,
                    fact_cols: list[str], expected_keys: int,
                    n_buckets: int = _JOIN_BUCKETS) -> Dataset:
    """Exact distributed semi-join (fact rows whose key EXISTS in `keys`)
    with a Bloom pushdown: a mergeable bitmap over the key side broadcasts
    once (bits/key, size independent of row count), each fact batch drops
    definitely-unmatched rows BEFORE the exchange, and the surviving rows
    get the exact co-partition join that kills Bloom false positives.

    This is the standard shuffle-pruning shape at 100 TB: when the semi-join
    is selective (most fact rows don't match), the all-to-all exchange
    carries only the ~matching fraction plus the Bloom FP rate (~1% at 10
    bits/key) instead of the whole fact table. Zero false negatives by
    construction, exact results after the verify join.

    `keys` must be unique per key value (dedupe upstream) or matched fact
    rows fan out."""
    from .dedup import (bloom_bits_for, bloom_build_int,
                        bloom_maybe_contains_int)

    bitmap_ref = ray.put(bloom_build_int(keys, on,
                                         bloom_bits_for(expected_keys)))

    class Prefilter:
        def __init__(self):
            self.bitmap = ray.get(bitmap_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mask = bloom_maybe_contains_int(self.bitmap,
                                            df[on].to_numpy())
            return df.loc[mask]

    pruned = fact.map_batches(Prefilter, batch_format="pandas",
                              concurrency=(1, 8))
    return hash_join(pruned, keys, on=on, left_cols=fact_cols,
                     right_cols=[], how="inner", n_buckets=n_buckets)


def orders_building_segment(sf_dir: str, segment: str = "BUILDING"
                            ) -> pd.DataFrame:
    """Orders whose customer is in one market segment, per order priority —
    the selective-filter-through-a-join query every log pipeline has
    (sessions of flagged users, docs from allow-listed domains).

    Scale shape: `bloom_semi_join` — the matching custkeys never collect on
    the driver (only their Bloom bitmap does), the orders exchange carries
    ~1/5 of the table (segment selectivity) + Bloom FPs, and the exact
    verify join makes the result oracle-exact."""
    cust = (_t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
            .filter(expr=f"c_mktsegment == {segment!r}")
            .select_columns(["c_custkey"])
            .map_batches(lambda df: df.rename(
                columns={"c_custkey": "o_custkey"}), batch_format="pandas"))
    orders = _t(sf_dir, "orders",
                ["o_custkey", "o_orderpriority", "o_totalprice"])
    # customer count from table metadata bounds the key count (custkey is
    # the table's primary key, so the filtered side is unique per key)
    n_cust = _t(sf_dir, "customer", ["c_custkey"]).count()
    joined = bloom_semi_join(orders, cust, on="o_custkey",
                             fact_cols=["o_orderpriority", "o_totalprice"],
                             expected_keys=n_cust)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # exact int64 cents — scale-stable money sums (see tpch_q1)
        df = df.assign(n_orders=1, cents=np.round(
            df["o_totalprice"] * 100.0).astype(np.int64))
        return (df.groupby("o_orderpriority", as_index=False)
                .agg(n_orders=("n_orders", "sum"),
                     cents=("cents", "sum")))

    out = bucketed_agg(joined.map_batches(partial, batch_format="pandas"),
                       ["o_orderpriority"],
                       {"n_orders": ("n_orders", "sum"),
                        "cents": ("cents", "sum")},
                       nbuckets=8).to_pandas()
    out["total_price"] = out["cents"].astype("float64") / 100.0
    out = out.drop(columns=["cents"])
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority", ignore_index=True)


FUNNEL_STEPS = ["click", "view", "purchase"]
FUNNEL_WINDOW_HOURS = 24


def events_funnel(sf_dir: str, steps=None, window_hours: int = None
                  ) -> pd.DataFrame:
    """Ordered funnel conversion: for each user, the earliest step-1 event,
    then the earliest step-2 event within `window_hours` after it, and so
    on; reports how many users reach each step. Strictly-ordered,
    windowed — the semantics ad-hoc SQL gets wrong and log pipelines need.

    Scale shape: the read filters to funnel event types only (column + row
    pruning), then ONE exchange keyed by a COARSE hash bucket
    (user_id % n_buckets): each task advances thousands of users through
    the funnel with vectorized scans (one reindex+mask per step), instead
    of building a tiny per-user DataFrame per group. The per-bucket result
    is a reached-level histogram; the final rollup is over n_steps rows."""
    steps = steps or FUNNEL_STEPS
    window = pd.Timedelta(hours=window_hours or FUNNEL_WINDOW_HOURS)
    step_set = set(steps)
    n_buckets = 64

    ds = (_t(sf_dir, "events", ["user_id", "ts", "event_type"])
          .filter(expr=f"event_type in {sorted(step_set)!r}")
          .map_batches(lambda df: df.assign(
              b_=(df["user_id"] % n_buckets).astype("int64")),
              batch_format="pandas"))

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        # earliest step-1 time per user, then each later step's earliest
        # event inside (t_prev, t_prev + window] — all users at once
        cur = g.loc[g["event_type"] == steps[0]].groupby("user_id")["ts"].min()
        reached = pd.Series(1, index=cur.index, dtype="int64")
        for s in steps[1:]:
            if cur.empty:
                break
            sub = g[g["event_type"] == s]
            t0 = cur.reindex(sub["user_id"]).to_numpy()
            ts = sub["ts"].to_numpy()
            m = pd.notna(t0) & (ts > t0) & (ts <= t0 + window)
            cur = sub[m].groupby("user_id")["ts"].min()
            reached.loc[cur.index] += 1
        hist = reached.value_counts()
        return pd.DataFrame({"reached": hist.index.astype("int64"),
                             "n": hist.to_numpy().astype("int64")})

    hist = (ds.groupby("b_").map_groups(bucket_hist, batch_format="pandas")
            .groupby("reached").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    # tiny driver rollup: users reaching step i = sum of reached >= i
    by = dict(zip(hist["reached"].astype(int), hist["n"].astype(int)))
    rows = []
    for i, s in enumerate(steps, start=1):
        rows.append({"step_idx": i, "step": s,
                     "n_users": sum(v for r, v in by.items() if r >= i)})
    out = pd.DataFrame(rows)
    out["step_idx"] = out["step_idx"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out
