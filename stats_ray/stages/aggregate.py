"""Grouped aggregations over parsed battles (the reference's Stats monoid).

The reference accumulates a nested dict-of-counters per worker then merges
checkpoints (stats/src/stats.ts:66-242). Here the same totals are expressed
Ray-Data-natively with two scale tricks:

1. **In-batch partial combine** — each family explodes parsed battles into
   long-form rows pre-aggregated per batch (pandas groupby inside
   map_batches), so the all-to-all exchange moves distinct keys per block,
   not raw rows.
2. **Cutoff-wide rows** — the 4 rating cutoffs are a pure function of
   `format` (T5), so shuffle rows carry w0..w3 as wide columns keyed only by
   (format, ...); the (cutoff, weight) long form is re-exploded AFTER the
   global groupby, over the (small) aggregate. This cuts shuffle volume 4x
   and removes `cutoff` from every shuffle key.

Weight semantics (stats.ts:272-389, non-legacy: weights.s == weights.m):
- moveset count-maps (abilities/items/teras/spreads/stats/moves/happiness)
  and raw/saved counts accumulate even for "short" battles;
- usage/win/lead/metagame/encounters/teammates only for non-short;
- encounters/leads/battles additionally require valid leads (singles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..dex import cutoffs_for
from ..exchange import bucketed_group_map

# inverse-outcome lookup (stats.ts:474-483)
INVERSE_OUTCOMES = np.array([1, 0, 2, 4, 3, 5, 7, 6, 9, 8, 11, 10, 12], dtype=np.int8)

_CUTS = range(4)
_W = [f"w{k}" for k in _CUTS]
# combine window: bigger batches dedupe the bounded-cardinality kinds harder
# before the exchange (diminishing returns past ~6k battles; the ~unique
# spread/stats keys floor the ratio at ~2 rows/slot). A/B at sf0.1/32c:
# 4096 runs the SERIAL fused exchange 30% faster (full wave occupancy vs a
# partial straggler wave) but is equivalent within noise in the concurrent
# phase (the cluster is saturated by the other families), and changing the
# window regroups in-batch FP partial sums — flipping ulp-level ties in the
# byte-exact report goldens — so the historical default stays. Override
# with STATS_RAY_EXPLODE_BATCH for isolated-stage workloads.
import os as _os

_EXPLODE_BATCH = int(_os.environ.get("STATS_RAY_EXPLODE_BATCH", "6144"))


def _col(t: pa.Table, name: str) -> np.ndarray:
    return t[name].to_numpy(zero_copy_only=False)


def _flat_slots(t: pa.Table):
    slots = t["slots"].combine_chunks()
    parent = pc.list_parent_indices(slots).to_numpy().astype(np.int64)
    return parent, slots.flatten()


def _pt(df: pd.DataFrame) -> pa.Table:
    """Arrow table with metadata stripped: blocks carrying pandas schema
    metadata are unhashable in pyarrow 16 and defeat Ray's schema dedup
    (the 'Failed to hash the schemas' log spam) — a bare schema hashes
    cleanly."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# kept as an alias: every pandas->arrow exit now strips metadata
_pt_stable = _pt


def _side_w(t: pa.Table, parent: np.ndarray, side: np.ndarray,
            prefix: str = "w") -> dict[str, np.ndarray]:
    """per-slot weight columns w0..w3 (or m0..m3) resolved by side."""
    out = {}
    for k in _CUTS:
        out[f"w{k}"] = np.where(side == 1, _col(t, f"p1_{prefix}{k}")[parent],
                                _col(t, f"p2_{prefix}{k}")[parent])
    return out


def _hash_grouped(part: Dataset, keys: list[str], how: str = "sum",
                  nbuckets: int = 128, salt: int | None = None) -> Dataset:
    """Explicit partitioned hash aggregation for high-cardinality keys.

    Ray's native groupby sort-shuffles every partial row on the full key
    tuple; for millions of distinct multi-string keys the sort dominates.
    Instead: bucket = stable_hash(keys) % nbuckets (one small int column),
    shuffle on the bucket only, and run the real keyed aggregation as a
    vectorized pandas groupby inside each bucket (map_groups). Bucket count
    bounds per-task memory. Distinct keys spread uniformly under the hash;
    a single pathological KEY is bounded too, because every explode feeding
    this exchange partial-combines inside its batch (<=1 row per key per
    block), so a hot key contributes at most #blocks partial rows to its
    bucket. For workloads without that pre-combine (or block counts large
    enough that #blocks-per-key rows still overwhelm one task), ``salt=K``
    switches to the two-phase salted combine: rows split across K salt
    values by deterministic row hash, aggregate (keys + salt) first, then
    re-combine the <=K partials per key in a second, tiny exchange (sum
    and max both re-aggregate losslessly)."""
    if salt is not None:
        from ..exchange import bucketed_agg
        return bucketed_agg(part, keys, how, nbuckets=nbuckets, salt=salt)

    def bucketize(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for kcol in keys:
            col = t[kcol].to_numpy(zero_copy_only=False)
            h = h * np.uint64(1000003) + pd.util.hash_array(col)
        bucket = (h % np.uint64(nbuckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket))

    def agg(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns="bucket")
        # canonical row order before the FP reduction: upstream batch
        # composition follows block ARRIVAL order (scheduling-dependent),
        # and a different summation order shifts results by an ulp —
        # enough to flip ties in the byte-exact reports. One deterministic
        # row-hash sort (cheap single uint64 key) makes the reduction a
        # pure function of the data; identical rows may still permute, but
        # equal addends sum identically in any order.
        order = np.argsort(
            pd.util.hash_pandas_object(df, index=False).to_numpy(),
            kind="stable")
        df = df.iloc[order]
        g = df.groupby(keys, as_index=False, sort=False)
        return _pt_stable(g.sum() if how == "sum" else g.max())

    return (part.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket").map_groups(agg, batch_format="pandas"))


def _batch_counted(t: pa.Table) -> np.ndarray:
    """battle 'counted' gate: non-short AND (non-singles OR valid leads)
    (stats.ts:175-209)."""
    short = _col(t, "short")
    singles = _col(t, "singles")
    lead_ok = (_col(t, "lead1") != "empty") & (_col(t, "lead2") != "empty")
    return (~short) & (~singles | lead_ok)


def _unpivot_cutoffs(keys: list[str], weight_cols: dict[str, str],
                     copy_cols: list[str] = ()):  # noqa: B006
    """Build a post-aggregation map_batches fn expanding w0..w3 into
    (cutoff, <named>) long form using each format's cutoff schedule."""

    def fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        fmts = df["format"].to_numpy()
        cut_sched = np.array([cutoffs_for(f) for f in fmts],
                             dtype=np.int32).reshape(len(fmts), 4)
        frames = []
        for k in _CUTS:
            sub = df[keys].copy()
            sub["cutoff"] = cut_sched[:, k]
            for out_name, prefix in weight_cols.items():
                sub[out_name] = df[f"{prefix}{k}"].to_numpy()
            for c in copy_cols:
                sub[c] = df[c].to_numpy()
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        cols = keys[:1] + ["cutoff"] + keys[1:] + list(weight_cols) + list(copy_cols)
        return _pt(out[cols])

    return fn


# ---------------------------------------------------------------------------
# usage / win / raw / saved per (format, cutoff, species)   [A3/A4]

def _explode_usage(t: pa.Table) -> pa.Table:
    parent, flat = _flat_slots(t)
    side = flat.field("side").to_numpy()
    species = flat.field("species").to_numpy(zero_copy_only=False)
    real = (flat.field("turns_out").to_numpy() > 0).astype(np.int64)

    fmt = _col(t, "format")[parent]
    short = _col(t, "short")[parent]
    winner = _col(t, "winner")[parent]
    win = (winner == side).astype(np.int64)
    ns = (~short).astype(np.int64)
    valid = np.where(side == 1, _col(t, "p1_valid")[parent],
                     _col(t, "p2_valid")[parent])
    w = _side_w(t, parent, side)
    m = _side_w(t, parent, side, prefix="m")
    # legacy 'empty' slots count toward the global usage totals but carry no
    # per-species stats (stats.ts:285-303) — raw/saved zeroed here, the
    # species row dropped at view-collection time.
    nonempty = species != "empty"

    cols = {
        "format": fmt, "species": species,
        "raw_count": nonempty.astype(np.int64),
        "saved_count": (valid & nonempty).astype(np.int64),
        "usage_raw": ns, "usage_real": ns * real,
        "win_raw": ns * win, "win_real": ns * win * real,
    }
    for k in _CUTS:
        cols[f"rw{k}"] = np.where(nonempty, m[f"w{k}"], 0.0)
        cols[f"sw{k}"] = np.where(valid & nonempty, m[f"w{k}"], 0.0)
        cols[f"uw{k}"] = ns * w[f"w{k}"]
        cols[f"ww{k}"] = ns * win * w[f"w{k}"]
    df = pd.DataFrame(cols)
    out = df.groupby(["format", "species"], as_index=False, sort=False).sum()
    return _pt(out)


_USAGE_SUMS = (["raw_count", "saved_count", "usage_raw", "usage_real",
                "win_raw", "win_real"]
               + [f"{p}{k}" for p in ("rw", "sw", "uw", "ww") for k in _CUTS])


def usage_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_usage, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["format", "species"])
    return agg.map_batches(
        _unpivot_cutoffs(["format", "species"],
                         {"raw_weight": "rw", "saved_weight": "sw",
                          "usage_weighted": "uw", "win_weighted": "ww"},
                         ["raw_count", "saved_count", "usage_raw", "usage_real",
                          "win_raw", "win_real"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# moveset count-maps per (format, cutoff, species, kind, key)   [A4]

def _explode_movesets(t: pa.Table) -> pa.Table:
    parent, flat = _flat_slots(t)
    side = flat.field("side").to_numpy()
    species = flat.field("species").to_numpy(zero_copy_only=False)
    # count-maps accumulate the m-weight (stats.ts:311-357); empty slots
    # carry no per-set stats (filter only when legacy padding present —
    # the all-True filter would copy the whole struct array)
    keep = species != "empty"
    if not keep.all():
        parent, side, species = parent[keep], side[keep], species[keep]
        flat = flat.filter(pa.array(keep))
    fmt = _col(t, "format")[parent]
    w = _side_w(t, parent, side, prefix="m")

    ability = flat.field("ability").to_numpy(zero_copy_only=False)
    # unknown ability counts as illuminate (stats.ts:330)
    ability = np.where(ability == "unknown", "illuminate", ability)
    kinds = [
        ("ability", ability),
        ("item", flat.field("item").to_numpy(zero_copy_only=False)),
        ("tera", flat.field("tera").to_numpy(zero_copy_only=False)),
        ("spread", flat.field("spread").to_numpy(zero_copy_only=False)),
        ("stats", flat.field("stats").to_numpy(zero_copy_only=False)),
        ("happiness", flat.field("happiness").to_numpy().astype(str)),
        ("move", flat.field("move1").to_numpy(zero_copy_only=False)),
        ("move", flat.field("move2").to_numpy(zero_copy_only=False)),
        ("move", flat.field("move3").to_numpy(zero_copy_only=False)),
        ("move", flat.field("move4").to_numpy(zero_copy_only=False)),
    ]
    frames = []
    for kind, keys in kinds:
        cols = {"format": fmt, "species": species, "kind": kind, "key": keys}
        for k in _CUTS:
            cols[f"w{k}"] = w[f"w{k}"]
        frames.append(pd.DataFrame(cols))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "species", "kind", "key"],
                     as_index=False, sort=False).sum()
    return _pt(out)


def moveset_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_movesets, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["format", "species", "kind", "key"])
    return agg.map_batches(
        _unpivot_cutoffs(["format", "species", "kind", "key"],
                         {"weight": "w"}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# leads per (format, cutoff, species)   [A7]

def _explode_leads(t: pa.Table) -> pa.Table:
    counted = _batch_counted(t) & _col(t, "singles")
    fmt = _col(t, "format")
    frames = []
    for side, lead_col in ((1, "lead1"), (2, "lead2")):
        cols = {"format": fmt[counted], "species": _col(t, lead_col)[counted],
                "lead_raw": 1}
        for k in _CUTS:
            cols[f"w{k}"] = _col(t, f"p{side}_w{k}")[counted]
        df_side = pd.DataFrame(cols)
        # 'skip' = tag-shard sentinel: this side's team lacks the shard tag,
        # so its lead doesn't count, but the battle still does
        # (stats.ts:543-545 updateLeads tag gate)
        frames.append(df_side[df_side["species"] != "skip"])
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "species"], as_index=False, sort=False).sum()
    return _pt(out)


def lead_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_leads, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["format", "species"])

    def finish(t: pa.Table) -> pa.Table:
        base = _unpivot_cutoffs(["format", "species"], {"lead_weighted": "w"},
                                ["lead_raw"])(t)
        df = base.to_pandas()
        df["lead_real"] = df["lead_raw"]  # updateLeads: real == raw
        return _pt(df[["format", "cutoff", "species", "lead_raw", "lead_real",
                       "lead_weighted"]])

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# battle counts per (format, cutoff)   [A3 battles counter]

def _explode_battles(t: pa.Table) -> pa.Table:
    counted = _batch_counted(t)
    df = pd.DataFrame({"format": _col(t, "format")[counted], "battles": 1})
    return _pt(df.groupby("format", as_index=False, sort=False).sum())


def battle_counts(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_battles, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = part.groupby("format").aggregate(Sum("battles", alias_name="battles"))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        frames = []
        for k in _CUTS:
            sub = df.copy()
            sub["cutoff"] = [cutoffs_for(f)[k] for f in df["format"]]
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        out["cutoff"] = out["cutoff"].astype(np.int32)
        return _pt(out[["format", "cutoff", "battles"]])

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# encounters per (format, cutoff, species, opponent, outcome)   [A6]

def _explode_encounters(t: pa.Table) -> pa.Table:
    matchups = t["matchups"].combine_chunks()
    parent = pc.list_parent_indices(matchups).to_numpy().astype(np.int64)
    flat = matchups.flatten()
    s1 = flat.field("s1").to_numpy(zero_copy_only=False)
    s2 = flat.field("s2").to_numpy(zero_copy_only=False)
    out = flat.field("outcome").to_numpy()

    m = _batch_counted(t)[parent]
    fmt = _col(t, "format")[parent]
    wmin = {k: np.minimum(_col(t, f"p1_w{k}"), _col(t, f"p2_w{k}"))[parent]
            for k in _CUTS}
    frames = []
    # both directions with inverse outcomes (stats.ts:485-514)
    for sp, opp, oc in ((s1, s2, out), (s2, s1, INVERSE_OUTCOMES[out])):
        cols = {"format": fmt[m], "species": sp[m], "opponent": opp[m],
                "outcome": oc[m]}
        for k in _CUTS:
            cols[f"w{k}"] = wmin[k][m]
        frames.append(pd.DataFrame(cols))
    df = pd.concat(frames, ignore_index=True)
    out_df = df.groupby(["format", "species", "opponent", "outcome"],
                        as_index=False, sort=False).sum()
    return _pt(out_df)


def encounter_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_encounters, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["format", "species", "opponent", "outcome"])
    return agg.map_batches(
        _unpivot_cutoffs(["format", "species", "opponent", "outcome"],
                         {"weight": "w"}),
        batch_format="pyarrow")


def checks_counters_stats(parsed: Dataset, min_n: float = 20.0) -> Dataset:
    """A11 checks & counters (util.ts:332-357) from the encounter matrix:
    n = encounter mass over outcomes 0-5, p = (koed + switched) / n,
    d = sqrt(p(1-p)/n), score = p - 4d (each Math.round'ed at 1e10 like the
    reference); pairs with n <= min_n are dropped. One extra small groupby
    over the already-aggregated encounter rows."""
    enc = encounter_stats(parsed)

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        oc = df["outcome"].to_numpy().astype(np.int64)
        w = df["weight"].to_numpy()
        df["n"] = np.where(oc <= 5, w, 0.0)
        df["koed"] = np.where(oc == 0, w, 0.0)      # reports._KOED
        df["switched"] = np.where(oc == 3, w, 0.0)  # reports._SWITCHED
        return _pt(df[["format", "cutoff", "species", "opponent",
                       "n", "koed", "switched"]])

    part = enc.map_batches(pre, batch_format="pyarrow")
    agg = _hash_grouped(part, ["format", "cutoff", "species", "opponent"])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["n"] > min_n].copy()
        n = df["n"].to_numpy(dtype=np.float64)

        def jsr(x):  # vectorized js_round at 1e10 (util.ts:277)
            return np.floor(x * 1e10 + 0.5) / 1e10

        with np.errstate(invalid="ignore", divide="ignore"):
            p = jsr((df["koed"].to_numpy() + df["switched"].to_numpy()) / n)
            d = jsr(np.sqrt(p * (1.0 - p) / n))
        df["p"], df["d"], df["score"] = p, d, jsr(p - 4.0 * d)
        return _pt(df[["format", "cutoff", "species", "opponent",
                       "n", "p", "d", "score"]])

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# teammates per (format, cutoff, pair)   [A5]

def _explode_teammates(t: pa.Table) -> pa.Table:
    """Pair explosion in pure offset arithmetic — no per-battle Python.

    Kept slots (non-short battle, non-'empty' species) are stably grouped
    by (battle, side); each group's unordered pairs come from a precomputed
    upper-triangle template indexed by group size, expanded with
    repeat/cumsum index math. Emission order is identical to the reference
    loop (battle asc, side 1 then 2, row-major triangle), so in-batch
    partial sums reduce in the same FP order."""
    slots = t["slots"].combine_chunks()
    parent0 = pc.list_parent_indices(slots).to_numpy().astype(np.int64)
    flat = slots.flatten()
    side = flat.field("side").to_numpy()
    species = flat.field("species").to_numpy(zero_copy_only=False)

    short = _col(t, "short")
    fmt = _col(t, "format")
    # real-real pairs only; legacy empty-slot teammate entries are a
    # separate last-writer family (teammate_empty_lastwriter)
    keep = (~short[parent0]) & (species != "empty") if len(parent0) else \
        np.zeros(0, dtype=bool)
    kept = np.flatnonzero(keep)

    def _empty():
        cols = {"format": pd.Series(dtype=object),
                "s1": pd.Series(dtype=object), "s2": pd.Series(dtype=object)}
        for k in _CUTS:
            cols[f"w{k}"] = pd.Series(dtype=np.float64)
        return _pt(pd.DataFrame(cols))

    if not len(kept):
        return _empty()

    g = parent0[kept] * 2 + (side[kept] == 2)
    order = np.argsort(g, kind="stable")     # slot order preserved in group
    kept, g = kept[order], g[order]
    bounds = np.empty(len(g), dtype=bool)
    bounds[0] = True
    bounds[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(bounds)
    counts = np.diff(np.append(starts, len(g)))

    sel = counts >= 2
    if not sel.any():
        return _empty()
    gs, cs = starts[sel], counts[sel]
    cmax = int(cs.max())
    npairs = (cmax * (cmax - 1)) // 2
    tri_i = np.zeros((cmax + 1, npairs), dtype=np.int64)
    tri_j = np.zeros((cmax + 1, npairs), dtype=np.int64)
    for c in range(2, cmax + 1):
        iu, ju = np.triu_indices(c, k=1)
        tri_i[c, :len(iu)], tri_j[c, :len(ju)] = iu, ju

    m = cs * (cs - 1) // 2
    grp = np.repeat(np.arange(len(cs)), m)
    rank = np.arange(int(m.sum())) - np.repeat(np.cumsum(m) - m, m)
    c_g = cs[grp]
    ia = kept[gs[grp] + tri_j[c_g, rank]]   # later slot of the pair
    ib = kept[gs[grp] + tri_i[c_g, rank]]
    par = g[gs[grp]] // 2

    sa, sb = species[ia], species[ib]
    sd = side[ia]
    cols = {"format": fmt[par], "s1": np.minimum(sa, sb),
            "s2": np.maximum(sa, sb)}
    w = _side_w(t, par, sd)
    for k in _CUTS:
        cols[f"w{k}"] = w[f"w{k}"]
    df = pd.DataFrame(cols)
    out = df.groupby(["format", "s1", "s2"], as_index=False, sort=False).sum()
    return _pt(out)


def teammate_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_teammates, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["format", "s1", "s2"])
    return agg.map_batches(
        _unpivot_cutoffs(["format", "s1", "s2"], {"weight": "w"}),
        batch_format="pyarrow")


def teammate_empty_lastwriter(parsed: Dataset) -> Dataset:
    """Legacy 'empty'-slot teammate entries (stats.ts:298-302,449-471).

    When a legacy-padded team has empty slots, updateTeammates is called
    with a FRESH accumulator for each empty index, so
    stats.pokemon[b].teammates['empty'] is *overwritten* (not summed) with
    (occurrences of b in that team) x weight — the value from the last
    processed (battle, side) wins. Reproduced distributed: emit one row per
    (battle, side, species) with an order key, aggregate = row of max order.
    Rows for b == 'empty' carry the (e-1) x weight self-entry.
    """

    def _explode(t: pa.Table) -> pa.Table:
        slots = t["slots"].combine_chunks()
        parent = pc.list_parent_indices(slots).to_numpy().astype(np.int64)
        flat = slots.flatten()
        side_a = flat.field("side").to_numpy()
        species_a = flat.field("species").to_numpy(zero_copy_only=False)
        short = _col(t, "short")
        fmt = _col(t, "format")
        doc = _col(t, "doc_id")

        def _empty_frame():
            cols = {"format": pd.Series(dtype=object),
                    "species": pd.Series(dtype=object),
                    "ord": pd.Series(dtype=object)}
            for k in _CUTS:
                cols[f"w{k}"] = pd.Series(dtype=np.float64)
            return _pt(pd.DataFrame(cols))

        keep = ~short[parent] if len(parent) else np.zeros(0, dtype=bool)
        if not keep.any():
            return _empty_frame()
        df = pd.DataFrame({"b": parent[keep], "s": side_a[keep],
                           "sp": species_a[keep]})
        df["is_empty"] = df["sp"] == "empty"
        # only (battle, side) groups that contain at least one empty slot
        n_empty = df.groupby(["b", "s"], sort=False)["is_empty"] \
                    .transform("sum")
        df = df[n_empty > 0]
        if df.empty:
            return _empty_frame()
        counts = (df[~df["is_empty"]]
                  .groupby(["b", "s", "sp"], sort=False)
                  .size().reset_index(name="c"))
        em = (df[df["is_empty"]].groupby(["b", "s"], sort=False)
              .size().reset_index(name="ne"))
        em = em[em["ne"] >= 2].copy()
        em["sp"] = "empty"
        em["c"] = em["ne"] - 1
        rows = pd.concat([counts, em[["b", "s", "sp", "c"]]],
                         ignore_index=True)
        b = rows["b"].to_numpy()
        s = rows["s"].to_numpy()
        c = rows["c"].to_numpy().astype(np.float64)
        out = {"format": fmt[b], "species": rows["sp"].to_numpy(),
               "ord": (pd.Series(doc[b]).astype(str) + "|"
                       + pd.Series(s).astype(str)).to_numpy()}
        for k in _CUTS:
            w = np.where(s == 1, _col(t, f"p1_w{k}")[b],
                         _col(t, f"p2_w{k}")[b])
            out[f"w{k}"] = c * w
        return _pt(pd.DataFrame(out))

    part = parsed.map_batches(_explode, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)

    def _last(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ord")
        return df.groupby(["format", "species"], as_index=False,
                          sort=False).last()

    # _last is already bucket-aware (global ord sort + grouped last), so it
    # runs unchanged over the int-bucket exchange
    agg = bucketed_group_map(part, ["format", "species"], _last)
    return agg.map_batches(
        _unpivot_cutoffs(["format", "species"], {"weight": "w"}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# metagame tag weights per (format, cutoff, tag)   [updateStats metagame]
# NOTE: the reference adds the tag weight once per *pokemon* of the tagged
# player's team (the loop in stats.ts:284-295), so the contribution is
# n_mons * w — replicated deliberately.

def _nmons(t: pa.Table) -> dict[int, np.ndarray]:
    slots = t["slots"].combine_chunks()
    parent_s = pc.list_parent_indices(slots).to_numpy()
    sside = slots.flatten().field("side").to_numpy()
    out = {}
    for s in (1, 2):
        cnt = np.zeros(len(t), dtype=np.int64)
        np.add.at(cnt, parent_s[sside == s], 1)
        out[s] = cnt
    return out


def _explode_metagame(t: pa.Table) -> pa.Table:
    fmt = _col(t, "format")
    short = _col(t, "short")
    nm = _nmons(t)
    frames = []
    for j, side in enumerate(("p1", "p2")):
        tags = t[f"{side}_tags"].combine_chunks()
        par = pc.list_parent_indices(tags).to_numpy().astype(np.int64)
        tag = tags.flatten().to_numpy(zero_copy_only=False)
        mask = ~short[par]
        par_m, tag_m = par[mask], tag[mask]
        mult = nm[j + 1][par_m]
        cols = {"format": fmt[par_m], "tag": tag_m}
        for k in _CUTS:
            cols[f"w{k}"] = _col(t, f"{side}_w{k}")[par_m] * mult
        frames.append(pd.DataFrame(cols))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "tag"], as_index=False, sort=False).sum()
    return _pt(out)


def metagame_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_metagame, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = part.groupby(["format", "tag"]).aggregate(
        *[Sum(m, alias_name=m) for m in _W])
    return agg.map_batches(
        _unpivot_cutoffs(["format", "tag"], {"weight": "w"}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stalliness sample mass per (format, cutoff, value)   [A12 input]

def _explode_stalliness(t: pa.Table) -> pa.Table:
    fmt = _col(t, "format")
    short = _col(t, "short")
    nm = _nmons(t)
    ns = ~short
    frames = []
    for j, side in enumerate(("p1", "p2")):
        val = _col(t, f"{side}_stalliness")
        mult = nm[j + 1]
        cols = {"format": fmt[ns], "value": val[ns], "count": mult[ns]}
        for k in _CUTS:
            cols[f"w{k}"] = (_col(t, f"{side}_w{k}") * mult)[ns]
        frames.append(pd.DataFrame(cols))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "value"], as_index=False, sort=False).sum()
    return _pt(out)


def stalliness_stats(parsed: Dataset) -> Dataset:
    """A12 input: stalliness sample mass grouped by exact value.

    The reference collects every (value, weight) pair (one per *mon* of each
    non-short battle-player, stats.ts:290-295); distinct values are bounded
    by team-composition combinatorics, so grouping by exact value keeps the
    histogram reconstruction exact while staying aggregate-sized at scale."""
    part = parsed.map_batches(_explode_stalliness, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["format", "value"])
    return agg.map_batches(
        _unpivot_cutoffs(["format", "value"], {"weight": "w"}, ["count"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# unique players per (format, cutoff, species, player)   [A9 — exact dedup]

def _explode_unique(t: pa.Table) -> pa.Table:
    parent, flat = _flat_slots(t)
    species = flat.field("species").to_numpy(zero_copy_only=False)
    keep = species != "empty"
    if not keep.all():
        parent, species = parent[keep], species[keep]
        flat = flat.filter(pa.array(keep))
    side = flat.field("side").to_numpy()
    player = flat.field("player").to_numpy(zero_copy_only=False)
    real = (flat.field("turns_out").to_numpy() > 0).astype(np.int64)
    fmt = _col(t, "format")[parent]
    short = _col(t, "short")[parent]
    ns = ~short
    g = np.where(side == 1, _col(t, "p1_gxe")[parent], _col(t, "p2_gxe")[parent])
    g = g.astype(np.float64)
    g = np.where(np.isnan(g), -1.0, g)
    w = _side_w(t, parent, side)

    cols = {"format": fmt, "species": species, "player": player,
            "r": np.where(ns, real, 0), "g": g}
    for k in _CUTS:
        cols[f"w{k}"] = np.where(ns, w[f"w{k}"], 0.0)
    df = pd.DataFrame(cols)
    out = df.groupby(["format", "species", "player"],
                     as_index=False, sort=False).max()
    return _pt(out)


def _per_player_max(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_unique, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    return _hash_grouped(part, ["format", "species", "player"], how="max")


def _rollup_unique(per_player: Dataset) -> Dataset:
    def _count(df: pd.DataFrame) -> pd.DataFrame:
        named = {"n_players": ("player", "size"),
                 "real_players": ("r", "sum")}
        for k in _CUTS:
            named[f"sw{k}"] = (f"w{k}", "sum")
        return df.groupby(["format", "species"], as_index=False).agg(**named)

    rolled = bucketed_group_map(per_player, ["format", "species"], _count,
                                stable_order=True)
    return rolled.map_batches(
        _unpivot_cutoffs(["format", "species"], {"sum_max_weight": "sw"},
                         ["n_players", "real_players"]),
        batch_format="pyarrow")


def unique_player_rollup(parsed: Dataset) -> Dataset:
    """Two-level exact dedup (A9): hash-shuffled max per (.., player), then a
    per-species count/sum. The per-player state never lives in one worker's
    heap (the reference's unbounded-memory concern, FAQ.md:78-90)."""
    return _rollup_unique(_per_player_max(parsed))


def unique_total_rollup(per_player: Dataset) -> Dataset:
    """Format-level unique-player totals (display.ts:346-377 computeUnique):
    per player, OR the real flags and MAX the weights across species, then
    count/sum per format. Shares the per-player max shuffle with A9/A10."""

    def _proj(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop(columns=["species", "g"])
        return _pt(df.groupby(["format", "player"], as_index=False,
                              sort=False).max())

    part = per_player.map_batches(_proj, batch_format="pyarrow")
    maxed = _hash_grouped(part, ["format", "player"], how="max")

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        row = {"format": [df["format"].iloc[0]],
               "n_players": [len(df)], "real_players": [int(df["r"].sum())]}
        for k in _CUTS:
            row[f"sw{k}"] = [float(df[f"w{k}"].sum())]
        return pd.DataFrame(row)

    rolled = maxed.groupby("format").map_groups(_count, batch_format="pandas")
    return rolled.map_batches(
        _unpivot_cutoffs(["format"], {"sum_max_weight": "sw"},
                         ["n_players", "real_players"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fused high-cardinality pass: ONE explode + ONE hash-bucket shuffle for the
# four big families (movesets, encounters, teammates, stalliness). Generic
# row: (family, format, k1, k2, k3, i1, w0..w3). Collapsing four all-to-all
# exchanges into one removes most fixed stage latency and keeps every
# shuffle byte useful — the per-family shape is restored from the (small)
# aggregated output.

def _explode_fused(t: pa.Table) -> pa.Table:
    # Arrow-native assembly: the per-family explodes already emit Arrow
    # tables; renaming / constant columns / concat stay zero-copy instead of
    # round-tripping ~1M rows per batch through pandas
    cols = ["family", "format", "k1", "k2", "k3", "i1"] + _W

    def const_str(n: int, val: str) -> pa.Array:
        return pa.array(np.full(n, val, dtype=object), type=pa.string())

    def assemble(src: pa.Table, family: str, named: dict[str, str],
                 extra: dict[str, pa.Array]) -> pa.Table:
        n = len(src)
        out = {"family": const_str(n, family)}
        for c in cols[1:]:
            if c in extra:
                out[c] = extra[c]
            else:
                out[c] = src[named.get(c, c)]
        return pa.table(out)

    m = _explode_movesets(t)
    e = _explode_encounters(t)
    tm = _explode_teammates(t)
    st = _explode_stalliness(t)
    zeros = lambda n: pa.array(np.zeros(n, dtype=np.int64))  # noqa: E731
    blanks = lambda n: const_str(n, "")  # noqa: E731

    parts = [
        assemble(m, "movesets",
                 {"k1": "species", "k2": "kind", "k3": "key"},
                 {"i1": zeros(len(m))}),
        assemble(e, "encounters",
                 {"k1": "species", "k2": "opponent"},
                 {"k3": e["outcome"].cast(pa.string()),
                  "i1": zeros(len(e))}),
        assemble(tm, "teammates", {"k1": "s1", "k2": "s2"},
                 {"k3": blanks(len(tm)), "i1": zeros(len(tm))}),
        assemble(st, "stalliness", {"i1": "count"},
                 {"k1": pa.array([repr(v) for v in
                                  st["value"].to_numpy()]),  # exact roundtrip
                  "k2": blanks(len(st)), "k3": blanks(len(st))}),
    ]
    return pa.concat_tables(parts, promote_options="permissive")


def fused_highcard(parsed: Dataset, nbuckets: int = 128,
                   salt: int | None = None) -> Dataset:
    part = parsed.map_batches(_explode_fused, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    return _hash_grouped(part, ["family", "format", "k1", "k2", "k3"],
                         nbuckets=nbuckets, salt=salt)


def _split_family(fused: Dataset, family: str, reshape) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["family"], family)
        return reshape(t.filter(mask))
    return fused.map_batches(fn, batch_format="pyarrow")


def split_movesets(fused: Dataset) -> Dataset:
    def reshape(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            ["family", "format", "species", "kind", "key", "i1"] + _W)
        return _unpivot_cutoffs(["format", "species", "kind", "key"],
                                {"weight": "w"})(t)
    return _split_family(fused, "movesets", reshape)


def split_encounters(fused: Dataset) -> Dataset:
    def reshape(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.rename(columns={"k1": "species", "k2": "opponent"})
        df["outcome"] = df["k3"].astype(np.int8)
        out = _unpivot_cutoffs(["format", "species", "opponent", "outcome"],
                               {"weight": "w"})(_pt(df))
        return out
    return _split_family(fused, "encounters", reshape)


def split_teammates(fused: Dataset) -> Dataset:
    def reshape(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["family", "format", "s1", "s2", "k3", "i1"] + _W)
        return _unpivot_cutoffs(["format", "s1", "s2"], {"weight": "w"})(t)
    return _split_family(fused, "teammates", reshape)


def split_stalliness(fused: Dataset) -> Dataset:
    def reshape(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["value"] = df["k1"].map(float)
        df = df.rename(columns={"i1": "count"})
        return _unpivot_cutoffs(["format", "value"], {"weight": "w"},
                                ["count"])(_pt(df))
    return _split_family(fused, "stalliness", reshape)


FUSED_SPLITS = {
    "movesets": split_movesets,
    "encounters": split_encounters,
    "teammates": split_teammates,
    "stalliness": split_stalliness,
}


def unique_and_viability(parsed: Dataset) -> tuple[Dataset, Dataset]:
    """Share the per-player max shuffle between A9 and A10."""
    per_player = _per_player_max(parsed).materialize()
    return (_rollup_unique(per_player), _rollup_viability(per_player))


def mono_usage_stats(parsed: Dataset, fmt: str = "gen9monotype") -> Dataset:
    """F1 shard semantics for the monotype format: updateStats is gated on
    the *player's team* carrying the shard tag (stats.ts:155-166); one format
    fans out into one aggregation per mono<type> shard
    (workflows/smogon/stats.ts:110-121)."""

    def _explode(t: pa.Table) -> pa.Table:
        keep = _col(t, "format") == fmt
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            cols = {"tag": pd.Series(dtype=object),
                    "species": pd.Series(dtype=object),
                    "usage_raw": pd.Series(dtype=np.int64)}
            for k in _CUTS:
                cols[f"uw{k}"] = pd.Series(dtype=np.float64)
            return _pt(pd.DataFrame(cols))
        parent, flat = _flat_slots(t)
        side = flat.field("side").to_numpy()
        species = flat.field("species").to_numpy(zero_copy_only=False)
        short = _col(t, "short")[parent]
        ns = (~short).astype(np.int64)
        w = _side_w(t, parent, side)

        # player-side mono tags, joined to that side's slots
        frames = []
        for j, sd in enumerate(("p1", "p2")):
            tags = t[f"{sd}_tags"].combine_chunks()
            tpar = pc.list_parent_indices(tags).to_numpy().astype(np.int64)
            tval = tags.flatten().to_numpy(zero_copy_only=False)
            mono = np.char.startswith(tval.astype(str), "mono")
            tpar, tval = tpar[mono], tval[mono]
            # battle -> its mono tags; slots of this side explode per tag
            smask = side == (j + 1)
            sl_par = parent[smask]
            sl_species = species[smask]
            sl_ns = ns[smask]
            sl_w = {k: w[f"w{k}"][smask] for k in _CUTS}
            # build (slot x tag) pairs via searchsorted on battle index
            order = np.argsort(tpar, kind="stable")
            tpar_s, tval_s = tpar[order], tval[order]
            starts = np.searchsorted(tpar_s, sl_par, side="left")
            ends = np.searchsorted(tpar_s, sl_par, side="right")
            counts = ends - starts
            rep = np.repeat(np.arange(len(sl_par)), counts)
            tag_idx = np.concatenate(
                [np.arange(s, e) for s, e in zip(starts, ends)]) \
                if len(sl_par) else np.array([], dtype=np.int64)
            cols = {"tag": tval_s[tag_idx], "species": sl_species[rep],
                    "usage_raw": sl_ns[rep]}
            for k in _CUTS:
                cols[f"uw{k}"] = sl_ns[rep] * sl_w[k][rep]
            frames.append(pd.DataFrame(cols))
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby(["tag", "species"], as_index=False, sort=False).sum()
        return _pt(out)

    part = parsed.map_batches(_explode, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)
    agg = _hash_grouped(part, ["tag", "species"])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        frames = []
        for k in _CUTS:
            sub = df[["tag", "species", "usage_raw"]].copy()
            sub["cutoff"] = np.int32(cutoffs_for(fmt)[k])
            sub["usage_weighted"] = df[f"uw{k}"].to_numpy()
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        return _pt(out[["tag", "cutoff", "species", "usage_raw",
                        "usage_weighted"]])

    return agg.map_batches(finish, batch_format="pyarrow")


def rating_percentile(parsed: Dataset, q: float = 0.9) -> Dataset:
    """A15: per-format rating percentile (tools/stats `cutoff` command) —
    nearest-rank over both players' ratings where present.

    Group sizes are bounded by rated battles per format; at corpus scale
    switch the exact rank for a mergeable quantile sketch."""

    def _explode(t: pa.Table) -> pa.Table:
        fmt = _col(t, "format")
        frames = []
        for side in ("p1", "p2"):
            has = _col(t, f"{side}_has_rating")
            rpr = _col(t, f"{side}_rpr").astype(np.float64)
            frames.append(pd.DataFrame({"format": fmt[has], "rpr": rpr[has]}))
        return _pt(pd.concat(frames, ignore_index=True))

    rows = parsed.map_batches(_explode, batch_format="pyarrow",
                              batch_size=_EXPLODE_BATCH)

    def _pct(df: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(df["rpr"].to_numpy())
        n = len(vals)
        idx = max(0, int(np.ceil(q * n)) - 1)  # nearest-rank (1-based ceil)
        return pd.DataFrame({"format": [df["format"].iloc[0]],
                             "n_ratings": [n],
                             "percentile": [float(vals[idx])]})

    return rows.groupby("format").map_groups(_pct, batch_format="pandas")


def _rollup_viability(per_player: Dataset) -> Dataset:
    def _viab(df: pd.DataFrame) -> pd.DataFrame:
        gxes = np.sort(df["g"].to_numpy()[df["g"].to_numpy() >= 0])[::-1]
        n = len(gxes)
        if n == 0:
            vals = [0, 0.0, 0.0, 0.0]
        else:
            vals = [n, float(gxes[0]),
                    float(gxes[int(np.ceil(0.01 * n)) - 1]),
                    float(gxes[int(np.ceil(0.2 * n)) - 1])]
        return pd.DataFrame({
            "format": [df["format"].iloc[0]], "species": [df["species"].iloc[0]],
            "v_n": [int(vals[0])], "v_max": [vals[1]],
            "v_p99": [vals[2]], "v_p80": [vals[3]],
        })

    def _viab_or_empty(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"format": pd.Series(dtype=str),
                                 "species": pd.Series(dtype=str),
                                 "v_n": pd.Series(dtype="int64"),
                                 "v_max": pd.Series(dtype="float64"),
                                 "v_p99": pd.Series(dtype="float64"),
                                 "v_p80": pd.Series(dtype="float64")})
        return _viab(g)

    rolled = bucketed_group_map(per_player, ["format", "species"],
                                _viab_or_empty, per_group=True)

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        frames = []
        for k in _CUTS:
            sub = df.copy()
            sub["cutoff"] = np.array([cutoffs_for(f)[k] for f in df["format"]],
                                     dtype=np.int32)
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        return _pt(out[["format", "cutoff", "species", "v_n", "v_max",
                        "v_p99", "v_p80"]])

    return rolled.map_batches(finish, batch_format="pyarrow")


def viability_stats(parsed: Dataset) -> Dataset:
    """A10: GXE order statistics [n, max, p99, p80] per species from the
    per-player max-GXE dedup (util.ts:311-321). GXE is cutoff-independent,
    so the order statistics are computed once per (format, species) and
    replicated across the cutoff schedule."""
    return _rollup_viability(_per_player_max(parsed))
