"""Grouped aggregations over parsed battles (the reference's Stats monoid).

The reference accumulates a nested dict-of-counters per worker then merges
checkpoints (stats/src/stats.ts:66-242). Here the same totals are expressed
Ray-Data-natively: each family explodes parsed battles into long-form rows
*pre-aggregated per batch* (a combiner — pandas groupby inside map_batches),
then a single `groupby().aggregate(Sum/Max)` shuffle over the much smaller
partials finishes the job. This keeps the all-to-all exchange proportional
to the number of distinct keys per block, not to row count, which is what
makes the hot-format skew (gen9ou-style keys) tractable at scale.

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
from ray.data.aggregate import Max, Sum

# inverse-outcome lookup (stats.ts:474-483)
INVERSE_OUTCOMES = np.array([1, 0, 2, 4, 3, 5, 7, 6, 9, 8, 11, 10, 12], dtype=np.int8)

_CUTS = range(4)


def _col(t: pa.Table, name: str) -> np.ndarray:
    return t[name].to_numpy(zero_copy_only=False)


def _flat_slots(t: pa.Table):
    slots = t["slots"].combine_chunks()
    parent = pc.list_parent_indices(slots).to_numpy().astype(np.int64)
    return parent, slots.flatten()


def _pt(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def _batch_counted(t: pa.Table) -> np.ndarray:
    """battle 'counted' gate: non-short AND (non-singles OR valid leads)
    (stats.ts:175-209)."""
    short = _col(t, "short")
    singles = _col(t, "singles")
    lead_ok = (_col(t, "lead1") != "empty") & (_col(t, "lead2") != "empty")
    return (~short) & (~singles | lead_ok)


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

    frames = []
    for k in _CUTS:
        w = np.where(side == 1, _col(t, f"p1_w{k}")[parent], _col(t, f"p2_w{k}")[parent])
        valid = np.where(side == 1, _col(t, "p1_valid")[parent],
                         _col(t, "p2_valid")[parent])
        cutoff = np.where(side == 1, _col(t, f"cutoff{k}")[parent],
                          _col(t, f"cutoff{k}")[parent])
        frames.append(pd.DataFrame({
            "format": fmt, "cutoff": cutoff.astype(np.int32), "species": species,
            "raw_count": 1, "raw_weight": w,
            "saved_count": valid.astype(np.int64), "saved_weight": np.where(valid, w, 0.0),
            "usage_raw": ns, "usage_real": ns * real, "usage_weighted": ns * w,
            "win_raw": ns * win, "win_real": ns * win * real,
            "win_weighted": ns * win * w,
        }))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "cutoff", "species"], as_index=False, sort=False).sum()
    return _pt(out)


USAGE_MEASURES = ["raw_count", "raw_weight", "saved_count", "saved_weight",
                  "usage_raw", "usage_real", "usage_weighted",
                  "win_raw", "win_real", "win_weighted"]


def usage_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_usage, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "species"]).aggregate(
        *[Sum(m, alias_name=m) for m in USAGE_MEASURES])


# ---------------------------------------------------------------------------
# moveset count-maps per (format, cutoff, species, kind, key)   [A4]

def _explode_movesets(t: pa.Table) -> pa.Table:
    parent, flat = _flat_slots(t)
    side = flat.field("side").to_numpy()
    species = flat.field("species").to_numpy(zero_copy_only=False)
    fmt = _col(t, "format")[parent]

    ability = flat.field("ability").to_numpy(zero_copy_only=False)
    # unknown ability counts as illuminate (stats.ts:330)
    ability = np.where(ability == "unknown", "illuminate", ability)
    kinds = {
        "ability": ability,
        "item": flat.field("item").to_numpy(zero_copy_only=False),
        "tera": flat.field("tera").to_numpy(zero_copy_only=False),
        "spread": flat.field("spread").to_numpy(zero_copy_only=False),
        "stats": flat.field("stats").to_numpy(zero_copy_only=False),
        "happiness": flat.field("happiness").to_numpy().astype(str),
        "move:1": flat.field("move1").to_numpy(zero_copy_only=False),
        "move:2": flat.field("move2").to_numpy(zero_copy_only=False),
        "move:3": flat.field("move3").to_numpy(zero_copy_only=False),
        "move:4": flat.field("move4").to_numpy(zero_copy_only=False),
    }
    frames = []
    for k in _CUTS:
        w = np.where(side == 1, _col(t, f"p1_w{k}")[parent], _col(t, f"p2_w{k}")[parent])
        cutoff = _col(t, f"cutoff{k}")[parent].astype(np.int32)
        for kind, keys in kinds.items():
            frames.append(pd.DataFrame({
                "format": fmt, "cutoff": cutoff, "species": species,
                "kind": kind.split(":")[0], "key": keys, "weight": w,
            }))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "cutoff", "species", "kind", "key"],
                     as_index=False, sort=False)["weight"].sum()
    return _pt(out)


def moveset_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_movesets, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "species", "kind", "key"]).aggregate(
        Sum("weight", alias_name="weight"))


# ---------------------------------------------------------------------------
# leads per (format, cutoff, species)   [A7]

def _explode_leads(t: pa.Table) -> pa.Table:
    counted = _batch_counted(t) & _col(t, "singles")
    fmt = _col(t, "format")
    frames = []
    for k in _CUTS:
        cutoff = _col(t, f"cutoff{k}").astype(np.int32)
        for side, lead_col, w_col in ((1, "lead1", f"p1_w{k}"), (2, "lead2", f"p2_w{k}")):
            mask = counted
            frames.append(pd.DataFrame({
                "format": fmt[mask], "cutoff": cutoff[mask],
                "species": _col(t, lead_col)[mask],
                "lead_raw": 1, "lead_real": 1,
                "lead_weighted": _col(t, w_col)[mask],
            }))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "cutoff", "species"], as_index=False, sort=False).sum()
    return _pt(out)


def lead_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_leads, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "species"]).aggregate(
        Sum("lead_raw", alias_name="lead_raw"),
        Sum("lead_real", alias_name="lead_real"),
        Sum("lead_weighted", alias_name="lead_weighted"))


# ---------------------------------------------------------------------------
# battle counts per (format, cutoff)   [A3 battles counter]

def _explode_battles(t: pa.Table) -> pa.Table:
    counted = _batch_counted(t)
    fmt = _col(t, "format")[counted]
    frames = []
    for k in _CUTS:
        frames.append(pd.DataFrame({
            "format": fmt, "cutoff": _col(t, f"cutoff{k}")[counted].astype(np.int32),
            "battles": 1,
        }))
    df = pd.concat(frames, ignore_index=True)
    return _pt(df.groupby(["format", "cutoff"], as_index=False, sort=False).sum())


def battle_counts(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_battles, batch_format="pyarrow")
    return part.groupby(["format", "cutoff"]).aggregate(Sum("battles", alias_name="battles"))


# ---------------------------------------------------------------------------
# encounters per (format, cutoff, species, opponent, outcome)   [A6]

def _explode_encounters(t: pa.Table) -> pa.Table:
    matchups = t["matchups"].combine_chunks()
    parent = pc.list_parent_indices(matchups).to_numpy().astype(np.int64)
    flat = matchups.flatten()
    s1 = flat.field("s1").to_numpy(zero_copy_only=False)
    s2 = flat.field("s2").to_numpy(zero_copy_only=False)
    out = flat.field("outcome").to_numpy()

    counted = _batch_counted(t)[parent]
    fmt = _col(t, "format")[parent]
    frames = []
    for k in _CUTS:
        w = np.minimum(_col(t, f"p1_w{k}"), _col(t, f"p2_w{k}"))[parent]
        cutoff = _col(t, f"cutoff{k}")[parent].astype(np.int32)
        m = counted
        # both directions with inverse outcomes (stats.ts:485-514)
        frames.append(pd.DataFrame({
            "format": fmt[m], "cutoff": cutoff[m], "species": s1[m],
            "opponent": s2[m], "outcome": out[m], "weight": w[m]}))
        frames.append(pd.DataFrame({
            "format": fmt[m], "cutoff": cutoff[m], "species": s2[m],
            "opponent": s1[m], "outcome": INVERSE_OUTCOMES[out[m]], "weight": w[m]}))
    df = pd.concat(frames, ignore_index=True)
    out_df = df.groupby(["format", "cutoff", "species", "opponent", "outcome"],
                        as_index=False, sort=False)["weight"].sum()
    return _pt(out_df)


def encounter_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_encounters, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "species", "opponent", "outcome"]).aggregate(
        Sum("weight", alias_name="weight"))


# ---------------------------------------------------------------------------
# teammates per (format, cutoff, pair)   [A5]

def _explode_teammates(t: pa.Table) -> pa.Table:
    slots = t["slots"].combine_chunks()
    offsets = slots.offsets.to_numpy().astype(np.int64)
    flat = slots.flatten()
    side = flat.field("side").to_numpy()
    species = flat.field("species").to_numpy(zero_copy_only=False)

    short = _col(t, "short")
    fmt = _col(t, "format")

    # build pair index arrays (i>j within each battle-side) in numpy
    pa_idx, pb_idx, pparent = [], [], []
    for b in range(len(t)):
        if short[b]:
            continue
        lo, hi = offsets[b], offsets[b + 1]
        sd = side[lo:hi]
        for s in (1, 2):
            idx = np.nonzero(sd == s)[0] + lo
            n = len(idx)
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, k=1)
            pa_idx.append(idx[ju])
            pb_idx.append(idx[iu])
            pparent.append(np.full(len(iu), b, dtype=np.int64))
    if not pa_idx:
        return _pt(pd.DataFrame({
            "format": pd.Series(dtype=object), "cutoff": pd.Series(dtype=np.int32),
            "s1": pd.Series(dtype=object), "s2": pd.Series(dtype=object),
            "weight": pd.Series(dtype=np.float64)}))
    ia = np.concatenate(pa_idx)
    ib = np.concatenate(pb_idx)
    par = np.concatenate(pparent)
    sa, sb = species[ia], species[ib]
    lo_s = np.minimum(sa, sb)
    hi_s = np.maximum(sa, sb)
    sd = side[ia]

    frames = []
    for k in _CUTS:
        w = np.where(sd == 1, _col(t, f"p1_w{k}")[par], _col(t, f"p2_w{k}")[par])
        frames.append(pd.DataFrame({
            "format": fmt[par], "cutoff": _col(t, f"cutoff{k}")[par].astype(np.int32),
            "s1": lo_s, "s2": hi_s, "weight": w}))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "cutoff", "s1", "s2"], as_index=False,
                     sort=False)["weight"].sum()
    return _pt(out)


def teammate_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_teammates, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "s1", "s2"]).aggregate(
        Sum("weight", alias_name="weight"))


# ---------------------------------------------------------------------------
# metagame tag weights per (format, cutoff, tag)   [updateStats metagame]
# NOTE: the reference adds the tag weight once per *pokemon* of the tagged
# player's team (the loop in stats.ts:284-295), so the contribution is
# n_mons * w — replicated deliberately.

def _explode_metagame(t: pa.Table) -> pa.Table:
    fmt = _col(t, "format")
    short = _col(t, "short")
    nmons = {}
    slots = t["slots"].combine_chunks()
    parent_s, flat_s = pc.list_parent_indices(slots).to_numpy(), slots.flatten()
    sside = flat_s.field("side").to_numpy()
    for s in (1, 2):
        cnt = np.zeros(len(t), dtype=np.int64)
        np.add.at(cnt, parent_s[sside == s], 1)
        nmons[s] = cnt

    frames = []
    for j, side in enumerate(("p1", "p2")):
        tags = t[f"{side}_tags"].combine_chunks()
        par = pc.list_parent_indices(tags).to_numpy().astype(np.int64)
        tag = tags.flatten().to_numpy(zero_copy_only=False)
        mask = ~short[par]
        par_m, tag_m = par[mask], tag[mask]
        mult = nmons[j + 1][par_m]
        for k in _CUTS:
            w = _col(t, f"{side}_w{k}")[par_m]
            frames.append(pd.DataFrame({
                "format": fmt[par_m], "cutoff": _col(t, f"cutoff{k}")[par_m].astype(np.int32),
                "tag": tag_m, "weight": w * mult}))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "cutoff", "tag"], as_index=False, sort=False)["weight"].sum()
    return _pt(out)


def metagame_stats(parsed: Dataset) -> Dataset:
    part = parsed.map_batches(_explode_metagame, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "tag"]).aggregate(
        Sum("weight", alias_name="weight"))


# ---------------------------------------------------------------------------
# unique players per (format, cutoff, species, player)   [A9 — exact dedup]

def _explode_unique(t: pa.Table) -> pa.Table:
    parent, flat = _flat_slots(t)
    side = flat.field("side").to_numpy()
    species = flat.field("species").to_numpy(zero_copy_only=False)
    player = flat.field("player").to_numpy(zero_copy_only=False)
    real = (flat.field("turns_out").to_numpy() > 0).astype(np.int64)
    fmt = _col(t, "format")[parent]
    short = _col(t, "short")[parent]
    ns = ~short

    frames = []
    for k in _CUTS:
        w = np.where(side == 1, _col(t, f"p1_w{k}")[parent], _col(t, f"p2_w{k}")[parent])
        g = np.where(side == 1, _col(t, "p1_gxe")[parent], _col(t, "p2_gxe")[parent])
        frames.append(pd.DataFrame({
            "format": fmt, "cutoff": _col(t, f"cutoff{k}")[parent].astype(np.int32),
            "species": species, "player": player,
            "r": np.where(ns, real, 0), "w": np.where(ns, w, 0.0),
            "g": np.where(np.isnan(g.astype(np.float64)), -1.0, g.astype(np.float64)),
        }))
    df = pd.concat(frames, ignore_index=True)
    out = df.groupby(["format", "cutoff", "species", "player"],
                     as_index=False, sort=False).max()
    return _pt(out)


def viability_stats(parsed: Dataset) -> Dataset:
    """A10: GXE order statistics [n, max, p99, p80] per species from the
    per-player max-GXE dedup (util.ts:311-321). Group sizes are bounded by
    distinct players, so the per-group sort is safe."""
    part = parsed.map_batches(_explode_unique, batch_format="pyarrow")
    per_player = part.groupby(["format", "cutoff", "species", "player"]).aggregate(
        Max("g", alias_name="g"))

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
            "format": [df["format"].iloc[0]], "cutoff": [df["cutoff"].iloc[0]],
            "species": [df["species"].iloc[0]],
            "v_n": [int(vals[0])], "v_max": [vals[1]],
            "v_p99": [vals[2]], "v_p80": [vals[3]],
        })

    return per_player.groupby(["format", "cutoff", "species"]).map_groups(
        _viab, batch_format="pandas")


def stalliness_stats(parsed: Dataset) -> Dataset:
    """A12 input: stalliness sample mass grouped by exact value.

    The reference collects every (value, weight) pair (one per *mon* of each
    non-short battle-player, stats.ts:290-295); distinct values are bounded
    by team-composition combinatorics, so grouping by exact value keeps the
    histogram reconstruction exact while staying aggregate-sized at scale."""

    def _explode(t: pa.Table) -> pa.Table:
        fmt = _col(t, "format")
        short = _col(t, "short")
        slots = t["slots"].combine_chunks()
        parent_s = pc.list_parent_indices(slots).to_numpy()
        sside = slots.flatten().field("side").to_numpy()
        nm = {}
        for s in (1, 2):
            cnt = np.zeros(len(t), dtype=np.int64)
            np.add.at(cnt, parent_s[sside == s], 1)
            nm[s] = cnt
        frames = []
        ns = ~short
        for j, side in enumerate(("p1", "p2")):
            val = _col(t, f"{side}_stalliness")
            mult = nm[j + 1]
            for k in _CUTS:
                w = _col(t, f"{side}_w{k}")
                frames.append(pd.DataFrame({
                    "format": fmt[ns], "cutoff": _col(t, f"cutoff{k}")[ns].astype(np.int32),
                    "value": val[ns], "count": mult[ns],
                    "weight": (w * mult)[ns]}))
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby(["format", "cutoff", "value"], as_index=False,
                         sort=False).sum()
        return _pt(out)

    part = parsed.map_batches(_explode, batch_format="pyarrow")
    return part.groupby(["format", "cutoff", "value"]).aggregate(
        Sum("count", alias_name="count"), Sum("weight", alias_name="weight"))


def unique_player_rollup(parsed: Dataset) -> Dataset:
    """Two-level exact dedup (A9): hash-shuffled max per (.., player), then a
    per-species count/sum. The per-player state never lives in one worker's
    heap (the reference's unbounded-memory concern, FAQ.md:78-90)."""
    part = parsed.map_batches(_explode_unique, batch_format="pyarrow")
    per_player = part.groupby(["format", "cutoff", "species", "player"]).aggregate(
        Max("r", alias_name="r"), Max("w", alias_name="w"), Max("g", alias_name="g"))

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "format": [df["format"].iloc[0]], "cutoff": [df["cutoff"].iloc[0]],
            "species": [df["species"].iloc[0]],
            "n_players": [len(df)], "real_players": [int(df["r"].sum())],
            "sum_max_weight": [float(df["w"].sum())],
        })

    return per_player.groupby(["format", "cutoff", "species"]).map_groups(
        _count, batch_format="pandas")
