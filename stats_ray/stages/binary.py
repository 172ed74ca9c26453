"""Binary logs-db codec + analytics (M11/S9/O5/A14).

The reference encodes each battle as a fixed-width row — u64 timestamp,
u16 turns, u8 endType, winner/loser rating u16+u8, then two fixed-size team
encodings — and streams timestamp-sorted rows per format
(stats/src/binary.ts:148-223, BINARY.md:18-28; workflows/pkmn/db.ts:63-82).

Our layout (self-defined, over our dex ordinals — the Lookup T3 analogue):

  offset size  field
  0      8     timestamp epoch-ms (u64 LE)
  8      2     turns (u16)
  10     1     endType (0 none, 1 normal, 2 forced, 3 forfeit)
  11     1     winner (0 tie, 1 p1, 2 p2)
  12     2+1   p1 rating (rpr u16 rounded, rprd u8 clamped; 0xFFFF = none)
  15     2+1   p2 rating
  18     2*6*8 teams: per mon (species, item, ability, nature,
               move1..4) as u8 ordinals, 0xFF = empty slot
  -> ROW_SIZE = 18 + 96 = 114 bytes

Encode/decode are fully vectorized (numpy structured views over the Arrow
binary column). The db sink sorts by timestamp within each format partition
(`ds.sort('ts_ms')` per format — O5) and writes resumable Parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..dex import ABILITIES, ITEMS, MOVES, NATURES, SPECIES

MON_SIZE = 8
N_MONS = 6
HEADER = 18
ROW_SIZE = HEADER + 2 * N_MONS * MON_SIZE

_END_TYPES = {"": 0, "normal": 1, "forced": 2, "forfeit": 3}
_END_NAMES = {v: k for k, v in _END_TYPES.items()}


class Lookup:
    """Ordinal maps for the codec (binary.ts:469-484 analogue).
    Deterministic: sorted dex ids. Loaded once per actor."""

    def __init__(self):
        self.species = sorted(SPECIES)
        self.items = sorted(ITEMS) + ["nothing"]
        self.abilities = sorted(ABILITIES) + ["unknown"]
        self.natures = sorted(NATURES)
        self.moves = sorted(MOVES) + [""]
        self.species_ix = {s: i for i, s in enumerate(self.species)}
        self.item_ix = {s: i for i, s in enumerate(self.items)}
        self.ability_ix = {s: i for i, s in enumerate(self.abilities)}
        self.nature_ix = {s: i for i, s in enumerate(self.natures)}
        self.move_ix = {s: i for i, s in enumerate(self.moves)}


class EncodeBinary:
    """parsed battles -> (format, ts_ms, row:binary) fixed-width rows."""

    def __init__(self):
        self.lookup = Lookup()

    def __call__(self, t: pa.Table) -> pa.Table:
        lk = self.lookup
        n = len(t)
        rows = np.full((n, ROW_SIZE), 0xFF, dtype=np.uint8)

        ts = t["ts_ms"].to_numpy().astype(np.uint64)
        rows[:, 0:8] = ts.astype("<u8").view(np.uint8).reshape(n, 8)
        rows[:, 8:10] = t["turns"].to_numpy().astype("<u2").view(np.uint8).reshape(n, 2)
        et = np.array([_END_TYPES.get(e, 0)
                       for e in t["end_type"].to_pylist()], dtype=np.uint8)
        rows[:, 10] = et
        rows[:, 11] = t["winner"].to_numpy().astype(np.uint8)

        for j, side in enumerate(("p1", "p2")):
            has = t[f"{side}_has_rating"].to_numpy(zero_copy_only=False)
            rpr = np.nan_to_num(
                t[f"{side}_rpr"].to_numpy(zero_copy_only=False).astype(np.float64))
            rprd = np.nan_to_num(
                t[f"{side}_rprd"].to_numpy(zero_copy_only=False).astype(np.float64))
            enc = np.where(has, np.clip(np.round(rpr), 0, 0xFFFE), 0xFFFF) \
                .astype("<u2")
            off = 12 + 3 * j
            rows[:, off:off + 2] = enc.view(np.uint8).reshape(n, 2)
            rows[:, off + 2] = np.where(has, np.clip(np.round(rprd), 0, 255), 255) \
                .astype(np.uint8)

        slots = t["slots"].combine_chunks()
        parent = pc.list_parent_indices(slots).to_numpy().astype(np.int64)
        flat = slots.flatten()
        side = flat.field("side").to_numpy().astype(np.int64)
        slot = flat.field("slot").to_numpy().astype(np.int64)
        base = HEADER + ((side - 1) * N_MONS + slot) * MON_SIZE

        def put(field_off, col, ix):
            # dictionary-encode once, map the (tiny) dictionary through the
            # ordinal table, then take — no per-value Python in the hot path
            enc = col.dictionary_encode()
            dict_vals = enc.dictionary.to_pylist()
            lut = np.fromiter((ix[v] for v in dict_vals), np.uint8,
                              len(dict_vals))
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            rows[parent, base + field_off] = lut[codes]

        put(0, flat.field("species"), lk.species_ix)
        put(1, flat.field("item"), lk.item_ix)
        put(2, flat.field("ability"), lk.ability_ix)
        put(3, flat.field("nature"), lk.nature_ix)
        for m in range(4):
            put(4 + m, flat.field(f"move{m + 1}"), lk.move_ix)

        # one flat buffer view, sliced by fixed offsets (no per-row copy)
        flat_bytes = rows.tobytes()
        offsets = pa.array(np.arange(0, (n + 1) * ROW_SIZE, ROW_SIZE,
                                     dtype=np.int32))
        row_col = pa.Array.from_buffers(
            pa.binary(), n,
            [None, offsets.buffers()[1], pa.py_buffer(flat_bytes)])
        return pa.table({
            "format": t["format"], "ts_ms": t["ts_ms"], "row": row_col,
        })


def _rows_view(raw: pa.Array) -> np.ndarray:
    """(n, ROW_SIZE) uint8 view of a fixed-width binary column — zero-copy
    straight from the Arrow values buffer when rows are contiguous (the
    normal case), falling back to a per-row join only for irregular
    offsets. The join path is a per-row Python loop; at 100 TB the
    zero-copy path is the one that runs."""
    n = len(raw)
    odt = np.int64 if pa.types.is_large_binary(raw.type) else np.int32
    offs = np.frombuffer(raw.buffers()[1], odt)[
        raw.offset:raw.offset + n + 1]
    if offs[-1] - offs[0] == n * ROW_SIZE and \
            np.all(np.diff(offs) == ROW_SIZE):
        data = np.frombuffer(raw.buffers()[2], np.uint8)
        return data[offs[0]:offs[-1]].reshape(n, ROW_SIZE)
    return np.frombuffer(b"".join(raw.to_pylist()),
                         dtype=np.uint8).reshape(n, ROW_SIZE)


class DecodeBinary:
    """(row:binary) -> struct columns (inverse of EncodeBinary)."""

    def __init__(self):
        self.lookup = Lookup()

    def __call__(self, t: pa.Table) -> pa.Table:
        lk = self.lookup
        raw = t["row"].combine_chunks()
        n = len(t)
        rows = _rows_view(raw)

        ts = rows[:, 0:8].copy().view("<u8").reshape(n)
        turns = rows[:, 8:10].copy().view("<u2").reshape(n)
        end_type = [_END_NAMES[v] for v in rows[:, 10]]
        winner = rows[:, 11].astype(np.int8)

        out = {
            "ts_ms": pa.array(ts.astype(np.int64)),
            "turns": pa.array(turns.astype(np.int32)),
            "end_type": pa.array(end_type),
            "winner": pa.array(winner),
        }
        for j, side in enumerate(("p1", "p2")):
            off = 12 + 3 * j
            rpr = rows[:, off:off + 2].copy().view("<u2").reshape(n)
            missing = rpr == 0xFFFF
            out[f"{side}_rpr"] = pa.array(
                np.where(missing, -1, rpr).astype(np.float64))
            # mirror the rpr sentinel: an unrated player's deviation byte is
            # the 255 clamp, which must not read back as a real rd of 255.0
            out[f"{side}_rprd"] = pa.array(
                np.where(missing, -1, rows[:, off + 2]).astype(np.float64))

        species_arr = np.array(lk.species + ["empty"])
        team = rows[:, HEADER:].reshape(n, 2 * N_MONS, MON_SIZE)
        sp = team[:, :, 0].copy()
        sp[sp == 0xFF] = len(lk.species)
        names = species_arr[sp]  # (n, 12)
        for j in range(2 * N_MONS):
            out[f"mon{j}"] = pa.array(names[:, j])
        if "format" in t.column_names:
            out["format"] = t["format"]
        return pa.table(out)


def binary_db(parsed: Dataset, out_dir: str) -> None:
    """S9/O5: per-format, timestamp-sorted fixed-row db as Parquet."""
    enc = parsed.map_batches(EncodeBinary, batch_format="pyarrow",
                             concurrency=(1, 8))
    enc.sort(["format", "ts_ms"]).write_parquet(out_dir)


def binary_stats_tables(db: Dataset, cutoff: float = 1630.0) -> Dataset:
    """A14: the dense probability tables binary.ts:244-381 computes from the
    logs db — species usage, leads (team slot 0), move x species,
    item x species and species x species co-occurrence — as ONE long-form
    aggregate: (format, kind, a, b) -> summed weight.

    Weights come from the codec's ROUNDED ratings via util.weighting
    (binary.ts:283-287): unrated players are skipped, no validity
    imputation. One map_batches explode with in-batch partial combine, one
    groupby — the same shuffle shape as the main aggregate families."""
    from ..functions.weights import weighting

    def explode(t: pa.Table) -> pa.Table:
        lk = Lookup()
        raw = t["row"].combine_chunks()
        n = len(t)
        rows = _rows_view(raw)
        fmt = t["format"].to_numpy(zero_copy_only=False)

        # object dtype: np.minimum/maximum have no unicode loop
        species_arr = np.array(lk.species + ["empty"], dtype=object)
        item_arr = np.array(lk.items + [""], dtype=object)
        move_arr = np.array(lk.moves + [""], dtype=object)
        team = rows[:, HEADER:].reshape(n, 2 * N_MONS, MON_SIZE)

        frames = []
        for j in range(2):
            off = 12 + 3 * j
            rpr = rows[:, off:off + 2].copy().view("<u2").reshape(n)
            rprd = rows[:, off + 2].astype(np.float64)
            has = rpr != 0xFFFF
            r = rpr.astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                w = weighting(r, rprd, cutoff)
            # rd == 0: erf((r-c)/0) -> sign (binary.ts keeps these)
            zero_rd = rprd == 0.0
            w = np.where(zero_rd & (r > cutoff), 1.0, w)
            w = np.where(zero_rd & (r < cutoff), 0.0, w)
            w = np.where(zero_rd & (r == cutoff), 0.5, w)
            w = np.where(has, w, 0.0)

            side = team[:, j * N_MONS:(j + 1) * N_MONS, :]
            sp = side[:, :, 0].copy()
            sp[sp == 0xFF] = len(lk.species)
            it = side[:, :, 1].copy()
            it[it == 0xFF] = len(lk.items)
            present = side[:, :, 0] != 0xFF

            b_ix, m_ix = np.nonzero(present)
            wv = w[b_ix]
            keep = wv > 0.0
            b_ix, m_ix, wv = b_ix[keep], m_ix[keep], wv[keep]
            sp_n = species_arr[sp[b_ix, m_ix]]
            frames.append(pd.DataFrame({
                "format": fmt[b_ix], "kind": "usage", "a": sp_n, "b": "",
                "weight": wv}))
            lead = m_ix == 0
            frames.append(pd.DataFrame({
                "format": fmt[b_ix][lead], "kind": "lead",
                "a": sp_n[lead], "b": "", "weight": wv[lead]}))
            frames.append(pd.DataFrame({
                "format": fmt[b_ix], "kind": "item", "a": sp_n,
                "b": item_arr[it[b_ix, m_ix]], "weight": wv}))
            for mv in range(4):
                mvix = side[:, :, 4 + mv].copy()
                mvix[mvix == 0xFF] = len(lk.moves)
                frames.append(pd.DataFrame({
                    "format": fmt[b_ix], "kind": "move", "a": sp_n,
                    "b": move_arr[mvix[b_ix, m_ix]], "weight": wv}))
            # species x species pairs within the team (j2 < j1)
            for hi in range(1, N_MONS):
                for lo in range(hi):
                    both = present[:, hi] & present[:, lo] & (w > 0.0)
                    if not both.any():
                        continue
                    s1 = species_arr[sp[both, hi]]
                    s2 = species_arr[sp[both, lo]]
                    frames.append(pd.DataFrame({
                        "format": fmt[both], "kind": "pair",
                        "a": np.minimum(s1, s2), "b": np.maximum(s1, s2),
                        "weight": w[both]}))
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby(["format", "kind", "a", "b"],
                         as_index=False, sort=False).sum()
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    from ..exchange import bucketed_agg
    part = db.map_batches(explode, batch_format="pyarrow", batch_size=4096)
    return bucketed_agg(part, ["format", "kind", "a", "b"],
                        {"weight": ("weight", "sum")})


def _ptile(sorted_vals: np.ndarray, p: float) -> float:
    """Linear-interpolated percentile over a SORTED array — the reference
    CLI's ptile (tools/stats:20-32): index=(n-1)*p, lerp between the two
    bracketing ranks."""
    n = len(sorted_vals)
    if n == 0:
        return 0.0
    if p <= 0:
        return float(sorted_vals[0])
    if p >= 1:
        return float(sorted_vals[-1])
    index = (n - 1) * p
    lower = int(np.floor(index))
    weight = index - lower
    if lower + 1 >= n:
        return float(sorted_vals[lower])
    return float(sorted_vals[lower] * (1 - weight)
                 + sorted_vals[lower + 1] * weight)


def _hist_ptile(vals: np.ndarray, counts: np.ndarray, p: float) -> float:
    """_ptile over a value histogram WITHOUT expanding it: the expanded
    sorted array's element at rank r is the first value whose cumulative
    count exceeds r."""
    n = int(counts.sum())
    if n == 0:
        return 0.0
    if p <= 0:
        return float(vals[0])
    if p >= 1:
        return float(vals[-1])
    cum = np.cumsum(counts)

    def at(rank: int) -> float:
        return float(vals[np.searchsorted(cum, rank, side="right")])

    index = (n - 1) * p
    lower = int(np.floor(index))
    weight = index - lower
    if lower + 1 >= n:
        return at(lower)
    return at(lower) * (1 - weight) + at(lower + 1) * weight


def db_rating_percentile(db: Dataset, percentile: float) -> pd.DataFrame:
    """tools/stats `cutoff` analogue (tools/stats:75-98) over the binary
    db: per-format linear-interpolated percentile of BOTH players' codec
    ratings (unrated sides skipped).

    Scale shape: codec ratings are discrete u16s, so each batch emits a
    (format, rpr) count partial; the exchange is vocabulary-sized
    (formats x distinct ratings) and the driver interpolates over the tiny
    histogram — the full rating list never materializes anywhere."""
    from ..exchange import bucketed_agg

    def partial(t: pa.Table) -> pa.Table:
        raw = t["row"].combine_chunks()
        n = len(t)
        rows = _rows_view(raw)
        fmt = t["format"].to_numpy(zero_copy_only=False)
        frames = []
        for j in range(2):
            off = 12 + 3 * j
            rpr = rows[:, off:off + 2].copy().view("<u2").reshape(n)
            has = rpr != 0xFFFF
            frames.append(pd.DataFrame({"format": fmt[has],
                                        "rpr": rpr[has].astype(np.int64),
                                        "n": 1}))
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby(["format", "rpr"], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    hist = bucketed_agg(db.map_batches(partial, batch_format="pyarrow"),
                        ["format", "rpr"], {"n": ("n", "sum")}).to_pandas()
    rows = []
    for fmt, g in hist.groupby("format", sort=True):
        g = g.sort_values("rpr")
        rows.append({
            "format": fmt,
            "n_ratings": int(g["n"].sum()),
            "percentile": _hist_ptile(g["rpr"].to_numpy(),
                                      g["n"].to_numpy(), percentile),
        })
    return pd.DataFrame(rows)


def db_sizes_table(stats: pd.DataFrame) -> pd.DataFrame:
    """tools/stats `sizes` analogue (tools/stats:100-135): per format, the
    0..100% percentile table of per-species counts of moves / items whose
    rounded usage share exceeds 1% (round(w / species_w * 1e4) > 100 —
    binary.ts round semantics). `stats` is binary_stats_tables output."""
    rows = []
    for fmt, g in stats.groupby("format", sort=True):
        usage = g[g["kind"] == "usage"].set_index("a")["weight"]
        counts = {}
        for which in ("move", "item"):
            sub = g[g["kind"] == which]
            denom = usage.reindex(sub["a"]).to_numpy()
            with np.errstate(divide="ignore", invalid="ignore"):
                # Math.round half-up (binary.ts round), not np.round's
                # half-to-even: a share landing exactly on x.5 must qualify
                # the same way the reference classifies it
                share = np.floor(sub["weight"].to_numpy() / denom * 1e4 + 0.5)
            qual = pd.Series(share > 100).groupby(
                sub["a"].to_numpy()).sum()
            counts[which] = np.sort(
                qual.reindex(usage.index, fill_value=0)
                .to_numpy().astype(np.int64))
        for i in range(101):
            rows.append({
                "format": fmt, "pct": i,
                "moves": _ptile(counts["move"], i / 100),
                "items": _ptile(counts["item"], i / 100),
            })
    out = pd.DataFrame(rows)
    out["pct"] = out["pct"].astype("int64")
    return out


def db_display_pokemon(stats: pd.DataFrame, n_moves: int = 20,
                       n_items: int = 5) -> dict:
    """tools/stats `display --report=pokemon` analogue (binary.ts:396-451):
    {format: {species: {usage, lead, moves{}, items{}}}} with species
    sorted by usage desc, percentages at the stats.db codec's u16/100
    resolution (2 decimals). `stats` is binary_stats_tables output."""
    def pct(x: float) -> float:
        return float(np.floor(x * 100 + 0.5) / 100)

    out: dict = {}
    for fmt, g in stats.groupby("format", sort=True):
        usage = g[g["kind"] == "usage"].set_index("a")["weight"]
        leads = g[g["kind"] == "lead"].set_index("a")["weight"]
        u_tot = float(usage.sum()) or 1.0
        l_tot = float(leads.sum()) or 1.0
        species = usage.sort_values(ascending=False).index
        fmt_out = {}
        for sp in species:
            entry = {
                "usage": pct(100 * float(usage[sp]) / u_tot),
                "lead": pct(100 * float(leads.get(sp, 0.0)) / l_tot),
                "moves": {}, "items": {},
            }
            w_sp = float(usage[sp]) or 1.0
            for which, top_n in (("move", n_moves), ("item", n_items)):
                sub = (g[(g["kind"] == which) & (g["a"] == sp)]
                       .sort_values(["weight", "b"], ascending=[False, True])
                       .head(top_n))
                entry[which + "s"] = {
                    b: pct(100 * float(w) / w_sp)
                    for b, w in zip(sub["b"], sub["weight"]) if b}
            fmt_out[sp] = entry
        out[fmt] = fmt_out
    return out


def species_counts_from_db(db_dir: str) -> Dataset:
    """A14 analogue: dense per-ordinal usage counts recomputed from the
    binary db (groupby over decoded rows)."""
    import ray.data

    ds = ray.data.read_parquet(db_dir)
    decoded = ds.map_batches(DecodeBinary, batch_format="pyarrow",
                             concurrency=(1, 8))

    def explode(t: pa.Table) -> pa.Table:
        frames = []
        fmt = t["format"].to_numpy(zero_copy_only=False)
        for j in range(2 * N_MONS):
            sp = t[f"mon{j}"].to_numpy(zero_copy_only=False)
            mask = sp != "empty"
            frames.append(pd.DataFrame({"format": fmt[mask], "species": sp[mask],
                                        "n": 1}))
        df = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(
            df.groupby(["format", "species"], as_index=False, sort=False).sum(),
            preserve_index=False).replace_schema_metadata(None)

    from ..exchange import bucketed_agg
    return bucketed_agg(
        decoded.map_batches(explode, batch_format="pyarrow"),
        ["format", "species"], {"n": ("n", "sum")})
