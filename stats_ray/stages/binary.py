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
            vals = np.array([ix[v] for v in col.to_pylist()], dtype=np.uint8)
            rows[parent, base + field_off] = vals

        put(0, flat.field("species"), lk.species_ix)
        put(1, flat.field("item"), lk.item_ix)
        put(2, flat.field("ability"), lk.ability_ix)
        put(3, flat.field("nature"), lk.nature_ix)
        for m in range(4):
            put(4 + m, flat.field(f"move{m + 1}"), lk.move_ix)

        return pa.table({
            "format": t["format"], "ts_ms": t["ts_ms"],
            "row": pa.array(list(rows.tobytes()[i * ROW_SIZE:(i + 1) * ROW_SIZE]
                                 for i in range(n)), type=pa.binary()),
        })


class DecodeBinary:
    """(row:binary) -> struct columns (inverse of EncodeBinary)."""

    def __init__(self):
        self.lookup = Lookup()

    def __call__(self, t: pa.Table) -> pa.Table:
        lk = self.lookup
        raw = t["row"].combine_chunks()
        buf = b"".join(raw.to_pylist())
        n = len(t)
        rows = np.frombuffer(buf, dtype=np.uint8).reshape(n, ROW_SIZE)

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
            preserve_index=False)

    from ray.data.aggregate import Sum
    return (decoded.map_batches(explode, batch_format="pyarrow")
            .groupby(["format", "species"]).aggregate(Sum("n", alias_name="n")))
