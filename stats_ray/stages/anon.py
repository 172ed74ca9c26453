"""Anonymization pipeline (M8-M10, SURVEY.md §3.2).

Replicates the semantics of the reference anonymizer
(`anon/src/index.ts:61-165` driver, `:165-412` per-command handling,
`:446-452` salted md5 hash, `:481-506` leak Verifier) over our protocol
vocabulary:

- players -> 'Player 1'/'Player 2' or md5(name+salt)[:10]
- nicknames -> base species display name or salted hash
- ratings simplified to {rpr, rprd}; timestamps/seed dropped
- chat/join/meta lines dropped, battle-mechanical lines kept with idents
  rewritten; inputLog filtered to '>pN ' choice lines
- Verifier: word-boundary regex union of all replaced names, applied to
  every emitted line

Runs as a stateless map_batches over the tokens table (decode -> anonymize
-> re-encode); the ordinal-rename pass (S8) assigns per-format ordinals.
"""

from __future__ import annotations

import hashlib
import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..gendex import get_dex, to_id
from ..tokens import canonical_json, decode_column, encode_strings
from .anon_protocol import DROP, KEEP, anonymize_line  # noqa: F401 (re-export)


def _hash(s: str, salt: str) -> str:
    return hashlib.md5(f"{s}{salt}".encode()).hexdigest()[:10]


class Verifier:
    """anon/src/index.ts:481-506.

    The regex is built lazily on the FIRST verify() call and then frozen —
    exactly like the reference (names added after the first verification do
    not extend the pattern)."""

    def __init__(self):
        self.names: set[str] = set()
        self.leaks: list[dict] = []
        self._regex = None

    def verify(self, inp: str, out: str) -> bool:
        if self._regex is None:
            parts = []
            for n in self.names:
                safe = re.escape(n)
                nid = to_id(n)
                parts.append(safe)
                if nid:
                    parts.append(nid)
            self._regex = re.compile(r"\b(" + "|".join(parts) + r")\b") \
                if parts else re.compile(r"(?!x)x")
        if self._regex.search(out):
            self.leaks.append({"input": inp, "output": out})
            return False
        return True

    def ok(self) -> bool:
        return not self.leaks


def anonymize_team(team: list[dict], *, salt: str | None = None,
                   prefix: str = "", pokemon_map: dict | None = None,
                   verifier: Verifier | None = None,
                   dex_name: str = "synth") -> list[dict]:
    """anon/src/index.ts:105-131 — nickname -> base-species display name
    (or salted md5 hash); registers `'<prefix><name>'` in pokemon_map."""
    dx = get_dex(dex_name)
    out = []
    for p in team or []:
        p = dict(p)
        name = p.get("name") or p.get("species") or ""
        if salt:
            anon_name = _hash(name, salt)
        else:
            sid = dx.species_id(p.get("species") or name)
            anon_name = (dx.SPECIES[dx.base_species(sid)]["name"]
                         if sid else (p.get("species") or name))
        p["name"] = anon_name
        if pokemon_map is not None:
            pokemon_map[f"{prefix}{name}"] = anon_name
        if anon_name != name and verifier:
            verifier.names.add(name)
        out.append(p)
    return out


def anonymize_doc(doc: dict, salt: str | None = None,
                  verifier: Verifier | None = None,
                  dex_name: str = "synth") -> dict:
    """Full Log -> AnonymizedLog (anon/src/index.ts:61-103), byte-parity
    with the reference's anon/salt goldens (tests/test_anon_parity.py)."""
    p1_raw, p2_raw = doc.get("p1", ""), doc.get("p2", "")
    p1 = _hash(p1_raw, salt) if salt else "Player 1"
    p2 = _hash(p2_raw, salt) if salt else "Player 2"
    winner_raw = doc.get("winner", "")
    winner = p1 if winner_raw == p1_raw else p2 if winner_raw == p2_raw else ""

    player_map = {to_id(p1_raw): p1, to_id(p2_raw): p2}
    if verifier:
        verifier.names.add(p1_raw)
        verifier.names.add(p2_raw)

    def simplify_rating(r):
        return {"rpr": r["rpr"], "rprd": r["rprd"]} if r else None

    pokemon_map: dict[str, str] = {}
    p1team = anonymize_team(doc.get("p1team"), salt=salt, prefix="p1: ",
                            pokemon_map=pokemon_map, verifier=verifier,
                            dex_name=dex_name)
    p2team = anonymize_team(doc.get("p2team"), salt=salt, prefix="p2: ",
                            pokemon_map=pokemon_map, verifier=verifier,
                            dex_name=dex_name)

    log = []
    for line in doc.get("log") or []:
        anon = anonymize_line(line, player_map, pokemon_map, verifier)
        if anon is not None:
            if verifier:
                verifier.verify(line, anon)
            log.append(anon)

    input_log = []
    for line in doc.get("inputLog") or []:
        if re.match(r"^>p\d ", line):
            if verifier:
                verifier.verify(line, line)
            input_log.append(line)

    out = {
        "format": doc.get("format"),
        "turns": doc.get("turns"),
        "score": doc.get("score"),
        "p1rating": simplify_rating(doc.get("p1rating")),
        "p2rating": simplify_rating(doc.get("p2rating")),
        "p1": p1, "p2": p2, "winner": winner,
        "p1team": p1team, "p2team": p2team,
        "log": log, "inputLog": input_log,
    }
    if "endType" in doc:
        out["endType"] = doc["endType"]
    return out


def sample_mask(doc_ids: list[str], rate: float, salt: str = "anon") -> list[bool]:
    """F2: deterministic hash-based Bernoulli sample (reproducible, unlike
    the reference's PRNG-order-dependent sampling, anon.ts:82-92).
    Vectorized: one keyed-siphash pass over the salted ids (the same
    process-stable hash family the exchange partitions by), replacing the
    former per-doc Python md5 loop.

    Version note: the hash family changed from md5 (pre-r5) to pandas'
    fixed-key SipHash — a given (salt, rate) selects a DIFFERENT subset
    than pre-r5 builds. Determinism holds across runs/processes of the
    same build (pandas pins the siphash key); subsets published by older
    builds cannot be extended with this function."""
    import numpy as np
    import pandas as pd

    arr = pd.util.hash_array(
        np.asarray([f"{salt}:{d}" for d in doc_ids], dtype=object))
    return ((arr % 10_000) < rate * 10_000).tolist()


class AnonymizeBattles:
    """Actor-pool stage: tokens table -> anonymized tokens table.

    Output columns: doc_id, format, source, tokens (re-encoded anonymized
    doc), n_tok, leaks (verifier hit count)."""

    def __init__(self, salt: str | None = None, rate: float = 1.0,
                 verify: bool = True, public_only: bool = False):
        self.salt = salt
        self.rate = rate
        self.verify = verify
        self.public_only = public_only  # F3: skip roomid *pw (anon.ts:95)

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        if self.rate < 1.0:
            mask = sample_mask(doc_ids, self.rate)
            t = t.filter(pa.array(mask))
        docs = decode_column(t["tokens"])
        keep, out_docs, leaks = [], [], []
        for i, s in enumerate(docs):
            doc = json.loads(s)
            if self.public_only and str(doc.get("roomid", "")).endswith("pw"):
                continue
            keep.append(i)
            verifier = Verifier() if self.verify else None
            anon = anonymize_doc(doc, self.salt, verifier)
            out_docs.append(canonical_json(anon))
            leaks.append(len(verifier.leaks) if verifier else 0)
        if len(keep) != len(t):
            t = t.take(keep)
        toks = encode_strings(out_docs)
        return pa.table({
            "doc_id": t["doc_id"], "format": pa.array(
                [s.split("/", 1)[0] for s in t["source"].to_pylist()]),
            "source": t["source"], "tokens": toks,
            "n_tok": pa.array([len(d.encode()) for d in out_docs], pa.int32()),
            "leaks": pa.array(leaks, pa.int32()),
        })


def anonymize_pipeline(corpus_dir: str, *, salt: str | None = None,
                       rate: float = 1.0, concurrency=(1, 8)) -> Dataset:
    import ray.data
    ds = ray.data.read_parquet(f"{corpus_dir}/battles")
    return ds.map_batches(
        AnonymizeBattles,
        fn_constructor_kwargs={"salt": salt, "rate": rate},
        batch_format="pyarrow", batch_size=256, concurrency=concurrency)


def ordinal_rename(anon: Dataset) -> Dataset:
    """S8: rename doc_id to 'battle-<format>-<ordinal>' per format partition
    (ordinal = rank of the original doc_id within the format — deterministic).
    Simple variant: one group per format. Fine at test scale; use
    ordinal_rename_scaled for hot formats (gen9ou-sized groups)."""

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id").reset_index(drop=True)
        fmt = df["format"].iloc[0]
        df["doc_id"] = [f"battle-{fmt}-{i + 1}" for i in range(len(df))]
        return df

    return anon.groupby("format").map_groups(rename, batch_format="pandas")


def ordinal_rename_scaled(anon: Dataset, n_ranges: int = 32,
                          sample_per_block: int = 50) -> Dataset:
    """Scale path for S8: range-partitioned rank assignment.

    A hot format (gen9ou-sized) would make the one-group-per-format rename a
    single-task hotspot. Instead:

    1. sample doc_ids -> global lexicographic cut points (driver-side, tiny);
    2. pass 1: count rows per (format, range) — a small aggregate;
    3. prefix-sum the counts into per-(format, range) offsets (broadcast);
    4. pass 2: groupby (format, range) — bounded groups — sort locally and
       assign offset + local rank.

    Produces exactly the same ordinals as ordinal_rename (doc_id rank within
    format) with no group larger than ~|format| / n_ranges."""
    import ray
    from ray.data.aggregate import Count

    ids = anon.map_batches(
        lambda df: df[["doc_id"]].head(sample_per_block),
        batch_format="pandas").to_pandas()["doc_id"]
    cuts = sorted(ids.quantile([i / n_ranges for i in range(1, n_ranges)],
                               interpolation="nearest").unique().tolist()) \
        if len(ids) else []
    cuts_ref = ray.put(cuts)

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cuts_ref)
        df["rng_"] = np.searchsorted(c, df["doc_id"].to_numpy(),
                                     side="right").astype(np.int32) \
            if c else np.int32(0)
        return df

    ranged = anon.map_batches(add_range, batch_format="pandas")
    counts = (ranged.groupby(["format", "rng_"])
              .aggregate(Count(alias_name="n")).to_pandas()
              .sort_values(["format", "rng_"]))
    counts["offset"] = counts.groupby("format")["n"].cumsum() - counts["n"]
    offsets = {(r.format, int(r.rng_)): int(r.offset)
               for r in counts.itertuples()}
    off_ref = ray.put(offsets)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[(df["format"].iloc[0], int(df["rng_"].iloc[0]))]
        df = df.sort_values("doc_id").reset_index(drop=True)
        fmt = df["format"].iloc[0]
        df["doc_id"] = [f"battle-{fmt}-{off + i + 1}" for i in range(len(df))]
        return df.drop(columns="rng_")

    return ranged.groupby(["format", "rng_"]).map_groups(
        rename, batch_format="pandas")
