"""Benchmark decontamination + repetition-quality filters over `documents`.

Two staples of a large-scale training-data pipeline that the dedup/quality
families don't cover yet:

- `decontaminate`: flag corpus documents that share any word n-gram with a
  benchmark/eval set (the standard "n-gram overlap" decontamination used by
  public LLM data pipelines). The benchmark side is by definition tiny
  relative to the corpus (MBs of eval sets vs TBs of corpus), so its
  distinct n-grams are collected once and BROADCAST via `ray.put`; the
  corpus side streams through a stateful actor pool that reads the set once
  per worker. No shuffle of the corpus at all — one map. For benchmark sets
  too large for an exact broadcast set, `ops/dedup.bloom_build` is the
  drop-in prefilter (zero false negatives: a clean doc is never flagged by
  the exact verify that follows the filter).

  With no external data allowed, the "benchmark" is a deterministic slice
  of the documents table itself (doc_id % 37 == 0), which the SQL oracle
  reproduces exactly.

- `repetition_stats`: Gopher-style per-document repetition/quality signals
  (Rae et al. 2021, public): top-word fraction, duplicate-3-gram fraction,
  and unigram entropy. Embarrassingly parallel — one map, no shuffle;
  per-doc Counters inside a batch (same shape as `ops/text.lang_id`).

Tokenization contract (shared with the SQL oracles): lowercase, split on
ASCII whitespace runs, drop empties — `_words()` splits on the RE2 \\s class
`[ \\t\\n\\r\\f]+` (Perl semantics: no \\v, no Unicode) so it matches DuckDB
`list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')`
byte-for-byte even on non-ASCII-whitespace text (Python str.split() would
also split on \\xa0/\\u2028/\\v etc., which RE2 \\s does not).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
from ray.data import Dataset

from .text import read_documents

BENCH_MOD = 37  # doc_id % 37 == 0 -> the stand-in "benchmark" slice


_ASCII_WS = re.compile(r"[ \t\n\r\f]+")


def _words(text: str) -> list[str]:
    """The engine/oracle tokenization contract (see module docstring)."""
    return [w for w in _ASCII_WS.split(text.lower()) if w]


def _grams(words: list[str], n: int) -> list[str]:
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


def benchmark_ngrams(sf_dir: str, n: int = 4) -> frozenset[str]:
    """Distinct word n-grams of the benchmark slice. Each batch emits its
    in-batch-deduped grams; the driver unions them. The collected object is
    the broadcast SMALL side (eval sets are MBs), not the corpus."""
    docs = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda df: df[df["doc_id"] % BENCH_MOD == 0], batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        seen: set[str] = set()
        for t in df["text"]:
            seen.update(_grams(_words(t), n))
        return pd.DataFrame({"gram": sorted(seen)})

    out: set[str] = set()
    for b in docs.map_batches(partial, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        out.update(b["gram"])
    return frozenset(out)


def decontaminate(sf_dir: str, n: int = 4) -> Dataset:
    """Per non-benchmark document: how many DISTINCT benchmark n-grams it
    contains (`n_hits`) and a 0/1 `contaminated` flag. A real pipeline
    filters on the flag; we emit it so the oracle can check the whole
    decision, not just the survivor count."""
    import ray

    grams_ref = ray.put(benchmark_ngrams(sf_dir, n))
    corpus = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda df: df[df["doc_id"] % BENCH_MOD != 0], batch_format="pandas")

    class Flag:
        def __init__(self):
            self.bench = ray.get(grams_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hits = [len(set(_grams(_words(t), n)) & self.bench)
                    for t in df["text"]]
            hits = np.asarray(hits, dtype=np.int64)
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_hits": hits,
                "contaminated": (hits > 0).astype("int64"),
            })

    return corpus.map_batches(Flag, batch_format="pandas",
                              concurrency=(1, 4))


def _r4(x: float) -> float:
    """Round half-away-from-zero to 4 dp — DuckDB ROUND semantics (Python
    round() is banker's and diverges on exact .5 midpoints, e.g. 1/32)."""
    return float(np.sign(x) * np.floor(abs(x) * 1e4 + 0.5) / 1e4)


def repetition_stats(sf_dir: str) -> Dataset:
    """Per-doc repetition/quality signals (rounded to 4 dp, half-away like
    the SQL ROUND, to keep the FP-order-independent value hash stable).

    Docs that tokenize to zero words are SKIPPED — the SQL oracle's inner
    joins on the word-level CTEs drop them too, so emitting a zero row
    would silently diverge on whitespace-only text."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "n_tokens": [], "top_word": [],
                "top_word_frac": [], "dup_3gram_frac": [], "word_entropy": []}
        for did, t in zip(df["doc_id"], df["text"]):
            words = _words(t)
            nt = len(words)
            if not nt:
                continue
            wc = Counter(words)
            top_n = max(wc.values())
            # deterministic tie-break: lexicographically smallest argmax
            top_w = min(w for w, c in wc.items() if c == top_n)
            p = np.array(list(wc.values()), dtype=np.float64) / nt
            ent = float(-(p * np.log(p)).sum())
            g = _grams(words, 3)
            dup = 1.0 - len(set(g)) / len(g) if g else 0.0
            rows["doc_id"].append(did)
            rows["n_tokens"].append(nt)
            rows["top_word"].append(top_w)
            rows["top_word_frac"].append(_r4(top_n / nt))
            rows["dup_3gram_frac"].append(_r4(dup))
            rows["word_entropy"].append(_r4(ent))
        out = pd.DataFrame(rows)
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas")


def clean_corpus(sf_dir: str, n: int = 4, min_tokens: int = 20,
                 min_ttr: float = 0.35,
                 with_counts: bool = False) -> "Dataset":
    """Composed training-data cleaning pipeline with full accounting: every
    document gets a `status` — the FIRST gate it failed, in pipeline order
    (bench / too_short / low_diversity / contaminated / duplicate), or
    'kept'. Filter-with-audit rather than silent filtering: dropped-count
    by reason is exactly what a 100-TB curation run needs to report, and it
    makes the whole composition one oracle-checkable relation.

    Scale shape: ONE broadcast-side build (benchmark n-grams via ray.put,
    same small side decontaminate() uses), ONE stateless map_batches pass
    computing tokens/ttr/contamination/text-hash per doc, then ONE
    hash-keyed exchange for exact-dup marking — rows that already failed a
    gate ride through it as salted singleton groups, so there is no branch,
    no union, no mid-pipeline materialization."""
    import hashlib

    import ray

    grams_ref = ray.put(benchmark_ngrams(sf_dir, n))

    class Gate:
        def __init__(self):
            self.bench = ray.get(grams_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            status, hkey, ntok = [], [], []
            for doc_id, text in zip(df["doc_id"], df["text"]):
                toks = _words(text)
                ntok.append(len(toks))
                if doc_id % BENCH_MOD == 0:
                    st = "bench"
                elif len(toks) < min_tokens:
                    st = "too_short"
                elif len(set(toks)) / max(len(toks), 1) < min_ttr:
                    st = "low_diversity"
                elif any(g in self.bench for g in _grams(toks, n)):
                    st = "contaminated"
                else:
                    st = "kept"
                status.append(st)
                # kept docs group by content hash; failed docs ride the same
                # exchange as salted singletons (no branch/union needed)
                hkey.append(hashlib.md5(text.encode()).hexdigest()
                            if st == "kept" else f"x{doc_id}")
            out = {"doc_id": df["doc_id"].astype("int64"),
                   "status": status, "h": hkey}
            if with_counts:
                out["n_tokens"] = pd.Series(ntok, dtype="int64")
            return pd.DataFrame(out)

    def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
        # every content-hash group in the bucket in one scan: the first
        # kept doc (min doc_id) of a hash stays, the rest become duplicates
        # (failed docs ride salted singleton keys, so they never group)
        df = df.sort_values(["h", "doc_id"]).reset_index(drop=True)
        h = df["h"].to_numpy()
        st = df["status"].to_numpy(copy=True)
        if len(df):
            first = np.empty(len(h), dtype=bool)
            first[0] = True
            first[1:] = h[1:] != h[:-1]
            grp = np.cumsum(first) - 1
            first_kept = (st[first] == "kept")[grp]
            st[(~first) & first_kept] = "duplicate"
        cols = {"doc_id": df["doc_id"], "status": st}
        if with_counts:
            cols["n_tokens"] = df["n_tokens"]
        return pd.DataFrame(cols)

    from ..exchange import bucketed_group_map
    gated = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        Gate, batch_format="pandas", concurrency=(1, 4))
    return bucketed_group_map(gated, ["h"], mark_dups)


# linear quality-ensemble weights (documented, arbitrary-but-sensible:
# reward lexical diversity / entropy / sane length, penalize stopword
# saturation and repetition — the fastText-style handcrafted-feature
# scorer shape every curation pipeline runs before a learned filter)
ENSEMBLE_WEIGHTS = {"ttr": 2.0, "stop_ratio": -1.0, "ok_length": 0.5,
                    "top_word_frac": -1.0, "dup_3gram_frac": -1.0,
                    "word_entropy": 0.2}


def quality_ensemble(sf_dir: str) -> Dataset:
    """Per-doc linear quality score over BOTH feature families in ONE
    streaming pass (no join of the component ops): the \\S+-token quality
    features (ttr / stop_ratio / ok_length, 6 dp) and the lowercase-word
    repetition features (top_word_frac / dup_3gram_frac / word_entropy,
    4 dp), combined left-to-right with the fixed ENSEMBLE_WEIGHTS and
    rounded half-away to 4 dp. Docs whose lowercase tokenization is empty
    are skipped (inner-join semantics, matching the repetition oracle).

    Embarrassingly parallel — the only state is the stopword set."""
    from .text import STOPWORDS

    from .text import RE2_WS
    ws_pat = re.compile(rf"[^{RE2_WS}]+")

    def _rp(x: float, p: int = 4) -> float:
        f = 10.0 ** p
        return float(np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "quality_score": []}
        for did, t in zip(df["doc_id"], df["text"]):
            words = _words(t)
            nt = len(words)
            if not nt:
                continue
            toks = ws_pat.findall(t)
            n = max(len(toks), 1)
            ttr = _rp(len(set(toks)) / n, 6)
            stop = _rp(sum(1 for w in toks if w in STOPWORDS) / n, 6)
            ok = 1 if 10 <= len(toks) <= 1000 else 0
            wc = Counter(words)
            twf = _rp(max(wc.values()) / nt)
            p = np.array(list(wc.values()), dtype=np.float64) / nt
            ent = _rp(float(-(p * np.log(p)).sum()))
            g = _grams(words, 3)
            dup = _rp(1.0 - len(set(g)) / len(g) if g else 0.0)
            # same left-to-right expression as the SQL oracle so the
            # combination of identically-rounded features is bitwise equal
            s = (2 * ttr - stop + 0.5 * ok - twf - dup + 0.2 * ent)
            rows["doc_id"].append(int(did))
            rows["quality_score"].append(_rp(s))
        out = pd.DataFrame(rows)
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")
