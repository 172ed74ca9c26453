"""Text analysis operators over the `documents` table (SURVEY extension set:
language-ID, quality scoring, token counting, fingerprinting).

All batch fns are vectorized pandas/numpy; stateful pieces (compiled regex,
stop lists, n-gram profiles) live in actor classes loaded once per worker.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data
from ray.data import Dataset

from ..exchange import bucketed_agg, bucketed_group_map

# DuckDB/RE2's \s is the ASCII class [ \t\n\r\f] (Perl semantics, no \v and
# no Unicode), while Python re's \s is Unicode-aware (U+00A0, U+2028, ...).
# Every kernel that an RE2 oracle mirrors spells the class out so both
# engines tokenize identically on any input, not just ASCII corpora.
RE2_WS = r" \t\n\r\f"
_WS = re.compile(rf"[^{RE2_WS}]+")
STOPWORDS = frozenset({"the", "a", "an", "and", "of", "to", "in", "is", "it"})


def read_documents(sf_dir: str, columns=None) -> Dataset:
    from .io import read_table
    return read_table(sf_dir, "documents", columns=columns)


class TokenStats:
    """n_tokens / n_chars / stopword ratio / mean word length per doc.

    SQL-mirrorable definitions: tokens = RE2-\\S+ matches; nonspace = chars
    left after stripping all RE2 whitespace (explicit ASCII class — see
    RE2_WS)."""

    def __init__(self):
        self.ws = re.compile(rf"[^{RE2_WS}]+")
        self.space = re.compile(rf"[{RE2_WS}]")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(self.ws)
        n_tok = toks.str.len().astype("int64")
        nonspace = df["text"].str.replace(self.space, "", regex=True).str.len()
        stop = toks.map(lambda ws: sum(1 for w in ws if w in STOPWORDS))
        out = pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": n_tok,
            "n_chars": df["text"].str.len().astype("int64"),
            "n_stopwords": pd.Series(stop).astype("int64"),
            "mean_word_len": np.where(n_tok > 0, nonspace / n_tok.clip(lower=1), 0.0),
        })
        return out


def token_stats(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        TokenStats, batch_format="pandas", concurrency=(1, 4))


# GPT-2-style BPE pretokenizer pattern (public), adapted to ASCII classes
# and RE2 compatibility (no lookahead) so Python re and DuckDB produce the
# IDENTICAL token stream: contractions | space-prefixed letter runs |
# space-prefixed digit runs | space-prefixed punct runs | whitespace runs.
# Whitespace is the explicit RE2 \s class (see RE2_WS): with a bare Python
# \s, any non-ASCII whitespace (U+00A0, U+2028, ...) would tokenize
# differently here than in the DuckDB oracle.
BPE_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    rf"| ?[A-Za-z]+| ?[0-9]+| ?[^{RE2_WS}A-Za-z0-9']+|[{RE2_WS}]+")


class BpeTokenStats:
    r"""Token counting under a BPE-ish pretokenizer (the contract LLM data
    pipelines actually budget by, vs the \S+ whitespace count in
    TokenStats): per doc, the pretoken count and mean pretoken length.
    Compiled once per actor; vectorized findall per batch."""

    def __init__(self):
        self.pat = re.compile(BPE_SPLIT_PATTERN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(self.pat)
        n = toks.str.len().astype("int64")
        chars = toks.map(lambda ts: sum(len(t) for t in ts)).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_bpe_tokens": n,
            "token_chars": chars,
            "mean_tok_len": np.where(
                n > 0, chars / n.clip(lower=1), 0.0),
        })


def bpe_token_stats(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        BpeTokenStats, batch_format="pandas", concurrency=(1, 4))


class QualityScore:
    """Heuristic quality score: length band + stopword presence + lexical
    diversity (type/token ratio). Deterministic, SQL-mirrorable pieces kept
    in separate columns so the oracle can verify each term."""

    def __init__(self):
        self.ws = re.compile(rf"[^{RE2_WS}]+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.findall(self.ws)
        n = toks.str.len().clip(lower=1)
        uniq = toks.map(lambda ws: len(set(ws)))
        stop_ratio = toks.map(
            lambda ws: sum(1 for w in ws if w in STOPWORDS)) / n
        ttr = uniq / n
        ok_len = ((n >= 10) & (n <= 1000)).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "ttr": ttr.astype(float).round(6),
            "stop_ratio": stop_ratio.astype(float).round(6),
            "ok_length": ok_len,
        })


def quality_scores(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScore, batch_format="pandas", concurrency=(1, 4))


class LangId:
    """Character-trigram cosine language-ID heuristic (no model deps).

    Profiles are built once per actor from tiny seed texts; output is the
    argmax profile label. Heuristic -> rows-only check (no SQL oracle)."""

    SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and then some more "
              "words of english text for the profile",
        "es": "el rapido zorro marron salta sobre el perro perezoso y luego "
              "algunas palabras mas de texto en espanol",
        "de": "der schnelle braune fuchs springt ueber den faulen hund und "
              "dann noch einige woerter deutscher text",
    }

    def __init__(self):
        self.profiles = {}
        for lang, seed in self.SEEDS.items():
            self.profiles[lang] = self._profile(seed)

    @staticmethod
    def _profile(text: str) -> dict[str, float]:
        text = f"  {text.lower()}  "
        grams: dict[str, float] = {}
        for i in range(len(text) - 2):
            g = text[i:i + 3]
            grams[g] = grams.get(g, 0.0) + 1.0
        norm = sum(v * v for v in grams.values()) ** 0.5
        return {g: v / norm for g, v in grams.items()}

    def _score(self, text: str) -> str:
        p = self._profile(text[:1000])
        best, best_s = "und", 0.0
        for lang, prof in self.profiles.items():
            s = sum(v * prof.get(g, 0.0) for g, v in p.items())
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "lang_pred": df["text"].map(self._score),
        })


def lang_id(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", concurrency=(1, 4))


class Fingerprint:
    """Document fingerprints: md5 content hash (exact, SQL-mirrorable) and a
    winnowed rolling-hash sketch (min of k-gram Rabin hashes — rows-only)."""

    K = 5
    _SHIFTS = np.arange(8 * 4, -1, -8, dtype=np.uint64)  # pack 5 bytes -> 40 bits

    def _winnow(self, text: str) -> int:
        """Min over all K-byte windows of a mixed window hash. The window is
        packed EXACTLY into 40 bits (collision-free) with one vectorized
        shift+sum, then avalanched with the public-domain splitmix64
        finalizer — no per-char Python loop (the first version's Rabin
        rolling hash was the one remaining per-char kernel in this module)."""
        data = np.frombuffer(text.encode(), dtype=np.uint8)
        if len(data) < self.K:
            return 0
        w = np.lib.stride_tricks.sliding_window_view(data, self.K)
        packed = (w.astype(np.uint64) << self._SHIFTS).sum(
            axis=1, dtype=np.uint64)
        z = packed + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return int(z.min())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "md5": df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()),
            "winnow_min": df["text"].map(self._winnow).astype("uint64"),
        })


def fingerprints(sf_dir: str) -> Dataset:
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprint, batch_format="pandas", concurrency=(1, 4))


class VocabCount:
    """Per-batch token counting for vocabulary building: lowercase, split on
    non-alphanumeric runs, count with np.unique — one partial (token, cnt)
    frame per batch, so the downstream groupby-sum shuffles vocabulary-sized
    partials instead of raw token streams."""

    def __init__(self):
        self.split = re.compile(r"[^a-z0-9]+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in df["text"]:
            toks.extend(w for w in self.split.split(t.lower()) if w)
        if not toks:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype="int64")})
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        return pd.DataFrame({"token": uniq, "cnt": counts.astype("int64")})


def vocab_topk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Top-k vocabulary by frequency (corpus token histogram): in-batch
    partial counts -> groupby-sum over the (vocab-sized) partials -> global
    top-k with a deterministic (cnt desc, token asc) tiebreak. The sort runs
    over distinct tokens only — shuffle volume is vocabulary-, not
    corpus-sized."""
    def sum_topk(df: pd.DataFrame) -> pd.DataFrame:
        # finish the token counts for this bucket and emit only its local
        # top-k: the global winner is in some bucket's local top-k, so the
        # driver-side merge sees nbuckets*k rows, never the whole vocab
        g = df.groupby("token", as_index=False).agg(cnt=("cnt", "sum"))
        return (g.sort_values(["cnt", "token"], ascending=[False, True])
                .head(k))

    counts = bucketed_group_map(
        read_documents(sf_dir, ["text"])
        .map_batches(VocabCount, batch_format="pandas", concurrency=(1, 4)),
        ["token"], sum_topk)
    top = (counts.to_pandas()
           .sort_values(["cnt", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    top["cnt"] = top["cnt"].astype("int64")
    return top[["token", "cnt"]]


def sample_deterministic(sf_dir: str, hex_lt: str = "28") -> Dataset:
    """Deterministic content-addressed sampling: keep a doc iff the first
    byte of md5(doc_id) falls under the threshold (hex '28' = 40/256 ≈ 15.6%).
    Reproducible across engines and runs with no seed state, stable under
    repartitioning — the standard trick for carving held-out slices out of
    a 100-TB corpus without a shuffle or a persisted sample list."""
    import pyarrow as pa

    def pick(df: pd.DataFrame):
        bucket = df["doc_id"].map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest()[:2])
        mask = bucket < hex_lt
        # typed Arrow output so empty batches keep a concrete schema
        return pa.table({
            "doc_id": pa.array(df.loc[mask, "doc_id"].astype("int64")),
            "lang": pa.array(df.loc[mask, "lang"], type=pa.string()),
            "bucket": pa.array(bucket[mask], type=pa.string()),
        })

    return read_documents(sf_dir, ["doc_id", "lang"]).map_batches(
        pick, batch_format="pandas")


def tfidf(sf_dir: str) -> pd.DataFrame:
    """TF-IDF term weights per document: tf exact per doc (a doc is one
    row, so term frequency needs no cross-batch combine), document
    frequency from a vocabulary-sized groupby over distinct (doc, token)
    rows, and idf broadcast back as a small lookup (`ray.put` once, read
    per actor) — no second shuffle of the corpus-sized side.

    Emits (doc_id, token, tf, tfidf = tf * ln(N / df))."""
    import ray

    split = re.compile(r"[^a-z0-9]+")

    def term_freq(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for i, t in zip(df["doc_id"], df["text"]):
            for w in split.split(t.lower()):
                if w:
                    ids.append(i)
                    toks.append(w)
        out = pd.DataFrame({"doc_id": np.asarray(ids, dtype="int64"),
                            "token": toks})
        return (out.groupby(["doc_id", "token"], as_index=False)
                .agg(tf=("token", "size")))

    docs = read_documents(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()
    tf = docs.map_batches(term_freq, batch_format="pandas").materialize()

    # document frequency: (doc, token) rows are already distinct per doc
    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("token", as_index=False)
                .agg(dfreq=("doc_id", "size")))

    dfreq = bucketed_agg(
        tf.map_batches(df_partial, batch_format="pandas"),
        ["token"], {"dfreq": ("dfreq", "sum")}).to_pandas()  # vocab-sized
    idf = dict(zip(dfreq["token"],
                   np.log(float(n_docs) / dfreq["dfreq"].to_numpy())))
    idf_ref = ray.put(idf)

    class Score:
        def __init__(self):
            self.idf = ray.get(idf_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            w = df["tf"].to_numpy() * df["token"].map(self.idf).to_numpy()
            f = 1e4
            df = df.copy()
            df["tf"] = df["tf"].astype("int64")
            df["tfidf"] = np.sign(w) * np.floor(np.abs(w) * f + 0.5) / f
            return df

    return (tf.map_batches(Score, batch_format="pandas", concurrency=(1, 4))
            .to_pandas())


def pack_sequences(sf_dir: str, capacity: int = 512,
                   bucket_size: int = 64,
                   docs: Dataset | None = None,
                   counts_in: Dataset | None = None) -> Dataset:
    """Sequence packing for training: assign each document (in doc_id order)
    to the fixed-`capacity`-token sequence its running token offset lands
    in — block packing, the deterministic scheme sequence loaders use.
    Emits (doc_id, n_tokens, prefix_tokens, seq_id). Pass `docs` to pack a
    filtered (doc_id, text, ...) subset (e.g. clean_and_pack's survivors);
    packing order is still global doc_id order.

    Scale shape — a distributed EXCLUSIVE PREFIX SUM, the primitive ordered
    packing needs and Ray Data lacks natively, done in two phases with no
    global sort: docs are co-located into contiguous doc_id ranges by a
    computed bucket key (dense ids -> doc_id // bucket_size, so the
    'exchange' is a hash groupby, not a range shuffle); per-bucket token
    totals (ONE tiny row per bucket) come back to the driver for the
    exclusive scan across buckets; the per-bucket offsets are broadcast back
    and each bucket finishes its local cumsum independently. Driver memory
    is O(n_buckets), never O(docs). Pass `counts_in` (doc_id, n_tokens)
    to skip the tokenize-count map when an upstream stage already counted
    the tokens (clean_and_pack's gate does)."""
    import ray

    if counts_in is not None:
        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": df["n_tokens"].astype("int64"),
                "bucket": (df["doc_id"] // bucket_size).astype("int64"),
            })

        cnt = counts_in.map_batches(add_bucket, batch_format="pandas")
        return _pack_from_counts(cnt, capacity)

    ds = docs if docs is not None \
        else read_documents(sf_dir, ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        # ASCII-whitespace token count (runs of non-[ \t\n\r\f]) -- matches
        # the RE2 \s+ the SQL oracle splits on (RE2 \s excludes \v); Python
        # str.split() would also split on \v and unicode whitespace (\xa0, ...)
        n = (df["text"].str.count(rf"[^{RE2_WS}]+")
             .fillna(0).astype("int64"))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": n,
            "bucket": (df["doc_id"] // bucket_size).astype("int64"),
        })

    cnt = ds.map_batches(counts, batch_format="pandas")
    return _pack_from_counts(cnt, capacity)


def _pack_from_counts(cnt: Dataset, capacity: int) -> Dataset:
    """Both pack phases over a (doc_id, n_tokens, bucket) dataset."""
    import ray

    # phase 1: one tiny row per bucket -> exclusive scan on the driver
    totals = bucketed_agg(
        cnt.map_batches(lambda df: df[["bucket", "n_tokens"]],
                        batch_format="pandas"),
        ["bucket"], {"tot": ("n_tokens", "sum")}).to_pandas()
    if totals.empty:  # empty corpus: no buckets, no offsets
        offsets: dict[int, int] = {}
    else:
        totals = totals.sort_values("bucket").reset_index(drop=True)
        totals["offset"] = totals["tot"].cumsum().shift(fill_value=0)
        offsets = dict(zip(totals["bucket"].astype(int),
                           totals["offset"].astype(int)))
    off_ref = ray.put(offsets)

    # phase 2: every pack-bucket lands complete in some exchange bucket;
    # the local cumsum is ONE vectorized grouped scan per exchange bucket
    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(["bucket", "doc_id"])
        base = df["bucket"].map(off).astype("int64")
        local = (df.groupby("bucket", sort=False)["n_tokens"].cumsum()
                 - df["n_tokens"])
        prefix = (local + base).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["n_tokens"],
            "prefix_tokens": prefix,
            "seq_id": (prefix // capacity).astype("int64"),
        })

    return bucketed_group_map(cnt, ["bucket"], assign)


def clean_and_pack(sf_dir: str, capacity: int = 512,
                   bucket_size: int = 64) -> Dataset:
    """Composed curation flagship: clean_corpus gates (bench / too-short /
    low-diversity / contaminated / exact-dup) -> distributed prefix-sum
    packing of the SURVIVORS into fixed-capacity sequences. One lazy flow:
    the gate pass, one md5 exchange (dup marking), one bucket exchange
    (pack); nothing corpus-sized touches the driver.

    The gate pass already tokenizes every doc, so its token counts ride
    the status rows (with_counts) straight into the packer — no second
    read of the documents and no doc_id join."""
    from .decontam import clean_corpus

    kept = (clean_corpus(sf_dir, with_counts=True)
            .filter(expr="status == 'kept'"))
    return pack_sequences(sf_dir, capacity, bucket_size, counts_in=kept)


def chunk_documents(sf_dir: str, size: int = 512,
                    stride: int = 384) -> Dataset:
    """Fixed-size character chunking with overlap (size - stride chars):
    the training-data prep step before tokenization/packing. One row per
    (doc_id, chunk_idx) with the chunk's char count and md5 — content-
    addressed so chunk-level dedup can run downstream. Docs with empty
    text produce no chunks (matches the SQL generate-series oracle).

    Scale shape: embarrassingly parallel map, no shuffle; chunk boundaries
    come from n_chars arithmetic (repeat/cumsum index math) and only the
    md5 touches chunk bytes."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.len().fillna(0).to_numpy().astype(np.int64)
        k = -(-n // stride)                       # ceil; 0 for empty docs
        total = int(k.sum())
        if total == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "chunk_idx": pd.Series(dtype="int64"),
                "chunk_chars": pd.Series(dtype="int64"),
                "chunk_md5": pd.Series(dtype=object)})
        idx = np.arange(total) - np.repeat(np.cumsum(k) - k, k)
        starts = idx * stride
        text_rep = np.repeat(df["text"].to_numpy(), k)
        n_rep = np.repeat(n, k)
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), k).astype("int64"),
            "chunk_idx": idx.astype("int64"),
            "chunk_chars": np.minimum(size, n_rep - starts).astype("int64"),
            "chunk_md5": [hashlib.md5(t[s:s + size].encode()).hexdigest()
                          for t, s in zip(text_rep, starts)],
        })

    return ds.map_batches(chunks, batch_format="pandas")


def source_cap(sf_dir: str, k: int = 10) -> Dataset:
    """Per-source document cap (C4-style domain balancing): keep the k
    lowest-doc_id docs of every source.

    Scale shape: per-batch partial top-k per source (each batch emits at
    most k rows per source it contains), then ONE source-keyed groupby
    whose groups are <= n_batches * k rows — never a global sort, never
    more than k rows per key leaving a task."""
    ds = read_documents(sf_dir, ["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values("doc_id")
                .groupby("source", sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values("doc_id").head(k).copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("source").map_groups(final, batch_format="pandas"))


# PII patterns kept to a regex subset with identical semantics in Python re
# and RE2 (no backrefs/lookaround), so engine and DuckDB oracle rewrite
# byte-identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"


def pii_scrub(sf_dir: str) -> Dataset:
    """PII redaction over the documents table: replace emails then phone
    numbers with sentinels; emit per-doc match counts and the md5 of the
    scrubbed text (content-addressed, so the oracle verifies the actual
    rewrite, not just the counts). Embarrassingly parallel, no shuffle;
    regexes compile once per actor."""

    class Scrub:
        def __init__(self):
            self.email = re.compile(PII_EMAIL)
            self.phone = re.compile(PII_PHONE)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n_email = df["text"].str.count(self.email)
            step1 = df["text"].str.replace(self.email, "<EMAIL>", regex=True)
            n_phone = step1.str.count(self.phone)
            clean = step1.str.replace(self.phone, "<PHONE>", regex=True)
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_emails": n_email.fillna(0).astype("int64"),
                "n_phones": n_phone.fillna(0).astype("int64"),
                "clean_md5": [hashlib.md5(t.encode()).hexdigest()
                              for t in clean],
            })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        Scrub, batch_format="pandas", concurrency=(1, 4))


def mix_sources(sf_dir: str, rates: "dict[str, float] | None" = None,
                default_rate: float = 0.5, seed: int = 9) -> Dataset:
    """Deterministic source mixing: keep each doc with its SOURCE's
    sampling rate (the Pile-style domain-weighting knob — up/down-sample
    domains per epoch without materializing per-source corpora). The
    keep decision is content-addressed: u = first 13 md5 hex digits of
    f"{seed}:{doc_id}" as a fraction, kept iff u < rate[source] — exact
    integer threshold compare, reproducible across engines, runs and
    repartitioning; a new seed is a fresh epoch's subsample.

    One filter pass, no shuffle; rates ride in the task closure (tiny)."""
    rates = rates if rates is not None else {}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        u = df["doc_id"].map(
            lambda i: int(hashlib.md5(f"{seed}:{i}".encode())
                          .hexdigest()[:13], 16))
        rate = df["source"].map(lambda s: rates.get(s, default_rate))
        mask = u < (rate * 2 ** 52)
        out = df.loc[mask, ["doc_id", "source"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    return read_documents(sf_dir, ["doc_id", "source"]).map_batches(
        keep, batch_format="pandas")


SPLIT_BOUNDS = (0.8, 0.9)   # train < 0.8 <= val < 0.9 <= test


def train_val_test(sf_dir: str, seed: int = 4) -> Dataset:
    """Deterministic train/val/test carve-out: every doc is assigned a
    split by its content-addressed hash fraction (train 80% / val 10% /
    test 10%) — stable under repartitioning and re-runs, no persisted
    split lists, membership decidable for any doc in isolation (the
    property that keeps a 100-TB corpus's eval split leak-free across
    pipeline versions). One map pass; emits (doc_id, split)."""
    lo, hi = SPLIT_BOUNDS

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        u = df["doc_id"].map(
            lambda i: int(hashlib.md5(f"{seed}:{i}".encode())
                          .hexdigest()[:13], 16)) / 2 ** 52
        split = np.where(u < lo, "train", np.where(u < hi, "val", "test"))
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "split": split})

    return read_documents(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pandas")


def compression_ratio(sf_dir: str, level: int = 6) -> Dataset:
    """Per-doc zlib compression ratio — the classic cheap repetition /
    low-entropy detector (public technique used alongside the Gopher
    repetition rules: highly compressible text is boilerplate or spam).
    ratio = compressed_bytes / max(raw_bytes, 1), rounded to 4 dp.

    Embarrassingly parallel, no state; rows-only by design (no zlib in
    the SQL oracle engine) — determinism and known-plaintext bounds are
    pinned in pytest."""
    import zlib

    def score(df: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode() for t in df["text"]]
        ratio = [len(zlib.compress(b, level)) / max(len(b), 1) for b in raw]
        f = 1e4
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_bytes": pd.Series([len(b) for b in raw], dtype="int64"),
            "compress_ratio": np.floor(np.array(ratio) * f + 0.5) / f,
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")
