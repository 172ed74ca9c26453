"""Language-model scoring for corpus curation: unigram perplexity
(CCNet-style quality signal, Wenzek et al. 2020) and DSIR-style importance
log-ratios (Xie et al. 2023 "Data Selection for Language Models via
Importance Resampling") — both public algorithms, re-expressed Ray-Data-
first.

Shape (the part that must survive 100 TB):
- model TRAINING is a vocabulary-sized problem: per-batch token partials
  (in-batch combine) -> one groupby-sum over DISTINCT tokens -> the count
  table collects on the driver and broadcasts via `ray.put` ONCE. The
  corpus itself is never shuffled. At web scale the exact vocabulary is
  ~1e7-1e8 terms (GBs at most); if that ever exceeds driver heap, hash
  tokens into 2^k buckets first (what DSIR itself does with hashed
  n-grams) — the scoring stage is unchanged.
- SCORING is embarrassingly parallel: an actor pool gets the broadcast
  log-prob table in `__init__` and maps batches; per-token work is one
  hash lookup via a vectorized pandas map, per-doc reduction is a grouped
  mean. One pass, no exchange.

Both models use add-one smoothing over the SHARED (union) vocabulary:
  p_m(w) = (c_m(w) + 1) / (N_m + V + 1)
so the target model is defined on every background token (the +1 mass
covers target-OOV words) and the SQL oracle can reproduce the math
verbatim. The target slice is the same deterministic doc_id % BENCH_MOD
carve-out `ops/decontam.py` uses as its stand-in benchmark.

Tokenization follows the engine/oracle contract in ops/decontam.py:
lowercase + split on ASCII whitespace runs (RE2-`\\s`-compatible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from .decontam import BENCH_MOD, _words
from .text import read_documents


def unigram_counts(sf_dir: str) -> pd.DataFrame:
    """(token, c_b, c_t): corpus-wide and target-slice counts in ONE pass —
    per-batch partial combine, then a vocabulary-sized groupby-sum."""
    docs = read_documents(sf_dir, ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for i, t in zip(df["doc_id"], df["text"]):
            ws = _words(t)
            ids.extend([i] * len(ws))
            toks.extend(ws)
        if not toks:
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "c_b": pd.Series([], dtype="int64"),
                                 "c_t": pd.Series([], dtype="int64")})
        part = pd.DataFrame({
            "token": toks,
            "c_b": 1,
            "c_t": (np.asarray(ids, dtype=np.int64) % BENCH_MOD == 0)
            .astype("int64"),
        })
        return part.groupby("token", as_index=False).sum()

    from ..exchange import bucketed_agg
    counts = bucketed_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["token"], {"c_b": ("c_b", "sum"), "c_t": ("c_t", "sum")}).to_pandas()
    counts["c_b"] = counts["c_b"].astype("int64")
    counts["c_t"] = counts["c_t"].astype("int64")
    return counts


class _LMScore:
    """Actor-pool scorer: broadcast log-prob tables in, per-doc
    (n_tokens, avg_nll, ppl, dsir_logratio) out."""

    def __init__(self, model_ref):
        logp_b, logp_t, self.oov_b, self.oov_t = ray.get(model_ref)
        # pandas map against a Series uses the hash index in C
        self.lb = pd.Series(logp_b)
        self.lt = pd.Series(logp_t)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for i, t in zip(df["doc_id"], df["text"]):
            ws = _words(t)
            ids.extend([i] * len(ws))
            toks.extend(ws)
        if not toks:  # zero-token docs are skipped (SQL inner-join contract)
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_tokens": pd.Series([], dtype="int64"),
                                 "avg_nll": pd.Series([], dtype="float64"),
                                 "ppl": pd.Series([], dtype="float64"),
                                 "dsir_logratio": pd.Series([],
                                                            dtype="float64")})
        s = pd.Series(toks)
        lb = s.map(self.lb).fillna(self.oov_b).to_numpy()
        lt = s.map(self.lt).fillna(self.oov_t).to_numpy()
        g = pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                          "nll": -lb, "lr": lt - lb})
        out = (g.groupby("doc_id", as_index=False)
               .agg(n_tokens=("nll", "size"), avg_nll=("nll", "mean"),
                    dsir_logratio=("lr", "mean")))
        out["ppl"] = np.exp(out["avg_nll"])
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out[["doc_id", "n_tokens", "avg_nll", "ppl", "dsir_logratio"]]


def lm_perplexity(sf_dir: str) -> Dataset:
    """Per-document unigram perplexity + DSIR importance log-ratio.

    avg_nll  = mean over tokens of -ln p_bg(w)      (quality signal; CCNet
               buckets docs into head/middle/tail by this)
    ppl      = exp(avg_nll)
    dsir_logratio = mean of ln p_target(w) - ln p_bg(w)  (importance weight;
               resample docs proportional to exp of this to tilt the corpus
               toward the target domain)
    """
    counts = unigram_counts(sf_dir)
    v = len(counts)
    n_b = int(counts["c_b"].sum())
    n_t = int(counts["c_t"].sum())
    logp_b = dict(zip(counts["token"],
                      np.log((counts["c_b"].to_numpy() + 1.0)
                             / (n_b + v + 1))))
    logp_t = dict(zip(counts["token"],
                      np.log((counts["c_t"].to_numpy() + 1.0)
                             / (n_t + v + 1))))
    oov_b = float(np.log(1.0 / (n_b + v + 1)))
    oov_t = float(np.log(1.0 / (n_t + v + 1)))
    model_ref = ray.put((logp_b, logp_t, oov_b, oov_t))

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _LMScore, batch_format="pandas", concurrency=(1, 8),
        fn_constructor_args=(model_ref,))


def _gumbel_key(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """Content-addressed Gumbel noise: u from 52 bits of md5(seed:doc_id)
    (exact in a double), g = -ln(-ln(u)). Deterministic across runs,
    engines, repartitioning — the same addressing scheme as
    `ops/text.sample_deterministic` / `ops/export`."""
    import hashlib

    u = np.array([(int(hashlib.md5(f"{seed}:{i}".encode())
                       .hexdigest()[:13], 16) + 0.5) / 2 ** 52
                  for i in doc_ids])
    return -np.log(-np.log(u))


def importance_sample(sf_dir: str, k: int = 100, seed: int = 7,
                      temperature: float = 1.0) -> pd.DataFrame:
    """DSIR-style importance-weighted corpus sampling via Gumbel-top-k
    (Efraimidis–Spirakis / Gumbel-max, both public): sampling k docs
    WITHOUT replacement with P(doc) ∝ exp(dsir_logratio / temperature)
    is exactly `top-k by (dsir/T + Gumbel(doc))` — one streaming pass, no
    global sort, no rejection loop.

    Scale shape: reuses the per-doc DSIR scores (vocab-sized exchange +
    broadcast log-prob tables, see lm_perplexity); the selection is
    per-block top-k partials (k rows per block) + a tiny driver merge —
    the same head shape as the ANN queries. Deterministic: the Gumbel
    noise is content-addressed by (seed, doc_id), so re-runs and
    repartitioning pick the identical sample (rows-only op: libm ulp
    differences make the key not SQL-bitwise; exactness is pinned in
    pytest against a local reference implementation)."""
    scored = lm_perplexity(sf_dir)

    def blk_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        key = (df["dsir_logratio"].to_numpy() / temperature
               + _gumbel_key(ids, seed))
        out = pd.DataFrame({"doc_id": ids.astype("int64"),
                            "dsir_logratio": df["dsir_logratio"],
                            "sample_key": key})
        return (out.sort_values(["sample_key", "doc_id"],
                                ascending=[False, True]).head(k))

    cand = scored.map_batches(blk_topk, batch_format="pandas").to_pandas()
    out = (cand.sort_values(["sample_key", "doc_id"],
                            ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["sample_key"] = out["sample_key"].round(4)
    out["dsir_logratio"] = out["dsir_logratio"].round(4)
    return out


def ppl_buckets(sf_dir: str, cut_qs: tuple = (1 / 3, 2 / 3),
                delta: int = 200) -> pd.DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public): split
    the corpus into head / middle / tail by global avg_nll quantiles —
    the standard curriculum/quality partition over a language-model score.

    Scale shape (two passes, nothing corpus-sized on the driver):
    1. per-block mergeable t-digests over avg_nll -> thresholds on the
       driver (a few KiB regardless of corpus size — the honest way to
       estimate global quantiles at 100 TB; exact agreement with true
       quantiles is pinned within tolerance in tests);
    2. thresholds broadcast; one vectorized map assigns each doc its
       bucket; per-bucket counts + mean nll roll up from tiny partials.

    Returns (bucket, n_docs, mean_nll, lo, hi) — one row per bucket.
    rows-only by design (the t-digest thresholds are approximate)."""
    from .sketch import TDigest

    scored = lm_perplexity(sf_dir).materialize()

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(delta).add_many(df["avg_nll"].to_numpy())
        return pd.DataFrame({"sketch": [d.serialize()]})

    digest = TDigest(delta)
    for b in (scored.map_batches(sketch, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        for s in b["sketch"]:
            digest.merge(TDigest.deserialize(bytes(s), delta))
    cuts = [digest.quantile(q) for q in cut_qs]
    names = ["head", "middle", "tail"]
    ref = ray.put(cuts)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        nll = df["avg_nll"].to_numpy()
        idx = np.searchsorted(c, nll, side="right")
        out = pd.DataFrame({"bucket": np.array(names)[idx],
                            "n_docs": 1, "nll_sum": nll})
        return out.groupby("bucket", as_index=False).sum()

    parts = (scored.map_batches(assign, batch_format="pandas")
             .to_pandas().groupby("bucket", as_index=False).sum())
    lo = {"head": float("-inf"), "middle": cuts[0], "tail": cuts[1]}
    hi = {"head": cuts[0], "middle": cuts[1], "tail": float("inf")}
    parts["mean_nll"] = (parts["nll_sum"] / parts["n_docs"]).round(4)
    parts["lo"] = parts["bucket"].map(lo).round(4)
    parts["hi"] = parts["bucket"].map(hi).round(4)
    parts["n_docs"] = parts["n_docs"].astype("int64")
    order = {n: i for i, n in enumerate(names)}
    return (parts.assign(_o=parts["bucket"].map(order))
            .sort_values("_o").drop(columns=["_o", "nll_sum"])
            .reset_index(drop=True))
