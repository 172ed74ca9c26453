"""Retrieval operators over the `documents` table: distributed inverted-index
build and BM25 top-k search.

Tokenization follows the ops-wide contract (lower(text) split on
non-alphanumeric runs, empties dropped) so DuckDB oracles can mirror both
operators exactly.

Scale shapes:
- inverted_index: per-batch distinct (token, doc_id) pairs -> ONE
  token-bucketed exchange -> per-token document frequency + the posting
  list itself (sorted doc ids). Postings ride as a comma-joined string so
  the value hash is engine-neutral; at 100 TB the same kernel writes
  list<int64> Parquet and the exchange is the only all-to-all.
- bm25_topk: one map pass computes per-doc length and per-query-term
  frequencies (the query terms are a tiny closure constant); corpus stats
  (N, avgdl) and per-term document frequencies reduce to scalars on the
  driver; scoring is a second vectorized map over the per-doc partials with
  per-block top-k, so the driver merges <= k x blocks candidate rows.
  Okapi BM25 (Robertson/Sparck Jones, public), k1=1.2, b=0.75,
  idf = ln((N - df + 0.5) / (df + 0.5) + 1).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..exchange import bucketed_group_map
from .text import read_documents

_SPLIT = re.compile(r"[^a-z0-9]+")

BM25_K1 = 1.2
BM25_B = 0.75
DEFAULT_QUERY = ("spark", "query", "window")


def inverted_index(sf_dir: str, max_df: int | None = None) -> Dataset:
    """(token, df, postings) per distinct token; postings = comma-joined
    ascending doc_ids containing the token.

    `max_df` drops tokens appearing in more than max_df docs (stopword
    pruning) — at corpus scale a stopword's posting list is a
    corpus-length row in one bucket, so production builds should set it;
    the oracle checks the exact (unpruned) default. A further scale note:
    postings for retained tokens are bounded by max_df, so per-bucket
    memory is bounded by nbuckets x max_df x mean-token-share."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ids: list[int] = []
        for i, t in zip(df["doc_id"], df["text"]):
            seen = {w for w in _SPLIT.split(t.lower()) if w}
            toks.extend(seen)
            ids.extend([int(i)] * len(seen))
        return pd.DataFrame({"token": pd.Series(toks, dtype="object"),
                             "doc_id": pd.Series(ids, dtype="int64")})

    def per_token(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["token", "doc_id"]) \
            .sort_values(["token", "doc_id"])
        g = df.groupby("token", sort=False)["doc_id"]
        if max_df is not None:
            keep = g.transform("size") <= max_df
            df = df[keep]
            g = df.groupby("token", sort=False)["doc_id"]
        if df.empty:
            # typed empty frame: an all-pruned bucket must keep
            # string-typed token/postings or its Arrow block can't unify
            # with the other buckets' schemas
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype="object")})
        out = g.agg(lambda s: ",".join(map(str, s))).reset_index()
        out.columns = ["token", "postings"]
        out.insert(1, "df", g.size().to_numpy().astype("int64"))
        return out

    docs = read_documents(sf_dir, ["doc_id", "text"])
    return bucketed_group_map(docs.map_batches(pairs, batch_format="pandas"),
                              ["token"], per_token)


def _token_pairs(sf_dir: str) -> Dataset:
    """Distinct (token, doc_id) pairs, per batch (shared by both index
    shapes)."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ids: list[int] = []
        for i, t in zip(df["doc_id"], df["text"]):
            seen = {w for w in _SPLIT.split(t.lower()) if w}
            toks.extend(seen)
            ids.extend([int(i)] * len(seen))
        return pd.DataFrame({"token": pd.Series(toks, dtype="object"),
                             "doc_id": pd.Series(ids, dtype="int64")})

    docs = read_documents(sf_dir, ["doc_id", "text"])
    return docs.map_batches(pairs, batch_format="pandas")


def write_posting_index(sf_dir: str, out_dir: str,
                        max_df: int | None = None) -> None:
    """Production index shape: (token, df, postings: list<int64>) Parquet.

    Same ONE token-bucketed exchange as `inverted_index`, but postings are
    written as a typed Arrow list column instead of the oracle-neutral
    comma string — zero-copy for readers, and Parquet stats on `token`
    give lookups row-group pruning. Each exchange bucket lands as its own
    file, so a partial write resumes per bucket."""
    import pyarrow as pa

    def per_token(df: pd.DataFrame) -> pa.Table:
        df = (df.drop_duplicates(["token", "doc_id"])
              .sort_values(["token", "doc_id"]))
        if max_df is not None and not df.empty:
            keep = df.groupby("token", sort=False)["doc_id"] \
                .transform("size") <= max_df
            df = df[keep]
        if df.empty:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.list_(pa.int64()))})
        sizes = df.groupby("token", sort=False)["doc_id"].size()
        offsets = np.concatenate(([0], np.cumsum(sizes.to_numpy())))
        postings = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(df["doc_id"].to_numpy(), pa.int64()))
        return pa.table({"token": pa.array(sizes.index, pa.string()),
                         "df": pa.array(sizes.to_numpy(), pa.int64()),
                         "postings": postings})

    (bucketed_group_map(_token_pairs(sf_dir), ["token"], per_token)
     .write_parquet(out_dir))


def lookup_postings(index_dir: str, token: str) -> "np.ndarray":
    """Serve one term from the written Parquet index: predicate-pushdown
    read (token row-group stats prune untouched files/groups), returns the
    ascending doc_id posting array. Empty array for an unseen token."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    dset = pads.dataset(index_dir, format="parquet")
    t = dset.to_table(columns=["postings"],
                      filter=pc.field("token") == token)
    if len(t) == 0:
        return np.array([], dtype=np.int64)
    return t["postings"].combine_chunks().flatten().to_numpy()


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = DEFAULT_QUERY,
              k: int = 10) -> pd.DataFrame:
    """Top-k docs by BM25 score for `terms` (deterministic ties:
    rounded score desc, doc_id asc)."""
    docs = read_documents(sf_dir, ["doc_id", "text"])
    term_list = list(terms)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": df["doc_id"].astype("int64").to_numpy(),
                "dl": np.zeros(len(df), dtype=np.int64)}
        tfs = {t: np.zeros(len(df), dtype=np.int64) for t in term_list}
        for j, t in enumerate(df["text"]):
            ws = [w for w in _SPLIT.split(t.lower()) if w]
            rows["dl"][j] = len(ws)
            for w in ws:
                if w in tfs:
                    tfs[w][j] += 1
        for t in term_list:
            rows[f"tf_{t}"] = tfs[t]
            rows[f"has_{t}"] = (tfs[t] > 0).astype(np.int64)
        return pd.DataFrame(rows)

    per = docs.map_batches(per_doc, batch_format="pandas").materialize()

    # corpus stats + per-term document frequencies: ONE tiny scalar reduction
    import ray
    n_docs = per.count()
    if not n_docs:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    sums = per.sum(["dl"] + [f"has_{t}" for t in term_list])
    avgdl = sums["sum(dl)"] / n_docs if n_docs else 0.0
    dfs = {t: sums[f"sum(has_{t})"] for t in term_list}
    idf = {t: float(np.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0))
           for t in term_list}
    const = ray.put((idf, avgdl))

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        idf_, avgdl_ = ray.get(const)
        dl = df["dl"].to_numpy(dtype=np.float64)
        denom_norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl_) \
            if avgdl_ else np.full(len(df), BM25_K1)
        score = np.zeros(len(df))
        for t in term_list:
            tf = df[f"tf_{t}"].to_numpy(dtype=np.float64)
            score += idf_[t] * tf * (BM25_K1 + 1.0) / (tf + denom_norm)
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                            "score": score})
        out = out[out["score"] > 0.0]
        f = 1e4
        out["score"] = np.sign(out["score"]) * np.floor(
            np.abs(out["score"]) * f + 0.5) / f
        return (out.sort_values(["score", "doc_id"],
                                ascending=[False, True]).head(k))

    cands = per.map_batches(score_block, batch_format="pandas").to_pandas()
    return (cands.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))
