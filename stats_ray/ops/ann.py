"""Similarity search over the `embeddings` table (list<float> column).

- brute_force_topk: cosine top-k per query — numpy matmul per batch against
  a broadcast query matrix (ray.put once, read per actor), per-batch top-k,
  driver-side merge of tiny per-block candidate sets. The 100 TB scale path
  is the same kernel behind an IVF/LSH bucket stage (lsh_bucketed_topk).
- embedding_near_dup: cosine >= threshold pairs via the same broadcast
  pattern (each batch scores against the full normalized matrix reference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data import Dataset

from ..exchange import bucketed_group_map


def read_embeddings(sf_dir: str, columns=None) -> Dataset:
    from .io import read_table
    return read_table(sf_dir, "embeddings", columns=columns)


def _to_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    emb = t["embedding"].combine_chunks()
    vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(emb[0])
    mat = vals.reshape(len(t), dim)
    ids = t["vec_id"].to_numpy()
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _lowest_ids(ds: Dataset, n: int) -> pd.DataFrame:
    """The n rows with the smallest vec_id — per-block min-k partials
    (argpartition inside map_batches) + a tiny driver merge, instead of a
    global `sort(...).limit(n)` whose range exchange moves every row to
    pick a handful."""
    def blk(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        if len(ids) > n:
            idx = np.sort(np.argpartition(ids, n)[:n])
            t = t.take(pa.array(idx))
        return t

    cand = ds.map_batches(blk, batch_format="pyarrow").to_pandas()
    return (cand.nsmallest(n, "vec_id").sort_values("vec_id")
            .reset_index(drop=True))


def brute_force_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Top-k cosine neighbors for the n_queries lowest vec_ids (excluding
    self). Deterministic tiebreak: (sim desc, neighbor_id asc)."""
    ds = read_embeddings(sf_dir)

    # small side: the query matrix — materialized once, broadcast via ray.put
    head = _lowest_ids(ds, n_queries)
    q_ids = head["vec_id"].to_numpy()
    q = _normalize(np.stack(head["embedding"].to_numpy()).astype(np.float64))
    q_ref = ray.put((q_ids, q))

    class Score:
        def __init__(self):
            self.q_ids, self.q = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            sims = _normalize(mat) @ self.q.T           # (batch, nq)
            frames = []
            for j, qid in enumerate(self.q_ids):
                s = sims[:, j]
                mask = ids != qid
                idx = np.argsort(-s[mask], kind="stable")[:k]
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ids[mask][idx],
                    "sim": s[mask][idx]}))
            return pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True),
                preserve_index=False).replace_schema_metadata(None)

    cands = ds.map_batches(Score, batch_format="pyarrow",
                           concurrency=(1, 8)).to_pandas()
    out = (cands.sort_values(["query_id", "sim", "neighbor_id"],
                             ascending=[True, False, True])
           .groupby("query_id", sort=True).head(k).reset_index(drop=True))
    out["sim"] = np.sign(out["sim"]) * np.floor(np.abs(out["sim"]) * 1e4 + 0.5) / 1e4
    return out[["query_id", "neighbor_id", "sim"]]


def _broadcast_matrix(ds: Dataset, max_rows: int = 1_000_000):
    """Accumulate (ids, normalized matrix) from Arrow batches and ray.put
    it ONCE — the broadcast side never goes through pandas and lives in the
    object store, not per-task closures.

    Guarded: this materializes the WHOLE embedding table as one dense
    matrix, which is only valid for the exact/oracle path or a genuine
    dimension table. Use embedding_near_dup_lsh / semantic_dedup for real
    corpora (they bucket before scoring and never build a global matrix)."""
    id_chunks, mat_chunks, total = [], [], 0
    for t in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        total += len(t)
        if total > max_rows:
            raise ValueError(
                f"_broadcast_matrix: >{max_rows} rows — the exact path "
                "builds a driver-side N x d matrix; use "
                "embedding_near_dup_lsh or semantic_dedup at this scale")
        ids, mat = _to_matrix(t)
        id_chunks.append(ids)
        mat_chunks.append(_normalize(mat))
    ids_all = np.concatenate(id_chunks)
    m_all = np.vstack(mat_chunks)
    return ray.put((ids_all, m_all))


def _chunked_cosine_pairs(ids: np.ndarray, mat: np.ndarray,
                          threshold: float, cap: int) -> pd.DataFrame:
    """All upper-triangle pairs with cosine >= threshold from ONE bucket,
    with every similarity block bounded to cap x cap — worker memory stays
    O(cap^2) no matter how degenerate the bucket (e.g. every vector
    identical), while still touching each (i, j) pair exactly once."""
    n = len(ids)
    frames = []
    for lo in range(0, n, cap):
        a = mat[lo:lo + cap]
        for lo2 in range(lo, n, cap):
            sims = a @ mat[lo2:lo2 + cap].T
            ci, cj = np.nonzero(sims >= threshold)
            gi, gj = ci + lo, cj + lo2
            keep = gj > gi
            if not keep.any():
                continue
            i1, i2 = ids[gi[keep]], ids[gj[keep]]
            frames.append(pd.DataFrame({
                "id1": np.minimum(i1, i2).astype(np.int64),
                "id2": np.maximum(i1, i2).astype(np.int64),
                "sim": sims[ci[keep], cj[keep]]}))
    if not frames:
        return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                             "id2": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    return pd.concat(frames, ignore_index=True)


def embedding_near_dup(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    """All EXACT pairs with cosine >= threshold (id1 < id2).

    Exact pair mining is inherently O(N^2) compute; this is the oracle /
    dimension-table path: one normalized copy of the matrix is broadcast
    through the object store (ray.put once, zero-copy reads per actor) and
    every batch scores against it. The 100 TB path is
    embedding_near_dup_lsh, which buckets before scoring."""
    ds = read_embeddings(sf_dir)
    ref = _broadcast_matrix(ds)

    class Pairs:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            sims = _normalize(mat) @ self.m.T
            bi, aj = np.nonzero(sims >= threshold)
            keep = ids[bi] < self.ids[aj]
            return pa.table({
                "id1": pa.array(ids[bi][keep]),
                "id2": pa.array(self.ids[aj][keep]),
                "sim": pa.array(sims[bi, aj][keep]),
            })

    out = ds.map_batches(Pairs, batch_format="pyarrow",
                         concurrency=(1, 8)).to_pandas()
    if out.empty:
        return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                             "id2": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    out["sim"] = np.floor(np.abs(out["sim"]) * 1e4 + 0.5) / 1e4 * np.sign(out["sim"])
    return out.sort_values(["id1", "id2"]).reset_index(drop=True)


def embedding_near_dup_lsh(sf_dir: str, threshold: float = 0.35,
                           n_bands: int = 8, planes_per_band: int = 3,
                           seed: int = 13, all_pairs_cap: int = 4096,
                           num_partitions: int = 16) -> pd.DataFrame:
    """Scale path for cosine-pair mining: random-hyperplane LSH bands.

    Each vector gets n_bands independent codes (planes_per_band hyperplanes
    each); vectors sharing any band code land in the same bucket, where the
    exact cosine kernel scores only same-bucket pairs. Never materializes
    the input on the driver; pair dedup is a distributed groupby.

    Recall: a pair at angle theta collides in one band with prob
    (1 - theta/pi)^planes_per_band; across 8 bands of 3 planes a pair at
    cosine 0.35 (theta ~ 69.5 deg) is caught with prob
    1 - (1 - 0.61^3)^8 ~ 0.89; tune bands/planes per target threshold.
    Per-bucket work is capped at all_pairs_cap members (larger buckets are
    chunked), bounding worker memory on degenerate codes."""
    ds = read_embeddings(sf_dir)

    class Code:
        def __init__(self):
            self.rs_planes = None

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            if self.rs_planes is None:
                dim = mat.shape[1]
                r = np.random.RandomState(seed)
                self.rs_planes = r.normal(size=(n_bands * planes_per_band, dim))
            mn = _normalize(mat)
            bits = (mn @ self.rs_planes.T) > 0           # (n, bands*planes)
            weights = 1 << np.arange(planes_per_band)
            frames = []
            for b in range(n_bands):
                chunk = bits[:, b * planes_per_band:(b + 1) * planes_per_band]
                codes = chunk @ weights
                frames.append(pd.DataFrame({
                    "vec_id": ids, "band": np.int32(b),
                    "code": codes.astype(np.int32),
                    "embedding": list(mn)}))
            return pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True),
                preserve_index=False).replace_schema_metadata(None)

    coded = ds.map_batches(Code, batch_format="pyarrow", concurrency=(1, 8))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        return _chunked_cosine_pairs(
            g["vec_id"].to_numpy(), np.stack(g["embedding"].to_numpy()),
            threshold, all_pairs_cap)

    pairs = bucketed_group_map(coded, ["band", "code"], bucket_pairs,
                               per_group=True)
    pairs = bucketed_group_map(
        pairs, ["id1", "id2"],
        lambda df: df.drop_duplicates(["id1", "id2"]))
    out = pairs.to_pandas()
    if out.empty:
        return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                             "id2": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    out["sim"] = np.floor(np.abs(out["sim"]) * 1e4 + 0.5) / 1e4 * np.sign(out["sim"])
    return out.sort_values(["id1", "id2"]).reset_index(drop=True)


def lsh_bucketed_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                      n_planes: int = 6, seed: int = 11) -> pd.DataFrame:
    """Scale path: random-hyperplane LSH bucket per vector, score queries only
    against same-bucket vectors (plus the query's bucket neighbors by 1-bit
    flips). Approximate — returns the same schema as brute_force_topk."""
    ds = read_embeddings(sf_dir)
    head = _lowest_ids(ds, n_queries)
    q_ids = head["vec_id"].to_numpy()
    qm = _normalize(np.stack(head["embedding"].to_numpy()).astype(np.float64))
    dim = qm.shape[1]
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(n_planes, dim))
    q_buckets = ((qm @ planes.T) > 0).astype(np.uint8)
    q_codes = set()
    for row in q_buckets:
        code = int("".join(map(str, row)), 2)
        q_codes.add(code)
        for b in range(n_planes):          # 1- and 2-bit flip neighborhood
            q_codes.add(code ^ (1 << b))
            for b2 in range(b + 1, n_planes):
                q_codes.add(code ^ (1 << b) ^ (1 << b2))
    ref = ray.put((q_ids, qm, planes, frozenset(q_codes)))

    class Score:
        def __init__(self):
            self.q_ids, self.q, self.planes, self.codes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            mn = _normalize(mat)
            bits = ((mn @ self.planes.T) > 0).astype(np.uint8)
            codes = bits @ (1 << np.arange(bits.shape[1] - 1, -1, -1))
            mask = np.isin(codes, list(self.codes))
            if not mask.any():
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            sims = mn[mask] @ self.q.T
            frames = []
            for j, qid in enumerate(self.q_ids):
                s = sims[:, j]
                sub = ids[mask]
                m2 = sub != qid
                idx = np.argsort(-s[m2], kind="stable")[:k]
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": sub[m2][idx],
                    "sim": s[m2][idx]}))
            return pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True),
                preserve_index=False).replace_schema_metadata(None)

    cands = ds.map_batches(Score, batch_format="pyarrow",
                           concurrency=(1, 8)).to_pandas()
    out = (cands.sort_values(["query_id", "sim", "neighbor_id"],
                             ascending=[True, False, True])
           .groupby("query_id", sort=True).head(k).reset_index(drop=True))
    return out[["query_id", "neighbor_id", "sim"]]


def _kmeans(sample: np.ndarray, k: int, iters: int = 8,
            seed: int = 11) -> np.ndarray:
    """Tiny deterministic spherical k-means for the IVF coarse quantizer
    (driver-side over a bounded sample; centroids are the broadcast side)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4,
             train_size: int = 2048) -> pd.DataFrame:
    """IVF (inverted-file) ANN: a coarse k-means quantizer trained on a
    bounded sample partitions the vectors into clusters; each query scores
    only the `nprobe` nearest clusters' members.

    Scale shape: train on a driver-side SAMPLE (bounded regardless of table
    size), broadcast the centroid matrix, assign + score inside
    map_batches — a batch contributes candidates only for queries probing
    its vectors' clusters, so compute drops by ~n_clusters/nprobe vs brute
    force while the data-side pass stays one streaming scan. Recall vs
    brute force is pinned in tests (like lsh_bucketed_topk)."""
    ds = read_embeddings(sf_dir)

    train = ds.limit(train_size).to_pandas()
    tmat = np.stack(train["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans(tmat, n_clusters)

    head = _lowest_ids(ds, n_queries)
    q_ids = head["vec_id"].to_numpy()
    q = _normalize(np.stack(head["embedding"].to_numpy()).astype(np.float64))
    # nprobe nearest clusters per query
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q, cent, probes))

    class Score:
        def __init__(self):
            self.q_ids, self.q, self.cent, self.probes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            nm = _normalize(mat)
            assign = np.argmax(nm @ self.cent.T, axis=1)     # (batch,)
            frames = []
            for j, qid in enumerate(self.q_ids):
                mask = np.isin(assign, self.probes[j]) & (ids != qid)
                if not mask.any():
                    continue
                s = nm[mask] @ self.q[j]
                idx = np.argsort(-s)[:k]
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ids[mask][idx],
                    "sim": s[idx]}))
            if not frames:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True),
                preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(Score, batch_format="pyarrow",
                          concurrency=(1, 8)).to_pandas()
    out = (cand.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True])
           .groupby("query_id", as_index=False).head(k)
           .reset_index(drop=True))
    out["sim"] = out["sim"].round(4)
    return out


def distributed_kmeans(sf_dir: str, k: int = 8, iters: int = 10,
                       seed: int = 23) -> pd.DataFrame:
    """Distributed spherical k-means over the embeddings table — the
    iterative-refinement pattern: per iteration ONE streaming pass where
    each batch emits per-cluster (vector-sum, count) PARTIALS against the
    broadcast centroids; the tiny k×d reduction and the centroid update run
    on the driver. Data never leaves the object store, driver state is
    O(k·d), and each iteration is one map + one vocabulary-sized groupby —
    the same shape at 100 TB.

    Returns per-cluster sizes and mean cosine to the centroid (rows-only:
    iterative/approximate by design; convergence pinned in tests)."""
    import ray

    ds = read_embeddings(sf_dir).materialize()

    seedf = ds.limit(max(k * 8, 256)).to_pandas()
    smat = _normalize(np.stack(seedf["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = smat[rng.choice(len(smat), size=min(k, len(smat)), replace=False)]

    def make_partial(ref):
        # plain task fn, NOT an actor class: a per-iteration actor pool pays
        # pool spin-up every Lloyd round (~10x the useful work at small k);
        # the centroids ride the object store and ray.get is a local hit
        def partial(t: pa.Table) -> pa.Table:
            c_mat = ray.get(ref)
            _, mat = _to_matrix(t)
            nm = _normalize(mat)
            assign = np.argmax(nm @ c_mat.T, axis=1)
            rows = {"cluster": [], "vsum": [], "n": []}
            for c in np.unique(assign):
                members = nm[assign == c]
                rows["cluster"].append(int(c))
                rows["vsum"].append(members.sum(axis=0).tobytes())
                rows["n"].append(len(members))
            return pa.table({
                "cluster": pa.array(rows["cluster"], pa.int32()),
                "vsum": pa.array(rows["vsum"], pa.binary()),
                "n": pa.array(rows["n"], pa.int64()),
            })
        return partial

    for _ in range(iters):
        ref = ray.put(cent)
        parts = (ds.map_batches(make_partial(ref), batch_format="pyarrow")
                 .to_pandas())
        new = cent.copy()
        for c, g in parts.groupby("cluster"):
            vs = np.sum([np.frombuffer(b, dtype=np.float64)
                         for b in g["vsum"]], axis=0)
            if g["n"].sum() > 0:
                new[c] = vs
        prev, cent = cent, _normalize(new)
        if float(np.abs(cent - prev).max()) < 1e-9:   # converged: skip rounds
            break

    # final assignment stats (one more pass, same partial shape)
    ref = ray.put(cent)

    def stats(t: pa.Table) -> pa.Table:
        c_mat = ray.get(ref)
        _, mat = _to_matrix(t)
        nm = _normalize(mat)
        sims = nm @ c_mat.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(nm)), assign]
        rows = {"cluster": [], "n": [], "sim_sum": []}
        for c in np.unique(assign):
            m = assign == c
            rows["cluster"].append(int(c))
            rows["n"].append(int(m.sum()))
            rows["sim_sum"].append(float(best[m].sum()))
        return pa.table({
            "cluster": pa.array(rows["cluster"], pa.int32()),
            "n": pa.array(rows["n"], pa.int64()),
            "sim_sum": pa.array(rows["sim_sum"], pa.float64()),
        })

    st = (ds.map_batches(stats, batch_format="pyarrow")
          .to_pandas().groupby("cluster", as_index=False).sum())
    st["mean_sim"] = (st["sim_sum"] / st["n"]).round(4)
    return (st[["cluster", "n", "mean_sim"]]
            .sort_values("cluster").reset_index(drop=True))


def semantic_dedup(sf_dir: str, threshold: float = 0.35, n_clusters: int = 8,
                   probes: int = 3, train_size: int = 2048,
                   seed: int = 11, target_bucket: int = 1024,
                   all_pairs_cap: int = 4096) -> pd.DataFrame:
    """SemDeDup-style semantic near-dup mining (Abbas et al. 2023, public):
    cluster the embedding space coarsely, then mine exact-cosine pairs only
    WITHIN clusters — the O(N^2/k) alternative to all-pairs scoring and the
    natural companion to `embedding_near_dup_lsh` (data-dependent buckets
    instead of random hyperplanes).

    Scale shape: the quantizer is trained on a bounded driver-side sample
    and broadcast (like `ivf_topk`); each batch emits `probes` (cluster,
    vector) rows — multi-probe assignment so boundary pairs whose members
    straddle two clusters are still co-bucketed; ONE cluster-keyed exchange
    co-locates each bucket (expected size ~probes*N/k, the documented
    partitioning assumption); in-bucket scoring is a vectorized matmul.
    Duplicate pairs found in two shared probes are collapsed by a
    (id1, id2) groupby, never on the driver. Recall vs the exact
    `embedding_near_dup` path is pinned in tests.

    Bucket-size control (the 100x levers): n_clusters scales with the
    corpus so the EXPECTED bucket holds ~target_bucket rows
    (k = probes * N / target_bucket, floored at the caller's n_clusters),
    and in-bucket scoring is chunked to all_pairs_cap x all_pairs_cap
    blocks so a degenerate cluster (every vector identical) costs bounded
    worker memory instead of an O(bucket^2) allocation."""
    ds = read_embeddings(sf_dir)

    n_total = ds.count()
    k_eff = max(n_clusters, -(-probes * n_total // target_bucket))
    # keep enough training vectors per centroid for the quantizer to mean
    # anything (>= 8 sample rows per cluster)
    k_eff = int(min(k_eff, max(1, train_size // 8)))

    train = ds.limit(train_size).to_pandas()
    tmat = np.stack(train["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans(tmat, k_eff, seed=seed)
    ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            nm = _normalize(mat)
            near = np.argsort(-(nm @ self.cent.T), axis=1)[:, :probes]
            # the vector payload is ONE fixed-size-list array; the `probes`
            # repeats are chunks referencing the SAME values buffer — no
            # per-row serialization, no x-probes copy of the floats
            base = pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(nm).ravel(), pa.float64()),
                nm.shape[1])
            return pa.table({
                "cluster": pa.chunked_array(
                    [pa.array(near[:, b].astype(np.int32))
                     for b in range(probes)]),
                "vec_id": pa.chunked_array(
                    [pa.array(ids, pa.int64())] * probes),
                "vec": pa.chunked_array([base] * probes),
            })

    _EMPTY_PAIRS = pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY_PAIRS.copy()
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["vec"].to_numpy())
        out = _chunked_cosine_pairs(ids, mat, threshold, all_pairs_cap)
        out["sim"] = np.round(out["sim"], 4)
        return out

    # cluster count scales linearly with the corpus (k_eff ~ probes*N /
    # target_bucket), so per-cluster dispatch must be LOCAL pandas inside a
    # bucketed exchange — Ray-native map_groups pays ~0.2-4 ms per group
    # (hours of dispatch at 1e9 docs). Buckets sized so each task holds
    # ~16 clusters regardless of N.
    nbuckets = max(64, -(-probes * n_total // (target_bucket * 16)))
    assigned = ds.map_batches(Assign, batch_format="pyarrow",
                              concurrency=(1, 8))
    pairs = bucketed_group_map(assigned, ["cluster"], bucket_pairs,
                               nbuckets=int(nbuckets), per_group=True)

    # same pair can surface from two shared probe clusters: distributed
    # distinct on the pair key (drop id1==id2 defensively too)
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["id1"] != df["id2"]]
        return df.drop_duplicates(["id1", "id2"])[["id1", "id2", "sim"]]

    out = bucketed_group_map(pairs, ["id1", "id2"], dedup_pairs).to_pandas()
    return (out.sort_values(["id1", "id2"]).reset_index(drop=True))


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroids, long-form (label, dim, n, mean_v) —
    the grouped vector rollup a curation pipeline uses for domain/topic
    centroids (seeding semantic_dedup / ivf, drift monitoring).

    Scale shape: each batch emits ONE k x d partial (label, vector-sum,
    count); the driver combines k x d floats — group count k is the label
    vocabulary, never the corpus, so nothing scales with N except the one
    streaming pass."""
    ds = read_embeddings(sf_dir, ["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        _, mat = _to_matrix(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(uniq),
            "vsum": pa.array([s.tobytes() for s in sums], pa.binary()),
            "n": pa.array(counts),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = {"label": [], "dim": [], "n": [], "mean_v": []}
    for lab, g in parts.groupby("label"):
        vs = np.sum([np.frombuffer(b, dtype=np.float64) for b in g["vsum"]],
                    axis=0)
        n = int(g["n"].sum())
        mean = vs / n
        d = len(mean)
        rows["label"].extend([int(lab)] * d)
        rows["dim"].extend(range(d))
        rows["n"].extend([n] * d)
        f = 1e4
        rows["mean_v"].extend(np.sign(mean) * np.floor(np.abs(mean) * f + 0.5)
                              / f)
    out = pd.DataFrame(rows)
    out["label"] = out["label"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


# --- product quantization (PQ) -----------------------------------------------

def pq_train(sample: np.ndarray, m: int = 8, ksub: int = 16,
             iters: int = 8, seed: int = 17) -> np.ndarray:
    """Train PQ codebooks (Jégou et al. 2011, public): split the d dims
    into m subspaces and k-means each independently over a bounded
    driver-side sample. Returns (m, ksub, d/m) float64 codebooks.

    Scale shape: training input is a SAMPLE (like `ivf_topk`'s coarse
    quantizer) — codebook size m*ksub*(d/m) = ksub*d floats is broadcast,
    independent of the table size."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(n, size=min(ksub, n), replace=False)].copy()
        for _ in range(iters):
            # assign to nearest centroid by L2 (classic PQ trains in L2)
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, :len(cent)] = cent
        if len(cent) < ksub:                  # degenerate tiny sample
            books[j, len(cent):] = cent[-1]
    return books


def pq_encode(ds: Dataset, books: np.ndarray) -> Dataset:
    """Encode every vector to m uint8 sub-codes against the broadcast
    codebooks — a 64-float (256 B at f32) vector becomes m bytes, the
    compression that makes billion-scale ANN fit in memory. One streaming
    map_batches; codes ride as a fixed-size-list<uint8> column."""
    m, ksub, dsub = books.shape
    ref = ray.put(books)

    class Encode:
        def __init__(self):
            self.books = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _to_matrix(t)
            nm = _normalize(mat)
            codes = np.empty((len(nm), m), dtype=np.uint8)
            for j in range(m):
                sub = nm[:, j * dsub:(j + 1) * dsub]
                d2 = ((sub[:, None, :] - self.books[j][None, :, :]) ** 2
                      ).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.uint8()), m),
            })

    return ds.map_batches(Encode, batch_format="pyarrow",
                          concurrency=(1, 8))


def pq_topk(sf_dir: str, n_queries: int = 5, k: int = 10, m: int = 8,
            ksub: int = 16, train_size: int = 2048) -> pd.DataFrame:
    """PQ asymmetric-distance top-k (ADC): queries stay exact, database
    vectors are m-byte codes; per query a (m, ksub) lookup table of
    sub-distances is built once, and each candidate's distance is m table
    lookups summed — no float vector math per candidate.

    Scale shape: codebooks train on a bounded sample and broadcast; the
    encode pass and the scoring pass are each ONE streaming map_batches
    with per-block top-k partials (approximate by design — recall vs
    brute force pinned in tests). Returns (query_id, neighbor_id, adist)."""
    ds = read_embeddings(sf_dir)

    train = ds.limit(train_size).to_pandas()
    tmat = _normalize(np.stack(train["embedding"].to_numpy())
                      .astype(np.float64))
    books = pq_train(tmat, m=m, ksub=ksub)

    head = _lowest_ids(ds, n_queries)
    q_ids = head["vec_id"].to_numpy()
    q = _normalize(np.stack(head["embedding"].to_numpy()).astype(np.float64))
    dsub = books.shape[2]
    # per-query LUT: luts[qi, j, c] = ||q_sub - book[j][c]||^2
    luts = np.empty((len(q), m, ksub))
    for j in range(m):
        qs = q[:, j * dsub:(j + 1) * dsub]
        luts[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2
                         ).sum(axis=2)
    ref = ray.put((q_ids, luts))
    coded = pq_encode(ds, books)

    class Score:
        def __init__(self):
            self.q_ids, self.luts = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            codes = (t["code"].combine_chunks().flatten()
                     .to_numpy().reshape(len(ids), m))
            frames = []
            for qi, qid in enumerate(self.q_ids):
                # ADC: sum of m LUT gathers, fully vectorized over the block
                dist = self.luts[qi][np.arange(m)[None, :], codes].sum(axis=1)
                mask = ids != qid
                # same (adist, neighbor_id) tie-break as the driver merge:
                # identical codes give identical adist, and a block-order
                # tie-break would make the k boundary depend on partitioning
                order = np.lexsort((ids[mask], dist[mask]))[:k]
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ids[mask][order],
                    "adist": dist[mask][order]}))
            return pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True),
                preserve_index=False).replace_schema_metadata(None)

    cand = coded.map_batches(Score, batch_format="pyarrow",
                             concurrency=(1, 8)).to_pandas()
    out = (cand.sort_values(["query_id", "adist", "neighbor_id"],
                            ascending=[True, True, True])
           .groupby("query_id", as_index=False).head(k)
           .reset_index(drop=True))
    out["adist"] = out["adist"].round(4)
    return out
