"""Generic relational + training-data operator queries over the driver's
sf tables (lineitem/orders/customer/events/documents/embeddings).

QUERIES maps name -> callable(sf_dir) -> DataFrame/Dataset.
ORACLES maps name -> DuckDB SQL against the pre-registered table views
(omitted for non-SQL-expressible ops -> driver records rows-only checks).

Float aggregate columns are rounded half-away-from-zero to 4 decimals on
BOTH sides so FP sum-order differences between Ray's shuffle and DuckDB
can't flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _r4(df: pd.DataFrame, cols, p: int = 4) -> pd.DataFrame:
    for c in cols:
        a = df[c].to_numpy(dtype=np.float64)
        f = 10.0 ** p
        df[c] = np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f
    return df


def _pd(ds):
    if isinstance(ds, pd.DataFrame):
        return ds
    from ..schema import to_pandas_typed
    return to_pandas_typed(ds)


# ---------------------------------------------------------------------------

def _q_tpch_q1(sf_dir: str):
    from .relational import tpch_q1
    df = _pd(tpch_q1(sf_dir))
    return _r4(df, ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"])


# Fixed-point accumulation mirrors the Ray side exactly (see
# relational.tpch_q1): integer unit sums are order-independent, so the
# comparison stays bit-exact at any scale factor / parallelism.
_SQL_TPCH_Q1 = """
WITH u AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc_u,
         100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tax_u
  FROM lineitem)
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(qty) / 1.0, 4) AS sum_qty,
       ROUND(SUM(cents) / 100.0, 4) AS sum_base_price,
       ROUND(SUM(cents * disc_u) / 10000.0, 4) AS sum_disc_price,
       ROUND(SUM(cents * disc_u * tax_u) / 1000000.0, 4) AS sum_charge,
       COUNT(*) AS count_order
FROM u GROUP BY 1, 2
"""


def _q_top_orders(sf_dir: str):
    from .relational import top_orders
    return _pd(top_orders(sf_dir))


_SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def _q_orders_by_nation(sf_dir: str):
    from .relational import orders_by_nation
    df = _pd(orders_by_nation(sf_dir))
    df["n_orders"] = df["n_orders"].astype("int64")
    return _r4(df, ["total_price"])


_SQL_ORDERS_BY_NATION = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4)
         AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


def _q_order_lineitem_revenue(sf_dir: str):
    from .relational import order_lineitem_revenue
    df = order_lineitem_revenue(sf_dir)
    return _r4(df, ["revenue"])


_SQL_ORDER_LINEITEM_REVENUE = """
SELECT o.o_orderpriority, l.l_returnflag,
       ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
             / 10000.0, 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_customer_order_counts(sf_dir: str):
    from .relational import customer_order_counts
    df = customer_order_counts(sf_dir)
    return _r4(df, ["total_spend"])


_SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN o.n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_order,
       CAST(COALESCE(SUM(o.n_orders), 0) AS BIGINT) AS n_orders,
       ROUND(COALESCE(SUM(o.total_spend), 0), 4) AS total_spend
FROM customer c LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS total_spend
    FROM orders GROUP BY 1
) o ON c.c_custkey = o.o_custkey
GROUP BY 1 ORDER BY 1
"""


def _q_lm_perplexity(sf_dir: str):
    from .lm import lm_perplexity
    df = _pd(lm_perplexity(sf_dir))
    return _r4(df, ["avg_nll", "ppl", "dsir_logratio"])


def _q_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity buckets (rows-only: t-digest
    thresholds are approximate by design; tolerance pinned in
    tests/test_lm.py)."""
    from .lm import ppl_buckets
    return ppl_buckets(sf_dir)


def _q_importance_sample(sf_dir: str):
    """DSIR Gumbel-top-k importance sampling (rows-only: the sampling key
    mixes libm logs that differ from DuckDB's by ulps; exactness vs a
    local reference + determinism pinned in tests/test_lm.py)."""
    from .lm import importance_sample
    return importance_sample(sf_dir)


# Unigram LM with add-one smoothing over the shared vocabulary; target
# slice = doc_id % 37 == 0 (the decontam benchmark carve-out). Tokenization
# contract: lowercase + ASCII-whitespace split (see ops/decontam.py).
_SQL_LM_PERPLEXITY = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
), counts AS (
  SELECT w, COUNT(*) AS c_b,
         SUM(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END) AS c_t
  FROM toks GROUP BY w
), tot AS (
  SELECT SUM(c_b) AS n_b, SUM(c_t) AS n_t, COUNT(*) AS v FROM counts
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(-LN((c.c_b + 1.0) / (tot.n_b + tot.v + 1))), 4) AS avg_nll,
       ROUND(EXP(AVG(-LN((c.c_b + 1.0) / (tot.n_b + tot.v + 1)))), 4) AS ppl,
       ROUND(AVG(LN((c.c_t + 1.0) / (tot.n_t + tot.v + 1))
                 - LN((c.c_b + 1.0) / (tot.n_b + tot.v + 1))), 4)
           AS dsir_logratio
FROM toks t JOIN counts c USING (w), tot
GROUP BY t.doc_id
"""


def _q_export_shards(sf_dir: str):
    import shutil
    import tempfile

    from .export import export_shards
    out = tempfile.mkdtemp(prefix="stats_ray_export_")
    try:
        df = _pd(export_shards(sf_dir, out_dir=out))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    for c in ("shard", "n_docs", "n_chars"):
        df[c] = df[c].astype("int64")
    return df


_SQL_EXPORT_SHARDS = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         md5(concat('7:', CAST(doc_id AS VARCHAR))) AS k,
         ('0x' || substr(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 8))
             ::BIGINT % 16 AS shard
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       MIN(k) AS min_key, MAX(k) AS max_key
FROM keyed GROUP BY 1 ORDER BY 1
"""


def _q_orders_building_segment(sf_dir: str):
    from .relational import orders_building_segment
    df = orders_building_segment(sf_dir)
    return _r4(df, ["total_price"])


_SQL_ORDERS_BUILDING_SEGMENT = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4)
         AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING')
GROUP BY 1 ORDER BY 1
"""


def _q_events_daily(sf_dir: str):
    from .relational import events_daily
    df = _pd(events_daily(sf_dir))
    df["n"] = df["n"].astype("int64")
    return _r4(df, ["sum_value"])


_SQL_EVENTS_DAILY = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def _q_events_users(sf_dir: str):
    from .relational import events_user_stats
    df = _pd(events_user_stats(sf_dir))
    df["n_users"] = df["n_users"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return df


_SQL_EVENTS_USERS = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def _q_dedup_exact(sf_dir: str):
    from .dedup import exact_dedup
    df = _pd(exact_dedup(sf_dir))
    df["n"] = df["n"].astype("int64")
    return df


_SQL_DEDUP_EXACT = """
SELECT md5(text) AS md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n
FROM documents GROUP BY 1
"""


def _q_token_stats(sf_dir: str):
    from .text import token_stats
    df = _pd(token_stats(sf_dir))
    return _r4(df, ["mean_word_len"], 6)


def _q_bpe_token_stats(sf_dir: str):
    from .text import bpe_token_stats
    df = _pd(bpe_token_stats(sf_dir))
    return _r4(df, ["mean_tok_len"])


_SQL_BPE_TOKEN_STATS = r"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text,
           '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+|\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
            AS BIGINT) AS token_chars,
       ROUND(CASE WHEN len(toks) > 0 THEN
             COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
             / len(toks)::DOUBLE ELSE 0 END, 4) AS mean_tok_len
FROM t
"""


_SQL_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_filter(regexp_extract_all(text, '\S+'),
            x -> x IN ('the','a','an','and','of','to','in','is','it'))) AS BIGINT)
         AS n_stopwords,
       ROUND(CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
             THEN CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                  / len(regexp_extract_all(text, '\S+'))
             ELSE 0 END, 6) AS mean_word_len
FROM documents
"""


def _q_quality(sf_dir: str):
    from .text import quality_scores
    return _pd(quality_scores(sf_dir))


_SQL_QUALITY = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents)
SELECT doc_id,
       ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1), 6) AS ttr,
       ROUND(CAST(len(list_filter(toks,
             x -> x IN ('the','a','an','and','of','to','in','is','it'))) AS DOUBLE)
           / GREATEST(len(toks), 1), 6) AS stop_ratio,
       CAST(CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END AS BIGINT)
         AS ok_length
FROM t
"""


def _q_ann_topk(sf_dir: str):
    from .ann import brute_force_topk
    return brute_force_topk(sf_dir)


_SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings ORDER BY vec_id LIMIT 5),
sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
         FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, ROUND(sim, 4) AS sim FROM sims
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) <= 10
"""


def _q_embedding_near_dup(sf_dir: str):
    from .ann import embedding_near_dup
    return embedding_near_dup(sf_dir)


_SQL_EMB_NEAR_DUP = """
SELECT a.vec_id AS id1, b.vec_id AS id2,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
"""


def _q_fingerprints(sf_dir: str):
    from .text import fingerprints
    df = _pd(fingerprints(sf_dir))
    # winnow_min is rows-only (rolling hash); md5 is the oracle-checked part
    return df[["doc_id", "md5"]]


_SQL_FINGERPRINTS = "SELECT doc_id, md5(text) AS md5 FROM documents"


def _q_events_sessions(sf_dir: str):
    from .relational import events_sessionize
    df = _pd(events_sessionize(sf_dir))
    df["start_us"] = df.pop("start_ts").astype("datetime64[us]").astype("int64")
    df["end_us"] = df.pop("end_ts").astype("datetime64[us]").astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    df["session_id"] = df["session_id"].astype("int64")
    return _r4(df, ["sum_value"])


_SQL_EVENTS_SESSIONS = """
WITH x AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events),
y AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
FROM y GROUP BY 1, 2
"""


def _q_asof_prior_view(sf_dir: str):
    from .window import events_asof_prior_view
    return events_asof_prior_view(sf_dir)


_SQL_ASOF_PRIOR_VIEW = """
WITH v AS (SELECT user_id, ts, CAST(MAX(event_id) AS BIGINT) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       CAST(COALESCE(v.view_id, -1) AS BIGINT) AS view_id,
       CAST(COALESCE(epoch_us(p.ts) - epoch_us(v.ts), -1) AS BIGINT) AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def _q_cum_user(sf_dir: str):
    from .window import events_cum_user
    return events_cum_user(sf_dir)


_SQL_CUM_USER = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS cum_n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
"""


def _q_sliding_7d(sf_dir: str):
    from .window import events_sliding_7d
    df = events_sliding_7d(sf_dir)
    df["n"] = df["n"].astype("int64")
    return df


_SQL_SLIDING_7D = """
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1)
SELECT day, n, ROUND(AVG(n) OVER (ORDER BY day ROWS 6 PRECEDING), 4) AS ma7
FROM d
"""


def _q_value_quantiles(sf_dir: str):
    from .window import events_value_quantiles
    return events_value_quantiles(sf_dir)


_SQL_VALUE_QUANTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY 1
"""


def _q_range_join(sf_dir: str):
    from .relational import range_join_bands
    df = _pd(range_join_bands(sf_dir))
    df["n"] = df["n"].astype("int64")
    return _r4(df, ["sum_price"])


_SQL_RANGE_JOIN = """
WITH bands(lo, hi, band) AS (VALUES
  (0, 10, '[0,10)'), (10, 20, '[10,20)'), (20, 30, '[20,30)'),
  (30, 40, '[30,40)'), (40, 60, '[40,60)'))
SELECT b.band, l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
             / 100.0, 4) AS sum_price
FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY 1, 2
"""


def _q_vocab_topk(sf_dir: str):
    from .text import vocab_topk
    return vocab_topk(sf_dir)


_SQL_VOCAB_TOPK = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
      FROM documents)
WHERE token <> '' GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100
"""


def _q_price_percentiles(sf_dir: str):
    from .relational import price_percentiles
    df = price_percentiles(sf_dir)
    return _r4(df, ["value"])


_SQL_PRICE_PERCENTILES = """
SELECT 0.5 AS q, ROUND(quantile_disc(o_totalprice, 0.5), 4) AS value
FROM orders
UNION ALL
SELECT 0.9, ROUND(quantile_disc(o_totalprice, 0.9), 4) FROM orders
UNION ALL
SELECT 0.99, ROUND(quantile_disc(o_totalprice, 0.99), 4) FROM orders
"""


def _q_pair_jaccard(sf_dir: str):
    from .dedup import pair_jaccard
    return _pd(pair_jaccard(sf_dir))


_SQL_PAIR_JACCARD = """
WITH w AS (SELECT doc_id, CAST(doc_id // 2 AS BIGINT) AS pair_id,
                  list_distinct(list_filter(
                    string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')) AS words
           FROM documents)
SELECT CAST(a.doc_id AS BIGINT) AS id1, CAST(b.doc_id AS BIGINT) AS id2,
       ROUND(CASE WHEN len(list_distinct(list_concat(a.words, b.words))) = 0
             THEN 1.0
             ELSE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.words, b.words))) END, 6)
         AS jaccard
FROM w a JOIN w b ON a.pair_id = b.pair_id AND a.doc_id < b.doc_id
"""


def _q_dup_spans(sf_dir: str):
    from .dedup import dup_spans
    return _pd(dup_spans(sf_dir))


# Gaps-and-islands over duplicated 5-gram window positions: a window is
# duplicated iff its gram occurs in >=2 distinct docs; windows whose
# positions differ by <= k-1 = 4 overlap and merge into one span.
_SQL_DUP_SPANS = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+4], ' ') AS gram
  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i) t
  WHERE len(w) >= 5
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
wins AS (
  SELECT DISTINCT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
              THEN 0 ELSE 1 END AS brk
  FROM wins
),
islands AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS n_words
FROM islands GROUP BY doc_id, island
"""


def _q_dup_clusters(sf_dir: str):
    from .dedup import dup_clusters
    return _pd(dup_clusters(sf_dir))


# Connected components over "docs sharing a duplicated 5-gram" (star edges
# per gram), resolved via a recursive-CTE transitive closure + min label.
_SQL_DUP_CLUSTERS = r"""
WITH RECURSIVE
words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'),
                     x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i) t
  WHERE len(w) >= 5
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
dg AS (SELECT g.gram, g.doc_id FROM grams g JOIN dup USING (gram)),
star AS (SELECT gram, MIN(doc_id) AS hub FROM dg GROUP BY gram),
edges AS (
  SELECT s.hub AS a, d.doc_id AS b
  FROM dg d JOIN star s USING (gram) WHERE d.doc_id <> s.hub
  UNION
  SELECT d.doc_id AS a, s.hub AS b
  FROM dg d JOIN star s USING (gram) WHERE d.doc_id <> s.hub
),
nodes AS (SELECT DISTINCT doc_id FROM dg),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM nodes
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(r) AS BIGINT) AS keep_doc_id
FROM reach GROUP BY node
"""


def _q_label_centroids(sf_dir: str):
    from .ann import label_centroids
    return label_centroids(sf_dir)


_SQL_LABEL_CENTROIDS = """
WITH e AS (SELECT label, unnest(embedding) AS v,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(CAST(v AS DOUBLE)), 4) AS mean_v
FROM e GROUP BY label, i
"""


def _q_inverted_index(sf_dir: str):
    from .retrieval import inverted_index
    return _pd(inverted_index(sf_dir))


_SQL_INVERTED_INDEX = """
WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                      AS token
             FROM documents),
d AS (SELECT DISTINCT doc_id, token FROM tok WHERE token <> '')
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM d GROUP BY token
"""


def _q_bm25_topk(sf_dir: str):
    from .retrieval import bm25_topk
    return bm25_topk(sf_dir)


# Okapi BM25, k1=1.2, b=0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1);
# dl computed over ALL docs (zero-token docs contribute dl=0 to avgdl).
_SQL_BM25_TOPK = """
WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                      AS token
             FROM documents),
t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dl AS (SELECT doc_id,
              CAST(len(list_filter(string_split_regex(lower(text),
                                                      '[^a-z0-9]+'),
                                   x -> x <> '')) AS DOUBLE) AS dl
       FROM documents),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n, AVG(dl) AS avgdl
          FROM dl),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM t WHERE token IN ('spark', 'query', 'window')
       GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
          FROM t WHERE token IN ('spark', 'query', 'window') GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         SUM(ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
           AS score
  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, ROUND(score, 4) AS score
FROM scored WHERE score > 0
ORDER BY ROUND(score, 4) DESC, doc_id LIMIT 10
"""


def _q_top_parts(sf_dir: str):
    from .relational import top_parts_per_nation
    return top_parts_per_nation(sf_dir)


_SQL_TOP_PARTS = """
WITH r AS (
  SELECT n.n_name, l.l_partkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT n_name, CAST(l_partkey AS BIGINT) AS l_partkey,
       ROUND(revenue, 4) AS revenue
FROM r
QUALIFY row_number() OVER (PARTITION BY n_name
                           ORDER BY revenue DESC, l_partkey) <= 3
"""


def _q_dedup_incremental(sf_dir: str):
    from .dedup import incremental_dedup
    return _pd(incremental_dedup(sf_dir))


_SQL_DEDUP_INCREMENTAL = """
SELECT CAST(b.doc_id AS BIGINT) AS doc_id, md5(b.text) AS md5
FROM documents b
WHERE b.doc_id % 3 = 0
  AND NOT EXISTS (SELECT 1 FROM documents a
                  WHERE a.doc_id % 3 <> 0 AND md5(a.text) = md5(b.text))
"""


def _q_tfidf(sf_dir: str):
    from .text import tfidf
    return tfidf(sf_dir)


_SQL_TFIDF = """
WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                      AS token
             FROM documents),
t AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token <> '' GROUP BY 1, 2),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS dfreq FROM t GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT t.doc_id, t.token, t.tf,
       ROUND(t.tf * ln(CAST(n.n AS DOUBLE) / df.dfreq), 4) AS tfidf
FROM t JOIN df ON t.token = df.token CROSS JOIN n
"""


def _q_multimodal(sf_dir: str):
    from .multimodal import document_media_features
    return document_media_features(sf_dir)


_SQL_MULTIMODAL = """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents)
SELECT 'd' || CAST(d.doc_id AS VARCHAR) AS media_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       ROUND(x.avg_c, 4) AS mean_byte
FROM documents d
JOIN (SELECT doc_id, AVG(ascii(c)) AS avg_c FROM ch GROUP BY 1) x
  USING (doc_id)
"""


def _q_sample_det(sf_dir: str):
    from .text import sample_deterministic
    return _pd(sample_deterministic(sf_dir))


_SQL_SAMPLE_DET = """
SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
"""


def _q_corpus_diff(sf_dir: str):
    """Corpus-version diff against a deterministically derived v2 of the
    documents table (docs with doc_id%11==0 edited, %13==0 deleted, and 20
    new docs appended) — exercises added/removed/changed in one query."""
    import pandas as pd
    import ray.data

    from .dedup import corpus_diff
    from .text import read_documents

    left = read_documents(sf_dir, ["doc_id", "text"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % 13 != 0].copy()          # deletions
        ed = df["doc_id"] % 11 == 0
        df.loc[ed, "text"] = df.loc[ed, "text"] + " EDITED"
        return df

    right = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        derive, batch_format="pandas")
    new = pd.DataFrame({"doc_id": [10_000_000 + i for i in range(20)],
                        "text": [f"new doc {i}" for i in range(20)]})
    right = right.union(ray.data.from_pandas(new))
    df = _pd(corpus_diff(left, right))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_CORPUS_DIFF = """
WITH l AS (SELECT doc_id, md5(text) AS h FROM documents),
r0 AS (SELECT doc_id,
              md5(CASE WHEN doc_id % 11 = 0 THEN text || ' EDITED'
                       ELSE text END) AS h
       FROM documents WHERE doc_id % 13 <> 0),
r AS (SELECT * FROM r0
      UNION ALL
      SELECT 10000000 + i, md5('new doc ' || CAST(i AS VARCHAR))
      FROM range(20) t(i)),
j AS (SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id, l.h AS lh, r.h AS rh
      FROM l FULL OUTER JOIN r ON l.doc_id = r.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN lh IS NULL THEN 'added'
            WHEN rh IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM j WHERE lh IS NULL OR rh IS NULL OR lh <> rh
ORDER BY doc_id
"""


def _q_source_mix(sf_dir: str):
    from .text import mix_sources
    # pinned demo rates: src0 kept fully, src1 dropped, others 50%
    df = _pd(mix_sources(sf_dir, rates={"src0": 1.0, "src1": 0.0}))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_SOURCE_MIX = """
WITH u AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('9:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
           AS h
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM u
WHERE h < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.0
           ELSE 0.5 END) * 4503599627370496.0
ORDER BY doc_id
"""


def _q_train_val_test(sf_dir: str):
    from .text import train_val_test
    df = _pd(train_val_test(sf_dir))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_TRAIN_VAL_TEST = """
WITH u AS (
  SELECT doc_id,
         ('0x' || substr(md5('4:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
           / 4503599627370496.0 AS u
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM u ORDER BY doc_id
"""


# --- rows-only (non-SQL-expressible) -----------------------------------------

def _q_compress_ratio(sf_dir: str):
    """zlib compression-ratio quality signal (rows-only: no zlib in the
    oracle engine; bounds + determinism pinned in pytest)."""
    from .text import compression_ratio
    return _pd(compression_ratio(sf_dir)).sort_values("doc_id") \
        .reset_index(drop=True)


def _q_minhash(sf_dir: str):
    from .dedup import minhash_dup_pairs
    return minhash_dup_pairs(sf_dir, threshold=0.3)


def _q_simhash(sf_dir: str):
    from .dedup import simhash_dup_pairs
    return simhash_dup_pairs(sf_dir, max_hamming=12)


def _q_lang_id(sf_dir: str):
    from .text import lang_id
    return _pd(lang_id(sf_dir))


def _q_approx_users(sf_dir: str):
    """HLL approximate distinct users per event_type (mergeable sketch —
    rows-only: approximate by design; accuracy asserted in tests)."""
    import ray.data

    from .io import read_table
    from .sketch import approx_distinct
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    df = approx_distinct(ds, "event_type", "user_id")
    df["approx_distinct"] = df["approx_distinct"].round(1)
    return df


def _q_lsh_topk(sf_dir: str):
    from .ann import lsh_bucketed_topk
    df = lsh_bucketed_topk(sf_dir)
    df["sim"] = df["sim"].round(4)
    return df


def _q_approx_quantiles(sf_dir: str):
    """t-digest per-event_type quantiles (mergeable sketch — rows-only:
    approximate by design; accuracy vs exact pinned in tests)."""
    import ray.data

    from .io import read_table
    from .sketch import approx_quantiles
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    return (approx_quantiles(ds, "event_type", "value")
            .sort_values("event_type").reset_index(drop=True))


def _q_ivf_topk(sf_dir: str):
    """IVF coarse-quantized ANN (approximate by design — rows-only;
    recall vs brute force pinned in tests)."""
    from .ann import ivf_topk
    return ivf_topk(sf_dir)


def _q_pq_topk(sf_dir: str):
    """Product-quantization ADC top-k (approximate by design — rows-only;
    recall vs brute force pinned in tests)."""
    from .ann import pq_topk
    return pq_topk(sf_dir)


def _q_kmeans(sf_dir: str):
    """Distributed spherical k-means (iterative, seeded — rows-only;
    convergence/partition checks pinned in tests)."""
    from .ann import distributed_kmeans
    return distributed_kmeans(sf_dir)


def _q_embedding_near_dup_lsh(sf_dir: str):
    """Approximate (LSH-bucketed) pair mining — the 100-TB path; rows-only
    check (recall vs the exact path is pinned in tests/test_ops.py)."""
    from .ann import embedding_near_dup_lsh
    return embedding_near_dup_lsh(sf_dir)


def _q_decontaminate(sf_dir: str):
    from .decontam import decontaminate
    df = _pd(decontaminate(sf_dir))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_DECONTAMINATE = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word,
         generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), 1) AS i
  FROM documents
),
g AS (
  SELECT doc_id,
         word || ' ' || lead(word,1) OVER win || ' ' || lead(word,2) OVER win
              || ' ' || lead(word,3) OVER win AS gram
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(word,3) OVER win IS NOT NULL
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
hits AS (
  SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_hits
  FROM g JOIN bench USING (gram) WHERE g.doc_id % 37 <> 0 GROUP BY 1
)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 37 <> 0 ORDER BY d.doc_id
"""


def _q_repetition(sf_dir: str):
    from .decontam import repetition_stats
    df = _pd(repetition_stats(sf_dir))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_REPETITION = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word,
         generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), 1) AS i
  FROM documents
),
wc AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens FROM wc GROUP BY 1),
ranked AS (SELECT doc_id, word, n,
                  row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, word) AS rn
           FROM wc),
ent AS (SELECT wc.doc_id AS doc_id,
               -sum((n * 1.0 / t.n_tokens) * ln(n * 1.0 / t.n_tokens)) AS h
        FROM wc JOIN tot t USING (doc_id) GROUP BY 1),
g AS (
  SELECT doc_id,
         word || ' ' || lead(word,1) OVER win || ' ' || lead(word,2) OVER win AS gram
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(word,2) OVER win IS NOT NULL
),
gg AS (SELECT doc_id, count(*) AS total, count(DISTINCT gram) AS dist FROM g GROUP BY 1)
SELECT t.doc_id, t.n_tokens, r.word AS top_word,
       ROUND(r.n * 1.0 / t.n_tokens, 4) AS top_word_frac,
       ROUND(COALESCE(1.0 - gg.dist * 1.0 / gg.total, 0.0), 4) AS dup_3gram_frac,
       ROUND(ent.h, 4) AS word_entropy
FROM tot t JOIN ranked r ON r.doc_id = t.doc_id AND r.rn = 1
JOIN ent ON ent.doc_id = t.doc_id
LEFT JOIN gg ON gg.doc_id = t.doc_id
ORDER BY t.doc_id
"""


def _q_quality_ensemble(sf_dir: str):
    from .decontam import quality_ensemble
    return _pd(quality_ensemble(sf_dir))


_SQL_QUALITY_ENSEMBLE = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
q AS (SELECT doc_id,
             ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1), 6) AS ttr,
             ROUND(CAST(len(list_filter(toks,
                   x -> x IN ('the','a','an','and','of','to','in','is','it'))) AS DOUBLE)
                 / GREATEST(len(toks), 1), 6) AS stop_ratio,
             CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END AS ok_length
      FROM t),
w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word,
         generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), 1) AS i
  FROM documents
),
wc AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens FROM wc GROUP BY 1),
mx AS (SELECT doc_id, max(n) AS top_n FROM wc GROUP BY 1),
ent AS (SELECT wc.doc_id AS doc_id,
               -sum((n * 1.0 / t.n_tokens) * ln(n * 1.0 / t.n_tokens)) AS h
        FROM wc JOIN tot t USING (doc_id) GROUP BY 1),
g AS (
  SELECT doc_id,
         word || ' ' || lead(word,1) OVER win || ' ' || lead(word,2) OVER win AS gram
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(word,2) OVER win IS NOT NULL
),
gg AS (SELECT doc_id, count(*) AS total, count(DISTINCT gram) AS dist FROM g GROUP BY 1),
r AS (SELECT t.doc_id,
             ROUND(mx.top_n * 1.0 / t.n_tokens, 4) AS twf,
             ROUND(COALESCE(1.0 - gg.dist * 1.0 / gg.total, 0.0), 4) AS dup3,
             ROUND(ent.h, 4) AS h
      FROM tot t JOIN mx USING (doc_id) JOIN ent USING (doc_id)
      LEFT JOIN gg USING (doc_id))
SELECT q.doc_id,
       ROUND(2 * q.ttr - q.stop_ratio + 0.5 * q.ok_length
             - r.twf - r.dup3 + 0.2 * r.h, 4) AS quality_score
FROM q JOIN r USING (doc_id)
"""


def _q_heavy_hitters(sf_dir: str):
    from .io import read_table
    from .sketch import heavy_hitters
    return heavy_hitters(read_table(sf_dir, "events", ["user_id"]), "user_id")


_SQL_HEAVY_HITTERS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
HAVING count(*) >= 0.0075 * (SELECT count(*) FROM events)
ORDER BY user_id
"""


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style clustered pair mining — approximate by design
    (rows-only; recall vs the exact cosine path pinned in tests)."""
    from .ann import semantic_dedup
    return semantic_dedup(sf_dir)


def _q_stratified(sf_dir: str):
    from .relational import stratified_sample
    df = _pd(stratified_sample(sf_dir))
    return df.sort_values(["event_type", "event_id"]).reset_index(drop=True)


_SQL_STRATIFIED = """
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events) WHERE rn <= 5
ORDER BY event_type, event_id
"""


def _q_json_props(sf_dir: str):
    from .relational import events_json_props
    df = _pd(events_json_props(sf_dir))
    df["n"] = df["n"].astype("int64")
    df["sum_k"] = df["sum_k"].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


_SQL_JSON_PROPS = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1 ORDER BY 1
"""


def _q_retention(sf_dir: str):
    from .relational import events_retention
    df = _pd(events_retention(sf_dir))
    df["n_users"] = df["n_users"].astype("int64")
    return df.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)


_SQL_RETENTION = """
WITH u AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d FROM events),
     c AS (SELECT user_id, MIN(d) cohort FROM u GROUP BY 1)
SELECT CAST(c.cohort AS VARCHAR) AS cohort_day,
       CAST(date_diff('day', c.cohort, u.d) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2
"""


def _q_funnel(sf_dir: str):
    from .relational import events_funnel
    return events_funnel(sf_dir)


_SQL_FUNNEL = """
WITH s1 AS (SELECT user_id, MIN(ts) t1 FROM events
            WHERE event_type = 'click' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t1
         AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
         AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY 1)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) step_idx, 'click' step,
         CAST(COUNT(*) AS BIGINT) n_users FROM s1
  UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)
ORDER BY step_idx
"""


def _q_clean_corpus(sf_dir: str):
    from .decontam import clean_corpus
    df = _pd(clean_corpus(sf_dir))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_CLEAN_CORPUS = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS word,
         generate_subscripts(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''), 1) AS i
  FROM documents
),
g AS (
  SELECT doc_id,
         word || ' ' || lead(word,1) OVER win || ' ' || lead(word,2) OVER win
              || ' ' || lead(word,3) OVER win AS gram
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(word,3) OVER win IS NOT NULL
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0),
hits AS (SELECT g.doc_id FROM g JOIN bench USING (gram)
         WHERE g.doc_id % 37 <> 0 GROUP BY 1),
t AS (SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') toks
      FROM documents),
s0 AS (
  SELECT t.doc_id, t.text,
         CASE WHEN t.doc_id % 37 = 0 THEN 'bench'
              WHEN len(toks) < 20 THEN 'too_short'
              WHEN CAST(len(list_distinct(toks)) AS DOUBLE)
                   / GREATEST(len(toks), 1) < 0.35 THEN 'low_diversity'
              WHEN hits.doc_id IS NOT NULL THEN 'contaminated'
              ELSE 'kept' END AS st
  FROM t LEFT JOIN hits ON t.doc_id = hits.doc_id
),
k AS (SELECT doc_id,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
      FROM s0 WHERE st = 'kept')
SELECT s0.doc_id, CASE WHEN k.rn > 1 THEN 'duplicate' ELSE s0.st END AS status
FROM s0 LEFT JOIN k ON s0.doc_id = k.doc_id
ORDER BY s0.doc_id
"""


def _q_pack_sequences(sf_dir: str):
    from .text import pack_sequences
    df = _pd(pack_sequences(sf_dir))
    return df.sort_values("doc_id").reset_index(drop=True)


_SQL_PACK_SEQUENCES = r"""
WITH t AS (SELECT doc_id,
                  len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) n
           FROM documents),
p AS (SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) prefix
      FROM t)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       CAST(prefix AS BIGINT) AS prefix_tokens,
       CAST(prefix // 512 AS BIGINT) AS seq_id
FROM p ORDER BY doc_id
"""


def _q_clean_pack(sf_dir: str):
    from .text import clean_and_pack
    return _pd(clean_and_pack(sf_dir)).sort_values("doc_id") \
        .reset_index(drop=True)


# Composed oracle: the clean_corpus CTE chain re-used verbatim, its final
# SELECT folded into a `clean` CTE, then the pack window over the survivors.
_head, _tail = _SQL_CLEAN_CORPUS.rsplit("SELECT s0.doc_id", 1)
_SQL_CLEAN_PACK = (
    _head + ", clean AS (SELECT s0.doc_id"
    + _tail.replace("ORDER BY s0.doc_id", "") + "),\n"
    + r"""kept AS (SELECT doc_id FROM clean WHERE status = 'kept'),
cnt AS (SELECT d.doc_id,
               len(list_filter(regexp_split_to_array(d.text, '\s+'),
                               x -> x <> '')) AS n
        FROM documents d JOIN kept USING (doc_id)),
p AS (SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
      FROM cnt)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n AS BIGINT) AS n_tokens,
       CAST(prefix AS BIGINT) AS prefix_tokens,
       CAST(prefix // 512 AS BIGINT) AS seq_id
FROM p ORDER BY doc_id""")


def _q_chunks(sf_dir: str):
    from .text import chunk_documents
    return _pd(chunk_documents(sf_dir)).sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)


_SQL_CHUNKS = """
WITH g AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(CEIL(length(text) / 384.0) AS BIGINT)))
           AS chunk_idx
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(LEAST(512, length(text) - chunk_idx * 384) AS BIGINT)
         AS chunk_chars,
       md5(substr(text, CAST(chunk_idx * 384 + 1 AS BIGINT), 512))
         AS chunk_md5
FROM g
"""


def _q_source_cap(sf_dir: str):
    from .text import source_cap
    return _pd(source_cap(sf_dir)).sort_values(
        ["source", "doc_id"]).reset_index(drop=True)


_SQL_SOURCE_CAP = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source
FROM (SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn <= 10
"""


def _q_pii_scrub(sf_dir: str):
    from .text import pii_scrub
    return _pd(pii_scrub(sf_dir)).sort_values("doc_id").reset_index(drop=True)


# same patterns + same email-then-phone order as ops/text.PII_EMAIL/PII_PHONE
_SQL_PII_SCRUB = r"""
WITH s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
           AS t1
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_emails,
       CAST(len(regexp_extract_all(t1,
         '\+?\d{3}[-. ]\d{3}[-. ]\d{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(t1, '\+?\d{3}[-. ]\d{3}[-. ]\d{4}',
                          '<PHONE>', 'g')) AS clean_md5
FROM s1
"""



QUERIES = {
    "tpch_q1": _q_tpch_q1,
    "top_orders": _q_top_orders,
    "orders_by_nation": _q_orders_by_nation,
    "order_lineitem_revenue": _q_order_lineitem_revenue,
    "customer_order_counts": _q_customer_order_counts,
    "doc_lm_perplexity": _q_lm_perplexity,
    "doc_importance_sample": _q_importance_sample,
    "doc_ppl_buckets": _q_ppl_buckets,
    "doc_export_shards": _q_export_shards,
    "orders_building_segment": _q_orders_building_segment,
    "events_daily": _q_events_daily,
    "events_user_stats": _q_events_users,
    "events_sessionize": _q_events_sessions,
    "dedup_exact": _q_dedup_exact,
    "doc_token_stats": _q_token_stats,
    "doc_bpe_token_stats": _q_bpe_token_stats,
    "doc_quality": _q_quality,
    "doc_fingerprints": _q_fingerprints,
    "ann_cosine_topk": _q_ann_topk,
    "embedding_near_dup": _q_embedding_near_dup,
    "minhash_dup_pairs": _q_minhash,
    "simhash_dup_pairs": _q_simhash,
    "doc_lang_id": _q_lang_id,
    "ann_lsh_topk": _q_lsh_topk,
    "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
    "events_approx_users": _q_approx_users,
    "events_asof_prior_view": _q_asof_prior_view,
    "events_cum_user": _q_cum_user,
    "events_sliding_7d": _q_sliding_7d,
    "events_value_quantiles": _q_value_quantiles,
    "range_join_bands": _q_range_join,
    "doc_vocab_topk": _q_vocab_topk,
    "doc_compress_ratio": _q_compress_ratio,
    "doc_sample_det": _q_sample_det,
    "doc_corpus_diff": _q_corpus_diff,
    "doc_source_mix": _q_source_mix,
    "doc_train_val_test": _q_train_val_test,
    "doc_tfidf": _q_tfidf,
    "events_approx_quantiles": _q_approx_quantiles,
    "multimodal_features": _q_multimodal,
    "ann_ivf_topk": _q_ivf_topk,
    "ann_pq_topk": _q_pq_topk,
    "dedup_incremental": _q_dedup_incremental,
    "top_parts_per_nation": _q_top_parts,
    "doc_pair_jaccard": _q_pair_jaccard,
    "orders_price_percentiles": _q_price_percentiles,
    "embedding_kmeans": _q_kmeans,
    "doc_decontaminate": _q_decontaminate,
    "doc_repetition_stats": _q_repetition,
    "doc_quality_ensemble": _q_quality_ensemble,
    "events_heavy_hitters": _q_heavy_hitters,
    "embedding_semantic_dedup": _q_semantic_dedup,
    "events_stratified_sample": _q_stratified,
    "events_json_props": _q_json_props,
    "events_retention": _q_retention,
    "events_funnel": _q_funnel,
    "doc_clean_corpus": _q_clean_corpus,
    "doc_pack_sequences": _q_pack_sequences,
    "doc_chunks": _q_chunks,
    "doc_source_cap": _q_source_cap,
    "doc_pii_scrub": _q_pii_scrub,
    "doc_dup_spans": _q_dup_spans,
    "doc_dup_clusters": _q_dup_clusters,
    "doc_inverted_index": _q_inverted_index,
    "doc_bm25_topk": _q_bm25_topk,
    "doc_clean_pack": _q_clean_pack,
    "embedding_label_centroids": _q_label_centroids,
}

ORACLES = {
    "tpch_q1": _SQL_TPCH_Q1,
    "top_orders": _SQL_TOP_ORDERS,
    "orders_by_nation": _SQL_ORDERS_BY_NATION,
    "order_lineitem_revenue": _SQL_ORDER_LINEITEM_REVENUE,
    "customer_order_counts": _SQL_CUSTOMER_ORDER_COUNTS,
    "doc_lm_perplexity": _SQL_LM_PERPLEXITY,
    "doc_export_shards": _SQL_EXPORT_SHARDS,
    "orders_building_segment": _SQL_ORDERS_BUILDING_SEGMENT,
    "events_daily": _SQL_EVENTS_DAILY,
    "events_user_stats": _SQL_EVENTS_USERS,
    "events_sessionize": _SQL_EVENTS_SESSIONS,
    "dedup_exact": _SQL_DEDUP_EXACT,
    "doc_token_stats": _SQL_TOKEN_STATS,
    "doc_bpe_token_stats": _SQL_BPE_TOKEN_STATS,
    "doc_quality": _SQL_QUALITY,
    "doc_fingerprints": _SQL_FINGERPRINTS,
    "ann_cosine_topk": _SQL_ANN_TOPK,
    "embedding_near_dup": _SQL_EMB_NEAR_DUP,
    "events_asof_prior_view": _SQL_ASOF_PRIOR_VIEW,
    "events_cum_user": _SQL_CUM_USER,
    "events_sliding_7d": _SQL_SLIDING_7D,
    "events_value_quantiles": _SQL_VALUE_QUANTILES,
    "range_join_bands": _SQL_RANGE_JOIN,
    "doc_vocab_topk": _SQL_VOCAB_TOPK,
    "doc_sample_det": _SQL_SAMPLE_DET,
    "doc_corpus_diff": _SQL_CORPUS_DIFF,
    "doc_source_mix": _SQL_SOURCE_MIX,
    "doc_train_val_test": _SQL_TRAIN_VAL_TEST,
    "doc_tfidf": _SQL_TFIDF,
    "multimodal_features": _SQL_MULTIMODAL,
    "dedup_incremental": _SQL_DEDUP_INCREMENTAL,
    "top_parts_per_nation": _SQL_TOP_PARTS,
    "doc_pair_jaccard": _SQL_PAIR_JACCARD,
    "orders_price_percentiles": _SQL_PRICE_PERCENTILES,
    "doc_decontaminate": _SQL_DECONTAMINATE,
    "doc_repetition_stats": _SQL_REPETITION,
    "doc_quality_ensemble": _SQL_QUALITY_ENSEMBLE,
    "events_heavy_hitters": _SQL_HEAVY_HITTERS,
    "events_stratified_sample": _SQL_STRATIFIED,
    "events_json_props": _SQL_JSON_PROPS,
    "events_retention": _SQL_RETENTION,
    "events_funnel": _SQL_FUNNEL,
    "doc_clean_corpus": _SQL_CLEAN_CORPUS,
    "doc_pack_sequences": _SQL_PACK_SEQUENCES,
    "doc_chunks": _SQL_CHUNKS,
    "doc_source_cap": _SQL_SOURCE_CAP,
    "doc_pii_scrub": _SQL_PII_SCRUB,
    "doc_dup_spans": _SQL_DUP_SPANS,
    "doc_dup_clusters": _SQL_DUP_CLUSTERS,
    "doc_inverted_index": _SQL_INVERTED_INDEX,
    "doc_bm25_topk": _SQL_BM25_TOPK,
    "doc_clean_pack": _SQL_CLEAN_PACK,
    "embedding_label_centroids": _SQL_LABEL_CENTROIDS,
    # minhash_dup_pairs / simhash_dup_pairs / doc_lang_id / ann_lsh_topk:
    # rows-only (sketch/heuristic operators)
}
