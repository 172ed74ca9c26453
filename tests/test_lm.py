"""Semantics of the unigram-LM scoring operators (ops/lm.py): smoothing
math on a tiny hand-computed corpus, DSIR tilt direction, zero-token-doc
skipping."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_corpus(ray_session, tmp_path_factory):
    """6 docs; ids divisible by 37 (0 here) form the target slice.
    doc 0 (target) is pure 'alpha'; others mix 'alpha' and 'beta'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("lmcorpus")
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        "text": ["alpha alpha alpha", "beta beta", "alpha beta",
                 "beta beta beta beta", "alpha", "   "],
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
        "n_chars": pa.array([17, 9, 10, 19, 5, 3], type=pa.int64()),
    })
    pq.write_table(docs, f"{d}/documents.parquet")
    return str(d)


def test_lm_perplexity_matches_hand_math(tiny_corpus):
    from stats_ray.ops.lm import lm_perplexity

    out = (lm_perplexity(tiny_corpus).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # whitespace-only doc 5 is skipped (zero tokens)
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]

    # corpus: alpha x5, beta x7 -> N_b=12, V=2; target (doc 0): alpha x3,
    # N_t=3. add-one over shared vocab:
    p_b = {"alpha": 6 / 15, "beta": 8 / 15}
    p_t = {"alpha": 4 / 6, "beta": 1 / 6}
    row0 = out.iloc[0]
    want_nll = -math.log(p_b["alpha"])
    assert row0["n_tokens"] == 3
    assert abs(row0["avg_nll"] - want_nll) < 1e-12
    assert abs(row0["ppl"] - math.exp(want_nll)) < 1e-12

    # DSIR tilt: the all-alpha doc must score HIGHER than the all-beta doc
    # (target slice is alpha-heavy)
    lr = dict(zip(out["doc_id"], out["dsir_logratio"]))
    assert lr[0] > lr[3]
    want_lr0 = math.log(p_t["alpha"]) - math.log(p_b["alpha"])
    assert abs(lr[0] - want_lr0) < 1e-12


def test_unigram_counts_one_pass(tiny_corpus):
    from stats_ray.ops.lm import unigram_counts

    c = unigram_counts(tiny_corpus).sort_values("token")
    assert c["token"].tolist() == ["alpha", "beta"]
    assert c["c_b"].tolist() == [5, 7]
    assert c["c_t"].tolist() == [3, 0]


def test_importance_sample_gumbel_topk(ray_session):
    """Gumbel-top-k importance sampling: deterministic, exact vs a local
    reference (same libm), and tilted toward high-DSIR docs."""
    import numpy as np

    from stats_ray.ops.lm import importance_sample, lm_perplexity

    SF = "/root/testdata/sf0.001"
    a = importance_sample(SF, k=20, seed=7)
    b = importance_sample(SF, k=20, seed=7)
    assert a.equals(b)                        # re-run = identical sample
    assert len(a) == 20 and a["doc_id"].is_unique

    # exact agreement with a driver-side reference over the full scores
    scores = lm_perplexity(SF).to_pandas()
    from stats_ray.ops.lm import _gumbel_key
    key = (scores["dsir_logratio"].to_numpy()
           + _gumbel_key(scores["doc_id"].to_numpy(), 7))
    ref = (pd.DataFrame({"doc_id": scores["doc_id"].astype("int64"),
                         "key": key})
           .sort_values(["key", "doc_id"], ascending=[False, True])
           .head(20))
    assert list(a["doc_id"]) == list(ref["doc_id"])

    # different seed = different sample; the selection is importance-tilted
    c = importance_sample(SF, k=20, seed=8)
    assert set(c["doc_id"]) != set(a["doc_id"])
    mean_all = scores["dsir_logratio"].mean()
    assert a["dsir_logratio"].mean() > mean_all   # tilted toward target


def test_ppl_buckets_head_middle_tail(ray_session):
    """CCNet-style bucketing: every doc lands in exactly one bucket, the
    t-digest thresholds track the exact tertiles (within digest tolerance),
    and head has the lowest (best) mean nll."""
    import numpy as np

    from stats_ray.ops.lm import lm_perplexity, ppl_buckets

    SF = "/root/testdata/sf0.001"
    out = ppl_buckets(SF)
    assert list(out["bucket"]) == ["head", "middle", "tail"]
    scores = lm_perplexity(SF).to_pandas()
    assert out["n_docs"].sum() == len(scores)
    # digest thresholds within tolerance of exact tertiles
    exact = np.quantile(scores["avg_nll"].to_numpy(), [1 / 3, 2 / 3])
    spread = scores["avg_nll"].max() - scores["avg_nll"].min()
    assert abs(out["hi"].iloc[0] - exact[0]) < 0.05 * spread
    assert abs(out["hi"].iloc[1] - exact[1]) < 0.05 * spread
    # buckets are ordered by quality: head nll < middle nll < tail nll
    assert (out["mean_nll"].iloc[0] < out["mean_nll"].iloc[1]
            < out["mean_nll"].iloc[2])
    # roughly balanced tertiles
    assert (out["n_docs"] > 0.2 * len(scores)).all()
