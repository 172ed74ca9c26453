"""Bloom semi-join semantics (ops/relational.bloom_semi_join +
ops/dedup int-key Bloom primitives): zero false negatives, exactness after
the verify join even when the bitmap is saturated with false positives."""

import numpy as np
import pandas as pd
import pytest


def test_int_bloom_no_false_negatives(ray_session):
    import ray.data

    from stats_ray.ops.dedup import (bloom_build_int,
                                     bloom_maybe_contains_int)

    keys = np.arange(0, 5000, 7, dtype=np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys}))
    bitmap = bloom_build_int(ds, "k", n_bits=1 << 16)
    assert bloom_maybe_contains_int(bitmap, keys).all()


def test_int_bloom_filters_most_nonmembers(ray_session):
    import ray.data

    from stats_ray.ops.dedup import (bloom_build_int,
                                     bloom_maybe_contains_int)

    members = np.arange(1000, dtype=np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": members}))
    bitmap = bloom_build_int(ds, "k", n_bits=1 << 16)  # ~65 bits/key
    probe = np.arange(100_000, 110_000, dtype=np.int64)
    fp_rate = bloom_maybe_contains_int(bitmap, probe).mean()
    assert fp_rate < 0.05


def test_bloom_semi_join_exact_under_saturation(ray_session):
    """With a SATURATED bitmap (every probe is a false positive) the verify
    join must still produce the exact semi-join — the Bloom is only ever an
    optimization."""
    import ray.data

    from stats_ray.ops import relational as rel

    rng = np.random.default_rng(3)
    fact = pd.DataFrame({"k": rng.integers(0, 50, 400),
                         "v": rng.normal(size=400)})
    keyset = pd.DataFrame({"k": np.arange(0, 50, 5, dtype=np.int64)})

    out = rel.bloom_semi_join(
        ray.data.from_pandas(fact), ray.data.from_pandas(keyset),
        on="k", fact_cols=["v"],
        expected_keys=1,  # minimum bitmap; FPs guaranteed harmless anyway
        n_buckets=8).to_pandas()
    want = fact[fact["k"].isin(set(keyset["k"]))]
    assert len(out) == len(want)
    assert np.isclose(sorted(out["v"]), sorted(want["v"])).all()
