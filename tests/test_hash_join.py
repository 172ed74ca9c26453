"""Unit semantics for the generic co-partitioned hash join
(ops/relational.hash_join): planted cases the sf-table oracle comparison
can't isolate — duplicate keys on both sides (fan-out product), left-join
null padding, a skewed hot key, and mixed column types."""

import numpy as np
import pandas as pd
import pytest


def _join(left, right, **kw):
    import ray.data

    from stats_ray.ops.relational import hash_join

    return hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     **kw).to_pandas()


def test_inner_join_duplicates_product(ray_session):
    """Duplicate keys on both sides fan out to the full per-key product,
    exactly like SQL INNER JOIN."""
    left = pd.DataFrame({"k": [1, 1, 2, 3], "lv": [10, 11, 20, 30]})
    right = pd.DataFrame({"k": [1, 1, 2, 9], "rv": ["a", "b", "c", "z"]})
    out = _join(left, right, on="k", left_cols=["lv"], right_cols=["rv"],
                how="inner", n_buckets=4)
    got = sorted(map(tuple, out[["k", "lv", "rv"]].itertuples(index=False)))
    want = sorted([(1, 10, "a"), (1, 10, "b"), (1, 11, "a"), (1, 11, "b"),
                   (2, 20, "c")])
    assert got == want


def test_left_join_null_padding(ray_session):
    """Unmatched left rows survive with null right columns; unmatched right
    rows are dropped."""
    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2], "rv": [2.5]})
    out = _join(left, right, on="k", left_cols=["lv"], right_cols=["rv"],
                how="left", n_buckets=4).sort_values("k")
    assert out["k"].tolist() == [1, 2, 3]
    rv = out["rv"].tolist()
    assert np.isnan(rv[0]) and rv[1] == 2.5 and np.isnan(rv[2])


def test_skewed_hot_key_and_bucket_spread(ray_session):
    """A hot key lands in ONE bucket (the documented skew contract) but the
    result is still exact; other keys spread across buckets."""
    rng = np.random.default_rng(7)
    hot = pd.DataFrame({"k": np.full(500, 42), "lv": np.arange(500)})
    cold = pd.DataFrame({"k": rng.integers(100, 200, 300),
                         "lv": np.arange(300)})
    left = pd.concat([hot, cold], ignore_index=True)
    right = pd.DataFrame({"k": [42, 150], "rv": [1.0, 2.0]})
    out = _join(left, right, on="k", left_cols=["lv"], right_cols=["rv"],
                how="inner", n_buckets=8)
    assert (out["k"] == 42).sum() == 500
    n150 = int((cold["k"] == 150).sum())
    assert (out["k"] == 150).sum() == n150


def test_unsupported_how_raises(ray_session):
    import ray.data

    from stats_ray.ops.relational import hash_join

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    with pytest.raises(ValueError, match="unsupported how"):
        hash_join(ds, ds, on="k", left_cols=["v"], right_cols=["v"],
                  how="outer")


def test_hash_join_rejects_non_integer_and_null_keys(ray_session):
    """The integer-key contract fails loudly: string keys at planning
    time, nullable keys at bucketing time (a NaN->uint64 cast would
    mis-bucket silently)."""
    import pandas as pd
    import pytest
    import ray.data

    from stats_ray.ops.relational import hash_join

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a", "b"], "x": [1, 2]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a", "b"], "y": [3, 4]}))
    with pytest.raises(ValueError, match="integer column"):
        hash_join(left, right, on="k", left_cols=["x"], right_cols=["y"])

    nl = ray.data.from_pandas(pd.DataFrame(
        {"k": pd.array([1, None], dtype="Int64"), "x": [1, 2]}))
    nr = ray.data.from_pandas(pd.DataFrame(
        {"k": pd.array([1, 2], dtype="Int64"), "y": [3, 4]}))
    with pytest.raises(Exception, match="nulls|integer"):
        hash_join(nl, nr, on="k", left_cols=["x"],
                  right_cols=["y"]).to_pandas()


def test_bloom_int_path_rejects_nullable_keys():
    import numpy as np
    import pytest

    from stats_ray.ops.dedup import _bloom_positions_int
    with pytest.raises(ValueError, match="integer-typed"):
        _bloom_positions_int(np.array([1.0, np.nan]), 1 << 20)
