"""Property tests for the shared bucketed hash exchange
(stats_ray/exchange.py) — the substrate every high-cardinality grouped
operator runs on: bucketed_agg must match a local pandas groupby exactly
(including single-hot-key skew and empty input), and group completeness
must hold (no key split across buckets)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _agg_via_exchange(df: pd.DataFrame, keys, spec, nbuckets=8):
    import ray.data

    from stats_ray.exchange import bucketed_agg
    ds = ray.data.from_pandas(df)
    return bucketed_agg(ds, keys, spec, nbuckets=nbuckets).to_pandas()


def _norm(df: pd.DataFrame, keys) -> pd.DataFrame:
    return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "hot"]),
              st.integers(-3, 3),
              st.integers(-1000, 1000)),
    min_size=1, max_size=200))
def test_bucketed_agg_matches_pandas(ray_session, rows):
    df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
    df["v"] = df["v"].astype("int64")
    got = _agg_via_exchange(df, ["k1", "k2"], {"s": ("v", "sum"),
                                               "m": ("v", "max"),
                                               "n": ("v", "size")})
    want = df.groupby(["k1", "k2"], as_index=False).agg(
        s=("v", "sum"), m=("v", "max"), n=("v", "size"))
    pd.testing.assert_frame_equal(_norm(got, ["k1", "k2"]),
                                  _norm(want, ["k1", "k2"]),
                                  check_dtype=False)


def test_bucketed_agg_single_hot_key(ray_session):
    """Pathological skew: every row the same key — one bucket holds all of
    it (documented contract: skew bounded by the KEY, partial combine
    upstream is the pressure valve) but the result must still be exact."""
    df = pd.DataFrame({"k": ["hot"] * 5000,
                       "v": np.arange(5000, dtype="int64")})
    got = _agg_via_exchange(df, ["k"], {"s": ("v", "sum")})
    assert len(got) == 1
    assert int(got["s"].iloc[0]) == int(df["v"].sum())


def test_bucketed_group_map_groups_complete(ray_session):
    """Every key's rows arrive in ONE kernel invocation (group
    completeness is what makes per-bucket kernels correct)."""
    import ray.data

    from stats_ray.exchange import bucketed_group_map
    df = pd.DataFrame({"k": np.repeat(np.arange(50), 7),
                       "v": np.arange(350, dtype="int64")})

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        sizes = part.groupby("k", as_index=False).agg(n=("v", "size"))
        return sizes

    out = bucketed_group_map(ray.data.from_pandas(df), ["k"], kernel,
                             nbuckets=8).to_pandas()
    assert len(out) == 50                      # each key exactly once
    assert (out["n"] == 7).all()               # with all its rows


def test_bucketed_agg_float_sum_deterministic(ray_session):
    """The row-hash presort makes distributed float sums a pure function
    of the data: two runs over differently-ordered input agree bit-for-bit."""
    rng = np.random.RandomState(7)
    df = pd.DataFrame({"k": rng.randint(0, 20, 3000).astype(str),
                       "v": rng.normal(size=3000)})
    a = _norm(_agg_via_exchange(df, ["k"], {"s": ("v", "sum")}), ["k"])
    shuffled = df.sample(frac=1.0, random_state=13).reset_index(drop=True)
    b = _norm(_agg_via_exchange(shuffled, ["k"], {"s": ("v", "sum")}), ["k"])
    assert (a["s"].to_numpy() == b["s"].to_numpy()).all()  # bitwise


def test_per_group_empty_schema_contract(ray_session):
    """`empty=` shields kernels that can't handle a zero-row frame: the
    kernel is never invoked on empty input and the dataset still carries
    the declared output schema."""
    import ray.data

    from stats_ray.exchange import bucketed_group_map

    df = pd.DataFrame({"k": pd.Series(dtype="int64"),
                       "v": pd.Series(dtype="float64")})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # positional indexing — would raise on a zero-row frame
        return pd.DataFrame({"k": [int(g["k"].iloc[0])],
                             "top": [float(g["v"].max())]})

    empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                          "top": pd.Series(dtype="float64")})
    # zero-row input: must not crash in the kernel (Ray may probe map_groups
    # fns with an empty frame; without empty= this kernel would IndexError)
    out = bucketed_group_map(ray.data.from_pandas(df), ["k"], kernel,
                             per_group=True, empty=empty).to_pandas()
    assert len(out) == 0

    # and on non-empty input the kernel path is unchanged
    df2 = pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 3.0, 2.0]})
    out2 = (bucketed_group_map(ray.data.from_pandas(df2), ["k"], kernel,
                               per_group=True, empty=empty)
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out2["top"]) == [3.0, 2.0]


def test_salted_agg_hot_key_exact_and_deterministic(ray_session):
    """salt=K splits a pathological hot key across K first-level groups and
    re-combines exactly: same result as the unsalted path, bitwise across
    runs, for both string and named-agg specs (count re-merges as sum)."""
    import ray.data

    from stats_ray.exchange import bucketed_agg

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": ["hot"] * 20000 + list(rng.randint(0, 50, 3000).astype(str)),
        "v": rng.normal(size=23000),
        "n": np.ones(23000, dtype="int64"),
    })

    def norm(d):
        return d.sort_values("k").reset_index(drop=True)

    spec = {"s": ("v", "sum"), "mx": ("v", "max"), "cnt": ("n", "sum")}
    plain = norm(bucketed_agg(ray.data.from_pandas(df), ["k"], spec)
                 .to_pandas())
    salted = norm(bucketed_agg(ray.data.from_pandas(df), ["k"], spec,
                               salt=8).to_pandas())
    assert list(plain["k"]) == list(salted["k"])
    assert (plain["cnt"].to_numpy() == salted["cnt"].to_numpy()).all()
    assert (plain["mx"].to_numpy() == salted["mx"].to_numpy()).all()
    # float sums: salted regroups the addends -> ulp tolerance vs plain,
    # but the salted path must be deterministic against itself (bitwise)
    np.testing.assert_allclose(plain["s"], salted["s"], rtol=1e-9)
    salted2 = norm(bucketed_agg(ray.data.from_pandas(df), ["k"], spec,
                                salt=8).to_pandas())
    assert (salted["s"].to_numpy() == salted2["s"].to_numpy()).all()

    # mean is not mergeable -> clear error
    with pytest.raises(ValueError):
        bucketed_agg(ray.data.from_pandas(df), ["k"], "mean", salt=4)
