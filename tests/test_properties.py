"""Property-based tests (hypothesis) for the pure kernels: the token
codec, JS number formatting, and the t-digest sketch. These pin invariants
no fixture enumeration can cover."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# --- token codec -------------------------------------------------------------

@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_token_roundtrip(s):
    """encode_str -> decode_column is the identity for any unicode text."""
    import pyarrow as pa

    from stats_ray.tokens import decode_column, encode_strings

    arr = encode_strings([s])
    assert decode_column(arr) == [s]


# --- JS toFixed / round ------------------------------------------------------

@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
       st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_tofixed_width_and_value(v, d):
    """toFixed output has exactly d decimals and parses back within half an
    ulp of the last printed digit."""
    from stats_ray.functions.jsfmt import js_tofixed

    s = js_tofixed(v, d)
    if d == 0:
        assert "." not in s
    else:
        assert len(s.split(".")[1]) == d
    assert abs(float(s) - v) <= 0.5 * 10 ** -d + 1e-9


@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_js_round_idempotent(v):
    from stats_ray.functions.jsfmt import js_round

    r = js_round(v, 1e4)
    assert js_round(r, 1e4) == r
    assert abs(r - v) <= 0.5 / 1e4 + abs(v) * 1e-12


# --- t-digest ----------------------------------------------------------------

@given(st.lists(st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
                min_size=2, max_size=400))
@settings(max_examples=100, deadline=None)
def test_tdigest_bounds_and_monotone(vals):
    """Quantile estimates stay within [min, max] and are monotone in q."""
    from stats_ray.ops.sketch import TDigest

    d = TDigest().add_many(np.asarray(vals))
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    est = [d.quantile(q) for q in qs]
    lo, hi = min(vals), max(vals)
    for e in est:
        assert lo - 1e-9 <= e <= hi + 1e-9
        assert not math.isnan(e)
    assert all(a <= b + 1e-9 for a, b in zip(est, est[1:]))


@given(st.lists(st.floats(min_value=0, max_value=1e4, allow_nan=False),
                min_size=4, max_size=400),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=60, deadline=None)
def test_tdigest_merge_close_to_whole(vals, k):
    """Sketching shards then merging tracks the single-sketch median."""
    from stats_ray.ops.sketch import TDigest

    arr = np.asarray(vals)
    whole = TDigest().add_many(arr)
    merged = TDigest()
    for chunk in np.array_split(arr, k):
        if len(chunk):
            merged.merge(TDigest().add_many(chunk))
    spread = (max(vals) - min(vals)) or 1.0
    assert abs(whole.quantile(0.5) - merged.quantile(0.5)) <= 0.25 * spread
