"""Property tests for the mergeable t-digest primitives (pure NumPy —
no Spark session): weight conservation, ordering, quantile sanity and
rank accuracy under arbitrary value distributions, including the
two-level (partition digests → merged digest) path the operator runs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_log_analyzer_mcp_spark.operators.analytics import (
    _tdigest_compress,
    _tdigest_quantile,
)

values = st.lists(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=2000,
)


@settings(max_examples=60, deadline=None)
@given(values)
def test_compress_conserves_weight_and_bounds(xs):
    v = np.asarray(xs, dtype=np.float64)
    m, w = _tdigest_compress(v, np.ones_like(v))
    assert abs(float(w.sum()) - len(v)) < 1e-6
    assert np.all(np.diff(m) >= 0)  # sorted centroids
    assert m[0] >= v.min() - 1e-9 and m[-1] <= v.max() + 1e-9
    # centroid count is O(delta), never input-sized for big inputs
    assert len(m) <= max(2 * 200, 64)


@settings(max_examples=60, deadline=None)
@given(values)
def test_quantile_monotone_and_rank_accurate(xs):
    v = np.asarray(xs, dtype=np.float64)
    m, w = _tdigest_compress(v, np.ones_like(v))
    qs = [0.01, 0.1, 0.5, 0.9, 0.95, 0.99]
    est = [_tdigest_quantile(m, w, q) for q in qs]
    assert all(a <= b + 1e-9 for a, b in zip(est, est[1:]))  # monotone
    n = len(v)
    sv = np.sort(v)
    for q, e in zip(qs, est):
        assert sv[0] - 1e-9 <= e <= sv[-1] + 1e-9
        # rank-space accuracy: the estimate's empirical CDF position
        # sits within eps of q (generous envelope; ties in the data
        # make the CDF step so compare against the interval)
        lo = float(np.searchsorted(sv, e, side="left")) / n
        hi = float(np.searchsorted(sv, e, side="right")) / n
        eps = max(4.0 / n, 0.05)
        assert lo - eps <= q <= hi + eps


@settings(max_examples=30, deadline=None)
@given(values, st.integers(min_value=2, max_value=8))
def test_two_level_merge_matches_single_level_rank(xs, parts):
    """Partition → compress → concat → merge (the operator's real
    topology) must stay rank-accurate, like a single-level digest."""
    v = np.asarray(xs, dtype=np.float64)
    chunks = np.array_split(v, parts)
    ms, ws = [], []
    for c in chunks:
        if len(c):
            m, w = _tdigest_compress(c, np.ones_like(c))
            ms.append(m)
            ws.append(w)
    m, w = _tdigest_compress(np.concatenate(ms), np.concatenate(ws))
    assert abs(float(w.sum()) - len(v)) < 1e-6
    n = len(v)
    sv = np.sort(v)
    for q in (0.5, 0.95):
        e = _tdigest_quantile(m, w, q)
        lo = float(np.searchsorted(sv, e, side="left")) / n
        hi = float(np.searchsorted(sv, e, side="right")) / n
        eps = max(4.0 / n, 0.05)
        assert lo - eps <= q <= hi + eps
