"""Golden-vector tests for the single-node oracle.

Every vector and expected output below is pinned by the reference repo's own
unit tests (citations per case) — see FIXTURES.md §3. The oracle is the
source of truth for the Spark kernel, so these must hold exactly.
"""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.oracle import (
    correct_gaps,
    correct_jumps,
    detect_gaps,
    detect_jumps,
    detect_outliers,
    global_mad_correct,
    non_zero_average,
    process_series,
)
from series_correction_project_updated_spark.oracle.correction import _gap_fill_times


def _df(values, times=None):
    n = len(values)
    return pd.DataFrame({"t": times if times is not None else np.arange(n, dtype=float),
                         "v": np.asarray(values, dtype=float)})


# --- outliers (reference scripts/tests/test_processor.py) -----------------

def test_outlier_basic():  # test_processor.py:10-17
    vals = [1.0, 1.1, 0.9, 1.0, 100.0, 1.2, 0.8, 1.0, 1.1, 0.9]
    assert detect_outliers(np.array(vals), window_size=5, threshold=3.0) == [4]


def test_outlier_none():  # test_processor.py:19-24
    vals = [1.0, 1.1, 0.9, 1.0, 1.2, 0.8, 1.0, 1.1, 0.9]
    assert detect_outliers(np.array(vals), window_size=5, threshold=3.0) == []


def test_outlier_short_series():  # test_processor.py:27-33
    assert detect_outliers(np.array([1.0, 2.0, 3.0]), window_size=5) == []


def test_outlier_with_nans():  # test_processor.py:36-44
    vals = [1.0, 1.1, np.nan, 1.0, 100.0, 1.2, np.nan, 1.0, 1.1, 0.9]
    assert detect_outliers(np.array(vals), window_size=3, threshold=3.0) == [4]


def test_outlier_zero_mad():  # test_processor.py:47-53
    vals = [1.0, 1.0, 1.0, 100.0, 1.0, 1.0, 1.0]
    assert detect_outliers(np.array(vals), window_size=5, threshold=3.0) == [3]


# --- jumps -----------------------------------------------------------------

def test_jump_detect():  # scripts/tests/test_processor_jumps.py:25-31
    vals = [1.0, 1.0, 1.1, 0.9, 1.0, 10.0, 10.1, 9.9, 10.0, 10.0]
    assert detect_jumps(np.array(vals), window_size=3, threshold=3.0) == [5]


def test_jump_correct_basic():  # test_processor.py:80-90
    df = _df([1.0] * 5 + [10.0] * 5)
    out = correct_jumps(df, [5], "v", window_size=2)
    np.testing.assert_allclose(out["v"].to_numpy(), np.ones(10))


def test_jump_correct_multi_cumsum():  # test_processor.py:93-128
    df = _df([1.0] * 5 + [10.0] * 5 + [5.0] * 5)
    out = correct_jumps(df, [5, 10], "v", window_size=2)
    np.testing.assert_allclose(out["v"].to_numpy(), np.ones(15))


def test_jump_boundary_filter():  # test_processor.py:131-138
    vals = np.arange(10, dtype=float)
    df = _df(vals)
    out = correct_jumps(df, [0, 1, 2, 7, 8, 9], "v", window_size=3)
    np.testing.assert_array_equal(out["v"].to_numpy(), vals)


def test_jump_with_nans():  # test_processor.py:141-151
    vals = [1.0, np.nan, 1.0, 10.0, np.nan, 10.0, 10.0, 10.0]
    df = _df(vals)
    out = correct_jumps(df, [3], "v", window_size=3)
    expected = [1.0, np.nan, 1.0, 1.0, np.nan, 1.0, 1.0, 1.0]
    np.testing.assert_allclose(out["v"].to_numpy(), expected)


# --- gaps ------------------------------------------------------------------

def test_gap_detect():  # test_processor.py:154-167
    times = np.array([1.0, 2.0, 3.0, 10.0, 11.0, 12.0])
    assert detect_gaps(times, threshold_factor=3.0) == [3]


def test_gap_zero_median():  # test_processor.py:190-199
    assert detect_gaps(np.array([1.0, 1.0, 1.0, 1.0, 2.0])) == []


def test_gap_fill_count():  # test_discontinuity_utils.py:72-87
    # step 10, t_before=10, t_after=40 -> 2 missing; t_after=20 -> none
    times = np.array([0.0, 10.0, 40.0])
    new = _gap_fill_times(times, [2])
    np.testing.assert_allclose(new, [20.0, 30.0])
    assert _gap_fill_times(np.array([0.0, 10.0, 20.0]), [2]) is None


def test_gap_fill_times_linspace():  # test_discontinuity_utils.py:104-116
    times = np.array([0.0, 10.0, 50.0])
    new = _gap_fill_times(times, [2])
    np.testing.assert_allclose(new, [20.0, 30.0, 40.0])


def test_gap_correct_interpolates():
    df = _df([1.0, 2.0, 5.0], times=[0.0, 10.0, 50.0])
    out = correct_gaps(df, [2], "t", ["v"], method="time")
    np.testing.assert_allclose(out["t"].to_numpy(), [0, 10, 20, 30, 40, 50])
    np.testing.assert_allclose(out["v"].to_numpy(), [1.0, 2.0, 2.75, 3.5, 4.25, 5.0])


# --- global MAD variant ------------------------------------------------------

def test_global_mad():  # scripts/tests/test_updated_processor.py:31-47
    vals = np.array([1.0, 1.1, np.nan, 1.0, 100.0, 1.2, np.nan, 1.0, 1.1, 0.9])
    corrected, outliers = global_mad_correct(vals, threshold=3.0)
    assert outliers[4] and outliers.sum() == 1
    assert corrected[4] == pytest.approx(1.05)
    assert np.isnan(corrected[2]) and np.isnan(corrected[6])


# --- non-zero average --------------------------------------------------------

def test_non_zero_average():  # test_apply_refined_corrections.py:19-76
    assert non_zero_average([1, 0, np.nan, 3]) == pytest.approx(2.0)
    assert non_zero_average([0, 0]) == 0.0
    assert non_zero_average([]) == 0.0
    assert non_zero_average(["1", "a", "3"]) == pytest.approx(2.0)


# --- full pipeline -----------------------------------------------------------

def test_process_series_end_to_end():
    # gap at t in (3,10), outlier at idx 4 pre-gap-fill, level jump later
    times = np.array([1, 2, 3, 10, 11, 12, 13, 14, 15, 16], dtype=float)
    vals = np.array([1.0, 1.1, 0.9, 1.0, 1.05, 9.0, 9.1, 8.9, 9.0, 9.05])
    df = _df(vals, times)
    out = process_series(df, "t", "v", {"window_size": 3})
    # gap filled: 6 extra points between 3 and 10
    assert len(out) == 16
    assert out["t"].is_monotonic_increasing
    assert out["v"].notna().all()


def test_correct_gaps_fast_path_equals_pandas_path():
    """The numpy gap-fill fast path (2-col float64 frame, linear/time
    method) must be bit-identical to the general pandas path — adding a
    third column forces the latter on the same data. Covers duplicate
    timestamps (sort ties) and NaN values (interpolation + edge fill)."""
    import numpy as np
    import pandas as pd

    from series_correction_project_updated_spark.oracle import correction as oracle

    rng = np.random.default_rng(9)
    checked = 0
    for trial in range(120):
        n = int(rng.integers(3, 200))
        t = np.sort(np.cumsum(rng.choice([5.0, 5.0, 5.0, 40.0, 125.0], size=n)))
        if trial % 7 == 0:
            t[int(rng.integers(1, n))] = t[int(rng.integers(1, n))]
            t = np.sort(t)
        v = np.cumsum(rng.normal(0, 1, n)).round(3)
        v[rng.random(n) < 0.08] = np.nan
        gaps = oracle.detect_gaps(t, 1.5)
        if not gaps:
            continue
        fast = oracle.correct_gaps(pd.DataFrame({"t": t, "value": v}), gaps, "t", ["value"])
        slow = oracle.correct_gaps(
            pd.DataFrame({"t": t, "value": v, "extra": np.arange(n, dtype=np.int64)}),
            gaps, "t", ["value"],
        )
        assert len(fast) == len(slow)
        assert np.array_equal(fast["t"].to_numpy(), slow["t"].to_numpy())
        assert np.array_equal(
            fast["value"].to_numpy(), slow["value"].to_numpy(), equal_nan=True
        )
        checked += 1
    assert checked > 50


def test_steps_knob_skips_stages():
    """config['steps'] genuinely skips disabled stages: gap-only output is
    bit-identical to the full pipeline on data where outliers/jumps never
    trigger, stats rows mark skipped stages, unknown names raise."""
    import numpy as np
    import pandas as pd

    from series_correction_project_updated_spark.oracle import correction as oracle

    rng = np.random.default_rng(11)
    t = np.cumsum(rng.choice([5.0, 5.0, 5.0, 60.0], size=120))
    v = np.cumsum(rng.normal(0, 0.01, 120)).round(4)
    df = pd.DataFrame({"t": t, "value": v})

    full, full_stats = oracle.process_series_with_stats(df, "t", "value", {"threshold": 1e18})
    gaps_only, stats = oracle.process_series_with_stats(
        df, "t", "value", {"steps": ("gaps",)}
    )
    assert np.array_equal(full["t"].to_numpy(), gaps_only["t"].to_numpy())
    assert np.array_equal(
        full["value"].to_numpy(), gaps_only["value"].to_numpy(), equal_nan=True
    )
    assert [s[0] for s in stats] == ["gaps", "outliers", "jumps"]
    assert stats[1][4] == "skipped" and stats[2][4] == "skipped"
    assert stats[1][1] == 0 and stats[2][1] == 0
    # row counts flow through the skipped stages unchanged
    assert stats[0][3] == stats[1][2] == stats[1][3] == stats[2][2] == stats[2][3]
    assert len(full_stats) == 3 and full_stats[1][4] != "skipped"

    # default = all steps: identical to not passing steps at all
    a = oracle.process_series(df, "t", "value", {})
    b = oracle.process_series(df, "t", "value", {"steps": ("gaps", "outliers", "jumps")})
    assert np.array_equal(a["value"].to_numpy(), b["value"].to_numpy(), equal_nan=True)

    # steps=() is an explicit no-op pipeline, NOT "unset": the input passes
    # through untouched (same rows, same values, no gap insertion) and all
    # three stats rows read skipped/0
    noop, noop_stats = oracle.process_series_with_stats(df, "t", "value", {"steps": ()})
    assert np.array_equal(noop["t"].to_numpy(), df["t"].to_numpy())
    assert np.array_equal(noop["value"].to_numpy(), df["value"].to_numpy())
    assert all(s[4] == "skipped" and s[1] == 0 for s in noop_stats)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown steps"):
        oracle.process_series(df, "t", "value", {"steps": ("gaps", "bogus")})
