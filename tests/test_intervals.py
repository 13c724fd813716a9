"""Interval joins: DuckDB BETWEEN-join oracle, naive-theta-join equality
on every closed variant, exactly-once pair law, fan-out guard, and a plan
assertion that the decomposed shape never nested-loops."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.intervals import (
    interval_join,
    interval_overlap_join,
    suggest_bucket_seconds,
)

T0 = 1_700_000_000.0


def _points_pdf(n_keys=5, n_pts=400, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    frames = []
    for k in range(n_keys):
        t = T0 + np.sort(rng.uniform(0, 50_000, n_pts))
        frames.append(
            pd.DataFrame(
                {"series_key": f"k{k}", "t": t, "value": rng.normal(0, 1, n_pts)}
            )
        )
    return pd.concat(frames, ignore_index=True)


def _intervals_pdf(n_keys=5, n_iv=25, seed=12) -> pd.DataFrame:
    """Overlapping, unaligned intervals, some landing exactly on bucket
    edges and some degenerate (lo == hi) — the tie cases that matter."""
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        for j in range(n_iv):
            lo = T0 + rng.uniform(0, 45_000)
            span = rng.choice([0.0, 120.0, 3600.0, 9000.0])
            rows.append((f"k{k}", f"iv{k}_{j}", lo, lo + span))
    # a few bucket-edge-aligned ones (lo/hi exactly divisible by 600)
    for k in range(n_keys):
        rows.append((f"k{k}", f"iv{k}_edge", T0 + 1200.0, T0 + 1800.0))
    return pd.DataFrame(rows, columns=["series_key", "iv_id", "t_start", "t_end"])


@pytest.fixture(scope="module")
def frames(spark):
    pts = spark.createDataFrame(_points_pdf())
    ivs = spark.createDataFrame(_intervals_pdf())
    return pts, ivs


def _sorted_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_matches_duckdb_between_join(frames):
    pts, ivs = frames
    got = (
        interval_join(pts, ivs, bucket_seconds=600.0)
        .select("series_key", "t", "iv_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("p", _points_pdf())
    con.register("i", _intervals_pdf())
    want = con.execute(
        """
        SELECT p.series_key, p.t, i.iv_id
        FROM p JOIN i ON p.series_key = i.series_key
                     AND p.t BETWEEN i.t_start AND i.t_end
        """
    ).df()
    pd.testing.assert_frame_equal(_sorted_pairs(got), _sorted_pairs(want))


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_closed_variants_match_naive_theta_join(frames, closed):
    pts, ivs = frames
    got = (
        interval_join(pts, ivs, bucket_seconds=777.0, closed=closed)
        .select("series_key", "t", "iv_id")
        .toPandas()
    )
    ge = ">=" if closed in ("both", "left") else ">"
    le = "<=" if closed in ("both", "right") else "<"
    naive = (
        pts.alias("p")
        .join(
            ivs.alias("i"),
            F.expr(
                f"p.series_key = i.series_key AND p.t {ge} i.t_start AND p.t {le} i.t_end"
            ),
        )
        .select("p.series_key", "p.t", "i.iv_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(_sorted_pairs(got), _sorted_pairs(naive))


def test_exactly_once_no_duplicate_pairs(frames):
    pts, ivs = frames
    out = interval_join(pts, ivs, bucket_seconds=600.0).select(
        "series_key", "t", "iv_id"
    )
    assert out.count() == out.distinct().count()


def test_bucket_size_invariance(frames):
    pts, ivs = frames
    a = interval_join(pts, ivs, bucket_seconds=137.0).count()
    b = interval_join(pts, ivs, bucket_seconds=86_400.0).count()
    assert a == b


def test_overlap_join_matches_duckdb(spark):
    left = _intervals_pdf(seed=21).rename(columns={"iv_id": "l_id"})
    right = (
        _intervals_pdf(seed=22)
        .rename(columns={"iv_id": "r_id", "t_start": "r_start", "t_end": "r_end"})
    )
    got = (
        interval_overlap_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            bucket_seconds=900.0,
        )
        .select("series_key", "l_id", "r_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        """
        SELECT l.series_key, l.l_id, r.r_id
        FROM l JOIN r ON l.series_key = r.series_key
                     AND l.t_start <= r.r_end AND r.r_start <= l.t_end
        """
    ).df()
    pd.testing.assert_frame_equal(_sorted_pairs(got), _sorted_pairs(want))
    # exactly-once law: no distinct() in the operator, none needed
    assert len(got) == len(got.drop_duplicates())


def test_overlap_join_strict_excludes_touching(spark):
    left = pd.DataFrame(
        [("a", "L1", 0.0, 100.0)], columns=["series_key", "l_id", "t_start", "t_end"]
    )
    right = pd.DataFrame(
        [("a", "R_touch", 100.0, 200.0), ("a", "R_in", 50.0, 60.0)],
        columns=["series_key", "r_id", "r_start", "r_end"],
    )
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    both = interval_overlap_join(ldf, rdf, bucket_seconds=30.0).toPandas()
    strict = interval_overlap_join(
        ldf, rdf, bucket_seconds=30.0, closed="neither"
    ).toPandas()
    assert sorted(both["r_id"]) == ["R_in", "R_touch"]
    assert sorted(strict["r_id"]) == ["R_in"]


def test_degenerate_and_inverted_intervals(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"series_key": ["a"] * 3, "t": [10.0, 20.0, 30.0], "value": [1.0, 2.0, 3.0]})
    )
    ivs = spark.createDataFrame(
        pd.DataFrame(
            [("a", "pt", 20.0, 20.0), ("a", "inv", 30.0, 10.0)],
            columns=["series_key", "iv_id", "t_start", "t_end"],
        )
    )
    out = interval_join(pts, ivs, bucket_seconds=7.0).toPandas()
    # degenerate [20,20] catches exactly t=20; inverted emits nothing
    assert list(out["iv_id"]) == ["pt"] and list(out["t"]) == [20.0]


def test_validate_fanout_guard(frames):
    pts, ivs = frames
    with pytest.raises(ValueError, match="buckets"):
        interval_join(
            pts, ivs, bucket_seconds=1.0, validate=True, max_buckets_per_interval=100
        ).count()
    # generous cap passes and still answers
    assert (
        interval_join(
            pts, ivs, bucket_seconds=600.0, validate=True, max_buckets_per_interval=100
        ).count()
        > 0
    )


def test_column_collision_raises(frames):
    pts, ivs = frames
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, ivs.withColumnRenamed("t_start", "value"), lo_col="value")


def test_suggest_bucket_seconds(frames):
    _, ivs = frames
    b = suggest_bucket_seconds(ivs)
    assert 100.0 <= b <= 10_000.0


def test_plan_has_no_nested_loop(frames):
    pts, ivs = frames
    plan = interval_join(pts, ivs, bucket_seconds=600.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
