"""Counter aggregates: reset rule, DuckDB lag oracle on real events,
exact cascade law, telescoping bucket_increase, JVM-only plan."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.counters import (
    counter_cascade,
    counter_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _counter_pdf(n_keys=6, n_pts=500, seed=3) -> pd.DataFrame:
    """Deterministic integer-valued counters with injected resets —
    integer increments keep every float64 sum exact, so the cascade law
    can be pinned bit-for-bit."""
    rng = np.random.default_rng(seed)
    frames = []
    for k in range(n_keys):
        inc = rng.integers(0, 50, n_pts).astype(np.float64)
        resets = rng.random(n_pts) < 0.01
        v = np.empty(n_pts)
        acc = 0.0
        for i in range(n_pts):  # scalar reference generator (test-only)
            if resets[i]:
                acc = 0.0
            acc += inc[i]
            v[i] = acc
        t = 1_700_000_000.0 + np.arange(n_pts) * rng.integers(7, 23)
        frames.append(
            pd.DataFrame({"series_key": f"k{k}", "t": t, "value": v})
        )
    return pd.concat(frames, ignore_index=True)


def _walk(values: np.ndarray) -> tuple[float, int]:
    inc, resets, prev = 0.0, 0, values[0]
    for v in values[1:]:
        if v >= prev:
            inc += v - prev
        else:
            inc += v
            resets += 1
        prev = v
    return inc, resets


def test_reset_rule_hand_case(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 0.0), ("a", 2.0, 5.0), ("a", 3.0, 3.0), ("a", 4.0, 10.0)],
        "series_key string, t double, value double",
    )
    row = counter_rollup(df, "1d").collect()[0]
    assert row["inc_within"] == 15.0  # +5, reset->+3, +7
    assert row["resets"] == 1
    assert row["first_v"] == 0.0 and row["last_v"] == 10.0
    assert row["boundary_increase"] == 0.0  # first bucket of the series


def test_matches_duckdb_lag_oracle_on_events(spark):
    """The tier's bucket_increase/resets equal an independent SQL lag
    window over the raw events table (arbitrary non-monotonic data — the
    reset rule is total, so the law holds on any input)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_key"),
        F.col("ts").cast("timestamp_ltz").cast("double").alias("t"),
        "value",
    )
    got = (
        counter_rollup(ev, "1h")
        .select("series_key", "bucket_start", "n", "bucket_increase", "resets", "boundary_reset")
        .toPandas()
        .sort_values(["series_key", "bucket_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    ora = con.sql(
        """
        WITH d AS (
          SELECT CAST(user_id AS VARCHAR) AS series_key, epoch(ts) AS t, value,
                 lag(value) OVER (PARTITION BY user_id ORDER BY epoch(ts), value) AS pv
          FROM events WHERE value IS NOT NULL)
        SELECT series_key, CAST(floor(t/3600)*3600 AS BIGINT) AS bucket_start,
               count(*) AS n,
               sum(CASE WHEN pv IS NULL THEN 0.0
                        WHEN value >= pv THEN value - pv
                        ELSE value END) AS bucket_increase,
               sum(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 ELSE 0 END) AS all_resets
        FROM d GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert len(got) == len(ora)
    assert (got["series_key"] == ora["series_key"]).all()
    assert (got["bucket_start"] == ora["bucket_start"].astype("int64")).all()
    assert (got["n"] == ora["n"].astype("int64")).all()
    np.testing.assert_allclose(got["bucket_increase"], ora["bucket_increase"], atol=1e-9)
    # oracle counts resets wherever the later point lands; ours split
    # within-bucket vs boundary — their sum must match
    np.testing.assert_array_equal(
        (got["resets"] + got["boundary_reset"]).to_numpy(),
        ora["all_resets"].astype("int64").to_numpy(),
    )


@pytest.fixture(scope="module")
def counters(spark):
    return spark.createDataFrame(_counter_pdf()).cache()


def test_cascade_exactly_equals_direct(spark, counters):
    """Integer-valued counters: cascade(1m -> 1h) is bit-equal to the
    direct 1h rollup on every column (telescoping under the reset rule;
    integer sums are exact in float64, so not even rounding differs)."""
    via = counter_cascade(counter_rollup(counters, "1m"), "1h").toPandas()
    direct = counter_rollup(counters, "1h").toPandas()
    via = via.sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    direct = direct.sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
    assert len(via) == len(direct) > 0
    for col in direct.columns:
        np.testing.assert_array_equal(via[col].to_numpy(), direct[col].to_numpy(), err_msg=col)


def test_bucket_increase_telescopes(spark, counters):
    """Summing bucket_increase over a series' buckets equals the direct
    whole-series walk — boundary contributions are charged to exactly
    one bucket each."""
    tier = (
        counter_rollup(counters, "1m")
        .groupBy("series_key")
        .agg(F.sum("bucket_increase").alias("total"))
        .toPandas()
        .set_index("series_key")["total"]
    )
    pdf = _counter_pdf()
    for key, grp in pdf.groupby("series_key"):
        inc, _ = _walk(grp.sort_values("t")["value"].to_numpy())
        assert tier[key] == inc, key


def test_rate_is_increase_per_second(spark, counters):
    row = counter_rollup(counters, "1h").limit(5).collect()
    for r in row:
        assert r["rate"] == pytest.approx(r["bucket_increase"] / 3600.0)


def test_plan_jvm_only_two_exchanges(spark, counters):
    """One shuffle over raw points + one tier-sized window exchange —
    no Python anywhere (default = window strategy)."""
    plan = (
        counter_rollup(counters, "1m")._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert node not in plan


def _float_counter_pdf(seed=29, n=400, keys=("a", "b", "c")):
    """FLOAT increments — exercises summation association, unlike the
    integer fixture above."""
    rng = np.random.default_rng(seed)
    frames = []
    for k in keys:
        inc = rng.exponential(3.0, n)
        resets = rng.random(n) < 0.02
        v = np.empty(n)
        acc = 0.0
        for i in range(n):
            if resets[i]:
                acc = 0.0
            acc += inc[i]
            v[i] = acc
        # adversarial stripes: nulls (both shapes must filter identically)
        # and a reset pinned exactly on a 60s bucket boundary
        v[(np.arange(n) % 37) == 5] = np.nan
        t = 1.7e9 + np.arange(n) * 13.0
        onb = np.flatnonzero(t % 60.0 == 0.0)
        if len(onb) > 2:
            v[onb[1]] = 0.5  # restart right at a bucket edge
        frames.append(pd.DataFrame({"series_key": k, "t": t, "value": v}))
    out = pd.concat(frames, ignore_index=True)
    return out.astype({"value": "float64"}).where(pd.notna(out), None)


def test_window_and_fold_shapes_bit_equal_on_floats(spark):
    """The two physical shapes walk each bucket in the same (t, v) order
    and accumulate as the same left fold (post-exchange every group sits
    in one partition, window-sorted, so the hash aggregate's partial
    consumes it sequentially) — outputs are bit-identical even on float
    data where reassociation would show."""
    df = spark.createDataFrame(_float_counter_pdf())
    cols = ["series_key", "bucket_start", "n", "first_t", "first_v",
            "last_t", "last_v", "inc_within", "resets",
            "boundary_increase", "boundary_reset", "bucket_increase", "rate"]
    for tier in ("1m", "1h"):
        a = (
            counter_rollup(df, tier, strategy="window")
            .toPandas().sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
        )
        b = (
            counter_rollup(df, tier, strategy="fold")
            .toPandas().sort_values(["series_key", "bucket_start"]).reset_index(drop=True)
        )
        assert len(a) == len(b) > 0
        for col in cols:
            np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy(), err_msg=f"{tier}:{col}")


def test_window_shape_no_object_hash_aggregate(spark, counters):
    """The window shape's point: per-group state is O(1) primitives —
    no ObjectHashAggregate (whose per-group arrays degrade to sort-based
    aggregation past the fallback threshold), no Python."""
    plan = (
        counter_rollup(counters, "1m", strategy="window")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ObjectHashAggregate" not in plan
    assert plan.count("Exchange") == 2
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_bad_strategy_rejected(spark, counters):
    with pytest.raises(ValueError):
        counter_rollup(counters, "1m", strategy="nope")
