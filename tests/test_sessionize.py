"""Sessionization: native session_window vs row-level window vs DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.sessionize import session_stats, sessionize

SF = "/root/testdata/sf0.001"
GAP = 1800.0


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_two_shapes_agree_on_real_events(spark, events):
    """Row-level labels and the native session-window aggregate must
    describe the same sessions: same count per user, same (start, end,
    n_events) multiset."""
    row = sessionize(events, gap_sec=GAP)
    from_rows = row.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    native = session_stats(events, gap_sec=GAP, value_col=None)
    a = sorted(
        map(
            tuple,
            from_rows.select("user_id", "session_start", "session_end", "n_events").collect(),
        )
    )
    b = sorted(
        map(tuple, native.select("user_id", "session_start", "session_end", "n_events").collect())
    )
    assert a == b
    assert len(a) > events.select("user_id").distinct().count()  # gaps actually split


def test_exact_boundary_gap_splits_in_both_shapes(spark):
    rows = [
        (1, 0.0, 1),
        (1, 1000.0, 2),
        (1, 1000.0 + GAP, 3),  # exactly gap later -> still MERGES (touch)
        (1, 1000.0 + 2 * GAP + 1, 4),  # gap + 1s -> splits
        (2, 5.0, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, t double, event_id long").select(
        "user_id", F.timestamp_seconds("t").alias("ts"), "event_id"
    )
    row = sessionize(df, gap_sec=GAP)
    sids = {r.event_id: r.session_id for r in row.collect()}
    assert sids[1] == sids[2] == sids[3] == 1
    assert sids[4] == 2
    native = session_stats(df, gap_sec=GAP, value_col=None)
    per_user = {r[0]: r[1] for r in native.groupBy("user_id").count().collect()}
    assert per_user == {1: 2, 2: 1}


def test_row_level_matches_duckdb_oracle(spark, events):
    """Independent oracle: the same >=-gap running-break-sum in DuckDB SQL."""
    got = {
        (r.event_id): r.session_id
        for r in sessionize(events, gap_sec=GAP).select("event_id", "session_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from read_parquet('{SF}/events.parquet')"
    )
    oracle = con.execute(
        f"""
        with lagged as (
          select event_id, user_id, ts,
                 lag(ts) over (partition by user_id order by ts, event_id) prev
          from events
        ), flagged as (
          select *, case when prev is null
                          or epoch(ts) - epoch(prev) > {GAP} then 1 else 0 end f
          from lagged
        )
        select event_id,
               sum(f) over (partition by user_id order by ts, event_id
                            rows unbounded preceding) sid
        from flagged
        """
    ).fetchall()
    want = {eid: sid for eid, sid in oracle}
    assert got == want


def test_session_stats_streams_with_watermark(spark, events, tmp_path):
    """The same session_window aggregate must run as a watermarked
    streaming query; closed sessions emitted in append mode must match
    the batch sessions exactly (a session closes once the watermark
    passes last_event + gap, so all but the final open sessions emit)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # watermarks require TIMESTAMP (ltz) event time — the parquet carries
    # NTZ; cast both legs identically (session tz is pinned UTC)
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        session_stats(stream.withWatermark("ts", "0 seconds"), gap_sec=GAP, value_col=None)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    batch = session_stats(ev, gap_sec=GAP, value_col=None)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    emitted = sorted(map(tuple, got.select(*cols).collect()))
    expected = sorted(map(tuple, batch.select(*cols).collect()))
    assert len(emitted) > 0
    # every emitted session must be a real batch session, and the only
    # batch sessions allowed to be missing are watermark-held open ones
    assert set(emitted) <= set(expected)
    assert len(emitted) >= len(expected) - events.select("user_id").distinct().count()


def test_single_shuffle_plan(spark, events):
    native = session_stats(events, gap_sec=GAP)
    plan = native._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"^\s*[+\-:* ]*Exchange\b", plan, re.M)) == 1
    assert "Python" not in plan and "MapInPandas" not in plan  # pure JVM


def test_transition_matrix_matches_duckdb(spark, events):
    """Whole-history transitions vs an independent DuckDB lag query."""
    from series_correction_project_updated_spark.operators.sessionize import transition_matrix

    got = sorted(
        (r.prev_type, r.next_type, r.cnt, round(r.prob, 9))
        for r in transition_matrix(events).collect()
    )
    con = duckdb.connect()
    con.execute(f"create view ev as select * from read_parquet('{SF}/events.parquet')")
    want = sorted(
        (p, n, c, round(pr, 9))
        for p, n, c, pr in con.execute(
            """
            with lagged as (
              select lag(event_type) over (partition by user_id order by ts, event_id) prev_type,
                     event_type next_type
              from ev
            ), counts as (
              select prev_type, next_type, count(*) cnt from lagged
              where prev_type is not null group by 1, 2
            )
            select prev_type, next_type, cnt,
                   cnt / (sum(cnt) over (partition by prev_type)) prob
            from counts
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_transition_matrix_session_scoped_drops_cross_session_pairs(spark):
    from series_correction_project_updated_spark.operators.sessionize import transition_matrix

    rows = [
        (1, 0.0, 1, "a"),
        (1, 10.0, 2, "b"),      # a->b within session
        (1, 10_000.0, 3, "c"),  # new session: b->c must NOT count
        (1, 10_010.0, 4, "a"),  # c->a within session
    ]
    df = spark.createDataFrame(rows, "user_id long, t double, event_id long, event_type string").select(
        "user_id", F.timestamp_seconds("t").alias("ts"), "event_id", "event_type"
    )
    scoped = {(r.prev_type, r.next_type): r.cnt for r in transition_matrix(df, gap_sec=GAP).collect()}
    assert scoped == {("a", "b"): 1, ("c", "a"): 1}
    full = {(r.prev_type, r.next_type): r.cnt for r in transition_matrix(df).collect()}
    assert full == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}
