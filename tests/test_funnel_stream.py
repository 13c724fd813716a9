"""Streaming funnel: emitted reaches must reconstruct the batch fold."""

from pyspark.sql import functions as F

from series_correction_project_updated_spark.operators.funnel import funnel_reach
from series_correction_project_updated_spark.streaming.funnel_stream import funnel_stream

STEPS = ["view", "click", "purchase"]


def _events(spark, n_users=40, per_user=30):
    """Deterministic epoch-second events with a spread of types."""
    total = n_users * per_user
    h = F.abs(F.xxhash64("user_id", "i"))
    return (
        spark.range(0, total, 1, numPartitions=4)
        .select(
            (F.col("id") % n_users).alias("user_id"),
            (F.col("id") / n_users).cast("long").alias("i"),
            F.col("id").alias("event_id"),
        )
        .select(
            "user_id",
            "event_id",
            (F.lit(1000.0) + F.col("i") * 60 + (h % 30)).alias("t"),
            F.element_at(
                F.array(
                    *[F.lit(x) for x in ["view", "view", "click", "purchase", "other"]]
                ),
                (h % 5 + 1).cast("int"),
            ).alias("event_type"),
        )
    )


def test_stream_reaches_reconstruct_batch_funnel(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        funnel_stream(stream, STEPS, within_sec=3600.0)
        .writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.table("funnel_sink").collect()
    # rebuild per-user state from the emitted reach events
    got: dict[int, list] = {}
    for r in emitted:
        got.setdefault(r.user_id, [None] * len(STEPS))[r.step - 1] = r.t
    # batch fold on the same (timestamped) events — the ground truth
    batch_ev = ev.withColumn("ts", F.timestamp_seconds("t"))
    want_all = {
        r.user_id: list(r.step_ts)
        for r in funnel_reach(batch_ev, STEPS, within_sec=3600.0).collect()
    }
    want = {k: v for k, v in want_all.items() if any(x is not None for x in v)}
    assert got == want
    assert len(got) > 0
    # funnel completions exist and each user's reaches are step-ordered
    assert any(v[-1] is not None for v in got.values())
    for v in got.values():
        reached = [x for x in v if x is not None]
        assert reached == sorted(reached)
        assert v[: len(reached)] == reached  # prefix-filled


def test_stream_state_frozen_after_completion(spark, tmp_path):
    """A user who completes the funnel twice emits each step ONCE."""
    rows = [
        (1, 10.0, "view"),
        (1, 20.0, "click"),
        (1, 30.0, "purchase"),
        (1, 40.0, "view"),
        (1, 50.0, "click"),
        (1, 60.0, "purchase"),
    ]
    src = str(tmp_path / "src2")
    spark.createDataFrame(rows, "user_id long, t double, event_type string").write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        funnel_stream(stream, STEPS)
        .writeStream.format("memory")
        .queryName("funnel_sink2")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("funnel_sink2").orderBy("step").collect()
    assert [(r.step, r.t) for r in out] == [(1, 10.0), (2, 20.0), (3, 30.0)]
