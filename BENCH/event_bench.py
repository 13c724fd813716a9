"""Throughput of the round-4 event-analytics operators at 10M events.

sf0.1's events table is 100k rows — too small to say anything about
operator cost — so this synthesizes a deterministic 10M-row event table
(same schema shape: user_id, ts, event_type, value; Zipf-ish activity via
a hot-user multiplier) and times each operator end-to-end (noop-sink drained)
at local[8]:

  session_stats    native session_window aggregate (one shuffle)
  sessionize       row-level ids (window sort shape, same shuffle)
  funnel_reach     one-shuffle JVM fold over sorted per-user lists
  distinct_1m+1h   HLL sketch tier + raw-free cascade

Protocol (bench-protocol note): CPU probes bracket the timed block,
every operator runs `reps` times with the MIN kept, clean flag stamped.

Usage: python BENCH/event_bench.py [n_users] [events_per_user] [reps]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import MIN_PROBE_IPS, _cpu_probe, _drain
from series_correction_project_updated_spark.operators.distinct import (
    distinct_cascade,
    distinct_rollup,
    rolling_distinct,
)
from series_correction_project_updated_spark.operators.cohort import cohort_retention
from series_correction_project_updated_spark.operators.funnel import funnel_reach
from series_correction_project_updated_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from series_correction_project_updated_spark.session import get_spark

STEPS = ["view", "click", "purchase"]
TYPES = ["view", "view", "view", "click", "click", "purchase", "signup", "error"]


def synth_events(spark, n_users: int, events_per_user: int):
    """Deterministic event table: user 0 gets 8x activity (hot key)."""
    total = n_users * events_per_user
    df = spark.range(0, total, 1, numPartitions=32).select(
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") / n_users).cast("long").alias("i"),
        F.col("id"),
    )
    hot = spark.range(0, events_per_user * 7).select(
        F.lit(0).cast("long").alias("user_id"),
        (F.col("id") + events_per_user).cast("long").alias("i"),
        (F.col("id") + total).alias("id"),
    )
    df = df.unionByName(hot)
    # xxhash64-derived pseudo-random inter-event gaps (0..3599s) and types
    h = F.abs(F.xxhash64("user_id", "i"))
    return df.select(
        "user_id",
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("i") * 900 + (h % 3600)
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]), (h % len(TYPES) + 1).cast("int")
        ).alias("event_type"),
        (h % 1000 / 100.0).alias("value"),
    )


def main():
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    epu = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ev = synth_events(spark, n_users, epu).cache()
    n = ev.count()

    # _drain (noop sink), NOT .count(): under a count Catalyst prunes the
    # session/fold/sketch expressions and the operator never executes (the
    # r3 "phantom timing" finding, bench.py:_drain)
    ops = {
        "session_stats": lambda: _drain(session_stats(ev, gap_sec=1800)),
        "sessionize_rows": lambda: _drain(sessionize(ev, gap_sec=1800)),
        "funnel_reach": lambda: _drain(funnel_reach(ev, STEPS)),
        "distinct_1m_plus_1h_cascade": lambda: _drain(
            distinct_cascade(distinct_rollup(ev, "1m"), "1h")
        ),
        "cohort_retention": lambda: _drain(cohort_retention(ev)),
        "rolling_mau_30d": lambda: _drain(
            rolling_distinct(distinct_rollup(ev, "1d"), 30)
        ),
    }
    for fn in ops.values():
        fn()  # warm

    p_before = _cpu_probe()
    results = {}
    for name, fn in ops.items():
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        results[name] = {
            "sec": min(times),
            "reps": times,
            "rows_per_sec": round(n / min(times)),
        }
    p_after = _cpu_probe()

    print(
        json.dumps(
            {
                "metric": "event_ops_throughput_10M",
                "events": n,
                "users": n_users,
                "ops": results,
                "probe_before_ips": p_before,
                "probe_after_ips": p_after,
                "clean": min(p_before, p_after) >= MIN_PROBE_IPS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
