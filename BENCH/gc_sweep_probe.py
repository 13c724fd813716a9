#!/usr/bin/env python
"""One full sweep (all BENCH_QUERIES, one pass, noop sink) in a fresh JVM
with configurable GC/heap, to test whether session-long heap churn is what
inflates in-sweep query times vs isolated runs (r6 finding: e.g. simhash
0.9s isolated vs 2.3-3.0s in-sweep).

Usage: python BENCH/gc_sweep_probe.py <label> [extraJavaOptions] [driverMem]
Prints one JSON line {label, total, queries}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from series_correction_project_updated_spark.queries import resolve_query  # noqa: E402
from series_correction_project_updated_spark.session import get_spark  # noqa: E402


def main() -> None:
    label = sys.argv[1]
    java_opts = sys.argv[2] if len(sys.argv) > 2 else ""
    mem = sys.argv[3] if len(sys.argv) > 3 else "24g"
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem
    extra = {}
    if java_opts:
        extra["spark.driver.extraJavaOptions"] = java_opts
    spark = get_spark(app_name=f"gc-probe-{label}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    timings = {}
    for name in BENCH_QUERIES:
        fn = resolve_query(name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"label": label, "total": round(sum(timings.values()), 3), "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
