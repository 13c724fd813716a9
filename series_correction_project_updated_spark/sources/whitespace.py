"""Headerless whitespace-delimited sensor-file reader (the reference's S1 scan).

Reference loader semantics (scripts/batch_correction.py:362-403):
- ``#`` comment lines and blank lines skipped,
- whitespace/tab separated, header=None,
- best-effort per-column numeric coercion (non-numeric → null, matching
  ``pd.to_numeric(errors='coerce')``),
- positional rename to ``Time (Seconds), Value2..ValueN`` — INCLUDING the
  quirk that column 0 gets the time name even when the real counter is the
  last column (README.md:229-232; pinned in FIXTURES.md §2).

Spark can't regex-split natively in the csv reader, so: ``spark.read.text`` →
trim/skip → ``split`` on ``\\s+`` → positional cast. All built-in columns.
Filename metadata (S<series>_Y<idx>.txt) becomes partition-style columns via
``regexp_extract`` on ``input_file_name`` (replacing the reference's
listdir+regex work-list, batch_correction.py:295-359).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_sensor_files(spark: SparkSession, path: str, n_cols: int | None = None) -> DataFrame:
    """Read S*_Y*.txt files into the reference's loader shape.

    If ``n_cols`` is None it is inferred from the first data line.
    Output: series (string), year_idx (int), ``Time (Seconds)`` double,
    Value2..ValueN double.
    """
    raw = spark.read.text(path).select(
        F.input_file_name().alias("_file"), F.trim(F.col("value")).alias("_line")
    )
    data = raw.where((F.col("_line") != "") & (~F.col("_line").startswith("#")))
    toks = data.withColumn("_toks", F.split(F.col("_line"), r"\s+"))

    if n_cols is None:
        first = toks.select(F.size("_toks").alias("n")).limit(1).collect()
        if not first:
            raise ValueError(f"no data lines found under {path}")
        n_cols = first[0]["n"]

    cols = [
        F.regexp_extract("_file", r"S(.+?)_Y(\d+)\.txt", 1).alias("series"),
        F.regexp_extract("_file", r"S(.+?)_Y(\d+)\.txt", 2).cast("int").alias("year_idx"),
    ]
    names = ["Time (Seconds)"] + [f"Value{i}" for i in range(2, n_cols + 1)]
    for i, name in enumerate(names):
        # element_at is 1-based; try_cast nulls non-numerics = to_numeric(coerce)
        # (plain cast THROWS under Spark 4 ANSI mode)
        cols.append(F.element_at("_toks", i + 1).try_cast("double").alias(name))
    return toks.select(*cols)
