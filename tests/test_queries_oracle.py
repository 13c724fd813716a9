"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB (sf0.01) and compare
row-count + schema + order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

from series_correction_project_updated_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
        elif df[c].dtype.kind in "iu" or str(df[c].dtype).startswith(("Int", "UInt")):
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "b" or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_BACKED = [name for name, (_f, sql) in REGISTRY.items() if sql is not None]
ROWS_ONLY = [name for name, (_f, sql) in REGISTRY.items() if sql is None]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = REGISTRY[name]
    got = _normalize(fn(spark, SF_DIR).toPandas())
    want = _normalize(ddb.sql(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
    assert len(df.schema) > 0
