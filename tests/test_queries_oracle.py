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


def _kinds(df: pd.DataFrame) -> list:
    """Coarse dtype kind per column ('i', 'f', 'b', 'O', 'M', ...).

    The driver's canonicalizer hashes values WITHOUT cross-kind coercion, so
    a Spark bigint vs a DuckDB HUGEINT-as-float mismatch (e.g. 3549 vs
    3549.0) is a driver FAIL. This gate must be exactly as strict — do not
    normalize int/float drift away (VERDICT r01 'What's wrong' #2)."""
    out = []
    for c in df.columns:
        k = df[c].dtype.kind
        if str(df[c].dtype) == "boolean":
            k = "b"
        elif str(df[c].dtype).startswith(("Int", "UInt")):
            k = "i"
        out.append("i" if k == "u" else k)
    return out


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
    got_raw = fn(spark, SF_DIR).toPandas()[lambda d: sorted(d.columns)]
    want_raw = ddb.sql(sql).df()[lambda d: sorted(d.columns)]
    assert _kinds(got_raw) == _kinds(want_raw), (
        f"{name}: dtype-kind mismatch {list(zip(got_raw.columns, _kinds(got_raw), _kinds(want_raw)))}"
    )
    got = _normalize(got_raw)
    want = _normalize(want_raw)
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
    assert len(df.schema) > 0
