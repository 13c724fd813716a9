"""q_dedup_exact keyed mode: the length-prefixed dup_key must not merge
distinct groups under delimiter injection or NULL fields (a bare
concat_ws does both — skips NULLs and lets 'a|b' collide with 'a','b')."""

import duckdb
import pandas as pd

from series_correction_project_updated_spark.queries import SQL_DEDUP_EXACT, q_dedup_exact


def _docs():
    return pd.DataFrame(
        {
            "doc_id": ["d1", "d2", "d3", "d4", "d5", "d6"],
            "text": [f"unique text {i}" for i in range(6)],
            # injection pair: ('a|b', None) vs ('a', 'b') — must NOT merge
            "lang": ["a|b", "a", "en", "en", None, None],
            "source": [None, "b", "web", "web", "s", "s"],
            "n_chars": [5, 5, 9, 9, 2, 2],
        }
    )


def test_injection_and_null_groups_stay_separate(spark, tmp_path):
    pdf = _docs()
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/documents.parquet")

    got = q_dedup_exact(spark, sf_dir).toPandas()
    keyed = got[got["mode"] == "keyed"]
    # only the two REAL dup groups: (en, web, 9) and (None, s, 2)
    assert len(keyed) == 2
    assert set(keyed["rep_doc_id"]) == {"d3", "d5"}
    assert (keyed["cnt"] == 2).all()
    # the null-field group's key is visibly null-marked, not silently
    # collapsed by concat_ws
    null_key = keyed[keyed["rep_doc_id"] == "d5"]["dup_key"].iloc[0]
    assert "~null~" in null_key

    # oracle agreement on the same parquet
    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB needs the part-file glob
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = con.sql(SQL_DEDUP_EXACT).df()
    key = ["mode", "dup_key", "rep_doc_id"]
    assert (
        got.sort_values(key).reset_index(drop=True)[key + ["cnt"]].astype(str)
        == want.sort_values(key).reset_index(drop=True)[key + ["cnt"]].astype(str)
    ).all().all()
