"""repetition_scores: Gopher-style intra-doc repetition — planted
boilerplate, python replay, short-doc nulls, plan shape."""

from collections import Counter

import pytest

from series_correction_project_updated_spark.operators.repetition import (
    repetition_scores,
)


@pytest.fixture(scope="module")
def docs(spark):
    loop = "click here to buy now\n" * 5 + "one unique closing line"
    prose = (
        "the river rose slowly through march\n"
        "gauges upstream recorded a steady climb\n"
        "by april the levee held firm\n"
        "engineers walked the bank each morning"
    )
    spam = "cheap flights cheap flights cheap flights cheap flights cheap hotels"
    return spark.createDataFrame(
        [("loop", loop), ("prose", prose), ("spam", spam), ("tiny", "one two"), ("empty", None)],
        "doc_id string, text string",
    )


def test_planted_signals(spark, docs):
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(docs, ns=(2, 3)).collect()}
    # 6 non-blank lines, 5 identical → 4 duplicates of an earlier line
    assert got["loop"]["n_lines"] == 6
    assert got["loop"]["line_dup_frac"] == pytest.approx(4 / 6)
    assert got["prose"]["line_dup_frac"] == 0.0
    # spam: "cheap flights" dominates the 2-gram windows
    assert got["spam"]["top_2gram_frac"] > 0.3
    assert got["spam"]["dup_2gram_frac"] > got["prose"]["dup_2gram_frac"]
    # prose has no repeated 3-gram at all
    assert got["prose"]["dup_3gram_frac"] == 0.0
    # too short for 3-grams → null, not 0
    assert got["tiny"]["top_3gram_frac"] is None
    assert got["tiny"]["top_2gram_frac"] == pytest.approx(1.0)  # single window
    assert got["empty"]["n_lines"] == 0 and got["empty"]["line_dup_frac"] is None


def test_matches_python_replay(spark, docs):
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(docs, ns=(2,)).collect()}
    for r in docs.collect():
        text = r["text"] or ""
        toks = [w for w in text.lower().split() if w]
        wins = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        g = got[r["doc_id"]]
        if not wins:
            assert g["top_2gram_frac"] is None and g["dup_2gram_frac"] is None
            continue
        c = Counter(wins)
        assert g["top_2gram_frac"] == pytest.approx(max(c.values()) / len(wins))
        dup = sum(v for v in c.values() if v > 1)
        assert g["dup_2gram_frac"] == pytest.approx(dup / len(wins))
        lines = [l for l in text.split("\n") if l.strip()]
        if lines:
            assert g["line_dup_frac"] == pytest.approx(
                1 - len(set(lines)) / len(lines)
            )


def test_plan_shape(spark, docs):
    # r6 shape: the n-gram profile is per-document, so the whole operator
    # is ONE Arrow pass over the scan — no shuffle, no join, no aggregate
    # (the previous explode + 2 gram aggregates + pivot carried 3
    # Exchanges of the gram stream)
    plan = (
        repetition_scores(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        repetition_scores(docs, ns=())
    with pytest.raises(ValueError):
        repetition_scores(docs, ns=(0, 2))
