"""flag_contaminated: bench_set n-gram decontamination — planted overlap,
normalization law, pandas replay, min_hits, broadcast/shuffle parity,
plan shape."""

import re

import pytest

from series_correction_project_updated_spark.operators.decontam import (
    flag_contaminated,
    ngram_hashes,
)

BENCH_Q = "what is the capital city of the republic of france in europe today"
CLEAN = "a totally unrelated document about growing tomatoes in clay soil with compost and patience every season"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # d1 embeds the bench_set question verbatim mid-document
        ("d1", f"intro text here. {BENCH_Q}? more filler afterwards."),
        # d2 embeds it with case/punctuation noise — normalization must
        # still catch it (the law: lowercase, non-alnum → space)
        ("d2", "padding WHAT is, the CAPITAL city; of THE republic OF france IN europe TODAY!! end"),
        # d3 shares only a short prefix (< n tokens) — clean
        ("d3", "what is the capital city of portugal then"),
        ("d4", CLEAN),
        # d5 too short to carry any 13-gram
        ("d5", "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(BENCH_Q,), ("another bench_set question about something else entirely held out",)],
        "text string",
    )


def test_planted_contamination(spark, corpus, bench_set):
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in flag_contaminated(corpus, bench_set, n=13).collect()
    }
    assert len(got) == 5  # clean docs included with n_hits=0
    assert got["d1"][1] and got["d1"][0] >= 1
    assert got["d2"][1]  # normalization catches case/punct noise
    assert got["d3"] == (0, False)
    assert got["d4"] == (0, False)
    assert got["d5"] == (0, False)


def test_matches_python_replay(spark, corpus, bench_set):
    """Independent replay of the n-gram overlap law in plain Python."""
    n = 5

    def toks(s):
        return [w for w in re.sub(r"[^a-z0-9]+", " ", (s or "").lower()).split() if w]

    def grams(s):
        t = toks(s)
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    bench_g = set()
    for r in bench_set.collect():
        bench_g |= grams(r["text"])
    want = {}
    for r in corpus.collect():
        # count WINDOWS hitting the bench_set set (dup windows count each)
        t = toks(r["text"])
        hits = sum(
            1 for i in range(max(len(t) - n + 1, 0)) if " ".join(t[i : i + n]) in bench_g
        )
        want[r["doc_id"]] = hits
    got = {
        r["doc_id"]: r["n_hits"]
        for r in flag_contaminated(corpus, bench_set, n=n).collect()
    }
    assert got == want


def test_min_hits_and_strategies(spark, corpus, bench_set):
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in flag_contaminated(corpus, bench_set, n=5, min_hits=3).collect()
    }
    loose = {
        r["doc_id"]: r["contaminated"]
        for r in flag_contaminated(corpus, bench_set, n=5, min_hits=1).collect()
    }
    assert sum(strict.values()) <= sum(loose.values())
    # broadcast and shuffle strategies agree exactly
    a = sorted(
        map(tuple, flag_contaminated(corpus, bench_set, n=5).collect())
    )
    b = sorted(
        map(
            tuple,
            flag_contaminated(corpus, bench_set, n=5, broadcast_bench=False).collect(),
        )
    )
    assert a == b


def test_short_docs_emit_no_ngrams(spark, corpus):
    g = ngram_hashes(corpus, n=13).where("id = 'd5'").count()
    assert g == 0


def test_plan_shape(spark, corpus, bench_set):
    plan = (
        flag_contaminated(corpus, bench_set, n=13)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan  # bench side broadcast
    assert "CartesianProduct" not in plan


def test_validation(spark, corpus, bench_set):
    with pytest.raises(ValueError):
        ngram_hashes(corpus, n=0)
