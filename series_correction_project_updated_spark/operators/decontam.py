"""Benchmark decontamination: flag training documents that contain
n-grams from an evaluation/benchmark set.

The standard LLM-pipeline hygiene pass (GPT-3 App. C / PaLM / Llama
style): any training document sharing a long n-gram (default n=13
word-level, the GPT-3 convention) with a benchmark document is
contaminated and must be dropped or audited. This is a FIRST-CLASS
corpus operator — it runs over every document at full scale on every
refresh of the benchmark set.

Normalization law (applied identically to both sides, pinned in
tests): lowercase → non-alphanumeric runs collapse to single spaces →
whitespace tokens → xxhash64 of the space-joined n-gram window. Both
sides reduce to 8-byte hashes BEFORE anything joins, so raw benchmark
text never broadcasts and document text never shuffles.

Scale shape: benchmark n-grams are DISTINCT-ed (a benchmark suite is
thousands of documents — millions of n-grams at most) and broadcast;
document n-grams explode map-side straight into the broadcast hash
join, so the explosion is pipelined — nothing materializes, nothing
shuffles at corpus scale except the (doc_id, hits) survivors, which
are rare by construction. The per-doc hit count then aggregates with
map-side partials. `.explain`: Generate → BroadcastHashJoin →
HashAggregate, zero Python, one real exchange (the survivor agg).
A benchmark set too big to broadcast degrades gracefully: pass
``broadcast_bench=False`` and the same plan runs as a shuffle join
keyed by the n-gram hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_hashes", "flag_contaminated"]


def _norm_tokens(text_col: str) -> F.Column:
    """Lowercase, collapse non-alphanumerics to spaces, split — the
    decontamination tokenization law (pinned in tests)."""
    cleaned = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^a-z0-9]+", " "
    )
    return F.filter(F.split(F.trim(cleaned), " "), lambda w: w != "")


def ngram_hashes(
    df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, ngram_hash) — one row per word-level n-gram window. Documents
    shorter than ``n`` tokens emit nothing (they cannot carry a full
    benchmark n-gram). Pure JVM: sequence + slice + xxhash64."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _norm_tokens(text_col)
    # NB sequence(1, 0) DESCENDS in Spark, so short docs need an explicit
    # empty-array branch rather than a clamped upper bound
    grams = F.expr(
        f"""
        CASE WHEN size(_toks) < {n} THEN array()
        ELSE transform(
          sequence(1, size(_toks) - {n - 1}),
          i -> xxhash64(concat_ws(' ', slice(_toks, i, {n})))
        ) END
        """
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", F.explode(grams).alias("ngram_hash"))
    )


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every document, including
    clean ones (n_hits=0) — the filter signal downstream pipelines join
    back on. ``min_hits`` raises the bar for noisy short n."""
    bench = ngram_hashes(
        benchmark, n=n, text_col=bench_text_col, id_col=bench_text_col
    ).select("ngram_hash").distinct()
    if broadcast_bench:
        bench = F.broadcast(bench)
    doc_grams = ngram_hashes(docs, n=n, text_col=text_col, id_col=id_col)
    hits = (
        doc_grams.join(bench, on="ngram_hash")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
