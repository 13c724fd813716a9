"""Intra-document repetition scores — the Gopher/MassiveText quality
rules that catch boilerplate, scraper loops, and SEO spam: a page whose
lines repeat or whose n-gram distribution collapses onto a few phrases
is machine noise, not prose, and web-scale training pipelines filter on
exactly these signals (Rae et al. 2021, "Scaling Language Models",
Table A1).

Per document:

- ``line_dup_frac``   — fraction of non-blank lines that are duplicates
  of an earlier line (0 = all unique),
- ``top_{n}gram_frac`` — fraction of word n-gram WINDOWS occupied by the
  single most frequent n-gram,
- ``dup_{n}gram_frac`` — fraction of windows whose n-gram occurs more
  than once in the document.

Fractions are over token windows rather than characters (Gopher's
original is char-weighted; the window form is the same signal, bounded
[0,1], and needs no second pass over text). Tokenization: whitespace
split of lowercased text — one law, pinned in tests.

Scale shape: line stats are a pure-JVM projection (split +
array_distinct — no shuffle). N-gram stats explode each doc once into
(doc, n, gram_hash) windows for ALL requested n (8-byte hashes — text
itself never leaves the scan), then two hash aggregates: per-gram
counts, per-(doc,n) profile — both with map-side partials, so the
shuffle carries distinct grams, not windows. A final conditional-agg
pivot (fixed small ``ns``, no discovery job) and one join back to the
per-doc line stats. No Python anywhere; hot docs cost their own token
count, never a partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["repetition_scores"]


def repetition_scores(
    docs: DataFrame,
    ns: Sequence[int] = (2, 3),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_lines, line_dup_frac, top_{n}gram_frac..., dup_{n}gram_frac...)
    for every document; documents with no window for a given n get null
    fractions (too short to judge — don't conflate with 0 = clean)."""
    ns = sorted(set(int(n) for n in ns))
    if not ns or ns[0] < 1:
        raise ValueError("ns must be non-empty positive ints")

    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != "")

    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        (
            1.0
            - F.try_divide(
                F.size(F.array_distinct(lines)).cast("double"),
                F.size(lines).cast("double"),
            )
        ).alias("line_dup_frac"),
        toks.alias("_toks"),
    )

    # one exploded pass yields windows for every n: (id, n, gram hash)
    gram_arrays = [
        F.expr(
            f"""
            CASE WHEN size(_toks) < {n} THEN array()
            ELSE transform(
              sequence(1, size(_toks) - {n - 1}),
              i -> struct({n} AS n, xxhash64(concat_ws(' ', slice(_toks, i, {n}))) AS h)
            ) END
            """
        )
        for n in ns
    ]
    windows = base.select(
        "id", F.explode(F.flatten(F.array(*gram_arrays))).alias("g")
    ).select("id", F.col("g.n").alias("n"), F.col("g.h").alias("h"))

    per_gram = windows.groupBy("id", "n", "h").agg(F.count("*").alias("c"))
    profile = per_gram.groupBy("id", "n").agg(
        F.max("c").alias("mx"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup"),
        F.sum("c").alias("tot"),
    )
    pivoted = profile.groupBy("id").agg(
        *[
            F.first(
                F.when(F.col("n") == n, F.col("mx") / F.col("tot")), ignorenulls=True
            ).alias(f"top_{n}gram_frac")
            for n in ns
        ],
        *[
            F.first(
                F.when(F.col("n") == n, F.col("dup") / F.col("tot")), ignorenulls=True
            ).alias(f"dup_{n}gram_frac")
            for n in ns
        ],
    )
    return (
        base.select("id", "n_lines", "line_dup_frac")
        .join(pivoted, on="id", how="left")
        .withColumnRenamed("id", id_col)
    )
