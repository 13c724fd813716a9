"""Content-drift detection over per-url crawl histories.

The north-star framing treats each url's crawl history as a sensor
series; this operator is the CONTENT counterpart of the numeric jump
detector: "when did this page actually change, and how much?" across
recrawls — the signal a crawl scheduler, a dedup-aware trainer, or a
freshness-weighted sampler needs at corpus scale.

Per crawl of a url (ordered by ``warc_ts``) it emits:

- ``exact_hash``      — xxhash64 of the raw text (byte-identity signal;
  the reference pipeline's "extracted text stays byte-identical per
  url" invariant makes this hash stable across engine versions),
- ``simhash``         — 64-bit Charikar signature via the vectorized
  Arrow vote fold shared with dedup (``operators/dedup``: JVM-hashed
  tokens, one ``unpackbits``/``reduceat`` pass per batch),
- ``hamming``         — bit distance to the PREVIOUS crawl's simhash
  (pure JVM: ``bit_count(prev XOR cur)``),
- ``change``          — classification:

  =============  =====================================================
  ``first``      no previous crawl
  ``unchanged``  byte-identical text (exact_hash equal)
  ``cosmetic``   bytes differ but token distribution doesn't move:
                 hamming ≤ threshold (whitespace / boilerplate jitter)
  ``rewrite``    hamming > threshold — real content change
  =============  =====================================================

Scale shape: one Arrow projection for the signatures (no shuffle), ONE
hash shuffle by url for the lag window — the same partitioning the
correction kernel and the tier stores already use, so on a bucketed
page store the exchange disappears. Nothing driver-side; skewed hot
urls cost one window partition each (bounded by crawl count, not text
size, because signatures are computed before the shuffle).

Duplicate timestamps: the window orders by (warc_ts, exact_hash) so
re-fetches landing on the same capture time classify deterministically.

``drift_summary`` rolls per-crawl classes up to one row per url —
crawl counts by class, rewrite rate, mean/max hamming — the per-series
"how volatile is this page" feature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["content_drift", "drift_summary", "redrift_urls"]

DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("t", T.DoubleType(), False),
        T.StructField("exact_hash", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
        T.StructField("hamming", T.IntegerType(), True),
        T.StructField("change", T.StringType(), False),
    ]
)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of int64 values (numpy<2 has no bitwise_count).
    Shared with streaming/drift_stream."""
    return (
        np.unpackbits(x.astype(np.int64).view(np.uint8).reshape(-1, 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


def content_drift(
    pages: DataFrame,
    url_col: str = "url",
    time_col: str = "warc_ts",
    text_col: str = "text",
    hamming_threshold: int = 3,
    portable: bool = False,
    assume_clustered: bool = False,
) -> DataFrame:
    """Classify every crawl of every url against its previous crawl.

    ``hamming_threshold``: max simhash bit distance still considered
    cosmetic. 3 matches the near-dup convention used by
    ``simhash_near_duplicates``; raise it to absorb more template noise.
    ``portable=True`` swaps xxhash64 token hashing for the md5-prefix
    Carter–Wegman family (engine-portable, used by the value-checked
    dedup twins) — same fold, same classification law.

    ``assume_clustered=True``: the caller guarantees no url straddles
    input partitions (a url-bucketed page store read via
    ``sources/bucketstore``) — the window shuffle disappears and the
    whole job is scan → one ``mapInPandas`` (the correction kernel's
    exchange-free law). Needed because an ArrowEvalPython projection
    does NOT propagate the bucketed scan's output partitioning, so the
    default window path re-shuffles even over a bucketed store
    (measured; a pure-JVM window over the same table plans 0
    exchanges). This path returns ``t`` as double epoch seconds (a
    fixed Arrow schema can't mirror an arbitrary input time type);
    classification law and values are identical (test-pinned).
    """
    # lazy: dedup's module-scope pandas_udf needs an active SparkSession
    from .dedup import (
        _filtered_words,
        _simhash_fold,
        _simhash_fold_portable,
        _token_hashes,
        portable_hash60_np,
        simhash_fold_np,
    )

    if assume_clustered:
        thr = int(hamming_threshold)
        # portable: ship token STRINGS and md5 them inside the kernel with
        # the memoized Python hash (r6 — the JVM md5→conv chain measured
        # ~8× the xxhash64 path); non-portable keeps JVM xxhash64 tokens
        tok_col = (
            _filtered_words(text_col) if portable else _token_hashes(text_col)
        )
        pre = pages.select(
            F.col(url_col).cast("string").alias("url"),
            F.col(time_col).cast("timestamp_ltz").cast("double").alias("t"),
            F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("exact_hash"),
            tok_col.alias("_tokh"),
        )

        def _process_partition(batches):
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            arrays = (
                [portable_hash60_np(ws) for ws in pdf["_tokh"]]
                if portable
                else pdf["_tokh"]
            )
            pdf["simhash"] = simhash_fold_np(arrays)
            pdf = pdf.drop(columns=["_tokh"]).sort_values(
                ["url", "t", "exact_hash"], kind="mergesort"
            )
            # shift() on int64 promotes to float64, which corrupts
            # xxhash64 values past 2^53 — shift on NULLABLE Int64 instead
            g = pdf.astype({"exact_hash": "Int64", "simhash": "Int64"}).groupby(
                "url", sort=False
            )
            prev_e = g["exact_hash"].shift(1)
            prev_s = g["simhash"].shift(1)
            has_prev = prev_e.notna().to_numpy()
            ham = np.zeros(len(pdf), dtype=np.int64)
            if has_prev.any():
                ham[has_prev] = _popcount64(
                    pdf["simhash"].to_numpy()[has_prev]
                    ^ prev_s.to_numpy(dtype="int64", na_value=0)[has_prev]
                )
            change = np.where(
                ~has_prev,
                "first",
                np.where(
                    pdf["exact_hash"].to_numpy()
                    == prev_e.to_numpy(dtype="int64", na_value=0),
                    "unchanged",
                    np.where(ham <= thr, "cosmetic", "rewrite"),
                ),
            )
            out = pdf[["url", "t", "exact_hash", "simhash"]].copy()
            out["hamming"] = pd.array(
                np.where(has_prev, ham, 0), dtype="Int32"
            )
            out.loc[~has_prev, "hamming"] = pd.NA
            out["change"] = change
            yield out

        return pre.mapInPandas(_process_partition, schema=DRIFT_SCHEMA)

    fold = (
        _simhash_fold_portable(_filtered_words(text_col))
        if portable
        else _simhash_fold(_token_hashes(text_col))
    )
    sig = pages.select(
        F.col(url_col).alias("url"),
        F.col(time_col).alias("t"),
        F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("exact_hash"),
        fold.alias("simhash"),
    )
    w = Window.partitionBy("url").orderBy("t", "exact_hash")
    prev_exact = F.lag("exact_hash").over(w)
    prev_sig = F.lag("simhash").over(w)
    hamming = F.bit_count(F.col("simhash").bitwiseXOR(prev_sig))
    return sig.select(
        "url",
        "t",
        "exact_hash",
        "simhash",
        hamming.alias("hamming"),
        F.when(prev_exact.isNull(), F.lit("first"))
        .when(prev_exact == F.col("exact_hash"), F.lit("unchanged"))
        .when(hamming <= hamming_threshold, F.lit("cosmetic"))
        .otherwise(F.lit("rewrite"))
        .alias("change"),
    )


def drift_summary(drifts: DataFrame) -> DataFrame:
    """One row per url: crawl counts by class, rewrite rate over the
    recrawls (first crawl excluded from the denominator), and the
    hamming profile. A second small aggregate over ``content_drift``
    output — map-side combining, same url clustering, no extra width."""
    recrawls = F.count("*") - F.sum(F.when(F.col("change") == "first", 1).otherwise(0))
    n_rewrites = F.sum(F.when(F.col("change") == "rewrite", 1).otherwise(0))
    return (
        drifts.groupBy("url")
        .agg(
            F.count("*").alias("n_crawls"),
            n_rewrites.alias("n_rewrites"),
            F.sum(F.when(F.col("change") == "cosmetic", 1).otherwise(0)).alias(
                "n_cosmetic"
            ),
            F.sum(F.when(F.col("change") == "unchanged", 1).otherwise(0)).alias(
                "n_unchanged"
            ),
            F.try_divide(n_rewrites.cast("double"), recrawls.cast("double")).alias(
                "rewrite_rate"
            ),
            F.avg("hamming").alias("mean_hamming"),
            F.max("hamming").alias("max_hamming"),
        )
    )


def recrawl_sample(
    summary: DataFrame,
    k_per_domain: int,
    salt: int = 0,
    floor_weight: float = 0.05,
    unseen_weight: float = 1.0,
) -> DataFrame:
    """The freshness-weighted sampler the module doc promises: pick
    ``k_per_domain`` urls per registrable domain for recrawl, inclusion
    probability ∝ observed churn. Input is ``drift_summary`` output;
    returns (url, domain, recrawl_weight).

    weight = ``floor_weight`` + rewrite_rate, with urls that have no
    recrawl evidence yet (single crawl ⇒ null rewrite_rate) getting
    ``unseen_weight`` instead of the rate — never-probed pages are the
    highest-information recrawls, while the floor keeps provably-static
    pages reachable (weight 0 would mean "never recrawl again").

    Composition, not new machinery: ``sampling.weighted_bottom_k``
    (Efraimidis–Spirakis keyed on the url hash) per domain — so a
    scheduling round is DETERMINISTIC given ``salt`` (re-running a
    crashed round picks the same urls; the next round rotates the salt
    for a fresh draw), shuffles ≤k urls per domain per task
    (WindowGroupLimit), and stays coordinated with any other sampler
    keyed on the same urls."""
    from .sampling import weighted_bottom_k
    from .urls import url_domain

    if floor_weight < 0 or unseen_weight <= 0:
        raise ValueError(
            f"floor_weight must be >= 0 and unseen_weight > 0, got {floor_weight}/{unseen_weight}"
        )
    weighted = summary.select(
        "url",
        url_domain("url").alias("domain"),
        (
            F.lit(float(floor_weight))
            + F.coalesce(F.col("rewrite_rate"), F.lit(float(unseen_weight)))
        ).alias("recrawl_weight"),
    )
    return weighted_bottom_k(
        weighted, k_per_domain, "domain", "recrawl_weight", ["url"], salt=salt
    )


def redrift_urls(
    pages: DataFrame,
    late: DataFrame,
    old_drift: DataFrame,
    url_col: str = "url",
    time_col: str = "warc_ts",
    text_col: str = "text",
    hamming_threshold: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Late-crawl repair for the drift signal store — the batch path the
    streaming classifier's ``change='late'`` rows route into (the same
    invalidation law as ``refresh.recorrect_series``): a late crawl
    re-orders its url's history, so every subsequent classification of
    that url may change — the invalidation unit is the URL. Recompute
    drift ONLY for urls touched by ``late`` (a late batch touches few
    urls; ``pages`` must already contain the late rows) and splice via
    broadcast anti-join — exactly equals a full recompute (per-url
    determinism; test-pinned)."""
    touched = late.select(F.col(url_col).alias("url")).distinct()
    to_redo = pages.withColumnRenamed(url_col, "url").join(
        F.broadcast(touched), "url", "left_semi"
    )
    kept = old_drift.join(F.broadcast(touched), "url", "left_anti")
    return kept.unionByName(
        content_drift(
            to_redo,
            url_col="url",
            time_col=time_col,
            text_col=text_col,
            hamming_threshold=hamming_threshold,
            portable=portable,
        )
    )
