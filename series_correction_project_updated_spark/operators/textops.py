"""Text-analysis operators: language ID, quality scoring, fingerprinting.

Training-data-pipeline additions (not in the reference). All hot paths are
built-in Spark column expressions (JVM, codegen) except the rolling-hash
fingerprint, which is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny public stopword sets — enough for a coarse n-gram/stopword heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "con", "que", "una", "para"],
}


def langid_heuristic(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``lang_pred``: stopword-ratio argmax over known languages, with a
    CJK-codepoint check for zh. Pure column expressions — no UDF."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.greatest(F.size(words), F.lit(1)).cast("double")

    def _hit_ratio(stopwords: list[str]) -> F.Column:
        return F.size(F.filter(words, lambda w: w.isin(*stopwords))) / n

    scores = {lang: _hit_ratio(sw) for lang, sw in _STOPWORDS.items()}
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")) / F.greatest(
        F.length(text_col), F.lit(1)
    )
    best = None
    best_score = None
    for lang, score in scores.items():
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    pred = (
        F.when(cjk > 0.2, F.lit("zh"))
        .when(best_score > 0.0, best)
        .otherwise(F.lit("und"))
    )
    return docs.withColumn("lang_pred", pred)


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add quality features: token count, mean token length, punctuation
    ratio, stopword ratio, uppercase ratio, and a [0,1] composite."""
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(words)
    chars = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", "")).cast("double")
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    en_sw = _STOPWORDS["en"]
    sw_hits = F.size(F.filter(F.transform(words, F.lower), lambda w: w.isin(*en_sw)))
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    out = (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", F.round(chars / safe_tokens, 6))
        .withColumn("punct_ratio", F.round(punct / F.greatest(chars, F.lit(1.0)), 6))
        .withColumn("upper_ratio", F.round(upper / F.greatest(chars, F.lit(1.0)), 6))
        .withColumn("stopword_ratio", F.round(sw_hits / safe_tokens, 6))
    )
    composite = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 3.0, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality", F.round(composite, 6))


def _fingerprint_batch(texts: pd.Series) -> pd.Series:
    """64-bit rolling polynomial hash (Rabin-Karp style) of normalized text."""
    out = np.zeros(len(texts), dtype=np.int64)
    base = np.uint64(1099511628211)  # FNV prime
    for i, text in enumerate(texts):
        norm = " ".join((text or "").lower().split())
        h = np.uint64(14695981039346656037)  # FNV offset basis
        data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
        for b in data:  # FNV-1a over bytes; numpy scalar ops, wraps mod 2^64
            h = np.uint64((int(h) ^ int(b)) * int(base) & 0xFFFFFFFFFFFFFFFF)
        out[i] = np.int64(h.astype(np.int64))
    return pd.Series(out)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``fingerprint``: whitespace-normalized FNV-1a content hash —
    catches whitespace-only near-dups that md5(text) misses."""
    udf = F.pandas_udf(_fingerprint_batch, T.LongType())
    return docs.withColumn("fingerprint", udf(F.col(text_col)))
