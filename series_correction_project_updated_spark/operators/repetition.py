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

Scale shape (r6): line stats are a pure-JVM projection (split +
array_distinct — no shuffle). N-gram stats are per-document by
definition, so they never need a shuffle at all: ONE vectorized Arrow
pass takes each doc's token array and computes every n's
(top_frac, dup_frac) batch-wide — tokens factorize C-side once per
batch, n-gram keys build by iterative pair-factorization (no V^n
overflow), and per-doc max/dup-sum reduce with ``reduceat``. Replaces
the previous explode → per-gram hash-agg → profile agg → pivot → join
pipeline (3 shuffles of the gram stream; gram equality was by xxhash64
where this computes it on the tokens themselves — same law, no
collision caveat). Hot docs cost their own token count, never a
partition.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["repetition_scores"]


def gram_fracs_np(tok_arrays, ns: Sequence[int]) -> list[list[float | None]]:
    """Per-doc [top_frac, dup_frac] for each n over a batch of token
    arrays — fully vectorized (the only Python loop is over ``ns``).

    For each n: window w is the n consecutive tokens starting at w;
    ``top = max gram count / windows``, ``dup = windows in grams seen
    more than once / windows``; docs with no window get None (too short
    to judge — not 0). Token equality is string equality (factorize),
    identical to the n-gram law the DuckDB oracle applies."""
    n_docs = len(tok_arrays)
    lens = np.fromiter((len(a) for a in tok_arrays), dtype=np.int64, count=n_docs)
    out = np.full((n_docs, 2 * len(ns)), np.nan)
    total = int(lens.sum())
    if total:
        flat = np.concatenate(
            [np.asarray(a, dtype=object) for a in tok_arrays if len(a)]
        )
        codes = pd.factorize(flat)[0].astype(np.int64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        for j, n in enumerate(ns):
            tots = np.maximum(lens - n + 1, 0)
            if n > total:
                continue
            # combine n token codes into one gram key, re-factorizing each
            # step so values stay < #windows (no V**n overflow)
            key = codes[: total - n + 1]
            for k in range(1, n):
                nxt = codes[k : total - n + 1 + k]
                key = pd.factorize(key * np.int64(total + 1) + nxt)[0].astype(np.int64)
            d = doc_idx[: total - n + 1]
            valid = d == doc_idx[n - 1 : total]
            if not valid.any():
                continue
            nkey = int(key.max()) + 1
            wk = d[valid] * np.int64(nkey) + key[valid]  # doc-major
            wk_u, cnt = np.unique(wk, return_counts=True)
            gdoc = wk_u // nkey
            starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
            mx = np.maximum.reduceat(cnt, starts)
            dup = np.add.reduceat(np.where(cnt > 1, cnt, 0), starts)
            docs_here = gdoc[starts]
            with np.errstate(invalid="ignore", divide="ignore"):
                out[docs_here, 2 * j] = mx / tots[docs_here]
                out[docs_here, 2 * j + 1] = dup / tots[docs_here]
    return [
        [None if np.isnan(x) else float(x) for x in row] for row in out
    ]


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

    # r6: one shuffle-free Arrow pass computes every n's profile per doc
    # (see gram_fracs_np) — replaces explode + two gram aggregates + pivot
    # + join (3 shuffles of the gram stream)
    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _fracs(tok_arrays: pd.Series) -> pd.Series:
        return pd.Series(gram_fracs_np(tok_arrays, ns))

    with_fracs = base.select(
        "id", "n_lines", "line_dup_frac", _fracs("_toks").alias("_f")
    )
    return with_fracs.select(
        F.col("id").alias(id_col),
        "n_lines",
        "line_dup_frac",
        *[
            F.element_at("_f", 2 * j + 1).alias(f"top_{n}gram_frac")
            for j, n in enumerate(ns)
        ],
        *[
            F.element_at("_f", 2 * j + 2).alias(f"dup_{n}gram_frac")
            for j, n in enumerate(ns)
        ],
    )
