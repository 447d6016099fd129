"""Multi-column disjunctive text search (SURVEY.md F1/F2/F7).

Parity target: ``searchMerchants`` (reference:
src/utils/merchantUtils.ts:14-117). The reference scans the full table
in 1000-row chunks per keystroke; here the predicate is a single
disjunction Catalyst can evaluate under codegen — chunking disappears
into partition parallelism, and the filter is eligible for pushdown
into the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 6-digit postal token, reference: src/utils/merchantUtils.ts:25-26.
_POSTAL_RE = re.compile(r"\b(\d{6})\b")


def route_search_term(term: str) -> tuple[str, str | None]:
    """Query router: ('postal', code) when the term contains a 6-digit
    postal token, ('empty', None) for blank terms, else ('text', term).
    Mirrors merchantUtils.ts:22-34's branch structure.
    """
    t = term.strip()
    if not t:
        return ("empty", None)
    m = _POSTAL_RE.search(t)
    if m or re.fullmatch(r"\d{6}", t):
        return ("postal", m.group(1) if m else t)
    return ("text", t)


def multi_column_search(
    df: DataFrame,
    term: str,
    string_cols: list[str],
    array_cols: list[str] | None = None,
) -> DataFrame:
    """Disjunctive case-insensitive substring filter across columns.

    ``string_cols`` are matched via ``contains(lower(col), term)``; each
    ``array_cols`` entry matches when any element contains the term
    (merchantUtils.ts:90-101). Blank terms pass through unchanged
    (merchantUtils.ts:18-20). JS ``includes`` ≡ SQL ``contains`` —
    deliberately NOT ``LIKE`` so no wildcard-escaping divergence.
    """
    kind, payload = route_search_term(term)
    if kind == "empty":
        return df
    t = F.lit(term.strip().lower())
    pred: Column = F.lit(False)
    for c in string_cols:
        pred = pred | F.contains(F.lower(F.col(c)), t)
    for c in array_cols or []:
        pred = pred | F.exists(F.col(c), lambda x: F.contains(F.lower(x), t))
    return df.filter(pred)


def _norm_split(text_col) -> Column:
    """Whitespace/case-normalized token array (same explicit whitespace
    class as the dedup ladder — see dedup._norm_text for why not \\s)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text_col), r"[ \t\n\r\f\x0B]+", " ")), " "
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    corpus_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Okapi BM25 ranked search: top-k documents for a bag of query
    terms, scored ``Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))``
    with the Lucene idf ``ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Relevance RANKING the reference's substring search (F1) cannot
    express — the lexical-retrieval tier of a training-data/RAG
    pipeline. Plan shape at 100 TB:

    - tokens explode once; rows are immediately filtered to the query
      terms (a literal isin over a handful of strings — pushed inside
      the same codegen stage), so the per-(doc, term) aggregation
      shuffles only matching docs, not the corpus;
    - per-term document frequencies are a ``len(query_terms)``-row
      aggregate, joined back by BROADCAST;
    - ``avgdl`` is never materialized as a float: the normalization
      uses ``dl·N/total_dl`` from integer corpus stats, so a SQL
      oracle reproduces the arithmetic bit-for-bit;
    - ``corpus_stats=(n_docs, total_token_count)`` is the index-build
      artifact (the same role as q39/q48's cached quantizer): pass it
      to serve queries with zero driver round-trips, omit it and the
      operator computes it with one small aggregate job;
    - final top-k = round + TakeOrderedAndProject (no global sort),
      ties broken on ``id_col``.

    Only docs matching ≥ 1 term appear (blank/NULL texts never do).
    Returns (``id_col``, bm25) with bm25 rounded to 6 dp.
    """
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), _norm_split(F.col(text_col)).alias("__w"))
        .filter(F.col("__w") != F.array(F.lit("")))
        .withColumn("__dl", F.size("__w"))
    )
    if corpus_stats is None:
        n_docs, total_dl = base.agg(F.count("*"), F.sum("__dl")).first()
    else:
        n_docs, total_dl = corpus_stats
    if not n_docs or not total_dl:  # empty corpus: nothing can match
        return base.select(
            F.col("__id").alias(id_col), F.lit(0.0).alias("bm25")
        ).limit(0)

    tf = (
        base.select("__id", "__dl", F.explode("__w").alias("__t"))
        .filter(F.col("__t").isin([t.lower() for t in query_terms]))
        .groupBy("__id", "__dl", "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dft = tf.groupBy("__t").agg(F.count_distinct("__id").alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") * F.lit(n_docs) / F.lit(total_dl)
    )
    scored = (
        tf.join(F.broadcast(dft), "__t")
        .withColumn("__s", idf * F.col("__tf") / denom)
        .groupBy("__id")
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.desc("bm25"), F.asc("__id"))
        .limit(topk)
        .select(F.col("__id").alias(id_col), "bm25")
    )
