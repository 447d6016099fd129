"""Corpus preparation operators: chunking and corpus-statistics
scoring — the prep stages between raw documents and training batches
(complements the dedup ladder in operators/dedup.py and the per-doc
quality metrics in functions/text.py).

Reference parity note: the reference has no training-pipeline surface
(it is a client-side search app); these belong to the engine's
north-star extension set (SURVEY.md §2.10), declared as q64/q65.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_makanmana_spark.operators.dedup import (
    _drop_blank_text,
    _norm_text,
    _spread,
    md5_hash64,
)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-window word chunking (the RAG / context-window
    prep stage): each document's normalized word array is cut into
    chunks of ``window`` words whose starts advance by ``stride``
    (overlap = window - stride). Returns
    (``id_col``, chunk_id, n_chunk_words, chunk_text).

    Scale shape: pure per-row expansion — scan → generate(sequence
    explode) → project, ZERO shuffles (plan-asserted in
    tests/test_plans.py); parallelism is the input split count, state
    is one row's word array. The containment filter
    ``start - stride + window - 1 < n_words`` drops tail starts whose
    chunk the previous chunk already covers, so chunk_ids stay
    contiguous from 0 (the predicate is monotone in start).

    Blank/NULL texts are dropped — the dedup ladder's blank policy
    (``_drop_blank_text``), and chunking's natural one: there is
    nothing to pack.
    """
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would skip words between chunks"
        )
    d = _drop_blank_text(df, text_col)
    base = d.select(
        F.col(id_col),
        F.split(_norm_text(F.col(text_col)), " ").alias("__w"),
    ).withColumn("__n", F.size("__w"))
    st = F.col("__st")
    return (
        base.select(
            id_col,
            "__w",
            "__n",
            F.explode(F.sequence(F.lit(1), F.col("__n"), F.lit(stride))).alias(
                "__st"
            ),
        )
        .filter((st == 1) | (st - stride + window - 1 < F.col("__n")))
        .select(
            id_col,
            F.expr(f"(__st - 1) div {int(stride)}").alias("chunk_id"),
            F.expr(f"size(slice(__w, __st, {int(window)}))")
            .cast("long")
            .alias("n_chunk_words"),
            F.expr(f"array_join(slice(__w, __st, {int(window)}), ' ')").alias(
                "chunk_text"
            ),
        )
    )


def bigram_commonness(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Corpus-LM commonness score (the CCNet-style statistical quality
    signal without an external LM): per document, the average corpus
    frequency of its word bigrams (with multiplicity). Boilerplate
    scores high — its bigrams appear everywhere; garbled or
    out-of-domain text scores low. Returns
    (``id_col``, n_bigrams, sum_freq, avg_bigram_freq).

    Join-free: corpus frequencies come from ONE window count over the
    exploded bigram frame partitioned by the 64-bit bigram hash (an
    8-byte shuffle key — bigram strings never shuffle), then a per-doc
    rollup. The score is an exact integer sum divided once, so there
    is no FP accumulation-order noise (oracle-hashable). Hashing is
    md5-derived (``md5_hash64``) so any engine replays it; a 64-bit
    collision would merge two bigrams' counts identically everywhere.

    Docs with fewer than two words produce no row (no bigrams — the
    caller treats absence as "no signal", same as the ladder's blank
    policy).
    """
    d = df.filter(F.col(text_col).isNotNull())
    words = F.split(_norm_text(F.col(text_col)), " ")
    base = _spread(d).select(
        F.col(id_col), words.alias("__w"), F.size(words).alias("__n")
    )
    bi = (
        base.filter(F.col("__n") >= 2)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__n") - 1),
                    lambda i: F.array_join(F.slice(F.col("__w"), i, 2), " "),
                )
            ).alias("__b"),
        )
        .select(id_col, md5_hash64(F.col("__b")).alias("__h"))
    )
    c = F.count(F.lit(1)).over(Window.partitionBy("__h"))
    return (
        bi.select(id_col, c.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__c").alias("sum_freq"),
            F.round(
                F.sum("__c").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_bigram_freq"),
        )
    )
