"""Deduplication operators over document tables (north-star surface).

Four tiers, cheapest first — the standard large-corpus dedup ladder:

- exact:        md5 fingerprint of normalized text → groupBy. One
                shuffle on a short hash key; no skew (hashes uniform).
- n-gram Jaccard: shingle → explode → equi-join on shingle (blocking)
                → per-pair intersection counts → Jaccard. Never a
                cross join; hot shingles capped by document frequency.
- MinHash+LSH:  k permutations via seeded xxhash64 → band buckets →
                pairs only within a bucket.
- SimHash:      64-bit sign-aggregated token hashes; Hamming buckets.

The fuzzy-match kernel these generalize is the reference's
entity-resolution join (src/services/halalService.ts:119-176); dedup is
the self-join special case (SURVEY.md §2.4 closing note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_makanmana_spark.functions.text import doc_fingerprint
from cdc_makanmana_spark.operators.similarity import argmax_per_group


def _norm_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact-content group.

    md5-of-normalized-text groupBy: one hash-partitioned shuffle,
    map-side partial aggregation, uniform keys — the 100 TB-safe exact
    dedup. Returns the surviving rows.
    """
    fp = df.withColumn("__fp", doc_fingerprint(text_col))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "__fp"], "inner").drop("__fp")


def word_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles of normalized text (expression)."""
    words = F.split(_norm_text(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Blocked self-join: explode shingles, equi-join on the shingle (so
    only documents sharing at least one shingle ever meet), count the
    intersection per pair, and compute
    ``J = |A∩B| / (|A| + |B| - |A∩B|)``.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs — the skew guard at scale (a boilerplate shingle shared by
    10^6 docs would otherwise create a 10^12-row hot key).

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("__sh"),
    )
    if max_shingle_df is not None:
        freq = sh.groupBy("__sh").count().filter(F.col("count") <= max_shingle_df)
        sh = sh.join(freq.select("__sh"), "__sh", "left_semi")

    sizes = sh.groupBy("__id").agg(F.count("*").alias("__n"))

    a = sh.select(F.col("__id").alias("id_a"), "__sh")
    b = sh.select(F.col("__id").alias("id_b"), "__sh")
    common = (
        a.join(b, "__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__common"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__common").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per document: for seed i, min over shingles of
    ``xxhash64(shingle, i)``. Pure expressions — the per-seed min is an
    array ``transform``/``array_min`` over the shingle array, no
    explode, no shuffle.
    """
    shingles = word_shingles(F.col(text_col), shingle_n)

    # NB: factory (not ``lambda s, i=i``) — PySpark HOFs dispatch on the
    # lambda's arity, so a defaulted 2nd arg would receive the element
    # index instead of the seed.
    def hash_with_seed(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    sig = F.array(
        *[
            F.array_min(F.transform(shingles, hash_with_seed(i)))
            for i in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col).alias("__id"), sig.alias("signature"))


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """LSH-banded MinHash near-dup pairs.

    Signature → split into ``bands`` bands of ``num_hashes/bands`` rows
    → bucket key = hash(band values) → equi-join on (band, bucket) →
    candidate pairs → estimate Jaccard as the fraction of agreeing
    signature positions → filter.

    The only shuffles are the bucket equi-join and the final distinct —
    never O(N²). Returns (id_a, id_b, est_jaccard).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        "__id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("signature")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "signature", "bb.band", "bb.bucket")

    a = banded.select(
        F.col("__id").alias("id_a"), F.col("signature").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("__id").alias("id_b"), F.col("signature").alias("sig_b"), "band", "bucket"
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        pairs.withColumn("est_jaccard", agree.cast("double") / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_buckets(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64
) -> DataFrame:
    """SimHash per document: sign-aggregate token hash bits.

    For each bit position, sum +1/-1 over tokens according to the
    token's xxhash64 bit → bit set iff sum > 0. Implemented as array
    expressions over the token array — no explode, no shuffle; the
    result is a single BIGINT column suitable for Hamming-distance
    bucketing (join on 16-bit chunks for <= 4·k distance candidates).
    """
    tokens = F.array_distinct(F.split(_norm_text(F.col(text_col)), " "))
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    # Factory (not a defaulted lambda arg): see note in
    # ``minhash_signatures`` about HOF arity dispatch.
    def bit_vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for i in range(bits):
        # +1 when bit i of the token hash is set, else -1; sum over tokens.
        contrib = F.aggregate(hashes, F.lit(0), bit_vote(i))
        # bit 63 as a long would overflow 2**63; shiftleft keeps it in
        # two's-complement like a real sign-bit set.
        bit_cols.append(
            F.shiftleft(
                F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
                i,
            )
        )
    simhash = bit_cols[0]
    for b in bit_cols[1:]:
        simhash = simhash.bitwiseOR(b)
    return df.select(F.col(id_col).alias("__id"), simhash.alias("simhash"))


def dedup_keep_best(
    df: DataFrame, pair_df: DataFrame, id_col: str
) -> DataFrame:
    """Given near-dup pairs (id_a, id_b), drop the higher id of every
    pair (union-find-free approximation: keeps at least one doc per
    duplicate cluster; exact connected components would use graphframes
    or iterative joins — out of scope for v1)."""
    losers = pair_df.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
