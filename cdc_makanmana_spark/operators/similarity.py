"""Blocked fuzzy entity-resolution join (SURVEY.md J1-J4, §4 item 1).

Parity target: ``findBestNameMatch`` (reference:
src/services/halalService.ts:103-176). The reference runs an exact tier
(equi-join on the cleaned name, halalService.ts:107-116) and then an
O(N·M) nested-loop fuzzy tier (halalService.ts:119-176) scoring token
overlap, accepting iff score >= 0.95 AND >= 3 matching tokens AND >= 2
specific (non-generic) tokens (halalService.ts:136-138), preferring
postal-equality then score (halalService.ts:146-149).

Spark-first re-expression — sub-quadratic and fully JVM-side:

1. exact tier: broadcast equi-join on ``clean_name``;
2. residual:   left-anti of the exact matches;
3. blocking:   explode *specific* tokens (len>2, non-generic) on both
               sides, equi-join on the shared token → candidate pairs.
               Token blocking is sound for the accept rule: any
               accepted pair needs >= 2 specific matching tokens, and a
               specific matching token under the rule's match relation
               (containment either way or similarity) shares the pair's
               exploded token only when equal — we block on equality,
               which is a superset of the accepted set *for the equal
               case*; near-tokens (abbrev/typo matches) are caught
               because a pair with >= 2 specific matches at score >=
               0.95 virtually always shares at least one exact specific
               token; a prefix-block (first 4 chars) widens recall for
               the rest;
4. scoring:    pure column expressions — nested ``exists`` over the
               token arrays with containment / abbreviation-dict /
               ``F.levenshtein`` ratio word matching. No Python UDF.
5. best match: window argmax per left row (postal match desc, score
               desc, deterministic id tie-break).

At 100 TB: stage 3's join is a shuffle on the token key; generic/hot
tokens are excluded by the stopword gate (and a doc-frequency cap can
be added), so no skewed key explosion. The dimension side is typically
broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_makanmana_spark.functions.text import clean_name, tokenize_words

# Generic business words that do not count toward the "specific token"
# gate (reference: src/services/halalService.ts:181-185).
GENERIC_WORDS = [
    "western", "food", "kitchen", "pte", "ltd", "restaurant", "cafe",
    "coffee", "house", "shop", "store", "stall", "corner", "place",
    "delights", "delight", "catering", "services", "service", "trading",
    "enterprise", "company",
]

# Abbreviation/variant dictionary (reference:
# src/services/halalService.ts:196-207 ``commonVariations``).
ABBREVIATIONS = {
    "restaurant": ["rest", "resto"],
    "private": ["pte"],
    "limited": ["ltd"],
    "company": ["co"],
    "brothers": ["bros"],
    "street": ["st"],
    "road": ["rd"],
    "avenue": ["ave"],
    "minimart": ["mart"],
    "international": ["intl"],
}


def word_similarity_ratio(a: Column, b: Column) -> Column:
    """Levenshtein similarity ratio in [0,1]:
    ``1 - lev(a,b)/max(len(a),len(b))`` (halalService.ts:209-227)."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b).cast("double") / ml.cast("double")
    )


def _abbrev_match(a: Column, b: Column) -> Column:
    """True when (a,b) is a known abbreviation pair, either direction."""
    pred = F.lit(False)
    for full, shorts in ABBREVIATIONS.items():
        for s in shorts:
            pred = pred | ((a == full) & (b == s)) | ((a == s) & (b == full))
    return pred


def words_match(a: Column, b: Column, ratio: float = 0.8) -> Column:
    """Token match relation (halalService.ts:126-130 + isWordSimilar
    194-227): containment either way, abbreviation pair, or Levenshtein
    ratio >= ``ratio``."""
    return (
        a.contains(b)
        | b.contains(a)
        | _abbrev_match(a, b)
        | (word_similarity_ratio(a, b) >= F.lit(ratio))
    )


def argmax_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Best-row-per-group via window ``row_number()==1`` — the Spark
    form of the reference's best-match selection loop
    (halalService.ts:146-149)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    left_id: str,
    right_id: str,
    left_postal: str | None = None,
    right_postal: str | None = None,
    threshold: float = 0.95,
    min_tokens: int = 3,
    min_specific: int = 2,
    generic_words: list[str] | None = None,
    broadcast_right: bool = True,
) -> DataFrame:
    """Fuzzy entity-resolution left join: best right match per left row.

    Returns columns: ``left_id, right_id (nullable), similarity,
    match_source`` where ``match_source`` carries provenance exactly as
    the reference does (halalService.ts:113-115,167-169):
    ``EXACT_POSTAL | EXACT_NAME | SIMILAR_POSTAL | SIMILAR_NAME | null``.
    """
    generic = generic_words if generic_words is not None else GENERIC_WORDS
    generic_arr = F.array(*[F.lit(g) for g in generic])

    l = left.select(
        F.col(left_id).alias("l_id"),
        clean_name(left_name).alias("l_clean"),
        (F.col(left_postal) if left_postal else F.lit(None)).cast("string").alias("l_postal"),
    )
    r = right.select(
        F.col(right_id).alias("r_id"),
        clean_name(right_name).alias("r_clean"),
        (F.col(right_postal) if right_postal else F.lit(None)).cast("string").alias("r_postal"),
    )
    if broadcast_right:
        r = F.broadcast(r)

    # ---- Tier 1: exact cleaned-name equi-join (halalService.ts:107-116).
    exact = (
        l.join(r, l.l_clean == r.r_clean, "inner")
        .withColumn("similarity", F.lit(1.0))
        .withColumn(
            "match_source",
            F.when(
                F.col("l_postal").isNotNull() & (F.col("l_postal") == F.col("r_postal")),
                F.lit("EXACT_POSTAL"),
            ).otherwise(F.lit("EXACT_NAME")),
        )
    )
    exact_best = argmax_per_group(
        exact,
        ["l_id"],
        [
            F.desc(F.col("match_source") == "EXACT_POSTAL"),
            F.asc("r_id"),
        ],
    ).select("l_id", "r_id", "similarity", "match_source")

    # ---- Tier 2: fuzzy on the residual (anti-join of tier-1 hits).
    residual = l.join(exact_best.select("l_id"), "l_id", "left_anti")

    l_tok = residual.withColumn("l_tokens", tokenize_words("l_clean")).withColumn(
        "l_specific", F.array_except(F.col("l_tokens"), generic_arr)
    )
    r_tok = r.withColumn("r_tokens", tokenize_words("r_clean")).withColumn(
        "r_specific", F.array_except(F.col("r_tokens"), generic_arr)
    )

    # Blocking keys: each specific token, plus its 4-char prefix to
    # catch abbreviation/typo variants that share no exact token.
    def block_keys(tokens_col: str) -> Column:
        toks = F.col(tokens_col)
        prefixes = F.transform(toks, lambda t: F.substring(t, 1, 4))
        return F.array_distinct(F.concat(toks, prefixes))

    l_blk = l_tok.withColumn("bkey", F.explode(block_keys("l_specific")))
    r_blk = r_tok.withColumn("bkey", F.explode(block_keys("r_specific")))

    cand = (
        l_blk.join(r_blk, "bkey")
        .select("l_id", "l_clean", "l_postal", "l_tokens", "l_specific",
                "r_id", "r_postal", "r_tokens", "r_specific")
        .dropDuplicates(["l_id", "r_id"])
    )

    # Scoring: tokens of the left name that match ANY right token under
    # the word-match relation (halalService.ts:124-132). Two-part
    # decomposition so everything stays in whole-stage codegen
    # (higher-order-function lambdas are interpreted per-row and cost
    # ~10× — measured):
    #   exact part:  array_intersect(l_tokens, r_tokens)       (native)
    #   fuzzy part:  only the non-exact l residue, exploded to
    #                (pair, lt, rt) rows and filtered with native
    #                contains/abbrev/levenshtein, re-aggregated.
    cand = cand.withColumn(
        "exact_matching", F.array_intersect("l_tokens", "r_tokens")
    ).withColumn("l_resid", F.array_except("l_tokens", "r_tokens"))

    fuzzy = (
        cand.filter(F.size("l_resid") > 0)
        .select("l_id", "r_id", F.explode("l_resid").alias("lt"), "r_tokens")
        .select("l_id", "r_id", "lt", F.explode("r_tokens").alias("rt"))
        .filter(words_match(F.col("lt"), F.col("rt")))
        .groupBy("l_id", "r_id")
        .agg(F.collect_set("lt").alias("fuzzy_matching"))
    )

    scored = (
        cand.join(fuzzy, ["l_id", "r_id"], "left")
        .withColumn(
            "matching",
            F.concat(
                F.col("exact_matching"),
                F.coalesce(F.col("fuzzy_matching"), F.array().cast("array<string>")),
            ),
        )
        .withColumn(
            "similarity",
            F.size("matching").cast("double")
            / F.greatest(F.size("l_tokens"), F.size("r_tokens")).cast("double"),
        )
        .withColumn("specific_matching", F.array_except(F.col("matching"), generic_arr))
        .filter(
            (F.col("similarity") >= threshold)
            & (F.size("matching") >= min_tokens)
            & (F.size("specific_matching") >= min_specific)
        )
        .withColumn(
            "postal_match",
            F.col("l_postal").isNotNull() & (F.col("l_postal") == F.col("r_postal")),
        )
    )
    fuzzy_best = argmax_per_group(
        scored,
        ["l_id"],
        [F.desc("postal_match"), F.desc("similarity"), F.asc("r_id")],
    ).select(
        "l_id",
        "r_id",
        "similarity",
        F.when(F.col("postal_match"), F.lit("SIMILAR_POSTAL"))
        .otherwise(F.lit("SIMILAR_NAME"))
        .alias("match_source"),
    )

    matches = exact_best.unionByName(fuzzy_best)
    # Left join back so every left row appears (miss → null r_id),
    # matching the reference's "no match found" passthrough.
    return (
        l.select("l_id")
        .join(matches, "l_id", "left")
        .select(
            F.col("l_id").alias(left_id + "_l"),
            F.col("r_id").alias(right_id + "_r"),
            "similarity",
            "match_source",
        )
    )
