"""Physical-plan invariants (SURVEY.md §4): the scale rules are
asserted, not just documented. Every declared query must plan without
cartesian products or nested-loop joins, headline scans must push
filters and prune columns, and dim joins must broadcast."""

from __future__ import annotations

import pytest

from cdc_makanmana_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# q21 computes a FULL pairwise similarity matrix over a DISTINCT
# dictionary (p_type: ~150 values) — all-pairs is its output contract,
# so the cross join is inherent and bounded by dictionary cardinality,
# never by table size (the reference's abbreviation dictionary plays
# the same role). Everything else must block.
_ALL_PAIRS_BY_CONTRACT = {"q21_word_similarity"}


def test_no_query_plans_a_cross_join(spark):
    """The n² ban, engine-wide: no CartesianProduct, no
    BroadcastNestedLoopJoin in ANY declared query plan (except the
    explicitly dictionary-scale all-pairs contracts). Every fuzzy /
    similarity operator must get candidates from a blocked equi-join."""
    offenders = {}
    for name in QUERIES:
        if name in _ALL_PAIRS_BY_CONTRACT:
            continue
        plan = _plan(spark, name)
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if bad in plan:
                offenders.setdefault(name, []).append(bad)
    assert not offenders, f"quadratic join shapes found: {offenders}"


def test_q01_scan_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the 16-column lineitem scan reads only 7
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert read.count(":") - 1 <= 8 and "l_comment" not in read


def test_q03_join_tree_is_all_broadcast(spark):
    plan = _plan(spark, "q03_region_nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shingle_shuffle_moves_hashes_not_strings(spark):
    """The shingle shuffle must move 64-bit hashes, never shingle
    strings (the 100 TB shuffle-volume rule in ngram_jaccard_pairs).
    Checked on the operator's pre-materialization pipeline — inside
    q24 the localCheckpoint truncates the visible plan."""
    from pyspark.sql import functions as F

    from cdc_makanmana_spark.operators.dedup import word_shingles
    from cdc_makanmana_spark.tables import load_table

    d = load_table(spark, "documents", SF).select("doc_id", "text")
    sh = d.select(
        F.col("doc_id").alias("__id"),
        F.explode(word_shingles(F.col("text"), 3)).alias("__s"),
    ).select("__id", F.xxhash64("__s").alias("__sh"))
    plan = sh.groupBy("__sh").count()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "hashpartitioning(__sh" in plan
    assert "hashpartitioning(__s#" not in plan  # the string never shuffles


def test_topk_plans_take_ordered(spark):
    """orderBy().limit() must plan as TakeOrderedAndProject (per-
    partition top-k + driver merge), not a global sort."""
    plan = _plan(spark, "q11_topk_expensive_orders")
    assert "TakeOrderedAndProject" in plan
