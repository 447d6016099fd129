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


def _hinted_broadcast_joins(spark, name: str) -> int:
    """Build the query with auto-broadcast OFF, so the only possible
    BroadcastHashJoins are ones pinned by an F.broadcast hint; return
    how many the physical plan contains."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))


def test_unbounded_sides_carry_no_broadcast_pin(spark):
    """customer scales with the dataset and a per-word vocabulary
    grows with the corpus (Heaps' law): neither may carry a pinned
    F.broadcast hint — at 100 TB a pinned hint is a driver/executor
    OOM regardless of what AQE would have chosen. Only the BOUNDED
    dims (nation 25 rows, region 5 rows — fixed by the data model)
    may be pinned. With auto-broadcast disabled the hinted joins are
    the only BroadcastHashJoins left, so the counts below are exact:
    q03 keeps nation+region (2), q36 keeps nation (1), q02/q69 keep
    none."""
    assert _hinted_broadcast_joins(spark, "q03_region_nation_revenue") == 2
    assert _hinted_broadcast_joins(spark, "q36_grouping_sets") == 1
    assert _hinted_broadcast_joins(spark, "q02_top_orders_by_segment") == 0
    assert _hinted_broadcast_joins(spark, "q69_source_distinctive_terms") == 0


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


def test_resolve_halal_never_hints_broadcast_of_fact_side(spark):
    """Round-2 verdict item: the match table in resolve_halal scales
    with the FACT side (one row per matched merchant), so it must not
    carry a broadcast hint — at 100x a pinned broadcast is an OOM.
    With auto-broadcast disabled, only HINTED sides can broadcast;
    assert the merchants<->matches join degrades to a shuffle join
    while the similarity join's establishment-DIM hint (legitimately
    dim-scale) is the only broadcast left in the plan."""
    from pyspark.sql import functions as F

    from cdc_makanmana_spark.engine import MakanmanaEngine

    merchants = spark.createDataFrame(
        [(f"m{i}", f"Merchant Shop {i}", f"{i} Road", f"4197{i:02d}") for i in range(30)],
        "id string, name string, address string, postalCode string",
    )
    dim = spark.createDataFrame(
        [(1, "Merchant Shop 1", "419701"), (2, "Merchant Shop 2", "419702")],
        "establishment_id long, name string, postal string",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        eng = MakanmanaEngine(merchants).enrich().resolve_halal(dim)
        plan = eng.df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # with auto-broadcast off, a broadcast can only come from a hint.
    # Every fact-preserving (LeftOuter) join must be shuffle-based —
    # the hinted broadcasts may only be the dim/dictionary Inner joins
    # inside similarity_join's tiers.
    assert "BroadcastHashJoin LeftOuter" not in plan
    assert "SortMergeJoin LeftOuter" in plan or "ShuffledHashJoin LeftOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q57_scrub_plans_shuffle_free(spark):
    """q57 is a pure scan→project→filter: any Exchange in its plan
    means the regex work left the embarrassingly parallel map pass."""
    plan = _plan(spark, "q57_blocklist_scrub")
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_q64_chunking_plans_shuffle_free(spark):
    """Chunking is pure per-row expansion: scan → generate → project.
    An Exchange would mean the word arrays (the whole corpus, widened
    by the overlap factor) shuffle for no semantic reason."""
    plan = _plan(spark, "q64_document_chunks")
    assert "Exchange" not in plan
    assert "explode(sequence" in plan


def test_q65_commonness_shuffles_hashes_not_bigrams(spark):
    """q65's window partitions by the 64-bit bigram hash — the bigram
    STRINGS must never be a shuffle key (same invariant the shingle
    ladder asserts): every hashpartitioning key is __h or the doc id."""
    import re

    plan = _plan(spark, "q65_bigram_commonness")
    for keys in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        first = keys.split("#")[0].strip()
        assert first in ("__h", "id", "doc_id"), f"string shuffle key: {keys}"


def test_q85_snm_plans_zero_joins(spark):
    """Sorted-neighborhood's whole point: candidates come from lead()
    windows, never a join — a join operator in the plan means the
    block-quadratic rn-range self-join crept back in."""
    plan = _plan(spark, "q85_sorted_neighborhood_neardup")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, f"SNM planned a {j}"
    assert "Window" in plan


def test_q84_histogram_bounds_attach_without_joins(spark):
    """The histogram's 1-row bounds must ride a scalar subquery: zero
    join operators, and exactly 2 scans of events (data + bounds) —
    per-reference scalar subqueries once planned 7 rescans."""
    import re

    plan = _plan(spark, "q84_equiwidth_histogram")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan
    # formatted mode prints each node in the tree AND the detail list —
    # count detail entries ("(n) Scan parquet") once
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_q88_wau_plans_no_join(spark):
    """Exact rolling WAU via sequence-explode contribution: the naive
    day-range self-join is the banned shape; the plan must be
    generate → distinct → aggregate with no join operator."""
    plan = _plan(spark, "q88_rolling_active_users")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan
    assert "explode(sequence" in plan


def test_q86_trend_is_single_aggregation_pass(spark):
    """The regr_* family must reduce to one partial+final aggregation
    over the scan: exactly one Exchange, no window, no join."""
    import re

    plan = _plan(spark, "q86_group_trend")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" not in plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan


def test_q77_pagerank_output_plan_is_cut(spark):
    """fixed_iter PageRank lineage-cuts every second step: the FINAL
    frame's visible plan must be shallow (a checkpoint scan + the last
    propagation segment), not 8 iterations of accumulated joins —
    bounded plan depth is what keeps iteration 100 as cheap as
    iteration 1."""
    import re

    plan = _plan(spark, "q77_pagerank_influence")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 6


def test_q58_count_side_broadcasts_fact_never_shuffles(spark):
    """q58's per-source counts (20 rows) must come back to the fact
    table as a broadcast join: the only Exchange allowed in the plan
    is the count aggregation's own 20-row shuffle, never a
    repartition of the documents fact side."""
    plan = _plan(spark, "q58_source_cap_sample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_q101_join_is_exchange_free_over_buckets(spark):
    """The declared co-bucketed join (q101): the orders×lineitem
    SortMergeJoin must consume the bucketed layout with NO Exchange on
    either input — the only shuffle in the plan is the final 5-row
    priority rollup."""
    import re

    plan = _plan(spark, "q101_cobucketed_revenue")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_q102_ts_predicate_reaches_the_scan(spark):
    """q102's window predicate must be pushed into the parquet scan of
    the range-sorted layout (PushedFilters on ts) — pushdown plus the
    clustered layout is what turns the scan cost window-proportional."""
    plan = _plan(spark, "q102_rangesorted_event_scan")
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_cobucketed_join_plans_without_exchange(spark, tmp_path):
    """Bucketed layout (sources/layout.py): two tables bucketed on the
    join key with equal bucket counts join with NO Exchange on either
    side — the write-time shuffle is reused by every later join. The
    unbucketed control plans two Exchanges on the same data."""
    from pyspark.sql import functions as F

    from cdc_makanmana_spark.sources.layout import read_table, write_bucketed
    from cdc_makanmana_spark.tables import load_table

    orders = load_table(spark, "orders", SF).select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            orders, "t_orders_b", ["o_orderkey"], n_buckets=4,
            sort_by=["o_orderkey"], path=str(tmp_path / "ob"),
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b", ["o_orderkey"], n_buckets=4,
            sort_by=["o_orderkey"], path=str(tmp_path / "lb"),
        )
        joined = read_table(spark, "t_orders_b").join(
            read_table(spark, "t_lineitem_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan

        control = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        cplan = control._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert cplan.count("Exchange") >= 2  # both sides re-shuffle every run

        # correctness unchanged by layout
        assert joined.count() == control.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """The 100 TB star-join layout: a fact table partitioned on the
    join key is pruned at RUNTIME by the dim side's filter (DPP) — the
    fact scan's partition filter must carry a dynamicpruning subquery,
    so only the dim-selected partitions are read at all."""
    from pyspark.sql import functions as F

    fact = str(tmp_path / "fact")
    spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") % 20).alias("k"),
        (F.col("id") * 2).alias("v"),
    ).write.partitionBy("k").parquet(fact)

    dim = spark.createDataFrame(
        [(i, "keep" if i in (3, 7) else "drop") for i in range(20)],
        "k long, tag string",
    )
    f = spark.read.parquet(fact)
    j = f.join(dim.filter(F.col("tag") == "keep"), "k").groupBy("k").agg(
        F.sum("v").alias("sv")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert j.count() == 2


def test_runtime_bloom_filter_prunes_shuffle_join_fact_side(spark, tmp_path):
    """Runtime (AQE-era) bloom-filter join pruning: when a selective
    dim filter feeds a shuffle join, Catalyst builds a bloom filter
    over the dim keys and applies it to the fact scan BEFORE the
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the ~matching sliver. The feature is
    on by default in the engine session
    (spark.sql.optimizer.runtime.bloomFilter.enabled); the default size
    gates (creation side <= 10 MB, application-side scan >= 10 GB) are
    exactly right at cluster scale and simply never fire on test
    fixtures — the test lowers the scan gate to prove the machinery
    engages the moment the fact side is big enough to matter."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 100_000).selectExpr("id", "id % 1000 AS k").write.parquet(fact_p)
    spark.range(0, 1000).selectExpr(
        "id AS k", "concat('d', id) AS name"
    ).write.parquet(dim_p)
    old_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1b",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.read.parquet(fact_p).join(
            spark.read.parquet(dim_p).filter("k % 100 = 0"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan  # built over the dim keys
        assert "might_contain" in plan     # applied on the fact side scan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_scan,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
