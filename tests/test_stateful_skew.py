"""Tests for the applyInPandasWithState stateful operator and the
skew-mitigation operators."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdc_makanmana_spark.operators.skew import salted_join, top_frequency_keys
from cdc_makanmana_spark.streaming import read_upsert_stream, running_stats_per_key

EVENT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _land(tmpdir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_stats_accumulates_across_micro_batches(spark, tmp_path):
    """Two files → two micro-batches (maxFilesPerTrigger=1): the second
    emission per key must include the first batch's contribution, i.e.
    state genuinely persists across batches."""
    src = str(tmp_path / "src")
    _land(src, "b1.json", [
        {"key": "a", "ts": "2024-01-01T00:00:00", "value": 1.5},
        {"key": "a", "ts": "2024-01-01T00:01:00", "value": 2.5},
        {"key": "b", "ts": "2024-01-01T00:02:00", "value": 10.0},
    ])
    _land(src, "b2.json", [
        {"key": "a", "ts": "2024-01-01T01:00:00", "value": 4.0},
    ])
    stream = read_upsert_stream(spark, src, EVENT_SCHEMA, max_files_per_trigger=1)
    stats = running_stats_per_key(stream)
    q = (
        stats.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM running_stats").collect()
    # latest emission per key = the final cumulative state
    latest = {}
    for r in rows:
        if r.key not in latest or r.n_events > latest[r.key].n_events:
            latest[r.key] = r
    a, b = latest["a"], latest["b"]
    assert a.n_events == 3 and abs(a.total_value - 8.0) < 1e-9
    assert str(a.last_ts).startswith("2024-01-01 01:00:00")
    assert b.n_events == 1 and abs(b.total_value - 10.0) < 1e-9
    # key 'a' was emitted once per micro-batch it appeared in
    assert sum(1 for r in rows if r.key == "a") == 2


def test_salted_join_matches_plain_join(spark):
    """Salting must be semantics-preserving: same rows out as the
    unsalted join, for inner and left joins, skewed key included."""
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(["hot"] * 50 + ["warm"] * 5 + ["miss"] * 3)],
        "k string, payload long",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("warm", "W"), ("cold", "C")], "k string, attr string"
    )
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k").select("k", "payload", "attr")
    assert sorted(plain.collect()) == sorted(salted.collect())

    plain_l = fact.join(dim, "k", "left").select("k", "payload", "attr")
    salted_l = salted_join(fact, dim, "k", how="left").select("k", "payload", "attr")
    assert sorted(map(tuple, plain_l.collect())) == sorted(map(tuple, salted_l.collect()))


def test_salted_join_spreads_hot_key(spark):
    fact = spark.createDataFrame([("hot", i) for i in range(200)], "k string, payload long")
    dim = spark.createDataFrame([("hot", "H")], "k string, attr string")
    salted = salted_join(fact, dim, "k", n_salts=8)
    # recompute the salt the operator derives: all 8 buckets used
    n_buckets = (
        fact.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_buckets == 8
    assert salted.count() == 200


def test_top_frequency_keys(spark):
    df = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    out = top_frequency_keys(df, "k", min_count=3).collect()
    assert [(r.k, r.n_rows) for r in out] == [("a", 10), ("b", 3)]


def test_asof_enrich_stream_within_and_across_batches(spark, tmp_path):
    """Streaming as-of (the continuous q44): probes resolve against
    the latest at-or-before update — within one micro-batch (updates
    sorted ahead of later probes, inclusive tie) AND across batches
    (batch-2 probes see batch-1 state); keys never leak; a probe
    before any update yields NULL observation."""
    from cdc_makanmana_spark.streaming.stateful import asof_enrich_stream

    tagged_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", TimestampType()),
            StructField("kind", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    _land(src, "b1.json", [
        {"key": "a", "ts": "2024-01-01T00:00:00", "kind": "probe", "value": None},
        {"key": "a", "ts": "2024-01-01T00:01:00", "kind": "update", "value": 1.0},
        {"key": "a", "ts": "2024-01-01T00:02:00", "kind": "probe", "value": None},
        {"key": "a", "ts": "2024-01-01T00:03:00", "kind": "update", "value": 2.0},
        {"key": "a", "ts": "2024-01-01T00:03:00", "kind": "probe", "value": None},
        {"key": "b", "ts": "2024-01-01T00:05:00", "kind": "probe", "value": None},
    ])
    _land(src, "b2.json", [
        {"key": "a", "ts": "2024-01-01T01:00:00", "kind": "probe", "value": None},
        {"key": "b", "ts": "2024-01-01T01:01:00", "kind": "update", "value": 9.0},
        {"key": "b", "ts": "2024-01-01T01:02:00", "kind": "probe", "value": None},
    ])
    stream = read_upsert_stream(spark, src, tagged_schema, max_files_per_trigger=1)
    out = asof_enrich_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.key, str(r.probe_ts)): (None if r.obs_ts is None else str(r.obs_ts), r.obs_value)
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    assert rows[("a", "2024-01-01 00:00:00")] == (None, None)          # nothing yet
    assert rows[("a", "2024-01-01 00:02:00")] == ("2024-01-01 00:01:00", 1.0)
    assert rows[("a", "2024-01-01 00:03:00")] == ("2024-01-01 00:03:00", 2.0)  # inclusive tie
    assert rows[("b", "2024-01-01 00:05:00")] == (None, None)          # key isolation
    # cross-batch: batch-2 probe sees batch-1 final state
    assert rows[("a", "2024-01-01 01:00:00")] == ("2024-01-01 00:03:00", 2.0)
    assert rows[("b", "2024-01-01 01:02:00")] == ("2024-01-01 01:01:00", 9.0)
    assert len(rows) == 6


def test_asof_enrich_stream_group_spanning_arrow_chunks(spark, tmp_path):
    """One key's micro-batch rows split across several Arrow chunks
    (arrow.maxRecordsPerBatch=2): a probe delivered in a LATER chunk
    with event time before an update from an EARLIER chunk must still
    resolve to the correct at-or-before update. The per-chunk-merge
    implementation carried only the single latest observation between
    chunks and answered this probe NULL/stale — the operator must
    materialize and sort the whole group before merging."""
    from cdc_makanmana_spark.streaming.stateful import asof_enrich_stream

    tagged_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", TimestampType()),
            StructField("kind", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    # file order (= chunk order): all updates first, probes with EARLIER
    # event times afterwards — every probe lands in a later chunk than
    # the update that answers it.
    _land(src, "b1.json", [
        {"key": "a", "ts": "2024-01-01T00:10:00", "kind": "update", "value": 5.0},
        {"key": "a", "ts": "2024-01-01T00:12:00", "kind": "update", "value": 6.0},
        {"key": "a", "ts": "2024-01-01T00:14:00", "kind": "update", "value": 7.0},
        {"key": "a", "ts": "2024-01-01T00:11:00", "kind": "probe", "value": None},
        {"key": "a", "ts": "2024-01-01T00:13:00", "kind": "probe", "value": None},
        {"key": "a", "ts": "2024-01-01T00:09:00", "kind": "probe", "value": None},
    ])
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = read_upsert_stream(spark, src, tagged_schema, max_files_per_trigger=1)
        out = asof_enrich_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("asof_chunked")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    rows = {
        str(r.probe_ts): (None if r.obs_ts is None else str(r.obs_ts), r.obs_value)
        for r in spark.sql("SELECT * FROM asof_chunked").collect()
    }
    assert rows["2024-01-01 00:09:00"] == (None, None)
    assert rows["2024-01-01 00:11:00"] == ("2024-01-01 00:10:00", 5.0)
    assert rows["2024-01-01 00:13:00"] == ("2024-01-01 00:12:00", 6.0)
    assert len(rows) == 3
