"""End-to-end lifecycle integration (SURVEY.md §3): EP2 cold start
(source with fallback → bronze), EP3 enrichment (bronze → silver →
snapshot cache), EP1 interactive query over the served silver table —
the whole reference app flow through the engine's layers."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_makanmana_spark.engine import MakanmanaEngine
from cdc_makanmana_spark.sources import SnapshotCache, load_with_fallback, with_retries

RAW_SCHEMA = (
    "id string, name string, address string, postalCode string, type string, "
    "LAT double, LON double, businessCategory string, "
    "filters struct<secondary: struct<budgetmeal: boolean>>"
)

RAW_ROWS = [
    ("m1", "Warung Hj Salleh Nasi Padang", "12 Eunos Rd", "419741",
     "HAWKER_HEARTLAND_MERCHANT", 1.3190, 103.9030, "food", ((True,),)),
    ("m2", "Golden Wok Char Siu Rice", "14 Eunos Rd", "419742",
     "HAWKER_HEARTLAND_MERCHANT", 1.3195, 103.9035, "food", ((False,),)),
    ("m3", "Prata Corner Al-Azhar", "16 Eunos Rd", "419743",
     "HAWKER_HEARTLAND_MERCHANT", 1.3200, 103.9040, "food", ((True,),)),
]


def test_cold_start_refresh_then_cached_serve(spark, tmp_path):
    """Cold start: primary source down → backup loads (with remap),
    EP3 enrichment runs once, snapshot cached; second load within TTL
    serves the cache without re-running the pipeline."""

    pipeline_runs = []

    def primary():
        raise RuntimeError("api down")  # reference: live API failure path

    def backup():
        # backup feed uses LAT/LON names already; add a missing column
        # the silver schema wants, exercising the defaults path
        return spark.createDataFrame(RAW_ROWS, RAW_SCHEMA)

    def refresh():
        pipeline_runs.append(1)
        bronze = load_with_fallback(primary, backup)
        return MakanmanaEngine(bronze).enrich().df

    cache = SnapshotCache(spark, str(tmp_path / "silver"), data_version="v1")
    t0 = 1_700_000_000.0

    silver = cache.load_or_refresh(refresh, now_s=t0)
    assert pipeline_runs == [1]
    assert {"cuisine", "isHalal", "halalSource"} <= set(silver.columns)

    # EP1 over the served table: search → filter → sort → page
    eng = MakanmanaEngine(silver)
    hits = eng.search("nasi").filter(halal_only=True).sort("name").page(0, 50).df.collect()
    assert [r.id for r in hits] == ["m1"]

    # warm start within TTL: no second pipeline run
    again = cache.load_or_refresh(refresh, now_s=t0 + 3600)
    assert pipeline_runs == [1]
    assert again.count() == 3

    # expiry: pipeline re-runs (the 24 h "nightly update" semantics)
    cache.load_or_refresh(refresh, now_s=t0 + 25 * 3600)
    assert pipeline_runs == [1, 1]


def test_retry_source_feeds_pipeline(spark):
    """A flaky source that succeeds on the last retry still feeds the
    enrichment pipeline; a dead source degrades to an empty (but
    correctly-shaped) silver table rather than failing the job."""
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return spark.createDataFrame(RAW_ROWS, RAW_SCHEMA)

    from pyspark.sql.types import StructType

    schema = spark.createDataFrame(RAW_ROWS, RAW_SCHEMA).schema
    bronze = with_retries(flaky, schema, spark, retries=3, backoff_s=(0.0, 0.0))
    silver = MakanmanaEngine(bronze).enrich().df
    assert silver.count() == 3

    def dead():
        raise RuntimeError("down")

    empty_bronze = with_retries(dead, schema, spark, retries=2, backoff_s=(0.0,))
    empty_silver = MakanmanaEngine(empty_bronze).enrich().df
    assert empty_silver.count() == 0
    assert "cuisine" in empty_silver.columns


def test_landing_to_silver_to_keyset_query(spark, tmp_path):
    """Full round-3 chain: LandingJob acquires through a dead-primary
    route chain into versioned bronze, enrichment builds silver into
    the snapshot cache, and the interactive path serves a keyset-
    paginated query — every layer on the Hadoop-FS bookkeeping path."""
    import json

    from cdc_makanmana_spark.sources import LandingJob, SnapshotCache, read_json_source

    feed = tmp_path / "feed.jsonl"
    feed.write_text(
        "\n".join(
            json.dumps(
                {
                    "id": r[0], "name": r[1], "address": r[2], "postalCode": r[3],
                    "type": r[4], "LAT": r[5], "LON": r[6], "businessCategory": r[7],
                    "filters": {"secondary": {"budgetmeal": r[8][0][0]}},
                }
            )
            for r in RAW_ROWS
        )
    )
    schema = spark.createDataFrame(RAW_ROWS, RAW_SCHEMA).schema

    def dead():
        df = spark.read.schema(schema).json(str(tmp_path / "gone.jsonl"))
        df.head(1)
        return df

    job = LandingJob(
        spark,
        routes=[dead, lambda: read_json_source(spark, str(feed), schema)],
        schema=schema,
        bronze_path=str(tmp_path / "bronze"),
        retries=1,
        backoff_s=(0.0,),
    )
    res = job.land(now_s=1_700_000_000.0)
    assert res.route == 1 and res.count == 3

    cache = SnapshotCache(spark, str(tmp_path / "silver"), data_version="v1")
    silver = cache.load_or_refresh(
        lambda: MakanmanaEngine(
            job.read_bronze().drop("_landed_at", "_source_route")
        ).enrich().df,
        now_s=1_700_000_000.0,
    )

    eng = MakanmanaEngine(silver)
    page1 = eng.sort("name").page_after(None, by="name", limit=2).df.collect()
    page2 = eng.sort("name").page_after(page1[-1], by="name", limit=2).df.collect()
    names = [r.name for r in page1 + page2]
    assert names == sorted(r[1] for r in RAW_ROWS)
    assert len(page1) == 2 and len(page2) == 1
