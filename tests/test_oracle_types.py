"""Oracle result-TYPE lint: no DuckDB output column may be a type that
pandas converts lossily or differently from Spark's collected rows.

Round-5 driver lesson (CORRECTNESS_r05.json): q72 and q93 hash-matched
under the local fetchall()-based comparator but MISMATCHED in the
driver, whose canonicalizer goes through pandas. DuckDB's sum(BIGINT)
returns HUGEINT (int128), and a HUGEINT column materializes in pandas
as float64 — so `version`/`n_events` hashed as `3.0` on the oracle
side against Spark's int64 `3`. The two failing queries were exactly
the only checked queries with a HUGEINT output column.

This test pins the class shut for every declared oracle: integer sums
must be CAST to BIGINT, decimal accumulators must surface as DOUBLE,
and intervals must be converted to numbers before the final SELECT.
"""

from __future__ import annotations

import duckdb
import pytest

from cdc_makanmana_spark.plans.queries import ORACLE_SQL
from cdc_makanmana_spark.tables import TABLE_NAMES

SF = "/root/testdata/sf0.001"

# DuckDB logical types whose pandas materialization diverges from the
# matching Spark collect()/toPandas() value (HUGEINT -> float64,
# DECIMAL -> object/Decimal, INTERVAL -> timedelta, TIME has no Spark
# analogue on our surface).
_BANNED_EXACT = {"HUGEINT", "UHUGEINT", "INTERVAL", "TIME"}
_BANNED_PREFIX = ("DECIMAL",)


def _lossy(t: str) -> bool:
    return t in _BANNED_EXACT or t.startswith(_BANNED_PREFIX)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_pandas_lossy_types(con):
    offenders = {}
    for name, sql in ORACLE_SQL.items():
        rel = con.sql(sql)
        bad = [
            (c, str(t)) for c, t in zip(rel.columns, rel.types) if _lossy(str(t))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle queries emit pandas-lossy DuckDB types (CAST the "
        f"column in the oracle SQL): {offenders}"
    )


def test_scd2_oracle_matches_engine_on_null_values_and_keys(spark, tmp_path):
    """The r6 review's latent classes, pinned on a crafted fixture the
    generator never produces: NULL event_type runs must collapse and
    x→NULL transitions must open a version IDENTICALLY in
    scd2_from_events and the shared _SCD2_PV_SQL oracle chain (q72 and
    q108 both ride it), and q108 must exclude NULL-user facts on both
    engines."""
    from pyspark.sql import functions as F

    from cdc_makanmana_spark.plans.queries import ORACLE_SQL, QUERIES

    rows = [
        # user 1: x → NULL → NULL → x  (NULL run collapses; both
        # transitions open versions)
        (1, "2024-01-01T00:00:00", 101, "x"),
        (1, "2024-01-01T01:00:00", 102, None),
        (1, "2024-01-01T02:00:00", 103, None),
        (1, "2024-01-01T03:00:00", 104, "x"),
        # user 2: first value NULL (must still open version 1)
        (2, "2024-01-01T00:30:00", 201, None),
        (2, "2024-01-01T01:30:00", 202, "purchase"),
        # NULL user: a real window group in Spark; q108 facts exclude it
        (None, "2024-01-01T00:45:00", 301, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, event_type string"
    ).select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )

    for name in ("q72_scd2_event_intervals", "q108_scd2_pit_join"):
        sdf = QUERIES[name](spark, str(tmp_path))
        s_rows = sorted(
            tuple(str(v) for v in r) for r in sdf.collect()
        )
        res = con.execute(ORACLE_SQL[name])
        # align column order to Spark's (both sides project explicitly)
        assert [d[0] for d in res.description] == sdf.columns
        d_rows = sorted(tuple(str(v) for v in r) for r in res.fetchall())
        assert s_rows == d_rows, f"{name} diverges on NULL semantics"

    # the NULL-run collapse itself: user 1 has exactly 3 versions
    q72 = QUERIES["q72_scd2_event_intervals"](spark, str(tmp_path))
    assert q72.filter(F.col("user_id") == 1).count() == 3
