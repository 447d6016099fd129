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
