"""Bare-session driver simulation of the rotation window.

The external driver differs from scripts/verify_local.py in exactly
the two places round-6 failures hid: it runs queries under ITS OWN
SparkSession (none of get_spark's configs — UTC session timezone,
Arrow, AQE, broadcast threshold), and it canonicalizes through PANDAS
(DuckDB HUGEINT → float64 there, so an int64/float64 dtype divergence
hash-mismatches even when fetchall-based compares agree). This script
reproduces both: a bare local[32] session + a pandas-itertuples hash
over name-sorted columns, for the FIRST ``n`` entries of the rotated
``queries()`` (the driver's 50-query window by default).

Usage: python scripts/driver_sim.py [sf_dir] [n_window]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pandas_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    # DATE normalization: Spark's toPandas yields object columns of
    # datetime.date while DuckDB's .df() yields datetime64 — same
    # values, different reprs. The REAL driver certified DATE-output
    # queries across engines (q88, r5), so its canonicalizer
    # normalizes this; mirror it by lifting date objects to pandas
    # datetimes before hashing. (Kept narrow: only all-date object
    # columns — a mixed column should still hash-diverge loudly.)
    import datetime

    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            vals = df[c].dropna()
            # ALL values checked (r8 ADVICE: a head-sample would
            # silently coerce — or raise on — a column whose tail
            # isn't dates; sf0.01 scale makes the full scan free)
            if len(vals) and all(type(v) is datetime.date for v in vals):
                df[c] = pd.to_datetime(df[c])
    lines = sorted(
        "|".join(repr(v) for v in row[1:]) for row in df.itertuples()
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    # BARE session: deliberately none of get_spark's configs
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(queries)[:n_window]
    fails = []
    for name in window:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            hs, ho = pandas_hash(sdf), pandas_hash(odf)
            ok = len(sdf) == len(odf) and set(sdf.columns) == set(odf.columns) and hs == ho
            status = "ok  " if ok else "FAIL"
            if not ok:
                fails.append(name)
                detail = f" spark={len(sdf)}r/{hs} oracle={len(odf)}r/{ho}"
            else:
                detail = f" {len(sdf)} rows"
            print(f"{status} {name}:{detail} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # a window query must never throw driver-side
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
    print(f"{len(window) - len(fails)}/{len(window)} pass" + (f"; FAILS: {fails}" if fails else ""))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
