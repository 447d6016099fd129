"""Local mimic of the driver's DuckDB oracle diff.

Runs every declared query through Spark and its oracle SQL through
DuckDB on the same sf dir; compares row count, column-name set, and an
order-insensitive value hash. Usage:

    python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_makanmana_spark.session import get_spark, release_materialized
from cdc_makanmana_spark.tables import TABLE_NAMES
from cdc_makanmana_spark.plans.queries import ORACLE_SQL, QUERIES


def norm_value(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision: the driver's canonicalizer hashes raw values,
        # and a 9-dp round here masked exactly the ulp-class divergences
        # it flags. The whole declared surface is bit-equal between
        # engines (round-6 strict sweep, 100/100), so this costs nothing
        # and keeps the local gate at least as strict as the driver's.
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: verify_local.py [sf_dir] [query ...] [--json OUT]")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        sys.exit(f"sf_dir {sf_dir!r} is not a directory")
    only = set(argv[1:])
    spark = get_spark("verify-local")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        # driver fixtures are single files; gen_sf probe tables are
        # Spark-written DIRECTORIES — glob the parts in that case so
        # organic-scale dirs can be oracle-verified too
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    # driver-CORRECTNESS-shaped record per query (plus sec/rows_only
    # extras) so a full sweep can be committed as CORRECTNESS_local_r{N}
    records: dict[str, dict] = {}

    def record(name, **kw):
        base = {
            "err": None,
            "spark_rows": None,
            "oracle_rows": None,
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
        }
        base.update(kw)
        records[name] = base

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            record(name, err=f"spark: {e}"[:500], sec=round(time.time() - t0, 2))
            continue
        finally:
            # drop the finished query's localCheckpoint blocks so the
            # 100-plan sweep doesn't accumulate them (same boundary
            # release bench.py does)
            release_materialized(spark)
        # The driver's canonicalizer pandas-sorts every column; container
        # types (array/map/struct) are unhashable there even though this
        # script's norm_value can stringify them. Flag them as failures so
        # local verification matches the driver's strictness (q22 round-1
        # lesson: passed here, red in CORRECTNESS_r01).
        container = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if container:
            print(f"FAIL {name}: driver-unhashable container columns {container}")
            failures.append(name)
            record(
                name,
                err=f"container columns {container}",
                spark_rows=len(s_rows),
                sec=round(time.time() - t0, 2),
            )
            continue
        if name not in ORACLE_SQL:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            record(
                name,
                spark_rows=len(s_rows),
                rows_only=True,
                sec=round(time.time() - t0, 2),
            )
            continue
        try:
            res = con.execute(ORACLE_SQL[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            record(
                name,
                err=f"duckdb: {e}"[:500],
                spark_rows=len(s_rows),
                sec=round(time.time() - t0, 2),
            )
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={s_cols} duck={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
            if hs != hd:
                problems.append(f"hash {hs} != {hd}")
                # show a sample diff
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {"|".join(norm_value(r[i]) for i in order_s) for r in s_rows}
                set_d = {"|".join(norm_value(r[i]) for i in order_d) for r in d_rows}
                for x in list(set_s - set_d)[:3]:
                    problems.append(f"  spark-only: {x}")
                for x in list(set_d - set_s)[:3]:
                    problems.append(f"  duck-only:  {x}")
        rows_match = len(s_rows) == len(d_rows)
        schema_match = sorted(s_cols) == sorted(d_cols)
        record(
            name,
            spark_rows=len(s_rows),
            oracle_rows=len(d_rows),
            rows_match=rows_match,
            schema_match=schema_match,
            hash_match=not problems if (rows_match and schema_match) else False,
            sec=round(time.time() - t0, 2),
        )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")

    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(records)} records)")

    ran = [n for n in QUERIES if not only or n in only]
    # name the failures in the summary: per-query FAIL lines can be
    # visually swallowed by Spark's progress-bar carriage returns when
    # stderr is merged, and a filtered/tailed log keeps only this line
    tail = f"; FAILING: {' '.join(failures)}" if failures else ""
    print(f"\n{len(ran) - len(failures)}/{len(ran)} pass{tail}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
