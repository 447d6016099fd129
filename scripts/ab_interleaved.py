"""Interleaved A/B timing harness (measurement infrastructure only).

Round-10 lesson: on this sandbox's drifting VM host, only INTERLEAVED
reps inside one session produce trustworthy deltas — two sequential
min-of-3 blocks can sit 2x apart. This harness runs variants
A/B/A/B/... with the noop sink, clearing SQL cache and checkpoint
blocks between reps, and prints min/median per variant plus the
bench's host calibration job so cross-session readers can normalize.

Usage: python scripts/ab_interleaved.py <probe_module.py> [reps] [sf_dir]

The probe module must define VARIANTS: dict[str, callable(spark,
sf_dir) -> DataFrame]; results are verified identical across variants
(collected + sorted) once before timing unless the module sets
VERIFY = False (e.g. when rows are too many to collect — verify
those via scripts/verify_local.py instead).
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_makanmana_spark.session import get_spark, release_materialized


def main() -> None:
    mod_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spec = importlib.util.spec_from_file_location("probe", mod_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    variants = mod.VARIANTS

    spark = get_spark("ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")

    if getattr(mod, "VERIFY", True):
        ref_name, ref_rows = None, None
        for name, fn in variants.items():
            rows = sorted(map(str, fn(spark, sf_dir).collect()))
            if ref_rows is None:
                ref_name, ref_rows = name, rows
            elif rows != ref_rows:
                raise SystemExit(
                    f"VARIANT MISMATCH: {name} != {ref_name} "
                    f"({len(rows)} vs {len(ref_rows)} rows)"
                )
        print(f"verified identical: {len(ref_rows)} rows x {len(variants)} variants")
        spark.catalog.clearCache()
        release_materialized(spark)

    # warm every variant once (codegen JIT) before the timed reps
    for name, fn in variants.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        release_materialized(spark)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{name}#{r}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            release_materialized(spark)
            spark._jvm.System.gc()

    cal = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "id % 1000 AS k", "id AS v"
        ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
        cal = min(cal, round(time.time() - t0, 3))

    print(f"calibration_sec={cal} sf_dir={sf_dir} reps={reps}")
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f} all={ts}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
