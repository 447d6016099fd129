"""Per-query cost decomposition probe (diagnostic, not the bench).

For each declared query, splits warm cost into:
  t_build   — fn(spark, sf_dir): Python-side plan construction (py4j)
  t_plan    — analysis + optimization + physical planning (executedPlan)
  t_exec    — noop write (AQE re-plan + execution)

Usage: python scripts/probe_decompose.py [sf_dir] [q1,q2,...]
Prints one JSON line. Warm pass first (same sf) so artifact builds and
codegen JIT are out of the measured window; min of 2 measured passes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_makanmana_spark.plans.queries import QUERIES
from cdc_makanmana_spark.session import get_spark, release_materialized


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    queries = {k: v for k, v in QUERIES.items() if only is None or k in only}
    spark = get_spark("probe-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    for fn in queries.values():  # warm: artifacts + codegen
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    release_materialized(spark)

    out: dict[str, dict[str, float]] = {}
    for _ in range(2):
        for name, fn in queries.items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            cur = out.get(name)
            rec = {
                "build": round(t1 - t0, 3),
                "plan": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
            }
            if cur is None or rec["total"] < cur["total"]:
                out[name] = rec
            spark.catalog.clearCache()
            release_materialized(spark)
            spark._jvm.System.gc()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
