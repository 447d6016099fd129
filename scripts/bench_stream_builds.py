"""Build-vs-serve split for the streaming replay queries (q103-q107).

The r6 verdict asked for the streaming layer's ORGANIC series to split
the one-time artifact build (stage ranged files -> run the Structured
Streaming query -> promote) from the steady-state serve (a parquet
scan of the materialized result), at 1x/10x/100x, so the scaling law
of the build side is a named number instead of a verify-log footnote.

Forces cold builds by pointing CDC_ARTIFACT_DIR at a fresh temp dir
(unless the caller pinned one), so committed artifacts from earlier
sessions can't turn a "build" timing into a scan. Prints ONE JSON
line: {"sf_dir": ..., "queries": {name: {"build_s": ..., "serve_s":
...}}}. build_s includes the first serve scan (the query function is
build-through-serve by design); serve_s is min-of-2 on the committed
artifact.

Usage: python scripts/bench_stream_builds.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cold_root = os.environ.get("CDC_ARTIFACT_DIR")
    if not cold_root:
        cold_root = tempfile.mkdtemp(prefix="cdc_stream_bench_")
        os.environ["CDC_ARTIFACT_DIR"] = cold_root

    from cdc_makanmana_spark.plans.queries import QUERIES
    from cdc_makanmana_spark.session import get_spark, release_materialized

    names = [
        "q103_stream_upsert_merge",
        "q104_stream_rollup_serve",
        "q105_stream_interval_join",
        "q106_stream_stateful_asof",
        "q107_stream_dedup",
    ]
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        build = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        release_materialized(spark)
        serve = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            serve = min(serve, round(time.time() - t0, 3))
            spark.catalog.clearCache()
            release_materialized(spark)
        out[name] = {"build_s": build, "serve_s": serve}
        spark._jvm.System.gc()

    print(
        json.dumps(
            {"sf_dir": sf_dir, "artifact_dir": cold_root, "queries": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
