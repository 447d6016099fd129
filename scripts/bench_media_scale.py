"""Multimodal organic series: q110/q111 at 1x/10x/100x media volume.

The r7 verdict's empirical gap: the multimodal tier's 100 TB story
(one fused binaryFile scan, signature-only shuffles, postings-bounded
pairing) had no at-scale measurement — the committed fixtures are
~160 files. ``gen_media_fixtures.py --scale N --out <root>`` writes
seeded N-x media sets (same planting scheme, collision-proof id
bases); this script times q110/q111 against each root via the
``CDC_MEDIA_FIXTURES`` redirect and prints ONE JSON line per root:

    {"root": ..., "n_files": ..., "queries": {name: sec}}

min-of-3 after one warm pass (the binaryFile scan is the cold-cost
tail q110 showed at the r7 driver bench). Run each root in a FRESH
process: the fixture paths are bound at queries-module import.

Usage: python scripts/bench_media_scale.py <media_root> [...]
  e.g. python scripts/bench_media_scale.py fixtures /tmp/media_x10
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from cdc_makanmana_spark.plans.queries import QUERIES
from cdc_makanmana_spark.session import get_spark, release_materialized

spark = get_spark("media-bench")
spark.sparkContext.setLogLevel("ERROR")
root = os.environ["CDC_MEDIA_FIXTURES"]
out = {}
for name in ("q110_multimodal_neardup", "q111_video_neardup"):
    fn = QUERIES[name]
    best = float("inf")
    for i in range(4):  # pass 0 = warm (scan cache, JIT), then timed
        t0 = time.time()
        fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        release_materialized(spark)
        if i:
            best = min(best, dt)
    out[name] = round(best, 3)
n = len(os.listdir(os.path.join(root, "media")))
print(json.dumps({"root": root, "n_files": n, "queries": out}))
spark.stop()
"""


def main() -> None:
    roots = sys.argv[1:] or ["fixtures"]
    for root in roots:
        root = os.path.abspath(root)
        env = dict(os.environ, CDC_MEDIA_FIXTURES=root)
        subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": REPO}],
            env=env,
            check=True,
        )


if __name__ == "__main__":
    main()
