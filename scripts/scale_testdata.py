"""Synthesize an ~sf1 dataset from the driver's sf0.1 fixtures (perf
probe ONLY — correctness runs always use the driver-provided parquet).

Replicates each table ``factor`` times with per-copy key offsets so
join cardinalities per copy match the original (an order still finds
exactly its customer/lineitems; fan-outs scale linearly, as a real
larger SF would). Dims (region, nation) are shared, like TPC-H.

Text and embeddings are PERTURBED per copy — a salt word spliced into
the text, one embedding component nudged — because verbatim
replication would make every document a 10-way clone: the dedup-ladder
queries would then measure clone-cluster blowup (pairs grow
quadratically in the copy count), not corpus-scale behavior.

Usage: python scripts/scale_testdata.py [factor] [out_dir]
  defaults: factor=10, out_dir=/tmp/sf1_scaled
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_makanmana_spark.session import get_spark
from cdc_makanmana_spark.tables import TABLE_NAMES, load_table

SRC = "/root/testdata/sf0.1"

# key columns that get a per-copy offset (cross-table consistent)
KEYED = {
    "customer": ["c_custkey", "c_nationkey:keep"],
    "supplier": ["s_suppkey", "s_nationkey:keep"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ("region", "nation")  # dims: single copy


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_scaled"
    spark = get_spark("scale-testdata")
    spark.sparkContext.setLogLevel("ERROR")

    for name in TABLE_NAMES:
        df = load_table(spark, name, SRC)
        dst = os.path.join(out, f"{name}.parquet")
        if name in SHARED:
            df.write.mode("overwrite").parquet(dst)
            print(f"{name}: shared dim, {df.count()} rows")
            continue
        offsets = {}
        for spec in KEYED[name]:
            col, _, mode = spec.partition(":")
            if mode != "keep":
                # one pass over the SOURCE table per key family is
                # wrong for cross-table keys (l_orderkey must use
                # orders' max) — use the owning table's max
                owner = {
                    "o_custkey": "customer",
                    "l_orderkey": "orders",
                    "l_partkey": "part",
                    "l_suppkey": "supplier",
                }.get(col)
                src_col = {
                    "o_custkey": "c_custkey",
                    "l_orderkey": "o_orderkey",
                    "l_partkey": "p_partkey",
                    "l_suppkey": "s_suppkey",
                }.get(col, col)
                base = load_table(spark, owner, SRC) if owner else df
                offsets[col] = base.agg(F.max(src_col)).first()[0] + 1
        copies = []
        for i in range(factor):
            c = df
            for col, span in offsets.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * span))
            if name == "documents" and i > 0:
                # replace every 7th word with a copy+position salt:
                # shared runs between copies cap at 6 words (< the
                # k+window-1=8 winnowing guarantee) and shingle Jaccard
                # across copies drops to ~0.4 < the 0.8 thresholds, so
                # the dedup ladder sees a scaled corpus, not 10-way
                # clone clusters. Within-copy duplicates survive — the
                # workload keeps its dup structure at every scale.
                words = F.split(F.col("text"), " ")
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            words,
                            lambda w, j: F.when(
                                j % 7 == i % 7,
                                F.concat(F.lit(f"salt{i}x"), (j % 13).cast("string")),
                            ).otherwise(w),
                        ),
                        " ",
                    ),
                )
            if name == "embeddings" and i > 0:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when(j == 0, x + F.lit(float(i)) * 0.001).otherwise(x),
                    ),
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"{name}: x{factor} -> {spark.read.parquet(dst).count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
