"""Organic scale-factor generator (perf probe ONLY — correctness runs
always use the driver-provided parquet fixtures).

Unlike scripts/scale_testdata.py (key-offset replication of sf0.1 —
every value distribution appears exactly ``factor`` times), this
generates FRESH rows across the whole keyspace: every column is a
deterministic hash function of the row's key, so distributions are
organic at any size, reruns are bit-identical, and no fixture row is
copied. Value DOMAINS (mktsegments, brands, part types, event types,
document vocabulary, langs, sources) are read from the sf0.1 fixture's
distinct values so the generated data speaks the same dictionary the
declared queries filter/classify on; document text additionally mixes
in a synthetic token space that grows with the corpus (~n_docs/5 ids)
so shingle document-frequency follows a Heaps-law-ish curve instead of
saturating — see the vocabulary note at the documents section.

Planted structure mirrors the fixture's:
- documents: ~2% near-duplicates (an earlier doc's exact word sequence
  plus one appended salt word → Jaccard n/(n+2) ≈ 0.95) so the dedup
  ladder has real work;
- embeddings: 10 label clusters (hash-derived centroids + noise) and
  one planted near-identical pair per 400 vectors.

Usage: python scripts/gen_sf.py [factor] [out_dir]
  defaults: factor=10 (≈sf1), out_dir=/tmp/sf1_organic
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F

from cdc_makanmana_spark.session import get_spark
from cdc_makanmana_spark.tables import load_table

SRC = "/root/testdata/sf0.1"

# sf0.1 row counts (factor=10 → ≈sf1)
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

EPOCH_2024 = 1_704_067_200  # 2024-01-01 UTC, events window start


def u(*cols, salt: str) -> Column:
    """Deterministic uniform [0, 1) from key columns + a salt."""
    return F.pmod(F.xxhash64(*cols, F.lit(salt)), F.lit(1_000_000_000)) / 1.0e9


def pick(arr: list[str], *cols, salt: str) -> Column:
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(
        lit, (F.pmod(F.xxhash64(*cols, F.lit(salt)), F.lit(len(arr))) + 1).cast("int")
    )


def ids(spark, n: int, name: str):
    return spark.range(0, n, 1, 32).withColumnRenamed("id", name)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_organic"
    spark = get_spark("gen-sf")
    spark.sparkContext.setLogLevel("ERROR")

    n = {t: BASE[t] * factor for t in BASE}

    # --- dictionaries from the fixture (domains stay organic) ----------
    segs = [r[0] for r in load_table(spark, "customer", SRC).select("c_mktsegment").distinct().collect()]
    brands = [r[0] for r in load_table(spark, "part", SRC).select("p_brand").distinct().collect()]
    ptypes = [r[0] for r in load_table(spark, "part", SRC).select("p_type").distinct().collect()]
    pwords = [
        r[0]
        for r in load_table(spark, "part", SRC)
        .select(F.explode(F.split("p_name", " ")).alias("w")).distinct().collect()
    ]
    etypes = [r[0] for r in load_table(spark, "events", SRC).select("event_type").distinct().collect()]
    vocab = [
        r[0]
        for r in load_table(spark, "documents", SRC)
        .select(F.explode(F.split("text", " ")).alias("w")).distinct().collect()
        if r[0]
    ]
    sources = [r[0] for r in load_table(spark, "documents", SRC).select("source").distinct().collect()]
    # fixture lang mix ≈ en 0.41, others ~0.15 each
    langs = ["en", "en", "en", "zh", "es", "fr", "de"]

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows")

    # --- shared dims ----------------------------------------------------
    for t in ("region", "nation"):
        write(load_table(spark, t, SRC), t)

    # --- customer / supplier / part ------------------------------------
    c = ids(spark, n["customer"], "c_custkey")
    write(
        c.select(
            "c_custkey",
            F.format_string("Customer#%09d", F.col("c_custkey")).alias("c_name"),
            F.pmod(F.xxhash64("c_custkey", F.lit("cn")), F.lit(25)).cast("int").alias("c_nationkey"),
            F.round(u(F.col("c_custkey"), salt="cb") * 9000 + 1000, 2).alias("c_acctbal"),
            pick(segs, F.col("c_custkey"), salt="cs").alias("c_mktsegment"),
        ),
        "customer",
    )
    s = ids(spark, n["supplier"], "s_suppkey")
    write(
        s.select(
            "s_suppkey",
            F.format_string("Supplier#%09d", F.col("s_suppkey")).alias("s_name"),
            F.pmod(F.xxhash64("s_suppkey", F.lit("sn")), F.lit(25)).cast("int").alias("s_nationkey"),
            F.round(u(F.col("s_suppkey"), salt="sb") * 9000 + 1000, 2).alias("s_acctbal"),
        ),
        "supplier",
    )
    p = ids(spark, n["part"], "p_partkey")
    write(
        p.select(
            "p_partkey",
            F.concat_ws(
                " ", pick(pwords, F.col("p_partkey"), salt="pw1"), pick(pwords, F.col("p_partkey"), salt="pw2")
            ).alias("p_name"),
            pick(brands, F.col("p_partkey"), salt="pb").alias("p_brand"),
            pick(ptypes, F.col("p_partkey"), salt="pt").alias("p_type"),
            (F.pmod(F.xxhash64("p_partkey", F.lit("ps")), F.lit(50)) + 1).cast("int").alias("p_size"),
            F.round(F.lit(900.0) + F.col("p_partkey") % 1000 / 10.0, 2).alias("p_retailprice"),
        ),
        "part",
    )

    # --- orders / lineitem ---------------------------------------------
    o = ids(spark, n["orders"], "o_orderkey").select(
        "o_orderkey",
        F.pmod(F.xxhash64("o_orderkey", F.lit("oc")), F.lit(n["customer"])).alias("o_custkey"),
        pick(["O", "F", "P"], F.col("o_orderkey"), salt="os").alias("o_orderstatus"),
        F.round(u(F.col("o_orderkey"), salt="op") * 499000 + 1000, 2).alias("o_totalprice"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            F.pmod(F.xxhash64("o_orderkey", F.lit("od")), F.lit(2404)).cast("int"),
        ).cast("timestamp").alias("o_orderdate"),
        pick(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            F.col("o_orderkey"), salt="opr",
        ).alias("o_orderpriority"),
    )
    write(o, "orders")

    li = (
        o.select("o_orderkey", "o_orderdate")
        .withColumn(
            "l_linenumber",
            F.explode(
                F.sequence(
                    F.lit(1),
                    (F.pmod(F.xxhash64("o_orderkey", F.lit("nl")), F.lit(7)) + 1).cast("int"),
                )
            ),
        )
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit("lp")), F.lit(n["part"])).alias("l_partkey"),
            F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit("ls")), F.lit(n["supplier"])).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit("lq")), F.lit(50)) + 1)
            .cast("double").alias("l_quantity"),
            F.round(u(F.col("o_orderkey"), F.col("l_linenumber"), salt="le") * 104000 + 900, 2)
            .alias("l_extendedprice"),
            F.round(
                F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit("ld")), F.lit(11)) / 100.0, 2
            ).alias("l_discount"),
            F.round(
                F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit("lt")), F.lit(9)) / 100.0, 2
            ).alias("l_tax"),
            pick(["A", "N", "R"], F.col("o_orderkey"), F.col("l_linenumber"), salt="lr").alias("l_returnflag"),
            pick(["O", "F"], F.col("o_orderkey"), F.col("l_linenumber"), salt="ll").alias("l_linestatus"),
            F.date_add(
                F.col("o_orderdate").cast("date"),
                (F.pmod(F.xxhash64("o_orderkey", "l_linenumber", F.lit("lsd")), F.lit(95)) + 1).cast("int"),
            ).cast("timestamp").alias("l_shipdate"),
        )
    )
    write(li, "lineitem")

    # --- events ---------------------------------------------------------
    e = ids(spark, n["events"], "event_id")
    write(
        e.select(
            "event_id",
            F.timestamp_micros(
                F.lit(EPOCH_2024 * 1_000_000)
                + (u(F.col("event_id"), salt="ets") * 30 * 86400 * 1_000_000).cast("long")
            ).alias("ts"),
            F.pmod(F.xxhash64("event_id", F.lit("eu")), F.lit(15 * factor)).alias("user_id"),
            pick(etypes, F.col("event_id"), salt="ee").alias("event_type"),
            F.round(u(F.col("event_id"), salt="ev") * 560, 2).alias("value"),
            F.format_string(
                '{"k": %d}', F.pmod(F.xxhash64("event_id", F.lit("ep")), F.lit(100)).cast("int")
            ).alias("props"),
        ),
        "events",
    )

    # --- documents (planted ~2% near-dups) ------------------------------
    # Vocabulary must GROW with the corpus (Heaps' law), or scale
    # probes go vacuous: with the fixture's ~50-word dictionary alone,
    # by 30x every 3-shingle's document frequency exceeds the dedup
    # ladder's hot-key cap, ALL shingles get dropped, and q24/q37/q67/
    # q95 return zero rows (measured: q24 15k pairs at 10x, 0 at 30x —
    # their "speedup" was vacuity, not scaling). Each word position
    # draws 50/50 from the fixture dictionary (keeps filter/classifier
    # /BM25 queries non-vacuous) or from a synthetic id space sized
    # ~n_docs/5, so rare shingles exist at any factor and planted
    # near-dup pairs stay discoverable through below-cap shingles.
    n_syn = max(n["documents"] // 5, 100)

    def words_of(idc: Column) -> Column:
        nw = (F.pmod(F.xxhash64(idc, F.lit("dn")), F.lit(66)) + 15).cast("int")

        def one_word(i: Column) -> Column:
            fixture = F.element_at(
                F.array(*[F.lit(w) for w in vocab]),
                (F.pmod(F.xxhash64(idc, F.lit("dw"), i), F.lit(len(vocab))) + 1).cast("int"),
            )
            synth = F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(idc, F.lit("dsyn"), i), F.lit(n_syn)).cast("string"),
            )
            return F.when(
                F.pmod(F.xxhash64(idc, F.lit("dmix"), i), F.lit(2)) == 0, fixture
            ).otherwise(synth)

        return F.transform(F.sequence(F.lit(1), nw), one_word)

    d = ids(spark, n["documents"], "doc_id")
    is_dup = F.pmod(F.col("doc_id"), F.lit(50)) == 49
    base_id = F.when(
        is_dup, F.col("doc_id") - 1 - F.pmod(F.xxhash64("doc_id", F.lit("db")), F.lit(40))
    ).otherwise(F.col("doc_id"))
    text = F.array_join(
        F.when(
            is_dup,
            F.concat(words_of(base_id), F.array(pick(vocab, F.col("doc_id"), salt="dx"))),
        ).otherwise(words_of(F.col("doc_id"))),
        " ",
    )
    write(
        d.select(
            "doc_id",
            text.alias("text"),
            pick(langs, base_id, salt="dl").alias("lang"),
            pick(sources, F.col("doc_id"), salt="ds").alias("source"),
        ).withColumn("n_chars", F.length("text")),
        "documents",
    )

    # --- embeddings (label clusters + 1 planted dup pair per 400) -------
    def vec_of(idc: Column, labc: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (u(labc, i, salt="ec") * 2 - 1) * 0.75  # label centroid component
                + (u(idc, i, salt="en") - 0.5)          # per-vector noise
            ).cast("float"),
        )

    v = ids(spark, n["embeddings"], "vec_id")
    is_vdup = F.pmod(F.col("vec_id"), F.lit(400)) == 399
    vbase = F.when(is_vdup, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    label = F.pmod(F.xxhash64(vbase, F.lit("el")), F.lit(10)).cast("int")
    base_vec = vec_of(vbase, label)
    vec = F.when(
        is_vdup,
        F.transform(base_vec, lambda x: (x + F.lit(0.005)).cast("float")),
    ).otherwise(base_vec)
    write(
        v.select("vec_id", vec.alias("embedding"), label.alias("label")),
        "embeddings",
    )

    print(f"done -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
