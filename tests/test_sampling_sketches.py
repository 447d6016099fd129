"""Tests for the round-4 additions: PIVOT rollup (q56), blocklist
scrubbing (q57), per-source cap sampling (q58), and the sketch-based
group stats (q59) — since r7 hash-certifiable: raw estimates are
engine-specific so q59 serves exact values plus in-bound flags; the
tests here pin that the exact columns equal the builtin aggregates and
that the flag arithmetic really discriminates."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from cdc_makanmana_spark.plans.queries import (
    _Q57_BLOCKLIST,
    _Q58_CAP,
    q56_lang_source_pivot,
    q57_blocklist_scrub,
    q58_source_cap_sample,
    q59_approx_group_sketches,
)
from tests.conftest import SF_DIR


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestPivot:
    def test_pivot_equals_long_form_counts(self, spark, sf_dir):
        wide = {r["source"]: r.asDict() for r in q56_lang_source_pivot(spark, sf_dir).collect()}
        long = (
            _docs(spark, sf_dir)
            .groupBy("source", "lang")
            .count()
            .collect()
        )
        for r in long:
            assert wide[r["source"]][r["lang"]] == r["count"]
        # every cell accounted for: row totals match n_docs
        for row in wide.values():
            assert sum(row[lg] for lg in ("de", "en", "es", "fr", "zh")) == row["n_docs"]


class TestBlocklistScrub:
    def test_counts_match_python_re(self, spark, sf_dir):
        pat = re.compile(r"\b(" + "|".join(_Q57_BLOCKLIST) + r")\b")
        got = {r["doc_id"]: r for r in q57_blocklist_scrub(spark, sf_dir).collect()}
        docs = _docs(spark, sf_dir).select("doc_id", "text").collect()
        for d in docs:
            hits = pat.findall(d["text"] or "")
            if not hits:
                assert d["doc_id"] not in got
                continue
            r = got[d["doc_id"]]
            assert r["n_redactions"] == len(hits)
            assert r["clean_len"] == len(pat.sub("[REDACTED]", d["text"]))


def _md5_bucket(key: str) -> int:
    """Python replay of operators.dedup.md5_hash64 pmod 100."""
    h = hashlib.md5(key.encode()).hexdigest()
    hi = int(h[:8], 16)
    if hi >= 2**31:
        hi -= 2**32
    v = hi * 2**32 + int(h[8:16], 16)
    return v % 100


class TestSourceCapSample:
    def test_membership_matches_python_replay(self, spark, sf_dir):
        docs = _docs(spark, sf_dir).select("doc_id", "source").collect()
        n_source: dict[str, int] = {}
        for d in docs:
            n_source[d["source"]] = n_source.get(d["source"], 0) + 1
        expected = {
            d["doc_id"]
            for d in docs
            if _md5_bucket(f"{d['doc_id']}:cap")
            < min(100, _Q58_CAP * 100 // n_source[d["source"]])
        }
        got = {r["doc_id"] for r in q58_source_cap_sample(spark, sf_dir).collect()}
        assert got == expected

    def test_partitioning_independent(self, spark, sf_dir):
        base = {r["doc_id"] for r in q58_source_cap_sample(spark, sf_dir).collect()}
        shuffled = (
            _docs(spark, sf_dir)
            .repartition(13, "lang")
            .createOrReplaceTempView("__q58_shuffled")
        )
        # re-run the same decision logic over the re-partitioned table
        from cdc_makanmana_spark.operators.dedup import md5_hash64

        d = spark.table("__q58_shuffled")
        counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
        keep = F.least(F.lit(100), F.expr(f"{_Q58_CAP * 100} div n_source"))
        bucket = F.pmod(
            md5_hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":cap"))),
            F.lit(100),
        )
        again = {
            r["doc_id"]
            for r in d.join(counts, "source").filter(bucket < keep).select("doc_id").collect()
        }
        assert again == base


class TestApproxSketches:
    def test_exact_columns_and_flags_true(self, spark, sf_dir):
        """q59's r7 certifiable form: served exact columns equal the
        builtin exact aggregates, and every in-bound flag is TRUE (the
        sketches honor their published contracts on real data)."""
        out = {r["l_returnflag"]: r for r in q59_approx_group_sketches(spark, sf_dir).collect()}
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pcts = F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))")
        exact = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag")
            .agg(
                pcts[0].alias("median"),
                pcts[1].alias("p90"),
                F.countDistinct("l_suppkey").alias("nd"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        assert set(out) == set(exact)
        for flag, e in exact.items():
            a = out[flag]
            assert a["median_price"] == round(e["median"], 4)
            assert a["p90_price"] == round(e["p90"], 4)
            assert a["n_suppliers"] == e["nd"]
            assert a["n_rows"] == e["n"]
            assert a["median_in_bound"] is True
            assert a["p90_in_bound"] is True
            assert a["distinct_in_bound"] is True

    def test_flag_flips_on_out_of_contract_sketch(self, spark, tmp_path):
        """The flags are a real check, not constants: the rank-bound
        predicate rejects an estimate whose rank error exceeds the
        contract (simulated by evaluating the bound arithmetic the
        query uses at its exact eps)."""
        # 1000 distinct values, eps = 2/10000 -> rank slack 0.2 rows:
        # any estimate more than 1 rank off the target must flag FALSE.
        # percentile_approx at accuracy 10000 over 1000 rows is exact,
        # so the query's own flags stay TRUE...
        df = spark.range(1000).select(
            F.lit("A").alias("l_returnflag"),
            (F.col("id") + 1).cast("double").alias("l_extendedprice"),
            (F.col("id") % 50).cast("int").alias("l_suppkey"),
            F.lit(1.0).alias("l_quantity"),
        )
        df.write.parquet(str(tmp_path / "lineitem.parquet"))
        row = q59_approx_group_sketches(spark, str(tmp_path)).collect()[0]
        assert row["median_in_bound"] and row["p90_in_bound"]
        assert row["n_suppliers"] == 50 and row["distinct_in_bound"]
        # ...and the same interval arithmetic scores a deliberately
        # broken estimate (rank 700 serving p50 of n=1000) as FALSE
        n, q, eps = 1000, 0.5, 2.0 / 10_000
        lo_rank, hi_rank = 700, 700
        assert not (hi_rank >= (q - eps) * n and lo_rank <= (q + eps) * n + 1)
