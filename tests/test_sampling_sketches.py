"""Tests for the round-4 additions: PIVOT rollup (q56), blocklist
scrubbing (q57), per-source cap sampling (q58), and the sketch-based
group stats (q59) — the last pinned against exact aggregates within
the estimators' published error bounds, since q59 deliberately has no
DuckDB oracle (estimator internals are engine-specific)."""

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
    def test_estimates_within_bounds_of_exact(self, spark, sf_dir):
        est = {r["l_returnflag"]: r for r in q59_approx_group_sketches(spark, sf_dir).collect()}
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
        assert set(est) == set(exact)
        for flag, e in exact.items():
            a = est[flag]
            # HLL++ at rsd=0.01: allow 5% (5 sigma)
            assert abs(a["n_suppliers_est"] - e["nd"]) <= max(2, 0.05 * e["nd"])
            # percentile_approx with accuracy 10k on small groups is
            # near-exact; allow 1% relative drift on the price scale
            assert abs(a["median_price_est"] - e["median"]) <= 0.01 * e["median"]
            assert abs(a["p90_price_est"] - e["p90"]) <= 0.01 * e["p90"]
            assert a["n_rows"] == e["n"]
