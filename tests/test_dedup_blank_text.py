"""NULL/empty-text policy across the dedup ladder (round-3 verdict
item #4): textless docs participate in NO near-dup operator, the
policy lives in the OPERATORS (dedup._drop_blank_text), and the
declared queries stay hash-identical to their DuckDB oracles on a
fixture that actually contains NULL, empty, and whitespace-only texts
— the adversarial input the driver's fixtures never exercise."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

DEDUP_QUERIES = [
    "q23_minhash_lsh_neardup",
    "q24_ngram_jaccard_neardup",
    "q25_simhash_hamming_pairs",
    "q37_duplicate_clusters",
    "q40_winnowing_overlap",
    # round-4 corpus-hygiene queries: q49's shingle scan skips blank
    # texts entirely; q50's exact tier deliberately treats two blank
    # docs as identical content (dropped, hence absent from output)
    # while its near tier skips them
    "q49_benchmark_decontamination",
    "q50_dedup_incremental_batch",
]

# Planted content: two exact-dup pairs + one long-shared-passage pair so
# every ladder tier emits at least one row, plus blank-text adversaries.
_PASSAGE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronomers chart binary pulsars across the winter sky every night"
)
_DOCS = [
    (1, _PASSAGE, "en"),
    (2, _PASSAGE, "en"),                                   # exact dup of 1
    (3, _PASSAGE + " with an appended trailing clause", "en"),  # near dup
    (4, "completely different content about sourdough baking and "
        "hydration ratios measured in grams per loaf", "en"),
    (5, "completely different content about sourdough baking and "
        "hydration ratios measured in grams per loaf", "en"),  # exact dup of 4
    # blank-text adversaries — must never appear in any output
    (900, None, "en"),
    (901, None, "de"),
    (902, "", "en"),
    (903, "", "fr"),
    (904, "   \t \n ", "en"),
    (905, " \x0b  ", "en"),
]


@pytest.fixture(scope="module")
def blank_sf_dir(spark, tmp_path_factory):
    """A miniature sf-dir whose documents table carries blank texts."""
    sf = tmp_path_factory.mktemp("blank_sf")
    rows = [
        (i, t, lang, "unit", len(t) if t is not None else None)
        for i, t, lang in _DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    return str(sf)


def _oracle_rows(sf_dir: str, sql: str):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_dedup_query_matches_oracle_on_blank_text_fixture(spark, blank_sf_dir, name):
    from cdc_makanmana_spark.plans.queries import ORACLE_SQL, QUERIES

    sdf = QUERIES[name](spark, blank_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = _oracle_rows(blank_sf_dir, ORACLE_SQL[name])

    assert sorted(s_cols) == sorted(o_cols)
    assert _canon(s_cols, s_rows) == _canon(o_cols, o_rows)
    # the ladder genuinely fires on this fixture (empty == vacuous match)
    assert len(s_rows) >= 1
    # blank-text docs never participate, in any column
    blank_ids = {900, 901, 902, 903, 904, 905}
    for r in s_rows:
        assert not (set(r) & blank_ids)


def test_operator_level_policy_equals_prefiltering(spark):
    """The operators themselves (not the queries) drop blank texts:
    running each on the raw fixture equals running it on a manually
    pre-filtered one."""
    from cdc_makanmana_spark.operators.dedup import (
        minhash_near_duplicates,
        ngram_jaccard_pairs,
        simhash_buckets,
        winnowing_fingerprint_rows,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in _DOCS], "doc_id long, text string"
    )
    clean = df.filter(
        F.col("text").isNotNull()
        & (F.trim(F.regexp_replace(F.lower("text"), r"[ \t\n\r\f\x0B]+", " ")) != "")
    )

    for op in (
        lambda d: ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5),
        lambda d: minhash_near_duplicates(d, "text", "doc_id", threshold=0.5),
        lambda d: simhash_buckets(d, "text", "doc_id"),
        lambda d: winnowing_fingerprint_rows(d, "text", "doc_id"),
    ):
        raw = sorted(map(tuple, op(df).collect()))
        pre = sorted(map(tuple, op(clean).collect()))
        assert raw == pre and len(raw) >= 1
