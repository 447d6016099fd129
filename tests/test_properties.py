"""Property-based tests (SURVEY.md §5.4): invariants that must hold on
ARBITRARY inputs, not just the fixtures — hypothesis drives the text
kernels and pagination through generated data.

Spark-session-per-example would be pathologically slow, so properties
over Spark run each hypothesis batch through ONE DataFrame (settings
cap examples accordingly); pure-python kernels (PPM/WAV) run at full
example counts.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_makanmana_spark.multimodal import kernels

# words that survive the cleaners' regexes unchanged
_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
_texts = st.lists(
    st.lists(_word, min_size=0, max_size=30).map(" ".join), min_size=1, max_size=8
)


@given(
    arr=st.tuples(
        st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**31 - 1)
    )
)
@settings(max_examples=50, deadline=None)
def test_ppm_round_trip_property(arr):
    h, w, seed = arr
    a = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert (kernels.decode_ppm(kernels.encode_ppm(a)) == a).all()


@given(
    n=st.integers(1, 4000),
    rate=st.sampled_from([8000, 16000]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_round_trip_property(n, rate, seed):
    s = np.random.default_rng(seed).uniform(-1, 1, n)
    back, got_rate = kernels.decode_wav_pcm16(kernels.encode_wav_pcm16(s, rate))
    assert got_rate == rate and len(back) == n
    assert np.abs(back - s).max() < 1e-3  # quantization bound


@given(texts=_texts)
@settings(max_examples=12, deadline=None)
def test_winnowing_containment_property(spark, texts):
    """The winnowing guarantee on arbitrary word soup: a text embedded
    inside a padded container shares at least one fingerprint with the
    container whenever the shared run reaches k + window - 1 words."""
    from cdc_makanmana_spark.functions.text import winnowing_fingerprints

    pad = " ".join(["pad%d" % i for i in range(8)])
    rows = [(i, t, f"{pad} {t} {pad}") for i, t in enumerate(texts) if t.strip()]
    if not rows:
        return
    df = spark.createDataFrame(rows, "i long, t string, padded string")
    out = df.select(
        "i",
        winnowing_fingerprints("t", k=5, window=4).alias("fp_t"),
        winnowing_fingerprints("padded", k=5, window=4).alias("fp_p"),
    ).collect()
    for r, (_, t, _) in zip(out, rows):
        if len(t.split()) >= 8:
            assert set(r.fp_t) & set(r.fp_p)


@given(
    keys=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50)), min_size=1, max_size=40
    )
)
@settings(max_examples=10, deadline=None)
def test_keyset_pagination_total_coverage_property(spark, keys):
    """page_after over ANY multiset of (dup-able) sort keys visits
    every row exactly once, in order — the uniqueness tail (id) must
    absorb arbitrary duplication in the visible sort key."""
    from cdc_makanmana_spark.engine import MakanmanaEngine

    rows = [(f"id{i}", f"n{k:02d}") for i, (k, _) in enumerate(keys)]
    eng = MakanmanaEngine(spark.createDataFrame(rows, "id string, name string"))
    expected = sorted(rows, key=lambda r: (r[1], r[0]))
    walked, after = [], None
    for _ in range(len(rows) + 1):
        page = eng.page_after(after, by="name", limit=3).df.collect()
        if not page:
            break
        walked.extend((r.id, r.name) for r in page)
        after = page[-1]
    assert walked == expected


@given(texts=_texts)
@settings(max_examples=10, deadline=None)
def test_exact_dedup_idempotence_property(spark, texts):
    """dedup_exact is idempotent and its survivors' normalized texts
    are pairwise distinct — on arbitrary word soup."""
    from cdc_makanmana_spark.operators.dedup import _norm_text, dedup_exact

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dedup_exact(df, "text", "doc_id")
    twice = dedup_exact(once, "text", "doc_id")
    a = sorted(r.doc_id for r in once.collect())
    assert a == sorted(r.doc_id for r in twice.collect())
    normed = [r.n for r in once.select(_norm_text(F.col("text")).alias("n")).collect()]
    assert len(normed) == len(set(normed))
