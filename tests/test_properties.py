"""Property-based tests (hypothesis) — SURVEY §5.4 invariants.

Each property runs a bounded number of examples (Spark roundtrips are
~0.1-0.5s each); the generators aim at tokenizer edge cases: unicode
noise, delimiter runs, case mixtures.
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from mock_map_reduce_spark.operators import wordcount as wc

TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from("abXY zÅ1!.,-\n\t'é"),
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def py_counts(lines):
    c = Counter()
    for line in lines:
        c.update(w for w in re.split(r"[^A-Za-z]+", line) if w)
    return dict(c)


@given(TEXTS)
@PROP_SETTINGS
def test_word_count_matches_reference_counter(spark, texts):
    df = spark.createDataFrame([Row(text=t) for t in texts])
    got = {r.word: r["count"] for r in wc.word_count(df).collect()}
    assert got == py_counts(texts)


@given(TEXTS)
@PROP_SETTINGS
def test_sum_of_counts_equals_token_count(spark, texts):
    df = spark.createDataFrame([Row(text=t) for t in texts])
    total = sum(r["count"] for r in wc.word_count(df).collect())
    assert total == sum(len([w for w in re.split(r"[^A-Za-z]+", t) if w]) for t in texts)


@given(TEXTS, st.integers(min_value=1, max_value=5))
@PROP_SETTINGS
def test_top_n_is_prefix_of_full_ordering(spark, texts, n):
    df = spark.createDataFrame([Row(text=t) for t in texts])
    full = sorted(
        ((r.word, r["count"]) for r in wc.word_count(df).collect()),
        key=lambda x: (-x[1], x[0]),
    )
    top = [(r.word, r["count"]) for r in wc.top_n(df, n=n).collect()]
    assert top == full[: min(n, len(full))]


ZPOINTS = st.lists(
    st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
    min_size=1, max_size=20, unique=True,
)


@given(ZPOINTS)
@PROP_SETTINGS
def test_zorder_key_is_injective_and_bounded(spark, pts):
    from pyspark.sql import functions as F

    from mock_map_reduce_spark.operators.layout import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    zs = [r.z for r in rows]
    assert len(set(zs)) == len(pts)              # injective on distinct inputs
    assert all(0 <= z < (1 << 24) for z in zs)   # 12+12 interleaved bits


CHUNK_TEXTS = st.lists(
    st.text(alphabet=st.sampled_from("ab c"), min_size=0, max_size=400),
    min_size=1, max_size=4,
)


@given(CHUNK_TEXTS, st.integers(2, 8), st.integers(1, 8))
@PROP_SETTINGS
def test_chunks_cover_every_token_in_order(spark, texts, chunk, stride_raw):
    from mock_map_reduce_spark.operators.text import chunk_documents

    stride = min(stride_raw, chunk)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    for i, t in enumerate(texts):
        toks = t.split()
        chunks = sorted(
            ((r.chunk_idx, r.chunk_text) for r in rows if r.doc_id == i)
        )
        # stride-prefixes of consecutive chunks reconstruct the doc exactly
        rebuilt = []
        for idx, (ci, ct) in enumerate(chunks):
            words = ct.split()
            rebuilt.extend(words if idx == len(chunks) - 1 else words[:stride])
        assert rebuilt == toks, (t, chunk, stride)
