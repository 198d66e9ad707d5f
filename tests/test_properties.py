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
