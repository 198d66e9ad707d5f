"""Unit tests for the flagship word-count operators (SURVEY §5.3-5.5).

Edge cases from FIXTURES.md §A: empty tokens dropped, case preserved,
non-alpha boundaries, deterministic top-N tie-break; golden invariant
sum(count) == token count via an independent collections.Counter.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import Row

from mock_map_reduce_spark.operators import wordcount as wc

FIXTURE_LINES = [
    "hello world hello",
    "it's a-b  c!!",
    "MiXeD MiXeD mixed",
    "123 ...",
    "",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(text=t) for t in FIXTURE_LINES])


def py_counts(lines):
    c = Counter()
    for line in lines:
        c.update(w for w in re.split(r"[^A-Za-z]+", line) if w)
    return dict(c)


def test_tokenize_edge_cases(docs):
    toks = [r.word for r in wc.tokenize(docs).collect()]
    assert sorted(toks) == sorted(
        ["hello", "world", "hello", "it", "s", "a", "b", "c", "MiXeD", "MiXeD", "mixed"]
    )
    assert "" not in toks  # empty tokens dropped at tokenize time (§1.4.2)


def test_word_count_matches_independent_counter(docs):
    got = {r.word: r["count"] for r in wc.word_count(docs).collect()}
    assert got == py_counts(FIXTURE_LINES)


def test_case_preserved(docs):
    got = {r.word: r["count"] for r in wc.word_count(docs).collect()}
    assert got["MiXeD"] == 2 and got["mixed"] == 1  # §1.4.5: no lowercasing


def test_top_n_deterministic_tiebreak(docs):
    rows = wc.top_n(docs, n=4).collect()
    # counts: hello=2, MiXeD=2, then six 1-count words; ties break word ASC
    assert [(r.word, r["count"]) for r in rows] == [
        ("MiXeD", 2),
        ("hello", 2),
        ("a", 1),
        ("b", 1),
    ]


def test_top_n_is_prefix_of_full_ordering(docs):
    full = wc.word_count(docs).orderBy("count", ascending=False).collect()
    top = wc.top_n(docs, n=3).collect()
    assert sum(r["count"] for r in full) == 11  # golden: sum == token count
    assert len(top) == 3
    full_sorted = sorted(full, key=lambda r: (-r["count"], r.word))
    assert [(r.word, r["count"]) for r in top] == [
        (r.word, r["count"]) for r in full_sorted[:3]
    ]


def test_rdd_contract_agrees_with_dataframe(docs):
    df_counts = {r.word: r["count"] for r in wc.word_count(docs).collect()}
    rdd_counts = {r.word: r["count"] for r in wc.word_count_rdd(docs).collect()}
    assert df_counts == rdd_counts


def test_range_partitioned_agrees(docs):
    base = {r.word: r["count"] for r in wc.word_count(docs).collect()}
    ranged = {
        r.word: r["count"] for r in wc.word_count_range_partitioned(docs).collect()
    }
    assert base == ranged


def test_on_real_documents(spark, sf_dir):
    from mock_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = wc.word_count(docs)
    total_tokens = counts.groupBy().sum("count").collect()[0][0]
    assert total_tokens > 0
    top = wc.top_n(docs, n=5).collect()
    assert len(top) == 5
    assert all(top[i]["count"] >= top[i + 1]["count"] for i in range(4))
