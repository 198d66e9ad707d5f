"""Retrieval operators: BM25 vs an independent Python model,
inverted-index postings, blocked fuzzy matching, Bloom join pruning."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import Row, functions as F

from mock_map_reduce_spark.operators import bloom, retrieval as ir

CORPUS = [
    (0, "spark shuffles data fast"),
    (1, "spark spark spark joins data"),
    (2, "merge sort beats hash sort sometimes"),
    (3, "window functions rank rows"),
    (4, "the quick brown fox"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in CORPUS]
    )


def _py_bm25(terms, k1=1.2, b=0.75):
    toks = {i: [w for w in re.split(r"[^a-z]+", t.lower()) if w] for i, t in CORPUS}
    n = len(CORPUS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        score = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(v) / avgdl)))
        out[i] = round(score, 6)
    return out


def test_bm25_matches_python_model(docs):
    got = {r.doc_id: r.bm25 for r in ir.bm25_topk(docs, ("spark", "sort"), k=6).collect()}
    want = _py_bm25(("spark", "sort"))
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6), d


def test_bm25_rank_orders_by_score_then_id(docs):
    rows = ir.bm25_topk(docs, ("spark", "sort"), k=6).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, 7))
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 1 (3x spark) must outrank doc 0 (1x spark)
    by_doc = {r.doc_id: r.rank for r in rows}
    assert by_doc[1] < by_doc[0]


def test_bm25_is_bounded_heap_not_global_sort(docs):
    plan = ir.bm25_topk(docs, ("spark",), k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_inverted_index_postings_sorted_and_capped(docs):
    rows = {r.term: r for r in ir.inverted_index(docs, max_df=2, head=1).collect()}
    # 'spark' appears in docs 0 and 1 -> df=2, head=1 keeps only doc 0
    assert rows["spark"].df == 2
    assert rows["spark"].postings == "0"
    # 'data' in docs 0,1 -> kept; 'sort' df=1 (distinct docs) kept
    assert rows["sort"].df == 1 and rows["sort"].postings == "2"
    # df counts DISTINCT docs (doc 1 has spark 3x but df contribution 1)
    assert "the" in rows and rows["the"].df == 1


def test_inverted_index_max_df_drops_stop_terms(docs):
    all_terms = {r.term for r in ir.inverted_index(docs, max_df=400).collect()}
    capped = {r.term for r in ir.inverted_index(docs, max_df=1).collect()}
    assert "spark" in all_terms and "spark" not in capped
    assert capped < all_terms


def test_spelling_variants_blocked_pairs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="sort sorts short mort"),
            Row(doc_id=1, text="sort zebra"),
        ]
    )
    rows = {(r.word_a, r.word_b): r for r in ir.spelling_variants(docs).collect()}
    # same-block (s) pairs within edit 2
    assert ("sort", "sorts") in rows and rows[("sort", "sorts")].dist == 1
    assert ("short", "sorts") in rows or ("short", "sort") in rows
    # 'mort' is edit-1 from 'sort' but in block 'm' -> blocked out
    assert not any("mort" in p for p in rows)
    # df carried through: 'sort' occurs twice
    assert rows[("sort", "sorts")].df_a == 2


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    dim = spark.range(0, 50, 7).select(F.col("id").alias("k"))  # {0,7,...,49}
    fact = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    bitmap = bloom.bloom_bitmap(dim, "k", n_bits=1 << 12, n_hashes=3)
    pruned = bloom.bloom_prune(fact, bitmap, "k", n_bits=1 << 12, n_hashes=3)
    kept = {r.k for r in pruned.collect()}
    true_keys = {r.k for r in dim.collect()}
    assert true_keys <= kept  # no false negatives
    assert len(kept) < 5000  # really pruned
    # exact join result identical with and without the prune
    plain = sorted((r.k, r.v) for r in fact.join(dim, "k").collect())
    via_bloom = sorted((r.k, r.v) for r in pruned.join(dim, "k").collect())
    assert plain == via_bloom


def test_bloom_bitmap_is_one_broadcastable_row(spark):
    dim = spark.range(100).select(F.col("id").alias("k"))
    bm = bloom.bloom_bitmap(dim, "k", n_bits=1 << 12)
    rows = bm.collect()
    assert len(rows) == 1
    # map words cover at most n_bits/64 entries
    assert 0 < len(rows[0]["__bf"]) <= (1 << 12) // 64


def test_point_in_time_state_planted(spark):
    from mock_map_reduce_spark.operators import timeseries as ts
    from datetime import datetime

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    status = spark.createDataFrame(
        [
            Row(user_id=1, event_id=10, ts=t(10), event_type="signup"),
            Row(user_id=1, event_id=20, ts=t(20), event_type="error"),
            Row(user_id=2, event_id=30, ts=t(30), event_type="signup"),
        ]
    )
    facts = spark.createDataFrame(
        [
            Row(user_id=1, event_id=1, ts=t(5), event_type="purchase"),   # before any status
            Row(user_id=1, event_id=2, ts=t(10), event_type="purchase"),  # same instant as signup
            Row(user_id=1, event_id=3, ts=t(15), event_type="purchase"),
            Row(user_id=1, event_id=4, ts=t(25), event_type="purchase"),
            Row(user_id=2, event_id=5, ts=t(40), event_type="purchase"),
        ]
    )
    got = {r.event_id: r.status for r in ts.point_in_time_state(status, facts).collect()}
    assert got == {1: None, 2: "signup", 3: "signup", 4: "error", 5: "signup"}


def test_rrf_fusion_semantics(spark):
    # hand-built rank lists: doc 1 is rank 1 in BOTH lists; doc 2 is
    # rank 1 lexical only; doc 3 rank 2 semantic only. RRF must put the
    # both-lists doc first, and absent ranks contribute exactly 0.
    from pyspark.sql import functions as F

    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank_lex long")
    sem = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank_sem long")
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_lex")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_sem")), F.lit(0.0))
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .collect()
    )
    assert [r.doc_id for r in fused] == [1, 2, 3]
    assert abs(fused[0].rrf - 2 / 61) < 1e-15
    assert abs(fused[1].rrf - 1 / 62) < 1e-15


def test_rrf_catalog_query_is_bounded(spark, sf_dir):
    from mock_map_reduce_spark.catalog.retrieval import q_retrieval_hybrid_rrf, RRF_OUT

    out = q_retrieval_hybrid_rrf(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= RRF_OUT
    # deterministic across runs
    again = q_retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # Corpus-independent invariant: every fused doc carries at least
    # one rank. (The old "some doc appears in only ONE list" assertion
    # was data-dependent on the fixed testdata — round-8 ADVICE — and
    # is now pinned on a hand-built corpus in
    # test_rrf_fusion_semantics, where divergence is by construction.)
    assert all(r.rank_lex is not None or r.rank_sem is not None for r in rows)
