"""Curation operators: deterministic sampling, splits, packing, top-k."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mock_map_reduce_spark.operators import curation as cu


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(["tok"] * n), lang)
        for i, (n, lang) in enumerate(
            [(3, "en"), (7, "en"), (2, "de"), (5, "de"), (1, "en"), (4, "de")]
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _md5(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


def test_hash_sample_matches_python_md5(docs):
    kept = {r.doc_id for r in cu.hash_sample(docs, keep_lt="80").collect()}
    expect = {i for i in range(6) if _md5(i)[:2] < "80"}
    assert kept == expect
    # stability: same predicate, same rows, run twice
    assert kept == {r.doc_id for r in cu.hash_sample(docs, keep_lt="80").collect()}


def test_split_assign_total_and_disjoint(docs):
    out = cu.split_assign(docs).select("doc_id", "split").collect()
    assert len(out) == 6  # every doc assigned exactly once
    by_doc = {r.doc_id: r.split for r in out}
    for i, s in by_doc.items():
        b2 = _md5(i)[:2]
        assert s == ("train" if b2 < "cc" else "val" if b2 < "e6" else "test")


def test_pack_sequences_greedy_bins(spark):
    # one shard (same hash nibble not guaranteed -> force via single doc ids
    # sharing a nibble is fiddly; instead verify per-shard invariants)
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 600)) for i in range(8)], "doc_id long, text string"
    )
    out = cu.pack_sequences(docs, budget=1024).collect()
    assert all(r.n_toks == 600 for r in out)
    # within each shard, bin_id = tokens-before div 1024 in doc_id order
    from collections import defaultdict

    shards = defaultdict(list)
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        shards[r.shard].append(r)
    for rows in shards.values():
        before = 0
        for r in rows:
            assert r.bin_id == before // 1024
            before += r.n_toks


def test_shuffled_head_is_hash_order_prefix(docs):
    out = cu.shuffled_head(docs, n=3).collect()
    expect = sorted(range(6), key=lambda i: (_md5(i), i))[:3]
    assert [r.doc_id for r in out] == expect


def test_topk_per_group_bounded_and_ordered(docs):
    scored = docs.select("doc_id", "lang", F.col("doc_id").cast("double").alias("s"))
    out = cu.topk_per_group(scored, "lang", "s", k=2).collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append((r.rn, r.doc_id))
    # top-2 by score desc with id tie-break, per group
    assert sorted(per["en"]) == [(1, 4), (2, 1)]
    assert sorted(per["de"]) == [(1, 5), (2, 3)]


def test_mixture_sample_rates(spark):
    from pyspark.sql import Row

    rows = [Row(doc_id=i, source="a" if i % 2 == 0 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows)
    kept = cu.mixture_sample(df, {"a": 1.0, "b": 0.0}).collect()
    assert all(r.source == "a" for r in kept)
    assert len(kept) == 500  # rate 1.0 keeps every row of the group
    # default rate applies to unlisted groups; ~25% of b kept, deterministic
    kept2 = cu.mixture_sample(df, {"a": 1.0}, default_rate=0.25).collect()
    n_b = sum(1 for r in kept2 if r.source == "b")
    assert 80 <= n_b <= 170  # 500 * 0.25 = 125 expected, md5-deterministic
    # re-run is bit-identical
    assert sorted(r.doc_id for r in kept2) == sorted(
        r.doc_id for r in cu.mixture_sample(df, {"a": 1.0}, default_rate=0.25).collect()
    )


def test_per_group_quantile_floor(spark):
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, grp="a", score=float(i)) for i in range(8)
    ] + [Row(doc_id=100 + i, grp="b", score=float(10 * i)) for i in range(5)]
    df = spark.createDataFrame(rows)
    kept = cu.per_group_quantile_floor(df, "grp", "score", 25, 100)
    got = {(r.grp, r.doc_id) for r in kept.collect()}
    # group a: n=8 -> rank (7*25)//100+1 = 2 -> threshold = score 1.0 -> keep ids 1..7
    assert {(g, d) for g, d in got if g == "a"} == {("a", i) for i in range(1, 8)}
    # group b: n=5 -> rank (4*25)//100+1 = 2 -> threshold = 10.0 -> keep 101..104
    assert {(g, d) for g, d in got if g == "b"} == {("b", 100 + i) for i in range(1, 5)}


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from mock_map_reduce_spark.operators import curation as cu

    docs = spark.createDataFrame(
        [(i, 10 if i != 7 else 1_000_000) for i in range(100)],
        "doc_id long, n_chars long",
    )
    a = [r.doc_id for r in cu.weighted_sample(docs, 10).collect()]
    b = [r.doc_id for r in cu.weighted_sample(docs, 10).collect()]
    assert a == b  # reproducible across runs
    # A ~100000x weight makes doc 7's score ~0: it must be sampled.
    assert 7 in a


def test_weighted_sample_plan_is_bounded_topk(spark):
    from mock_map_reduce_spark.operators import curation as cu

    docs = spark.createDataFrame([(i, 10) for i in range(50)], "doc_id long, n_chars long")
    plan = cu.weighted_sample(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # bounded heap, no global sort


def test_temperature_mixture_quotas_and_determinism(spark):
    # 100 docs in a 70/20/10 source split: sqrt-temperature flattening
    # must give the small sources MORE than their proportional share of
    # the 10-doc budget (that is the entire point of alpha-sampling).
    import math

    sizes = {"web": 70, "books": 20, "code": 10}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = cu.temperature_mixture(docs, budget_den=10).collect()

    w = {s: math.isqrt(n) for s, n in sizes.items()}  # 8, 4, 3
    denom, budget = sum(w.values()), 100 // 10
    expect_quota = {s: min(sizes[s], budget * w[s] // denom) for s in sizes}
    got = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + 1
    assert got == {s: q for s, q in expect_quota.items() if q > 0}
    # flatter than proportional: code holds 10% of the corpus but gets
    # 2/10 of the budget (proportional would round to 1)
    assert got["code"] > sizes["code"] * budget // 100
    # exact member determinism: lowest-md5 ids per source, twice
    ids = sorted(r.doc_id for r in out)
    again = sorted(r.doc_id for r in cu.temperature_mixture(docs, 10).collect())
    assert ids == again
    per_src = {s: [] for s in sizes}
    for r_ in rows:
        per_src[r_[1]].append(r_[0])
    for s, q in expect_quota.items():
        want = sorted(per_src[s], key=lambda d: (_md5(d), d))[:q]
        assert sorted(d for d in ids if d in set(per_src[s])) == sorted(want)


def test_group_split_keeps_groups_atomic(spark):
    # every doc of a source must land in ONE split — the leakage-safe
    # property the group-keyed assignment exists for
    rows = [(i, f"dom{i % 7}") for i in range(70)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = cu.split_assign(docs, id_col="source").select("source", "split").collect()
    seen = {}
    for r in out:
        seen.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in seen.values())
    for src, splits in seen.items():
        b2 = _md5_str(src)[:2]
        want = "train" if b2 < "cc" else "val" if b2 < "e6" else "test"
        assert splits == {want}


def _md5_str(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_epoch_upsample_full_and_remainder(spark):
    # books at 2.5 epochs over 4 docs -> quota 10 = 2 full epochs + 2
    # remainder docs; web at 1/2 epoch over 6 docs -> quota 3, no full
    # epoch, 3 lowest-md5 docs at epoch 0.
    rows = [(i, "books") for i in range(4)] + [(10 + i, "web") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = cu.epoch_upsample(docs, {"books": (5, 2)}, default_rate=(1, 2)).collect()
    books = [(r.doc_id, r.epoch) for r in out if r.source == "books"]
    web = [(r.doc_id, r.epoch) for r in out if r.source == "web"]
    assert len(books) == 10 and len(web) == 3
    # every books doc appears at epochs 0 and 1
    for d in range(4):
        assert (d, 0) in books and (d, 1) in books
    # remainder: the 2 lowest-md5 books docs at epoch 2
    rem_expect = sorted(range(4), key=lambda d: (_md5(d), d))[:2]
    assert sorted(d for d, e in books if e == 2) == sorted(rem_expect)
    # web: 3 lowest-md5 docs, all at epoch 0
    web_expect = sorted(range(10, 16), key=lambda d: (_md5(d), d))[:3]
    assert sorted(d for d, e in web) == sorted(web_expect)
    assert all(e == 0 for _, e in web)


def test_temperature_mixture_single_source_degenerates_to_budget(spark):
    # one source: w = denom, so the quota is exactly the global budget
    docs = spark.createDataFrame([(i, "only") for i in range(40)], "doc_id long, source string")
    out = cu.temperature_mixture(docs, budget_den=10).collect()
    assert len(out) == 4  # 40 div 10
    expect = sorted(range(40), key=lambda d: (_md5(d), d))[:4]
    assert sorted(r.doc_id for r in out) == sorted(expect)


def test_epoch_upsample_zero_rate_drops_source(spark):
    # p=0 -> quota 0 -> a source can be excluded entirely by its rate
    rows = [(i, "keep") for i in range(4)] + [(10 + i, "drop") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = cu.epoch_upsample(docs, {"keep": (1, 1), "drop": (0, 1)}).collect()
    assert {r.source for r in out} == {"keep"}
    # exactly one full epoch of 'keep', no remainder
    assert sorted((r.doc_id, r.epoch) for r in out) == [(i, 0) for i in range(4)]
