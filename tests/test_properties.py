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


# --- codec round-trip properties (no Spark session needed) -----------------

_DIMS = st.tuples(st.integers(1, 12), st.integers(1, 10))


@settings(max_examples=60, deadline=None)
@given(_DIMS, st.data())
def test_ppm_bmp_roundtrip_any_raster(dims, data):
    from mock_map_reduce_spark.operators import multimodal as mm

    w, h = dims
    rgb = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
        )
    )
    assert mm.decode_ppm(mm.encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert mm.decode_bmp(mm.encode_bmp(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 96000), st.lists(st.integers(-32768, 32767), max_size=64))
def test_wav_roundtrip_any_pcm(rate, samples):
    from mock_map_reduce_spark.operators import multimodal as mm

    for extra in (False, True):
        got = mm.decode_wav(mm.encode_wav(rate, samples, extra_chunk=extra))
        assert got == (rate, samples)


@settings(max_examples=30, deadline=None)
@given(st.lists(_DIMS, min_size=1, max_size=5), st.data())
def test_ppm_stream_roundtrip_any_frames(dims_list, data):
    from mock_map_reduce_spark.operators import multimodal as mm

    frames, payload = [], b""
    for i, (w, h) in enumerate(dims_list):
        rgb = bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
            )
        )
        frames.append((w, h, rgb))
        payload += mm.encode_ppm(w, h, rgb, comment=f"f{i}" if i % 2 else None)
    assert mm.decode_ppm_stream(payload) == frames


@given(
    st.dictionaries(st.integers(0, 12), st.text("ab", max_size=2), max_size=8),
    st.dictionaries(
        st.integers(0, 12),
        st.tuples(st.sampled_from("UID"), st.text("xy", max_size=2)),
        max_size=8,
    ),
)
@PROP_SETTINGS
def test_merge_into_matches_dict_model(spark, base_map, feed_map):
    """merge_into == the dict model of MERGE with upsert-on-insert:
    U and I both write the key's value, D removes it — one row per key
    afterwards, never a duplicate (the compacted-CDC apply contract)."""
    from pyspark.sql import Row

    from mock_map_reduce_spark.operators.relational import merge_into

    base = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in base_map.items()], "k int, v string"
    )
    changes = spark.createDataFrame(
        [Row(k=k, v=v, op=op) for k, (op, v) in feed_map.items()],
        "k int, v string, op string",
    )
    expect = dict(base_map)
    for k, (op, v) in feed_map.items():
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v
    rows = merge_into(base, changes, "k").collect()
    assert len(rows) == len({r.k for r in rows})  # one row per key
    assert {r.k: r.v for r in rows} == expect


# Word-soup generator for the set-similarity properties: a tiny shared
# vocabulary maximizes shingle collisions (the adversarial regime for
# prefix filtering — every gram is common, prefixes collide a lot).
_WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=0,
    max_size=12,
)
CORPORA = st.lists(_WORDS, min_size=2, max_size=7)


@given(CORPORA, st.sampled_from([0.3, 0.5, 0.8]))
@PROP_SETTINGS
def test_prefix_filter_lossless_on_random_corpora(spark, corpora, t):
    """The PPJoin prefix prune must lose NO pair at any threshold on
    arbitrary small-vocabulary corpora (the collision-heavy worst
    case) — output identical to the exhaustive share-any-gram join,
    including when docs are empty, identical, or sub-shingle-length."""
    from mock_map_reduce_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(corpora)]
    )
    exact = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in dd.ngram_jaccard_pairs(docs, threshold=t).collect()
    }
    pf = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in dd.prefix_filter_jaccard_pairs(docs, threshold=t).collect()
    }
    assert pf == exact


@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=25),
)
@PROP_SETTINGS
def test_ks_prefix_sum_matches_bisect_model(spark, s1, s2):
    """The range-partitioned KS construction equals the textbook
    bisect-based statistic on arbitrary integer samples (ties across
    and within cohorts included)."""
    import bisect

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [Row(v=float(v), pre=1) for v in s1] + [Row(v=float(v), pre=0) for v in s2]
    df = spark.createDataFrame(rows)
    c = df.groupBy("v").agg(
        F.sum("pre").alias("c1"), F.sum(F.lit(1) - F.col("pre")).alias("c2")
    )
    from mock_map_reduce_spark.functions.materialize import materialize

    d = materialize(
        c.repartitionByRange(3, "v")
        .withColumn("__pid", F.spark_partition_id())
    )
    sums = {
        r["__pid"]: (r["s1"] or 0, r["s2"] or 0)
        for r in d.groupBy("__pid")
        .agg(F.sum("c1").alias("s1"), F.sum("c2").alias("s2"))
        .collect()
    }
    off1, off2, a1, a2 = {}, {}, 0, 0
    for pid in sorted(sums):
        off1[pid], off2[pid] = a1, a2
        a1 += sums[pid][0]
        a2 += sums[pid][1]
    m1 = F.create_map(*[F.lit(x) for p in sorted(off1) for x in (p, off1[p])])
    m2 = F.create_map(*[F.lit(x) for p in sorted(off2) for x in (p, off2[p])])
    w = Window.partitionBy("__pid").orderBy("v")
    cum = d.select(
        (F.sum("c1").over(w) + m1[F.col("__pid")]).alias("k1"),
        (F.sum("c2").over(w) + m2[F.col("__pid")]).alias("k2"),
    )
    got = cum.agg(F.max(F.abs(F.col("k1") * a2 - F.col("k2") * a1))).collect()[0][0]
    x1, x2 = sorted(s1), sorted(s2)
    want = max(
        abs(bisect.bisect_right(x1, v) * len(s2) - bisect.bisect_right(x2, v) * len(s1))
        for v in set(s1) | set(s2)
    )
    assert (a1, a2) == (len(s1), len(s2))
    assert got == want
