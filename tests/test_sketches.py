"""Count-min sketch properties and the VariantType extraction path."""

from __future__ import annotations

from pyspark.sql import functions as F

from mock_map_reduce_spark import registry

registry.load_all()


def test_cms_never_underestimates(spark, sf_dir):
    rows = registry.QUERIES["sketch_count_min"](spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.is_overestimate, r
        assert r.cms_est >= r.exact_count >= 0


def test_cms_absent_word_has_zero_exact(spark, sf_dir):
    rows = {r.word: r for r in registry.QUERIES["sketch_count_min"](spark, sf_dir).collect()}
    assert rows["zzznotaword"].exact_count == 0
    # its estimate is whatever collided into its buckets — >= 0 by MIN
    assert rows["zzznotaword"].cms_est >= 0
    # present words have positive exact counts
    assert rows["spark"].exact_count > 0


def test_variant_rollup_matches_from_json_path(spark, sf_dir):
    """The variant extraction must agree with the fixed-schema
    from_json path on the same rows (two Spark JSON front-ends, one
    answer)."""
    from mock_map_reduce_spark.sources import load_table

    got = {
        r.k_mod: (r.n, r.sum_k)
        for r in registry.QUERIES["json_variant_rollup"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    want = {
        r.k_mod: (r.n, r.sum_k)
        for r in ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).cast("long").alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sum_k"))
        .collect()
    }
    assert got == want


def test_diag_join_key_skew_flags_planted_hot_key(spark, tmp_path):
    """One user with 60 of 70 events: skew_ratio must be max/avg =
    60 / (70/11) = 9.43, and the hot key surfaces as heaviest_key."""
    import os

    from pyspark.sql import Row

    from mock_map_reduce_spark import registry

    registry.load_all()
    rows = [Row(event_id=i, user_id=7, ts=None, event_type="c", value=1.0) for i in range(60)]
    rows += [
        Row(event_id=100 + u, user_id=100 + u, ts=None, event_type="c", value=1.0)
        for u in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    ev.coalesce(1).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = registry.QUERIES["diag_join_key_skew"](spark, str(tmp_path)).collect()[0]
    assert (out.n_rows, out.n_keys, out.max_per_key, out.heaviest_key) == (70, 11, 60, 7)
    assert abs(out.skew_ratio - 60 * 11 / 70) < 1e-6


def test_kmv_estimator_regime_and_accuracy(spark, sf_dir):
    """Both KMV regimes hold: above K distinct users the sketch keeps
    exactly K hashes and the (K-1)/h_K estimate passes the 5-sigma
    flag; at or below K the kept set IS the hash set and the estimate
    equals the exact count (sf0.001 exercises both across types)."""
    rows = registry.QUERIES["sketch_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.within_bound, (r.est_distinct, r.exact_distinct)
        if r.exact_distinct > 64:
            assert r.n_kept == 64
            assert abs(r.est_distinct - r.n_kept) > 1  # a real estimate
        else:
            assert r.n_kept == r.exact_distinct
            assert r.est_distinct == float(r.exact_distinct)


def test_kmv_exact_regime_below_k(spark):
    """Under K distinct values the kept set IS the whole hash set and
    the sketch returns the exact count — pinned on a hand corpus run
    through the same salted two-level merge."""
    from pyspark.sql import Row

    from mock_map_reduce_spark.catalog.stats import _KMV_K, _KMV_SALTS

    ev = spark.createDataFrame(
        [Row(event_type="t", user_id=i % 10) for i in range(100)]
    )
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    d = ev.select("event_type", h.alias("h")).distinct()
    partial = d.groupBy(
        "event_type", F.pmod(F.col("h"), F.lit(_KMV_SALTS)).alias("salt")
    ).agg(F.slice(F.sort_array(F.collect_list("h")), 1, _KMV_K).alias("hs"))
    merged = partial.groupBy("event_type").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("hs"))), 1, _KMV_K).alias("hs")
    )
    [row] = merged.collect()
    assert len(row.hs) == 10  # all 10 distinct hashes kept -> exact regime
