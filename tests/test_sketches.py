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
