"""Sink tests: parquet write (S4 analog), partitioned layout, pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from mock_map_reduce_spark.plans import executed_plan
from mock_map_reduce_spark.sources import load_table, write_parquet


def test_write_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_out")
    nation = load_table(spark, sf_dir, "nation")
    write_parquet(nation, out)
    back = spark.read.parquet(out)
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    # partition pruning: only the o_orderstatus=F directory is scanned
    plan = executed_plan(back)
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus=F" in plan


def test_overwrite_mode(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_out")
    region = load_table(spark, sf_dir, "region")
    write_parquet(region, out)
    write_parquet(region.limit(2), out)  # overwrite shrinks it
    assert spark.read.parquet(out).count() == 2


def test_dual_sink_single_pass(spark, sf_dir, tmp_path):
    """S4 full sink + O2 top-N from ONE pipeline execution (the
    reference's single-pass dual consumer, master.cc:619-668)."""
    from mock_map_reduce_spark.operators import wordcount as wc

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "word_counts")
    try:
        top = wc.word_count_dual_sink(docs, out, n=20)
        # both consumers read the same cached relation — no re-scan
        assert "InMemoryTableScan" in executed_plan(top)
        # and the WRITE pass populated that cache (blocks already in
        # storage before top-N ever runs)
        assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) > 0
        top_rows = top.collect()
        # full sink holds the complete relation; top-N agrees with the
        # independently computed reference answer
        full = spark.read.parquet(out)
        expect = wc.top_n(docs, n=20).collect()
        assert top_rows == expect
        assert full.count() == wc.word_count(docs).count()
    finally:
        spark.catalog.clearCache()


def test_csv_json_orc_roundtrip(spark, sf_dir, tmp_path):
    """Every generalized format round-trips the same relation with the
    schema and values intact (csv via explicit DDL schema — inference
    is never the production path)."""
    from mock_map_reduce_spark.sources import (
        read_csv, read_json, read_orc, write_csv, write_json, write_orc,
    )

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    expect = sorted(tuple(r) for r in nation.collect())
    ddl = "n_nationkey bigint, n_name string, n_regionkey bigint"

    p = str(tmp_path / "n_csv"); write_csv(nation, p)
    assert sorted(tuple(r) for r in read_csv(spark, p, ddl).collect()) == expect

    p = str(tmp_path / "n_json"); write_json(nation, p)
    got = read_json(spark, p, ddl).select("n_nationkey", "n_name", "n_regionkey")
    assert sorted(tuple(r) for r in got.collect()) == expect

    p = str(tmp_path / "n_orc"); write_orc(nation, p)
    assert sorted(tuple(r) for r in read_orc(spark, p).collect()) == expect


def test_orc_filter_pushdown(spark, sf_dir, tmp_path):
    from mock_map_reduce_spark.sources import read_orc, write_orc

    out = str(tmp_path / "orders_orc")
    write_orc(load_table(spark, sf_dir, "orders"), out)
    back = read_orc(spark, out).filter(F.col("o_orderkey") == 7).select("o_orderkey")
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in executed_plan(back) or "o_orderkey" in executed_plan(back)


def test_csv_malformed_rows_become_nulls_not_failures(spark, tmp_path):
    """PERMISSIVE CSV contract: one corrupt line in a 100 TB crawl
    shard must not kill the stage — it parses to nulls."""
    from mock_map_reduce_spark.sources import read_csv

    p = tmp_path / "dirty.csv"
    p.write_text("id,score\n1,10\n2,not_a_number\n3,30\n")
    rows = {
        r.id: r.score
        for r in read_csv(spark, str(p), "id bigint, score bigint").collect()
    }
    assert rows[1] == 10 and rows[3] == 30
    assert rows[2] is None  # malformed cell -> null, job survives


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """64 tiny files compact to the computed width with row fidelity."""
    from mock_map_reduce_spark.sources.tables import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    n_in = len(spark.read.parquet(src).inputFiles())
    assert n_in >= 32  # genuinely fragmented
    n_out = compact_parquet(spark, src, dst, target_file_bytes=128 << 20)
    assert n_out == 1  # tiny total -> single file
    a = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))


def test_partitionby_write_prunes_directories(spark, tmp_path):
    """A filter on the partition column reads ONLY that partition's
    files (directory pruning — no footer even touched elsewhere)."""
    from mock_map_reduce_spark.sources import load_table, write_parquet

    out = str(tmp_path / "by_type")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    write_parquet(events, out, partition_by=["event_type"])
    all_files = {
        r.f for r in spark.read.parquet(out).select(F.input_file_name().alias("f")).distinct().collect()
    }
    one = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    pruned = {r.f for r in one.select(F.input_file_name().alias("f")).distinct().collect()}
    assert 0 < len(pruned) < len(all_files)
    assert all("event_type=purchase" in f for f in pruned)
    # PartitionFilters (not PushedFilters) carry the predicate
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "purchase" in plan.split("PartitionFilters")[1][:200]
    # and the data still round-trips
    n = one.count()
    assert n == events.filter(F.col("event_type") == "purchase").count()


def test_write_audit_publish_lifecycle(spark, tmp_path):
    """WAP contract: (1) a passing batch publishes and is readable;
    (2) a failing audit raises, leaves NO staging residue, and
    readers still see the previous generation; (3) a second good
    batch bumps the generation and flips readers atomically."""
    import os

    import pytest as _pytest
    from pyspark.sql import Row

    from mock_map_reduce_spark.sources.tables import (
        AuditFailed,
        read_published,
        write_audit_publish,
    )

    table = os.path.join(str(tmp_path), "tbl")
    ok = [("nonempty", lambda d: d.count() > 0), ("no_null_k", lambda d: d.filter("k IS NULL").count() == 0)]

    g0 = write_audit_publish(spark.createDataFrame([Row(k=1, v="a")]), table, ok)
    assert g0.endswith("gen=0")
    assert [(r.k, r.v) for r in read_published(spark, table).collect()] == [(1, "a")]

    bad = spark.createDataFrame([Row(k=None, v="poison")], "k int, v string")
    with _pytest.raises(AuditFailed):
        write_audit_publish(bad, table, ok)
    assert not os.path.exists(os.path.join(table, "_staging"))
    assert [(r.k, r.v) for r in read_published(spark, table).collect()] == [(1, "a")]

    write_audit_publish(spark.createDataFrame([Row(k=2, v="b")]), table, ok)
    assert [(r.k, r.v) for r in read_published(spark, table).collect()] == [(2, "b")]
    # time travel: generation 0 stays immutable and readable
    assert [(r.k, r.v) for r in read_published(spark, table, gen=0).collect()] == [(1, "a")]


def test_xml_roundtrip_with_escaping(spark, tmp_path):
    """Native XML source/sink round trip, including markup characters
    that must be entity-escaped on write and restored on read."""
    from pyspark.sql import Row

    from mock_map_reduce_spark.sources import read_xml, write_xml

    rows = [
        Row(k=1, s="plain"),
        Row(k=2, s="a < b & c > d"),
        Row(k=3, s='quote " apos \' end'),
    ]
    d = str(tmp_path / "xmlrt")
    write_xml(spark.createDataFrame(rows), d, row_tag="rec")
    back = read_xml(spark, d, row_tag="rec", schema="k bigint, s string")
    assert sorted((r.k, r.s) for r in back.collect()) == [(r.k, r.s) for r in rows]
