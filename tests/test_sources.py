"""Multi-format source coverage: text, csv, json roundtrips with
explicit schemas (SURVEY §2.2 "file formats beyond text")."""

from __future__ import annotations

from pyspark.sql import functions as F

from mock_map_reduce_spark.operators import wordcount as wc
from mock_map_reduce_spark.sources import load_table, read_text


def test_text_source_line_aligned(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("hello world\nhello again\n")
    df = read_text(spark, str(p))
    assert df.columns == ["value"]
    counts = {
        r.word: r["count"] for r in wc.word_count(df, text_col="value").collect()
    }
    # record-aligned reads: no buffer-boundary word splitting (SURVEY §1.4.1)
    assert counts == {"hello": 2, "world": 1, "again": 1}


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_csv")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", True
    ).csv(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_json")
    region = load_table(spark, sf_dir, "region")
    region.write.mode("overwrite").json(out)
    back = spark.read.schema("r_regionkey int, r_name string").json(out)
    assert {(r.r_regionkey, r.r_name) for r in back.collect()} == {
        (r.r_regionkey, r.r_name) for r in region.collect()
    }


def test_golden_counter_on_real_documents(spark, sf_dir):
    """Golden test: flagship word count vs an independent Counter
    implementation over the actual corpus (SURVEY §5.5)."""
    import re
    from collections import Counter

    import pandas as pd

    texts = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    golden = Counter()
    for t in texts:
        golden.update(w for w in re.split(r"[^A-Za-z]+", t) if w)
    docs = load_table(spark, sf_dir, "documents")
    got = {r.word: r["count"] for r in wc.word_count(docs).collect()}
    assert got == dict(golden)


def test_python_datasource_pushdown_prunes_partitions(spark):
    """Custom Python data source: pushFilters narrows the planned
    shard set BEFORE task launch — 8 shards unfiltered, 2 after a
    doc_id >= 750 range predicate; equality plans a single shard."""
    from mock_map_reduce_spark.sources.pysource import SynthDocsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
    df = (
        spark.read.format("synthdocs")
        .option("n_docs", 1000)
        .option("n_shards", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    rng = df.filter("doc_id >= 750")
    assert rng.rdd.getNumPartitions() == 2
    assert rng.count() == 250
    eq = df.filter("doc_id = 5")
    assert eq.rdd.getNumPartitions() == 1
    row = eq.collect()[0]
    # deterministic md5 text law
    import hashlib

    assert row.text == "doc 5 " + hashlib.md5(b"5").hexdigest()[:12]
    # residual (non-doc_id) filters still evaluate correctly post-scan
    assert df.filter("n_chars = 18 AND doc_id < 10").count() == 10  # all 1-digit ids: 'doc N ' + 12 hex


def test_python_datasource_stream_matches_batch(spark):
    """The custom source's STREAMING reader (SimpleDataSourceStreamReader,
    one shard per micro-batch) lands exactly the batch reader's rows."""
    from mock_map_reduce_spark.sources.pysource import SynthDocsDataSource

    spark.dataSource.register(SynthDocsDataSource)
    stream = (
        spark.readStream.format("synthdocs")
        .option("n_docs", 400)
        .option("n_shards", 4)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pys_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_id, r.shard, r.text, r.n_chars)
        for r in spark.sql("SELECT * FROM pys_stream").collect()
    }
    batch = {
        (r.doc_id, r.shard, r.text, r.n_chars)
        for r in spark.read.format("synthdocs")
        .option("n_docs", 400)
        .option("n_shards", 4)
        .load()
        .collect()
    }
    assert got == batch and len(got) == 400


def test_python_datasource_writer_two_phase_commit(spark, tmp_path):
    """Writer half: per-task temp files publish only at driver commit;
    a failing write leaves NO visible output (abort cleans temps)."""
    import glob
    import json
    import os

    from mock_map_reduce_spark.sources.pysource import SynthDocsDataSource

    spark.dataSource.register(SynthDocsDataSource)
    out = str(tmp_path / "out")
    (
        spark.range(0, 100, 1, 4)
        .selectExpr("id", "id * 2 AS dbl")
        .write.format("synthdocs")
        .option("path", out)
        .mode("append")
        .save()
    )
    files = sorted(glob.glob(os.path.join(out, "*.jsonl")))
    rows = [json.loads(line) for f in files for line in open(f)]
    assert len(files) == 4 and len(rows) == 100
    assert sum(r["dbl"] for r in rows) == sum(2 * i for i in range(100))
    assert not os.path.exists(os.path.join(out, "_tmp"))

    # failure path: an exploding expression -> job aborts, nothing visible
    bad = str(tmp_path / "bad")
    import pytest

    with pytest.raises(Exception):
        (
            spark.range(0, 10)
            .selectExpr("CAST(raise_error('boom') AS STRING) AS x")
            .write.format("synthdocs")
            .option("path", bad)
            .mode("append")
            .save()
        )
    assert not glob.glob(os.path.join(bad, "*.jsonl"))
