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
