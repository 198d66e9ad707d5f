"""Flagship queries — the reference's complete query surface.

word_count + top_words together cover reference operators S1, S4, P1,
F1, A1+A2, X1+X2, O1, O2, U1 (SURVEY §2.1): the entire data plane of
the mock-MapReduce system as one declarative plan each.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mock_map_reduce_spark.operators import wordcount as wc
from mock_map_reduce_spark.registry import query
from mock_map_reduce_spark.sources import load_table

# Parameterized N, the reference's stdin-read top-N size
# (master.cc:595-596): both the Spark query and its oracle read the
# same value at import, so any setting stays oracle-consistent.
TOP_N = int(os.environ.get("SPARK_GRAFT_TOP_N", "50"))

# DuckDB oracle tokenization identical to wc.TOKEN_DELIM_RE: split on
# non-alphabetic runs, drop empties, preserve case (SURVEY §1.4.2/.5).
_WORDS_CTE = """
WITH words AS (
  SELECT unnest(string_split_regex(text, '[^A-Za-z]+')) AS word
  FROM documents
)
"""


@query(
    "word_count",
    oracle=_WORDS_CTE
    + """
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
""",
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.word_count(load_table(spark, sf_dir, "documents"), "text")


@query(
    "top_words",
    oracle=_WORDS_CTE
    + f"""
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
ORDER BY count DESC, word ASC
LIMIT {TOP_N}
""",
)
def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.top_n(load_table(spark, sf_dir, "documents"), "text", n=TOP_N)


@query(
    "word_count_range_partitioned",
    oracle=_WORDS_CTE
    + """
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
""",
)
def q_word_count_range_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact-shape analog (range partition by first letter) — same result."""
    df = wc.word_count_range_partitioned(load_table(spark, sf_dir, "documents"), "text")
    return df.select("word", "count")


@query(
    "word_count_mapreduce_contract",
    oracle=_WORDS_CTE
    + """
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
""",
)
def q_word_count_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD1: the literal flatMap/reduceByKey MapReduce contract (demo path)."""
    return wc.word_count_rdd(load_table(spark, sf_dir, "documents"), "text")


@query(
    "hdfs_uri_scan_words",
    oracle=_WORDS_CTE
    + """
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
""",
)
def q_hdfs_uri_scan_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 delegation EXERCISED, not asserted: the reference scans HDFS
    (master.cc readfile dispatch); Spark serves every scheme through
    the same Hadoop FileSystem connector. This query resolves the
    documents table through the Hadoop FS API itself — Path →
    FileSystem → FileStatus — and hands the resulting explicit
    ``file://`` URIs to the parquet scan: the byte-for-byte identical
    read path an ``hdfs://`` URI takes on a cluster (only the
    FileSystem implementation behind the interface changes). Oracle =
    the plain word_count, so a URI-resolution defect (double-scan,
    missed file, scheme mishandling) shows up as a value mismatch.
    """
    from mock_map_reduce_spark.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    # abspath first: a relative sf_dir would otherwise have its first
    # segment parsed as the file:// URI authority and resolve wrongly.
    import os

    root = jvm.org.apache.hadoop.fs.Path(
        f"file://{os.path.abspath(sf_dir)}/documents.parquet"
    )
    fs = root.getFileSystem(hconf)
    if fs.getFileStatus(root).isDirectory():
        uris = [
            s.getPath().toString()
            for s in fs.listStatus(root)
            if s.isFile() and s.getPath().getName().endswith(".parquet")
        ]
    else:
        uris = [root.toString()]
    docs = spark.read.parquet(*sorted(uris))
    return wc.word_count(docs, "text")


@query(
    "remote_fs_impl_scan_words",
    oracle=_WORDS_CTE
    + """
SELECT word, count(*) AS count
FROM words WHERE word <> ''
GROUP BY word
""",
)
def q_remote_fs_impl_scan_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FileSystem-implementation SEAM in the hash gate: the same
    word count scanned while ``file://`` is served by an EXPLICITLY
    conf-swapped implementation (RawLocalFileSystem via
    ``fs.file.impl`` — sources/remote_fs.py documents the hdfs/s3a/
    abfs/gs matrix this same key family configures). The override is
    restored afterwards; a value mismatch would mean the engine's read
    path depends on which class backs the scheme — it must not, and
    this entry proves it doesn't on real data. Companion behavior
    proof (checksum sidecars appear/disappear with the impl swap):
    tests/test_remote_fs.py.

    NOTE: the swap mutates the session-global hadoopConfiguration for
    the duration of the scan — this entry assumes single-threaded
    query execution within the session (true for the driver gate, the
    bench, and the oracle sweep); a concurrent query in the same
    session could read file:// through RawLocalFileSystem mid-override.
    """
    from mock_map_reduce_spark.sources.remote_fs import (
        RAW_LOCAL_IMPL,
        scheme_impl_in_use,
        set_scheme_impl,
    )
    from mock_map_reduce_spark.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    original = hconf.get("fs.file.impl")
    set_scheme_impl(spark, "file", RAW_LOCAL_IMPL)
    try:
        # explicit raise, not assert: the whole point of the entry is
        # that the swapped impl served the scan — `python -O` must not
        # silently drop the check (round-9 ADVICE)
        in_use = scheme_impl_in_use(spark, "file:///")
        if in_use != RAW_LOCAL_IMPL:
            raise RuntimeError(
                f"fs.file.impl swap did not take effect: scan would be"
                f" served by {in_use!r}, expected {RAW_LOCAL_IMPL!r}"
            )
        import os

        docs = spark.read.parquet(
            f"file://{os.path.abspath(sf_dir)}/documents.parquet"
        )
        out = wc.word_count(docs, "text")
        # Force the scan NOW, while the override is active — the
        # returned frame is a materialized pin, so the caller's later
        # action does not depend on the restored conf.
        from mock_map_reduce_spark.functions.materialize import materialize

        return materialize(out)
    finally:
        if original is None:
            hconf.unset("fs.file.impl")
        else:
            hconf.set("fs.file.impl", original)
        hconf.unset("fs.file.impl.disable.cache")
