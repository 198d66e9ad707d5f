"""The FileSystem-API seam (sources/remote_fs.py): prove that the
scheme -> implementation binding every engine read/write rides is
runtime configuration, by swapping the class serving ``file://`` and
observing the documented behavior change (checksum sidecars gone),
with identical data round-tripping through ``df.write``/``spark.read``
either way. This is the honest local closure of the reference's S1
(live HDFS scan, master.cc:763): hdfs://, s3a://, abfs:// differ from
this test only in which class the conf names.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mock_map_reduce_spark.sources.remote_fs import (
    CHECKSUMMED_LOCAL_IMPL,
    RAW_LOCAL_IMPL,
    scheme_impl_in_use,
    set_scheme_impl,
)


def _roundtrip(spark, out_dir: str) -> set[tuple]:
    df = spark.range(100).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    df.coalesce(1).write.mode("overwrite").csv(out_dir)
    back = spark.read.csv(out_dir, schema="id long, h string")
    return {(r.id, r.h) for r in back.collect()}


def test_scheme_impl_override_swaps_filesystem(spark, tmp_path):
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    original = hconf.get("fs.file.impl")  # may be a deployment default
    try:
        # implementation 1: bare OS filesystem — no checksum sidecars
        set_scheme_impl(spark, "file", RAW_LOCAL_IMPL)
        assert scheme_impl_in_use(spark, "file:///") == RAW_LOCAL_IMPL
        raw_dir = str(tmp_path / "raw_out")
        raw_rows = _roundtrip(spark, raw_dir)
        assert not glob.glob(os.path.join(raw_dir, ".*crc"))

        # implementation 2, same scheme, conf change only: checksummed
        # local FS — .crc sidecars appear next to the data
        set_scheme_impl(spark, "file", CHECKSUMMED_LOCAL_IMPL)
        assert scheme_impl_in_use(spark, "file:///") == CHECKSUMMED_LOCAL_IMPL
        chk_dir = str(tmp_path / "chk_out")
        chk_rows = _roundtrip(spark, chk_dir)
        assert glob.glob(os.path.join(chk_dir, ".*crc"))

        # the seam changes bytes-on-disk bookkeeping, never the data
        assert chk_rows == raw_rows and len(raw_rows) == 100
    finally:
        if original is None:
            hconf.unset("fs.file.impl")
        else:
            hconf.set("fs.file.impl", original)
        hconf.unset("fs.file.impl.disable.cache")
