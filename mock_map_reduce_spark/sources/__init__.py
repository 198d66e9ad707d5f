"""Sources & sinks.

The reference's entire I/O surface is an HDFS text scan
(slave.cc:207-253), byte-range chunk files (master.cc:760-853), and
text sinks (master.cc:589-626). In Spark those are `spark.read.text`
plus managed input splits; here we generalize to the formats a real
engine needs (parquet/csv/json/text) with schema-explicit readers.
"""

from mock_map_reduce_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_orc,
    read_text,
    read_xml,
    register_views,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_xml,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_orc",
    "read_text",
    "read_xml",
    "register_views",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
    "write_xml",
]
