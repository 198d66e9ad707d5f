"""Driver-built DataFrames as JVM LocalRelations.

``spark.createDataFrame(list_of_tuples, schema)`` in PySpark builds a
``ParallelCollectionRDD`` + ``PythonRDD`` behind a ``Scan ExistingRDD``
node: EVERY scan of the frame — each broadcast build, each crossJoin,
each count — round-trips through ``defaultParallelism`` Python worker
tasks. For the engine's bounded driver-pinned tables (k-means
centroids, BPE merge tables, weight vectors, tiny broadcast dims) that
tax is paid once per consumer per query (measured: an 8-row centroid
pin cost ~0.3 s of Python-task time per broadcast; 5 scans of an 8-row
frame: 2.5 s via PythonRDD vs 0.5 s via LocalRelation).

``local_df`` routes the same rows through the Arrow
``createDataFrame(pandas)`` path, which lands in the JVM as a
``LocalRelation`` (plan: ``LocalTableScan``) — a pure-JVM leaf with
driver-held rows, exactly what Scala's ``spark.createDataFrame(Seq)``
produces. Values are unchanged (Arrow carries the exact doubles /
ints / strings), so oracle hashes are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Build a bounded driver-side table as a LocalRelation leaf.

    ``rows`` are (tuples of) plain Python values; ``schema`` is a DDL
    string ("cid bigint, ce array<double>"). Falls back to the classic
    list path if the Arrow conversion cannot represent the values
    (never expected for the engine's numeric/string pins, but a pin
    must not fail outright on an exotic type).
    """
    try:
        import pandas as pd
        from pyspark.sql.types import StructType

        # Parse the DDL properly (JVM-side, one call) instead of naive
        # comma-splitting, which broke on parameterized types —
        # decimal(10,2), map<string,int> — and silently fell back to
        # the slow PythonRDD path (round-10 ADVICE).
        struct = StructType.fromDDL(schema)
        pdf = pd.DataFrame(
            {f.name: [r[i] for r in rows] for i, f in enumerate(struct.fields)},
            # object dtype keeps ints exact (no silent float64 upcast
            # of an int64 column when empty / mixed with None).
            dtype=object,
        )
        return spark.createDataFrame(pdf, schema=struct)
    except Exception:  # noqa: BLE001 — fall back to the slow-but-sure path
        import logging

        logging.getLogger(__name__).warning(
            "local_df: Arrow LocalRelation path failed for schema %r; "
            "falling back to the PythonRDD createDataFrame path",
            schema,
            exc_info=True,
        )
        return spark.createDataFrame(rows, schema)
