"""Data-layout operators: Z-order (Morton) clustering keys.

Z-ordering interleaves the bits of two dimension keys so that rows
close in BOTH dimensions land close in the sort order. Writing a
100 TB table sorted by the Z-value gives every downstream
two-dimensional range predicate (customer range × date range) tight
min/max zone maps on BOTH columns from ONE physical order — the
standard lakehouse layout trick, expressed here as pure bit
arithmetic that whole-stage codegen compiles (no UDF).

Reference: the reference engine has no layout control at all (its
sinks append text in arrival order, slave.cc:101-152); this module is
part of the SURVEY §2.2 scale extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(x: Column, y: Column, bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints.

    z = Σ_b ((x>>b)&1) << 2b  |  ((y>>b)&1) << (2b+1)

    The terms address disjoint bit positions, so integer addition is
    exactly bitwise OR — a sum of 2*bits shift/mask terms that
    Catalyst folds into one codegen'd expression.
    """
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zorder_sql(x_expr: str, y_expr: str, bits: int = 12) -> str:
    """The same interleave as a DuckDB SQL expression (oracle twin)."""
    # Every shift term is fully parenthesized: DuckDB (like Postgres)
    # binds `+` TIGHTER than `<<`, so a bare `t << 2 + u << 3` chain
    # would parse as t << (2 + u) << 3 and overflow.
    terms = []
    for b in range(bits):
        terms.append(f"(((({x_expr}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({y_expr}) >> {b}) & 1) << {2 * b + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    id_col: str = "o_orderkey",
    bits: int = 12,
    bucket_shift: int = 14,
) -> DataFrame:
    """(id, z, zbucket): Morton key + coarse range-bucket per row.

    ``zbucket = z >> bucket_shift`` is the file/partition assignment a
    writer would range-partition on; rows sharing a bucket are
    rectangle-local in (x, y), so both columns' zone maps stay tight.
    """
    z = zorder_key(x, y, bits)
    return df.select(
        F.col(id_col),
        z.alias("z"),
        F.shiftright(z, bucket_shift).cast("long").alias("zbucket"),
    )
