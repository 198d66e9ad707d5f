"""Relational operator library — the general engine surface.

The reference has NO joins, windows, distinct aggregation, set ops, or
grouping sets (SURVEY §2.2 — every row "absent"); its only shuffle is
the word-count exchange. This module supplies that missing surface as
thin, scale-aware compositions of DataFrame primitives so the catalog
queries (catalog/relational.py) stay declarative.

Scale notes (100 TB):
  * ``star_join`` broadcasts every dimension whose name is in
    sources.BROADCAST_SAFE — a fact-table scan at 100 TB must never
    shuffle to join a 25-row nation table. Larger dims fall back to
    Catalyst's choice (sort-merge with AQE skew handling).
  * ``top_k_per_group`` uses row_number over a window, which shuffles
    once on the partition key — the same single shuffle the
    aggregation would need; no global sort.
  * Nothing here collects, caches, or loops on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from mock_map_reduce_spark.sources.tables import BROADCAST_SAFE


def maybe_broadcast(df: DataFrame, table_name: str) -> DataFrame:
    """Broadcast-hint dimensions that are small at any scale factor."""
    return F.broadcast(df) if table_name in BROADCAST_SAFE else df


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, str, Column]]) -> DataFrame:
    """Join a fact table against dimensions: [(dim_df, dim_name, on_cond)].

    Dimensions in BROADCAST_SAFE get an explicit broadcast hint; the
    rest are left to Catalyst/AQE (sort-merge or shuffled-hash with
    runtime skew splitting).
    """
    out = fact
    for dim, name, cond in dims:
        out = out.join(maybe_broadcast(dim, name), cond, "inner")
    return out


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-K rows per group via row_number (single shuffle on the keys).

    ``order_cols`` must make the ordering total (include a unique
    tie-break column) or results are nondeterministic under retries.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def running_agg(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    agg_col: Column,
    out_col: str,
) -> DataFrame:
    """Running aggregate over a rows-frame window (unbounded preceding → current)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(agg_col).over(w))


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key across two table snapshots as added / removed /
    changed / unchanged — the dataset-versioning primitive behind
    incremental re-processing and audit diffs.

    One full outer join on the key; change detection is a null-safe
    inequality over the compared columns (so NULL-to-value edits count
    as changes). Scale: the join shuffles both snapshots on the key
    once — at 100 TB, bucket both snapshots on the key at write time
    and the diff becomes a zero-shuffle sort-merge.
    """
    an = a.select(key_col, *compare_cols)
    bn = b.select(key_col, *compare_cols)
    ka, kb = F.col(f"__a.{key_col}"), F.col(f"__b.{key_col}")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__a.{c}").eqNullSafe(F.col(f"__b.{c}"))
    status = (
        F.when(ka.isNull(), F.lit("added"))
        .when(kb.isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        an.alias("__a")
        .join(bn.alias("__b"), ka == kb, "full_outer")
        .select(F.coalesce(ka, kb).alias(key_col), status.alias("status"))
    )


def merge_into(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO (CDC apply): reconcile a change feed against a base
    snapshot — the Delta/Iceberg upsert shape the reference's
    append-only sinks (slave.cc write path) cannot express.

    ``changes`` carries ``op_col`` in {'U','I','D'}: matched updates
    replace the base row, inserts add new keys (an 'I' whose key
    already exists in base behaves as an upsert — the base row is
    evicted, never duplicated, matching MERGE's one-row-per-key
    invariant), deletes drop them. Last-writer-wins within the feed
    is the CALLER's contract (one row per key per apply), matching
    how a compacted CDC topic arrives.

    Implemented as copy-on-write, not a full outer join: base rows
    whose key appears in the feed leave via a LEFT ANTI join against
    the touched-key set, then upserts (U + I payloads) union back in.
    Scale: the anti join's build side is only the feed's KEY column —
    broadcastable even when the feed payload is wide, so the 100 TB
    base scan never shuffles; a full-outer formulation would force a
    sort-merge of the whole base. (At real scale the anti join also
    partition-prunes: only files containing touched keys rewrite.)
    """
    # 'I' keys join the eviction set too: an insert whose key already
    # exists in base must replace it (upsert), not duplicate it.
    touched = changes.filter(F.col(op_col).isin("U", "I", "D")).select(key_col).distinct()
    kept = base.join(F.broadcast(touched), key_col, "left_anti")
    upserts = changes.filter(F.col(op_col).isin("U", "I")).drop(op_col)
    return kept.unionByName(upserts)
