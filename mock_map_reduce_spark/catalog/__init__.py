"""Named-query catalog: importing this package registers every query.

Split by surface area; each module corresponds to a SURVEY.md §2 slice:
    flagship    — the reference's own query (word count / top-N)
    relational  — joins, aggregates, windows, set ops, scalar functions
    advanced    — exact variance/percentiles, string agg, unpivot, nulls
    stats       — crosstab, exact correlation, accuracy-gated sketches
    sqlapi/2    — the TPC-H-shaped spark.sql surface (all 22 shapes)
    windows2    — ranking variants, range frames, bag set ops
    semistructured — array/map/JSON functions
    scale       — salting (agg + join), grouping sets, Pandas UDF,
                  mergeable agg state, Z-order layout, sketch merges
    curation    — deterministic sampling (hash/mixture/stratified),
                  splits, packing, stable shuffle, quality floor
    dedup       — exact + fuzzy dedup (MinHash-LSH incl. incremental,
                  SimHash, n-gram Jaccard, components, decontamination)
    similarity  — vector search (brute force, LSH, IVF, k-means, int8,
                  product quantization + ADC)
    retrieval   — BM25 ranking, inverted-index build, blocked fuzzy
                  (edit-distance) vocabulary matching
    textops     — text analysis (lang-id, quality, tokens, fingerprints,
                  TF-IDF, surprisal, chunking, PII, corpus profile)
    timeseries  — windows, sessionization (hand-rolled + built-in),
                  as-of join, funnel, retention
    lifecycle   — gap-fill, forward-fill (LOCF), SCD type-2 intervals,
                  snapshot diff, winsorized stats
    multimodal  — binary-column plumbing
    streaming_queries — watermarked streams driven to completion and
                  oracle-checked against batch SQL
    layout_bucketed — bucketed-table zero-exchange joins, compaction
    semdedup    — embedding-space semantic dedup + decontamination
    governance  — drift monitors (KS in stats; PSI) and privacy
                  release audits (k-anonymity audit + generalization)
"""

from mock_map_reduce_spark.catalog import (  # noqa: F401
    advanced,
    curation,
    dedup,
    flagship,
    lifecycle,
    sqlapi,
    sqlapi2,
    stats,
    multimodal,
    relational,
    retrieval,
    scale,
    semistructured,
    streaming_queries,
    similarity,
    textops,
    timeseries,
    windows2,
)

# Imported AFTER the block above ON PURPOSE: new-round queries must
# REGISTER last so registry.compute_rotation queues them behind the
# outstanding confirmation debt in the driver's sampled prefix.
from mock_map_reduce_spark.catalog import layout_bucketed  # noqa: E402,F401
from mock_map_reduce_spark.catalog import semdedup  # noqa: E402,F401
from mock_map_reduce_spark.catalog import governance  # noqa: E402,F401
