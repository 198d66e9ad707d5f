"""Named-query catalog: importing this package registers every query.

Split by surface area; each module corresponds to a SURVEY.md §2 slice:
    flagship    — the reference's own query (word count / top-N)
    relational  — joins, aggregates, windows, set ops, scalar functions
    curation    — deterministic sampling, splits, packing, stable shuffle
    dedup       — exact + fuzzy deduplication over documents
    similarity  — vector similarity search over embeddings
    text        — text analysis (lang-id, quality, tokens, fingerprints)
    multimodal  — binary-column plumbing
    streaming   — batch-equivalent window queries (stream tests in tests/)
"""

from mock_map_reduce_spark.catalog import (  # noqa: F401
    advanced,
    curation,
    dedup,
    flagship,
    sqlapi,
    sqlapi2,
    stats,
    multimodal,
    relational,
    scale,
    semistructured,
    streaming_queries,
    similarity,
    textops,
    timeseries,
    windows2,
)
