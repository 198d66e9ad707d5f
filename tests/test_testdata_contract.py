"""Testdata-contract pins: every assumption an oracle leans on.

The driver regenerates /root/testdata between rounds. Each test here
converts a silent oracle-equivalence precondition into a loud, named
failure at the right place (the test_timeseries session-boundary pin
established the pattern). Pure-DuckDB checks — no Spark session.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_every_table_is_one_file(sf_dir):
    """files_manifest_orders' closed-form oracle names exactly one file
    per table ('<table>.parquet'); a multi-file regen must fail here."""
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        assert os.path.isfile(path), f"{path} missing or not a single file"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_pure_ascii_and_nonempty(sf_dir):
    """multimodal_byte_features' oracle equates DuckDB code points with
    UTF-8 payload bytes — true ONLY for ASCII; empty texts would also
    drop rows from per-doc CTEs."""
    mx, mn = duckdb.sql(
        f"""
        SELECT max(list_max(list_transform(range(1, length(text)+1),
                                           i -> ord(substring(text, i, 1))))),
               min(length(text))
        FROM '{sf_dir}/documents.parquet'
        """
    ).fetchone()
    assert mx is not None and mx < 128, f"non-ASCII text in {sf_dir} (max cp {mx})"
    assert mn and mn > 0, f"empty document text in {sf_dir}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_have_eval_set_ids(sf_dir):
    """dedup_contamination and the pretraining pipeline treat
    doc_id < 10 as the benchmark/eval set — it must be non-empty and
    a corpus must remain above it."""
    lo, hi = duckdb.sql(
        f"SELECT sum(CASE WHEN doc_id < 10 THEN 1 ELSE 0 END), "
        f"sum(CASE WHEN doc_id >= 10 THEN 1 ELSE 0 END) "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    assert lo and lo > 0, "no eval-set docs (doc_id < 10)"
    assert hi and hi > 0, "no corpus docs (doc_id >= 10)"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_are_64_dim(sf_dir):
    """The similarity family (hyperplane literals, IVF cells, PQ
    subspaces) is generated for dim=64; a regen with another dim must
    fail here, not as an ANN hash mismatch."""
    dims = duckdb.sql(
        f"SELECT DISTINCT len(embedding) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    assert dims == [(64,)], f"embedding dims {dims} in {sf_dir}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_table_schemas_are_stable(sf_dir):
    """Column names per table — the whole catalog's referential base."""
    want = {
        "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
        "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
        "embeddings": ["vec_id", "embedding"],
    }
    for t, cols in want.items():
        got = [r[0] for r in duckdb.sql(f"DESCRIBE SELECT * FROM '{sf_dir}/{t}.parquet'").fetchall()]
        assert got[: len(cols)] == cols, f"{t} schema drift in {sf_dir}: {got}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_props_is_simple_k_json(sf_dir):
    """json_funcs / json_variant_rollup extract $.k as BIGINT from
    every props value."""
    bad = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet' "
        f"WHERE json_extract_string(props, '$.k') IS NULL"
    ).fetchone()[0]
    assert bad == 0, f"{bad} events with props lacking $.k in {sf_dir}"
