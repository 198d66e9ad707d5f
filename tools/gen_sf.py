"""Scale-up generator: synthesize sfN data as key-shifted replicas of
a driver-generated source sf dir (default: sf0.1 x 10 -> sf1).

The driver ships sf{0.001,0.01,0.1}; the 100 TB story needs at least
one order-of-magnitude proof point above the bench scale. Replication
with per-replica key offsets preserves the star schema's referential
integrity (every replica's lineitem joins ITS replica's orders/part/
supplier; customers/orders stay paired), the per-key distributions,
and the value domains — so every catalog query and its DuckDB oracle
run unmodified on the output.

Deliberate properties of replica data:
- region/nation are FIXED dimensions (copied once, not scaled) — as
  in TPC-H, dimension cardinality does not grow with sf.
- documents replicate with shifted doc_ids and IDENTICAL text: at
  crawl scale exact replicas are the common case, so the dedup
  family's caps (MAX_DOC_FREQ stop-shingles, LSH max_bucket_size)
  get exercised 10x harder — which is the point of the proof run.
- embeddings get a tiny per-replica offset on component 0 (r * 1e-3)
  so ANN distance ties stay unambiguous across engines; label and all
  other components are unchanged.

Usage:
    python tools/gen_sf.py [--src /root/testdata/sf0.1] [--reps 10] \
                           [--out /tmp/mmr_testdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/mmr_testdata/sf1")
    ap.add_argument(
        "--doc-dup-pct",
        type=int,
        default=100,
        help="Percent of documents that take part in exact duplication "
        "across replicas (default 100). The other docs get a "
        "replica-unique suffix token. Keyed on doc_id %% 100 so the "
        "choice is deterministic and oracle-mirrorable.",
    )
    ap.add_argument(
        "--doc-dup-group",
        type=int,
        default=0,
        help="Duplicate CLUSTER size for the dup slice: replicas share "
        "text in groups of this many (suffix keyed on replica//group), "
        "so duplicate multiplicity stays CONSTANT as reps grow — the "
        "realistic crawl shape where pair-emitting dedup output scales "
        "linearly with the corpus. 0/unset = one global group (every "
        "replica identical, the adversarial regime).",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    src = {t: f"'{args.src}/{t}.parquet'" for t in TABLES}

    # Per-replica key offsets: one past the source max so replica key
    # spaces never collide.
    off = {}
    for table, key in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        off[key] = con.execute(f"SELECT max({key}) + 1 FROM {src[table]}").fetchone()[0]
    off["user_id"] = con.execute(
        f"SELECT max(user_id) + 1 FROM {src['events']}"
    ).fetchone()[0]

    def write(table: str, body_per_replica: str, fixed: bool = False) -> None:
        if fixed:
            sql = f"SELECT * FROM {src[table]}"
        else:
            sql = "\nUNION ALL\n".join(
                body_per_replica.format(r=r) for r in range(args.reps)
            )
        out = os.path.join(args.out, f"{table}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    write("region", "", fixed=True)
    write("nation", "", fixed=True)
    write(
        "customer",
        f"SELECT c_custkey + {{r}} * {off['c_custkey']} AS c_custkey, c_name,"
        f" c_nationkey, c_acctbal, c_mktsegment FROM {src['customer']}",
    )
    write(
        "supplier",
        f"SELECT s_suppkey + {{r}} * {off['s_suppkey']} AS s_suppkey, s_name,"
        f" s_nationkey, s_acctbal FROM {src['supplier']}",
    )
    write(
        "part",
        f"SELECT p_partkey + {{r}} * {off['p_partkey']} AS p_partkey, p_name,"
        f" p_brand, p_type, p_size, p_retailprice FROM {src['part']}",
    )
    write(
        "orders",
        f"SELECT o_orderkey + {{r}} * {off['o_orderkey']} AS o_orderkey,"
        f" o_custkey + {{r}} * {off['c_custkey']} AS o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM {src['orders']}",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + {{r}} * {off['o_orderkey']} AS l_orderkey,"
        f" l_partkey + {{r}} * {off['p_partkey']} AS l_partkey,"
        f" l_suppkey + {{r}} * {off['s_suppkey']} AS l_suppkey,"
        f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        f" l_returnflag, l_linestatus, l_shipdate FROM {src['lineitem']}",
    )
    write(
        "events",
        f"SELECT event_id + {{r}} * {off['event_id']} AS event_id, ts,"
        f" user_id + {{r}} * {off['user_id']} AS user_id,"
        f" event_type, value, props FROM {src['events']}",
    )
    # Replica group 0 keeps the verbatim source text; docs in the dup
    # slice (doc_id % 100 < pct) share text within replica-groups of
    # size G (suffix token per group id), docs outside it are unique
    # per replica. Distinct token shapes ('xg' vs 'xu') keep a group
    # suffix from ever colliding with a unique suffix. n_chars is
    # recomputed so it stays length(text) (a source invariant).
    #
    # Suffix ids are LETTER-ENCODED (digits translated a-j): the text
    # pipeline's tokenizer splits on [^a-z]+, so a digit-bearing
    # suffix like 'xg3x' would tokenize to ['xg','x'] for EVERY group
    # — all suffixed replicas of a source doc would share one token
    # stream, every shingle's doc-freq would blow past MAX_DOC_FREQ,
    # and the stop-shingle cap would degenerate the whole gram-based
    # dedup family to empty output (observed at reps=100, group=10).
    grp = args.doc_dup_group if args.doc_dup_group > 0 else args.reps

    def letters(expr: str) -> str:
        return f"translate(CAST({expr} AS VARCHAR), '0123456789', 'abcdefghij')"

    doc_text = (
        "CASE"
        f" WHEN {{r}} // {grp} = 0 AND doc_id % 100 < {args.doc_dup_pct} THEN text"
        f" WHEN doc_id % 100 < {args.doc_dup_pct}"
        f" THEN text || ' xg' || {letters(f'{{r}} // {grp}')} || 'x'"
        " WHEN {r} = 0 THEN text"
        f" ELSE text || ' xu' || {letters('{r}')} || 'x'"
        " END"
    )
    write(
        "documents",
        f"SELECT doc_id + {{r}} * {off['doc_id']} AS doc_id,"
        f" {doc_text} AS text, lang, source,"
        f" length({doc_text}) AS n_chars FROM {src['documents']}",
    )
    write(
        "embeddings",
        f"SELECT vec_id + {{r}} * {off['vec_id']} AS vec_id,"
        f" CAST([embedding[1] + {{r}} * 0.001] || embedding[2:] AS FLOAT[])"
        f" AS embedding, label FROM {src['embeddings']}",
    )


if __name__ == "__main__":
    main()
