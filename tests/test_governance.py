"""Pins for the drift (KS) and privacy (k-anonymity) audit queries.

Both catalog entries are oracle-checked against DuckDB by the driver
gate; these tests additionally pin them against independent pure-
Python recomputations from the raw parquet rows, so an error shared
by both SQL formulations (a wrong cohort split, an off-by-one in the
cumulative counts) cannot hide.
"""

from __future__ import annotations

from datetime import datetime


def _collect(spark, sf_dir, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, sf_dir).collect()


def test_ks_two_sample_matches_python_model(spark, sf_dir):
    from mock_map_reduce_spark.sources import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate"
    ).collect()
    split = datetime(1998, 1, 1)
    s1 = sorted(r.o_totalprice for r in rows if r.o_orderdate < split)
    s2 = sorted(r.o_totalprice for r in rows if r.o_orderdate >= split)
    n1, n2 = len(s1), len(s2)
    values = sorted(set(s1) | set(s2))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(s1, v) * n2 - bisect.bisect_right(s2, v) * n1)
        for v in values
    )
    got = _collect(spark, sf_dir, "stat_ks_two_sample")
    assert len(got) == 1
    r = got[0]
    assert (r.n1, r.n2, r.d_num) == (n1, n2, d_num)
    assert r.d_stat == d_num / (n1 * n2)


def test_ks_identical_samples_zero(spark):
    """Splitting a sample against itself must give D = 0 — pin the
    cumulative-offset plumbing with a degenerate known answer by
    running the same prefix-sum construction on a tiny frame."""
    from pyspark.sql import Row, functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [Row(v=float(i % 5), pre=i % 2) for i in range(100)]
    )
    c = df.groupBy("v").agg(
        F.sum("pre").alias("c1"), F.sum(F.lit(1) - F.col("pre")).alias("c2")
    )
    d = c.repartitionByRange(4, "v").withColumn("__pid", F.spark_partition_id())
    from mock_map_reduce_spark.functions.materialize import materialize

    d = materialize(d)
    sums = {
        r["__pid"]: (r["s1"] or 0, r["s2"] or 0)
        for r in d.groupBy("__pid")
        .agg(F.sum("c1").alias("s1"), F.sum("c2").alias("s2"))
        .collect()
    }
    off1, off2, a1, a2 = {}, {}, 0, 0
    for pid in sorted(sums):
        off1[pid], off2[pid] = a1, a2
        a1 += sums[pid][0]
        a2 += sums[pid][1]
    m1 = F.create_map(*[F.lit(x) for p in sorted(off1) for x in (p, off1[p])])
    m2 = F.create_map(*[F.lit(x) for p in sorted(off2) for x in (p, off2[p])])
    w = Window.partitionBy("__pid").orderBy("v")
    cum = d.select(
        (F.sum("c1").over(w) + m1[F.col("__pid")]).alias("k1"),
        (F.sum("c2").over(w) + m2[F.col("__pid")]).alias("k2"),
    )
    d_num = cum.agg(
        F.max(F.abs(F.col("k1") * a2 - F.col("k2") * a1))
    ).collect()[0][0]
    assert (a1, a2) == (50, 50)
    assert d_num == 0  # per-value counts are equal in both halves


def test_k_anonymity_matches_python_model(spark, sf_dir):
    from collections import defaultdict

    from mock_map_reduce_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus", "o_orderdate"
    ).collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    groups: dict[tuple, list] = defaultdict(list)
    for o in orders:
        nk = cust.get(o.o_custkey)
        if nk is None:
            continue
        groups[(nk, o.o_orderpriority, o.o_orderdate.year)].append(o.o_orderstatus)
    K = 5
    expect: dict[int, list[int]] = {}
    for (nk, _, _), statuses in groups.items():
        e = expect.setdefault(nk, [0, 0, 0, 0, 10**9])
        n = len(statuses)
        e[0] += 1
        e[1] += 1 if n < K else 0
        e[2] += n
        e[3] += n if n < K else 0
        e[4] = min(e[4], len(set(statuses)))
    got = {
        r.c_nationkey: [
            r.n_groups, r.n_small_groups, r.n_rows, r.n_suppressed, r.min_l_diversity
        ]
        for r in _collect(spark, sf_dir, "privacy_k_anonymity")
    }
    assert got == expect


def test_psi_drift_matches_python_model(spark, sf_dir):
    import math
    from collections import Counter
    from datetime import datetime

    from mock_map_reduce_spark.sources import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderdate"
    ).collect()
    split = datetime(1998, 1, 1)
    h1, h2 = Counter(), Counter()
    for r in rows:
        b = math.floor(r.o_totalprice / 50000)
        (h1 if r.o_orderdate < split else h2)[b] += 1
    buckets = sorted(set(h1) | set(h2))
    n1, n2, nb = sum(h1.values()), sum(h2.values()), len(buckets)
    want = {}
    for b in buckets:
        p1 = (h1[b] + 0.5) / (n1 + 0.5 * nb)
        p2 = (h2[b] + 0.5) / (n2 + 0.5 * nb)
        lm = round(math.log(p1 / p2) * 1_000_000)
        dn = round((p1 - p2) * 1_000_000_000)
        want[b] = (h1[b], h2[b], lm, dn, lm * dn)
    got = {
        r.bucket: (r.c1, r.c2, r.l_micro, r.d_nano, r.term_femto)
        for r in _collect(spark, sf_dir, "stat_psi_drift")
    }
    assert got == want
    psi = sum(v[4] for v in want.values()) / 1e15
    assert psi >= 0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms


def test_k_anonymity_generalize_ladder_model(spark, sf_dir):
    """The generalization ladder equals an independent Python model:
    each row released at the first rung whose (nested) group reaches
    K, suppressed only if even (nation, priority) stays small; rung
    totals per nation must sum to the nation's row count."""
    import math
    from collections import Counter

    from mock_map_reduce_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate"
    ).collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    rows = []
    for o in orders:
        nk = cust.get(o.o_custkey)
        if nk is None:
            continue
        yr = o.o_orderdate.year
        rows.append((nk, o.o_orderpriority, yr, math.floor((yr - 1992) / 3)))
    g0 = Counter((nk, pr, yr) for nk, pr, yr, _ in rows)
    g1 = Counter((nk, pr, yb) for nk, pr, _, yb in rows)
    g2 = Counter((nk, pr) for nk, pr, _, _ in rows)
    K = 5
    expect: dict[int, list[int]] = {}
    for nk, pr, yr, yb in rows:
        e = expect.setdefault(nk, [0, 0, 0, 0])
        if g0[(nk, pr, yr)] >= K:
            e[0] += 1
        elif g1[(nk, pr, yb)] >= K:
            e[1] += 1
        elif g2[(nk, pr)] >= K:
            e[2] += 1
        else:
            e[3] += 1
    got = {
        r.c_nationkey: [
            r.released_exact_year, r.released_year_band, r.released_no_year, r.suppressed
        ]
        for r in _collect(spark, sf_dir, "privacy_k_anonymity_generalize")
    }
    assert got == expect
