"""Round-4 session-9 operators vs independent mirrors (sf0.001).

TPC-H Q4/Q6/Q7/Q14/Q18/Q19/Q22 shapes, exact ROC-AUC, cross-split
near-dup leakage, and the ES|QL GROK / SPLIT / MV_EXPAND structuring
commands — each checked against a pandas/pure-python recomputation, a
third code path beside Spark and the DuckDB twins.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(str(SF_SMOKE / "documents.parquet"))


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(str(SF_SMOKE / "events.parquet"))


# ------------------------------------------------------------- binary_auc
def _py_auc(pairs):
    """Pure-python Mann-Whitney AUC with average-rank ties: the textbook
    O(n log n) formulation, an algorithm INDEPENDENT of the engine's
    grouped prefix-sum (probability that a random positive outranks a
    random negative, ties half-credit)."""
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    if not pos or not neg:
        return None, None
    num2 = 0  # 2 * sum over positives of (#neg below + 0.5 * #neg tied)
    import bisect

    for s in pos:
        below = bisect.bisect_left(neg, s)
        tied = bisect.bisect_right(neg, s) - below
        num2 += 2 * below + tied
    return num2, num2 / (2.0 * len(pos) * len(neg))


def test_binary_auc_exact_vs_python(spark):
    from sparksearch.evaluate import binary_auc

    pairs = [
        (0.1, 0), (0.1, 1), (0.2, 0), (0.3, 1), (0.3, 1), (0.3, 0),
        (0.5, 1), (0.5, 0), (0.9, 1), (0.05, 0), (0.05, 0), (0.95, 1),
    ]
    df = spark.createDataFrame(pairs, "score double, y int")
    row = binary_auc(df).collect()[0]
    num2, auc = _py_auc(pairs)
    assert row.n_pos == 6 and row.n_neg == 6
    assert row.auc_numer2 == num2
    assert abs(row.auc - auc) < 5e-7  # engine output is round6-quantized

    # perfect separation and degenerate single-class inputs
    perfect = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "score double, y int"
    )
    assert binary_auc(perfect).collect()[0].auc == 1.0
    onecls = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, y int")
    r = binary_auc(onecls).collect()[0]
    assert r.auc is None and r.n_neg == 0

    # NULL scores are excluded, not ranked
    withnull = spark.createDataFrame(
        [(None, 1), (0.2, 0), (0.8, 1)], "score double, y int"
    )
    r = binary_auc(withnull).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (1, 1, 1.0)


def test_quality_auc_entry_bounds(spark):
    """The catalog wiring: score = quality_score, label = Gopher-gate
    passes; AUC must be a proper probability, both classes populated,
    and the score must strongly agree with the rule gate (they share the
    length/shape/stopword signals while differing in thresholds)."""
    from sparksearch.queries_catalog import q_quality_auc

    row = q_quality_auc(spark, str(SF_SMOKE)).collect()[0]
    n_docs = spark.read.parquet(str(SF_SMOKE / "documents.parquet")).count()
    assert row.n_pos + row.n_neg == n_docs  # no NULL-score docs in fixture
    assert row.n_pos > 0 and row.n_neg > 0
    assert 0.9 <= row.auc <= 1.0


# ------------------------------------------------- split near-dup leakage
def test_split_neardup_leakage_consistency(spark, docs):
    """Every reported pair must be a verified near-dup pair (subset of
    minhash_lsh_dedup) with train on the left and val/test on the right
    under the same deterministic split assignment."""
    from pyspark.sql import functions as F

    from sparksearch.sampling import split_name_col, split_neardup_leakage
    from sparksearch.textpipe import minhash_lsh_dedup

    leak = split_neardup_leakage(docs).collect()
    all_pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in minhash_lsh_dedup(docs).collect()
    }
    splits = {
        r.doc_id: r.split
        for r in docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            split_name_col().alias("split"),
        ).collect()
    }
    assert leak, "fixture has cross-split near-dups by construction"
    for r in leak:
        key = (min(r.train_doc, r.eval_doc), max(r.train_doc, r.eval_doc))
        assert key in all_pairs
        assert splits[r.train_doc] == "train"
        assert splits[r.eval_doc] == r.eval_split and r.eval_split != "train"
    # and completeness: every train-crossing verified pair is reported
    n_crossing = sum(
        1
        for (a, b) in all_pairs
        if ("train" in (splits[a], splits[b]) and splits[a] != splits[b])
    )
    assert n_crossing == len(leak)


# ----------------------------------------------------- ES|QL GROK and MV
def test_esql_grok_types_and_values(spark, events):
    from sparksearch.esql import compile_esql

    got = compile_esql(
        """FROM events
           | EVAL line = CONCAT(event_type, "-", TO_STRING(user_id),
                                ":", TO_STRING(event_id))
           | GROK line "%{WORD:etype}-%{INT:uid}:%{INT:eid}"
           | KEEP etype, uid, eid""",
        tables={"events": events},
    )
    schema = dict(got.dtypes)
    assert schema == {"etype": "string", "uid": "bigint", "eid": "bigint"}
    rows = {r.eid: (r.etype, r.uid) for r in got.collect()}
    for r in events.select("event_id", "event_type", "user_id").collect():
        assert rows[r.event_id] == (r.event_type, r.user_id)


def test_esql_grok_no_match_yields_nulls(spark, events):
    from sparksearch.esql import compile_esql

    got = compile_esql(
        """FROM events
           | EVAL line = event_type
           | GROK line "%{INT:only_digits}"
           | KEEP event_id, only_digits""",
        tables={"events": events},
    )
    vals = [r.only_digits for r in got.collect()]
    assert vals and all(v is None for v in vals)  # no digits in event_type


def test_esql_mv_expand_split(spark, docs):
    from pyspark.sql import functions as F

    from sparksearch.esql import compile_esql

    got = compile_esql(
        """FROM documents
           | EVAL words = SPLIT(LOWER(text), " ")
           | MV_EXPAND words
           | WHERE LENGTH(words) > 3
           | STATS n_words = COUNT(*) BY lang""",
        tables={"documents": docs},
    )
    want = (
        docs.select("lang", F.explode(F.split(F.lower("text"), r"\ ")).alias("w"))
        .filter(F.length("w") > 3)
        .groupBy("lang")
        .count()
    )
    assert {(r.lang, r.n_words) for r in got.collect()} == {
        (r.lang, r["count"]) for r in want.collect()
    }


def test_esql_grok_errors(spark, events):
    from sparksearch.esql import EsqlError, compile_esql

    with pytest.raises(EsqlError, match="unknown GROK syntax"):
        compile_esql(
            'FROM events | GROK event_type "%{IP:addr}"',
            tables={"events": events},
        )
    with pytest.raises(EsqlError, match="no %"):
        compile_esql(
            'FROM events | GROK event_type "plain text"',
            tables={"events": events},
        )


# ----------------------------------------------------------- TPC-H shapes
def test_tpch_q4_q6_q18_vs_pandas(spark):
    import pandas as pd

    from sparksearch.joins import large_orders, order_priority, revenue_forecast

    li = spark.read.parquet(str(SF_SMOKE / "lineitem.parquet"))
    od = spark.read.parquet(str(SF_SMOKE / "orders.parquet"))
    cu = spark.read.parquet(str(SF_SMOKE / "customer.parquet"))
    lp, op = li.toPandas(), od.toPandas()

    # Q4 mirror: quarter orders with >=1 returned item, counted by priority
    in_q = op[
        (op.o_orderdate >= pd.Timestamp("1997-01-01"))
        & (op.o_orderdate < pd.Timestamp("1997-04-01"))
    ]
    returned = set(lp[lp.l_returnflag == "R"].l_orderkey)
    want = (
        in_q[in_q.o_orderkey.isin(returned)]
        .groupby("o_orderpriority")
        .size()
        .to_dict()
    )
    got = {
        r.o_orderpriority: r.n_orders
        for r in order_priority(od, li).collect()
    }
    assert got == want

    # Q6 mirror: n_items (the revenue column is oracle-checked at 3 SFs)
    m = lp[
        (lp.l_shipdate >= pd.Timestamp("1996-01-01"))
        & (lp.l_shipdate < pd.Timestamp("1997-01-01"))
        & (lp.l_discount >= 0.03)
        & (lp.l_discount <= 0.07)
        & (lp.l_quantity < 25.0)
    ]
    row = revenue_forecast(li).collect()[0]
    assert row.n_items == len(m)
    assert abs(row.revenue - round((m.l_extendedprice * m.l_discount).round(6).sum(), 6)) < 1e-3

    # Q18 mirror: the qualifying keyset and its quantity sums
    sums = lp.groupby("l_orderkey").l_quantity.sum()
    big = sums[sums > 200]
    got_rows = large_orders(li, od, cu).collect()
    assert {r.o_orderkey for r in got_rows} <= set(big.index)
    assert len(got_rows) == min(100, len(big))
    for r in got_rows:
        assert abs(r.total_qty - big[r.o_orderkey]) < 1e-9


def test_tpch_wave2_vs_pandas(spark):
    """Q15/Q17/Q21 mirrors: the agg rewrites must equal the textbook
    per-group set logic recomputed in pandas."""
    from sparksearch.joins import (
        blamed_suppliers,
        small_quantity_revenue,
        top_supplier,
    )

    li = spark.read.parquet(str(SF_SMOKE / "lineitem.parquet"))
    od = spark.read.parquet(str(SF_SMOKE / "orders.parquet"))
    su = spark.read.parquet(str(SF_SMOKE / "supplier.parquet"))
    na = spark.read.parquet(str(SF_SMOKE / "nation.parquet"))
    pt = spark.read.parquet(str(SF_SMOKE / "part.parquet"))
    lp, op, sp = li.toPandas(), od.toPandas(), su.toPandas()

    # Q15: argmax suppliers of quarter revenue
    import pandas as pd

    m = lp[
        (lp.l_shipdate >= pd.Timestamp("1996-10-01"))
        & (lp.l_shipdate < pd.Timestamp("1997-01-01"))
    ].copy()
    m["rev"] = (m.l_extendedprice * (1 - m.l_discount)).round(6)
    rev = m.groupby("l_suppkey").rev.sum().round(6)
    want = set(rev[rev == rev.max()].index)
    got = {r.s_suppkey for r in top_supplier(li, su).collect()}
    assert got == want

    # Q17: item count below the exact 0.2*avg threshold for Brand#5
    pp = pt.toPandas()
    b5 = set(pp[pp.p_brand == "Brand#5"].p_partkey)
    sub = lp[lp.l_partkey.isin(b5)]
    g = sub.groupby("l_partkey").l_quantity.agg(["count", "sum"])
    j = sub.merge(g, left_on="l_partkey", right_index=True)
    n_small = int((j.l_quantity * 5 * j["count"] < j["sum"]).sum())
    assert small_quantity_revenue(li, pt).collect()[0].n_items == n_small

    # Q21: sole-blame counts from explicit per-order supplier sets
    fkeys = set(op[op.o_orderstatus == "F"].o_orderkey)
    fo = lp[lp.l_orderkey.isin(fkeys)]
    blame = {}
    for ok, grp in fo.groupby("l_orderkey"):
        supps = set(grp.l_suppkey)
        ret = set(grp[grp.l_returnflag == "R"].l_suppkey)
        if len(supps) >= 2 and len(ret) == 1:
            (s,) = ret
            blame[s] = blame.get(s, 0) + 1
    names = dict(zip(sp.s_suppkey, sp.s_name))
    ranked = sorted(blame.items(), key=lambda kv: (-kv[1], names[kv[0]]))[:25]
    got_rows = blamed_suppliers(li, od, su, na).collect()
    assert [(names[k], v) for k, v in ranked] == [
        (r.s_name, r.numwait) for r in got_rows
    ]
