"""Round-4 session-11 batch-B operators vs independent mirrors (sf0.001).

ERR is checked against a pure-python exact-integer replay (third code path
beside the Spark fold and the DuckDB windowed product); the DFR/axiomatic
rankers against float mirrors sharing the repo's op sequences; radial
search against a brute-force numpy sweep.
"""

from __future__ import annotations

import hashlib
import json
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("1e-9")).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP
        )
    )


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(str(SF_SMOKE / "documents.parquet"))


def test_err_exact_integer_mirror(spark):
    from sparksearch.catalog_s11b import ERR_SCALE, q_err_rank_eval
    from sparksearch.evaluate import EVAL_K, conjunctive_qrels
    from sparksearch.queries_catalog import _stats_for, reference_queries
    from sparksearch.querying import parse_queries, score_logical

    got = {r.query_id: r for r in q_err_rank_eval(spark, str(SF_SMOKE)).collect()}

    tf_df, dl_df, ts, _ = _stats_for(spark, str(SF_SMOKE))
    qterms = parse_queries(spark, reference_queries())
    topk = score_logical(qterms, tf_df, dl_df, ts, k=EVAL_K).collect()
    qrels = {(r.query_id, r.doc_id) for r in conjunctive_qrels(qterms, tf_df).collect()}

    runs: dict[int, list[tuple[int, int]]] = {}
    for r in topk:
        runs.setdefault(r.query_id, []).append((r.rank, r.doc_id))
    assert runs, "run must be non-empty"
    saw_grade = False
    for qid, rd in runs.items():
        prod, s = 1, 0
        for rank, doc in sorted(rd):
            g = 0
            if (qid, doc) in qrels:
                g = 1 + _h60(f"{qid}:{doc}") % 3
                saw_grade = True
            s += (2520 // rank) * ((1 << g) - 1) * prod * 8 ** (10 - rank)
            prod *= 9 - (1 << g)
        row = got[qid]
        assert row.err_num == s
        assert row.err_at_10 == _r6(s / float(ERR_SCALE))
        assert row.n_rel == sum(1 for (q, _) in qrels if q == qid)
    assert saw_grade, "at least one retrieved doc must be graded relevant"
    assert set(got) == set(runs)


def test_dfr_axiomatic_dfi_ib_float_mirrors(spark, docs):
    from sparksearch.catalog_s11b import (
        AXIOM_S,
        INV_LN2,
        q_axiomatic_f2log_topk,
        q_dfi_chi2_topk,
        q_dfr_inl2_topk,
        q_ib_ll_topk,
    )

    texts = {r.doc_id: r.text for r in docs.collect()}
    toks = {d: re.findall(r"[a-z0-9_]+", t.lower()) for d, t in texts.items()}
    nz = {d: ts for d, ts in toks.items() if ts}
    n_docs = float(len(nz))
    avgdl = sum(len(ts) for ts in nz.values()) / len(nz)
    dfc = Counter()
    for ts in nz.values():
        for t in set(ts):
            dfc[t] += 1
    qs = json.loads(open("tests/queries.json").read())["queries"]

    def score_all(per_term):
        want = {}
        for q in qs:
            qt = Counter(re.findall(r"[a-z0-9_]+", q["text"].lower()))
            if not qt:
                continue
            scores: dict[int, float] = {}
            for d, ts in nz.items():
                tfs = Counter(ts)
                s = 0.0
                matched = False
                for t, qtf in qt.items():
                    if t not in dfc or t not in tfs:
                        continue
                    matched = True
                    s += per_term(qtf, tfs[t], len(ts), dfc[t], t)
                if matched:
                    scores[d] = s
            want[q["id"]] = scores
        return want

    def ax(qtf, tf, dl, df):
        return (
            qtf
            * math.log((n_docs + 1.0) / df)
            * (tf / (tf + AXIOM_S + AXIOM_S * dl / avgdl))
        )

    def dfr(qtf, tf, dl, df):
        tfn = tf * (math.log(1.0 + avgdl / dl) * INV_LN2)
        return qtf * (tfn / (tfn + 1.0)) * (
            math.log((n_docs + 1.0) / (df + 0.5)) * INV_LN2
        )

    cfc = Counter()
    for ts in nz.values():
        cfc.update(ts)
    coll_len = float(sum(len(ts) for ts in nz.values()))

    def dfi(qtf, tf, dl, df, t):
        e = cfc[t] * dl / coll_len
        if not tf > e:
            return 0.0
        return qtf * (math.log((tf - e) * (tf - e) / e + 1.0) * INV_LN2)

    def ib(qtf, tf, dl, df, t):
        lam = (cfc[t] + 1.0) / (n_docs + 1.0)
        tfn = tf * (math.log(1.0 + avgdl / dl) * INV_LN2)
        return qtf * (math.log((tfn + lam) / lam) * INV_LN2)

    for fn, per_term in [
        (q_axiomatic_f2log_topk, lambda q, tf, dl, df, t: ax(q, tf, dl, df)),
        (q_dfr_inl2_topk, lambda q, tf, dl, df, t: dfr(q, tf, dl, df)),
        (q_dfi_chi2_topk, dfi),
        (q_ib_ll_topk, ib),
    ]:
        rows = fn(spark, str(SF_SMOKE)).collect()
        assert rows
        want = score_all(per_term)
        for r in rows:
            assert r.score == pytest.approx(
                _r6(want[r.query_id][r.doc_id]), abs=1e-9
            ), (fn, r)
        for qid in {r.query_id for r in rows}:
            # every similarity here yields strictly positive per-term
            # contributions except DFI, whose zero-total docs the entry
            # drops — filter uniformly (harmless for the others).
            exp = sorted(
                ((d, s) for d, s in want[qid].items() if s > 0),
                key=lambda kv: (-Decimal(repr(_r6(kv[1]))), kv[0]),
            )[:10]
            mine = sorted(
                [(r.doc_id, r.rank) for r in rows if r.query_id == qid],
                key=lambda x: x[1],
            )
            assert [d for d, _ in mine] == [d for d, _ in exp], (fn, qid)


def test_esql_weighted_avg_sample_fork(spark):
    from sparksearch.esql import EsqlError, compile_esql

    df = spark.createDataFrame(
        [(1, "a", 10.0, 2.0), (2, "a", 20.0, 1.0), (3, "b", 30.0, 3.0),
         (4, "b", 4.0, 1.0)],
        "id long, g string, v double, w double",
    )
    out = {
        r.g: (r.wa, r.wf)
        for r in compile_esql(
            "FROM t | STATS wa = WEIGHTED_AVG(v, w),"
            " wf = WEIGHTED_AVG(v, w) WHERE v > 5.0 BY g",
            tables={"t": df},
        ).collect()
    }
    assert out["a"] == (40.0 / 3.0, 40.0 / 3.0)
    assert out["b"] == (94.0 / 4.0, 30.0)  # filtered drops BOTH sums' row
    with pytest.raises(EsqlError, match="WEIGHTED_AVG"):
        compile_esql("FROM t | STATS x = WEIGHTED_AVG(v)", tables={"t": df})

    # SAMPLE: deterministic (same subset every run), h60-predicate exact
    kept = compile_esql(
        "FROM t | SAMPLE 0.5 id | KEEP id", tables={"t": df}
    ).collect()
    ids = sorted(r.id for r in kept)
    assert ids == sorted(
        i for i in (1, 2, 3, 4) if _h60(str(i)) % 1_000_000 < 500_000
    )
    assert ids == sorted(
        r.id
        for r in compile_esql(
            "FROM t | SAMPLE 0.5 id | KEEP id", tables={"t": df}
        ).collect()
    )
    with pytest.raises(EsqlError, match="probability"):
        compile_esql("FROM t | SAMPLE 1.5 id", tables={"t": df})
    # sub-1e-6 probabilities must error, not silently sample zero rows
    # (float round() is half-even: round(0.5) == 0)
    with pytest.raises(EsqlError, match="granularity"):
        compile_esql("FROM t | SAMPLE 0.0000005 id", tables={"t": df})
    # fractional weights throw per-row (assert_true), never round silently
    with pytest.raises(Exception, match="integer-valued"):
        compile_esql(
            "FROM t | STATS x = WEIGHTED_AVG(v, 2.5)", tables={"t": df}
        ).collect()

    # FORK: branch pipelines with '|' inside parens, _fork tag, null fill
    rows = compile_esql(
        'FROM t | FORK (WHERE v > 15.0 | STATS hi = COUNT(*) BY g)'
        ' (STATS n = COUNT(*) | EVAL note = "all")',
        tables={"t": df},
    ).collect()
    by_fork = {}
    for r in rows:
        by_fork.setdefault(r._fork, []).append(r)
    assert {g.g: g.hi for g in by_fork["fork1"]} == {"a": 1, "b": 1}
    assert all(g.n is None and g.note is None for g in by_fork["fork1"])
    (f2,) = by_fork["fork2"]
    assert (f2.n, f2.note, f2.g, f2.hi) == (4, "all", None, None)
    with pytest.raises(EsqlError, match="at least two"):
        compile_esql("FROM t | FORK (STATS n = COUNT(*))", tables={"t": df})
    with pytest.raises(EsqlError, match="nested FORK"):
        compile_esql(
            "FROM t | FORK (FORK (STATS a = COUNT(*)) (STATS b = COUNT(*)))"
            " (STATS c = COUNT(*))",
            tables={"t": df},
        )


def test_span_within_vs_python_mirror(spark, docs):
    from sparksearch.catalog_s11b import SPANW_QUERIES
    from sparksearch.phrase import span_within_topk

    got = {
        (r.query_id, r.doc_id): (r.rank, r.n_within)
        for r in span_within_topk(docs, SPANW_QUERIES, k=10).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    want: dict[tuple[int, int], int] = {}
    for qid, big, slop, little in SPANW_QUERIES:
        a, b = big.split()
        for doc_id, text in texts.items():
            toks = re.findall(r"[a-z0-9_]+", text.lower())
            spans = []
            for pa, t in enumerate(toks, start=1):
                if t != a:
                    continue
                pb = next(
                    (
                        q
                        for q in range(pa + 1, min(pa + slop + 1, len(toks)) + 1)
                        if toks[q - 1] == b
                    ),
                    None,
                )
                if pb is not None:
                    spans.append((pa, pb))
            n = sum(
                1
                for q, t in enumerate(toks, start=1)
                if t == little and any(pa <= q <= pb for pa, pb in spans)
            )
            if n:
                want[(qid, doc_id)] = n
    for qid, _, _, _ in SPANW_QUERIES:
        full = sorted(
            ((d, n) for (q, d), n in want.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        mine = sorted(
            ((d, rn) for (q, d), rn in got.items() if q == qid),
            key=lambda x: x[1][0],
        )
        assert [(d, n) for d, (rk, n) in mine] == full
    assert any(n > 0 for n in want.values()), "queries must be non-degenerate"


def test_bpe_encode_counts_vs_python_mirror(spark, docs):
    from sparksearch.catalog_s11b import BPE_TOPK, q_bpe_encode_counts
    from tests.test_round4_s11 import _py_bpe

    rows = q_bpe_encode_counts(spark, str(SF_SMOKE)).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == BPE_TOPK

    texts = [r.text for r in docs.select("text").collect()]
    from sparksearch.catalog_s11 import BPE_MERGES

    merges = [(a, b) for _, a, b, _, _ in _py_bpe(texts, BPE_MERGES)]
    counts: Counter = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            syms = list(w)
            for a, b in merges:  # rank order, greedy non-overlapping
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            counts.update(syms)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOPK]
    assert [(r.sym, r.n) for r in rows] == top
    assert any(len(s) > 1 for s, _ in top), "merged symbols must reach the top"


def test_search_quality_report_job_deterministic(spark, tmp_path):
    import sys as _sys

    if "/root/repo/jobs" not in _sys.path:
        _sys.path.insert(0, "/root/repo/jobs")
    from jobs.search_quality_report import report

    s1 = report(spark, str(SF_SMOKE), str(tmp_path / "a"))
    s2 = report(spark, str(SF_SMOKE), str(tmp_path / "b"))
    for k in (
        "n_queries", "mean_precision_at_10", "mean_recall_at_10", "mean_mrr",
        "mean_ndcg_at_10", "mean_err_at_10", "quality_auc", "quality_ece",
        "calibration_bins",
    ):
        assert s1[k] == s2[k], k
    assert 0.0 <= s1["quality_auc"] <= 1.0
    assert 0.0 <= s1["mean_err_at_10"] <= 1.0
    assert s1["quality_ece"] is not None and s1["quality_ece"] >= 0.0
    a = sorted(map(tuple, spark.read.parquet(s1["audits"]["err"]).collect()))
    b = sorted(map(tuple, spark.read.parquet(s2["audits"]["err"]).collect()))
    assert a == b


def test_span_or_vs_python_mirror(spark, docs):
    from sparksearch.catalog_s11b import SPANOR_QUERIES, q_span_or_topk

    got = {
        (r.query_id, r.doc_id): (r.rank, r.n_spans)
        for r in q_span_or_topk(spark, str(SF_SMOKE)).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    want: dict[tuple[int, int], int] = {}
    for qid, ta, tb, slop, tc in SPANOR_QUERIES:
        for doc_id, text in texts.items():
            toks = re.findall(r"[a-z0-9_]+", text.lower())
            n = sum(
                1
                for p, t in enumerate(toks, start=1)
                if t in (ta, tb)
                and any(
                    toks[q - 1] == tc
                    for q in range(p + 1, min(p + slop + 1, len(toks)) + 1)
                )
            )
            if n:
                want[(qid, doc_id)] = n
    for qid, *_ in SPANOR_QUERIES:
        full = sorted(
            ((d, n) for (q, d), n in want.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        mine = sorted(
            ((d, rn) for (q, d), rn in got.items() if q == qid),
            key=lambda x: x[1][0],
        )
        assert [(d, n) for d, (rk, n) in mine] == full
    assert any(n > 0 for n in want.values())


def test_esql_mv_family(spark):
    from sparksearch.esql import compile_esql

    df = spark.createDataFrame([("b,a,c,a",), ("x",)], "s string")
    rows = {
        r.s: r
        for r in compile_esql(
            'FROM t | EVAL mv = SPLIT(s, ",")'
            ' | EVAL srt = MV_CONCAT(MV_SORT(mv, "desc"), "/"),'
            ' ded = MV_CONCAT(MV_DEDUPE(mv), "/"),'
            ' sl = MV_CONCAT(MV_SLICE(mv, 1, 2), "/"),'
            ' f = MV_FIRST(mv), l = MV_LAST(mv),'
            ' rv = MV_CONCAT(MV_REVERSE(mv), "/"),'
            ' ap = MV_COUNT(MV_APPEND(mv, mv)),'
            ' z = MV_CONCAT(MV_ZIP(mv, MV_DEDUPE(mv), "-"), "/")',
            tables={"t": df},
        ).collect()
    }
    r = rows["b,a,c,a"]
    assert r.srt == "c/b/a/a" and r.ded == "a/b/c" and r.sl == "a/c"
    assert r.f == "b" and r.l == "a" and r.rv == "a/c/a/b" and r.ap == 8
    # MV_ZIP: shorter side exhausts -> lone value (concat_ws skips nulls)
    assert r.z == "b-a/a-b/c-c/a"
    r1 = rows["x"]
    assert r1.f == "x" and r1.l == "x" and r1.ap == 2 and r1.z == "x-x"
    # malformed MV_SLICE bounds are a compile-time error (negative starts
    # are unreachable — the grammar yields no negative literal, and a
    # computed index fails the literal requirement; end < start hits the
    # explicit bound guard)
    from sparksearch.esql import EsqlError

    with pytest.raises(EsqlError, match="MV_SLICE"):
        compile_esql(
            'FROM t | EVAL mv = SPLIT(s, ",") | EVAL x = MV_SLICE(mv, 2, 1)',
            tables={"t": df},
        )
    # MV_AVG: exact decimal fold over a numeric mv (via VALUES)
    nums = spark.createDataFrame([(1, 2), (1, 4), (1, 9)], "g int, v int")
    row = compile_esql(
        "FROM t | STATS vs = VALUES(v) BY g | EVAL m = MV_AVG(vs) | KEEP m",
        tables={"t": nums},
    ).collect()[0]
    assert row.m == 5.0


def test_esql_qstr_and_date_functions(spark):
    import datetime as _dt

    from sparksearch.esql import EsqlError, compile_esql

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta"), (3, "beta"),
         (4, "delta sort")],
        "id long, text string",
    )

    def ids(q):
        return sorted(
            r.id
            for r in compile_esql(
                f'FROM t | WHERE QSTR(text, "{q}") | KEEP id', tables={"t": df}
            ).collect()
        )

    assert ids("alpha beta") == [1, 2, 3]          # bare terms OR
    assert ids("alpha AND beta") == [1]            # AND binds tighter
    assert ids("beta OR delta AND NOT sort") == [1, 2, 3]
    assert ids("(alpha OR beta) AND NOT gamma") == [2, 3]
    with pytest.raises(EsqlError, match="unbalanced"):
        ids("(alpha AND beta")

    ts = spark.createDataFrame(
        [(_dt.datetime(2024, 3, 5, 7, 0, 1), _dt.datetime(2024, 4, 2, 6, 59, 59))],
        "a timestamp, b timestamp",
    )
    row = compile_esql(
        'FROM t | EVAL m = DATE_TRUNC("month", a), y = DATE_TRUNC("year", b),'
        ' dd = DATE_DIFF("day", a, b), ss = DATE_DIFF("second", a, b)'
        " | KEEP m, y, dd, ss",
        tables={"t": ts},
    ).collect()[0]
    assert (row.m, row.y) == ("2024-03", "2024")
    assert row.dd == 28  # floor-both-days, not elapsed-86400s rounding
    assert row.ss == 28 * 86400 - 2
    with pytest.raises(EsqlError, match="unit"):
        compile_esql('FROM t | EVAL w = DATE_TRUNC("week", a)', tables={"t": ts})


def test_esql_stddev_and_change_point(spark):
    from sparksearch.esql import compile_esql

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 4.0), ("a", 4.0), ("a", 6.0), ("b", 5.0)],
        "g string, v double",
    )
    out = {
        r.g: (r.sd, r.sw)
        for r in compile_esql(
            "FROM t | STATS sd = STD_DEV(v),"
            " sw = STD_DEV(v) WHERE v > 2.0 BY g",
            tables={"t": df},
        ).collect()
    }
    # population sigma of [2,4,4,6] = sqrt(2); filtered [4,4,6]: mean 14/3
    import math

    assert out["a"][0] == pytest.approx(math.sqrt(2.0), abs=1e-12)
    assert out["a"][1] == pytest.approx(
        math.sqrt((16 + 16 + 36) / 3 - (14 / 3) ** 2), abs=1e-12
    )
    assert out["b"] == (0.0, 0.0)  # singleton: greatest(.,0) absorbs -ulp

    # CHANGE_POINT: a clean level shift at key 6 (10,10,10,10,10 -> 30,...)
    series = [(k, 10) for k in range(1, 6)] + [(k, 30) for k in range(6, 11)]
    sdf = spark.createDataFrame(series, "k long, n long")
    row = compile_esql(
        "FROM t | CHANGE_POINT n ON k", tables={"t": sdf}
    ).collect()[0]
    assert (row.k, row.n_left, row.n_right) == (6, 5, 5)
    assert (row.mean_left, row.mean_right) == (10.0, 30.0)
    assert row.stat == 20.0


def test_events_anomaly_days_vs_python_mirror(spark):
    from sparksearch.catalog_s11b import ANOMALY_TOPK, q_events_anomaly_days

    got = [
        (r.rank, r.day, r.dow, r.n, r.mean_dow, r.z)
        for r in q_events_anomaly_days(spark, str(SF_SMOKE)).collect()
    ]
    ev = spark.read.parquet(str(SF_SMOKE / "events.parquet")).collect()
    days: Counter = Counter()
    for r in ev:
        days[int(r.ts.timestamp() // 86400)] += 1
    base: dict[int, list[int]] = {}
    for d, n in days.items():
        base.setdefault(d % 7, []).append(n)
    rows = []
    for d, n in days.items():
        ns = base[d % 7]
        nd = len(ns)
        mean = sum(ns) / nd
        var = sum(x * x for x in ns) / nd - mean * mean
        std = (max(var, 0.0)) ** 0.5
        if std > 0.0:
            z = (n - mean) / std
            rows.append((_r6(abs(z)), d, d % 7, n, _r6(mean), _r6(z)))
    rows.sort(key=lambda t: (-t[0], t[1]))
    want = [
        (i + 1, d, dow, n, m, z)
        for i, (_, d, dow, n, m, z) in enumerate(rows[:ANOMALY_TOPK])
    ]
    assert got == want
    assert len(got) == ANOMALY_TOPK


def test_partition_pruned_scan_plan_and_values(spark):
    from sparksearch.catalog_s11b import (
        _partitioned_artifact,
        q_docs_partition_pruned,
    )

    df = q_docs_partition_pruned(spark, str(SF_SMOKE))
    jvm = spark.sparkContext._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the lang filter must resolve to DIRECTORY pruning, not a row filter
    assert "PartitionFilters" in plan
    import re as _re

    pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "lang" in pf.group(1), plan
    # only the en partition's files are listed
    path = _partitioned_artifact(spark, str(SF_SMOKE))
    import os

    langs = {d for d in os.listdir(path) if d.startswith("lang=")}
    assert len(langs) > 1, "fixture must have multiple lang partitions"
    # values equal the logical filter over the original table
    got = {r.source: (r.n, r.min_id, r.max_id) for r in df.collect()}
    docs = spark.read.parquet(str(SF_SMOKE / "documents.parquet"))
    want = {
        r.source: (r.n, r.mn, r.mx)
        for r in docs.filter("lang = 'en'")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("doc_id").cast("long").alias("mn"),
            F.max("doc_id").cast("long").alias("mx"),
        )
        .collect()
    }
    assert got == want and got


def test_radius_search_set_semantics(spark):
    import numpy as np

    from sparksearch.catalog_s11b import RADIUS_MIN_COSINE, q_ann_radius_search

    got = {
        (r.query_id, r.vec_id): r.score
        for r in q_ann_radius_search(spark, str(SF_SMOKE)).collect()
    }
    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet")).collect()
    vs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb}
    # numpy's pairwise dot differs from the Spark fold by ULPs — compare
    # with the vector-family tolerance and a threshold band (the entry's
    # own DuckDB twin does the bit-exact check; this mirrors semantics).
    cos = {}
    for qid in range(5):
        qv = vs[qid]
        for vid, v in vs.items():
            if vid == qid:
                continue
            cos[(qid, vid)] = float(np.dot(v, qv)) / (
                math.sqrt(float(np.dot(v, v))) * math.sqrt(float(np.dot(qv, qv)))
            )
    must = {k for k, c in cos.items() if _r6(c) >= RADIUS_MIN_COSINE + 2e-6}
    may = {k for k, c in cos.items() if _r6(c) >= RADIUS_MIN_COSINE - 2e-6}
    assert must <= set(got) <= may
    for k, v in got.items():
        assert v == pytest.approx(_r6(cos[k]), abs=2e-6)
        assert v >= RADIUS_MIN_COSINE
    assert got, "threshold must admit at least one pair at sf0.001"
