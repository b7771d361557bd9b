"""Round-4 session-8 operators vs independent mirrors (sf0.001).

Jelinek-Mercer LM ranking, the ES sparse_vector (learned-sparse) query,
the filters aggregation, and the EQL two-step sequence — each checked
against a pandas/NumPy/pure-python recomputation, a third code path beside
Spark and the DuckDB twins.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def r6(x: float) -> float:
    d = Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)
    return float(d.quantize(Decimal("1e-6"), ROUND_HALF_UP))


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(str(SF_SMOKE / "events.parquet"))


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


@pytest.fixture(scope="module")
def search_stats(spark, docs_sf0001):
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    tt = tokenize_tf(docs_sf0001.select("doc_id", "text")).persist()
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    gs = global_stats_df(dl_df)
    ts = with_idf(doc_freq(tf_df), gs)
    yield tf_df, dl_df, ts, gs
    tt.unpersist()


@pytest.fixture(scope="module")
def corpus_tokens(docs_sf0001):
    from sparksearch.tokenize import py_tokenize

    rows = docs_sf0001.select("doc_id", "text").collect()
    return {int(r.doc_id): py_tokenize(r.text) for r in rows}


def test_jm_matches_python_lm(spark, search_stats, queries, corpus_tokens):
    """jm_topk ≡ a from-scratch Jelinek-Mercer log-likelihood over the
    corpus token lists, same λ, same total order."""
    from sparksearch.queries_catalog import K
    from sparksearch.querying import parse_queries
    from sparksearch.rankers import JM_LAMBDA, JM_RATIO, jm_topk
    from sparksearch.tokenize import py_tokenize

    tf_df, dl_df, ts, _ = search_stats
    got = {}
    df = jm_topk(parse_queries(spark, queries), tf_df, dl_df, ts, k=K)
    for r in df.collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.doc_id), r6(r.score))
        )

    cf = Counter()
    tf = {d: Counter(toks) for d, toks in corpus_tokens.items()}
    for toks in corpus_tokens.values():
        cf.update(toks)
    coll = float(sum(len(t) for t in corpus_tokens.values()))
    for qid, text in queries:
        qtf = Counter(t for t in py_tokenize(text) if t in cf)
        if not qtf:
            assert qid not in got
            continue
        qc = sum(n * math.log(JM_LAMBDA * (cf[t] / coll)) for t, n in qtf.items())
        scored = []
        for d, toks in corpus_tokens.items():
            if not any(tf[d][t] for t in qtf):
                continue
            dl = len(toks)
            ms = sum(
                n * math.log(1.0 + JM_RATIO * tf[d][t] / dl / (cf[t] / coll))
                for t, n in qtf.items()
                if tf[d][t]
            )
            scored.append((d, ms + qc))
        top = sorted(scored, key=lambda x: (-r6(x[1]), x[0]))[:K]
        want = [(i + 1, d, r6(s)) for i, (d, s) in enumerate(top)]
        assert got.get(qid, []) == want, f"query {qid}"


def test_sparse_vector_matches_python(spark, search_stats, queries, corpus_tokens):
    from sparksearch.queries_catalog import K
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import sparse_vector_topk
    from sparksearch.tokenize import py_tokenize

    tf_df, _, _, _ = search_stats
    df = sparse_vector_topk(parse_queries(spark, queries), tf_df, k=K)
    got = {}
    for r in df.collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.doc_id), int(r.score))
        )

    tf = {d: Counter(toks) for d, toks in corpus_tokens.items()}
    for qid, text in queries:
        terms = sorted(set(py_tokenize(text)))
        if not terms:
            assert qid not in got
            continue
        scored = []
        for d in corpus_tokens:
            s = 0
            for t in terms:
                if tf[d][t]:
                    wq = 1 + _h60(f"svq|{t}") % 4
                    wd = tf[d][t] * (1 + _h60(f"sv|{t}|{d}") % 8)
                    s += wq * wd
            if s:
                scored.append((d, s))
        top = sorted(scored, key=lambda x: (-x[1], x[0]))[:K]
        want = [(i + 1, d, s) for i, (d, s) in enumerate(top)]
        assert got.get(qid, []) == want, f"query {qid}"


def test_filters_agg_matches_pandas(spark, events, events_pd):
    from sparksearch.relational import FILTERS_HIGH_VALUE, events_filters_agg

    got = {
        r.bucket: (int(r.n_events), int(r.n_users))
        for r in events_filters_agg(events).collect()
    }
    want: dict[str, set] = {}
    counts: Counter = Counter()
    for _, row in events_pd.iterrows():
        tags = []
        if row.event_type == "click":
            tags.append("clicks")
        if row.event_type == "error":
            tags.append("errors")
        if row.value >= FILTERS_HIGH_VALUE:
            tags.append("high_value")
        if not tags:
            tags = ["_other_"]
        for t in tags:
            counts[t] += 1
            want.setdefault(t, set()).add(int(row.user_id))
    assert got == {t: (counts[t], len(us)) for t, us in want.items()}
    # independence: an expensive click lands in BOTH clicks and high_value
    n_click_high = int(
        (
            (events_pd.event_type == "click")
            & (events_pd.value >= FILTERS_HIGH_VALUE)
        ).sum()
    )
    if n_click_high:
        assert got["clicks"][0] + got["high_value"][0] > int(
            (
                (events_pd.event_type == "click")
                | (events_pd.value >= FILTERS_HIGH_VALUE)
            ).sum()
        )


def test_eql_sequence_matches_pandas(spark, events, events_pd):
    from sparksearch.relational import (
        EQL_FIRST,
        EQL_MAXSPAN_S,
        EQL_SECOND,
        eql_sequence,
    )

    got = sorted(
        (int(r.user_id), int(r.a_event_id), int(r.b_event_id), int(r.span_s))
        for r in eql_sequence(events).collect()
    )
    ep = (
        events_pd.ts.astype("datetime64[s]").astype("int64")
    )  # floored whole seconds (the ns//1e9 pitfall avoided)
    e = events_pd.assign(ep=ep)
    a = e[e.event_type == EQL_FIRST]
    b = e[e.event_type == EQL_SECOND]
    want = []
    for _, ar in a.iterrows():
        cand = b[
            (b.user_id == ar.user_id)
            & (b.ep > ar.ep)
            & (b.ep <= ar.ep + EQL_MAXSPAN_S)
        ]
        if len(cand):
            cand = cand.sort_values(["ep", "event_id"]).iloc[0]
            want.append(
                (
                    int(ar.user_id),
                    int(ar.event_id),
                    int(cand.event_id),
                    int(cand.ep - ar.ep),
                )
            )
    assert got == sorted(want)
    assert all(0 < s <= EQL_MAXSPAN_S for *_, s in got)


def _split(doc_id: int) -> str:
    h = _h60(str(doc_id)) % 100
    return "train" if h < 80 else ("val" if h < 90 else "test")


def test_bloom_decontamination_matches_python(spark, docs_sf0001, corpus_tokens):
    from sparksearch.sampling import (
        BLOOM_K,
        BLOOM_M,
        DECONTAM_K,
        bloom_decontamination,
    )

    got = {
        int(r.doc_id): (
            int(r.n_windows), int(r.bloom_dirty),
            int(r.exact_dirty), int(r.fp_windows),
        )
        for r in bloom_decontamination(docs_sf0001).collect()
    }

    def windows(toks):
        k = DECONTAM_K
        if len(toks) < k:
            return []
        return [_h60("|".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]

    def bits(w):
        return [_h60(f"bloom{j}|{w}") % BLOOM_M for j in range(BLOOM_K)]

    train_keys, train_bits = set(), set()
    for d, toks in corpus_tokens.items():
        if _split(d) == "train":
            for w in windows(toks):
                train_keys.add(w)
                train_bits.update(bits(w))
    want = {}
    for d, toks in corpus_tokens.items():
        if _split(d) != "test":
            continue
        ws = windows(toks)
        if not ws:
            continue
        bloom = sum(1 for w in ws if all(b in train_bits for b in bits(w)))
        exact = sum(1 for w in ws if w in train_keys)
        want[d] = (len(ws), bloom, exact, bloom - exact)
    assert got == want
    # the one-sided Bloom guarantee, and the fixture actually exercises FPs
    assert all(b >= e for _, b, e, _ in got.values())


def test_count_min_matches_python(spark, events, events_pd):
    from sparksearch.relational import (
        CM_DEPTH,
        CM_TOPN,
        CM_WIDTH,
        events_count_min,
    )

    got = [
        (int(r.user_id), int(r.n_exact), int(r.est_cm), int(r.overcount))
        for r in events_count_min(events).collect()
    ]
    exact = events_pd.groupby("user_id").size().to_dict()
    counters: Counter = Counter()
    for u, n in exact.items():
        for r in range(CM_DEPTH):
            counters[(r, _h60(f"cm{r}|{int(u)}") % CM_WIDTH)] += n
    est = {
        int(u): min(
            counters[(r, _h60(f"cm{r}|{int(u)}") % CM_WIDTH)]
            for r in range(CM_DEPTH)
        )
        for u in exact
    }
    top = sorted(exact.items(), key=lambda x: (-x[1], x[0]))[:CM_TOPN]
    want = [(int(u), n, est[int(u)], est[int(u)] - n) for u, n in top]
    assert got == want
    assert all(o >= 0 for *_, o in got)  # CM never undercounts


def test_bbq_matches_numpy(spark):
    import numpy as np

    from sparksearch.vectors import BBQ_NQ, BBQ_SHORTLIST, bbq_ann_topk

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    got = {}
    for r in bbq_ann_topk(emb).collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.vec_id), int(r.hamming), r6(r.score))
        )
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf.vec_id.to_numpy()
    V = np.array([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    B = (V > 0.0)
    for qi in range(BBQ_NQ):
        q = np.flatnonzero(ids == qi)[0]
        ham = (B ^ B[q]).sum(axis=1)
        order = sorted(
            (int(h), int(i)) for h, i in zip(ham, ids) if i != qi
        )[:BBQ_SHORTLIST]
        rer = []
        for h, i in order:
            v = V[np.flatnonzero(ids == i)[0]]
            c = float(v @ V[q] / (np.linalg.norm(v) * np.linalg.norm(V[q])))
            rer.append((i, h, r6(c)))
        rer.sort(key=lambda x: (-x[2], x[0]))
        want = [(rk + 1, i, h, s) for rk, (i, h, s) in enumerate(rer[:10])]
        assert got[qi] == want, f"query {qi}"


def test_passage_topk_matches_python(spark, docs_sf0001, queries, corpus_tokens):
    from sparksearch.queries_catalog import K
    from sparksearch.querying import parse_queries
    from sparksearch.rankers import PASSAGE_SIZE, PASSAGE_STRIDE, passage_topk
    from sparksearch.tokenize import py_tokenize

    got = {}
    df = passage_topk(parse_queries(spark, queries), docs_sf0001, k=K)
    for r in df.collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.doc_id), int(r.passage_id), r6(r.score))
        )

    passages = {}
    for d, toks in corpus_tokens.items():
        if not toks:
            continue
        n_starts = (len(toks) - 1) // PASSAGE_STRIDE + 1
        for pid in range(n_starts):
            passages[(d, pid)] = toks[
                pid * PASSAGE_STRIDE : pid * PASSAGE_STRIDE + PASSAGE_SIZE
            ]
    n_p = float(len(passages))
    avgpl = sum(len(p) for p in passages.values()) / len(passages)
    ptf = {k2: Counter(p) for k2, p in passages.items()}
    df_p: Counter = Counter()
    for c in ptf.values():
        df_p.update(c.keys())
    for qid, text in queries:
        qtf = Counter(t for t in py_tokenize(text) if df_p[t])
        if not qtf:
            assert qid not in got
            continue
        scored = []
        for (d, pid), c in ptf.items():
            s = 0.0
            for t, n in qtf.items():
                if c[t]:
                    idf = math.log(1.0 + (n_p - df_p[t] + 0.5) / (df_p[t] + 0.5))
                    pl = len(passages[(d, pid)])
                    s += n * idf * (c[t] * 2.2) / (
                        c[t] + 1.2 * (0.25 + 0.75 * pl / avgpl)
                    )
            if s:
                scored.append((d, pid, s))
        top = sorted(scored, key=lambda x: (-r6(x[2]), x[0], x[1]))[:K]
        want = [(i + 1, d, p, r6(s)) for i, (d, p, s) in enumerate(top)]
        assert got.get(qid, []) == want, f"query {qid}"


# ------------------------------------------------------------------- ES|QL


def test_esql_compiles_to_dataframe_equivalents(spark, events):
    """Compiled pipelines ≡ hand-built DataFrame plans, stage by stage."""
    from pyspark.sql import functions as F

    from sparksearch.esql import compile_esql

    t = {"events": events}
    got = compile_esql(
        'FROM events | WHERE event_type == "click" AND value > 50.0 '
        "| STATS n = COUNT(*), u = COUNT_DISTINCT(user_id) BY event_type",
        tables=t,
    ).collect()
    want = (
        events.filter((F.col("event_type") == "click") & (F.col("value") > 50.0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("u"),
        )
        .collect()
    )
    assert got == want

    # EVAL + arithmetic + KEEP + SORT + LIMIT
    got = compile_esql(
        "FROM events | EVAL v2 = value * 2.0 + 1.0, uid = user_id % 10 "
        "| KEEP event_id, v2, uid | SORT event_id ASC | LIMIT 5",
        tables=t,
    ).collect()
    want = (
        events.withColumn("v2", F.col("value") * 2.0 + 1.0)
        .withColumn("uid", F.col("user_id") % 10)
        .select("event_id", "v2", "uid")
        .orderBy("event_id")
        .limit(5)
        .collect()
    )
    assert got == want

    # LIKE wildcards, IN, NOT, IS NULL
    n_like = compile_esql(
        'FROM events | WHERE event_type LIKE "c*k" | STATS n = COUNT(*)',
        tables=t,
    ).collect()[0].n
    assert n_like == events.filter(F.col("event_type") == "click").count()
    n_notin = compile_esql(
        'FROM events | WHERE NOT event_type IN ("click", "view") '
        "| STATS n = COUNT(*)",
        tables=t,
    ).collect()[0].n
    assert n_notin == events.filter(
        ~F.col("event_type").isin("click", "view")
    ).count()


def test_esql_post_stats_stages_and_exact_sum(spark, events):
    """EVAL/WHERE after STATS operate on the aggregated frame; SUM over a
    double column is the exact decimal accumulation."""
    from decimal import Decimal

    from sparksearch.esql import compile_esql

    rows = compile_esql(
        "FROM events | STATS s = SUM(value), n = COUNT(*) BY event_type "
        "| EVAL avg6 = ROUND(TO_DOUBLE(s) / n, 6) | WHERE n > 0 "
        "| SORT event_type ASC",
        tables={"events": events},
    ).collect()
    pdf = events.toPandas()
    for r in rows:
        vals = pdf[pdf.event_type == r.event_type].value
        exact = sum(
            Decimal(repr(float(v))).quantize(Decimal("1e-9")) for v in vals
        )
        assert r.s == exact
        assert r.avg6 == r6(float(exact) / len(vals))
    assert [r.event_type for r in rows] == sorted(r.event_type for r in rows)


def test_esql_errors(spark, events):
    import pytest as _pt

    from sparksearch.esql import EsqlError, compile_esql

    t = {"events": events}
    for bad in [
        "WHERE x > 1",                      # no FROM
        "FROM nope",                        # unknown table
        "FROM events | FROB x",             # unknown command
        "FROM events | WHERE value >",      # truncated expr
        "FROM events | STATS n = MODE(value)",    # unknown agg
        'FROM events | WHERE value ~ "x"',  # untokenizable operator
    ]:
        with _pt.raises(EsqlError):
            compile_esql(bad, tables=t)


def test_esql_plan_is_declarative(spark, events):
    """The compiler emits a pure Catalyst plan: filter pushed to the scan,
    no Python UDFs anywhere."""
    from sparksearch.esql import compile_esql
    from sparksearch.queries_catalog import ESQL_EVENTS_QUERY

    df = compile_esql(
        ESQL_EVENTS_QUERY, spark=spark, sf_dir=str(SF_SMOKE)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    explained = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in explained
    assert "IsNotNull(event_type)" in explained or "Not(EqualTo(event_type,error)" in explained.replace(" ", "")


def test_rank_vectors_maxsim_matches_numpy(spark):
    import numpy as np

    from sparksearch.vectors import (
        RV_NQ,
        RV_SUBDIM,
        RV_SUBS,
        rank_vectors_maxsim_topk,
    )

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    got = {}
    for r in rank_vectors_maxsim_topk(emb).collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.vec_id), r6(r.score))
        )
    pdf = emb.toPandas()
    V = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in pdf.itertuples()
    }

    def bag(v):
        return [v[i * RV_SUBDIM : (i + 1) * RV_SUBDIM] for i in range(RV_SUBS)]

    for qi in range(RV_NQ):
        qb = bag(V[qi])
        scored = []
        for d, v in V.items():
            if d == qi:
                continue
            db = bag(v)
            s = Decimal(0)
            for qs in qb:
                m = max(r6(float(qs @ ds)) for ds in db)
                s += Decimal(repr(m)).quantize(Decimal("1e-6"))
            scored.append((d, s))
        top = sorted(scored, key=lambda x: (-x[1], x[0]))[:10]
        want = [(i + 1, d, r6(float(s))) for i, (d, s) in enumerate(top)]
        assert got[qi] == want, f"query {qi}"


def test_mmr_matches_python_greedy(spark):
    import numpy as np

    from sparksearch.vectors import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        RV_NQ,
        mmr_rerank,
    )

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    got = {}
    for r in mmr_rerank(emb).collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.vec_id), r6(r.relevance), r6(r.mmr_score))
        )
    pdf = emb.toPandas()
    V = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in pdf.itertuples()
    }

    def cos(a, b):
        return r6(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))))

    for qi in range(RV_NQ):
        rel = {
            d: cos(v, V[qi]) for d, v in V.items() if d != qi
        }
        pool = sorted(rel, key=lambda d: (-rel[d], d))[:MMR_POOL]
        selected, want = [], []
        for rnd in range(1, MMR_K + 1):
            best = None
            for d in pool:
                if d in selected:
                    continue
                maxsim = max(
                    (cos(V[d], V[s]) for s in selected), default=0.0
                )
                key = r6(MMR_LAMBDA * rel[d] - (1.0 - MMR_LAMBDA) * maxsim)
                cand = (key, -d)
                if best is None or cand > best[0]:
                    best = (cand, d, key)
            _, d, key = best
            selected.append(d)
            want.append((rnd, d, rel[d], key))
        assert got[qi] == want, f"query {qi}"
        # diversification really engaged: selections are not simply the
        # relevance top-k whenever any near-duplicate sits in the pool
        assert len(set(d for _, d, *_ in want)) == MMR_K


def test_significant_text_matches_python(spark, docs_sf0001, corpus_tokens):
    from sparksearch.search_ext import (
        SIG_TEXT_FG_TERM,
        SIG_TEXT_MIN_DF,
        significant_text,
    )

    got = [
        (int(r.rank), r.term, int(r.df_fg), int(r.df_bg), r6(r.score))
        for r in significant_text(docs_sf0001).collect()
    ]
    texts = {
        int(r.doc_id): r.text
        for r in docs_sf0001.select("doc_id", "text").collect()
    }
    surv = {}
    for d, t in texts.items():
        h = hashlib.sha256(t.encode()).hexdigest()
        if h not in surv or d < surv[h]:
            surv[h] = d
    keep = set(surv.values())
    tsets = {
        d: set(corpus_tokens[d]) for d in keep if corpus_tokens[d]
    }
    fg = {d for d, s in tsets.items() if SIG_TEXT_FG_TERM in s}
    n_all, n_fg = len(tsets), len(fg)
    df_bg: Counter = Counter()
    df_fg: Counter = Counter()
    for d, s in tsets.items():
        df_bg.update(s)
        if d in fg:
            df_fg.update(s)
    scored = [
        (t, df_fg[t], df_bg[t], r6(float(df_fg[t] * n_all) / (df_bg[t] * n_fg)))
        for t in df_fg
        if df_fg[t] >= SIG_TEXT_MIN_DF
    ]
    scored.sort(key=lambda x: (-x[3], -x[1], x[0]))
    want = [(i + 1, t, f, b, s) for i, (t, f, b, s) in enumerate(scored[:10])]
    assert got == want
    # the fg term itself is maximally significant (df_fg == its df_bg)
    assert any(t == SIG_TEXT_FG_TERM for _, t, *_ in got)


def test_tpch_q10_matches_pandas(spark):
    from sparksearch.joins import Q10_END, Q10_K, Q10_START, returned_items

    t = {
        n: spark.read.parquet(str(SF_SMOKE / f"{n}.parquet"))
        for n in ("lineitem", "orders", "customer", "nation")
    }
    got = [
        (int(r.c_custkey), r.c_name, r.n_name, r6(r.revenue), int(r.n_items))
        for r in returned_items(
            t["lineitem"], t["orders"], t["customer"], t["nation"]
        ).collect()
    ]
    li = t["lineitem"].toPandas()
    o = t["orders"].toPandas()
    c = t["customer"].toPandas()
    n = t["nation"].toPandas()
    o = o[(o.o_orderdate >= Q10_START) & (o.o_orderdate < Q10_END)]
    j = (
        li[li.l_returnflag == "R"]
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    j["rev"] = [
        Decimal(repr(round(p * (1.0 - d), 6))).quantize(Decimal("1e-6"))
        for p, d in zip(j.l_extendedprice, j.l_discount)
    ]
    g = (
        j.groupby(["c_custkey", "c_name", "n_name"])
        .agg(rev=("rev", "sum"), n=("rev", "size"))
        .reset_index()
    )
    g = g.sort_values(["rev", "c_custkey"], ascending=[False, True]).head(Q10_K)
    want = [
        (int(r.c_custkey), r.c_name, r.n_name, r6(float(r.rev)), int(r.n))
        for r in g.itertuples()
    ]
    assert got == want


def test_span_first_matches_python(spark, docs_sf0001, queries, corpus_tokens):
    from sparksearch.queries_catalog import K
    from sparksearch.querying import parse_queries
    from sparksearch.search_ext import SPAN_FIRST_END, span_first_topk
    from sparksearch.tokenize import py_tokenize

    got = {}
    df = span_first_topk(
        parse_queries(spark, queries), docs_sf0001, k=K
    )
    for r in df.collect():
        got.setdefault(int(r.query_id), []).append(
            (int(r.rank), int(r.doc_id), int(r.n_first_hits))
        )
    for qid, text in queries:
        terms = set(py_tokenize(text))
        if not terms:
            assert qid not in got
            continue
        scored = []
        for d, toks in corpus_tokens.items():
            hits = sum(1 for t in toks[:SPAN_FIRST_END] if t in terms)
            if hits:
                scored.append((d, hits))
        top = sorted(scored, key=lambda x: (-x[1], x[0]))[:K]
        want = [(i + 1, d, h) for i, (d, h) in enumerate(top)]
        assert got.get(qid, []) == want, f"query {qid}"


def test_matryoshka_overlap_matches_numpy(spark):
    import numpy as np

    from sparksearch.vectors import MRL_DIMS, MRL_K, RV_NQ, matryoshka_overlap

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    got = {
        (int(r.query_id), int(r.dim)): (int(r.overlap_k), r6(r.overlap_frac))
        for r in matryoshka_overlap(emb).collect()
    }
    pdf = emb.toPandas()
    V = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in pdf.itertuples()
    }

    def topk(qi, dim):
        scored = []
        for d, v in V.items():
            if d == qi:
                continue
            a, b = v[:dim], V[qi][:dim]
            c = r6(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))))
            scored.append((d, c))
        return {
            d for d, _ in sorted(scored, key=lambda x: (-x[1], x[0]))[:MRL_K]
        }

    for qi in range(RV_NQ):
        full = topk(qi, 64)
        for dim in MRL_DIMS:
            ov = len(topk(qi, dim) & full)
            assert got[(qi, dim)] == (ov, r6(ov / float(MRL_K))), (qi, dim)
    # monotone-ish sanity: 32-dim should never track the full ranking
    # WORSE than 16-dim on average (property of nested prefixes here)
    avg16 = sum(got[(q, 16)][0] for q in range(RV_NQ))
    avg32 = sum(got[(q, 32)][0] for q in range(RV_NQ))
    assert avg32 >= avg16


def test_split_kl_matches_python(spark, docs_sf0001, corpus_tokens):
    from sparksearch.sampling import split_kl_divergence

    langs = {
        int(r.doc_id): r.lang
        for r in docs_sf0001.select("doc_id", "lang").collect()
    }
    got = {
        r.lang: (
            int(r.n_terms), int(r.tot_train), int(r.tot_test),
            r6(r.kl_train_test), r6(r.kl_test_train),
        )
        for r in split_kl_divergence(docs_sf0001).collect()
    }
    ctr: dict = {}
    for d, toks in corpus_tokens.items():
        sp = _split(d)
        if sp == "val":
            continue
        for t in toks:
            key = (langs[d], t)
            c = ctr.setdefault(key, [0, 0])
            c[0 if sp == "train" else 1] += 1
    want = {}
    for lang in set(langs.values()):
        terms = {t: c for (lg, t), c in ctr.items() if lg == lang}
        if not terms:
            continue
        v = len(terms)
        tot_tr = sum(c[0] for c in terms.values())
        tot_te = sum(c[1] for c in terms.values())
        kpq = Decimal(0)
        kqp = Decimal(0)
        for c_tr, c_te in terms.values():
            p = (c_tr + 1.0) / float(tot_tr + v)
            q = (c_te + 1.0) / float(tot_te + v)
            kpq += Decimal(repr(p * math.log(p / q))).quantize(Decimal("1e-9"))
            kqp += Decimal(repr(q * math.log(q / p))).quantize(Decimal("1e-9"))
        want[lang] = (v, tot_tr, tot_te, r6(float(kpq)), r6(float(kqp)))
    assert got == want
    assert all(k1 >= 0 and k2 >= 0 for *_, k1, k2 in got.values())


def test_esql_lookup_join(spark):
    from pyspark.sql import functions as F

    from sparksearch.esql import EsqlError, compile_esql

    cust = spark.read.parquet(str(SF_SMOKE / "customer.parquet"))
    nation = spark.read.parquet(str(SF_SMOKE / "nation.parquet"))
    t = {"customer": cust, "nation": nation}
    got = compile_esql(
        "FROM customer | EVAL n_nationkey = c_nationkey "
        "| LOOKUP JOIN nation ON n_nationkey "
        "| STATS n = COUNT(*) BY n_name | SORT n_name ASC",
        tables=t,
    ).collect()
    want = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left"
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("n_name")
        .collect()
    )
    assert got == want
    # the broadcast actually lands in the physical plan
    df = compile_esql(
        "FROM customer | EVAL n_nationkey = c_nationkey "
        "| LOOKUP JOIN nation ON n_nationkey",
        tables=t,
    )
    assert "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString()
    import pytest as _pt

    with _pt.raises(EsqlError):
        compile_esql(
            "FROM customer | LOOKUP JOIN nation ON missing_field", tables=t
        )


def test_hard_negatives_excludes_all_relevant(spark, search_stats, queries, corpus_tokens):
    from sparksearch.queries_catalog import K
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import hard_negatives_topk
    from sparksearch.tokenize import py_tokenize

    tf_df, dl_df, ts, _ = search_stats
    qterms = parse_queries(spark, queries)
    got = {}
    for r in hard_negatives_topk(qterms, tf_df, dl_df, ts, k=K).collect():
        got.setdefault(int(r.query_id), []).append(int(r.doc_id))
    tsets = {d: set(t) for d, t in corpus_tokens.items()}
    vocab = set().union(*tsets.values())
    for qid, text in queries:
        all_terms = set(py_tokenize(text))
        known = {t for t in all_terms if t in vocab}
        if not known:
            assert qid not in got
            continue
        # conjunctive_qrels counts ALL distinct query terms: one unknown
        # term makes the relevance set empty (hit can never reach nt)
        relevant = {d for d, s in tsets.items() if all_terms <= s}
        # every mined negative is genuinely non-relevant
        assert not (set(got.get(qid, [])) & relevant), qid
    # and at least one query has a non-empty negative set
    assert any(got.values())


def test_geo_rings_partition_users_and_events(spark, events, events_pd):
    from sparksearch.relational import (
        GEO_ORIGIN,
        GEO_RING_RADII,
        events_geo_rings,
    )

    got = {
        r.ring: (int(r.n_events), int(r.n_users))
        for r in events_geo_rings(events).collect()
    }
    lon0, lat0 = GEO_ORIGIN
    want_e: Counter = Counter()
    want_u: dict = {}
    for u in events_pd.user_id:
        u = int(u)
        lon = _h60(f"geo-lon|{u}") % 360000 - 180000
        lat = _h60(f"geo-lat|{u}") % 170000 - 85000
        d2 = (lon - lon0) ** 2 + (lat - lat0) ** 2
        ring = next(
            (f"ring_{i}" for i, r in enumerate(GEO_RING_RADII) if d2 < r * r),
            "ring_3",
        )
        want_e[ring] += 1
        want_u.setdefault(ring, set()).add(u)
    assert got == {k: (want_e[k], len(want_u[k])) for k in want_e}
    # rings partition events exactly
    assert sum(e for e, _ in got.values()) == len(events_pd)


def test_esql_dissect(spark, events):
    from pyspark.sql import functions as F

    import pytest as _pt

    from sparksearch.esql import EsqlError, compile_esql

    t = {"events": events}
    got = compile_esql(
        'FROM events | EVAL line = CONCAT(event_type, "|", TO_STRING(user_id)) '
        '| DISSECT line "%{etype}|%{uid}" '
        "| STATS n = COUNT(*) BY etype | SORT etype ASC",
        tables=t,
    ).collect()
    want = (
        events.groupBy(F.col("event_type").alias("etype"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("etype")
        .collect()
    )
    assert got == want
    # CASE + COALESCE functions
    rows = compile_esql(
        'FROM events | EVAL big = CASE(value > 100.0, "hi", "lo") '
        "| STATS n = COUNT(*) BY big | SORT big ASC",
        tables=t,
    ).collect()
    n_hi = events.filter(F.col("value") > 100.0).count()
    assert {r.big: r.n for r in rows} == {
        "hi": n_hi, "lo": events.count() - n_hi,
    }
    with _pt.raises(EsqlError):
        compile_esql(
            'FROM events | DISSECT props "%{a}|%{b},%{c}"', tables=t
        )  # two distinct separators — outside the pinned subset
