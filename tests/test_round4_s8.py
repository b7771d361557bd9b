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
