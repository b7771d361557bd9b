"""Unit tests for rankers: Dirichlet query likelihood and BM25F."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparksearch import BM25_K1
from sparksearch.rankers import QLM_MU, bm25f_topk, qlm_topk


@pytest.fixture(scope="module")
def micro(spark):
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    rows = [
        (0, "hash join join"),
        (1, "merge sort merge"),
        (2, "hash merge scan"),
        (3, "sort scan scan scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tt = tokenize_tf(docs)
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    gstats = global_stats_df(dl_df)
    ts = with_idf(doc_freq(tf_df), gstats)
    return docs, tf_df, dl_df, ts


def _qterms(spark, queries):
    from sparksearch.querying import parse_queries

    return parse_queries(spark, queries)


def test_qlm_hand_math(spark, micro):
    _, tf_df, dl_df, ts = micro
    out = {
        r.doc_id: r.score
        for r in qlm_topk(_qterms(spark, [(1, "hash scan")]), tf_df, dl_df, ts).collect()
    }
    C = 13.0  # total tokens
    mu = QLM_MU
    p = {"hash": 2 / C, "scan": 4 / C}
    dls = {0: 3, 1: 3, 2: 3, 3: 4}
    tfs = {  # (doc -> {term: tf})
        0: {"hash": 1},
        2: {"hash": 1, "scan": 1},
        3: {"scan": 3},
    }
    exp = {}
    for d, terms in tfs.items():
        s = 0.0
        for t in ("hash", "scan"):
            s += math.log((terms.get(t, 0) + mu * p[t]) / (dls[d] + mu))
        exp[d] = s
    assert set(out) == set(exp)  # doc 1 matches neither term -> not a candidate
    for d in exp:
        assert out[d] == pytest.approx(exp[d], abs=1e-9)
    # doc 2 (both terms) must outrank the single-term docs
    assert max(exp, key=exp.get) == 2


def test_qlm_unknown_and_empty_queries(spark, micro):
    _, tf_df, dl_df, ts = micro
    out = qlm_topk(
        _qterms(spark, [(1, "zzz"), (2, ""), (3, "hash zzz")]), tf_df, dl_df, ts
    ).collect()
    qids = {r.query_id for r in out}
    assert qids == {3}  # pure-unknown and empty queries retrieve nothing
    # q3 degrades to known terms only: same candidates as plain 'hash'
    assert {r.doc_id for r in out} == {0, 2}


def test_bm25f_degenerates_to_scaled_bm25(spark, micro):
    """title_len >= every dl and w_title=1 collapses the two fields into
    one; BM25F's missing (k1+1) numerator then makes every score exactly
    BM25/(k1+1) — rank-identical to the flagship scorer."""
    from sparksearch.querying import score_logical

    docs, tf_df, dl_df, ts = micro
    q = _qterms(spark, [(1, "hash scan"), (2, "merge sort")])
    f = bm25f_topk(q, docs, dl_df, ts, title_len=100, w_title=1.0, w_body=1.0)
    b = score_logical(q, tf_df, dl_df, ts)
    fr = {(r.query_id, r.doc_id): (r.rank, r.score) for r in f.collect()}
    br = {(r.query_id, r.doc_id): (r.rank, r.score) for r in b.collect()}
    assert set(fr) == set(br)
    for key, (rank, score) in fr.items():
        assert rank == br[key][0]
        assert score * (BM25_K1 + 1.0) == pytest.approx(br[key][1], abs=1e-9)


def test_bm25f_title_boost(spark):
    """Two docs, same tokens, query term in title vs body: the title doc
    must score higher under w_title > w_body."""
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    rows = [
        (0, "join filler filler filler filler filler filler filler"),
        (1, "filler filler filler filler filler filler filler join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tt = tokenize_tf(docs)
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    ts = with_idf(doc_freq(tf_df), global_stats_df(dl_df))
    out = {
        r.doc_id: r.score
        for r in bm25f_topk(
            _qterms(spark, [(1, "join")]), docs, dl_df, ts, title_len=5
        ).collect()
    }
    assert out[0] > out[1]


def test_bm25f_all_short_corpus_no_nan(spark):
    """Every doc shorter than title_len -> avg body length 0; scores must
    stay finite (body contribution zeroed, no 0/0)."""
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    docs = spark.createDataFrame(
        [(0, "hash join"), (1, "sort")], "doc_id long, text string"
    )
    tt = tokenize_tf(docs)
    dl_df = tt.filter("lead").select("doc_id", "dl")
    ts = with_idf(doc_freq(tt.select("term", "doc_id", "tf", "dl")), global_stats_df(dl_df))
    out = bm25f_topk(
        _qterms(spark, [(1, "hash")]), docs, dl_df, ts, title_len=5
    ).collect()
    assert len(out) == 1 and math.isfinite(out[0].score) and out[0].score > 0


def test_vsm_cosine_hand_math(spark, micro):
    from sparksearch.rankers import vsm_cosine_topk

    _, tf_df, _, ts = micro
    out = {
        r.doc_id: (r.rank, r.score)
        for r in vsm_cosine_topk(
            _qterms(spark, [(1, "hash scan")]), tf_df, ts
        ).collect()
    }
    N = 4.0
    dfs = {"hash": 2, "join": 1, "merge": 2, "sort": 2, "scan": 2}
    idf = {t: math.log(1 + (N - d + 0.5) / (d + 0.5)) for t, d in dfs.items()}
    tfs = {
        0: {"hash": 1, "join": 2},
        1: {"merge": 2, "sort": 1},
        2: {"hash": 1, "merge": 1, "scan": 1},
        3: {"sort": 1, "scan": 3},
    }
    dnorm = {
        d: math.sqrt(sum(round((tf * idf[t]) ** 2, 9) for t, tf in terms.items()))
        for d, terms in tfs.items()
    }
    qnorm = math.sqrt(round(idf["hash"] ** 2, 9) + round(idf["scan"] ** 2, 9))
    exp = {}
    for d, terms in tfs.items():
        dot = sum(
            round(1 * idf[t] * terms[t] * idf[t], 9)
            for t in ("hash", "scan")
            if t in terms
        )
        if dot:
            exp[d] = round(dot / (dnorm[d] * qnorm), 6)
    assert {d: s for d, (_, s) in out.items()} == pytest.approx(exp, abs=2e-6)
    # doc 2 matches both terms; docs 0/3 one each
    assert set(out) == {0, 2, 3}


def test_vsm_cosine_self_similarity(spark, micro):
    """A query that IS a document's token multiset scores cosine 1 on it."""
    from sparksearch.rankers import vsm_cosine_topk

    _, tf_df, _, ts = micro
    out = vsm_cosine_topk(_qterms(spark, [(9, "hash join join")]), tf_df, ts).collect()
    best = min(out, key=lambda r: r.rank)
    assert best.doc_id == 0 and abs(best.score - 1.0) <= 2e-6
    assert all(r.score <= best.score + 1e-12 for r in out)
