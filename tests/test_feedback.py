"""Unit tests for pseudo-relevance feedback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearch.feedback import prf_topk


@pytest.fixture(scope="module")
def stats(spark, docs_sf0001):
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    tt = tokenize_tf(docs_sf0001.select("doc_id", "text")).persist()
    tt.count()
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    ts = with_idf(doc_freq(tf_df), global_stats_df(dl_df))
    yield tf_df, dl_df, ts
    tt.unpersist()


def _qterms(spark, queries):
    from sparksearch.querying import parse_queries

    return parse_queries(spark, queries)


def test_prf_matches_manual_two_stage(spark, stats):
    """PRF == manually chaining: top-3 docs -> top-5 decimal-exact tf·idf
    terms (originals excluded) at weight 0.5 -> score_logical rescore."""
    from decimal import Decimal

    from sparksearch.querying import score_logical

    tf_df, dl_df, ts = stats
    queries = [(1, "hash join"), (2, "sort merge")]
    q = _qterms(spark, queries)
    got = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in prf_topk(q, tf_df, dl_df, ts, k=10).collect()
    }

    base = score_logical(q, tf_df, dl_df, ts, k=3)
    fbdocs = {(r.query_id, r.doc_id) for r in base.collect()}
    orig = {(r.query_id, r.term) for r in q.collect()}
    idf = {r.term: r.idf for r in ts.collect()}
    w: dict[tuple[int, str], Decimal] = {}
    for r in tf_df.collect():
        for qid in {1, 2}:
            if (qid, r.doc_id) in fbdocs and (qid, r.term) not in orig:
                key = (qid, r.term)
                w[key] = w.get(key, Decimal(0)) + Decimal(
                    f"{round(r.tf * idf[r.term], 6):.6f}"
                )
    exp_terms = []
    for qid in (1, 2):
        cands = sorted(
            ((t, v) for (q_, t), v in w.items() if q_ == qid),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        exp_terms += [(qid, t, 0.5) for t, _ in cands]
    q2 = spark.createDataFrame(
        [(qid, t, 1.0) for qid, t in sorted(orig)] + exp_terms,
        "query_id int, term string, qtf double",
    )
    exp = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 6))
        for r in score_logical(q2, tf_df, dl_df, ts, k=10).collect()
    }
    assert got == exp


def test_prf_expansion_excludes_original_terms(spark, stats):
    tf_df, dl_df, ts = stats
    # A query whose terms blanket the vocab top: expansion must never
    # re-add an original term (weights would double-count).
    q = _qterms(spark, [(1, "scan column window order sort")])
    out = prf_topk(q, tf_df, dl_df, ts, k=10).collect()
    assert len(out) == 10  # still retrieves a full page


def test_prf_unknown_query_yields_nothing(spark, stats):
    tf_df, dl_df, ts = stats
    out = prf_topk(_qterms(spark, [(1, "zzz qqq")]), tf_df, dl_df, ts).collect()
    assert out == []  # no stage-1 docs -> no expansion -> no results
