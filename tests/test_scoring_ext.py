"""Semantic properties of the result/score-shaping family (scoring_ext):
degenerate-parameter identities against the flagship paths, plus hand-math
collapsing behavior. Catalog-level DuckDB equality runs in test_operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparksearch.querying import parse_queries, score_logical, score_logical_conjunctive
from sparksearch.stats import corpus_stats

QUERIES = [(1, "hash join"), (2, "scan filter query"), (3, "sort merge")]


@pytest.fixture(scope="module")
def stats(docs_sf0001):
    tf_df, dl_df, ts, gs = corpus_stats(docs_sf0001)
    tf_df = tf_df.persist()
    yield tf_df, dl_df, ts
    tf_df.unpersist()


def _ranks(df):
    return {(r.query_id, r.rank): (r.doc_id, round(r.score, 9)) for r in df.collect()}


def test_msm_1_is_disjunctive(spark, docs_sf0001, stats):
    from sparksearch.scoring_ext import msm_topk

    tf_df, dl_df, ts = stats
    q = parse_queries(spark, QUERIES)
    assert _ranks(msm_topk(q, tf_df, dl_df, ts, msm=1, k=20)) == _ranks(
        score_logical(q, tf_df, dl_df, ts, k=20)
    )


def test_msm_nterms_is_conjunctive(spark, docs_sf0001, stats):
    from sparksearch.scoring_ext import msm_topk

    tf_df, dl_df, ts = stats
    # single multi-term query so msm = its resolved term count exactly
    q = parse_queries(spark, [(1, "scan filter query")])
    n = q.count()
    assert _ranks(msm_topk(q, tf_df, dl_df, ts, msm=n, k=20)) == _ranks(
        score_logical_conjunctive(q, tf_df, dl_df, ts, k=20)
    )


def test_msm_exceeding_terms_matches_nothing(spark, docs_sf0001, stats):
    from sparksearch.scoring_ext import msm_topk

    tf_df, dl_df, ts = stats
    q = parse_queries(spark, [(1, "hash join")])
    assert msm_topk(q, tf_df, dl_df, ts, msm=5, k=20).count() == 0


def test_collapse_hand_math(spark):
    from sparksearch.scoring_ext import collapse_topk

    docs = spark.createDataFrame(
        [
            (0, "hash hash hash", "a"),   # best of source a for 'hash'
            (1, "hash hash x y z", "a"),  # suppressed: same source, lower tf
            (2, "hash x", "b"),           # best of source b
            (3, "x y", "b"),              # no match
        ],
        "doc_id long, text string, source string",
    )
    tf_df, dl_df, ts, _ = corpus_stats(docs)
    q = parse_queries(spark, [(1, "hash")])
    out = collapse_topk(q, tf_df, dl_df, ts, docs.select("doc_id", "source"),
                        "source", k=10)
    rows = {(r.rank): (r.doc_id, r.source) for r in out.collect()}
    assert rows == {1: (0, "a"), 2: (2, "b")}
    # without collapsing, doc 1 would also rank
    flat = {r.doc_id for r in score_logical(q, tf_df, dl_df, ts, k=10).collect()}
    assert flat == {0, 1, 2}


def test_function_score_is_bm25_times_log1p(spark, docs_sf0001, stats):
    from sparksearch.scoring_ext import function_score_topk

    tf_df, dl_df, ts = stats
    q = parse_queries(spark, QUERIES)
    meta = docs_sf0001.select("doc_id", "n_chars")
    got = {
        (r.query_id, r.doc_id): r.score
        for r in function_score_topk(q, tf_df, dl_df, ts, meta, k=10**9).collect()
    }
    base = {
        (r.query_id, r.doc_id): r.score
        for r in score_logical(q, tf_df, dl_df, ts, k=10**9).collect()
    }
    nchars = {r.doc_id: r.n_chars for r in meta.collect()}
    assert got
    for (qid, did), s in got.items():
        assert s == pytest.approx(base[(qid, did)] * math.log1p(nchars[did]), rel=1e-12)


def test_dismax_degenerates_to_bm25_without_title_field(spark, docs_sf0001, stats):
    """title_len=0 ⇒ every token is body, body avg = avgdl ⇒ the per-field
    saturation IS the engine BM25 formula: ranks and scores must match the
    flagship exactly (any tie_break: the max is over one field)."""
    from sparksearch.scoring_ext import dismax_topk

    tf_df, dl_df, ts = stats
    q = parse_queries(spark, QUERIES)
    dm = {
        (r.query_id, r.rank): (r.doc_id, round(r.score, 9))
        for r in dismax_topk(q, docs_sf0001, dl_df, ts, k=20, title_len=0).collect()
    }
    assert dm == _ranks(score_logical(q, tf_df, dl_df, ts, k=20))


def test_dismax_title_hit_beats_body_hit(spark):
    from sparksearch.scoring_ext import dismax_topk

    # doc 0 hits 'hash' in a longer-than-average body (norm > 1 damps it);
    # doc 1 hits it in the title at exactly average title length (norm = 1).
    # The title hit must outrank DESPITE the higher doc_id — i.e. by score,
    # not by the (score DESC, doc_id ASC) tie-break.
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j hash"),
            (1, "hash a b c d"),
        ],
        "doc_id long, text string",
    )
    tf_df, dl_df, ts, _ = corpus_stats(docs)
    q = parse_queries(spark, [(1, "hash")])
    out = {r.rank: r.doc_id for r in dismax_topk(q, docs, dl_df, ts, k=2).collect()}
    assert out[1] == 1 and out[2] == 0


def test_rescore_weight_zero_is_bm25(spark, docs_sf0001, stats):
    from sparksearch.scoring_ext import rescore_topk

    tf_df, dl_df, ts = stats
    q = parse_queries(spark, QUERIES)
    got = _ranks(
        rescore_topk(docs_sf0001, QUERIES, tf_df, dl_df, ts,
                     window=10**6, rescore_weight=0.0, k=20)
    )
    assert got == _ranks(score_logical(q, tf_df, dl_df, ts, k=20))


def test_rescore_promotes_tight_phrase(spark):
    from sparksearch.scoring_ext import rescore_topk

    # doc 0: higher tf of both terms but every join precedes every hash —
    # no ordered hash->join chain exists, boost 0; doc 1: single tight
    # ordered occurrence, boost 2*1/(1+1) = 1.0.
    docs = spark.createDataFrame(
        [
            (0, "join join join x hash x x hash x x hash"),
            (1, "hash join x x x x x x x"),
        ],
        "doc_id long, text string",
    )
    tf_df, dl_df, ts, _ = corpus_stats(docs)
    queries = [(1, "hash join")]
    base = {
        r.rank: r.doc_id
        for r in score_logical(parse_queries(spark, queries), tf_df, dl_df, ts, k=2).collect()
    }
    assert base[1] == 0  # BM25 alone prefers the tf-heavy doc
    resc = {
        r.rank: r.doc_id
        for r in rescore_topk(docs, queries, tf_df, dl_df, ts, k=2).collect()
    }
    # hand-math: BM25 gap ~ 0.99*ln(1.2) ~ 0.18 < boost gap 1.0 -> the
    # ordered tight doc must flip to rank 1.
    assert resc == {1: 1, 2: 0}


def test_rescore_unknown_term_query_degrades_to_bm25(spark, docs_sf0001, stats):
    from sparksearch.scoring_ext import rescore_topk

    tf_df, dl_df, ts = stats
    queries = [(1, "join zzz")]
    got = _ranks(rescore_topk(docs_sf0001, queries, tf_df, dl_df, ts, window=10**6, k=20))
    base = _ranks(score_logical(parse_queries(spark, queries), tf_df, dl_df, ts, k=20))
    assert got == base  # the zzz chain never completes: boost is 0 everywhere


def test_top_hits_by_field_matches_brute_force(spark, docs_sf0001, queries):
    from sparksearch.querying import parse_queries, score_all
    from sparksearch.scoring_ext import top_hits_by_field
    from sparksearch.stats import corpus_stats

    tf_df, dl_df, ts, _ = corpus_stats(docs_sf0001.select("doc_id", "text", "lang"))
    qterms = parse_queries(spark, queries)
    meta = docs_sf0001.select("doc_id", "lang")
    got = [
        (r.query_id, r.lang, r.bucket_rank, r.doc_id, round(r.score, 6))
        for r in top_hits_by_field(qterms, tf_df, dl_df, ts, meta, "lang").collect()
    ]
    # brute force: full scored frame, python-side per-(query, lang) rank
    lang = {r.doc_id: r.lang for r in meta.collect()}
    scored = [
        (r.query_id, lang[r.doc_id], round(r.score, 6), r.doc_id)
        for r in score_all(qterms, tf_df, dl_df, ts).collect()
    ]
    from collections import defaultdict

    buckets = defaultdict(list)
    for qid, lg, s, d in scored:
        buckets[(qid, lg)].append((s, d))
    want = []
    for (qid, lg), rows in buckets.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        want += [(qid, lg, rk + 1, d, s) for rk, (s, d) in enumerate(rows[:3])]
    assert sorted(got) == sorted(want)


def test_boosting_query_demotes_but_keeps(spark):
    """ES boosting semantics: a negative-match doc is DEMOTED (x0.5), not
    removed (must_not would drop it) — and the demotion runs before the
    rank cut."""
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import boosting_topk
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),        # strong match, clean
            (2, "apple apple apple apple"),   # strongest match but dup-y
            (3, "apple"),                     # weak match, clean
            (4, "banana only"),
        ],
        "doc_id long, text string",
    )
    tf_df, dl_df, ts, _ = corpus_stats(docs)
    qterms = parse_queries(spark, [(1, "apple")])
    plain = {
        r.doc_id: (r.rank, r.score)
        for r in boosting_topk(
            qterms, tf_df, dl_df, ts, neg_terms=("zzz",), k=10
        ).collect()
    }
    demoted = {
        r.doc_id: (r.rank, r.score)
        for r in boosting_topk(
            qterms, tf_df, dl_df, ts, neg_terms=("dup",), k=10
        ).collect()
    }
    # no doc contains 'dup' -> identical; now demote docs containing 'apple'
    assert plain == demoted
    neg = {
        r.doc_id: (r.rank, r.score)
        for r in boosting_topk(
            qterms, tf_df, dl_df, ts, neg_terms=("banana",), k=10
        ).collect()
    }
    # doc 1 matches the negative query: still present, score halved,
    # rank falls below doc 2 (and stays above or equal per actual values)
    assert 1 in neg
    # library returns raw scores (the catalog wrapper rounds): x0.5 exact
    assert neg[1][1] == plain[1][1] * 0.5
    assert neg[2] == (1, plain[2][1])   # clean top doc unaffected
    assert neg[1][0] > plain[1][0] or plain[1][0] == neg[1][0]
    assert 4 not in plain  # sanity: non-matching doc never appears


def test_diversified_is_capped_top_hits_page(spark, docs_sf0001, queries):
    from pyspark.sql import functions as F

    from sparksearch.build import tokenize_tf
    from sparksearch.queries_catalog import parse_queries
    from sparksearch.scoring_ext import (
        DIVERSIFIED_K,
        DIVERSIFIED_MAX_PER_BUCKET,
        diversified_topk,
        top_hits_by_field,
    )
    from sparksearch.stats import doc_freq, global_stats_df, round6, with_idf

    tt = tokenize_tf(docs_sf0001.select("doc_id", "text"))
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    ts = with_idf(doc_freq(tf_df), global_stats_df(dl_df))
    qterms = parse_queries(spark, queries)
    meta = docs_sf0001.select("doc_id", "lang")

    got = diversified_topk(qterms, tf_df, dl_df, ts, meta, "lang").collect()
    # cap + page-size invariants
    from collections import Counter

    per_bucket = Counter((r.query_id, r.lang) for r in got)
    assert max(per_bucket.values()) <= DIVERSIFIED_MAX_PER_BUCKET
    per_q = Counter(r.query_id for r in got)
    assert max(per_q.values()) <= DIVERSIFIED_K

    # equivalence: top_hits at per_bucket=cap, re-ranked globally, is the
    # same page (two code paths over one scored frame)
    th = top_hits_by_field(
        qterms, tf_df, dl_df, ts, meta, "lang",
        per_bucket=DIVERSIFIED_MAX_PER_BUCKET,
    ).select("query_id", "doc_id", round6("score").alias("s6"))
    want = {
        (r.query_id, r.doc_id)
        for q, grp in __import__("itertools").groupby(
            sorted(th.collect(), key=lambda r: (r.query_id, -r.s6, r.doc_id)),
            key=lambda r: r.query_id,
        )
        for r in list(grp)[:DIVERSIFIED_K]
    }
    assert {(r.query_id, r.doc_id) for r in got} == want
