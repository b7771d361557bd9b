"""Unit tests for search_ext: infix wildcards, SynonymQuery blending,
significant terms, term vectors — each against a hand-computable micro
corpus plus semantics checks the catalog oracles can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparksearch import BM25_B, BM25_K1
from sparksearch.search_ext import (
    expand_wildcard_queries,
    significant_terms,
    synonym_topk,
    term_vectors,
)
from sparksearch.tokenize import py_tokenize


@pytest.fixture(scope="module")
def micro(spark):
    """4-doc corpus with known tf/df; returns (docs, tf_df, dl_df, ts, gstats)."""
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    rows = [
        (0, "hash join join", "en"),
        (1, "merge sort merge", "en"),
        (2, "hash merge scan", "de"),
        (3, "sort scan scan scan", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tt = tokenize_tf(docs.select("doc_id", "text"))
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    gstats = global_stats_df(dl_df)
    ts = with_idf(doc_freq(tf_df), gstats)
    return docs, tf_df, dl_df, ts, gstats


def _idf(df: int, n: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def _bm25(tf: float, idf: float, dl: int, avgdl: float) -> float:
    return idf * tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )


def test_wildcard_expansion_semantics(spark, micro):
    _, _, _, ts, _ = micro
    got = {
        (r.query_id, r.term)
        for r in expand_wildcard_queries(
            spark, [(1, "s", "n"), (2, "h", "h"), (3, "m", "e")], ts
        ).collect()
    }
    # s*n -> scan; h*h -> hash (anchors may abut but not overlap: len 4 >= 2);
    # m*e -> merge
    assert got == {(1, "scan"), (2, "hash"), (3, "merge")}


def test_wildcard_no_overlap_guard(spark, micro):
    _, _, _, ts, _ = micro
    # 'so*rt' requires length >= 4 and both anchors: sort matches ('so'+'rt'
    # exactly abut); 'sor*rt' must NOT match sort (would need overlap).
    got = {
        (r.query_id, r.term)
        for r in expand_wildcard_queries(
            spark, [(1, "so", "rt"), (2, "sor", "rt")], ts
        ).collect()
    }
    assert got == {(1, "sort")}


def test_synonym_blended_scores_hand_math(spark, micro):
    _, tf_df, _, ts, _ = micro
    # group {hash, merge}: df(hash)=2, df(merge)=2 -> df_g=2; doc tfs blend:
    # doc0 tf=1, doc1 tf=2, doc2 tf=2 (hash 1 + merge 1), doc3 absent.
    out = {
        r.doc_id: r.score
        for r in synonym_topk(
            spark, [(1, [["hash", "merge"]])], tf_df, ts, k=10
        ).collect()
    }
    n, avgdl = 4, (3 + 3 + 3 + 4) / 4.0
    idf_g = _idf(2, n)
    exp = {
        0: _bm25(1, idf_g, 3, avgdl),
        1: _bm25(2, idf_g, 3, avgdl),
        2: _bm25(2, idf_g, 3, avgdl),
    }
    assert set(out) == set(exp)
    for d, s in exp.items():
        assert out[d] == pytest.approx(s, abs=1e-9)


def test_synonym_absent_member_degrades(spark, micro):
    _, tf_df, _, ts, _ = micro
    # {sort, zzz}: zzz has no postings -> group df = df(sort) = 2, and only
    # sort occurrences blend — identical to querying plain 'sort'.
    a = {
        (r.doc_id, round(r.score, 9))
        for r in synonym_topk(spark, [(1, [["sort", "zzz"]])], tf_df, ts).collect()
    }
    b = {
        (r.doc_id, round(r.score, 9))
        for r in synonym_topk(spark, [(1, [["sort"]])], tf_df, ts).collect()
    }
    assert a == b and len(a) == 2  # docs 1 and 3


def test_significant_terms_hand_math(spark, micro):
    docs, tf_df, _, ts, gstats = micro
    out = {
        (r.facet, r.term): (r.df_fg, r.score)
        for r in significant_terms(
            docs.select("doc_id", "lang"), tf_df, ts, gstats, min_df=1, k=10
        ).collect()
    }
    # scan: df_bg=2 (docs 2,3 both 'de'), n_fg(de)=2, N=4 ->
    # lift = (2/2)/(2/4) = 2.0; in 'en' scan absent.
    assert out[("de", "scan")] == (2, 2.0)
    assert ("en", "scan") not in out
    # join: only doc0 (en) -> (1/2)/(1/4) = 2.0
    assert out[("en", "join")] == (1, 2.0)
    # hash: doc0 (en), doc2 (de) -> each facet (1/2)/(2/4) = 1.0
    assert out[("en", "hash")] == (1, 1.0)
    assert out[("de", "hash")] == (1, 1.0)


def test_significant_terms_rank_order(spark, micro):
    docs, tf_df, _, ts, gstats = micro
    rows = significant_terms(
        docs.select("doc_id", "lang"), tf_df, ts, gstats, min_df=1, k=10
    ).collect()
    for facet in {"en", "de"}:
        fr = sorted((r for r in rows if r.facet == facet), key=lambda r: r.rank)
        keys = [(-r.score, -r.df_fg, r.term) for r in fr]
        assert keys == sorted(keys)
        assert [r.rank for r in fr] == list(range(1, len(fr) + 1))


def test_term_vectors_vs_py_tokenize(spark, docs_sf0001):
    ids = [0, 3, 7]
    got = {
        (r.doc_id, r.term): (r.tf, r.first_pos)
        for r in term_vectors(docs_sf0001, ids).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in docs_sf0001.filter(F.col("doc_id").isin(ids)).collect()
    }
    exp = {}
    for did, text in texts.items():
        toks = py_tokenize(text)
        for i, t in enumerate(toks):
            if (did, t) not in exp:
                exp[(did, t)] = [0, i + 1]
            exp[(did, t)][0] += 1
    assert got == {k: tuple(v) for k, v in exp.items()}


# ------------------------------------------- fuzzy / regexp / live / explain


def test_fuzzy_expansion_edit_distance_boundary(spark, micro):
    from sparksearch.search_ext import expand_fuzzy_queries

    _, _, _, ts, _ = micro  # vocab: hash join merge sort scan
    got = {
        (r.query_id, r.term)
        for r in expand_fuzzy_queries(
            spark, [(1, "scan"), (2, "merg"), (3, "xxxxxxx")], ts, max_edits=2
        ).collect()
    }
    assert (1, "scan") in got            # distance 0 included
    assert (2, "merge") in got           # distance 1
    assert all(q != 3 for q, _ in got)   # nothing within 2 edits of xxxxxxx
    # 'scan' vs 'sort': s-c-a-n / s-o-r-t = 3 edits -> excluded
    assert (1, "sort") not in got


def test_regexp_expansion_anchoring(spark, micro):
    from sparksearch.search_ext import expand_regexp_queries

    _, _, _, ts, _ = micro
    got = {
        (r.query_id, r.term)
        for r in expand_regexp_queries(
            spark, [(1, "^s"), (2, "^sc.n$"), (3, "a")], ts
        ).collect()
    }
    assert {t for q, t in got if q == 1} == {"sort", "scan"}
    assert {t for q, t in got if q == 2} == {"scan"}
    # substring semantics: every term containing an 'a'
    assert {t for q, t in got if q == 3} == {"hash", "scan"}


def test_live_docs_excluded_but_scores_unchanged(spark, micro):
    """liveDocs: tombstoned docs vanish from results; surviving docs keep
    the exact score they had against the full index (stats still count
    deleted docs, Lucene-style)."""
    from sparksearch.querying import parse_queries, score_logical

    _, tf_df, dl_df, ts, _ = micro
    q = parse_queries(spark, [(1, "hash merge scan")])
    full = {r.doc_id: r.score for r in score_logical(q, tf_df, dl_df, ts).collect()}
    live_tf = tf_df.filter(F.col("doc_id") != 2)  # tombstone doc 2
    live = {
        r.doc_id: r.score
        for r in score_logical(q, live_tf, dl_df, ts).collect()
    }
    assert 2 in full and 2 not in live
    for d, s in live.items():
        assert s == pytest.approx(full[d], abs=0.0)


def test_explain_contribs_sum_to_score(spark, docs_sf0001):
    """Per-term explain contributions must sum (within rounding) to the
    doc's total BM25 score from the flagship path."""
    from sparksearch.build import tokenize_tf
    from sparksearch.querying import parse_queries, score_logical
    from sparksearch.stats import bm25_term_score_col, doc_freq, global_stats_df, with_idf

    tt = tokenize_tf(docs_sf0001.select("doc_id", "text"))
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    ts = with_idf(doc_freq(tf_df), global_stats_df(dl_df))
    qterms = parse_queries(spark, [(1, "hash join"), (2, "sort merge scan")])
    top = score_logical(qterms, tf_df, dl_df, ts, k=3)
    scores = {(r.query_id, r.doc_id): r.score for r in top.collect()}
    qx = qterms.join(ts.select("term", "idf", "avgdl"), "term")
    contrib = (
        tf_df.join(F.broadcast(qx), "term")
        .join(F.broadcast(top.select("query_id", "doc_id")), ["query_id", "doc_id"])
        .select("query_id", "doc_id", bm25_term_score_col(qtf="qtf").alias("c"))
    )
    sums: dict = {}
    for r in contrib.collect():
        sums[(r.query_id, r.doc_id)] = sums.get((r.query_id, r.doc_id), 0.0) + r.c
    assert set(sums) == set(scores)
    for key, s in sums.items():
        assert s == pytest.approx(scores[key], abs=1e-9)


# ----------------------------------------------------- count-min sketch


def test_cms_overestimates_never_under(spark, micro):
    from sparksearch.search_ext import cms_term_estimates

    _, tf_df, _, ts, _ = micro
    rows = cms_term_estimates(tf_df, ts).collect()
    assert len(rows) == 5  # vocab size
    for r in rows:
        assert r.cf_est >= r.cf_true  # the CMS guarantee


def test_cms_exact_when_width_exceeds_vocab(spark, micro):
    """With width >> vocab the chance of collision in ALL rows is nil for
    this fixed vocabulary — estimates must be exact."""
    from sparksearch.search_ext import cms_term_estimates

    _, tf_df, _, ts, _ = micro
    rows = cms_term_estimates(tf_df, ts, depth=4, width=1 << 20).collect()
    for r in rows:
        assert r.cf_est == r.cf_true


def test_cms_counters_deterministic_and_mass_preserving(spark, micro):
    from sparksearch.search_ext import cms_counters

    _, tf_df, _, _, _ = micro
    a = sorted(map(tuple, cms_counters(tf_df).collect()))
    b = sorted(map(tuple, cms_counters(tf_df.repartition(7)).collect()))
    assert a == b  # partitioning-invariant (h60 keying, exact sums)
    total = 13  # total tokens in the micro corpus
    for row in range(4):
        assert sum(c for r, _, c in a if r == row) == total


def test_complete_prefixes_orders_by_cf(spark):
    from sparksearch.querying import complete_prefixes
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [(0, "scan scan scan scatter"), (1, "scan scale scatter scatter")],
        "doc_id long, text string",
    )
    _, _, ts, _ = corpus_stats(docs)
    out = [
        (r.rank, r.term, r.cf)
        for r in sorted(
            complete_prefixes(spark, [(1, "sca")], ts, n=3).collect(),
            key=lambda r: r.rank,
        )
    ]
    # cf: scan=4, scatter=3, scale=1
    assert out == [(1, "scan", 4), (2, "scatter", 3), (3, "scale", 1)]


def test_complete_prefixes_no_match_and_tiebreak(spark):
    from sparksearch.querying import complete_prefixes
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta bead")], "doc_id long, text string"
    )
    _, _, ts, _ = corpus_stats(docs)
    got = {
        r.query_id: (r.rank, r.term)
        for r in complete_prefixes(spark, [(1, "zz"), (2, "bea")], ts, n=1).collect()
    }
    assert 1 not in got           # no vocabulary completion -> no rows
    assert got[2] == (1, "bead")  # 'bea' matches only 'bead', not 'beta'


def test_percolate_conjunctive_semantics(spark):
    from sparksearch.querying import parse_queries
    from sparksearch.search_ext import percolate
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [(0, "hash join"), (1, "hash scan"), (2, "join scan hash")],
        "doc_id long, text string",
    )
    tf_df, _, _, _ = corpus_stats(docs)
    qs = [(1, "hash join"), (2, "scan"), (3, "hash zzz")]
    got = {
        (r.query_id, r.doc_id)
        for r in percolate(parse_queries(spark, qs), tf_df).collect()
    }
    assert got == {
        (1, 0), (1, 2),          # both terms required
        (2, 1), (2, 2),          # single-term query
        # query 3 has an unindexed term -> matches nothing
    }


def test_percolate_repeated_query_token(spark):
    from sparksearch.querying import parse_queries
    from sparksearch.search_ext import percolate
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame([(0, "hash x")], "doc_id long, text string")
    tf_df, _, _, _ = corpus_stats(docs)
    got = {
        (r.query_id, r.doc_id)
        for r in percolate(parse_queries(spark, [(9, "hash hash")]), tf_df).collect()
    }
    assert got == {(9, 0)}  # duplicates in the query don't double-require


def test_sort_by_field_orders_by_field_not_score(spark):
    from sparksearch.querying import parse_queries
    from sparksearch.search_ext import sort_by_field_topk
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [
            (0, "hash hash hash hash", "en", "w", 5),   # most relevant, small field
            (1, "hash pad pad", "en", "w", 50),
            (2, "hash pad", "en", "w", 20),
            (3, "nomatch", "en", "w", 999),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tf_df, _, _, _ = corpus_stats(docs)
    out = [
        (r.rank, r.doc_id, r.n_chars)
        for r in sorted(
            sort_by_field_topk(
                parse_queries(spark, [(1, "hash")]), tf_df, docs, k=2
            ).collect()
        )
    ]
    # ranked by n_chars DESC regardless of tf; non-matching doc 3 excluded
    assert out == [(1, 1, 50), (2, 2, 20)]


def test_boosted_query_scales_term_contribution(spark, micro):
    """term^2 exactly doubles that term's BM25 contribution; an unboosted
    repeated token equals an explicit ^2.0 boost."""
    from sparksearch.querying import (
        parse_boosted_queries,
        parse_queries,
        score_logical,
    )

    _, tf_df, dl_df, ts, _ = micro
    plain = {
        r.doc_id: r.score
        for r in score_logical(
            parse_queries(spark, [(1, "hash")]), tf_df, dl_df, ts
        ).collect()
    }
    boosted = {
        r.doc_id: r.score
        for r in score_logical(
            parse_boosted_queries(spark, [(1, "hash^2.0")]), tf_df, dl_df, ts
        ).collect()
    }
    assert set(plain) == set(boosted)
    for d in plain:
        assert boosted[d] == pytest.approx(2 * plain[d], abs=1e-9)
    repeated = {
        r.doc_id: r.score
        for r in score_logical(
            parse_boosted_queries(spark, [(1, "hash hash")]), tf_df, dl_df, ts
        ).collect()
    }
    assert repeated == boosted


def test_boosted_parse_mixed_and_fractional(spark):
    from sparksearch.querying import py_parse_boosted

    got = py_parse_boosted([(3, "hash^2.5 scan hash")])
    assert got == {(3, "hash"): 3.5, (3, "scan"): 1.0}


# ---------------------------------------------------- indexed expansion twins


@pytest.fixture(scope="module")
def sorted_dict_idx(spark, docs_sf0001, tmp_path_factory):
    """(dict_sorted, dict_rsorted, ts) over the same sf0.001 corpus — the
    physical sidecars the *_indexed expanders range-scan."""
    from sparksearch.build import (
        build_index, load_sorted_dictionary,
    )
    from sparksearch.stats import doc_freq, global_stats_df, with_idf
    from sparksearch.build import tokenize_tf

    path = str(tmp_path_factory.mktemp("dictidx"))
    build_index(spark, docs_sf0001, path, n_buckets=8, n_ranges=4)
    tt = tokenize_tf(docs_sf0001.select("doc_id", "text"))
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    ts = with_idf(doc_freq(tf_df), global_stats_df(dl_df))
    return (
        load_sorted_dictionary(spark, path),
        load_sorted_dictionary(spark, path, reversed_=True),
        ts,
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_indexed_expansions_equal_logical(spark, sorted_dict_idx):
    """Every *_indexed expander (range-pruned sidecar scan) produces exactly
    the logical linear-scan expansion — band/range pruning is lossless."""
    from sparksearch.querying import (
        complete_prefixes, complete_prefixes_indexed,
        expand_prefix_indexed, expand_prefix_queries,
        expand_suffix_indexed, expand_suffix_queries,
    )
    from sparksearch.search_ext import (
        expand_fuzzy_indexed, expand_fuzzy_queries,
        expand_regexp_indexed, expand_regexp_queries,
        expand_wildcard_indexed,
    )

    ds, dr, ts = sorted_dict_idx
    prefixes = [(1, "sor"), (2, "me"), (3, "qu")]
    suffixes = [(1, "ing"), (2, "ort"), (3, "ge")]
    wilds = [(1, "s", "t"), (2, "qu", "y"), (3, "f", "er")]
    fuzzies = [(1, "jion"), (2, "windoe"), (3, "soft")]
    regexes = [(1, "^s.*t$"), (2, "^(join|merge)$"), (3, "er$")]

    assert _rows(expand_prefix_indexed(spark, prefixes, ds)) == _rows(
        expand_prefix_queries(spark, prefixes, ts)
    )
    assert _rows(expand_suffix_indexed(spark, suffixes, dr)) == _rows(
        expand_suffix_queries(spark, suffixes, ts)
    )
    assert _rows(expand_wildcard_indexed(spark, wilds, ds)) == _rows(
        expand_wildcard_queries(spark, wilds, ts)
    )
    assert _rows(expand_fuzzy_indexed(spark, fuzzies, ds)) == _rows(
        expand_fuzzy_queries(spark, fuzzies, ts)
    )
    assert _rows(expand_regexp_indexed(spark, regexes, ds)) == _rows(
        expand_regexp_queries(spark, regexes, ts)
    )
    assert _rows(complete_prefixes_indexed(spark, prefixes, ds)) == _rows(
        complete_prefixes(spark, prefixes, ts)
    )


def test_fuzzy_band_is_sound(spark, sorted_dict_idx):
    """Pigeonhole check of the band bound itself: every vocabulary term
    within max_edits of the query has its p2 inside the band."""
    import numpy as np

    from sparksearch.search_ext import fuzzy_band_prefixes

    ds, _, _ = sorted_dict_idx
    terms = [r["term"] for r in ds.select("term").collect()]

    def lev(a, b):
        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return int(d[len(b)])

    for q in ["jion", "windoe", "soft", "x", "qurey"]:
        band = set(fuzzy_band_prefixes(q, 2))
        matches = [t for t in terms if lev(t, q) <= 2]
        for t in matches:
            assert t[:2] in band, (q, t)


def test_regex_literal_prefixes():
    from sparksearch.search_ext import regex_literal_prefixes

    assert regex_literal_prefixes("^s.*t$") == ["s"]
    assert regex_literal_prefixes("^(join|merge)$") == ["join", "merge"]
    assert regex_literal_prefixes("^.{3}$") is None
    assert regex_literal_prefixes("a.*a") is None
    assert regex_literal_prefixes("er$") is None
