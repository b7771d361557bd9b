"""S-stemmer analyzer chain: the three pinned rules, the three-way
implementation equality (SQL CASE on Spark == SQL CASE on DuckDB == py_stem),
and stemmed retrieval semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sparksearch.analyzers import (
    STEM_CASE_SQL,
    py_stem,
    stem_col,
    stem_postings,
    stem_qterms,
)

CASES = [
    ("ponies", "pony"),      # rule 1: ies -> y
    ("cities", "city"),
    ("bodies", "body"),
    ("ties", "ty"),          # len 4 clears the guard; rule-exact, not linguistic
    ("ies", "ie"),           # len guard blocks rules 1-2; rule 3 still strips
    ("dishes", "dishe"),     # rule 2: drop the trailing s of es
    ("tables", "table"),
    ("goes", "goe"),         # oes blocks rule 2; rule 3 still fires
    ("trees", "tree"),       # ees blocks rule 2; rule 3 (plain s) still fires
    ("joins", "join"),       # rule 3: plain plural
    ("its", "it"),
    ("bus", "bus"),          # us guard
    ("class", "class"),      # ss guard
    ("is", "is"),            # len guard
    ("as", "as"),
    ("scan", "scan"),        # no suffix
    ("y", "y"),
]


def test_py_stem_hand_cases():
    for raw, want in CASES:
        assert py_stem(raw) == want, raw


def test_stem_col_equals_py_stem(spark):
    vocab = [r for r, _ in CASES] + [
        "aies", "eies", "xaies", "mess", "access", "corpus", "indices",
        "queries", "hashes", "es", "s", "ss",
    ]
    df = spark.createDataFrame([(t,) for t in vocab], "term string")
    got = {r.term: r.stem for r in df.select("term", stem_col("term").alias("stem")).collect()}
    assert got == {t: py_stem(t) for t in vocab}


def test_duckdb_case_equals_py_stem():
    vocab = [r for r, _ in CASES] + ["queries", "hashes", "corpus", "aies"]
    con = duckdb.connect()
    expr = STEM_CASE_SQL.format(t="term")
    rows = ", ".join(f"('{t}')" for t in vocab)
    got = dict(
        con.execute(
            f"SELECT term, {expr} AS stem FROM (VALUES {rows}) v(term)"
        ).fetchall()
    )
    assert got == {t: py_stem(t) for t in vocab}


@pytest.fixture(scope="module")
def stem_corpus(spark):
    from sparksearch.stats import corpus_stats

    docs = spark.createDataFrame(
        [
            (0, "cat naps"),          # singular cat
            (1, "cats cats nap"),     # plural conflates with doc 0's cat
            (2, "dog runs"),
        ],
        "doc_id long, text string",
    )
    return docs, corpus_stats(docs)


def test_stem_postings_merges_conflated_terms(spark, stem_corpus):
    _, (tf_df, _, _, _) = stem_corpus
    out = {
        (r.term, r.doc_id): r.tf for r in stem_postings(tf_df).collect()
    }
    # 'cats' x2 in doc 1 -> tf 2 under stem 'cat'; 'naps' -> 'nap'
    assert out[("cat", 0)] == 1 and out[("cat", 1)] == 2
    assert out[("nap", 0)] == 1 and out[("nap", 1)] == 1
    assert ("cats", 1) not in out and ("naps", 0) not in out
    # dl rides through unchanged (stemming never changes token counts)
    dl = {r.doc_id: r.dl for r in stem_postings(tf_df).select("doc_id", "dl").distinct().collect()}
    assert dl == {0: 2, 1: 3, 2: 2}


def test_stemmed_retrieval_crosses_plural_boundary(spark, stem_corpus):
    from sparksearch.querying import parse_queries, score_logical
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    _, (tf_df, dl_df, _, _) = stem_corpus
    stf = stem_postings(tf_df)
    sts = with_idf(doc_freq(stf), global_stats_df(dl_df))
    qterms = stem_qterms(parse_queries(spark, [(1, "cats")]))
    hits = {r.doc_id for r in score_logical(qterms, stf, dl_df, sts, k=10).collect()}
    assert hits == {0, 1}  # the singular-only doc now matches


def test_stem_qterms_reaggregates_qtf(spark):
    from sparksearch.querying import parse_queries

    q = stem_qterms(parse_queries(spark, [(7, "cat cats dogs")]))
    got = {(r.query_id, r.term): r.qtf for r in q.collect()}
    assert got == {(7, "cat"): 2, (7, "dog"): 1}
