"""Boolean query retrieval (sparksearch.boolq): parser shape, the
pure-negative rejection rule, and match-set semantics against a brute-force
Python evaluation. Score values are covered by the catalog oracle entry."""

from __future__ import annotations

import pytest

from sparksearch.boolq import (
    boolean_topk,
    literals,
    parse_bool,
    positive_literals,
)


def test_parse_precedence_and_shape():
    assert parse_bool("a") == ("term", "a")
    assert parse_bool("a AND b") == ("and", [("term", "a"), ("term", "b")])
    # NOT > AND > OR
    assert parse_bool("a OR b AND NOT c") == (
        "or",
        [("term", "a"), ("and", [("term", "b"), ("not", ("term", "c"))])],
    )
    assert parse_bool("(a OR b) AND c") == (
        "and",
        [("or", [("term", "a"), ("term", "b")]), ("term", "c")],
    )
    # literal normalization goes through the pinned tokenizer
    assert parse_bool("HASH AND Join") == (
        "and", [("term", "hash"), ("term", "join")]
    )


def test_literal_extraction():
    t = parse_bool("(a OR NOT b) AND c AND NOT d")
    assert literals(t) == {"a", "b", "c", "d"}
    assert positive_literals(t) == {"a", "c"}
    # double negation re-positivizes
    assert positive_literals(parse_bool("a AND NOT (b AND NOT c)")) == {"a", "c"}


@pytest.mark.parametrize("bad", ["NOT x", "a OR NOT b", "NOT (a AND b)"])
def test_pure_negative_rejected(bad):
    with pytest.raises(ValueError, match="pure-negative"):
        parse_bool(bad)


@pytest.mark.parametrize("bad", ["a AND (b OR c", "AND a", "a b", ""])
def test_malformed_rejected(bad):
    with pytest.raises(ValueError):
        parse_bool(bad)


def _py_eval(ast, present: set[str]) -> bool:
    if ast[0] == "term":
        return ast[1] in present
    if ast[0] == "not":
        return not _py_eval(ast[1], present)
    if ast[0] == "and":
        return all(_py_eval(x, present) for x in ast[1])
    return any(_py_eval(x, present) for x in ast[1])


def test_match_sets_equal_bruteforce(spark):
    from sparksearch.stats import corpus_stats
    from sparksearch.tokenize import py_tokenize

    texts = [
        "hash join order", "sort merge join", "hash batch", "scan window",
        "join dup hash sort", "merge scan batch", "plain words only",
        "join", "hash", "sort sort merge",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    tf_df, dl_df, ts, _ = corpus_stats(docs)
    queries = [
        (1, "hash AND join"),
        (2, "sort OR merge"),
        (3, "join AND NOT batch"),
        (4, "(hash OR sort) AND join AND NOT dup"),
    ]
    got = {}
    for r in boolean_topk(spark, queries, tf_df, dl_df, ts, k=100).collect():
        got.setdefault(r.query_id, set()).add(r.doc_id)
    want = {}
    for qid, q in queries:
        tree = parse_bool(q)
        for did, text in enumerate(texts):
            if _py_eval(tree, set(py_tokenize(text))):
                want.setdefault(qid, set()).add(did)
    assert got == want
    # every ranked row scores > 0 and ranks are dense from 1 per query
    rows = boolean_topk(spark, queries, tf_df, dl_df, ts, k=100).collect()
    for qid in {r.query_id for r in rows}:
        ranks = sorted(r.rank for r in rows if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))
