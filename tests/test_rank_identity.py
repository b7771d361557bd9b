"""Golden gate: the logical BM25 path (Q5/Q6) is rank-identical to the NumPy
textbook oracle on the reference query set (BASELINE.json:14 — SURVEY.md §0:
the oracle IS the reference, the tree being empty)."""

from __future__ import annotations

import pytest

from sparksearch.querying import bm25_topk_from_docs

K = 10
TOL = 1e-9


def _spark_rankings(spark, docs, queries):
    rows = bm25_topk_from_docs(spark, docs, queries, k=K).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid in out:
        out[qid].sort()
    return out


def test_logical_path_rank_identical_sf001(spark, docs_sf001, queries, oracle_sf001):
    got = _spark_rankings(spark, docs_sf001, queries)
    for qid, text in queries:
        expected = oracle_sf001.topk(text, K)
        actual = got.get(qid, [])
        assert len(actual) == len(expected), (qid, text, len(actual), len(expected))
        for (rank, doc_id, score), (e_doc, e_score) in zip(actual, expected):
            assert doc_id == e_doc, (qid, text, rank, doc_id, e_doc)
            assert abs(score - e_score) <= TOL, (qid, text, rank, score, e_score)


def test_empty_and_unknown_queries_return_nothing(spark, docs_sf001):
    got = _spark_rankings(spark, docs_sf001, [(1, ""), (2, "zzz qqq")])
    assert got == {}


@pytest.mark.parametrize("qtext", ["dup", "join join", "dup join"])
def test_scores_strictly_ordered(spark, docs_sf001, oracle_sf001, qtext):
    got = _spark_rankings(spark, docs_sf001, [(1, qtext)])[1]
    scores = [s for _, _, s in got]
    assert scores == sorted(scores, reverse=True)
