"""Ranking-evaluation operator (ES _rank_eval): metric math pinned against
hand-computed cases; qrels derivation against a tiny known corpus. The DuckDB
driver oracle checks the full BM25-run evaluation end-to-end at sf0.01."""

from __future__ import annotations

from decimal import Decimal


def test_ranking_eval_hand_case(spark):
    from sparksearch.evaluate import DISCOUNTS, IDCG, ranking_eval

    queries = spark.createDataFrame([(1,), (2,), (3,)], "query_id long")
    # q1: judged {1,2,3}, retrieved [1, 9, 2] -> hits at ranks 1 and 3
    # q2: no judgments, 2 unjudged results
    # q3: judged {5}, nothing retrieved
    topk = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 9), (1, 3, 2), (2, 1, 7), (2, 2, 8)],
        "query_id long, rank long, doc_id long",
    )
    qrels = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (3, 5)], "query_id long, doc_id long"
    )
    got = {r.query_id: r for r in ranking_eval(queries, topk, qrels).collect()}
    assert set(got) == {1, 2, 3}

    r1 = got[1]
    assert (r1.n_rel, r1.retrieved, r1.relevant_retrieved) == (3, 3, 2)
    assert r1.precision_at_k == round(2 / 3, 6)
    assert r1.recall_at_k == round(2 / 3, 6)
    assert r1.mrr == 1.0
    dcg = DISCOUNTS[1] + DISCOUNTS[3]          # hit at rank 1 and rank 3
    want = float(
        round(Decimal(float(dcg) / float(IDCG[3])).quantize(Decimal("1e-9")), 6)
    )
    assert abs(r1.ndcg_at_k - want) < 2e-9

    r2 = got[2]
    assert (r2.n_rel, r2.retrieved, r2.relevant_retrieved) == (0, 2, 0)
    assert r2.precision_at_k == 0.0
    assert r2.recall_at_k is None and r2.ndcg_at_k is None
    assert r2.mrr == 0.0

    r3 = got[3]
    assert (r3.n_rel, r3.retrieved, r3.relevant_retrieved) == (1, 0, 0)
    assert r3.precision_at_k is None
    assert r3.recall_at_k == 0.0 and r3.ndcg_at_k == 0.0
    assert r3.mrr == 0.0


def test_discount_tables_are_the_log2_constants():
    import math

    from sparksearch.evaluate import DISCOUNTS, EVAL_K, IDCG

    for r in range(1, EVAL_K + 1):
        assert float(DISCOUNTS[r]) == round(1.0 / math.log2(r + 1), 9)
    assert IDCG[0] == 0
    assert IDCG[EVAL_K] == sum(DISCOUNTS.values())
    assert DISCOUNTS[1] == 1 and DISCOUNTS[3] == Decimal("0.5")


def test_conjunctive_qrels(spark):
    from sparksearch.evaluate import conjunctive_qrels
    from sparksearch.stats import term_freq
    from sparksearch.tokenize import explode_postings, tokenize_sql

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "banana cherry"),
            (4, "apple apple apple"),
        ],
        "doc_id long, text string",
    )
    tf = term_freq(explode_postings(tokenize_sql(docs, "text")))
    qterms = spark.createDataFrame(
        [(1, "apple", 1), (1, "banana", 1), (2, "cherry", 1)],
        "query_id int, term string, qtf int",
    )
    got = {
        (r.query_id, r.doc_id)
        for r in conjunctive_qrels(qterms, tf).collect()
    }
    assert got == {(1, 1), (1, 2), (2, 1), (2, 3)}
