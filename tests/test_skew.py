"""Zipf-skew hardening (SURVEY.md §7.1 M7): the fixture vocabulary is
near-uniform, so the salted build's skew defense is exercised here on the
synthetic Zipf(1.3) corpus — a hot term owns a large fraction of all
postings, exactly the 10^12-scale failure mode.

Checks: (a) rank identity vs the NumPy oracle still holds on skewed data,
(b) no single (term, range) encode group ever contains a hot term's full
posting list — the salt actually fans hot terms out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearch.ids import assign_doc_ids_dense
from tests.gen_corpus import gen_corpus
from tests.oracle_bm25 import Bm25Oracle


@pytest.fixture(scope="module")
def skewed_docs(spark):
    pdf = gen_corpus(400, seed=42)
    docs = assign_doc_ids_dense(spark.createDataFrame(pdf.drop(columns=["sha256"])))
    return docs.select("doc_id", F.col("content").alias("text")).persist()


def test_hot_terms_fan_out_over_ranges(spark, skewed_docs, tmp_path_factory):
    from sparksearch.build import build_index, load_index

    path = str(tmp_path_factory.mktemp("skewidx"))
    build_index(spark, skewed_docs, path, n_buckets=8, n_ranges=8)
    seg, dic, stats = load_index(spark, path)

    hot = (
        dic.orderBy(F.desc("cf")).limit(3).select("term").toPandas()["term"].tolist()
    )
    spread = {
        r["term"]: r["nr"]
        for r in seg.filter(F.col("term").isin(hot))
        .groupBy("term")
        .agg(F.countDistinct("range_id").alias("nr"))
        .collect()
    }
    # A hot term (df ≈ every doc) must be split across (nearly) all ranges —
    # one reducer never owns its full list.
    for term in hot:
        assert spread[term] >= 6, (term, spread)


def test_rank_identity_on_skewed_corpus(spark, skewed_docs, tmp_path_factory):
    from sparksearch.build import build_index
    from sparksearch.daat import daat_topk
    from sparksearch.querying import bm25_topk_from_docs

    pdf = skewed_docs.toPandas()
    oracle = Bm25Oracle(list(zip(pdf.doc_id, pdf.text)))
    queries = [
        (1, "get set run"),           # hottest terms (huge df)
        (2, "hash_table scan_index"), # mid-frequency
        (3, "fold_ctx9 var_err7"),    # deep tail (tiny df, maybe absent)
        (4, "for if else while return"),
    ]
    path = str(tmp_path_factory.mktemp("skewidx2"))
    build_index(spark, skewed_docs, path, n_buckets=8, n_ranges=8)

    logical = bm25_topk_from_docs(spark, skewed_docs, queries, k=10).collect()
    physical = daat_topk(spark, path, queries, k=10, wand=True).collect()

    for rows in (logical, physical):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
        for qid, text in queries:
            expected = oracle.topk(text, k=10)
            mine = sorted(got.get(qid, []))
            assert len(mine) == len(expected), (qid, len(mine), len(expected))
            for (rank, doc_id, score), (edoc, escore) in zip(mine, expected):
                assert doc_id == edoc, (qid, rank)
                assert abs(score - escore) < 1e-9, (qid, rank)
