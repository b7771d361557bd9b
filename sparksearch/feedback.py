"""Pseudo-relevance feedback (blind Rocchio-lite, the classic two-stage
retrieval): BM25 first pass → top feedback docs per query → highest-tf·idf
expansion terms from those docs → re-retrieve with the expanded weighted
query. Lucene/Solr ship the same shape as "relevance feedback" / ES as a
rescore-with-significant-text pattern.

Determinism: the expansion-term selection weight is a sum of per-row
tf·idf values rounded to 6 decimals and accumulated EXACTLY as decimals
(order-independent under any partitioning — the training_data_stats
lesson), then ranked (w DESC, term ASC). Expansion terms carry a fixed
fractional query weight; the rescore reuses the flagship score_logical
path, which accepts a double qtf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRF_FB_DOCS = 3
PRF_FB_TERMS = 5
PRF_FB_WEIGHT = 0.5


def prf_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    n_fb_docs: int = PRF_FB_DOCS,
    n_fb_terms: int = PRF_FB_TERMS,
    fb_weight: float = PRF_FB_WEIGHT,
    k: int = 10,
) -> DataFrame:
    """Two-stage PRF retrieval → DF[query_id, rank, doc_id, score].

    Plan: stage 1 is the flagship BM25 plan; the feedback set (≤ queries ×
    n_fb_docs rows) broadcasts back against the postings for candidate
    extraction, so expansion work is O(feedback docs' postings), never a
    corpus shuffle; stage 2 re-enters score_logical with the (still tiny)
    expanded query table. Original terms keep their parsed qtf; expansion
    terms (original query terms excluded via left-anti) enter at
    ``fb_weight``.
    """
    from .querying import score_logical

    base = score_logical(qterms, tf_df, dl_df, term_stats, k=n_fb_docs)
    fb = base.select("query_id", "doc_id")
    cand = (
        tf_df.join(F.broadcast(fb), "doc_id")
        .join(term_stats.select("term", "idf"), "term")
        .groupBy("query_id", "term")
        .agg(
            F.sum(
                F.round(F.col("tf") * F.col("idf"), 6).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("w")
        )
        .join(qterms.select("query_id", "term"), ["query_id", "term"], "left_anti")
    )
    wnd = Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))
    exp = (
        cand.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= n_fb_terms)
        .select("query_id", "term", F.lit(fb_weight).alias("qtf"))
    )
    q2 = qterms.select(
        "query_id", "term", F.col("qtf").cast("double").alias("qtf")
    ).unionByName(exp)
    return score_logical(q2, tf_df, dl_df, term_stats, k=k)
