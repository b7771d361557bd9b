"""Ranking evaluation — the ES Ranking Evaluation API (`_rank_eval`:
precision@k / recall@k / MRR / [n]DCG) as a distributed operator.

Given a ranked result set and a relevance-judgment (qrels) table, compute
per-query offline retrieval-quality metrics. The engine twin of
Elasticsearch's RankEvalRequestBuilder / Lucene's judgments-based quality
benchmarks (re-derived behavior, original DataFrame plan).

Float discipline — metrics are EXACT by construction:
* precision / recall / MRR are ratios of small ints (one correctly-rounded
  double division each, then round6).
* DCG's rank discounts 1/log2(rank+1) are **data-independent constants**,
  so they are generated ONCE in Python at 9-dp and shipped to BOTH engines
  as literal decimal tables (the LSH-plane-constants pattern) — no
  cross-engine log2 ever executes. DCG/IDCG are exact decimal sums of
  those constants; nDCG is one double division.

Scale: qrels and results are both (query_id, doc_id)-keyed — the metric
computation is two key-partitioned joins plus a per-query aggregate, all
map-side combinable; the per-rank discount join broadcasts a k-row table.
At 100 TB the expensive part is producing the ranked runs, not judging
them.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVAL_K = 10

#: rank -> 1/log2(rank+1), quantized at generation time (shared verbatim by
#: the Spark path and the DuckDB oracle — see module docstring).
DISCOUNTS: dict[int, Decimal] = {
    r: Decimal(str(round(1.0 / math.log2(r + 1), 9)))
    for r in range(1, EVAL_K + 1)
}

#: m -> ideal DCG of m relevant docs (cumulative discount sums), m=0..k.
IDCG: dict[int, Decimal] = {0: Decimal("0")}
for _r in range(1, EVAL_K + 1):
    IDCG[_r] = IDCG[_r - 1] + DISCOUNTS[_r]


def conjunctive_qrels(qterms: DataFrame, tf_df: DataFrame) -> DataFrame:
    """Deterministic binary relevance judgments → DF[query_id, doc_id]: a
    doc is relevant iff it contains EVERY distinct query term (boolean-AND
    containment — the classic pooled-judgment proxy when no human labels
    exist; any external qrels table with the same two columns drops in).

    Plan: one term-keyed join postings×query-terms (query side is tiny →
    broadcast), one (query_id, doc_id) count-equality aggregate."""
    nt = qterms.groupBy("query_id").agg(
        F.count_distinct("term").alias("nt")
    )
    hits = (
        tf_df.select("term", "doc_id")
        .join(F.broadcast(qterms.select("query_id", "term").distinct()), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("hit"))
    )
    return (
        hits.join(F.broadcast(nt), "query_id")
        .filter(F.col("hit") == F.col("nt"))
        .select("query_id", "doc_id")
    )


def ranking_eval(
    queries: DataFrame, topk: DataFrame, qrels: DataFrame, k: int = EVAL_K
) -> DataFrame:
    """ES _rank_eval → DF[query_id, n_rel, retrieved, relevant_retrieved,
    precision_at_k, recall_at_k, mrr, ndcg_at_k] — one row per query in
    ``queries`` (DF[query_id]), zeros/NULLs where ES reports them:
    precision is NULL with nothing retrieved, recall/nDCG are NULL with an
    empty judgment set, MRR is 0.0 with no relevant doc in the top k.

    ``topk`` is DF[query_id, rank, doc_id] (rank 1-based, ≤ k);
    ``qrels`` is DF[query_id, doc_id] binary judgments."""
    assert k <= EVAL_K, "extend DISCOUNTS/IDCG for larger k"
    # every map value cast to ONE decimal type (create_map unifies value
    # types; bare Decimal lits infer per-value precisions)
    disc = F.create_map(
        *[
            x
            for r in range(1, k + 1)
            for x in (F.lit(r), F.lit(DISCOUNTS[r]).cast("decimal(28,9)"))
        ]
    )
    idcg = F.create_map(
        *[
            x
            for m in range(0, k + 1)
            for x in (F.lit(m), F.lit(IDCG[m]).cast("decimal(28,9)"))
        ]
    )
    from .stats import round6

    n_rel = qrels.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    judged = topk.join(
        qrels.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left"
    )
    per_q = judged.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("retrieved"),
        F.sum(F.coalesce("rel", F.lit(0))).cast("long").alias("relevant_retrieved"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when(F.col("rel") == 1, disc[F.col("rank")]).otherwise(
                F.lit(Decimal("0")).cast("decimal(28,9)")
            )
        ).alias("dcg"),
    )
    base = (
        queries.select(F.col("query_id").cast("long").alias("query_id"))
        .distinct()
        .join(per_q, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce("retrieved", F.lit(0)).cast("long").alias("retrieved"),
            F.coalesce("relevant_retrieved", F.lit(0))
            .cast("long")
            .alias("relevant_retrieved"),
            "first_rel",
            F.coalesce(
                "dcg", F.lit(Decimal("0")).cast("decimal(28,9)")
            ).alias("dcg"),
        )
    )
    ideal = idcg[F.least(F.col("n_rel"), F.lit(k)).cast("int")]
    return base.select(
        "query_id",
        "n_rel",
        "retrieved",
        "relevant_retrieved",
        F.when(
            F.col("retrieved") > 0,
            round6(
                F.col("relevant_retrieved").cast("double")
                / F.col("retrieved").cast("double")
            ),
        ).alias("precision_at_k"),
        F.when(
            F.col("n_rel") > 0,
            round6(
                F.col("relevant_retrieved").cast("double")
                / F.col("n_rel").cast("double")
            ),
        ).alias("recall_at_k"),
        F.coalesce(
            round6(F.lit(1.0) / F.col("first_rel").cast("double")),
            F.lit(0.0),
        ).alias("mrr"),
        F.when(
            F.col("n_rel") > 0,
            round6(F.col("dcg").cast("double") / ideal.cast("double")),
        ).alias("ndcg_at_k"),
    )


def binary_auc(
    scored: DataFrame, score_col: str = "score", label_col: str = "y"
) -> DataFrame:
    """Exact ROC-AUC of a scalar score against a binary label →
    DF[n_pos, n_neg, auc_numer2, auc] (one row).

    The classifier-evaluation metric every pretraining quality filter is
    judged by (fastText wiki-vs-crawl, CCNet perplexity gates). Computed
    as the Mann-Whitney rank-sum in EXACT integer arithmetic with
    average-rank tie handling: group rows by distinct score, prefix-sum
    the negatives strictly below each score, then

        2·AUC·n_pos·n_neg = Σ_s n_pos(s) · (2·neg_below(s) + n_neg(s))

    — the ×2 keeps the tied-pair half-credits integral, so ``auc_numer2``
    is a hash-checkable BIGINT and the only float op is ONE double
    division (pinned op sequence: numer / (pos · neg · 2.0)), round6.

    NULL scores (undefined on zero-token docs) are excluded. Scale: the
    groupBy is map-combinable; the prefix sum runs over the DISTINCT
    score values only (scores are round6-quantized upstream, so the
    grouped frame is grid-bounded — the global window never sees row-
    scale data). Degenerate single-class inputs yield NULL auc on both
    engines."""
    from .stats import round6

    base = scored.filter(F.col(score_col).isNotNull())
    pos = F.sum(F.col(label_col).cast("long"))
    g = base.groupBy(score_col).agg(
        pos.alias("n_pos"),
        (F.count(F.lit(1)) - pos).cast("long").alias("n_neg"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.asc(score_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn(
        "neg_below", F.coalesce(F.sum("n_neg").over(w), F.lit(0)).cast("long")
    )
    a = c.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("n_pos") * (F.lit(2) * F.col("neg_below") + F.col("n_neg"))
        )
        .cast("long")
        .alias("auc_numer2"),
    )
    auc = F.col("auc_numer2").cast("double") / (
        F.col("n_pos").cast("double") * F.col("n_neg").cast("double") * F.lit(2.0)
    )
    return a.select(
        "n_pos",
        "n_neg",
        "auc_numer2",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), round6(auc)).alias(
            "auc"
        ),
    )
