"""Phrase (positional) search: exact contiguous-phrase matching over the
corpus, ranked by occurrence count then BM25-style tie-break.

The reference engine family (full-text BM25 indexes) typically carries term
positions next to (term, docID, tf) so quoted queries — ``"sort merge
join"`` — match only contiguous occurrences. This module adds that
capability Spark-first:

* ``positional_postings`` — DF[doc_id, term, ps:array<int>] (1-based
  positions per (doc, term)). Logical form here; at segment scale positions
  ride the block layout as one more varint stream next to doc_gaps/tfs/dls
  (codec.encode_sublist's stream shape is position-ready).
* ``phrase_counts`` — per-doc occurrence counts of one phrase, computed with
  pure Catalyst array algebra: the per-doc (term → positions) map for ONLY
  the phrase's terms, then ``filter(ps[t0], p -> ∀i array_contains(ps[ti],
  p+i))``. The corpus-wide work is one semi-filtered shuffle of the phrase
  terms' postings — never the full posting table, never a UDF.
* ``phrase_topk`` — multi-phrase batch form with the engine-wide
  (score DESC, doc_id ASC) total order.

Scale: the groupBy moves only postings of the phrase's terms (dictionary-
pruned), i.e. Σ df(term) rows — the same data a DAAT intersection touches.
Position arrays per (doc, term) are bounded by tf. A phrase with a hot term
fans over doc_id-hashed reducers (uniform), not term-hashed — no skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import py_tokenize, tokens_col


def positional_postings(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """DF[doc_id, term, ps:array<int>] — sorted 1-based occurrence positions
    of every term in every doc. Positions are computed map-side from the
    bound token array (posexplode), aggregated per (doc, term)."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    return (
        toks.select("doc_id", F.posexplode("toks").alias("p0", "term"))
        .groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list(F.col("p0") + 1)).alias("ps"))
    )


def _phrase_start_positions(terms: list[str]) -> Column:
    """Positions p where terms[0]=p, terms[1]=p+1, … all occur — an
    expression over a bound map column ``m: map<string, array<int>>``."""
    def contains_at(t: str, i: int):
        # closure factory, NOT default-arg lambdas: PySpark derives the
        # higher-order-function arity from the lambda's signature.
        return lambda p: F.array_contains(
            F.coalesce(F.element_at(F.col("m"), t), F.array().cast("array<int>")),
            p + i,
        )

    starts = F.element_at(F.col("m"), terms[0])
    for i, t in enumerate(terms[1:], start=1):
        starts = F.filter(starts, contains_at(t, i))
    return starts


def phrase_counts(docs: DataFrame, phrase: str, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """DF[doc_id, n_occurrences] — docs containing the contiguous phrase,
    with its exact occurrence count. Duplicate phrase terms ("a b a") are
    handled naturally (the same position array is probed at two offsets)."""
    terms = py_tokenize(phrase)
    if not terms:
        spark = docs.sparkSession
        return spark.createDataFrame([], "doc_id long, n_occurrences long")
    pp = positional_postings(docs, text_col, id_col)
    needed = pp.filter(F.col("term").isin(sorted(set(terms))))
    per_doc = needed.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "ps"))).alias("m"),
        F.count(F.lit(1)).alias("n_terms_present"),
    ).filter(F.col("n_terms_present") == len(set(terms)))
    return (
        per_doc.select(
            "doc_id", F.size(_phrase_start_positions(terms)).cast("long").alias("n_occurrences")
        )
        .filter(F.col("n_occurrences") > 0)
    )


def phrase_topk(docs: DataFrame, phrases: list[tuple[int, str]], k: int = 10,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Batch phrase search → DF[query_id, rank, doc_id, n_occurrences]:
    top-k docs per phrase by (occurrences DESC, doc_id ASC) — the engine's
    pinned total order."""
    spark = docs.sparkSession
    out = None
    for qid, phrase in phrases:
        c = phrase_counts(docs, phrase, text_col, id_col).select(
            F.lit(int(qid)).cast("long").alias("query_id"), "doc_id", "n_occurrences"
        )
        out = c if out is None else out.unionByName(c)
    if out is None:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, n_occurrences long"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_occurrences"), F.asc("doc_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "n_occurrences")
    )
