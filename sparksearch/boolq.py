"""Boolean query retrieval — Lucene BooleanQuery-style AND / OR / NOT with
BM25 ranking of the positive literals.

Semantics (the classic search-engine contract):

* The boolean tree is a FILTER: a document matches iff the predicate holds
  over its term-presence set.
* The SCORE is the BM25 sum of the query's positive literals present in the
  doc (MUST/SHOULD contribute; MUST_NOT never does — Lucene scores only
  scoring clauses).
* Pure-negative queries (satisfiable by a document containing none of the
  literals, e.g. ``NOT x`` or ``a OR NOT b``) are rejected at parse, exactly
  like Lucene's BooleanQuery without positive clauses: they cannot be
  retrieved by index lookup — they'd require a corpus scan.

Spark-first plan (one posting-shuffle, dictionary-pruned, like DAAT/Q3):

1. fetch postings for the literal set only (Σ df(literals) rows),
2. presence sets: groupBy(doc_id) → collect_set(term) — the rejection rule
   above guarantees every matching doc holds ≥1 positive literal, so the
   presence aggregation over the literals' postings covers ALL matches,
3. BM25 partial scores for the positive literals (same broadcast-stats
   plan as score_logical — the big side never shuffles for a join),
4. predicate evaluation is a map-side array_contains expression over the
   presence set (a per-query CASE — no UDF, no extra shuffle),
5. window top-k under the engine total order (score DESC, doc_id ASC).
"""

from __future__ import annotations

import functools
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tokenize import py_tokenize

_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")


def parse_bool(s: str):
    """Recursive-descent parse of ``a AND (b OR NOT c)`` into an AST of
    ('term', t) / ('not', x) / ('and', [..]) / ('or', [..]). Operator
    precedence NOT > AND > OR; bare terms are normalized through the pinned
    tokenizer. Rejects pure-negative queries (see module docstring)."""
    toks = _TOKEN_RE.findall(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def atom():
        t = peek()
        if t == "(":
            take()
            e = or_expr()
            if peek() != ")":
                raise ValueError(f"unbalanced parens in boolean query: {s!r}")
            take()
            return e
        if t is None or t.upper() in ("AND", "OR", "NOT", ")"):
            raise ValueError(f"expected term in boolean query: {s!r}")
        take()
        norm = py_tokenize(t)
        if len(norm) != 1:
            raise ValueError(f"literal {t!r} does not normalize to one term")
        return ("term", norm[0])

    def unary():
        if peek() is not None and peek().upper() == "NOT":
            take()
            return ("not", unary())
        return atom()

    def and_expr():
        parts = [unary()]
        while peek() is not None and peek().upper() == "AND":
            take()
            parts.append(unary())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def or_expr():
        parts = [and_expr()]
        while peek() is not None and peek().upper() == "OR":
            take()
            parts.append(and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    ast = or_expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in boolean query: {s!r}")
    if _eval_empty(ast):
        raise ValueError(
            f"pure-negative boolean query (matches docs containing no "
            f"literal — not index-retrievable): {s!r}"
        )
    return ast


def _eval_empty(ast) -> bool:
    """Evaluate the tree for a document containing NONE of the literals."""
    kind = ast[0]
    if kind == "term":
        return False
    if kind == "not":
        return not _eval_empty(ast[1])
    if kind == "and":
        return all(_eval_empty(x) for x in ast[1])
    return any(_eval_empty(x) for x in ast[1])


def literals(ast) -> set[str]:
    if ast[0] == "term":
        return {ast[1]}
    if ast[0] == "not":
        return literals(ast[1])
    return set().union(*(literals(x) for x in ast[1]))


def positive_literals(ast, negated: bool = False) -> set[str]:
    """Terms in scoring (non-negated) positions."""
    if ast[0] == "term":
        return set() if negated else {ast[1]}
    if ast[0] == "not":
        return positive_literals(ast[1], not negated)
    return set().union(*(positive_literals(x, negated) for x in ast[1]))


def pred_col(ast, set_col: Column) -> Column:
    if ast[0] == "term":
        return F.array_contains(set_col, ast[1])
    if ast[0] == "not":
        return ~pred_col(ast[1], set_col)
    op = Column.__and__ if ast[0] == "and" else Column.__or__
    return functools.reduce(op, (pred_col(x, set_col) for x in ast[1]))


def pred_sql(ast, set_expr: str) -> str:
    if ast[0] == "term":
        return f"list_contains({set_expr}, '{ast[1]}')"
    if ast[0] == "not":
        return f"(NOT {pred_sql(ast[1], set_expr)})"
    op = " AND " if ast[0] == "and" else " OR "
    return "(" + op.join(pred_sql(x, set_expr) for x in ast[1]) + ")"


def boolean_topk(
    spark: SparkSession,
    bqueries: list[tuple[int, str]],
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Batch boolean retrieval → DF[query_id, rank, doc_id, score]."""
    from .querying import _attach_dl, topk_per_query
    from .stats import bm25_term_score_col

    trees = {int(qid): parse_bool(q) for qid, q in bqueries}
    all_lits = sorted(set().union(*(literals(t) for t in trees.values())))
    qpos = spark.createDataFrame(
        sorted(
            (qid, t, 1)
            for qid, tree in trees.items()
            for t in positive_literals(tree)
        ),
        "query_id int, term string, qtf int",
    )
    # presence sets over ONLY the literals' postings (pruned fetch)
    pres = (
        tf_df.filter(F.col("term").isin(all_lits))
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("ts_set"))
    )
    q = qpos.join(
        term_stats.select("term", "idf", "n_docs", "avgdl"), "term", "inner"
    )
    contrib = _attach_dl(tf_df.join(F.broadcast(q), "term", "inner"), tf_df, dl_df)
    scored = (
        contrib.select(
            "query_id", "doc_id", bm25_term_score_col(qtf="qtf").alias("s")
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    # per-query predicate as ONE chained CASE expression — map-side, no UDF
    pred = F.lit(False)
    for qid, tree in sorted(trees.items()):
        pred = F.when(F.col("query_id") == qid, pred_col(tree, F.col("ts_set"))).otherwise(pred)
    # round-then-tiebreak (the more_like_this pattern): rank on the
    # 6-decimal score so near-tied sums whose raw doubles differ only in
    # summation-order ULPs order identically on every engine.
    matched = scored.join(pres, "doc_id").filter(pred).select(
        "query_id", "doc_id", F.round("score", 6).alias("score")
    )
    return topk_per_query(matched, k)
