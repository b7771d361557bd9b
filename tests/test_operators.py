"""Local replica of the driver's DuckDB oracle gate (SURVEY.md §5.1.2):
every ``queries()`` entry with an ``oracle_sql()`` twin is compared at sf0.01
on row-count + column names + order-insensitive values — fail-fast before the
driver runs the same diff."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

from conftest import SF_CORRECT

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_CORRECT) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def _catalog():
    from sparksearch import queries_catalog

    return queries_catalog.CATALOG


@pytest.mark.parametrize("name", sorted(_catalog().keys()))
def test_operator_matches_duckdb(spark, ddb, name):
    spec = _catalog()[name]
    sdf = spec.fn(spark, str(SF_CORRECT))
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.sql is None:
        assert len(s_rows) >= 0  # rows-only check — mirror of the driver's weak gate
        return
    res = ddb.execute(spec.sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sc, sr = _canon(s_cols, s_rows)
    dc, dr = _canon(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mism, f"{name}: first mismatch {sr[mism[0]]} vs {dr[mism[0]]}"


def test_build_artifact_atomic(tmp_path):
    """Concurrency-safe artifact builds: marker only visible with a complete
    build; a losing racer discards its tmp without disturbing the winner."""
    import os

    from sparksearch.queries_catalog import build_artifact_atomic

    final = str(tmp_path / "artifact")

    def build(d):
        os.makedirs(d)
        with open(os.path.join(d, "data"), "w") as f:
            f.write("payload")
        with open(os.path.join(d, "MARKER"), "w") as f:
            f.write("done")

    build_artifact_atomic(final, "MARKER", build)
    assert open(os.path.join(final, "data")).read() == "payload"
    # second call: marker present → no rebuild (build fn would raise on
    # the existing dir if invoked)
    build_artifact_atomic(final, "MARKER", build)
    # simulate losing a race: a concurrent process completes the final dir
    # while our build is in flight — our rename must lose quietly
    final2 = str(tmp_path / "artifact2")

    def racer(d):
        build(d)
        build(final2)  # the "other process" finishes first

    build_artifact_atomic(final2, "MARKER", racer)
    assert open(os.path.join(final2, "data")).read() == "payload"
    assert not [p for p in os.listdir(tmp_path) if ".tmp." in p]


def test_term_suggestions_rank_misspellings(spark, docs_sf001):
    from sparksearch.querying import parse_queries, term_suggestions
    from sparksearch.stats import corpus_stats

    _, _, ts, _ = corpus_stats(docs_sf001)
    qterms = parse_queries(spark, [(1, "joinn zzz"), (2, "hasj")])
    got = {}
    for r in term_suggestions(qterms, ts, max_dist=2).collect():
        got.setdefault((r.query_id, r.term), []).append((r.suggestion, r.dist))
    # 1-edit misspellings resolve to the intended terms, ranked first
    assert got[(1, "joinn")][0] == ("join", 1)
    assert got[(2, "hasj")][0] == ("hash", 1)
    # known terms get no suggestions (they are not unknown)
    assert not any(t == "join" for (_, t) in got)


def test_topk_snippets_contain_a_query_term(spark, docs_sf001):
    from sparksearch.querying import (
        bm25_topk_from_docs, parse_queries, topk_snippets,
    )

    queries = [(1, "hash join"), (2, "dup")]
    topk = bm25_topk_from_docs(spark, docs_sf001, queries, k=5).select(
        "query_id", "rank", "doc_id"
    )
    qterms = parse_queries(spark, queries)
    rows = topk_snippets(docs_sf001, topk, qterms).collect()
    assert len(rows) == topk.count()
    terms = {1: {"hash", "join"}, 2: {"dup"}}
    for r in rows:
        toks = set(r.snippet.split())
        assert toks & terms[r.query_id], r
        assert r.hit_pos >= 1
        assert len(r.snippet.split()) <= 7


def test_rrf_fusion_semantics(spark):
    from sparksearch.querying import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 11), (1, 3, 12)], "query_id long, rank long, doc_id long"
    )
    b = spark.createDataFrame(
        [(1, 1, 11), (1, 2, 13)], "query_id long, rank long, doc_id long"
    )
    rows = {r.doc_id: (r.rank, r.rrf_score) for r in rrf_fuse([a, b], k=10).collect()}
    # doc 11: 1/62 + 1/61 wins over doc 10: 1/61 alone
    assert rows[11][0] == 1
    assert rows[11][1] == round(1 / 62 + 1 / 61, 6)
    assert rows[10][0] == 2 and rows[10][1] == round(1 / 61, 6)
    # tie between 12 (1/63) vs none; 13 (1/62) > 12 (1/63)
    assert rows[13][0] == 3 and rows[12][0] == 4


def test_threshold_buckets_agree_with_exact_ntile(spark, docs_sf0001):
    """The documented 100 TB bucketing variant (one GK-sketch pass +
    broadcast thresholds, no global window) agrees with exact NTILE on
    ≥ 99% of rows at tight sketch accuracy — disagreements can only sit
    within the sketch's rank-error band of a boundary."""
    from pyspark.sql import functions as F

    from sparksearch.stats import (
        bucket_by_thresholds,
        corpus_stats,
        quantile_thresholds,
    )
    from sparksearch.textpipe import xent_buckets

    tf_df, _, ts, _ = corpus_stats(docs_sf0001.select("doc_id", "text"))
    exact = xent_buckets(tf_df, ts)
    th = quantile_thresholds(exact, "xent", 3)
    assert len(th) == 2 and th[0] <= th[1]
    both = bucket_by_thresholds(exact, "xent", th)
    n = both.count()
    agree = both.filter(F.col("bucket") == F.col("bucket_approx")).count()
    assert agree / n >= 0.99, (agree, n)
