"""Phrase (positional) search vs a from-scratch Python reference."""

from __future__ import annotations

import re

from sparksearch.phrase import phrase_counts, phrase_topk


def _tok(text: str) -> list[str]:
    return re.findall(r"[a-z0-9_]+", text.lower())


def _py_phrase_count(text: str, phrase: str) -> int:
    t, p = _tok(text), _tok(phrase)
    if not p or len(t) < len(p):
        return 0
    return sum(1 for i in range(len(t) - len(p) + 1) if t[i : i + len(p)] == p)


def test_phrase_counts_edge_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c x"),   # overlapping-window phrase twice
            (2, "a a b b c"),       # "a b" once, "b c" once
            (3, "c b a"),           # reversed — no match
            (4, "a"),               # shorter than the phrase
        ],
        "doc_id long, text string",
    )
    assert {r.doc_id: r.n_occurrences for r in phrase_counts(docs, "a b c").collect()} == {1: 2}
    assert {r.doc_id: r.n_occurrences for r in phrase_counts(docs, "b c").collect()} == {1: 2, 2: 1}
    # single-term phrase == tf; duplicate-term phrase probes one array twice
    assert {r.doc_id: r.n_occurrences for r in phrase_counts(docs, "a").collect()} == {1: 2, 2: 2, 3: 1, 4: 1}
    assert phrase_counts(docs, "a b a").count() == 0
    assert phrase_counts(docs, "").count() == 0
    assert phrase_counts(docs, "zzz qqq").count() == 0


def test_phrase_counts_match_reference_on_fixture(spark, docs_sf0001, docs_pandas_sf001):
    pdf = docs_sf0001.toPandas()
    for phrase in ("hash join", "sort merge join", "dup"):
        exp = {
            int(r.doc_id): n
            for r in pdf.itertuples()
            if (n := _py_phrase_count(r.text, phrase)) > 0
        }
        got = {r.doc_id: r.n_occurrences for r in phrase_counts(docs_sf0001, phrase).collect()}
        assert got == exp, phrase


def test_phrase_topk_order_and_rank(spark, docs_sf0001):
    rows = phrase_topk(docs_sf0001, [(1, "hash join"), (2, "join")], k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        for a, b in zip(rs, rs[1:]):
            assert (-a.n_occurrences, a.doc_id) <= (-b.n_occurrences, b.doc_id)


def test_indexed_phrase_equals_logical(spark, docs_sf0001, tmp_path):
    from sparksearch.phrase import build_positions, phrase_topk_indexed

    path = str(tmp_path / "posidx")
    build_positions(spark, docs_sf0001, path, n_buckets=8)
    phrases = [(1, "hash join"), (2, "sort merge join"), (3, "dup"), (4, "join")]
    logical = {
        (r.query_id, r.rank): (r.doc_id, r.n_occurrences)
        for r in phrase_topk(docs_sf0001, phrases, k=10).collect()
    }
    indexed = {
        (r.query_id, r.rank): (r.doc_id, r.n_occurrences)
        for r in phrase_topk_indexed(spark, path, phrases, k=10).collect()
    }
    assert indexed == logical and logical


def test_combined_build_positions_in_one_tokenize_pass(spark, docs_sf0001, tmp_path, monkeypatch):
    """build_index(with_positions=True) must produce the positional sidecar
    from the SAME single tokenize pass as the segments (round-2 verdict #3):
    build.tokenize_tf is invoked exactly once, and the sidecar rows equal a
    standalone build_positions byte for byte."""
    import sparksearch.build as B
    from sparksearch.phrase import build_positions, phrase_topk_indexed

    calls = []
    real = B.tokenize_tf

    def counted(*a, **kw):
        calls.append((a, kw))
        return real(*a, **kw)

    monkeypatch.setattr(B, "tokenize_tf", counted)
    combined = str(tmp_path / "combined")
    B.build_index(spark, docs_sf0001, combined, n_buckets=8, n_ranges=4,
                  with_positions=True)
    assert len(calls) == 1 and calls[0][1].get("with_positions") is True
    monkeypatch.undo()

    standalone = str(tmp_path / "standalone")
    build_positions(spark, docs_sf0001, standalone, n_buckets=8)
    cols = ["term", "doc_id", "npos", "pos_blob", "bucket"]
    a = sorted(map(tuple, spark.read.parquet(f"{combined}/positions").select(cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{standalone}/positions").select(cols).collect()))
    assert a == b and a

    # and the combined index answers phrase queries identically
    phrases = [(1, "hash join"), (2, "join")]
    ca = sorted(map(tuple, phrase_topk_indexed(spark, combined, phrases, k=5).collect()))
    cb = sorted(map(tuple, phrase_topk_indexed(spark, standalone, phrases, k=5).collect()))
    assert ca == cb and ca


def test_indexed_phrase_edge_cases(spark, tmp_path):
    from sparksearch.phrase import build_positions, phrase_topk_indexed

    docs = spark.createDataFrame(
        [(1, "a b c a b c x"), (2, "a a b b c"), (3, "c b a")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "posidx2")
    build_positions(spark, docs, path, n_buckets=4)
    rows = phrase_topk_indexed(
        spark, path, [(1, "a b c"), (2, "b c"), (3, "a b a"), (4, "zzz")], k=10
    ).collect()
    got = {(r.query_id, r.doc_id): r.n_occurrences for r in rows}
    assert got == {(1, 1): 2, (2, 1): 2, (2, 2): 1}
