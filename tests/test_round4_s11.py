"""Round-4 session-11 operators vs independent mirrors (sf0.001).

BPE merge training is checked against a pure-Python Sennrich-style
reference (third code path beside Spark and the DuckDB twin); soft dedup
weights against per-row Decimal recomputation of the two divisions.
"""

from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(str(SF_SMOKE / "documents.parquet"))


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, str, int]]:
    """Reference BPE trainer: word counts, then greedy merges. Words are
    symbol TUPLES (no string-rendering tricks — an independent formulation
    of the same algorithm)."""
    words = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            words[tuple(w)] += 1
    merges = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for syms, freq in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, cnt))
        new_words = Counter()
        for syms, freq in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += freq
        words = new_words
    return merges


def test_bpe_matches_python_reference(spark, docs):
    from sparksearch.catalog_s11 import BPE_MERGES, bpe_train_merges

    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train_merges(spark, docs).collect()
    ]
    texts = [r.text for r in docs.select("text").collect()]
    want = _py_bpe(texts, BPE_MERGES)
    assert got == want


def test_bpe_replace_is_greedy_merge(spark):
    # the '|sym||sym|' rendering + plain replace must equal greedy
    # non-overlapping merging even in the overlapping-pair case (a == b).
    df = spark.createDataFrame([("aaa",), ("aaaa",), ("baab",)], "term string")
    from pyspark.sql import functions as F

    rep = df.select(
        F.concat(
            F.lit("|"),
            F.array_join(
                F.filter(F.split("term", "(?!^)"), lambda x: x != F.lit("")), "||"
            ),
            F.lit("|"),
        ).alias("w")
    ).select(F.replace("w", F.lit("|a||a|"), F.lit("|aa|")).alias("w"))
    assert [r.w for r in rep.collect()] == ["|aa||a|", "|aa||aa|", "|b||aa||b|"]


def test_soft_weights_rows_and_divisions(spark):
    from sparksearch.catalog_s11 import q_dedup_soft_weights

    rows = q_dedup_soft_weights(spark, str(SF_SMOKE)).collect()
    n_docs = spark.read.parquet(str(SF_SMOKE / "documents.parquet")).count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs

    def r6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-9")).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )

    sizes = Counter(r.cluster_id for r in rows)
    saw_multi = False
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.weight == r6(1.0 / r.cluster_size)
        assert r.eff_tokens == r6(r.n_tokens / r.cluster_size)
        if r.cluster_size > 1:
            saw_multi = True
            assert r.cluster_id <= r.doc_id or any(
                x.doc_id == r.cluster_id for x in rows
            )
        else:
            assert r.weight == 1.0
    assert saw_multi, "fixture should contain at least one near-dup cluster"
