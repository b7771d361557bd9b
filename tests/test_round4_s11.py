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


def test_esql_percentile_exact_interpolation(spark):
    from sparksearch.esql import compile_esql

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (1, 41.0), (2, 5.5)], "g int, v double"
    )
    out = {
        r.g: (r.med, r.p90)
        for r in compile_esql(
            "FROM t | STATS med = MEDIAN(v), p90 = PERCENTILE(v, 90) BY g",
            tables={"t": df},
        ).collect()
    }
    # n=4: med at h=1.5 -> 25.0; p90 at h=2.7 -> 30 + 0.7*11 = 37.7
    assert out[1] == (25.0, 37.7)
    assert out[2] == (5.5, 5.5)  # singleton group: every percentile = value


def test_esql_top_values_and_inlinestats_guard(spark):
    import pytest as _pt

    from sparksearch.esql import EsqlError, compile_esql

    df = spark.createDataFrame(
        [("a",), ("c",), ("b",), ("c",)], "s string"
    )
    row = compile_esql(
        'FROM t | STATS t2 = TOP(s, 2, "desc"), vals = VALUES(s)'
        ' | EVAL tj = MV_CONCAT(t2, ","), vj = MV_CONCAT(vals, ",")'
        " | KEEP tj, vj",
        tables={"t": df},
    ).collect()[0]
    assert row.tj == "c,c"  # duplicates included, desc order
    assert row.vj == "a,b,c"  # distinct, pinned ascending
    # the windowed (BY) INLINESTATS form rejects collect-based aggs; the
    # no-BY form works (it routes through the broadcast _build_agg path)
    with _pt.raises(EsqlError):
        compile_esql("FROM t | INLINESTATS m = MEDIAN(s) BY s", tables={"t": df})


def test_esql_ip_and_string_functions(spark):
    from sparksearch.esql import compile_esql

    df = spark.createDataFrame(
        [("10.8.0.1", "abc"), ("10.15.255.254", "a"), ("10.16.0.0", "hello")],
        "ip string, s string",
    )
    rows = compile_esql(
        'FROM t | EVAL hit = TO_LONG(CIDR_MATCH(ip, "10.8.0.0/13")),'
        ' net = IP_PREFIX(ip, 13), r = RIGHT(s, 2), l = LEFT(s, 2),'
        ' rv = REVERSE(s), pos = LOCATE(s, "l")'
        " | KEEP ip, hit, net, r, l, rv, pos",
        tables={"t": df},
    ).collect()
    byip = {r.ip: r for r in rows}
    assert byip["10.8.0.1"].hit == 1 and byip["10.8.0.1"].net == "10.8.0.0"
    assert byip["10.15.255.254"].hit == 1
    assert byip["10.16.0.0"].hit == 0 and byip["10.16.0.0"].net == "10.16.0.0"
    # RIGHT on a string shorter than n returns the whole string (the
    # DuckDB right() contract the compiler pins explicitly)
    assert byip["10.15.255.254"].r == "a"
    assert byip["10.8.0.1"].r == "bc" and byip["10.8.0.1"].l == "ab"
    assert byip["10.16.0.0"].rv == "olleh" and byip["10.16.0.0"].pos == 3


def test_span_containing_vs_python_mirror(spark, docs):
    from sparksearch.catalog_s11 import SPANC_QUERIES
    from sparksearch.phrase import span_containing_topk

    got = {
        (r.query_id, r.doc_id): (r.rank, r.n_spans)
        for r in span_containing_topk(docs, SPANC_QUERIES, k=10).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    want: dict[tuple[int, int], int] = {}
    for qid, big, slop, little in SPANC_QUERIES:
        a, b = big.split()
        for doc_id, text in texts.items():
            toks = re.findall(r"[a-z0-9_]+", text.lower())
            n = 0
            for pa, t in enumerate(toks, start=1):
                if t != a:
                    continue
                pb = next(
                    (
                        q
                        for q in range(pa + 1, min(pa + slop + 1, len(toks)) + 1)
                        if toks[q - 1] == b
                    ),
                    None,
                )
                if pb is None:
                    continue
                if any(toks[q - 1] == little for q in range(pa, pb + 1)):
                    n += 1
            if n:
                want[(qid, doc_id)] = n
    # got is the top-10 cut of want, per query, ordered (n DESC, doc ASC)
    for qid, _, _, _ in SPANC_QUERIES:
        full = sorted(
            ((d, n) for (q, d), n in want.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        mine = sorted(
            ((d, rn) for (q, d), rn in got.items() if q == qid),
            key=lambda x: x[1][0],
        )
        assert [(d, n) for d, (rk, n) in mine] == full
    assert any(n > 0 for n in want.values()), "queries must be non-degenerate"


def test_combined_fields_vs_python_mirror(spark, docs):
    from sparksearch.catalog_s11 import q_combined_fields_topk
    from tests.conftest import SF_SMOKE

    rows = q_combined_fields_topk(spark, str(SF_SMOKE)).collect()
    import json as _json
    import math

    from sparksearch import BM25_B, BM25_K1

    texts = {r.doc_id: r.text for r in docs.collect()}
    toks = {d: re.findall(r"[a-z0-9_]+", t.lower()) for d, t in texts.items()}
    nz = {d: ts for d, ts in toks.items() if ts}
    n_docs = len(nz)
    df = Counter()
    for ts in nz.values():
        for t in set(ts):
            df[t] += 1
    avg_c = sum(len(ts) + min(len(ts), 5) for ts in nz.values()) / n_docs
    qs = _json.loads(open("tests/queries.json").read())["queries"]
    want = {}
    for q in qs:
        qt = Counter(re.findall(r"[a-z0-9_]+", q["text"].lower()))
        if not qt:
            continue
        scores = {}
        for d, ts in nz.items():
            s = 0.0
            for t, qtf in qt.items():
                tf_c = sum(2 if i < 5 else 1 for i, x in enumerate(ts) if x == t)
                if not tf_c:
                    continue
                idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                len_c = len(ts) + min(len(ts), 5)
                s += (
                    qtf
                    * idf
                    * (tf_c * (BM25_K1 + 1.0))
                    / (tf_c + BM25_K1 * (1.0 - BM25_B + BM25_B * len_c / avg_c))
                )
            if s > 0:
                scores[d] = s
        want[q["id"]] = scores
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("1e-9")).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP
        )

    for r in rows:
        assert float(r6(want[r.query_id][r.doc_id])) == r.score
    # rank identity per query on the quantized total order
    for qid in {r.query_id for r in rows}:
        exp = sorted(want[qid].items(), key=lambda kv: (-r6(kv[1]), kv[0]))[:10]
        mine = sorted(
            [(r.doc_id, r.rank) for r in rows if r.query_id == qid],
            key=lambda x: x[1],
        )
        assert [d for d, _ in mine] == [d for d, _ in exp]


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
