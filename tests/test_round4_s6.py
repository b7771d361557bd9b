"""Round-4 session-6 operators vs independent mirrors (sf0.001).

ES pipeline/bucket aggs (normalize, bucket_correlation, ip_range,
global+missing, stats_bucket, bucket_script, percentiles_bucket) against
pandas/NumPy recomputations, and the search-side trio (search_after cursor
pagination, terms_set per-doc msm, linear-decay function_score) against the
NumPy BM25 oracle — a third code path beside Spark and the DuckDB twins.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _h60(s: str) -> int:
    """Python mirror of textpipe.h60 / the DuckDB md5-prefix twin."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(str(SF_SMOKE / "events.parquet"))


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


@pytest.fixture(scope="module")
def tpch(spark):
    return {
        name: spark.read.parquet(str(SF_SMOKE / f"{name}.parquet"))
        for name in ("orders", "lineitem")
    }


def _daily_counts(events_pd, mask=None):
    day = (events_pd.ts.astype("datetime64[s]").astype("int64") // 86400).astype(int)
    if mask is not None:
        day = day[mask]
    lo, hi = day.min(), day.max()
    return day, lo, hi


def test_normalize_matches_pandas(spark, events, events_pd):
    from sparksearch.relational import events_normalize

    rows = {r.day: r for r in events_normalize(events).collect()}
    day = (events_pd.ts.astype("datetime64[s]").astype("int64") // 86400).astype(int)
    counts = day.value_counts()
    lo, hi = int(day.min()), int(day.max())
    grid = {d: int(counts.get(d, 0)) for d in range(lo, hi + 1)}
    assert len(rows) == hi - lo + 1
    tot = sum(grid.values())
    mn, mx = min(grid.values()), max(grid.values())
    for d, n in grid.items():
        key = pd.Timestamp(d * 86400, unit="s").strftime("%Y-%m-%d")
        r = rows[key]
        assert r.n_events == n
        assert math.isclose(r.pct_of_sum, n / tot, abs_tol=5e-7)
        if mx > mn:
            assert math.isclose(r.rescale01, (n - mn) / (mx - mn), abs_tol=5e-7)


def test_bucket_correlation_matches_numpy(spark, events, events_pd):
    from sparksearch.relational import events_bucket_correlation

    r = events_bucket_correlation(events).collect()[0]
    day = (events_pd.ts.astype("datetime64[s]").astype("int64") // 86400).astype(int)
    lo, hi = int(day.min()), int(day.max())
    idx = range(lo, hi + 1)
    x = np.array([int(((day == d) & (events_pd.event_type == "click")).sum()) for d in idx])
    y = np.array([int(((day == d) & (events_pd.event_type == "purchase")).sum()) for d in idx])
    assert r.n_days == len(x)
    assert r.sum_x == int(x.sum()) and r.sum_y == int(y.sum())
    assert math.isclose(r.r, float(np.corrcoef(x, y)[0, 1]), abs_tol=5e-7)


def test_ip_range_partitions_events(spark, events, events_pd):
    from sparksearch.relational import events_ip_range

    rows = {r.cidr: r for r in events_ip_range(events).collect()}
    ip = events_pd.user_id.map(lambda u: _h60(f"ip|{u}") % 2**32)
    bucket = ip // 2**30
    # buckets partition the events; per-bucket exact event + user counts
    assert sum(r.n_events for r in rows.values()) == len(events_pd)
    for b in sorted(bucket.unique()):
        lo = int(b) * 2**30
        cidr = (
            f"{(lo >> 24) & 255}.{(lo >> 16) & 255}.{(lo >> 8) & 255}.{lo & 255}/2"
        )
        r = rows[cidr]
        assert r.n_events == int((bucket == b).sum())
        assert r.n_users == events_pd.user_id[bucket == b].nunique()
        assert r.from_ip == cidr[:-2]
    # boundary rendering: to_ip is the inclusive top of the /2 block
    for r in rows.values():
        last = int(r.to_ip.split(".")[-1])
        assert last == 255


def test_global_missing_buckets(spark, events, events_pd):
    from sparksearch.relational import events_global_missing

    rows = {
        (r.bucket_kind, r.bucket_key): r
        for r in events_global_missing(events).collect()
    }
    k = events_pd.props.str.extract(r'"k": (\d+)')[0].astype(int)
    hit = events_pd.event_type == "purchase"
    g = rows[("global", "(all)")]
    assert g.n_events == len(events_pd) and g.sum_k == int(k.sum())
    missing = hit & (k % 7 == 0)
    m = rows[("missing", "(missing)")]
    assert m.n_events == int(missing.sum()) and m.sum_k == int(k[missing].sum())
    plans = {0: "pro", 1: "free", 2: "team"}
    for mod, name in plans.items():
        sel = hit & (k % 7 != 0) & (k % 3 == mod)
        r = rows[("term", name)]
        assert r.n_events == int(sel.sum()) and r.sum_k == int(k[sel].sum())
    # term + missing buckets partition the filtered context
    assert (
        m.n_events + sum(rows[("term", p)].n_events for p in plans.values())
        == int(hit.sum())
    )


def test_stats_bucket_matches_pandas(spark, tpch):
    from sparksearch.joins import orders_stats_bucket

    r = orders_stats_bucket(tpch["orders"]).collect()[0]
    pdf = tpch["orders"].toPandas()
    m = (
        pdf.assign(month=pdf.o_orderdate.dt.strftime("%Y-%m"),
                   v=pdf.o_totalprice.round(2))
        .groupby("month").v.sum()
    )
    assert r.n_buckets == len(m)
    assert math.isclose(r.min_rev_e2 / 100.0, m.min(), abs_tol=1e-6)
    assert math.isclose(r.max_rev_e2 / 100.0, m.max(), abs_tol=1e-6)
    assert math.isclose(r.sum_rev_e2 / 100.0, m.sum(), abs_tol=1e-4)
    assert math.isclose(r.avg_rev, m.sum() / len(m), abs_tol=5e-6)


def test_bucket_script_matches_pandas(spark, tpch):
    from sparksearch.joins import orders_bucket_script

    rows = {r.month: r for r in orders_bucket_script(tpch["orders"]).collect()}
    pdf = tpch["orders"].toPandas()
    pdf = pdf.assign(month=pdf.o_orderdate.dt.strftime("%Y-%m"),
                     v=pdf.o_totalprice.round(2))
    for month, grp in pdf.groupby("month"):
        r = rows[month]
        urgent = grp.v[grp.o_orderpriority.str.startswith("1-")].sum()
        total = grp.v.sum()
        assert r.n_orders == len(grp)
        assert math.isclose(r.urgent_rev_e2 / 100.0, urgent, abs_tol=1e-6)
        assert math.isclose(r.total_rev_e2 / 100.0, total, abs_tol=1e-6)
        assert math.isclose(r.urgent_share, urgent / total, abs_tol=5e-7)
        assert math.isclose(r.avg_order_value, total / len(grp), abs_tol=5e-6)


def test_percentiles_bucket_matches_numpy(spark, tpch):
    from sparksearch.joins import lineitem_percentiles_bucket

    r = lineitem_percentiles_bucket(tpch["lineitem"]).collect()[0]
    pdf = tpch["lineitem"].toPandas()
    m = (
        pdf.assign(month=pdf.l_shipdate.dt.strftime("%Y-%m"),
                   v=pdf.l_quantity.round(2))
        .groupby("month").v.sum().to_numpy()
    )
    assert r.n_buckets == len(m)
    p25, p50, p75 = np.percentile(m, [25, 50, 75], method="linear")
    assert math.isclose(r.p25_e4 / 10000.0, p25, abs_tol=1e-6)
    assert math.isclose(r.p50_e4 / 10000.0, p50, abs_tol=1e-6)
    assert math.isclose(r.p75_e4 / 10000.0, p75, abs_tol=1e-6)


# ------------------------------------------------------------- search trio


@pytest.fixture(scope="module")
def search_stats(spark, docs_sf0001):
    from sparksearch.build import tokenize_tf
    from sparksearch.stats import doc_freq, global_stats_df, with_idf

    tt = tokenize_tf(docs_sf0001.select("doc_id", "text")).persist()
    tf_df = tt.select("term", "doc_id", "tf", "dl")
    dl_df = tt.filter("lead").select("doc_id", "dl")
    stats = global_stats_df(dl_df)
    ts = with_idf(doc_freq(tf_df), stats)
    yield tf_df, dl_df, ts
    tt.unpersist()


def test_search_after_equals_window_page2(spark, search_stats, queries):
    """The cursor form and the window form return IDENTICAL pages — the
    engine order is total, so pagination cannot skip or duplicate."""
    from sparksearch.querying import parse_queries, score_logical
    from sparksearch.scoring_ext import search_after_topk

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    cursor = {
        (r.query_id, r.rank): (r.doc_id, round(float(r.score), 6))
        for r in search_after_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    }
    window = {
        (r.query_id, r.rank - 10): (r.doc_id, round(float(r.score), 6))
        for r in score_logical(qterms, tf_df, dl_df, ts, k=20).collect()
        if r.rank > 10
    }
    assert cursor == window


def test_terms_set_matches_numpy_oracle(spark, search_stats, queries, docs_sf0001):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import terms_set_topk
    from tests.oracle_bm25 import tokenize

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    got = [
        (r.query_id, r.rank, r.doc_id, r.required, round(float(r.score), 6))
        for r in terms_set_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    ]
    # NumPy-oracle mirror over the SMOKE corpus (oracle_sf001 is sf0.01) —
    # rebuild the tiny oracle on sf0.001 to match search_stats' corpus.
    from tests.oracle_bm25 import Bm25Oracle

    docs = [(r.doc_id, r.text) for r in docs_sf0001.select("doc_id", "text").collect()]
    oracle = Bm25Oracle(docs)
    expect = []
    for qid, text in queries:
        qterms_py = set(tokenize(text)) & set(oracle.df)
        scored = []
        for d in oracle.tf:
            hit = qterms_py & set(oracle.tf[d])
            if not hit:
                continue
            req = 1 + _h60(f"req|{d}") % 3
            if len(hit) < req:
                continue
            scored.append((d, req, round(oracle.score(text, d), 6)))
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rank, (d, req, s) in enumerate(scored[:10], 1):
            expect.append((qid, rank, d, req, s))
    assert sorted(got) == sorted(expect)


def test_decay_matches_numpy_oracle(spark, search_stats, queries, docs_sf0001):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import decay_topk
    from tests.oracle_bm25 import Bm25Oracle, tokenize

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    got = [
        (r.query_id, r.rank, r.doc_id, r.age_days, round(float(r.score), 6))
        for r in decay_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    ]
    docs = [(r.doc_id, r.text) for r in docs_sf0001.select("doc_id", "text").collect()]
    oracle = Bm25Oracle(docs)
    expect = []
    for qid, text in queries:
        qterms_py = set(tokenize(text)) & set(oracle.df)
        scored = []
        for d in oracle.tf:
            if not (qterms_py & set(oracle.tf[d])):
                continue
            age = _h60(f"age|{d}") % 365
            decay = (300 - min(max(age - 30, 0), 300)) / 300.0
            s = round(round(oracle.score(text, d), 6) * decay, 6)
            scored.append((d, age, s))
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rank, (d, age, s) in enumerate(scored[:10], 1):
            expect.append((qid, rank, d, age, s))
    assert sorted(got) == sorted(expect)


# ------------------------------------------------- session-6 second batch


def test_match_phrase_prefix_matches_python_scan(spark, docs_sf0001):
    """Independent positional mirror: tokenize in python, scan token lists."""
    from sparksearch.catalog_pipeline import MPP_QUERIES
    from sparksearch.phrase import match_phrase_prefix_topk
    from sparksearch.tokenize import py_tokenize

    got = {
        (r.query_id, r.doc_id): (r.rank, r.n_occurrences)
        for r in match_phrase_prefix_topk(docs_sf0001, MPP_QUERIES, k=10).collect()
    }
    docs = [(r.doc_id, py_tokenize(r.text)) for r in docs_sf0001.collect()]
    expect = {}
    for qid, text in MPP_QUERIES:
        toks = py_tokenize(text)
        fixed, prefix = toks[:-1], toks[-1]
        m = len(fixed)
        counts = []
        for d, ts in docs:
            n = sum(
                1
                for i in range(len(ts) - m)
                if ts[i : i + m] == fixed and ts[i + m].startswith(prefix)
            )
            if n:
                counts.append((d, n))
        counts.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, n) in enumerate(counts[:10], 1):
            expect[(qid, d)] = (rank, n)
    assert got == expect


def test_most_fields_is_per_field_sum(spark, search_stats, queries, docs_sf0001):
    """most_fields == dismax with the tie-break algebra collapsed: for every
    returned doc, score equals the qtf-weighted per-field sum recomputed
    from the dismax machinery at tie_break=1.0 (identical VALUES — the
    direct-sum implementation exists for op-sequence hygiene, and at
    fixture scale the two forms agree to well under the 6th decimal)."""
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import dismax_topk

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    most = {
        (r.query_id, r.doc_id): (r.rank, round(float(r.score), 5))
        for r in dismax_topk(
            qterms, docs_sf0001, dl_df, ts, k=10, mode="most_fields"
        ).collect()
    }
    tie1 = {
        (r.query_id, r.doc_id): (r.rank, round(float(r.score), 5))
        for r in dismax_topk(
            qterms, docs_sf0001, dl_df, ts, k=10, tie_break=1.0
        ).collect()
    }
    assert most == tie1


def test_geohash_matches_independent_bit_mirror(spark, events, events_pd):
    """Mirror with bit-shift ops (the engine uses div/mod) + textbook base32."""
    from sparksearch.relational import events_geohash

    B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    rows = {r.geohash: r for r in events_geohash(events).collect()}

    def gh(user_id: int) -> str:
        lon = _h60(f"geo-lon|{user_id}") % 360000 - 180000
        lat = _h60(f"geo-lat|{user_id}") % 170000 - 85000
        lonbin = min((lon + 180000) * 1024 // 360000, 1023)
        latbin = min((lat + 90000) * 1024 // 180000, 1023)
        code = 0
        for i in range(10):
            code |= ((lonbin >> (9 - i)) & 1) << (19 - 2 * i)
            code |= ((latbin >> (9 - i)) & 1) << (18 - 2 * i)
        return "".join(B32[(code >> (5 * (3 - i))) & 31] for i in range(4))

    cell = events_pd.user_id.map(gh)
    assert sum(r.n_events for r in rows.values()) == len(events_pd)
    for c in sorted(cell.unique()):
        r = rows[c]
        assert r.n_events == int((cell == c).sum())
        assert r.n_users == events_pd.user_id[cell == c].nunique()
    assert set(rows) == set(cell.unique())


def test_geo_line_matches_pandas_order(spark, events, events_pd):
    from sparksearch.relational import GEO_LINE_SIZE, events_geo_line

    rows = {r.user_id: r for r in events_geo_line(events).collect()}
    pdf = events_pd.assign(
        ts_s=events_pd.ts.astype("datetime64[s]").astype("int64"),
        lon=events_pd.event_id.map(lambda e: _h60(f"line-lon|{e}") % 360000 - 180000),
        lat=events_pd.event_id.map(lambda e: _h60(f"line-lat|{e}") % 170000 - 85000),
    )
    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["ts_s", "event_id"]).head(GEO_LINE_SIZE)
        expect = " ".join(f"{r.lon},{r.lat}" for r in g.itertuples())
        r = rows[uid]
        assert r.total_points == len(grp)
        assert r.n_points == min(len(grp), GEO_LINE_SIZE)
        assert r.line == expect


def test_change_point_matches_numpy_argmax(spark, events, events_pd):
    from sparksearch.relational import events_change_point

    r = events_change_point(events).collect()[0]
    day = (events_pd.ts.astype("datetime64[s]").astype("int64") // 86400).astype(int)
    lo, hi = int(day.min()), int(day.max())
    counts = np.array([int((day == d).sum()) for d in range(lo, hi + 1)])
    best = None
    for t in range(1, len(counts)):
        ml, mr = counts[:t].mean(), counts[t:].mean()
        stat = round(abs(ml - mr), 6)
        if best is None or stat > best[1]:
            best = (t, stat, ml, mr)
    t, stat, ml, mr = best
    assert r.change_day == pd.Timestamp((lo + t) * 86400, unit="s").strftime("%Y-%m-%d")
    assert (r.n_left, r.n_right) == (t, len(counts) - t)
    assert math.isclose(r.stat, stat, abs_tol=5e-7)
    assert math.isclose(r.mean_left, ml, abs_tol=5e-7)
    assert math.isclose(r.mean_right, mr, abs_tol=5e-7)


def test_span_not_matches_python_scan(spark, docs_sf0001):
    from sparksearch.catalog_pipeline import SPAN_NOT_QUERIES
    from sparksearch.phrase import span_not_topk
    from sparksearch.tokenize import py_tokenize

    got = {
        (r.query_id, r.doc_id): (r.rank, r.n_occurrences)
        for r in span_not_topk(docs_sf0001, SPAN_NOT_QUERIES, k=10).collect()
    }
    docs = [(r.doc_id, py_tokenize(r.text)) for r in docs_sf0001.collect()]
    expect = {}
    for qid, inc, exc in SPAN_NOT_QUERIES:
        terms, (e,) = py_tokenize(inc), py_tokenize(exc)
        m = len(terms)
        counts = []
        for d, ts in docs:
            n = sum(
                1
                for i in range(len(ts) - m + 1)
                if ts[i : i + m] == terms
                and (i == 0 or ts[i - 1] != e)
                and (i + m >= len(ts) or ts[i + m] != e)
            )
            if n:
                counts.append((d, n))
        counts.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, n) in enumerate(counts[:10], 1):
            expect[(qid, d)] = (rank, n)
    assert got == expect


def test_span_not_margin_hand_case(spark):
    from sparksearch.phrase import span_not_topk

    docs = spark.createDataFrame(
        [
            (0, "hash join fast"),          # clean include → counts
            (1, "dup hash join fast"),      # exclude immediately before → dropped
            (2, "hash join dup fast"),      # exclude immediately after → dropped
            (3, "dup slow hash join"),      # exclude 2 away (outside pre=1) → counts
            (4, "hash join"),               # boundary: nothing after the span
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.n_occurrences
        for r in span_not_topk(docs, [(1, "hash join", "dup")], k=10).collect()
    }
    assert rows == {0: 1, 3: 1, 4: 1}


def test_rollup_monthly_equals_raw_aggregation(spark, events, tmp_path):
    """The rollup-search contract on the Spark side itself: monthly answers
    from the hourly artifact == monthly answers from raw rows (exact
    decimals make the re-aggregation bit-equal)."""
    from pyspark.sql import functions as F

    from sparksearch.relational import build_events_rollup, events_rollup_monthly
    from sparksearch.stats import round6

    path = str(tmp_path / "rollup")
    build_events_rollup(events, path)
    got = {
        (r.month, r.event_type): (r.n_events, r.sum_value_e2, r.avg_value)
        for r in events_rollup_monthly(spark, path).collect()
    }
    raw = {
        (r.month, r.event_type): (r.n, r.sv_e2, r.av)
        for r in events.groupBy(
            F.date_format("ts", "yyyy-MM").alias("month"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(30,2)")
            .alias("sv"),
        )
        .select(
            "month", "event_type", "n",
            (F.col("sv") * 100).cast("long").alias("sv_e2"),
            round6(F.col("sv").cast("double") / F.col("n").cast("double")).alias("av"),
        )
        .collect()
    }
    assert got == raw
    # the artifact really is hourly-grain: one row per (hour, type)
    r = spark.read.parquet(path)
    assert r.count() == r.select("hour_i", "event_type").distinct().count()
    assert r.count() < events.count()  # downsampled, not a copy


def test_frequent_item_sets_matches_itertools(spark, events, events_pd):
    from itertools import combinations

    from sparksearch.relational import (
        FIS_MIN_SUPPORT_PCT,
        events_frequent_item_sets,
    )

    got = {
        r.items: (r.size, r.support, round(r.support_ratio, 6))
        for r in events_frequent_item_sets(events).collect()
    }
    day = (events_pd.ts.astype("datetime64[s]").astype("int64") // 86400).astype(int)
    baskets = (
        events_pd.assign(day=day)
        .groupby(["user_id", "day"])
        .event_type.apply(lambda s: frozenset(s))
    )
    nb = len(baskets)
    from collections import Counter

    support = Counter()
    for items in baskets:
        for size in (2, 3):
            for combo in combinations(sorted(items), size):
                support[combo] += 1
    expect = {
        "|".join(c): (len(c), n, round(n / nb, 6))
        for c, n in support.items()
        if n * 100 >= FIS_MIN_SUPPORT_PCT * nb
    }
    assert got == expect


def test_random_score_matches_numpy_oracle(spark, search_stats, queries, docs_sf0001):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import random_score_topk
    from tests.oracle_bm25 import Bm25Oracle, tokenize

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    got = [
        (r.query_id, r.rank, r.doc_id, round(float(r.score), 6))
        for r in random_score_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    ]
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        # python round() is half-EVEN; the engine's round6 is a decimal
        # quantize with HALF_UP (CLAUDE.md: mirror with Decimal(repr(x)),
        # never Decimal(x)). u's 6-dp grid makes half-boundaries common
        # here, unlike the decay mirror where plain round() happened to agree.
        d = Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        return float(d.quantize(Decimal("1e-6"), ROUND_HALF_UP))

    docs = [(r.doc_id, r.text) for r in docs_sf0001.select("doc_id", "text").collect()]
    oracle = Bm25Oracle(docs)
    expect = []
    for qid, text in queries:
        qt = set(tokenize(text)) & set(oracle.df)
        scored = []
        for d in oracle.tf:
            if not (qt & set(oracle.tf[d])):
                continue
            u = (_h60(f"rs|42|{d}") % 10**6) / 10**6
            s = r6(r6(oracle.score(text, d)) * u)
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[:10], 1):
            expect.append((qid, rank, d, s))
    assert sorted(got) == sorted(expect)


def test_rollup_job_self_verifies_and_deterministic(spark, tmp_path):
    import sys as _sys

    _sys.path.insert(0, "/root/repo/jobs") if "/root/repo/jobs" not in _sys.path else None
    from jobs.rollup_events import run

    s1 = run(spark, str(SF_SMOKE), str(tmp_path / "a"))
    s2 = run(spark, str(SF_SMOKE), str(tmp_path / "b"))
    assert s1["rollup_equals_raw"] and s2["rollup_equals_raw"]
    assert s1["rollup_rows"] == s2["rollup_rows"]
    a = sorted(map(tuple, spark.read.parquet(s1["artifacts"]["monthly"]).collect()))
    b = sorted(map(tuple, spark.read.parquet(s2["artifacts"]["monthly"]).collect()))
    assert a == b


def test_geo_polygon_matches_float_raycast(spark, events, events_pd):
    """Independent mirror: the textbook FLOAT ray cast (different
    arithmetic path than the engine's integer cross-multiplication)."""
    from sparksearch.relational import GEO_POLYGON, events_geo_polygon

    def inside(px, py):
        n = len(GEO_POLYGON)
        c = False
        for i in range(n):
            x1, y1 = GEO_POLYGON[i]
            x2, y2 = GEO_POLYGON[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xi = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
                if px < xi:
                    c = not c
        return c

    rows = {r.event_type: r for r in events_geo_polygon(events).collect()}
    lon = events_pd.user_id.map(lambda u: _h60(f"geo-lon|{u}") % 360000 - 180000)
    lat = events_pd.user_id.map(lambda u: _h60(f"geo-lat|{u}") % 170000 - 85000)
    mask = pd.Series(
        [inside(a, b) for a, b in zip(lon, lat)], index=events_pd.index
    )
    assert mask.sum() > 0  # polygon actually selects something
    for et, grp in events_pd[mask].groupby("event_type"):
        assert rows[et].n_events == len(grp)
        assert rows[et].n_users == grp.user_id.nunique()
    assert sum(r.n_events for r in rows.values()) == int(mask.sum())


def test_pinned_promotes_then_organic(spark, search_stats, queries):
    from sparksearch.querying import parse_queries, score_logical
    from sparksearch.scoring_ext import PINNED_IDS, pinned_topk

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    rows = pinned_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    flagship = {}
    for r in score_logical(qterms, tf_df, dl_df, ts, k=30).collect():
        flagship.setdefault(r.query_id, []).append((r.doc_id, round(float(r.score), 6)))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        # ranks 1..p are the pins, in promotion order, flagged pinned
        for i, d in enumerate(PINNED_IDS, 1):
            assert rs[i - 1].rank == i and rs[i - 1].doc_id == d and rs[i - 1].pinned
        # organic tail = flagship order with pins removed, ranks shifted
        organic = [
            (d, s) for d, s in flagship.get(qid, []) if d not in PINNED_IDS
        ][: 10 - len(PINNED_IDS)]
        got = [
            (r.doc_id, round(float(r.score), 6)) for r in rs[len(PINNED_IDS):]
        ]
        assert got == organic
        assert all(not r.pinned for r in rs[len(PINNED_IDS):])
