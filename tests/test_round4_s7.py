"""Round-4 session-7 operators vs independent mirrors (sf0.001).

Modern ES relevance features (rank_feature / distance_feature), the sampler
aggregation, the HLL + KMV-set-operation sketches, the deterministic
variable_width_histogram and linear hybrid fusion — each against a
pandas/NumPy/pure-python recomputation, a third code path beside Spark and
the DuckDB twins.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def r6(x: float) -> float:
    """Mirror of stats.round6 (CLAUDE.md: Decimal(repr(x)), HALF_UP chain)."""
    d = Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)
    return float(d.quantize(Decimal("1e-6"), ROUND_HALF_UP))


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(str(SF_SMOKE / "events.parquet"))


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


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


@pytest.fixture(scope="module")
def bm25_oracle(docs_sf0001):
    from tests.oracle_bm25 import Bm25Oracle

    docs = [(r.doc_id, r.text) for r in docs_sf0001.select("doc_id", "text").collect()]
    return Bm25Oracle(docs)


# ------------------------------------------------------ relevance features


def test_rank_feature_matches_numpy_oracle(spark, search_stats, queries, bm25_oracle):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import rank_feature_topk
    from tests.oracle_bm25 import tokenize

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    got = [
        (r.query_id, r.rank, r.doc_id, r.feature, round(float(r.score), 6))
        for r in rank_feature_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    ]
    expect = []
    for qid, text in queries:
        qt = set(tokenize(text)) & set(bm25_oracle.df)
        scored = []
        for d in bm25_oracle.tf:
            if not (qt & set(bm25_oracle.tf[d])):
                continue
            f = 1 + _h60(f"rf|{d}") % 100
            s = r6(r6(bm25_oracle.score(text, d)) + r6(2.0 * (f / (f + 10))))
            scored.append((d, f, s))
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rank, (d, f, s) in enumerate(scored[:10], 1):
            expect.append((qid, rank, d, f, s))
    assert sorted(got) == sorted(expect)


def test_rank_feature_saturation_bounded(spark, search_stats, queries):
    """The rank_feature contribution is capped at boost — max possible
    total = bm25 + boost, so a zero-relevance doc can never outrank a
    matching one by feature alone (the WAND-friendly property)."""
    from sparksearch.querying import parse_queries, score_logical
    from sparksearch.scoring_ext import rank_feature_topk

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    rf = {(r.query_id, r.doc_id): float(r.score)
          for r in rank_feature_topk(qterms, tf_df, dl_df, ts, k=10).collect()}
    base = {(r.query_id, r.doc_id): float(r.score)
            for r in score_logical(qterms, tf_df, dl_df, ts, k=1000).collect()}
    for key, s in rf.items():
        assert key in base
        assert base[key] - 1e-6 <= s <= base[key] + 2.0 + 1e-6


def test_distance_feature_matches_numpy_oracle(spark, search_stats, queries, bm25_oracle):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import distance_feature_topk
    from tests.oracle_bm25 import tokenize

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    got = [
        (r.query_id, r.rank, r.doc_id, r.dist_days, round(float(r.score), 6))
        for r in distance_feature_topk(qterms, tf_df, dl_df, ts, k=10).collect()
    ]
    expect = []
    for qid, text in queries:
        qt = set(tokenize(text)) & set(bm25_oracle.df)
        scored = []
        for d in bm25_oracle.tf:
            if not (qt & set(bm25_oracle.tf[d])):
                continue
            dist = abs(_h60(f"age|{d}") % 365 - 180)
            s = r6(r6(bm25_oracle.score(text, d)) + r6(1.5 * (60.0 / (dist + 60))))
            scored.append((d, dist, s))
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rank, (d, dist, s) in enumerate(scored[:10], 1):
            expect.append((qid, rank, d, dist, s))
    assert sorted(got) == sorted(expect)


def test_sampler_agg_matches_python(spark, search_stats, queries, bm25_oracle):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import sampler_agg
    from tests.oracle_bm25 import tokenize

    tf_df, dl_df, ts = search_stats
    qterms = parse_queries(spark, queries)
    got = {
        r.query_id: (r.sample_n, r.n_shards_hit,
                     round(float(r.max_score), 6), round(float(r.avg_score), 6))
        for r in sampler_agg(qterms, tf_df, dl_df, ts).collect()
    }
    for qid, text in queries:
        qt = set(tokenize(text)) & set(bm25_oracle.df)
        shards: dict[int, list] = {}
        for d in bm25_oracle.tf:
            if not (qt & set(bm25_oracle.tf[d])):
                continue
            sh = _h60(f"shard|{d}") % 4
            shards.setdefault(sh, []).append((d, r6(bm25_oracle.score(text, d))))
        sample = []
        for sh, docs in shards.items():
            docs.sort(key=lambda x: (-x[1], x[0]))
            sample.extend(s for _, s in docs[:3])
        if not sample:
            assert qid not in got
            continue
        tot = sum(Decimal(repr(s)).quantize(Decimal("1e-6")) for s in sample)
        exp = (len(sample), len(shards), max(sample), r6(float(tot) / len(sample)))
        assert got[qid] == exp


# ----------------------------------------------------------------- sketches


def test_hll_matches_python_mirror(spark, events, events_pd):
    from sparksearch.relational import (
        HLL_EST_NUMERATOR, HLL_M, HLL_RANK_BITS, events_hll_cardinality,
    )

    rows = {r.event_type: r for r in events_hll_cardinality(events).collect()}
    for et, grp in events_pd.groupby("event_type"):
        regs: dict[int, int] = {}
        for u in grp.user_id:
            h = _h60(f"hll|{u}")
            idx = h % HLL_M
            w = (h >> 6) % (1 << HLL_RANK_BITS)
            rank = (HLL_RANK_BITS + 1 - w.bit_length()) if w else HLL_RANK_BITS + 1
            regs[idx] = max(regs.get(idx, 0), rank)
        v = HLL_M - len(regs)
        s = sum(1 << (HLL_RANK_BITS + 1 - r) for r in regs.values()) + v * (
            1 << (HLL_RANK_BITS + 1)
        )
        r = rows[et]
        assert r.v_zero == v
        assert r.s_sum == s
        assert r.n_exact == grp.user_id.nunique()
        raw = HLL_EST_NUMERATOR / s
        if raw <= 2.5 * HLL_M and v > 0:
            # linear counting: m * round9(ln(m / V)) (HALF_UP quantize mirror)
            ln9 = float(
                Decimal(repr(math.log(HLL_M / v))).quantize(
                    Decimal("1e-9"), ROUND_HALF_UP
                )
            )
            est = float(HLL_M) * ln9
        else:
            est = raw
        assert round(float(r.hll_est), 6) == r6(est)
        # corrected estimator: within HLL's error ballpark of the truth
        assert 0.3 * r.n_exact <= r.hll_est <= 3.0 * r.n_exact


def test_kmv_overlap_matches_python_mirror(spark, events, events_pd):
    from sparksearch.relational import KMV_OVERLAP_K, events_kmv_overlap

    r = events_kmv_overlap(events).collect()[0]
    users = {
        et: set(grp.user_id)
        for et, grp in events_pd.groupby("event_type")
        if et in (r.type_a, r.type_b)
    }
    ha = sorted({_h60(f"u|{u}") for u in users[r.type_a]})
    hb = sorted({_h60(f"u|{u}") for u in users[r.type_b]})
    ska, skb = ha[:KMV_OVERLAP_K], hb[:KMV_OVERLAP_K]
    merged = sorted(set(ska) | set(skb))[:KMV_OVERLAP_K]
    theta = merged[KMV_OVERLAP_K - 1] if len(merged) >= KMV_OVERLAP_K else 1 << 60
    n_below = sum(1 for h in merged if h < theta)
    c_int = sum(1 for h in set(ska) & set(skb) if h < theta)
    assert r.n_a_sketch == len(ska) and r.n_b_sketch == len(skb)
    assert r.theta == theta
    assert round(float(r.est_union), 6) == r6(n_below / (theta / float(1 << 60)))
    assert round(float(r.est_intersection), 6) == r6(c_int / (theta / float(1 << 60)))
    # exact counts ride along correctly
    au = {_h60(f"u|{u}") for u in users[r.type_a]}
    bu = {_h60(f"u|{u}") for u in users[r.type_b]}
    assert r.exact_union == len(au | bu)
    assert r.exact_intersection == len(au & bu)
    # exact-degenerate regime: a not-full merged sketch estimates exactly
    if theta == 1 << 60:
        assert float(r.est_union) == float(len(merged))


def test_vwh_matches_pandas_mirror(spark):
    from sparksearch.joins import VWH_BUCKETS, price_variable_width_histogram

    orders = spark.read.parquet(str(SF_SMOKE / "orders.parquet"))
    got = {r.bucket: r for r in price_variable_width_histogram(orders).collect()}
    pdf = orders.toPandas()
    v = pdf.o_totalprice.map(lambda x: Decimal(repr(x)).quantize(Decimal("0.01")))
    dv = sorted(set(v))
    gaps = [(dv[i] - dv[i - 1], dv[i]) for i in range(1, len(dv))]
    gaps.sort(key=lambda g: (-g[0], g[1]))
    bounds = sorted(b for _, b in gaps[: VWH_BUCKETS - 1])
    bucket = v.map(lambda x: 1 + sum(1 for b in bounds if b <= x))
    assert set(bucket) == set(got)
    for bk, grp in v.groupby(bucket):
        r = got[bk]
        assert r.n_orders == len(grp)
        assert Decimal(r.min_price) == min(grp) and Decimal(r.max_price) == max(grp)
        assert round(float(r.avg_price), 6) == r6(float(sum(grp)) / len(grp))
    # buckets partition the rows
    assert sum(r.n_orders for r in got.values()) == len(pdf)


# ------------------------------------------------------------ hybrid fusion


def test_hybrid_linear_matches_numpy_mirror(spark, search_stats, queries, bm25_oracle):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import hybrid_linear_topk
    from tests.oracle_bm25 import tokenize

    tf_df, dl_df, ts = search_stats
    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    qterms = parse_queries(spark, queries)
    got = [
        (r.query_id, r.rank, r.doc_id,
         round(float(r.bm25_norm), 6), round(float(r.cos_norm), 6),
         round(float(r.score), 6))
        for r in hybrid_linear_topk(qterms, tf_df, dl_df, ts, emb, k=10).collect()
    ]
    epd = emb.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in epd.itertuples()}
    expect = []
    for qid, text in queries:
        if not tokenize(text):
            # parse_queries emits no rows for a token-less query, so the
            # engine (and the DuckDB twin) drop it from BOTH pools —
            # there is no query_id to anchor even the vector side.
            continue
        qt = set(tokenize(text)) & set(bm25_oracle.df)
        tp = []
        for d in bm25_oracle.tf:
            if qt & set(bm25_oracle.tf[d]):
                tp.append((d, r6(bm25_oracle.score(text, d))))
        tp.sort(key=lambda x: (-x[1], x[0]))
        tp = tp[:20]
        qv = vecs[qid]
        cp = []
        for vid, vv in vecs.items():
            c = float(vv @ qv) / (math.sqrt(float(vv @ vv)) * math.sqrt(float(qv @ qv)))
            cp.append((vid, r6(c)))
        cp.sort(key=lambda x: (-x[1], x[0]))
        cp = cp[:20]

        def norm(pool):
            mn, mx = min(s for _, s in pool), max(s for _, s in pool)
            return {
                d: ((s - mn) / (mx - mn) if mx > mn else 1.0) for d, s in pool
            }

        nb, nc = (norm(tp) if tp else {}), norm(cp)
        fused = []
        for d in set(nb) | set(nc):
            b, c = nb.get(d, 0.0), nc.get(d, 0.0)
            fused.append((d, r6(b), r6(c), r6(0.5 * b + 0.5 * c)))
        fused.sort(key=lambda x: (-x[3], x[0]))
        for rank, (d, b, c, s) in enumerate(fused[:10], 1):
            expect.append((qid, rank, d, b, c, s))
    assert sorted(got) == sorted(expect)


def test_hybrid_scores_bounded(spark, search_stats, queries):
    from sparksearch.querying import parse_queries
    from sparksearch.scoring_ext import hybrid_linear_topk

    tf_df, dl_df, ts = search_stats
    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    qterms = parse_queries(spark, queries)
    rows = hybrid_linear_topk(qterms, tf_df, dl_df, ts, emb, k=10).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.score <= 1.0 + 1e-9
        assert 0.0 <= r.bm25_norm <= 1.0 + 1e-9
        assert 0.0 <= r.cos_norm <= 1.0 + 1e-9
        # the query's own vector is a perfect cosine match — when the doc
        # survives fusion at rank 1 its cos_norm is 1
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 10
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, 11))
