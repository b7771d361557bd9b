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
        assert Decimal(r.min_price_e2).scaleb(-2) == min(grp)
        assert Decimal(r.max_price_e2).scaleb(-2) == max(grp)
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


# ------------------------------------------------------- session-7 batch 2


def test_categorize_text_matches_python(spark, docs_sf0001):
    import re

    from sparksearch.textpipe import CATEGORIZE_TOKENS, categorize_text
    from tests.oracle_bm25 import tokenize

    got = {r.category: (r.n_docs, r.example_doc_id)
           for r in categorize_text(docs_sf0001).collect()}
    expect: dict[str, list] = {}
    for r in docs_sf0001.select("doc_id", "text").collect():
        head = tokenize(r.text)[:CATEGORIZE_TOKENS]
        cat = " ".join(re.sub(r"[0-9]+", "#", t) for t in head)
        expect.setdefault(cat, []).append(r.doc_id)
    assert got == {c: (len(ds), min(ds)) for c, ds in expect.items()}


def test_nb_lang_confusion_matches_python(spark, docs_sf0001):
    from collections import Counter

    from sparksearch.textpipe import nb_lang_confusion
    from tests.oracle_bm25 import tokenize

    got = {(r.true_lang, r.pred_lang): r.n_docs
           for r in nb_lang_confusion(docs_sf0001).collect()}
    rows = docs_sf0001.select("doc_id", "lang", "text").collect()
    docs = [(r.doc_id, r.lang, Counter(tokenize(r.text))) for r in rows]
    cnt: dict[tuple, int] = {}
    tot: dict[str, int] = {}
    nl: dict[str, int] = {}
    vocab = set()
    for _, lang, tf in docs:
        nl[lang] = nl.get(lang, 0) + 1
        for t, c in tf.items():
            cnt[(lang, t)] = cnt.get((lang, t), 0) + c
            tot[lang] = tot.get(lang, 0) + c
            vocab.add(t)
    # empty docs still count toward the prior (docs table group-by)
    n = len(docs)
    v = len(vocab)

    def ln9(x: float) -> Decimal:
        return Decimal(repr(math.log(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)

    langs = sorted(tot)
    expect: dict[tuple, int] = {}
    for _, true_lang, tf in docs:
        if not tf:
            continue  # no posterior — excluded on both engines
        best = None
        for lang in langs:
            s = ln9(nl[lang] / n)
            for t, c in tf.items():
                if (lang, t) in cnt:
                    s += c * ln9((cnt[(lang, t)] + 1) / (tot[lang] + v))
                else:
                    s += c * ln9(1.0 / (tot[lang] + v))
            if best is None or (s, ) > (best[1], ) or (s == best[1] and lang < best[0]):
                if best is None or s > best[1]:
                    best = (lang, s)
        key = (true_lang, best[0])
        expect[key] = expect.get(key, 0) + 1
    assert got == expect
    # every tokenized doc is classified exactly once
    assert sum(got.values()) == sum(1 for _, _, tf in docs if tf)


def test_embedding_outliers_matches_numpy(spark):
    from sparksearch.vectors import (
        OUTLIER_K, OUTLIER_SAMPLE, OUTLIER_TOPN, embedding_outliers,
    )

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    got = [(r.rank, r.vec_id, round(float(r.knn_dist), 6))
           for r in embedding_outliers(emb).collect()]
    pdf = emb.toPandas()
    pdf = pdf[pdf.vec_id < OUTLIER_SAMPLE]
    ids = pdf.vec_id.to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    kth = []
    for i in range(len(ids)):
        ds = []
        for j in range(len(ids)):
            if i == j:
                continue
            c = float(m[i] @ m[j]) / (
                math.sqrt(float(m[i] @ m[i])) * math.sqrt(float(m[j] @ m[j]))
            )
            ds.append((r6(1.0 - c), int(ids[j])))
        ds.sort()
        kth.append((int(ids[i]), ds[OUTLIER_K - 1][0]))
    kth.sort(key=lambda x: (-x[1], x[0]))
    expect = [(rank, vid, d) for rank, (vid, d) in enumerate(kth[:OUTLIER_TOPN], 1)]
    assert got == expect


def _lev(a: str, b: str) -> int:
    """Classic Levenshtein (no transpositions — matches both engines)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_phrase_suggest_matches_python(spark, docs_sf0001):
    from collections import Counter

    from sparksearch.search_ext import (
        PS_MAX_EDITS, PS_QUERIES, PS_TOPN, phrase_suggest,
    )
    from tests.oracle_bm25 import tokenize

    got = [(r.query_id, r.rank, r.suggestion, round(float(r.score), 6))
           for r in phrase_suggest(spark, docs_sf0001).collect()]

    uni: Counter = Counter()
    big: Counter = Counter()
    for r in docs_sf0001.select("text").collect():
        ts = tokenize(r.text)
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    t_tokens, v = sum(uni.values()), len(uni)

    def ln9(x: float) -> Decimal:
        return Decimal(repr(math.log(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)

    expect = []
    for qid, text in PS_QUERIES:
        t1, t2 = tokenize(text)
        c1 = [w for w in uni if _lev(t1, w) <= PS_MAX_EDITS]
        c2 = [w for w in uni if _lev(t2, w) <= PS_MAX_EDITS]
        pairs = []
        for w1 in c1:
            for w2 in c2:
                s = ln9((uni[w1] + 1) / (t_tokens + v)) + ln9(
                    (big.get((w1, w2), 0) + 1) / (uni[w1] + v)
                )
                pairs.append((w1, w2, s))
        pairs.sort(key=lambda p: (-p[2], p[0], p[1]))
        for rank, (w1, w2, s) in enumerate(pairs[:PS_TOPN], 1):
            expect.append((qid, rank, f"{w1} {w2}", r6(float(s))))
    assert sorted(got) == sorted(expect)
    # the LM actually repairs the fixture misspellings
    top = {qid: sug for qid, rank, sug, _ in got if rank == 1}
    assert top.get(2) == "sort merge"


def test_intervals_matches_python_scan(spark, docs_sf0001):
    from sparksearch.catalog_pipeline import INTERVALS_QUERIES
    from sparksearch.phrase import intervals_topk
    from tests.oracle_bm25 import tokenize

    got = [(r.query_id, r.rank, r.doc_id, r.n_intervals)
           for r in intervals_topk(docs_sf0001, INTERVALS_QUERIES, k=10).collect()]
    docs = [(r.doc_id, tokenize(r.text))
            for r in docs_sf0001.select("doc_id", "text").collect()]
    expect = []
    for qid, pair, gaps, notc in INTERVALS_QUERIES:
        ta, tb = tokenize(pair)
        (tc,) = tokenize(notc)
        scored = []
        for did, ts in docs:
            pa = [i for i, t in enumerate(ts, 1) if t == ta]
            pb = [i for i, t in enumerate(ts, 1) if t == tb]
            pcs = [i for i, t in enumerate(ts, 1) if t == tc]
            n = 0
            for b in pb:
                before = [x for x in pa if x < b]
                if not before:
                    continue
                a = max(before)
                if min(x for x in pb if x > a) != b:
                    continue  # a smaller interval [a, b'] nests inside
                if b - a - 1 > gaps:
                    continue
                if any(a <= x <= b for x in pcs):
                    continue
                n += 1
            if n:
                scored.append((did, n))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (did, n) in enumerate(scored[:10], 1):
            expect.append((qid, rank, did, n))
    assert sorted(got) == sorted(expect)


def test_intervals_minimality_hand_case(spark):
    """[a, a, b]: only [a2, b] qualifies (nesting drops the outer);
    not_containing kills an interval with c strictly inside."""
    from sparksearch.phrase import intervals_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta"),          # minimality: 1, not 2
            (2, "alpha gamma beta"),          # c inside [1, 3] -> 0
            (3, "alpha beta alpha beta"),     # two disjoint intervals
            (4, "beta alpha"),                # wrong order -> 0
        ],
        "doc_id long, text string",
    )
    qs = [(1, "alpha beta", 5, "gamma")]
    got = {(r.doc_id): r.n_intervals
           for r in intervals_topk(docs, qs, k=10).collect()}
    assert got == {1: 1, 3: 2}


def test_match_bool_prefix_matches_python(spark, search_stats, bm25_oracle, docs_sf0001):
    from sparksearch.catalog_pipeline import MPP_QUERIES
    from sparksearch.scoring_ext import match_bool_prefix_topk
    from tests.oracle_bm25 import tokenize

    tf_df, dl_df, ts = search_stats
    got = [
        (r.query_id, r.rank, r.doc_id, r.n_hit, r.prefix_hit,
         round(float(r.score), 6))
        for r in match_bool_prefix_topk(
            spark, MPP_QUERIES, tf_df, dl_df, ts, k=10
        ).collect()
    ]
    vocab = set(bm25_oracle.df)
    expect = []
    for qid, text in MPP_QUERIES:
        toks = tokenize(text)
        *lead, pre = toks
        lead_text = " ".join(lead)
        exp_terms = {t for t in vocab if t.startswith(pre)}
        scored = []
        for d in bm25_oracle.tf:
            dset = set(bm25_oracle.tf[d])
            n_hit = len(set(lead) & dset & vocab)
            p_hit = 1 if (exp_terms & dset) else 0
            if n_hit == 0 and p_hit == 0:
                continue
            base = r6(bm25_oracle.score(lead_text, d)) if n_hit else 0.0
            s = r6(base + p_hit * 1.0)
            scored.append((d, n_hit, p_hit, s))
        scored.sort(key=lambda x: (-x[3], x[0]))
        for rank, (d, nh, ph, s) in enumerate(scored[:10], 1):
            expect.append((qid, rank, d, nh, ph, s))
    assert sorted(got) == sorted(expect)


def test_shipping_priority_plan_and_values(spark):
    """TPC-H Q3: both date filters reach the parquet scans (PushedFilters),
    the page cut is TakeOrderedAndProject, and values match a pandas
    recomputation."""
    from pyspark.sql import functions as F

    from sparksearch.joins import Q3_CUTOFF, Q3_SEGMENT, shipping_priority

    li = spark.read.parquet(str(SF_SMOKE / "lineitem.parquet"))
    od = spark.read.parquet(str(SF_SMOKE / "orders.parquet"))
    cu = spark.read.parquet(str(SF_SMOKE / "customer.parquet"))
    df = shipping_priority(li, od, cu)

    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "TakeOrderedAndProject" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln and "GreaterThan" in ln for ln in pushed), plan
    assert any("o_orderdate" in ln and "LessThan" in ln for ln in pushed), plan

    got = [(r.l_orderkey, r.o_orderdate, r.o_orderpriority,
            round(float(r.revenue), 6), r.n_items) for r in df.collect()]
    lp, op, cp = li.toPandas(), od.toPandas(), cu.toPandas()
    cut = pd.Timestamp(Q3_CUTOFF)
    m = lp[lp.l_shipdate > cut].merge(
        op[op.o_orderdate < cut], left_on="l_orderkey", right_on="o_orderkey"
    ).merge(cp[cp.c_mktsegment == Q3_SEGMENT], left_on="o_custkey",
            right_on="c_custkey")
    m["rev"] = m.apply(
        lambda r: Decimal(repr(round(r.l_extendedprice * (1.0 - r.l_discount), 6))),
        axis=1,
    )
    g = m.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"]).agg(
        rev=("rev", "sum"), n=("rev", "size")
    ).reset_index()
    g = g.sort_values(
        ["rev", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
    ).head(10)
    expect = [
        (int(r.l_orderkey), r.o_orderdate.strftime("%Y-%m-%d"),
         r.o_orderpriority, r6(float(r.rev)), int(r.n))
        for r in g.itertuples()
    ]
    assert got == expect


def test_embedding_audit_job_deterministic(spark, tmp_path):
    import sys as _sys

    if "/root/repo/jobs" not in _sys.path:
        _sys.path.insert(0, "/root/repo/jobs")
    from jobs.embedding_audit import audit

    s1 = audit(spark, str(SF_SMOKE), str(tmp_path / "a"))
    s2 = audit(spark, str(SF_SMOKE), str(tmp_path / "b"))
    for k in ("n_vectors", "ann_recall_vs_exact", "ann_panel_size",
              "top_outlier", "neardup_pairs", "semdedup_dropped",
              "semdedup_kept"):
        assert s1[k] == s2[k], k
    assert s1["semdedup_dropped"] + s1["semdedup_kept"] == s1["n_vectors"]
    assert 0.0 <= s1["ann_recall_vs_exact"] <= 1.0
    a = sorted(map(tuple, spark.read.parquet(s1["audits"]["outliers"]).collect()))
    b = sorted(map(tuple, spark.read.parquet(s2["audits"]["outliers"]).collect()))
    assert a == b
