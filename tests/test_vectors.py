"""Vector similarity: exactness of brute-force cosine, LSH-ANN recall +
score exactness, near-dup pairs — all vs an independent NumPy reference."""

from __future__ import annotations

import numpy as np
import pytest

from sparksearch.vectors import cosine_topk, embedding_neardup_pairs, lsh_ann_topk
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    order = np.argsort(ids)
    return ids[order], mat[order]


def _brute_topk(ids, mat, n_queries=5, k=10):
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qpos in np.nonzero(ids < n_queries)[0]:
        sims = normed @ normed[qpos]
        rows = [
            (round(float(sims[p]), 6), int(ids[p]))
            for p in range(len(ids))
            if ids[p] != ids[qpos]
        ]
        rows.sort(key=lambda t: (-t[0], t[1]))
        out[int(ids[qpos])] = rows[:k]
    return out


def test_cosine_topk_exact(emb, emb_np):
    ids, mat = emb_np
    expected = _brute_topk(ids, mat)
    got = {}
    for r in cosine_topk(emb).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.score, r.vec_id))
    for qid, rows in expected.items():
        mine = sorted(got[qid])
        assert len(mine) == len(rows)
        for (rank, score, vid), (escore, evid) in zip(mine, rows):
            assert vid == evid and score == pytest.approx(escore, abs=2e-6), qid


def test_lsh_ann_scores_exact_and_recall(emb, emb_np):
    ids, mat = emb_np
    exact = _brute_topk(ids, mat)
    got = {}
    for r in lsh_ann_topk(emb).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.score))
    # Returned scores must be true cosines (re-rank is exact) ...
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    pos = {int(i): p for p, i in enumerate(ids)}
    hits = total = 0
    for qid, rows in got.items():
        truth = {vid for _, vid in exact[qid]}
        for vid, score in rows:
            true_cos = float(normed[pos[qid]] @ normed[pos[vid]])
            assert score == pytest.approx(round(true_cos, 6), abs=2e-6)
        hits += sum(1 for vid, _ in rows if vid in truth)
        total += len(exact[qid])
    # ... and recall@10 vs exact must hold at its measured deterministic level.
    assert hits / total >= 0.5, f"LSH recall collapsed: {hits}/{total}"


def test_neardup_pairs_match_reference(emb, emb_np):
    ids, mat = emb_np
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    expected = {
        (int(ids[a]), int(ids[b])): round(float(sims[a, b]), 6)
        for a in range(len(ids))
        for b in range(len(ids))
        if ids[a] < ids[b] and round(float(sims[a, b]), 6) >= 0.45
    }
    got = {
        (r.vec_id_a, r.vec_id_b): r.cosine_sim
        for r in embedding_neardup_pairs(emb).collect()
    }
    # The LSH-bucketed scale path must lose NOTHING vs the NumPy brute force
    # (deterministic planes → deterministic recall on this fixture) ...
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=2e-6)
    # ... and the in-engine brute-force oracle path must agree exactly too.
    from sparksearch.vectors import embedding_neardup_pairs_brute

    brute = {
        (r.vec_id_a, r.vec_id_b): r.cosine_sim
        for r in embedding_neardup_pairs_brute(emb).collect()
    }
    assert brute == got


def test_ivf_ann_scores_exact_and_recall(emb, emb_np):
    from sparksearch.vectors import ivf_ann_topk

    ids, mat = emb_np
    exact = _brute_topk(ids, mat)
    got = {}
    for r in ivf_ann_topk(emb).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.score))
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    pos = {int(i): p for p, i in enumerate(ids)}
    hits = total = 0
    for qid, rows in got.items():
        truth = {vid for _, vid in exact[qid]}
        for vid, score in rows:
            true_cos = float(normed[pos[qid]] @ normed[pos[vid]])
            assert score == pytest.approx(round(true_cos, 6), abs=2e-6)
        hits += sum(1 for vid, _ in rows if vid in truth)
        total += len(exact[qid])
    assert hits / total >= 0.3, f"IVF recall collapsed: {hits}/{total}"


def test_ivf_assign_partitions_everything(emb):
    from sparksearch.vectors import ivf_assign

    assigned, centroids = ivf_assign(emb)
    n = emb.count()
    assert assigned.count() == n                      # every vector assigned
    assert assigned.select("vec_id").distinct().count() == n  # exactly once
    assert centroids.count() <= 16


def test_semdedup_hand_semantics(spark):
    """Planted near-identical vectors must be caught within their cluster
    with the keep-lowest-id rule; the scaled copy of a vector has cosine 1
    to it; orthogonal vectors survive."""
    from sparksearch.vectors import semdedup

    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, base),                        # keeper (lowest id in its group)
        (1, [2.0, 0.0, 0.0, 0.0]),        # scaled copy -> cosine 1.0 to 0
        (2, [0.0, 1.0, 0.0, 0.0]),        # orthogonal to everything above
        (3, [0.99, 0.141, 0.0, 0.0]),     # ~0.99 cosine to 0
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<double>, label long",
    )
    out = {r["vec_id"]: (r["keep"], r["n_dup_lower"]) for r in
           semdedup(emb, tau=0.9, n_centroids=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0] == (1, 0)          # lowest id always survives
    assert out[1][0] == 0            # exact duplicate dropped
    assert out[3][0] == 0            # near duplicate dropped
    assert out[2] == (1, 0)          # orthogonal vector survives


def test_semdedup_catalog_entry_matches_oracle(spark):
    """Driver-style side-by-side for the new entry at sf0.001."""
    import duckdb

    from sparksearch.catalog_pipeline import build_pipeline_catalog

    sf0001_dir = str(SF_SMOKE)
    spec = build_pipeline_catalog()["semdedup"]

    def nrm(t):
        return tuple(
            "%.6f" % v if isinstance(v, float)
            else "NULL" if v is None else str(v)
            for v in t
        )

    srows = sorted(nrm(tuple(r)) for r in spec.fn(spark, sf0001_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf0001_dir}/embeddings.parquet')"
    )
    drows = sorted(nrm(t) for t in con.execute(spec.sql).fetchall())
    assert srows == drows and len(srows) == 500
    # the fixture's strongest pair crosses tau=0.45 -> at least one drop
    assert any(r[3] == "0" for r in srows)


# ---------------------------------------------------------------- PQ / ADC


def test_pq_ann_structure_and_determinism(emb):
    from sparksearch.vectors import pq_ann_topk

    out = pq_ann_topk(emb, n_queries=3, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(r.vec_id != q for r in rows)
        # ascending approximate distance, ties impossible to invert: the
        # rank order IS (adist ASC, vec_id ASC)
        key = [(r.adist, r.vec_id) for r in rows]
        assert key == sorted(key)
        assert all(r.adist >= 0 for r in rows)
    # deterministic rebuild (invariant #1): bit-identical output
    again = pq_ann_topk(emb, n_queries=3, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pq_adc_matches_numpy_given_spark_codebooks(emb, emb_np):
    """Close the loop without re-implementing Lloyd: take the codebooks and
    codes Spark built, recompute the ADC distances in NumPy, and require the
    top-k to agree with pq_ann_topk exactly."""
    import numpy as np

    from sparksearch.vectors import pq_ann_topk, pq_codebooks

    ids, mat = emb_np
    _, codes_df, cents_df = pq_codebooks(emb)
    codes = {(r.sub, r.vec_id): r.cid for r in codes_df.collect()}
    cents = {(r.sub, r.cid): np.asarray(r.cv) for r in cents_df.collect()}
    m = 1 + max(s for s, _ in cents)
    seg = mat.shape[1] // m
    pos = {int(v): p for p, v in enumerate(ids)}
    want = {}
    for q in range(5):
        qv = mat[pos[q]]
        # per-(sub, cid) lookup table, quantized like the engine (9 dp)
        lut = {
            (s, c): round(float(np.dot(qv[s*seg:(s+1)*seg] - cv, qv[s*seg:(s+1)*seg] - cv)), 9)
            for (s, c), cv in cents.items()
        }
        rows = []
        for v in ids:
            v = int(v)
            if v == q:
                continue
            d = round(sum(lut[(s, codes[(s, v)])] for s in range(m)), 6)
            rows.append((d, v))
        rows.sort()
        want[q] = rows[:10]
    got = {}
    for r in pq_ann_topk(emb).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.adist, r.vec_id))
    for q in range(5):
        got[q].sort()
        assert [(d, v) for _, d, v in got[q]] == [
            (pytest.approx(d, abs=2e-6), v) for d, v in want[q]
        ]


def test_sq8_ann_matches_numpy_mirror_and_recalls(spark):
    """SQ8 vs a from-scratch NumPy quantizer mirror (same op order), plus
    recall against exact cosine: 8-bit per-dim quantization error is tiny,
    so the approximate top-10 should almost perfectly match the exact one."""
    import numpy as np

    from sparksearch.vectors import SQ_LEVELS, cosine_topk, sq8_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = sq8_ann_topk(emb)
    rows = got.collect()
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    order = np.argsort(sorted(ids))  # vec_ids are dense-sorted already
    assert X.shape[1] == 64
    mn, mx = X.min(axis=0), X.max(axis=0)
    span = mx - mn
    lv = float(SQ_LEVELS)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.where(span > 0, np.floor((X - mn) * lv / span + 0.5), 0.0)
    xh = mn + q * span / lv
    vid = np.array(sorted(ids))
    mirror = {}
    for qi in range(5):
        qv = X[vid == qi][0]
        sims = (xh @ qv) / (np.linalg.norm(xh, axis=1) * np.linalg.norm(qv))
        cand = [
            (round(float(s), 6), int(v)) for s, v in zip(sims, vid) if v != qi
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        mirror[qi] = [(v, s) for s, v in cand[:10]]
    for r in rows:
        v, s = mirror[r["query_id"]][r["rank"] - 1]
        assert r["vec_id"] == v, (r, v)
        assert abs(r["score"] - s) < 2e-6, (r, s)
    # recall@10 vs exact cosine ≥ 0.9 on every query (8-bit error is small)
    exact = cosine_topk(emb)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ap = {}
    for r in rows:
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qi, want in ex.items():
        assert len(ap[qi] & want) >= 9, (qi, sorted(want), sorted(ap[qi]))


def test_cosine_topk_filtered_subset_and_exact(spark, docs_sf0001):
    """Filtered kNN: every hit satisfies the metadata predicate, and per
    query the page equals the brute-force cosine order over ONLY the
    allowed candidates (pre-filter semantics — never a post-filtered
    page)."""
    import numpy as np

    from sparksearch.vectors import cosine_topk_filtered
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(str(SF_SMOKE / "embeddings.parquet"))
    got = cosine_topk_filtered(emb, docs_sf0001).collect()
    lang = {r.doc_id: r.lang for r in docs_sf0001.select("doc_id", "lang").collect()}
    assert got and all(lang[r.vec_id] == "en" for r in got)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    allowed = sorted(i for i in vecs if lang[i] == "en")
    for qid in {r.query_id for r in got}:
        qv = vecs[qid]
        scores = sorted(
            (
                (-round(float(np.dot(v := vecs[i], qv)
                       / (np.linalg.norm(v) * np.linalg.norm(qv))), 6), i)
                for i in allowed if i != qid
            ),
        )[:10]
        want = [i for _, i in scores]
        page = [r.vec_id for r in sorted(got, key=lambda r: r.rank)
                if r.query_id == qid]
        assert page == want, qid
