"""Dense-vector similarity: brute-force cosine top-k, near-dup pairs, and
random-hyperplane LSH ANN over the embeddings table (SURVEY.md §2.5 Q8 +
training-data pipeline similarity search).

All dot products / norms are higher-order-function expressions
(``zip_with`` + ``aggregate``) — pure Catalyst, whole-stage codegen, no
Python boundary. Embeddings are upcast float→double before any arithmetic so
the DuckDB oracle (which computes in double) agrees to 6 decimals.

Scale design:

* ``cosine_topk`` — the exact baseline: broadcast the (tiny) query-vector set
  against the embedding table; per-query top-k is a window over a map-side
  pre-prunable score. Linear scan — correct at any scale, bandwidth-bound.
* ``lsh_ann_topk`` — the scale path: L deterministic hyperplane tables bucket
  vectors by sign-pattern; candidates = bucket-mates in ≥1 table; exact
  cosine re-rank on candidates only. Hyperplane weights derive from h60
  (md5) — no rand(), so builds/retries/oracles see identical planes. An IVF
  variant (k-means coarse quantizer) is the production alternative; LSH is
  chosen here because it is stateless and exactly reproducible in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .stats import round6
from .textpipe import h60

NEARDUP_COSINE_THRESHOLD = 0.45  # fixture max pair cosine ≈ 0.513
LSH_TABLES = 16
LSH_PLANE_BITS = 3


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _vecs(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        as_double_vec(F.col("embedding")).alias("v"),
    )


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact cosine top-k → DF[query_id, rank, vec_id, score]. Query set =
    the vectors with vec_id < n_queries (deterministic, self-contained);
    self-matches excluded. Broadcast queries × linear scan; per-query window
    top-k with the engine-wide (score DESC, id ASC) tie-break."""
    vecs = _vecs(embeddings)
    queries = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "score")
    )


def embedding_neardup_pairs_brute(
    embeddings: DataFrame, threshold: float = NEARDUP_COSINE_THRESHOLD
) -> DataFrame:
    """Brute-force n² embedding near-dup pairs — the small-scale ORACLE/test
    path only (a cartesian with an inequality filter). The catalog/scale path
    is ``embedding_neardup_pairs`` (LSH-bucketed candidates, exact re-check);
    tests assert the two produce identical output on the fixtures."""
    vecs = _vecs(embeddings)
    a = vecs.select(F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            round6(cosine(F.col("va"), F.col("vb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


NEARDUP_LSH_TABLES = 24


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = NEARDUP_COSINE_THRESHOLD,
    n_tables: int = NEARDUP_LSH_TABLES,
    n_bits: int = LSH_PLANE_BITS,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs → DF[vec_id_a, vec_id_b, cosine_sim]
    (a < b, sim ≥ threshold) — the SCALE path: candidates are vectors sharing
    a sign-pattern bucket in ≥ 1 of ``n_tables`` deterministic hyperplane
    tables; only candidates pay the exact cosine re-check, so cost is
    Σ bucket² per table instead of n². With 24 tables × 3 planes a pair at
    cosine 0.45 (the threshold) collides in ≥1 table with prob ≈ 1 − 5e-4,
    and the planes are h60-derived constants — recall is DETERMINISTIC per
    pair, identical across sessions/engines. tests/test_vectors.py asserts
    bucketed ≡ brute force on the fixtures; returned cosines are exact."""
    # keyed feeds BOTH sides of the band self-join and vecs both exact-
    # re-check sides — persist each so the LSH keying Arrow pass and the
    # embedding scan run once, not once per consumer (the repo's self-join
    # invariant; same persist/materialize/release lifecycle as
    # textpipe.minhash_lsh_dedup).
    vecs = _vecs(embeddings).persist()
    keyed = _lsh_keyed(vecs, n_tables, n_bits, dim).select("vec_id", "t", "key").persist()
    a = keyed.select(F.col("vec_id").alias("vec_id_a"), "t", "key")
    b = keyed.select(F.col("vec_id").alias("vec_id_b"), "t", "key")
    cand = (
        a.join(b, ["t", "key"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    va = vecs.select(F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"))
    out = (
        cand.join(va, "vec_id_a")
        .join(vb, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            round6(cosine(F.col("va"), F.col("vb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    # Materialize the (near-dup-pairs-sized, tiny) result eagerly, then
    # release the inputs so repeated invocations never accumulate pinned
    # storage; ``out`` stays cached — it IS the returned value.
    out = out.persist()
    out.count()
    keyed.unpersist()
    vecs.unpersist()
    return out


def _plane_weights(n_tables: int, n_bits: int, dim: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes from h60 — same values any
    session, any cluster. Shape [table][bit][dim], weights in [-1, 1)."""
    import hashlib

    def w(t: int, b: int, d: int) -> float:
        hx = hashlib.md5(f"plane|{t}|{b}|{d}".encode()).hexdigest()[:15]
        return (int(hx, 16) % 2000) / 1000.0 - 1.0

    return [
        [[w(t, b, d) for d in range(dim)] for b in range(n_bits)]
        for t in range(n_tables)
    ]


def _lsh_keyed(
    vecs: DataFrame, n_tables: int, n_bits: int, dim: int
) -> DataFrame:
    """DF[vec_id, v, t, key] — one row per (vector, table) with the table's
    n_bits sign-pattern bucket key. One Arrow pass: all n_tables·n_bits
    plane dot products are a single NumPy matmul per batch (the historical
    per-plane Catalyst HOF expressions produced a codegen unit so large it
    ran interpreted — 11s → <1s on the bench). Values identical: same h60
    planes, same sign rule."""
    import numpy as np
    import pandas as pd

    planes = _plane_weights(n_tables, n_bits, dim)
    P = np.asarray(planes, dtype=np.float64).reshape(n_tables * n_bits, dim)
    weights = (1 << np.arange(n_bits, dtype=np.int64))  # bit b → 2^b

    def kernel(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            bits = (V @ P.T > 0).reshape(len(pdf), n_tables, n_bits)
            keys = (bits * weights).sum(axis=2).astype(np.int32)  # (n, tables)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                    "v": [v for v in pdf["v"] for _ in range(n_tables)],
                    "t": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "key": keys.reshape(-1),
                }
            )

    return vecs.mapInPandas(
        kernel, "vec_id long, v array<double>, t int, key int"
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_tables: int = LSH_TABLES,
    n_bits: int = LSH_PLANE_BITS,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed ANN top-k → DF[query_id, rank, vec_id, score].

    Sign-pattern bucketing: vector → per-table n_bits-bit key (sign of dot
    with each deterministic hyperplane); candidates = vectors sharing a
    query's key in ≥ 1 table; exact cosine re-rank of candidates; top-k with
    the standard tie-break. Scores of returned rows are exact — only recall
    differs from ``cosine_topk`` (measured in tests). At cluster scale the
    bucket join replaces the linear scan: cost ~ Σ bucket² per table."""
    # keyed is consumed by BOTH sides of the bucket join (query filter +
    # corpus side) — persist so the keying Arrow pass runs once (repo
    # self-join invariant), release after the top-k materializes.
    keyed = _lsh_keyed(_vecs(embeddings), n_tables, n_bits, dim).persist()

    q = keyed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "t", "key"
    )
    cand = (
        keyed.join(q, ["t", "key"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .dropDuplicates(["query_id", "vec_id"])
    )
    # round6, not ROUND(double,6): ann_lsh_topk ranks on this rounded score,
    # and plain double-round is the engine-divergent half-boundary pattern
    # (CLAUDE.md round-3 sharp edge) — quantize-then-round on both engines.
    scored = cand.select(
        "query_id", "vec_id", round6(cosine(F.col("v"), F.col("qv"))).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "score")
        .persist()
    )
    out.count()
    keyed.unpersist()
    return out


def lsh_ann_oracle_sql(
    n_queries: int = 5,
    k: int = 10,
    n_tables: int = LSH_TABLES,
    n_bits: int = LSH_PLANE_BITS,
    dim: int = 64,
) -> str:
    """Exact DuckDB twin of ``lsh_ann_topk``, GENERATED from the same
    h60-derived plane weights the Spark kernel uses (``_plane_weights``) —
    the whole pipeline is deterministic (no rand()), so bucket keys,
    candidate sets, cosines and ranks are value-identical across engines.
    The weights are emitted as literal lists via repr(): Python float repr
    round-trips, so DuckDB parses exactly the same doubles NumPy multiplies.
    Sign rule matches the kernel's strict ``dot > 0``."""
    planes = _plane_weights(n_tables, n_bits, dim)

    def plane_lit(t: int, b: int) -> str:
        return "[" + ", ".join(repr(w) for w in planes[t][b]) + "]"

    branches = []
    for t in range(n_tables):
        bits = " + ".join(
            f"CASE WHEN list_dot_product(v, {plane_lit(t, b)}) > 0 "
            f"THEN {1 << b} ELSE 0 END"
            for b in range(n_bits)
        )
        branches.append(
            f"SELECT vec_id, {t} AS t, ({bits}) AS key FROM e"
        )
    keyed = "\n  UNION ALL\n  ".join(branches)
    cos = (
        "list_dot_product(e.v, qe.v) / (sqrt(list_dot_product(e.v, e.v)) "
        "* sqrt(list_dot_product(qe.v, qe.v)))"
    )
    return f"""WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
keyed AS (
  {keyed}
),
q AS (SELECT vec_id AS query_id, t, key FROM keyed WHERE vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT q.query_id, k.vec_id
  FROM q JOIN keyed k ON k.t = q.t AND k.key = q.key AND k.vec_id <> q.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id,
         CAST(ROUND(CAST(({cos}) AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
  FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN e qe ON qe.vec_id = c.query_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS rnk FROM scored)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, score
FROM r WHERE rnk <= {k}"""


def neardup_oracle_sql(
    threshold: float = NEARDUP_COSINE_THRESHOLD,
    n_tables: int = NEARDUP_LSH_TABLES,
    n_bits: int = LSH_PLANE_BITS,
    dim: int = 64,
) -> str:
    """Exact DuckDB twin of ``embedding_neardup_pairs``, generated from the
    same h60-derived planes (the ``lsh_ann_oracle_sql`` pattern): same
    bucket keys, same candidate pairs, same quantized cosines. The twin
    mirrors the ALGORITHM rather than brute-forcing n² — an LSH dedup is
    approximate by design (miss prob ≈ 5e-4 per threshold-grade pair), so
    a brute-force oracle is wrong on some corpus at some scale (observed:
    one 0.4638-cosine pair at sf0.1 missed all 24 tables). Recall vs brute
    force is asserted in tests/test_vectors.py at fixture scale, where
    exhaustive comparison is feasible."""
    planes = _plane_weights(n_tables, n_bits, dim)

    def plane_lit(t: int, b: int) -> str:
        return "[" + ", ".join(repr(w) for w in planes[t][b]) + "]"

    branches = []
    for t in range(n_tables):
        bits = " + ".join(
            f"CASE WHEN list_dot_product(v, {plane_lit(t, b)}) > 0 "
            f"THEN {1 << b} ELSE 0 END"
            for b in range(n_bits)
        )
        branches.append(f"SELECT vec_id, {t} AS t, ({bits}) AS key FROM e")
    keyed = "\n  UNION ALL\n  ".join(branches)
    cos = (
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) "
        "* sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
keyed AS (
  {keyed}
),
cand AS (
  SELECT DISTINCT ka.vec_id AS vec_id_a, kb.vec_id AS vec_id_b
  FROM keyed ka JOIN keyed kb
    ON ka.t = kb.t AND ka.key = kb.key AND ka.vec_id < kb.vec_id
),
scored AS (
  SELECT c.vec_id_a, c.vec_id_b,
         CAST(ROUND(CAST({cos} AS DECIMAL(28,9)), 6) AS DOUBLE) AS cosine_sim
  FROM cand c JOIN e a ON a.vec_id = c.vec_id_a JOIN e b ON b.vec_id = c.vec_id_b
)
SELECT vec_id_a, vec_id_b, cosine_sim FROM scored WHERE cosine_sim >= {threshold}"""


# ------------------------------------------------------------------ IVF ANN

IVF_CENTROIDS = 16
IVF_PROBE = 4
IVF_ITERS = 2


def ivf_assign(embeddings: DataFrame, n_centroids: int = IVF_CENTROIDS,
               n_iters: int = IVF_ITERS) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic Lloyd iterations, pure DataFrame.

    Init = the n_centroids lowest vec_ids (deterministic, no rand()); each
    iteration: assign every vector to its max-cosine centroid (broadcast
    join — centroid table is tiny by construction), then recompute centroids
    as element-wise means via posexplode + two hash aggregates. Returns
    (assignments DF[vec_id, v, cid], centroids DF[cid, cv]).

    CROSS-ENGINE EXACT by construction (the ``ivf_ann_oracle_sql`` twin
    replays it value-identically): (a) assignment ranks on the round6-
    QUANTIZED cosine (invariant #3 — raw-double argmax flips on cross-engine
    ULP ties), and (b) centroid means are the decimal-exact-sum + one double
    division form (the ``training_data_stats`` remedy — double SUM order
    differs between engines; decimal sums don't). Both choices only quantize
    an approximate quantizer — recall properties are unaffected.

    Scale: the assign pass is a broadcast map-side join over the full table
    (linear, no shuffle of the vectors); the centroid update shuffles only
    (cid, pos) pairs — n_centroids × dim rows. This is the standard
    IVF build shape; at 10^12 scale run it on a sample and assign the rest
    in one final pass."""
    vecs = _vecs(embeddings)
    centroids = (
        vecs.orderBy("vec_id").limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .withColumn("cid", F.row_number().over(Window.orderBy("cid")) - 1)
    )
    for _ in range(n_iters):
        assigned = _ivf_assign_pass(vecs, centroids)
        centroids = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                (F.sum(F.col("val").cast("decimal(28,9)")).cast("double")
                 / F.count(F.lit(1))).alias("m")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("cv")
            )
        )
    return _ivf_assign_pass(vecs, centroids), centroids


def _ivf_assign_pass(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """One assignment pass: DF[vec_id, v, cid] — max QUANTIZED cosine
    (round6), ties → low cid (engine-portable total order)."""
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        vecs.join(F.broadcast(centroids))
        .select(
            "vec_id", "v", "cid",
            round6(cosine(F.col("v"), F.col("cv"))).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """IVF ANN top-k → DF[query_id, rank, vec_id, score]: probe the n_probe
    nearest inverted lists per query, exact cosine re-rank inside them.

    The scale path next to ``lsh_ann_topk``: the probe join touches
    ~n_probe/n_centroids of the corpus instead of all of it; returned scores
    are exact cosines (recall vs the exact scan measured in tests)."""
    assigned, centroids = ivf_assign(embeddings, n_centroids)
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        queries.join(F.broadcast(centroids))
        .select("query_id", "qv", "cid",
                round6(cosine(F.col("qv"), F.col("cv"))).alias("sim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            round6(cosine(F.col("v"), F.col("qv"))).alias("score"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "score")
    )


def _sql_cos(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))))"
    )


def _sql_r6(x: str) -> str:
    return f"CAST(ROUND(CAST({x} AS DECIMAL(28,9)), 6) AS DOUBLE)"


def _lloyd_ctes(n_centroids: int, n_iters: int) -> tuple[list[str], str]:
    """The UNROLLED deterministic-Lloyd CTE chain shared by the IVF and
    SemDeDup oracles: returns (parts, last_centroid_cte_name); the chain
    always ends with ``af`` = the final full assignment DF[vec_id, v, cid].
    Value-identical to ``ivf_assign`` (see its docstring for why)."""

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_sql_r6(_sql_cos('e.v', 'c.cv'))} DESC, c.cid ASC) AS rn
    FROM e CROSS JOIN {cents} c) WHERE rn = 1)"""

    parts = [
        """e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
       list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)""",
        f"""c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {n_centroids}))""",
    ]
    prev = "c0"
    for i in range(1, n_iters + 1):
        parts.append(assign(f"a{i}", prev))
        parts.append(f"""m{i} AS (
  SELECT cid, pos, CAST(SUM(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS m
  FROM (SELECT cid, unnest(v) AS val, unnest(range(len(v))) AS pos FROM a{i})
  GROUP BY cid, pos)""")
        parts.append(
            f"c{i} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid)"
        )
        prev = f"c{i}"
    parts.append(assign("af", prev))
    return parts, prev


def ivf_ann_oracle_sql(
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    n_iters: int = IVF_ITERS,
) -> str:
    """Exact DuckDB twin of ``ivf_ann_topk`` — the whole Lloyd build is
    UNROLLED as CTEs (init from the n_centroids lowest vec_ids, n_iters
    assign+update rounds, final assignment, probe, re-rank), value-identical
    to the Spark pipeline because every cross-engine divergence channel is
    closed at the source (``ivf_assign`` docstring): assignment/probe argmax
    ranks on the round6-quantized cosine with cid tiebreak, centroid means
    are exact decimal sums with ONE double division, and output scores are
    round6. Both engines read the same parquet doubles and evaluate the
    same sequential-fold dot products, so every intermediate is identical."""

    parts, prev = _lloyd_ctes(n_centroids, n_iters)
    cos, r6 = _sql_cos, _sql_r6
    parts.append(
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries})"
    )
    parts.append(f"""probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.query_id, q.qv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {r6(cos('q.qv', 'c.cv'))} DESC, c.cid ASC) AS rn
    FROM q CROSS JOIN {prev} c) WHERE rn <= {n_probe})""")
    parts.append(f"""scored AS (
  SELECT p.query_id, a.vec_id, {r6(cos('a.v', 'p.qv'))} AS score
  FROM af a JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.query_id)""")
    parts.append("""r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS rnk FROM scored)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, score "
          f"FROM r WHERE rnk <= {k}"
    )


# ----------------------------------------------------------- SemDeDup

SEMDEDUP_TAU = 0.45  # within-cluster cosine duplicate threshold


def semdedup(
    embeddings: DataFrame,
    tau: float = SEMDEDUP_TAU,
    n_centroids: int = IVF_CENTROIDS,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic deduplication: k-means-cluster
    the embeddings (the engine's deterministic-Lloyd ``ivf_assign``), then
    inside each cluster mark every vector that is cosine-≥ tau to ANY
    lower-id cluster-mate →

        DF[vec_id, cid, n_dup_lower, keep, max_sim_lower]

    keep = 1 ⟺ no lower-id near-duplicate exists (the deterministic
    keep-lowest-id survivor rule the engine uses everywhere); max_sim_lower
    is the strongest such duplication (NULL for keepers). The kept set is
    exactly the corpus SemDeDup would retain.

    Scale shape — the point of SemDeDup: the pair expansion is WITHIN
    cluster only (Σ|cluster|² ≈ n²/k, embarrassingly parallel per cluster,
    one cid-keyed shuffle) instead of corpus-n². The assignment pass is a
    broadcast map-side join (see ``ivf_assign``). The assignment feeds both
    self-join sides + the final restore, so it is persisted and released
    (repo self-join invariant). Cross-engine exact: assignment is already
    engine-closed (``ivf_assign``), sims rank/filter on round6 quantized
    cosines, and the dup rule is a pure ∃-lower-id predicate — no iteration,
    no order sensitivity."""
    assigned, _ = ivf_assign(embeddings, n_centroids)
    a = assigned.persist()
    x = a.select("cid", "vec_id", "v")
    y = a.select(
        "cid", F.col("vec_id").alias("vid_lo"), F.col("v").alias("v_lo")
    )
    dup = (
        x.join(y, "cid")
        .filter(F.col("vid_lo") < F.col("vec_id"))
        .select(
            "vec_id", round6(cosine(F.col("v"), F.col("v_lo"))).alias("sim")
        )
        .filter(F.col("sim") >= tau)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_lower"),
            F.max("sim").alias("max_sim_lower"),
        )
    )
    out = (
        a.select("vec_id", F.col("cid").cast("long").alias("cid"))
        .join(dup, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce(F.col("n_dup_lower"), F.lit(0)).cast("long")
            .alias("n_dup_lower"),
            F.when(F.col("n_dup_lower").isNull(), F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("keep"),
            "max_sim_lower",
        )
    )
    out = out.persist()
    out.count()
    a.unpersist()
    return out


def semdedup_oracle_sql(
    tau: float = SEMDEDUP_TAU,
    n_centroids: int = IVF_CENTROIDS,
    n_iters: int = IVF_ITERS,
) -> str:
    """Exact DuckDB twin of ``semdedup`` — replays the unrolled Lloyd chain
    (shared ``_lloyd_ctes``) then the same within-cluster lower-id pair
    predicate on round6 cosines."""
    parts, _ = _lloyd_ctes(n_centroids, n_iters)
    parts.append(f"""sims AS (
  SELECT x.vec_id, {_sql_r6(_sql_cos('x.v', 'y.v'))} AS sim
  FROM af x JOIN af y ON x.cid = y.cid AND y.vec_id < x.vec_id)""")
    parts.append(f"""dup AS (
  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dup_lower, MAX(sim) AS max_sim_lower
  FROM sims WHERE sim >= {tau} GROUP BY vec_id)""")
    return (
        "WITH " + ",\n".join(parts)
        + """
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
       CAST(COALESCE(d.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
       CAST(CASE WHEN d.n_dup_lower IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
       d.max_sim_lower
FROM af a LEFT JOIN dup d ON a.vec_id = d.vec_id"""
    )


# ------------------------------------------------ product quantization ANN

PQ_M = 4          # subspaces
PQ_K = 8          # centroids per subspace codebook
PQ_ITERS = 2      # deterministic Lloyd rounds per codebook
PQ_QUERIES = 5
PQ_TOPK = 10


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 via the three proven-equal dot folds (aa − 2ab + bb,
    left-associated the same way the DuckDB twin parses it)."""
    return _dot(a, a) - F.lit(2.0) * _dot(a, b) + _dot(b, b)


def _pq_subvecs(embeddings: DataFrame, m: int) -> DataFrame:
    """DF[vec_id, sub, sv]: each vector split into m contiguous equal-width
    subvectors — the subspace index rides as a KEY COLUMN so all m Lloyd
    problems run as ONE job keyed by (sub, cid), not m sequential loops."""
    vecs = _vecs(embeddings)
    seg = (F.size("v") / m).cast("int")
    return vecs.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.slice("v", seg * i + 1, seg),
            )
        ).alias("sub", "sv"),
    )


def _pq_assign(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """One codebook-assignment pass → DF[sub, vec_id, sv, cid]: argmin
    QUANTIZED (round6) squared L2, ties → low cid (engine-portable order)."""
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("cid"))
    return (
        subs.join(F.broadcast(cents), "sub")
        .select(
            "sub", "vec_id", "sv", "cid",
            round6(_l2sq(F.col("sv"), F.col("cv"))).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("sub", "vec_id", "sv", "cid")
    )


def pq_codebooks(
    embeddings: DataFrame, m: int = PQ_M, n_centroids: int = PQ_K,
    n_iters: int = PQ_ITERS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(subs, codes, cents): deterministic per-subspace Lloyd codebooks
    (init = the n_centroids lowest vec_ids' subvectors — no rand(),
    invariant #1) and the PQ code table DF[sub, vec_id, cid] — m small ints
    per vector, the ~dim·4-bytes → m-bytes compression PQ exists for.

    Centroid updates are exact decimal sums + ONE double division per
    coordinate (the ivf_assign discipline), so codebooks are bit-identical
    across engines/retries/partitionings."""
    subs = _pq_subvecs(embeddings, m)
    codes, cents = _pq_lloyd(subs, n_centroids, n_iters)
    return subs, codes, cents


def _pq_lloyd(
    subs: DataFrame, n_centroids: int, n_iters: int
) -> tuple[DataFrame, DataFrame]:
    """The per-subspace deterministic-Lloyd loop over a prepared
    DF[vec_id, sub, sv] (pq_codebooks' engine, factored out so IVFPQ can
    train the same codebooks on coarse-quantizer RESIDUALS). Returns
    (codes DF[sub, vec_id, cid], cents DF[sub, cid, cv])."""
    w0 = Window.partitionBy("sub").orderBy("vec_id")
    cents = (
        subs.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") <= n_centroids)
        .select("sub", (F.col("rn") - 1).alias("cid"), F.col("sv").alias("cv"))
    )
    for _ in range(n_iters):
        a = _pq_assign(subs, cents)
        cents = (
            a.select("sub", "cid", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "cid", "pos")
            .agg(
                (F.sum(F.col("val").cast("decimal(28,9)")).cast("double")
                 / F.count(F.lit(1))).alias("m")
            )
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("cv")
            )
        )
    codes = _pq_assign(subs, cents).select("sub", "vec_id", "cid")
    return codes, cents


def pq_ann_topk(
    embeddings: DataFrame, n_queries: int = PQ_QUERIES, k: int = PQ_TOPK,
    m: int = PQ_M, n_centroids: int = PQ_K, n_iters: int = PQ_ITERS,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al. 2011) → DF[query_id, rank, vec_id, adist]: per query,
    the k corpus vectors with the smallest PQ-approximated squared L2

        adist(q, x) = Σ_sub ‖q_sub − codebook[sub][code(x, sub)]‖²

    ranked ascending (round6-quantized, ties → low vec_id — the engine
    total order). Self-matches excluded.

    This is the third ANN scale path next to LSH (stateless hashing) and
    IVF (coarse quantizer): at 10^12 vectors the scan touches only the m
    int8-sized codes per vector (storage ÷ ~dim·4/m) and the per-query
    lookup table (m × n_centroids distances — broadcast, computed once
    per query against the tiny codebooks); NO full-precision vector is
    read at query time. The scored aggregation sums m exact decimals per
    (query, vec) — order-independent, so Spark partial aggregation and
    the oracle's single-node GROUP BY agree exactly. In production the
    ADC scan feeds a candidate re-rank over full vectors (the ivf probe
    shape); the catalog entry checks the ADC core.

    Exact DuckDB twin: ``pq_ann_oracle_sql`` unrolls the same Lloyd chain
    (the ann_ivf_topk pattern) — every divergence channel is closed at the
    source: round6-quantized argmin with cid tiebreak, exact-decimal
    centroid means, dot products by the same sequential fold, per-subspace
    distances quantized to decimal(28,9) before the cross-subspace sum."""
    subs, codes, cents = pq_codebooks(embeddings, m, n_centroids, n_iters)
    queries = subs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("sv").alias("qv")
    )
    qd = (
        queries.join(cents, "sub")
        .select(
            "query_id", "sub", "cid",
            F.round(_l2sq(F.col("qv"), F.col("cv")), 9)
            .cast("decimal(28,9)").alias("d2"),
        )
    )
    scored = (
        codes.join(F.broadcast(qd), ["sub", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(round6(F.sum("d2").cast("double")).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "vec_id", "adist",
        )
    )


def _sql_l2(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {a}) - 2.0 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )


def pq_ann_oracle_sql(
    n_queries: int = PQ_QUERIES, k: int = PQ_TOPK, m: int = PQ_M,
    n_centroids: int = PQ_K, n_iters: int = PQ_ITERS,
) -> str:
    """Exact DuckDB twin of ``pq_ann_topk`` — the per-subspace Lloyd build
    unrolled as CTEs keyed by (sub, cid), then the same ADC lookup-table
    join and exact-decimal cross-subspace sum (see pq_ann_topk docstring
    for the closed divergence channels)."""

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT sub, vec_id, sv, cid FROM (
    SELECT s.sub, s.vec_id, s.sv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {_sql_r6(_sql_l2('s.sv', 'c.cv'))} ASC, c.cid ASC) AS rn
    FROM s JOIN {cents} c ON s.sub = c.sub) WHERE rn = 1)"""

    parts = [
        """e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
       list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)""",
        f"""s AS (
  SELECT vec_id, g.sub,
         list_slice(v, g.sub * (len(v) // {m}) + 1, (g.sub + 1) * (len(v) // {m})) AS sv
  FROM e, (SELECT unnest(range({m})) AS sub) g)""",
        f"""c0 AS (
  SELECT sub, rn - 1 AS cid, sv AS cv FROM (
    SELECT sub, sv, ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
    FROM s) WHERE rn <= {n_centroids})""",
    ]
    prev = "c0"
    for i in range(1, n_iters + 1):
        parts.append(assign(f"a{i}", prev))
        parts.append(f"""m{i} AS (
  SELECT sub, cid, pos, CAST(SUM(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS m
  FROM (SELECT sub, cid, unnest(sv) AS val, unnest(range(len(sv))) AS pos FROM a{i})
  GROUP BY 1, 2, 3)""")
        parts.append(
            f"c{i} AS (SELECT sub, cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY 1, 2)"
        )
        prev = f"c{i}"
    parts.append(assign("af", prev))
    parts.append(
        f"q AS (SELECT vec_id AS query_id, sub, sv AS qv FROM s WHERE vec_id < {n_queries})"
    )
    parts.append(f"""qd AS (
  SELECT q.query_id, q.sub, c.cid,
         CAST(ROUND({_sql_l2('q.qv', 'c.cv')}, 9) AS DECIMAL(28,9)) AS d2
  FROM q JOIN {prev} c ON q.sub = c.sub)""")
    parts.append(f"""sc AS (
  SELECT d.query_id, a.vec_id, {_sql_r6('CAST(SUM(d.d2) AS DOUBLE)')} AS adist
  FROM af a JOIN qd d ON a.sub = d.sub AND a.cid = d.cid AND a.vec_id <> d.query_id
  GROUP BY 1, 2)""")
    parts.append("""r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY adist ASC, vec_id ASC) AS rnk FROM sc)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, adist "
          f"FROM r WHERE rnk <= {k}"
    )


# ------------------------------------------ scalar quantization (SQ8) ANN

SQ_QUERIES = 5
SQ_TOPK = 10
SQ_LEVELS = 255  # uint8 code range


def sq8_params(embeddings: DataFrame) -> DataFrame:
    """Per-dimension quantizer training → 1-row DF[mins:array<double>,
    spans:array<double>] (span = max − min). One posexplode + dim-keyed
    min/max aggregate (64 keys — map-side combinable at any corpus size),
    rebuilt into position-ordered arrays for broadcast."""
    dims = _vecs(embeddings).select(F.posexplode("v").alias("pos", "x"))
    pm = dims.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    return pm.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))),
            lambda s: s["mx"] - s["mn"],
        ).alias("spans"),
    )


def sq8_ann_topk(
    embeddings: DataFrame, n_queries: int = SQ_QUERIES, k: int = SQ_TOPK
) -> DataFrame:
    """Scalar-quantization ANN (SQ8, the faiss ScalarQuantizer path) →
    DF[query_id, rank, vec_id, score]: per-dim affine uint8 codes
    q_j = floor((x_j − min_j)·255/span_j + 0.5), asymmetric scoring —
    full-precision query vs dequantized x̂_j = min_j + q_j·span_j/255 —
    completing the quantized-ANN family (hash → LSH, coarse → IVF,
    product → PQ, scalar → SQ8). At 10^12 vectors the scan reads 1 byte/dim
    instead of 4-8 (codes ride the scan; params are a broadcast 1-row).

    Cross-engine exact: codes are floors of identical doubles (same op
    order both engines — no rounding-mode dependence), dequantization and
    the cosine fold run left-to-right over the same arrays, score is
    round6-quantized before the (score DESC, vec_id ASC) rank. Constant
    dims (span 0) code to 0 and dequantize to min. The encoded frame is
    persisted BEFORE the query join: projection collapse would otherwise
    re-inline the whole zip chain per (query, vector) row (CLAUDE.md
    sharp edge), and the dequantized array is scored against every query."""
    vecs = _vecs(embeddings)
    params = sq8_params(embeddings)
    lv = float(SQ_LEVELS)
    codes = F.zip_with(
        F.zip_with(F.col("v"), F.col("mins"), lambda x, m: x - m),
        F.col("spans"),
        lambda d, s: F.when(s > 0, F.floor(d * lv / s + 0.5)).otherwise(F.lit(0)),
    )
    xh = (
        vecs.crossJoin(F.broadcast(params))
        .select("vec_id", codes.alias("q8"), "mins", "spans")
        .select(
            "vec_id",
            F.zip_with(
                F.zip_with(F.col("q8"), F.col("spans"), lambda q, s: q * s / lv),
                F.col("mins"),
                lambda d, m: m + d,
            ).alias("xh"),
        )
        .persist()
    )
    xh.count()
    queries = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        xh.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            round6(cosine(F.col("xh"), F.col("qv"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "vec_id", "score",
        )
        .persist()
    )
    out.count()
    xh.unpersist()
    return out


def cosine_topk_filtered(
    embeddings: DataFrame,
    docs: DataFrame,
    lang: str = "en",
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """Filtered kNN (ES 8 `knn` with `filter`) → DF[query_id, rank,
    vec_id, score]: exact cosine top-k where the CANDIDATE set is
    restricted by a metadata predicate (documents.lang = ``lang``; vec_id
    is doc-aligned) — PRE-filtering, the correct-recall strategy: the
    top-k is computed over the allowed set, never filtered after the cut
    (post-filtering returns < k or loses valid neighbors; with an ANN
    index the same predicate drives filtered HNSW/IVF probing).

    Plan: the allowed-id projection joins the vectors on vec_id (key-
    partitioned; a broadcast when the filter output is small), THEN the
    broadcast-queries × linear-scan scoring runs over the reduced set.
    Queries are never filtered — ES semantics. Ranking on the round6
    quantized key (engine total order)."""
    from .stats import round6

    vecs = _vecs(embeddings)
    allowed = docs.filter(F.col("lang") == lang).select(
        F.col("doc_id").cast("long").alias("vec_id")
    )
    cands = vecs.join(allowed, "vec_id")
    queries = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        cands.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            round6(cosine(F.col("v"), F.col("qv"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "score"
        )
    )


# ------------------------------------------------- round-4 session-7

OUTLIER_K = 5
OUTLIER_TOPN = 20
OUTLIER_SAMPLE = 1000


def embedding_outliers(
    embeddings: DataFrame,
    k: int = OUTLIER_K,
    topn: int = OUTLIER_TOPN,
    sample: int = OUTLIER_SAMPLE,
) -> DataFrame:
    """ES outlier detection (data-frame analytics, ``distance_kth_nn``
    method) → DF[rank, vec_id, knn_dist]: each vector's outlier score is
    its cosine DISTANCE (1 − cos) to its k-th nearest neighbor; the topn
    highest scores are the outliers. The audit a training pipeline runs
    before trusting an embedding space (mislabeled / off-manifold rows
    surface first).

    Determinism + exactness: distances round6-quantized BEFORE both the
    k-th-NN selection and the final ranking (invariant #3 at every rank
    boundary — ties break on the neighbor id, then the vector id). The
    analysis runs on the deterministic vec_id < sample prefix: kth-NN
    needs the TRUE neighborhood, so the exact form is quadratic in the
    analysis set — the production path bounds it by sampling (this knob)
    or by IVF-bucketed candidate generation with the same downstream
    selection (the semdedup/neardup scale story); the oracle covers the
    exact form."""
    from .stats import round6

    vecs = _vecs(embeddings).filter(F.col("vec_id") < sample)
    a = vecs.select(F.col("vec_id").alias("vid"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("oid"), F.col("v").alias("vb"))
    dists = (
        a.join(F.broadcast(b), F.col("vid") != F.col("oid"))
        .select(
            "vid", "oid",
            round6(F.lit(1.0) - cosine(F.col("va"), F.col("vb"))).alias("d6"),
        )
    )
    wk = Window.partitionBy("vid").orderBy(F.asc("d6"), F.asc("oid"))
    kth = (
        dists.withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") == k)
        .select(F.col("vid").alias("vec_id"), F.col("d6").alias("knn_dist"))
    )
    wo = Window.orderBy(F.desc("knn_dist"), F.asc("vec_id"))
    return (
        kth.withColumn("rank", F.row_number().over(wo))
        .filter(F.col("rank") <= topn)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("vec_id").cast("long").alias("vec_id"),
            "knn_dist",
        )
    )


OUTLIER_SQL = f"""WITH e AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings WHERE vec_id < {OUTLIER_SAMPLE}
),
dists AS (
  SELECT a.vec_id AS vid, b.vec_id AS oid,
         CAST(ROUND(CAST(1.0 - list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
              AS DECIMAL(28,9)), 6) AS DOUBLE) AS d6
  FROM e a, e b WHERE a.vec_id <> b.vec_id
),
kth AS (
  SELECT vid AS vec_id, d6 AS knn_dist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d6 ASC, oid ASC) AS r
    FROM dists
  ) WHERE r = {OUTLIER_K}
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, knn_dist FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY knn_dist DESC, vec_id ASC) AS rank
  FROM kth
) WHERE rank <= {OUTLIER_TOPN}"""


BBQ_DIM = 64        # fixture embedding dimension (bits = dim, 2 words)
BBQ_SHORTLIST = 50  # hamming candidates re-ranked exactly
BBQ_NQ = 5          # query set = vec_id < BBQ_NQ (the cosine_topk contract)


def _bbq_words(v) -> tuple[Column, Column]:
    """Sign-bit pack a 64-dim vector into TWO 32-bit words (bits 0..31 /
    32..63). Two words, not one: bit 63 in a single BIGINT is the sign
    bit, and a sum reaching 2^63 silently wraps in Spark while DuckDB
    widens to HUGEINT — a cross-engine mismatch, not an error (the
    matrix_stats sharp edge). 32 bits per word keeps every partial sum
    comfortably positive in both engines. The 2×32 CASE terms are
    generated from one loop so the engines cannot drift."""
    words = []
    for w in range(2):
        terms = [
            F.when(F.element_at(v, w * 32 + j + 1) > 0.0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            for j in range(32)
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        words.append(acc.cast("long"))
    return words[0], words[1]


def bbq_ann_topk(
    embeddings: DataFrame,
    n_queries: int = BBQ_NQ,
    shortlist: int = BBQ_SHORTLIST,
    k: int = 10,
) -> DataFrame:
    """Binary-quantized ANN (the modern ES/Lucene BBQ shape: 1-bit
    quantization + coarse candidate generation + exact re-rank) →
    DF[query_id, rank, vec_id, hamming, score]:

      1. every vector sign-bit packs to 2×32-bit words MAP-SIDE (32×
         memory reduction — the reason BBQ exists at 10^9 vectors);
      2. per query, the ``shortlist`` lowest-Hamming candidates
         (bit_count(xor) on the packed words; ties vec_id ASC — integer
         distance, so the cut is engine-exact with no float discipline);
      3. the shortlist re-ranks by exact cosine under the engine total
         order (round6(score) DESC, vec_id ASC).

    Self-matches excluded, query set = vec_id < n_queries (the
    cosine_topk contract). At cluster scale step 2 scans ONLY packed
    words (16 bytes/vector) with the queries broadcast, and step 3
    fetches full vectors for |shortlist| ids per query — the
    fetch-after-prune shape every quantized ANN deployment uses."""
    vecs = _vecs(embeddings)
    packed = vecs.select(
        "vec_id", "v", *[
            c.alias(n)
            for c, n in zip(_bbq_words(F.col("v")), ("w0", "w1"))
        ]
    )
    queries = packed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    ham = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("q0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
    ).cast("long")
    cand = (
        packed.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", "qv", ham.alias("hamming"))
    )
    wh = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    short = cand.withColumn("hr", F.row_number().over(wh)).filter(
        F.col("hr") <= shortlist
    )
    rer = short.select(
        "query_id", "vec_id", "hamming",
        round6(cosine(F.col("v"), F.col("qv"))).alias("score"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("vec_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "vec_id", "hamming", "score",
        )
    )


def bbq_word_sql(w: int) -> str:
    """The DuckDB sign-bit packing expression for 32-bit word ``w`` —
    ONE generator shared by every BBQ-packing oracle (bbq_ann_topk,
    catalog_s12.ann_two_stage) so the twins cannot drift."""
    return " + ".join(
        f"(CASE WHEN v[{w * 32 + j + 1}] > 0.0 THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    )


def bbq_oracle_sql(k: int = 10) -> str:
    """DuckDB twin of bbq_ann_topk — the packing CASE terms are generated
    by the same loop shape as the Spark side."""
    word = bbq_word_sql

    return f"""WITH e AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
packed AS (
  SELECT vec_id, v, CAST({word(0)} AS BIGINT) AS w0, CAST({word(1)} AS BIGINT) AS w1
  FROM e
),
q AS (
  SELECT vec_id AS query_id, v AS qv, w0 AS q0, w1 AS q1
  FROM packed WHERE vec_id < {BBQ_NQ}
),
cand AS (
  SELECT q.query_id, p.vec_id, p.v, q.qv,
         CAST(bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) AS BIGINT) AS hamming,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) ASC,
                                     p.vec_id ASC) AS hr
  FROM packed p, q WHERE p.vec_id <> q.query_id
),
rer AS (
  SELECT query_id, vec_id, hamming,
         CAST(ROUND(CAST(list_dot_product(v, qv)
              / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
              AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
  FROM cand WHERE hr <= {BBQ_SHORTLIST}
),
ranked AS (
  SELECT query_id, vec_id, hamming, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY CAST(ROUND(CAST(score AS DECIMAL(28,9)), 6) AS DOUBLE) DESC,
                                     vec_id ASC) AS rnk
  FROM rer
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, hamming, score
FROM ranked WHERE rnk <= {k}"""


RV_SUBS = 4      # sub-vectors per document (64-dim -> 4 x 16)
RV_SUBDIM = 16
RV_NQ = 5        # query set = vec_id < RV_NQ


def rank_vectors_maxsim_topk(
    embeddings: DataFrame, n_queries: int = RV_NQ, k: int = 10
) -> DataFrame:
    """Late-interaction retrieval (the ES 8.16 ``rank_vectors`` field +
    maxSimDotProduct rescorer — the ColBERT scoring model) →
    DF[query_id, rank, vec_id, score]: documents and queries each carry a
    BAG of vectors; score = Σ over query sub-vectors of the MAX dot
    product against any document sub-vector. The fixture stores one
    64-dim vector per row, so both sides derive the bag deterministically
    as 4 contiguous 16-dim slices — the multi-vector plumbing (explode,
    per-pair dot, two-level max-then-sum reduce) is exactly what a real
    token-level ColBERT index needs.

    Float discipline: each pairwise dot is round6-quantized; the per-
    (query-sub) max is order-free; the final sum adds FOUR 6-dp-grid
    doubles as exact decimal(18,6) (a 6-dp-grid double casts to
    decimal(18,6) identically on both engines — the sampler_agg
    precedent), so the score is aggregation-order-independent and the
    decimal ranks exactly.

    100 TB shape: sub-vectors explode map-side (×4 rows); the query bag
    (n_queries × 4 rows) broadcasts; the max-then-sum is one partial+
    final agg pair keyed (query, doc). ColBERT deployments prune with an
    ANN pass first — compose with bbq/ivf for that; this operator is the
    exact rescorer."""
    vecs = _vecs(embeddings)
    subs = vecs.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("sub_id"),
                    F.slice(F.col("v"), i * RV_SUBDIM + 1, RV_SUBDIM).alias("sv"),
                )
                for i in range(RV_SUBS)
            ])
        ).alias("s"),
    ).select("vec_id", F.col("s.sub_id").alias("sub_id"), F.col("s.sv").alias("sv"))
    qsubs = subs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("sub_id").alias("qsub"),
        F.col("sv").alias("qv"),
    )
    pair = (
        subs.join(F.broadcast(qsubs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "qsub", "vec_id",
            round6(_dot(F.col("sv"), F.col("qv"))).alias("d6"),
        )
    )
    per_qsub = pair.groupBy("query_id", "qsub", "vec_id").agg(
        F.max("d6").alias("m6")
    )
    scored = per_qsub.groupBy("query_id", "vec_id").agg(
        F.sum(F.col("m6").cast("decimal(18,6)")).alias("sdec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sdec"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "vec_id",
            round6(F.col("sdec").cast("double")).alias("score"),
        )
    )


def rank_vectors_oracle_sql(k: int = 10) -> str:
    r6 = "CAST(ROUND(CAST({x} AS DECIMAL(28,9)), 6) AS DOUBLE)"
    return f"""WITH e AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
subs AS (
  SELECT vec_id, u.sub_id,
         list_slice(v, u.sub_id * {RV_SUBDIM} + 1, u.sub_id * {RV_SUBDIM} + {RV_SUBDIM}) AS sv
  FROM e, (SELECT unnest(generate_series(0, {RV_SUBS - 1})) AS sub_id) u
),
q AS (
  SELECT vec_id AS query_id, sub_id AS qsub, sv AS qv
  FROM subs WHERE vec_id < {RV_NQ}
),
pair AS (
  SELECT q.query_id, q.qsub, s.vec_id,
         {r6.format(x="list_dot_product(s.sv, q.qv)")} AS d6
  FROM subs s, q WHERE s.vec_id <> q.query_id
),
per_qsub AS (
  SELECT query_id, qsub, vec_id, MAX(d6) AS m6 FROM pair GROUP BY 1, 2, 3
),
scored AS (
  SELECT query_id, vec_id, SUM(CAST(m6 AS DECIMAL(18,6))) AS sdec
  FROM per_qsub GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, vec_id, sdec,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sdec DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id,
       {r6.format(x="CAST(sdec AS DOUBLE)")} AS score
FROM ranked WHERE rnk <= {k}"""


MMR_LAMBDA = 0.5   # relevance/diversity blend (0.5·rel − 0.5·max-sim)
MMR_POOL = 20      # candidate pool per query (ANN top-20)
MMR_K = 5          # selections per query


def mmr_rerank(
    embeddings: DataFrame, n_queries: int = RV_NQ,
    pool: int = MMR_POOL, k: int = MMR_K,
) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell & Goldstein
    1998 — the diversify stage of a RAG retriever) → DF[query_id, rank,
    vec_id, relevance, mmr_score]: from each query's cosine top-``pool``
    candidates, iteratively select k, each round maximizing

        mmr = round6(0.5·rel6 − 0.5·maxsim6)

    where rel6 is the candidate's (round6) cosine to the query and
    maxsim6 its max (round6) cosine to the already-selected set (0.0 on
    round 1 — the formula is uniform across rounds, so oracle and engine
    share ONE op sequence; 0.5· is a power-of-two multiply, exact in
    IEEE). Ties break vec_id ASC; every ranking key is a 6-dp-quantized
    double (the engine total-order discipline), so the greedy trajectory
    is engine-exact and the DuckDB twin unrolls the k rounds as CTEs —
    the unrolled-Lloyd precedent for iterative algorithms.

    Plan: pool + pool-pairwise sims are computed ONCE and persisted
    (pool²-sized per query — 400 rows at the defaults); each of the k
    rounds is a join + window over candidate-sized frames with no
    corpus access. At 10^9 docs the pool still bounds every round:
    MMR's cost is the ANN pass that builds the pool, by construction."""
    vecs = _vecs(embeddings).persist()
    queries = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "v",
            round6(cosine(F.col("v"), F.col("qv"))).alias("rel6"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("rel6"), F.asc("vec_id")
    )
    pool_df = (
        scored.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= pool)
        .select("query_id", "vec_id", "v", "rel6")
        .persist()
    )
    a = pool_df.select(
        "query_id", F.col("vec_id").alias("va_id"), F.col("v").alias("va")
    )
    b = pool_df.select(
        "query_id", F.col("vec_id").alias("vb_id"), F.col("v").alias("vb")
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("va_id") != F.col("vb_id"))
        .select(
            "query_id", "va_id", "vb_id",
            round6(cosine(F.col("va"), F.col("vb"))).alias("sim6"),
        )
        .persist()
    )
    cand = pool_df.select("query_id", "vec_id", "rel6")
    selected = None
    out = []
    for rnd in range(1, k + 1):
        if selected is None:
            ms = cand.withColumn("maxsim6", F.lit(0.0))
        else:
            ms = (
                cand.join(
                    sims.join(
                        selected.select(
                            "query_id", F.col("vec_id").alias("vb_id")
                        ),
                        ["query_id", "vb_id"],
                    ).select(
                        "query_id", F.col("va_id").alias("vec_id"), "sim6"
                    ),
                    ["query_id", "vec_id"],
                    "left",
                )
                .groupBy("query_id", "vec_id")
                .agg(
                    F.max("rel6").alias("rel6"),
                    F.coalesce(F.max("sim6"), F.lit(0.0)).alias("maxsim6"),
                )
            )
        key = round6(
            F.lit(MMR_LAMBDA) * F.col("rel6")
            - F.lit(1.0 - MMR_LAMBDA) * F.col("maxsim6")
        )
        wr = Window.partitionBy("query_id").orderBy(
            key.desc(), F.asc("vec_id")
        )
        pick = (
            ms.withColumn("mmr_score", key)
            .withColumn("rr", F.row_number().over(wr))
            .filter(F.col("rr") == 1)
            .select(
                "query_id", F.lit(rnd).cast("long").alias("rank"),
                "vec_id", "rel6", "mmr_score",
            )
        )
        out.append(pick)
        selected = pick if selected is None else selected.unionByName(pick)
        cand = cand.join(
            pick.select("query_id", "vec_id"), ["query_id", "vec_id"],
            "left_anti",
        )
    res = out[0]
    for p in out[1:]:
        res = res.unionByName(p)
    res = res.select(
        "query_id", "rank", "vec_id",
        F.col("rel6").alias("relevance"), "mmr_score",
    )
    return res


def mmr_oracle_sql() -> str:
    """DuckDB twin of mmr_rerank: the k greedy rounds unrolled as CTEs
    (the unrolled-Lloyd precedent), identical uniform mmr op sequence."""
    r6 = "CAST(ROUND(CAST({x} AS DECIMAL(28,9)), 6) AS DOUBLE)"
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
           "* sqrt(list_dot_product({b}, {b})))")
    lam, one_m = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    parts = [f"""e AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {RV_NQ}),
pool0 AS (
  SELECT q.query_id, e.vec_id, e.v,
         {r6.format(x=cos.format(a="e.v", b="q.qv"))} AS rel6,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY {r6.format(x=cos.format(a="e.v", b="q.qv"))} DESC,
                                     e.vec_id ASC) AS pr
  FROM e, q WHERE e.vec_id <> q.query_id
),
pool AS (SELECT query_id, vec_id, v, rel6 FROM pool0 WHERE pr <= {MMR_POOL}),
sims AS (
  SELECT a.query_id, a.vec_id AS va_id, b.vec_id AS vb_id,
         {r6.format(x=cos.format(a="a.v", b="b.v"))} AS sim6
  FROM pool a JOIN pool b
    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
)"""]
    prev_sel: list[str] = []
    for rnd in range(1, MMR_K + 1):
        if not prev_sel:
            ms = f"""ms{rnd} AS (
  SELECT query_id, vec_id, rel6, 0.0 AS maxsim6 FROM pool
)"""
        else:
            sel_union = " UNION ALL ".join(
                f"SELECT query_id, vec_id FROM {s}" for s in prev_sel
            )
            ms = f"""seln{rnd} AS ({sel_union}),
ms{rnd} AS (
  SELECT p.query_id, p.vec_id, MAX(p.rel6) AS rel6,
         COALESCE(MAX(s.sim6), 0.0) AS maxsim6
  FROM pool p
  LEFT JOIN (SELECT sims.query_id, sims.va_id, sims.sim6
             FROM sims JOIN seln{rnd} sl
               ON sims.query_id = sl.query_id AND sims.vb_id = sl.vec_id) s
    ON p.query_id = s.query_id AND p.vec_id = s.va_id
  WHERE NOT EXISTS (SELECT 1 FROM seln{rnd} x
                    WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
  GROUP BY 1, 2
)"""
        key = r6.format(x=f"{lam!r} * rel6 - {one_m!r} * maxsim6")
        parts.append(f"""{ms},
sel{rnd} AS (
  SELECT query_id, vec_id, rel6, {key} AS mmr_score
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY {key} DESC, vec_id ASC) AS rr FROM ms{rnd})
  WHERE rr = 1
)""")
        prev_sel.append(f"sel{rnd}")
    final = " UNION ALL ".join(
        f"SELECT query_id, CAST({i} AS BIGINT) AS rank, vec_id, "
        f"rel6 AS relevance, mmr_score FROM sel{i}"
        for i in range(1, MMR_K + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\n{final}"


MRL_DIMS = (16, 32)  # truncation prefixes evaluated against the full 64
MRL_K = 10


def matryoshka_overlap(
    embeddings: DataFrame, n_queries: int = RV_NQ, k: int = MRL_K
) -> DataFrame:
    """Matryoshka-truncation retrieval audit → DF[query_id, dim,
    overlap_k, overlap_frac]: for each query and each truncated prefix
    dimension (16, 32), the size of the intersection between the
    truncated-cosine top-k and the full-dimension top-k — the
    dimension-vs-recall trade every MRL embedding deployment measures
    before serving truncated vectors (truncation cuts index memory
    dim/64-fold; this reports what it costs).

    Determinism: each ranking is the engine total order on round6
    cosines; the overlap is an exact integer intersection of two pinned
    k-sets, so the audit is value-checkable end to end. Plan: one
    scan computes all three prefix cosines map-side (slice + dot);
    three windows over the per-query candidate frames; the intersection
    is a self-join of k-row sets."""
    vecs = _vecs(embeddings)
    queries = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    base = vecs.join(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    tops = []
    for dim in (*MRL_DIMS, 64):
        c6 = round6(
            cosine(F.slice(F.col("v"), 1, dim), F.slice(F.col("qv"), 1, dim))
        )
        # materialize c6 BEFORE the window (ordering on the raw expression
        # would re-reference the projected-away vector columns)
        scored_d = base.select("query_id", "vec_id", c6.alias("c6"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("c6"), F.asc("vec_id")
        )
        tops.append(
            scored_d.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .select("query_id", "vec_id", F.lit(dim).alias("dim"))
        )
    full = tops[-1].select("query_id", F.col("vec_id").alias("fv"))
    out = None
    for t in tops[:-1]:
        ov = (
            t.join(
                full,
                (t.query_id == full.query_id) & (t.vec_id == full.fv),
                "inner",
            )
            .groupBy(t.query_id, "dim")
            .agg(F.count(F.lit(1)).alias("overlap_k"))
        )
        out = ov if out is None else out.unionByName(ov)
    # queries × dims is tiny; a left join restores 0-overlap rows
    grid = queries.select("query_id").crossJoin(
        F.broadcast(
            queries.sparkSession.createDataFrame(
                [(d,) for d in MRL_DIMS], "dim int"
            )
        )
    )
    res = grid.join(out, ["query_id", "dim"], "left").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("dim").cast("long").alias("dim"),
        F.coalesce(F.col("overlap_k"), F.lit(0)).cast("long").alias("overlap_k"),
        round6(
            F.coalesce(F.col("overlap_k"), F.lit(0)).cast("double") / float(k)
        ).alias("overlap_frac"),
    )
    return res


def matryoshka_oracle_sql(k: int = MRL_K) -> str:
    r6 = "CAST(ROUND(CAST({x} AS DECIMAL(28,9)), 6) AS DOUBLE)"

    def top_cte(dim: int, name: str) -> str:
        cos = (f"list_dot_product(e.v[1:{dim}], q.qv[1:{dim}]) / "
               f"(sqrt(list_dot_product(e.v[1:{dim}], e.v[1:{dim}])) * "
               f"sqrt(list_dot_product(q.qv[1:{dim}], q.qv[1:{dim}])))")
        return f"""{name} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {r6.format(x=cos)} DESC, e.vec_id ASC) AS r
    FROM e, q WHERE e.vec_id <> q.query_id
  ) WHERE r <= {k}
)"""

    dims_union = " UNION ALL ".join(
        f"""SELECT q.query_id, {d} AS dim,
       (SELECT COUNT(*) FROM top{d} t JOIN top64 f
        ON t.query_id = f.query_id AND t.vec_id = f.vec_id
        WHERE t.query_id = q.query_id) AS overlap_k
FROM (SELECT DISTINCT query_id FROM q) q"""
        for d in MRL_DIMS
    )
    ctes = ",\n".join(
        [
            """e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
            list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < """
            + str(RV_NQ) + ")"
        ]
        + [top_cte(d, f"top{d}") for d in (*MRL_DIMS, 64)]
    )
    return f"""WITH {ctes}
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(dim AS BIGINT) AS dim,
       CAST(overlap_k AS BIGINT) AS overlap_k,
       {r6.format(x=f"CAST(overlap_k AS DOUBLE) / {float(k)!r}")} AS overlap_frac
FROM ({dims_union})"""


# ----------------------------------------------------------- IVF-PQ ANN

IVFPQ_QUERIES = 5
IVFPQ_TOPK = 10


def ivfpq_ann_topk(
    embeddings: DataFrame,
    n_queries: int = IVFPQ_QUERIES,
    k: int = IVFPQ_TOPK,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    n_iters: int = PQ_ITERS,
) -> DataFrame:
    """IVF-PQ ANN (the composed FAISS IVFPQ shape — Jégou et al. 2011 §IV)
    → DF[query_id, rank, vec_id, adist]: coarse quantizer partitions the
    corpus into inverted lists, product quantization encodes each vector's
    RESIDUAL (v − coarse centroid), and a query scans only its n_probe
    nearest lists, ranking candidates by the ADC lookup-table distance

        adist(q, x) = Σ_sub ‖(q − c_list)_sub − codebook[sub][code(x)]‖²

    This is the production composition of the two scale paths the catalog
    already checks separately (ann_ivf_topk: probe pruning; ann_pq_topk:
    code-only scans): at 10^12 vectors the query reads m small ints per
    candidate in ~n_probe/n_centroids of the corpus, never a full vector,
    and the per-(query, list) lookup tables are m·n_codes floats — tiny,
    broadcast. Residual encoding is what makes the codebooks shareable
    across lists (the raw-vector PQ spread per-list offsets into every
    codeword; residuals center all lists at the origin).

    Exactness (every cross-engine channel closed at the source, the
    ivf/pq discipline): coarse assignment and probe selection rank on
    round6-quantized cosine with cid tiebreak; residuals are one IEEE
    subtract per element; codebook means are exact decimal sums + one
    double division; per-subspace distances quantize to decimal(28,9)
    BEFORE the cross-subspace sum (order-independent partial agg); final
    order is (round6 adist ASC, vec_id ASC)."""
    assigned, centroids = ivf_assign(embeddings, n_centroids)
    res = assigned.join(F.broadcast(centroids), "cid").select(
        "vec_id",
        "cid",
        F.zip_with("v", "cv", lambda a, b: a - b).alias("r"),
    ).persist()
    # persist: res feeds every residual-Lloyd assignment pass AND the
    # candidate side; without the cache the whole coarse ivf_assign DAG
    # re-executes ~2·(n_iters+2) times inside the one action (the
    # CLAUDE.md multi-consumer sharp edge). Cache cost = one residual per
    # vector — the same footprint as the assignment frame itself; the
    # 10^12-scale variant trains on a sample (ivf_assign docstring).
    seg = (F.size("r") / m).cast("int")
    subs = res.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.slice("r", seg * i + 1, seg),
            )
        ).alias("sub", "sv"),
    )
    codes, cents = _pq_lloyd(subs, n_codes, n_iters)
    codes = codes.select("sub", "vec_id", F.col("cid").alias("code"))
    cents = cents.select("sub", F.col("cid").alias("code"),
                         F.col("cv").alias("pqcv"))

    queries = _vecs(embeddings).filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        queries.join(F.broadcast(centroids))
        .select(
            "query_id", "cid",
            round6(cosine(F.col("qv"), F.col("cv"))).alias("sim"),
            F.zip_with("qv", "cv", lambda a, b: a - b).alias("qr"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cid", "qr")
    ).persist()  # consumed by qsubs AND cand (n_queries·n_probe rows)
    qseg = (F.size("qr") / m).cast("int")
    qsubs = probes.select(
        "query_id",
        "cid",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.slice("qr", qseg * i + 1, qseg),
            )
        ).alias("sub", "qsv"),
    )
    qd = qsubs.join(F.broadcast(cents), "sub").select(
        "query_id", "cid", "sub", "code",
        F.round(_l2sq(F.col("qsv"), F.col("pqcv")), 9)
        .cast("decimal(28,9)")
        .alias("d2"),
    )
    cand = (
        res.select("vec_id", "cid")
        .join(F.broadcast(probes.select("query_id", "cid")), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qd), ["query_id", "cid", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(round6(F.sum("d2").cast("double")).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "vec_id", "adist",
        )
    )


def ivfpq_oracle_sql(
    n_queries: int = IVFPQ_QUERIES,
    k: int = IVFPQ_TOPK,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    n_iters: int = PQ_ITERS,
) -> str:
    """Exact DuckDB twin of ``ivfpq_ann_topk``: the coarse Lloyd chain
    (shared ``_lloyd_ctes``) feeds per-element residuals, the per-subspace
    residual-Lloyd chain unrolls with pq-prefixed CTE names, and the probe
    → lookup-table → grouped-decimal-sum tail mirrors the Spark ops one
    for one (see the operator docstring for the closed channels)."""
    parts, coarse = _lloyd_ctes(n_centroids, IVF_ITERS)
    cos, r6, l2 = _sql_cos, _sql_r6, _sql_l2
    sub_expr = (
        "list_transform(range(len(a.v) // {m}), "
        "j -> a.v[g.sub * (len(a.v) // {m}) + j + 1] "
        "- c.cv[g.sub * (len(a.v) // {m}) + j + 1])"
    ).format(m=m)
    parts.append(f"""rs AS (
  SELECT a.vec_id, a.cid, g.sub, {sub_expr} AS sv
  FROM af a JOIN {coarse} c ON a.cid = c.cid,
       (SELECT unnest(range({m})) AS sub) g)""")

    def passign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT sub, vec_id, sv, code FROM (
    SELECT s.sub, s.vec_id, s.sv, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {r6(l2('s.sv', 'c.pqcv'))} ASC, c.code ASC) AS rn
    FROM rs s JOIN {cents} c ON s.sub = c.sub) WHERE rn = 1)"""

    parts.append(f"""pc0 AS (
  SELECT sub, rn - 1 AS code, sv AS pqcv FROM (
    SELECT sub, sv, ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
    FROM rs) WHERE rn <= {n_codes})""")
    prev = "pc0"
    for i in range(1, n_iters + 1):
        parts.append(passign(f"pa{i}", prev))
        parts.append(f"""pm{i} AS (
  SELECT sub, code, pos,
         CAST(SUM(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS m
  FROM (SELECT sub, code, unnest(sv) AS val, unnest(range(len(sv))) AS pos
        FROM pa{i})
  GROUP BY 1, 2, 3)""")
        parts.append(
            f"pc{i} AS (SELECT sub, code, list(m ORDER BY pos) AS pqcv "
            f"FROM pm{i} GROUP BY 1, 2)"
        )
        prev = f"pc{i}"
    parts.append(passign("paf", prev))
    parts.append(
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries})"
    )
    parts.append(f"""probes AS (
  SELECT query_id, cid, qr FROM (
    SELECT q.query_id, c.cid,
           list_transform(range(len(q.qv)),
                          j -> q.qv[j + 1] - c.cv[j + 1]) AS qr,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {r6(cos('q.qv', 'c.cv'))} DESC, c.cid ASC) AS rn
    FROM q CROSS JOIN {coarse} c) WHERE rn <= {n_probe})""")
    parts.append(f"""qsubs AS (
  SELECT query_id, cid, g.sub,
         list_slice(qr, g.sub * (len(qr) // {m}) + 1,
                    (g.sub + 1) * (len(qr) // {m})) AS qsv
  FROM probes, (SELECT unnest(range({m})) AS sub) g)""")
    parts.append(f"""qd AS (
  SELECT s.query_id, s.cid, s.sub, c.code,
         CAST(ROUND({l2('s.qsv', 'c.pqcv')}, 9) AS DECIMAL(28,9)) AS d2
  FROM qsubs s JOIN {prev} c ON s.sub = c.sub)""")
    parts.append(f"""sc AS (
  SELECT p.query_id, a.vec_id, {r6('CAST(SUM(d.d2) AS DOUBLE)')} AS adist
  FROM af a
  JOIN (SELECT DISTINCT query_id, cid FROM probes) p
    ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN paf ko ON ko.vec_id = a.vec_id
  JOIN qd d ON d.query_id = p.query_id AND d.cid = a.cid
           AND d.sub = ko.sub AND d.code = ko.code
  GROUP BY 1, 2)""")
    parts.append("""r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY adist ASC, vec_id ASC) AS rnk FROM sc)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, adist "
          f"FROM r WHERE rnk <= {k}"
    )
