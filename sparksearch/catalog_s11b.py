"""Round-4 session-11 catalog entries, batch B.

Families (SURVEY.md §11.11):

* Lucene similarity completion: AxiomaticF2LOG (the axiomatic retrieval
  family — pure ln + rational saturation, no cross-engine pow) and DFR
  I(n)L2 (divergence-from-randomness: BasicModelIn · AfterEffectL ·
  NormalizationH2) beside BM25(+F), Dirichlet, Jelinek-Mercer, VSM,
  Classic, boolean.
* ES _rank_eval expected_reciprocal_rank (ERR) with graded relevance —
  the cascade metric, computed EXACTLY: with g ∈ {0..3} every stop
  probability R = (2^g−1)/8 is a dyadic rational, so
  err · 2520 · 8^10 is an exact BIGINT (2520 = lcm(1..10) clears every
  1/rank). One final division + round6 produces the float.
* ES kNN radial search (the `similarity` threshold parameter): every
  vector whose round6 cosine clears the threshold, set semantics (no k).

Invariants: deterministic, h60 hashing, round6 on every float output,
BIGINT casts both sides, identical column names in Spark and the twin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog_pipeline import _docs, _r6

# ----------------------------------------------- similarity scaffold

#: F2EXP/F2LOG's length-normalization parameter (Fang & Zhai 2005).
AXIOM_S = 0.5


def _sim_topk(
    spark: SparkSession,
    sf_dir: str,
    stat_cols: list[str],
    score_fn,
    need_coll_len: bool = False,
    positive_only: bool = False,
) -> DataFrame:
    """Shared per-term-similarity scaffold (axiomatic / DFR / DFI / IB all
    reduce to it): query terms broadcast-join term stats (``stat_cols``
    from termstats ride along), postings join, 1-row global stats
    (n_docs/avgdl, optionally collection length ``cl``) broadcast on,
    ``score_fn()`` evaluated per matched posting, one (query, doc)
    sum-agg, round6-quantized top-k (invariant #3). ``positive_only``
    drops zero-total docs (the DFI gate)."""
    from .queries_catalog import K, _round6, _stats_for, reference_queries
    from .querying import parse_queries, topk_per_query

    tf_df, dl_df, ts, gs = _stats_for(spark, sf_dir)
    q = parse_queries(spark, reference_queries())
    qj = q.join(F.broadcast(ts.select("term", *stat_cols)), "term", "inner")
    contrib = tf_df.join(F.broadcast(qj), "term", "inner").crossJoin(
        F.broadcast(
            gs.select(
                F.col("n_docs").cast("double").alias("nd"),
                F.col("avgdl").alias("avgdl"),
            )
        )
    )
    if need_coll_len:
        contrib = contrib.crossJoin(
            F.broadcast(dl_df.agg(F.sum("dl").cast("double").alias("cl")))
        )
    scored = (
        contrib.select("query_id", "doc_id", score_fn().alias("sc"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("sc").alias("score"))
    )
    if positive_only:
        scored = scored.filter(F.col("score") > 0)
    df = topk_per_query(scored, K)
    return df.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _round6("score").alias("score"),
    )


def _sim_sql(sc_expr: str, extra_ctes: str = "", positive_only: bool = False) -> str:
    """The scaffold's DuckDB twin: same contrib/scored/ranked tail for
    every similarity, parameterized by the per-posting score expression
    (and the optional DFI coll-length CTE / positive gate)."""
    from .queries_catalog import K, TOK_SQL, query_values_sql

    having = "\n  HAVING SUM(sc) > 0" if positive_only else ""
    extra = f"{extra_ctes}," if extra_ctes else ""
    return f"""WITH {TOK_SQL.strip()},
{query_values_sql()},
{extra}
contrib AS (
  SELECT q.query_id, p.doc_id,
         {sc_expr} AS sc
  FROM q
  JOIN termstats t USING (term)
  JOIN postings p USING (term)
  JOIN doclen d ON d.doc_id = p.doc_id
),
scored AS (
  SELECT query_id, doc_id, SUM(sc) AS score FROM contrib GROUP BY 1, 2{having}
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY CAST(ROUND(CAST(score AS DECIMAL(28,9)), 6) AS DOUBLE) DESC,
                    doc_id ASC) AS rnk
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       doc_id, CAST(ROUND(CAST(score AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
FROM ranked WHERE rnk <= {K}"""


# ------------------------------------------------------- axiomatic F2LOG


def q_axiomatic_f2log_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``AxiomaticF2LOG`` similarity → top-k: score =
    Σ_t qtf · ln((N+1)/df) · tf/(tf + s + s·dl/avgdl), s = 0.5.

    The axiomatic family's log-idf variant is chosen over F2EXP because
    its float surface is ONLY ln + rational arithmetic — the exact ops
    the BM25/QLM entries already prove engine-identical — where F2EXP's
    (N/df)^0.35 would introduce a cross-engine pow channel. Op sequence
    pinned identically in the twin; rank on round6 (invariant #3)."""

    def score():
        s = F.lit(AXIOM_S)
        sat = F.col("tf") / (F.col("tf") + s + s * F.col("dl") / F.col("avgdl"))
        return (
            F.col("qtf") * F.log((F.col("nd") + F.lit(1.0)) / F.col("df")) * sat
        )

    return _sim_topk(spark, sf_dir, ["df"], score)


def _axiomatic_sql() -> str:
    return _sim_sql(
        f"""q.qtf * LN(((SELECT n_docs FROM gstats) + 1.0) / t.df)
               * (p.tf / (p.tf + {AXIOM_S!r} + {AXIOM_S!r} * d.dl
                          / (SELECT avgdl FROM gstats)))"""
    )


# ------------------------------------------------------------ DFR I(n)L2

#: 1/ln(2) — log2 is rendered as LN(x) * INV_LN2 on BOTH engines (one
#: shared double literal; the string_stats ln(2) discipline).
INV_LN2 = 1.0 / math.log(2.0)


def q_dfr_inl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``DFRSimilarity(BasicModelIn, AfterEffectL,
    NormalizationH2)`` — DFR I(n)L2 with c=1 → top-k:

        tfn  = tf · log2(1 + c·avgdl/dl)          (H2 normalization)
        score = Σ_t qtf · (tfn/(tfn+1)) · log2((N+1)/(df+0.5))

    (AfterEffectL's 1/(tfn+1) folded against BasicModelIn's tfn·log2
    idf.) log2 never executes natively: both engines compute
    LN(x) * 1.4426950408889634 (INV_LN2, repr-shared) so the doubles are
    bit-identical; the remaining ops are one shared multiply/divide
    sequence. Rank on round6 (invariant #3)."""

    def score():
        inv_ln2 = F.lit(INV_LN2)
        tfn = F.col("tf") * (
            F.log(F.lit(1.0) + F.col("avgdl") / F.col("dl")) * inv_ln2
        )
        idf2 = (
            F.log((F.col("nd") + F.lit(1.0)) / (F.col("df") + F.lit(0.5)))
            * inv_ln2
        )
        return F.col("qtf") * (tfn / (tfn + F.lit(1.0))) * idf2

    return _sim_topk(spark, sf_dir, ["df"], score)


def _dfr_sql() -> str:
    return _sim_sql(
        f"""q.qtf
           * ((p.tf * (LN(1.0 + (SELECT avgdl FROM gstats) / d.dl) * {INV_LN2!r}))
              / ((p.tf * (LN(1.0 + (SELECT avgdl FROM gstats) / d.dl) * {INV_LN2!r})) + 1.0))
           * (LN(((SELECT n_docs FROM gstats) + 1.0) / (t.df + 0.5)) * {INV_LN2!r})"""
    )


# --------------------------------------------------------- DFI + IB sims


def q_dfi_chi2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``DFISimilarity(IndependenceChiSquared)`` → top-k
    (divergence-from-independence, Kocabaş et al.):

        e     = cf_t · dl_d / C          (expected tf under independence)
        χ²    = (tf − e)² / e
        score = Σ_t qtf · log2(χ² + 1)   only where tf > e, else 0

    C = total collection tokens. Every input is an exact integer, so e
    and the gate compare identically across engines (one pinned op
    sequence); log2 is LN · the shared 1/ln2 literal (the DFR
    discipline). Docs whose every matched term is at-or-below expectation
    score 0 and drop (Lucene returns 0 for them — rank-bottom either
    way; the entry keeps only positive scores, pinned in the twin)."""

    def score():
        e = F.col("cf") * F.col("dl") / F.col("cl")
        chi = (F.col("tf") - e) * (F.col("tf") - e) / e
        return F.when(
            F.col("tf") > e,
            F.col("qtf") * (F.log(chi + F.lit(1.0)) * F.lit(INV_LN2)),
        ).otherwise(F.lit(0.0))

    return _sim_topk(
        spark, sf_dir, ["cf"], score, need_coll_len=True, positive_only=True
    )


def _dfi_sql() -> str:
    e = "(t.cf * d.dl / (SELECT cl FROM coll))"
    return _sim_sql(
        f"""CASE WHEN p.tf > {e}
              THEN q.qtf * (LN((p.tf - {e}) * (p.tf - {e}) / {e} + 1.0)
                           * {INV_LN2!r})
              ELSE 0.0 END""",
        extra_ctes="coll AS (SELECT CAST(SUM(dl) AS DOUBLE) AS cl FROM doclen)",
        positive_only=True,
    )


def q_ib_ll_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ``IBSimilarity(DistributionLL, LambdaTTF, NormalizationH2)``
    → top-k (information-based retrieval, Clinchant & Gaussier 2010):

        λ     = (cf_t + 1) / (N + 1)      (LambdaTTF)
        tfn   = tf · log2(1 + avgdl/dl)   (H2, c = 1 — shared with DFR)
        score = Σ_t qtf · log2((tfn + λ) / λ)   (−log of the LL survival)

    log2 never executes natively (LN · shared 1/ln2 literal); λ and tfn
    are pinned op sequences over exact integers + avgdl. Completes the
    Lucene similarity roster: BM25(+F), Classic, DFR, DFI, IB,
    LMDirichlet, LMJelinekMercer, Axiomatic, VSM, boolean."""

    def score():
        inv_ln2 = F.lit(INV_LN2)
        lam = (F.col("cf") + F.lit(1.0)) / (F.col("nd") + F.lit(1.0))
        tfn = F.col("tf") * (
            F.log(F.lit(1.0) + F.col("avgdl") / F.col("dl")) * inv_ln2
        )
        return F.col("qtf") * (F.log((tfn + lam) / lam) * inv_ln2)

    return _sim_topk(spark, sf_dir, ["cf"], score)


def _ib_sql() -> str:
    lam = "((t.cf + 1.0) / ((SELECT n_docs FROM gstats) + 1.0))"
    tfn = f"(p.tf * (LN(1.0 + (SELECT avgdl FROM gstats) / d.dl) * {INV_LN2!r}))"
    return _sim_sql(f"q.qtf * (LN(({tfn} + {lam}) / {lam}) * {INV_LN2!r})")


# -------------------------------------------------------- ERR rank eval

#: max grade (ES default for ERR examples); R = (2^g - 1) / 2^GMAX.
ERR_GMAX = 3
#: err · ERR_SCALE is an exact integer: 2520 = lcm(1..10) clears the
#: 1/rank factors, 8^10 clears every dyadic stop probability.
ERR_SCALE = 2520 * 8**10  # = 2705829396480


def q_err_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _rank_eval ``expected_reciprocal_rank`` (Chapelle et al. 2009
    cascade metric) over the BM25@10 run → DF[query_id, n_rel, err_num,
    err_at_10]:

        R_r  = (2^g_r − 1) / 2^gmax          (gmax = 3)
        ERR  = Σ_r (1/r) · R_r · Π_{i<r} (1 − R_i)

    Graded judgments derive from the conjunctive qrels: relevant docs
    get grade 1 + h60(query_id:doc_id) % 3 ∈ {1,2,3}, others 0 — the
    deterministic-variant policy for a feature whose real inputs are
    human labels. EXACTNESS: every R is a dyadic rational, so
    err · 2520·8^10 is an integer; the Spark side computes it with ONE
    sequential F.aggregate fold per query (integer struct accumulator:
    running survival product × running scaled sum, ≤10 steps), the twin
    with a windowed product() over doubles (every partial product is an
    integer < 8^9 < 2^53 — exact) — two algorithms, one BIGINT. The only
    float is the final division by 2705829396480.0, then round6.

    Scale: the run and qrels are (query_id, doc_id)-keyed joins; the
    fold is per-query over ≤k elements — evaluation cost is the joins,
    which broadcast the tiny query side."""
    from .evaluate import EVAL_K, conjunctive_qrels
    from .queries_catalog import _stats_for, reference_queries
    from .querying import parse_queries, score_logical
    from .stats import round6
    from .textpipe import h60

    tf_df, dl_df, ts, _ = _stats_for(spark, sf_dir)
    qterms = parse_queries(spark, reference_queries())
    topk = score_logical(qterms, tf_df, dl_df, ts, k=EVAL_K).select(
        "query_id", "rank", "doc_id"
    )
    qrels = conjunctive_qrels(qterms, tf_df)
    graded = qrels.select(
        "query_id",
        "doc_id",
        (
            F.lit(1)
            + h60(
                F.concat_ws(
                    ":",
                    F.col("query_id").cast("string"),
                    F.col("doc_id").cast("string"),
                )
            )
            % 3
        )
        .cast("int")
        .alias("grade"),
    )
    n_rel = qrels.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    judged = topk.join(graded, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("grade"), F.lit(0)).alias("g"),
    )
    grp = judged.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.struct("rank", "g"))).alias("pairs")
    )
    arr = grp.select(
        "query_id", F.transform("pairs", lambda x: x["g"]).alias("gs")
    )
    # integer lookup tables as literal arrays (F.shiftleft needs a literal
    # shift; these keep the whole fold in exact int64)
    pow8 = F.array(*[F.lit(8 ** (10 - r)).cast("long") for r in range(1, 11)])
    cerr = F.array(*[F.lit(2520 // r).cast("long") for r in range(1, 11)])
    pow2 = F.array(*[F.lit(1 << g).cast("long") for g in range(0, ERR_GMAX + 1)])
    acc0 = F.struct(
        F.lit(1).cast("long").alias("prod"), F.lit(0).cast("long").alias("s")
    )

    def step(acc, r):
        g = F.element_at(F.col("gs"), r)
        two_g = F.element_at(pow2, (g + F.lit(1)).cast("int"))
        term = (
            F.element_at(cerr, r.cast("int"))
            * (two_g - F.lit(1).cast("long"))
            * acc["prod"]
            * F.element_at(pow8, r.cast("int"))
        )
        return F.struct(
            (acc["prod"] * (F.lit(9).cast("long") - two_g)).alias("prod"),
            (acc["s"] + term).alias("s"),
        )

    folded = arr.select(
        "query_id",
        F.aggregate(
            F.sequence(F.lit(1), F.size("gs")), acc0, step
        )["s"].alias("err_num"),
    )
    return (
        folded.join(n_rel, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.col("err_num").cast("long").alias("err_num"),
            round6(
                F.col("err_num").cast("double") / F.lit(float(ERR_SCALE))
            ).alias("err_at_10"),
        )
    )


def _err_sql() -> str:
    from .evaluate import EVAL_K
    from .queries_catalog import BM25_SCORE_SQL, TOK_SQL, query_values_sql

    return f"""WITH {TOK_SQL.strip()},
{query_values_sql()},
{BM25_SCORE_SQL.strip()},
qn AS (SELECT query_id, COUNT(*) AS nt FROM q GROUP BY 1),
qrels AS (
  SELECT h.query_id, h.doc_id FROM (
    SELECT q.query_id, p.doc_id, COUNT(*) AS hit
    FROM q JOIN postings p USING (term) GROUP BY 1, 2
  ) h JOIN qn USING (query_id) WHERE h.hit = qn.nt
),
graded AS (
  SELECT query_id, doc_id,
         1 + (('0x' || substring(md5(CAST(query_id AS VARCHAR) || ':' ||
                                      CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 3
           AS grade
  FROM qrels
),
nr AS (SELECT query_id, COUNT(*) AS n_rel FROM qrels GROUP BY 1),
j AS (
  SELECT t.query_id, t.rnk, COALESCE(g.grade, 0) AS g
  FROM (SELECT query_id, doc_id, rnk FROM ranked WHERE rnk <= {EVAL_K}) t
  LEFT JOIN graded g ON g.query_id = t.query_id AND g.doc_id = t.doc_id
),
p AS (
  SELECT query_id, rnk, g,
         CAST(COALESCE(product(CAST(9 - (1 << g) AS DOUBLE)) OVER (
                PARTITION BY query_id ORDER BY rnk
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0)
              AS BIGINT) AS pp
  FROM j
),
e AS (
  SELECT query_id,
         CAST(SUM((2520 // rnk) * ((1 << g) - 1) * pp
                  * (1 << (3 * (10 - rnk)))) AS BIGINT) AS err_num
  FROM p GROUP BY 1
)
SELECT CAST(e.query_id AS BIGINT) AS query_id,
       CAST(COALESCE(nr.n_rel, 0) AS BIGINT) AS n_rel,
       e.err_num,
       {_r6(f"CAST(e.err_num AS DOUBLE) / {float(ERR_SCALE)!r}")} AS err_at_10
FROM e LEFT JOIN nr ON nr.query_id = e.query_id"""


# ------------------------------------------------------ kNN radial search

#: ES kNN `similarity` parameter: minimum cosine for a hit (set, not top-k).
RADIUS_MIN_COSINE = 0.3


def q_ann_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES kNN radial search (the ``similarity`` threshold parameter,
    8.8+): return EVERY vector whose cosine to the query clears the
    threshold — set semantics, no k cut. The filter compares the
    round6-QUANTIZED score against the threshold (invariant #3's
    boundary discipline: a raw-double compare at the threshold can admit
    different rows per engine). Queries = vec_id < 5, the ann family's
    pinned set; exact brute-force scan (broadcast queries × linear
    scan — the 100 TB shape for a handful of query vectors)."""
    from .stats import round6
    from .vectors import _vecs, cosine

    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    vecs = _vecs(emb)
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            round6(cosine(F.col("v"), F.col("qv"))).alias("score"),
        )
    )
    return scored.filter(F.col("score") >= F.lit(RADIUS_MIN_COSINE)).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "score",
    )


def _radius_sql() -> str:
    from .catalog_pipeline import COSINE_EXPR, EMB_SQL

    expr = COSINE_EXPR.replace("a_v", "e.v").replace("b_v", "q.qv")
    return f"""WITH {EMB_SQL.strip()},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id, {_r6(expr)} AS score
  FROM e, q WHERE e.vec_id <> q.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       score
FROM scored WHERE score >= {RADIUS_MIN_COSINE!r}"""


# ------------------------------------------- ES|QL SAMPLE / FORK / W_AVG

ESQL_WEIGHTED_QUERY = """
FROM lineitem
| STATS n = COUNT(*),
        wavg = WEIGHTED_AVG(l_extendedprice, l_quantity),
        wavg_disc = WEIGHTED_AVG(l_extendedprice, l_quantity) WHERE l_discount >= 0.05,
        qty = SUM(l_quantity)
  BY l_returnflag
| SORT l_returnflag
"""


def q_esql_lineitem_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(ESQL_WEIGHTED_QUERY, spark=spark, sf_dir=sf_dir)
    # qty is an integer-valued exact sum -> plain BIGINT (driver discipline)
    return _descale_long(df, "qty", "qty", 0)


_WNUM = "CAST(l_extendedprice AS DECIMAL(28,9)) * CAST(l_quantity AS DECIMAL(9,0))"

ESQL_WEIGHTED_SQL = f"""SELECT l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM({_WNUM}) AS DOUBLE)
    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS wavg,
  CAST(SUM(CASE WHEN l_discount >= 0.05 THEN {_WNUM} END) AS DOUBLE)
    / CAST(SUM(CASE WHEN l_discount >= 0.05
                    THEN CAST(l_quantity AS DECIMAL(18,0)) END) AS DOUBLE)
    AS wavg_disc,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,9))) AS BIGINT) AS qty
FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""


ESQL_SAMPLE_QUERY = """
FROM events
| SAMPLE 0.2 event_id
| STATS n = COUNT(*), users = COUNT_DISTINCT(user_id), sv = SUM(value)
  BY event_type
| SORT event_type
"""


def q_esql_events_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(ESQL_SAMPLE_QUERY, spark=spark, sf_dir=sf_dir)
    return _descale_long(df, "sv", "sv_e2", 2)


ESQL_SAMPLE_SQL = """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
  CAST(CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS sv_e2
FROM events
WHERE ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
        % 1000000 < 200000
GROUP BY 1 ORDER BY event_type"""


ESQL_FORK_QUERY = """
FROM orders
| FORK (WHERE o_totalprice > 150000.0
        | STATS big_n = COUNT(*), big_rev = SUM(o_totalprice) BY o_orderstatus)
       (STATS n = COUNT(*) BY o_orderpriority | SORT o_orderpriority | LIMIT 3)
"""


def q_esql_orders_fork(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(ESQL_FORK_QUERY, spark=spark, sf_dir=sf_dir)
    return _descale_long(df, "big_rev", "big_rev_e2", 2)


ESQL_FORK_SQL = """WITH b1 AS (
  SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS big_n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS big_rev_e2
  FROM orders WHERE o_totalprice > 150000.0 GROUP BY 1
),
b2 AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1 ORDER BY o_orderpriority LIMIT 3
)
SELECT o_orderstatus, big_n, big_rev_e2, 'fork1' AS _fork,
       CAST(NULL AS VARCHAR) AS o_orderpriority, CAST(NULL AS BIGINT) AS n
FROM b1
UNION ALL
SELECT CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), 'fork2', o_orderpriority, n
FROM b2"""


# --------------------------------------------------- span_within + encode

#: (query_id, "big: ordered pair", slop, "little term") — same shape as
#: span_containing's set; the within counts are over LITTLE positions.
SPANW_QUERIES = [
    (1, "hash join", 6, "merge"),
    (2, "scan filter", 8, "column"),
    (3, "sort merge", 7, "join"),
    (4, "group window", 9, "agg"),
    (5, "order line", 8, "part"),
]


def q_span_within_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .phrase import span_within_topk
    from .queries_catalog import K

    return span_within_topk(_docs(spark, sf_dir), SPANW_QUERIES, k=K)


def _span_within_sql() -> str:
    """Generated brute-force twin of phrase.span_within_topk: little
    positions with an EXISTS over the minimal-big-span subquery — the
    role-swapped mirror of _span_containing_sql."""
    from .queries_catalog import K
    from .tokenize import py_tokenize

    parts = []
    for qid, big, slop, little in SPANW_QUERIES:
        a, b = py_tokenize(big)
        (c,) = py_tokenize(little)
        parts.append(
            f"""SELECT {qid} AS query_id, cv.doc_id, COUNT(*) AS n_within
FROM (SELECT doc_id, pos FROM occ WHERE term = '{c}') cv
WHERE EXISTS (
  SELECT 1 FROM (
    SELECT av.doc_id AS d, av.pos AS pa, MIN(bv.pos) AS pb
    FROM (SELECT doc_id, pos FROM occ WHERE term = '{a}') av
    JOIN (SELECT doc_id, pos FROM occ WHERE term = '{b}') bv
      ON bv.doc_id = av.doc_id AND bv.pos > av.pos AND bv.pos <= av.pos + {slop + 1}
    GROUP BY 1, 2
  ) s
  WHERE s.d = cv.doc_id AND cv.pos >= s.pa AND cv.pos <= s.pb
)
GROUP BY 1, 2"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""WITH tokd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ts
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(ts) AS term, unnest(generate_series(1, len(ts))) AS pos
  FROM tokd
),
allq AS (
{union}
),
rnkd AS (
  SELECT query_id, doc_id, CAST(n_within AS BIGINT) AS n_within,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY n_within DESC, doc_id ASC) AS rnk
  FROM allq
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       doc_id, n_within
FROM rnkd WHERE rnk <= {K}"""


#: how many top symbols the encode entry reports.
BPE_TOPK = 20


def q_bpe_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING (the companion to bpe_train_merges): apply the
    trained merge table to the corpus and report the top symbols by
    corpus token count → DF[rank, sym, n] — the vocab-utilization table
    a tokenizer-training pipeline reads after training.

    Plan: re-derive the merges (the deterministic ≤8-row table), then
    ONE distributed pass: word frequencies (the same map-combinable
    groupBy the trainer uses), the '|sym||sym|' rendering, the merge
    chain applied as 8 literal replaces in ONE projection (plain replace
    IS the greedy non-overlapping merge under the rendering — the
    trainer's invariant), explode symbols, weighted count, top-k on
    (n DESC, sym ASC). Encoding cost at scale is the word-frequency
    pass; the replace chain is per-DISTINCT-word work."""
    from .catalog_s11 import bpe_train_merges
    from .tokenize import tokens_col

    docs = _docs(spark, sf_dir)
    merges = sorted(
        (
            (r.merge_rank, r.left_sym, r.right_sym)
            for r in bpe_train_merges(spark, docs).collect()
        )
    )
    words = (
        docs.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            F.concat(
                F.lit("|"),
                F.array_join(
                    F.filter(
                        F.split(F.col("term"), "(?!^)"), lambda x: x != F.lit("")
                    ),
                    "||",
                ),
                F.lit("|"),
            ).alias("w"),
            "freq",
        )
    )
    w = F.col("w")
    for _, a, b in merges:
        w = F.replace(w, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    syms = words.select(w.alias("w"), "freq").select(
        F.explode(
            F.split(F.expr("substring(w, 2, length(w) - 2)"), r"\|\|")
        ).alias("sym"),
        "freq",
    )
    counts = syms.groupBy("sym").agg(F.sum("freq").cast("long").alias("n"))
    # page cut via TakeOrderedAndProject (distributed), THEN a k-row rank
    # window — the orders_has_child_topk discipline, so no global window
    # ever sees more than k rows.
    page = counts.orderBy(F.desc("n"), F.asc("sym")).limit(BPE_TOPK)
    from pyspark.sql.window import Window

    win = Window.orderBy(F.desc("n"), F.asc("sym"))
    return (
        page.withColumn("rank", F.row_number().over(win).cast("long"))
        .select("rank", "sym", "n")
    )


def _bpe_encode_sql() -> str:
    from .catalog_s11 import BPE_MERGES, _bpe_ctes

    parts = _bpe_ctes(BPE_MERGES)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sy AS (
  SELECT unnest(string_split(substring(w, 2, length(w) - 2), '||')) AS sym,
         freq
  FROM w{BPE_MERGES}
),
c AS (SELECT sym, CAST(SUM(freq) AS BIGINT) AS n FROM sy GROUP BY 1),
r AS (SELECT sym, n, ROW_NUMBER() OVER (ORDER BY n DESC, sym ASC) AS rnk FROM c)
SELECT CAST(rnk AS BIGINT) AS rank, sym, n FROM r WHERE rnk <= {BPE_TOPK}"""
    )


# ------------------------------------------------------------ span-or near

#: (query_id, "either term", "or term", slop, "then term") — ordered near
#: from ANY occurrence of {a, b} (the SpanOr leg) to the first c within
#: reach.
SPANOR_QUERIES = [
    (1, "hash", "merge", 6, "join"),
    (2, "scan", "seek", 8, "filter"),
    (3, "sort", "shuffle", 7, "merge"),
    (4, "group", "window", 9, "agg"),
    (5, "order", "line", 8, "part"),
]


def q_span_or_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene SpanNearQuery(SpanOrQuery(a, b), c, slop, inOrder=true) →
    top-k by span count: the OR leg's positions are the sorted union of
    both terms' position lists; each union position with a reachable c
    (interior gap ≤ slop, the span family's minimal first-match
    anchoring) contributes one span. Exact integer counts, the phrase
    family's (n DESC, doc ASC) total order.

    Plan: the span_containing batch shape — ONE per-doc term→positions
    map, every query an expression over it; the union leg is one
    array_sort(concat(...)) per doc per query (positions are distinct
    across the two terms: a token occupies one position)."""
    from .phrase import positional_postings
    from .queries_catalog import K
    from .tokenize import py_tokenize

    qdefs: dict[int, tuple[str, str, int, str]] = {}
    for qid, ta, tb, slop, tc in SPANOR_QUERIES:
        (a,) = py_tokenize(ta)
        (b,) = py_tokenize(tb)
        (c,) = py_tokenize(tc)
        qdefs[int(qid)] = (a, b, int(slop), c)
    docs = _docs(spark, sf_dir)
    all_terms = sorted({t for a, b, _, c in qdefs.values() for t in (a, b, c)})
    pp = positional_postings(docs).filter(F.col("term").isin(all_terms))
    per_doc = pp.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "ps"))).alias("m")
    )

    def probe(t: str):
        return F.coalesce(
            F.element_at(F.col("m"), t), F.array().cast("array<int>")
        )

    def count_expr(a: str, b: str, slop: int, c: str):
        leg = F.array_sort(F.concat(probe(a), probe(b)))
        ps_c = probe(c)
        return F.size(
            F.filter(
                F.transform(
                    leg,
                    lambda p: F.array_min(
                        F.filter(
                            ps_c,
                            lambda q: (q > p) & (q <= p + F.lit(slop + 1)),
                        )
                    ),
                ),
                lambda pb: pb.isNotNull(),
            )
        )

    entries = F.array(
        *[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                count_expr(a, b, slop, c).cast("long").alias("n"),
            )
            for qid, (a, b, slop, c) in sorted(qdefs.items())
        ]
    )
    counts = (
        per_doc.select("doc_id", F.explode(entries).alias("e"))
        .select(
            "doc_id",
            F.col("e.query_id").alias("query_id"),
            F.col("e.n").alias("n_spans"),
        )
        .filter(F.col("n_spans") > 0)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_spans"), F.asc("doc_id")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= K)
        .select("query_id", "rank", "doc_id", "n_spans")
    )


def _span_or_sql() -> str:
    from .queries_catalog import K
    from .tokenize import py_tokenize

    parts = []
    for qid, ta, tb, slop, tc in SPANOR_QUERIES:
        (a,) = py_tokenize(ta)
        (b,) = py_tokenize(tb)
        (c,) = py_tokenize(tc)
        parts.append(
            f"""SELECT {qid} AS query_id, lv.doc_id, COUNT(*) AS n_spans
FROM (SELECT doc_id, pos FROM occ WHERE term IN ('{a}', '{b}')) lv
WHERE EXISTS (
  SELECT 1 FROM occ cv
  WHERE cv.term = '{c}' AND cv.doc_id = lv.doc_id
    AND cv.pos > lv.pos AND cv.pos <= lv.pos + {slop + 1}
)
GROUP BY 1, 2"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""WITH tokd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ts
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(ts) AS term, unnest(generate_series(1, len(ts))) AS pos
  FROM tokd
),
allq AS (
{union}
),
rnkd AS (
  SELECT query_id, doc_id, CAST(n_spans AS BIGINT) AS n_spans,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY n_spans DESC, doc_id ASC) AS rnk
  FROM allq
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       doc_id, n_spans
FROM rnkd WHERE rnk <= {K}"""


# ---------------------------------------------------- ES|QL MV completion

ESQL_MV_QUERY = """
FROM lineitem
| STATS lns = VALUES(l_linenumber), flags = VALUES(l_returnflag) BY l_orderkey
| EVAL n = MV_COUNT(lns),
       avg_ln = MV_AVG(lns),
       f2 = MV_CONCAT(MV_SLICE(MV_SORT(flags, "desc"), 0, 1), ","),
       fl = MV_FIRST(lns),
       ll = MV_LAST(lns),
       z = MV_CONCAT(MV_ZIP(MV_DEDUPE(flags), MV_REVERSE(flags), "-"), ","),
       ap = MV_COUNT(MV_APPEND(flags, flags))
| STATS g = COUNT(*), s = SUM(avg_ln), zs = COUNT_DISTINCT(z),
        fs = SUM(fl) WHERE ll > 3, mxap = MAX(ap)
  BY n, f2
| SORT n, f2
"""


def q_esql_lineitem_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(ESQL_MV_QUERY, spark=spark, sf_dir=sf_dir)
    # s carries genuine scale-9 content (MV_AVG sums) -> ×1e9 nanos;
    # fs is an integer-valued conditional sum -> plain BIGINT.
    # width (25,9): ≤18 would run DuckDB's multiply in int64 and overflow
    # (the matrix_stats sharp edge) — ≥19 digits forces int128.
    df = _descale_long(df, "s", "s_e9", 9, width="decimal(25,9)")
    return _descale_long(df, "fs", "fs", 0)


ESQL_MV_SQL = """WITH g0 AS (
  SELECT l_orderkey,
         list_sort(list_distinct(list(l_linenumber))) AS lns,
         list_sort(list_distinct(list(l_returnflag))) AS flags
  FROM lineitem GROUP BY 1
),
e AS (
  SELECT CAST(len(lns) AS BIGINT) AS n,
         CAST(CAST(list_sum(list_transform(lns, x -> CAST(x AS DECIMAL(18,9))))
              AS DECIMAL(28,9)) AS DOUBLE) / len(lns) AS avg_ln,
         array_to_string(list_sort(flags, 'DESC')[1:2], ',') AS f2,
         lns[1] AS fl,
         lns[len(lns)] AS ll,
         array_to_string(
           list_transform(generate_series(1, len(flags)),
             i -> flags[i] || '-' || list_reverse(flags)[i]), ',') AS z,
         CAST(2 * len(flags) AS BIGINT) AS ap
  FROM g0
)
SELECT n, f2, CAST(COUNT(*) AS BIGINT) AS g,
       CAST(CAST(SUM(CAST(avg_ln AS DECIMAL(28,9))) AS DECIMAL(25,9)) * 1000000000 AS BIGINT) AS s_e9,
       CAST(COUNT(DISTINCT z) AS BIGINT) AS zs,
       CAST(SUM(CASE WHEN ll > 3 THEN CAST(fl AS DECIMAL(28,9)) END) AS BIGINT) AS fs,
       CAST(MAX(ap) AS BIGINT) AS mxap
FROM e GROUP BY 1, 2 ORDER BY n, f2"""


# --------------------------------------- ES|QL STD_DEV + CHANGE_POINT

ESQL_STDDEV_QUERY = """
FROM events
| STATS n = COUNT(*), m = AVG(value), sd = STD_DEV(value),
        sd_big = STD_DEV(value) WHERE value >= 100.0
  BY event_type
| SORT event_type
"""


def q_esql_events_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_STDDEV_QUERY, spark=spark, sf_dir=sf_dir)


def _stddev_twin(cond: str | None) -> str:
    """The STD_DEV moment mirror: exact decimal(18,6) sums, decimal-side
    squares, pinned S2/n − m·m op order."""
    v = "CAST(value AS DECIMAL(18,6))"
    if cond:
        v = f"CASE WHEN {cond} THEN {v} END"
        n = f"COUNT(CASE WHEN {cond} THEN 1 END)"
    else:
        n = "COUNT(value)"
    return (
        f"sqrt(greatest(CAST(SUM({v} * {v}) AS DOUBLE) / {n}"
        f" - (CAST(SUM({v}) AS DOUBLE) / {n})"
        f" * (CAST(SUM({v}) AS DOUBLE) / {n}), 0.0))"
    )


ESQL_STDDEV_SQL = f"""SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DOUBLE) / COUNT(value) AS m,
  {_stddev_twin(None)} AS sd,
  {_stddev_twin("value >= 100.0")} AS sd_big
FROM events GROUP BY 1 ORDER BY event_type"""


ESQL_CHANGE_POINT_QUERY = """
FROM events
| EVAL day = EPOCH_DAY(ts)
| STATS n = COUNT(*) BY day
| CHANGE_POINT n ON day
"""


def q_esql_events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL CHANGE_POINT over the daily-count series. NOTE the
    deliberate contrast with the `events_change_point` entry: the
    language command runs on the PIPED rows (sparse days, ES's
    contract), while the aggregation entry fills the dense daily grid
    first — same statistic, different frame."""
    from .esql import compile_esql

    return compile_esql(ESQL_CHANGE_POINT_QUERY, spark=spark, sf_dir=sf_dir)


ESQL_CHANGE_POINT_SQL = """WITH d AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(n) AS BIGINT) AS st FROM d),
pre AS (
  SELECT day,
         CAST(COALESCE(COUNT(*) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nl,
         CAST(COALESCE(SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sl
  FROM d
),
s AS (SELECT day, nl, sl, nd - nl AS nr, st - sl AS sr FROM pre, tot WHERE nl > 0),
scored AS (
  SELECT day, nl, nr, sl, sr,
         CAST(ROUND(CAST(
           CAST(abs(CAST(sl AS DECIMAL(38,0)) * nr - CAST(sr AS DECIMAL(38,0)) * nl) AS DOUBLE)
           / CAST(CAST(nl AS DECIMAL(38,0)) * nr AS DOUBLE)
         AS DECIMAL(28,9)), 6) AS DOUBLE) AS stat
  FROM s
),
best AS (SELECT * FROM scored ORDER BY stat DESC, day ASC LIMIT 1)
SELECT CAST(day AS BIGINT) AS day,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       CAST(ROUND(CAST(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_left,
       CAST(ROUND(CAST(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_right,
       stat
FROM best"""


# -------------------------------------------- ES|QL QSTR + date functions

ESQL_QSTR_QUERY = """
FROM documents
| WHERE QSTR(text, "(hash AND join) OR (merge AND NOT sort)")
| STATS n = COUNT(*), id_sum = SUM(doc_id) BY lang
| SORT lang
"""


def q_esql_docs_qstr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(ESQL_QSTR_QUERY, spark=spark, sf_dir=sf_dir)
    return _descale_long(df, "id_sum", "id_sum", 0)


ESQL_QSTR_SQL = """WITH tokd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ts
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(doc_id AS DECIMAL(28,9))) AS BIGINT) AS id_sum
FROM tokd
WHERE (list_contains(ts, 'hash') AND list_contains(ts, 'join'))
   OR (list_contains(ts, 'merge') AND NOT list_contains(ts, 'sort'))
GROUP BY 1 ORDER BY lang"""


ESQL_DATES_QUERY = """
FROM orders
| INLINESTATS mx = MAX(o_orderdate)
| EVAL m = DATE_TRUNC("month", o_orderdate),
       age_d = DATE_DIFF("day", o_orderdate, mx),
       age_s = DATE_DIFF("second", o_orderdate, mx)
| STATS n = COUNT(*), min_age = MIN(age_d), max_ages = MAX(age_s) BY m
| SORT m
"""


def q_esql_orders_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_DATES_QUERY, spark=spark, sf_dir=sf_dir)


ESQL_DATES_SQL = """WITH mx AS (SELECT MAX(o_orderdate) AS mxv FROM orders),
e AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m,
         CAST(floor(floor(epoch(mx.mxv)) / 86400.0)
              - floor(floor(epoch(o_orderdate)) / 86400.0) AS BIGINT) AS age_d,
         CAST(floor(epoch(mx.mxv)) - floor(epoch(o_orderdate)) AS BIGINT) AS age_s
  FROM orders, mx
)
SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(age_d) AS BIGINT) AS min_age,
       CAST(MAX(age_s) AS BIGINT) AS max_ages
FROM e GROUP BY 1 ORDER BY m"""


# ------------------------------------------------------- anomaly scoring

#: how many top-|z| days the anomaly entry reports.
ANOMALY_TOPK = 10


def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES anomaly detection's bucketed surface made deterministic (the
    x-pack ML job fits a seasonal model and flags buckets whose actual
    diverges from typical; this is the same report computed exactly):
    daily event counts, a day-of-week seasonal baseline (per-dow mean
    and population σ over the days present), and the top-|z| days

        z = (count − mean_dow) / σ_dow

    ranked on (round6(|z|) DESC, day ASC). Exactness: counts are
    integers, so Σc and Σc² are exact BIGINTs (c ≤ ~10^6/day keeps c²·90
    well inside int64); mean/var/σ/z are pinned double sequences over
    those integers — identical on both engines; constant dows (σ = 0)
    drop on both sides. Scale: one day-grain count, one dow-grain agg
    broadcast back onto the days frame, TakeOrdered page."""
    from .stats import round6

    events = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    days = (
        events.select(
            F.floor(
                F.col("ts").cast("timestamp").cast("long") / F.lit(86400)
            )
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("dow", (F.col("day") % 7).cast("long"))
    )
    base = days.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    j = days.join(F.broadcast(base), "dow")
    mean = F.col("s1").cast("double") / F.col("nd")
    var = F.col("s2").cast("double") / F.col("nd") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = (F.col("n").cast("double") - mean) / std
    scored = j.filter(std > F.lit(0.0)).select(
        "day",
        "dow",
        "n",
        round6(mean).alias("mean_dow"),
        round6(z).alias("z"),
        round6(F.abs(z)).alias("abs_z"),
    )
    page = scored.orderBy(F.desc("abs_z"), F.asc("day")).limit(ANOMALY_TOPK)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("abs_z"), F.asc("day"))
    return page.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "day", "dow", "n", "mean_dow", "z"
    )


def _anomaly_sql() -> str:
    return f"""WITH days AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
d2 AS (SELECT day, n, CAST(day % 7 AS BIGINT) AS dow FROM days),
base AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(n) AS BIGINT) AS s1,
         CAST(SUM(n * n) AS BIGINT) AS s2
  FROM d2 GROUP BY 1
),
j AS (
  SELECT d2.day, d2.dow, d2.n,
         CAST(s1 AS DOUBLE) / nd AS mean,
         sqrt(greatest(CAST(s2 AS DOUBLE) / nd
              - (CAST(s1 AS DOUBLE) / nd) * (CAST(s1 AS DOUBLE) / nd), 0.0)) AS std
  FROM d2 JOIN base USING (dow)
),
scored AS (
  SELECT day, dow, n,
         {_r6("mean")} AS mean_dow,
         {_r6("(CAST(n AS DOUBLE) - mean) / std")} AS z,
         {_r6("abs((CAST(n AS DOUBLE) - mean) / std)")} AS abs_z
  FROM j WHERE std > 0.0
),
page AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY abs_z DESC, day ASC) AS rnk
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rank, day, dow, n, mean_dow, z
FROM page WHERE rnk <= {ANOMALY_TOPK}"""


# ------------------------------------------------ partition-pruned source


def _partitioned_artifact(spark: SparkSession, sf_dir: str) -> str:
    """documents written ONCE per sf_dir as a lang-partitioned parquet
    layout (`lang=<v>/` directories — the Hive convention every lake
    layout at 100 TB leans on) via the atomic artifact protocol; rows
    re-sorted within the 2 files per partition so bytes are
    deterministic."""
    import hashlib

    from .queries_catalog import build_artifact_atomic

    key = f"{sf_dir.rstrip('/')}|part|v1"
    path = (
        "/tmp/sparksearch_part_"
        + hashlib.sha256(key.encode()).hexdigest()[:12]
    )

    def _build(tmp: str) -> None:
        (
            _docs(spark, sf_dir)
            .select("doc_id", "lang", "source", "n_chars", "text")
            .repartition(2, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.partitionBy("lang")
            .parquet(tmp)
        )

    build_artifact_atomic(path, "_SUCCESS", _build)
    return path


def q_docs_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over the lang-partitioned artifact: the
    lang filter resolves AT PLANNING TIME to directory pruning
    (PartitionFilters — no bytes of the other partitions are read; the
    plan pin lives in tests/test_round4_s11b), then one aggregate per
    source. The 100 TB story this entry certifies: layout-level pruning
    is the first and cheapest filter an engine has, and a catalog whose
    corpus scans can't prove it prunes would burn the cluster on
    untouched languages."""
    path = _partitioned_artifact(spark, sf_dir)
    src = spark.read.parquet(path).filter(F.col("lang") == "en")
    return src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # integer-valued exact sum -> plain BIGINT (driver discipline)
        F.sum(F.col("n_chars").cast("decimal(28,9)")).cast("long")
        .alias("chars"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
    )


PARTITION_PRUNED_SQL = """SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(n_chars AS DECIMAL(28,9))) AS BIGINT) AS chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM documents WHERE lang = 'en' GROUP BY 1"""


# ---------------------------------------------------------------- registry


def build_round4_s11b():
    from .queries_catalog import QuerySpec

    return {
        "axiomatic_f2log_topk": QuerySpec(
            q_axiomatic_f2log_topk,
            _axiomatic_sql(),
            "Lucene AxiomaticF2LOG similarity: qtf * ln((N+1)/df) * "
            "tf/(tf+s+s*dl/avgdl), s=0.5 — the axiomatic retrieval family "
            "via its log-idf variant (pure ln + rational ops, no "
            "cross-engine pow channel)",
        ),
        "dfr_inl2_topk": QuerySpec(
            q_dfr_inl2_topk,
            _dfr_sql(),
            "Lucene DFR I(n)L2 (BasicModelIn + AfterEffectL + H2, c=1): "
            "tfn = tf*log2(1+avgdl/dl), score = qtf*(tfn/(tfn+1))*"
            "log2((N+1)/(df+0.5)) — log2 as LN * shared 1/ln2 literal on "
            "both engines",
        ),
        "dfi_chi2_topk": QuerySpec(
            q_dfi_chi2_topk,
            _dfi_sql(),
            "Lucene DFI (divergence from independence, chi-squared): "
            "e = cf*dl/C, score = qtf*log2((tf-e)^2/e + 1) gated on "
            "tf > e — exact-integer inputs make the gate and expectation "
            "engine-identical; zero-score docs drop on both sides",
        ),
        "ib_ll_topk": QuerySpec(
            q_ib_ll_topk,
            _ib_sql(),
            "Lucene IB (information-based, DistributionLL + LambdaTTF + "
            "H2): lambda = (cf+1)/(N+1), tfn = tf*log2(1+avgdl/dl), "
            "score = qtf*log2((tfn+lambda)/lambda) — completes the "
            "Lucene similarity roster",
        ),
        "err_rank_eval": QuerySpec(
            q_err_rank_eval,
            _err_sql(),
            "ES _rank_eval expected_reciprocal_rank: cascade ERR@10 over "
            "the BM25 run with h60-graded qrels — exact BIGINT numerator "
            "(err * 2520*8^10; dyadic stop probabilities, lcm rank "
            "clearing), Spark integer fold vs DuckDB windowed product, "
            "one division + round6 at the end",
        ),
        "ann_radius_search": QuerySpec(
            q_ann_radius_search,
            _radius_sql(),
            "ES kNN radial search (similarity threshold, no k): every "
            "vector with round6(cosine) >= 0.3 per query — threshold "
            "compared on the QUANTIZED score so the boundary admits "
            "identical rows on both engines",
        ),
        "esql_lineitem_weighted": QuerySpec(
            q_esql_lineitem_weighted,
            ESQL_WEIGHTED_SQL,
            "ES|QL WEIGHTED_AVG aggregate (+ per-agg WHERE composition): "
            "exact decimal(28,9)x(9,0) numerator (38-cap safe, no scale "
            "drop), integer-weight denominator, one division — the "
            "language-level twin of the ES weighted_avg agg",
        ),
        "esql_events_sample": QuerySpec(
            q_esql_events_sample,
            ESQL_SAMPLE_SQL,
            "ES|QL SAMPLE command, deterministic dialect variant (seeded-"
            "hash policy): keep rows where h60(key) % 1e6 < p*1e6 — "
            "map-side, shuffle-free, stable under retries/repartitioning",
        ),
        "esql_orders_fork": QuerySpec(
            q_esql_orders_fork,
            ESQL_FORK_SQL,
            "ES|QL FORK command (8.19): two sub-pipelines from one scan, "
            "unioned with the _fork discriminator and null-filled missing "
            "columns (unionByName allowMissing) — depth-aware stage "
            "splitting keeps branch pipes inside their parens",
        ),
        "docs_partition_pruned": QuerySpec(
            q_docs_partition_pruned,
            PARTITION_PRUNED_SQL,
            "partition-pruned corpus scan: documents re-laid as a "
            "lang-partitioned parquet artifact (Hive layout), the lang "
            "filter resolves to directory pruning (PartitionFilters "
            "plan-pinned) - exact sums certify the pruned read equals "
            "the logical filter",
        ),
        "esql_docs_qstr": QuerySpec(
            q_esql_docs_qstr,
            ESQL_QSTR_SQL,
            "ES|QL QSTR (query_string) function: compile-time boolean "
            "mini-grammar (OR/AND/NOT/parens, OR default operator) over "
            "pinned-tokenizer term containment — completes the fulltext "
            "function pair beside MATCH; exact id_sum certifies the row "
            "set",
        ),
        "esql_orders_dates": QuerySpec(
            q_esql_orders_dates,
            ESQL_DATES_SQL,
            "ES|QL DATE_TRUNC (ISO-string rendering - native date_trunc "
            "reopens the week-boundary engine divergence) + DATE_DIFF "
            "(floor-both-sides epoch discipline) composed with a no-BY "
            "INLINESTATS MAX broadcast - per-month recency ages, exact "
            "integers",
        ),
        "events_anomaly_days": QuerySpec(
            q_events_anomaly_days,
            _anomaly_sql(),
            "deterministic anomaly report (the ES ML bucket surface, "
            "exactly): day-of-week seasonal baseline from exact BIGINT "
            "moments, z = (count - mean_dow)/sigma_dow, top-|z| days on "
            "the round6 key; constant dows drop on both sides",
        ),
        "esql_events_stddev": QuerySpec(
            q_esql_events_stddev,
            ESQL_STDDEV_SQL,
            "ES|QL STD_DEV aggregate (+ per-agg WHERE): exact "
            "decimal(18,6) moments with DECIMAL-side squaring (the "
            "extended_stats wide-cast sharp edge sidestepped), pinned "
            "S2/n - m*m op order, population sigma",
        ),
        "esql_events_change_point": QuerySpec(
            q_esql_events_change_point,
            ESQL_CHANGE_POINT_SQL,
            "ES|QL CHANGE_POINT command: deterministic mean-shift argmax "
            "over the piped daily counts (sparse frame - ES's contract; "
            "the agg entry's dense-grid variant stands beside it), exact "
            "BIGINT cross-products, round6 ratio rank",
        ),
        "span_or_topk": QuerySpec(
            q_span_or_topk,
            _span_or_sql(),
            "Lucene SpanNear(SpanOr(a,b), c): the OR leg's positions are "
            "the sorted union of both terms' lists; each with a "
            "reachable c within slop counts one span — completes the "
            "span composition family (near/first/not/containing/within/"
            "or); exact integer counts, brute EXISTS oracle",
        ),
        "esql_lineitem_mv": QuerySpec(
            q_esql_lineitem_mv,
            ESQL_MV_SQL,
            "ES|QL MV_* family completion: SORT/SLICE/DEDUPE/FIRST/LAST/"
            "REVERSE/APPEND/ZIP/AVG over VALUES multivalues — MV_AVG "
            "keeps the exact-decimal-fold discipline, MV_DEDUPE pins "
            "sorted output, MV_ZIP concat_ws null-pad matches ES's "
            "longer-array contract",
        ),
        "span_within_topk": QuerySpec(
            q_span_within_topk,
            _span_within_sql(),
            "Lucene SpanWithinQuery: little-term occurrences INSIDE some "
            "minimal ordered (a,b) big span — the exact dual of "
            "span_containing (counts little positions, each once); "
            "exploded-struct span materialization, brute EXISTS oracle",
        ),
        "bpe_encode_counts": QuerySpec(
            q_bpe_encode_counts,
            _bpe_encode_sql(),
            "BPE encoding with the trained merge table: word-frequency "
            "pass + 8-literal-replace merge chain in one projection "
            "(plain replace = greedy non-overlapping merge under the "
            "'|sym||sym|' rendering), weighted symbol counts, top-20 — "
            "oracle extends the unrolled training CTE chain",
        ),
    }
