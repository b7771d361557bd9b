"""Round-5 catalog entries.

ES|QL ENRICH with the RANGE match type (round-4 verdict item #6): the one
absent ES|QL command whose physical shape — a broadcast LEFT interval join —
LOOKUP JOIN's equi-key cannot express. The engine already had the interval
primitives (events_asof_join, eql_sequence); this entry pins the language
surface over them.

Session-1 additions beyond the verdict list: Lucene TermRangeQuery over the
sorted-dictionary sidecar, ES field collapsing, ES|QL ROW + wildcard KEEP,
and curriculum ordering for the training-data pipeline.

Output discipline: no DECIMAL columns (round-5 invariant) — the language's
exact sums descale to BIGINT cents via queries_catalog._descale_long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: the pinned value-tier enrich policy: disjoint [lo, hi) ranges (the range
#: field's gte/lt convention). Values below 0.05 match nothing — the
#: LEFT-join NULL-tier group is part of the pinned contract.
VALUE_TIERS: list[tuple[float, float, str, int]] = [
    (0.05, 10.0, "micro", 1),
    (10.0, 50.0, "small", 2),
    (50.0, 150.0, "medium", 3),
    (150.0, 400.0, "large", 5),
    (400.0, 100000.0, "jumbo", 8),
]

ESQL_ENRICH_QUERY = """
FROM events
| ENRICH value_tiers ON value WITH tier, tier_boost
| EVAL boosted = ROUND(value * tier_boost, 6)
| STATS n = COUNT(*), sv = SUM(value), bs = SUM(boosted) BY tier
| SORT tier
"""


def _tiers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        VALUE_TIERS,
        "range_lo double, range_hi double, tier string, tier_boost int",
    )


def q_esql_events_enrich_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(
        ESQL_ENRICH_QUERY,
        tables={"value_tiers": _tiers_df(spark)},
        spark=spark,
        sf_dir=sf_dir,
    )
    # both sums sit on the 2-dp money grid (value is 2-dp; boost integer)
    df = _descale_long(df, "sv", "sv_e2", 2)
    return _descale_long(df, "bs", "bs_e2", 2)


def _enrich_sql() -> str:
    tiers = ",\n         ".join(
        f"({lo!r}, {hi!r}, '{t}', {b})" for lo, hi, t, b in VALUE_TIERS
    )
    return f"""WITH tiers(range_lo, range_hi, tier, tier_boost) AS (
  VALUES {tiers}
),
e AS (
  SELECT t.tier,
         value,
         CAST(ROUND(CAST(value * t.tier_boost AS DECIMAL(28,9)), 6) AS DOUBLE) AS boosted
  FROM events LEFT JOIN tiers t
    ON value >= t.range_lo AND value < t.range_hi
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS sv_e2,
       CAST(CAST(SUM(CAST(boosted AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS bs_e2
FROM e GROUP BY 1 ORDER BY tier"""


# --------------------------------------------- Lucene TermRangeQuery

#: pinned term-range query set: (query_id, lo, hi, includeLower,
#: includeUpper) — the TermRangeQuery constructor's knobs. Query 4 is the
#: degenerate single-term range; query 5 is empty (no vocabulary term in
#: [x, zzz]) and must yield zero rows on both engines.
TERM_RANGE_QUERIES: list[tuple[int, str, str, bool, bool]] = [
    (1, "h", "k", True, False),
    (2, "s", "t", True, True),
    (3, "batch", "data", True, True),
    (4, "merge", "merge", True, True),
    (5, "x", "zzz", True, True),
]


def q_bm25_topk_term_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .build import load_sorted_dictionary
    from .queries_catalog import K, _index_for, _round6, _stats_for
    from .querying import expand_term_range_indexed, score_logical

    tf_df, dl_df, ts, _ = _stats_for(spark, sf_dir)
    qterms = expand_term_range_indexed(
        spark, TERM_RANGE_QUERIES,
        load_sorted_dictionary(spark, _index_for(spark, sf_dir)),
    )
    df = score_logical(qterms, tf_df, dl_df, ts, k=K)
    return df.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _round6("score").alias("score"),
    )


def _term_range_sql() -> str:
    from .queries_catalog import BM25_SCORE_SQL, K, TOK_SQL

    rows = ", ".join(
        f"({i}, '{lo}', '{hi}', {str(li).lower()}, {str(ui).lower()})"
        for i, lo, hi, li, ui in TERM_RANGE_QUERIES
    )
    return f"""WITH {TOK_SQL.strip()},
rq(query_id, lo, hi, li, ui) AS (VALUES {rows}),
q AS (
  SELECT rq.query_id, t.term, 1 AS qtf
  FROM rq JOIN termstats t
    ON ((t.term > rq.lo) OR (rq.li AND t.term = rq.lo))
   AND ((t.term < rq.hi) OR (rq.ui AND t.term = rq.hi))
),
{BM25_SCORE_SQL.strip()}
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       doc_id, CAST(ROUND(CAST(score AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
FROM ranked WHERE rnk <= {K}"""


# --------------------------------------------------- ES field collapsing

#: how many collapsed groups each query's page returns (< |langs| so the
#: page cut is exercised).
COLLAPSE_K = 3


def bm25_collapse_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    docs: DataFrame,
    k: int = COLLAPSE_K,
) -> DataFrame:
    """ES search ``collapse`` (field collapsing) → DF[query_id, rank, lang,
    doc_id, score, n_group]: the result list keeps ONE representative per
    collapse-field value (here ``lang``) — the group's best-scoring doc
    under the engine total order — and groups rank by their
    representative's score; n_group is the collapsed hit count (the
    inner_hits cardinality).

    Plan: reuses score_all's broadcast-against-postings frame, one join to
    the forward index for the collapse field, then two windows — best-per-
    (query, field-value) and the page rank — both over frames bounded by
    |matching docs| and |field values|. Both rankings run on the QUANTIZED
    score (invariant #3)."""
    from .querying import score_all
    from .stats import round6

    scored = score_all(qterms, tf_df, dl_df, term_stats).join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "lang"),
        "doc_id",
    )
    scored = scored.select(
        "query_id", "lang", "doc_id", round6(F.col("score")).alias("score")
    )
    wg = Window.partitionBy("query_id", "lang").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    wn = Window.partitionBy("query_id", "lang")
    reps = (
        scored.withColumn("rn", F.row_number().over(wg))
        .withColumn("n_group", F.count(F.lit(1)).over(wn).cast("long"))
        .filter(F.col("rn") == 1)
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        reps.withColumn("rank", F.row_number().over(wk).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "rank", "lang", "doc_id", "score", "n_group",
        )
    )


def q_bm25_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _docs
    from .queries_catalog import _stats_for, parse_queries, reference_queries

    tf_df, dl_df, ts, _ = _stats_for(spark, sf_dir)
    qterms = parse_queries(spark, reference_queries())
    return bm25_collapse_topk(qterms, tf_df, dl_df, ts, _docs(spark, sf_dir))


def _collapse_sql() -> str:
    from .queries_catalog import BM25_SCORE_SQL, TOK_SQL, query_values_sql

    return f"""WITH {TOK_SQL.strip()},
{query_values_sql()},
{BM25_SCORE_SQL.strip()},
withlang AS (
  SELECT s.query_id, d.lang, s.doc_id,
         CAST(ROUND(CAST(s.score AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
  FROM scored s JOIN documents d ON s.doc_id = CAST(d.doc_id AS BIGINT)
),
grp AS (
  SELECT query_id, lang, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id, lang
           ORDER BY score DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY query_id, lang) AS n_group
  FROM withlang
),
rk AS (
  SELECT query_id, lang, doc_id, score, n_group,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY score DESC, doc_id ASC) AS rnk
  FROM grp WHERE rn = 1
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       lang, doc_id, score, CAST(n_group AS BIGINT) AS n_group
FROM rk WHERE rnk <= {COLLAPSE_K}"""


# ------------------------------------------------ ES|QL ROW + wildcards

ESQL_ROW_QUERY = """
ROW x = 1.5, y = 3, s = "spark sql engine"
| EVAL ratio = ROUND(x / y, 6),
       head5 = SUBSTRING(s, 1, 5),
       n_chars = LENGTH(s),
       shout = TO_UPPER(CONCAT(head5, "!"))
| KEEP ratio, hea*, n_chars, shout
"""

ESQL_KEEP_WILDCARD_QUERY = """
FROM events
| KEEP event_*, value
| STATS n = COUNT(*), ids = COUNT_DISTINCT(event_id), sv = SUM(value)
  BY event_type
| SORT event_type
"""


def q_esql_row_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_ROW_QUERY, spark=spark, sf_dir=sf_dir)


ESQL_ROW_SQL = """SELECT
  CAST(ROUND(CAST(1.5 / 3 AS DECIMAL(28,9)), 6) AS DOUBLE) AS ratio,
  substring('spark sql engine', 1, 5) AS head5,
  CAST(length('spark sql engine') AS BIGINT) AS n_chars,
  upper(substring('spark sql engine', 1, 5) || '!') AS shout"""


def q_esql_keep_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(ESQL_KEEP_WILDCARD_QUERY, spark=spark, sf_dir=sf_dir)
    return _descale_long(df, "sv", "sv_e2", 2)


ESQL_KEEP_WILDCARD_SQL = """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS ids,
  CAST(CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS sv_e2
FROM events GROUP BY 1 ORDER BY event_type"""


# ------------------------------------------------- curriculum ordering

#: number of curriculum phases (quality quartiles, highest first).
CURRICULUM_PHASES = 4


def curriculum_order(docs: DataFrame) -> DataFrame:
    """Curriculum ordering for LLM pretraining → DF[doc_id, phase,
    curriculum_rank, qscore]: documents bucketed into quality quartiles
    (phase 1 = cleanest, the anneal-on-quality recipe) and deterministically
    shuffled WITHIN each phase by a data-derived hash — the standard
    curriculum = sort-by-quality-then-shuffle-within-band construction,
    made reproducible (invariant #1: no rand()).

    Quality = the engine's text_quality heuristic (round6-quantized);
    token-less documents score NULL and are coalesced to −1 so they land
    in the last phase deterministically. NTILE over the (qscore DESC,
    doc_id ASC) total order is engine-identical given the identical order.

    Scale: the global NTILE window is fixture-exact; at 100 TB the phase
    boundaries come from stats.quantile_thresholds (the GK-sketch path
    user_rfm documents) and the rank from a per-phase shuffle key sort —
    the same contract, sketch-bucketed."""
    from .stats import round6
    from .textpipe import h60, text_quality

    q = text_quality(docs).select(
        "doc_id",
        F.coalesce(round6(F.col("quality_score")), F.lit(-1.0)).alias("qscore"),
    )
    wq = Window.orderBy(F.desc("qscore"), F.asc("doc_id"))
    phased = q.withColumn(
        "phase", F.ntile(CURRICULUM_PHASES).over(wq).cast("long")
    ).withColumn(
        "skey",
        h60(F.concat(F.lit("curriculum|"), F.col("doc_id").cast("string"))),
    )
    wr = Window.orderBy(F.asc("phase"), F.asc("skey"), F.asc("doc_id"))
    return phased.select(
        "doc_id",
        "phase",
        F.row_number().over(wr).cast("long").alias("curriculum_rank"),
        "qscore",
    )


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _docs

    return curriculum_order(_docs(spark, sf_dir))


def _curriculum_sql() -> str:
    # the quality CTEs are the text_quality oracle's, verbatim shape —
    # including the ROUND of the intermediate ratios BEFORE the score
    # formula (the engine rounds mean_token_len / stopword_ratio at 6dp
    # and scores on the rounded values).
    from .catalog_pipeline import _TS
    from .textpipe import EN_STOPWORDS

    sw = ", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))
    return f"""WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len({_TS}) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform({_TS}, x -> length(x))), 0) AS DOUBLE) AS sum_len,
         CAST(len(list_filter({_TS}, x -> x IN ({sw}))) AS BIGINT) AS sw
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         CAST(ROUND(CAST(sum_len / nullif(n_tokens, 0) AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_token_len,
         CAST(ROUND(CAST(sw / nullif(n_tokens, 0) AS DECIMAL(28,9)), 6) AS DOUBLE) AS stopword_ratio
  FROM base
),
scored AS (
  SELECT doc_id,
         COALESCE(CAST(ROUND(CAST(least(n_tokens / 100.0, 1.0) * 0.4
             + (1.0 - least(abs(mean_token_len - 5.0) / 5.0, 1.0)) * 0.3
             + least(stopword_ratio * 5.0, 1.0) * 0.3 AS DECIMAL(28,9)), 6) AS DOUBLE), -1.0) AS qscore
  FROM r
),
phased AS (
  SELECT doc_id, qscore,
         NTILE({CURRICULUM_PHASES}) OVER (ORDER BY qscore DESC, doc_id ASC) AS phase,
         ('0x' || substring(md5('curriculum|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS skey
  FROM scored
)
SELECT doc_id, CAST(phase AS BIGINT) AS phase,
       CAST(ROW_NUMBER() OVER (ORDER BY phase ASC, skey ASC, doc_id ASC) AS BIGINT) AS curriculum_rank,
       qscore
FROM phased"""


# --------------------------------------------- TSDB counter rate (resets)


def events_counter_rate(events: DataFrame) -> DataFrame:
    """ES TSDB ``rate`` aggregation on a counter field, reset-aware →
    DF[user_id, n_samples, n_resets, increase_e2, rate_per_hour]: the
    time-series-database contract where a counter only ever grows and a
    drop means the process restarted — the rate must sum POSITIVE deltas
    only (each reset forfeits the in-flight increment, Prometheus/ES
    semantics) over the series' observed time span.

    The fixture has no counter column, so one is synthesized from the data
    itself: per user, ordered by (ts, event_id) — a total order, event_id
    is unique — the counter is the running sum of 2-dp value CENTS that
    RESETS to zero at every 'error' event. The synthesis is itself a
    window cumsum; the rate recovers the increase via lag deltas. All
    counter math is exact BIGINT cents; the only double is the final
    rate division (one IEEE op, round6). Cost: two windows over the same
    (user_id × time) partition order — one hash partition by user, no
    joins; at any scale the state per key is one running sum."""
    from .stats import round6

    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("epoch"),
        cents.alias("cents"),
        # reset epoch groups: count of errors so far (inclusive) — the
        # counter restarts after each error event
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w).alias("era"),
    )
    we = Window.partitionBy("user_id", "era").orderBy("ts", "event_id")
    counter = c.select(
        "user_id", "ts", "event_id", "epoch", "era",
        F.sum(F.when(F.col("event_type") == "error", 0).otherwise(F.col("cents")))
        .over(we).alias("counter"),
    )
    d = counter.select(
        "user_id", "epoch", "counter",
        (F.col("counter") - F.lag("counter").over(w)).alias("delta"),
    )
    g = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long").alias("n_resets"),
        F.coalesce(
            F.sum(F.when(F.col("delta") > 0, F.col("delta"))), F.lit(0)
        ).cast("long").alias("increase_e2"),
        F.min("epoch").cast("long").alias("t0"),
        F.max("epoch").cast("long").alias("t1"),
    )
    return g.select(
        F.col("user_id").cast("long").alias("user_id"),
        "n_samples", "n_resets", "increase_e2",
        round6(
            F.when(
                F.col("t1") > F.col("t0"),
                F.col("increase_e2") / ((F.col("t1") - F.col("t0")) / F.lit(3600.0)) / F.lit(100.0),
            )
        ).alias("rate_per_hour"),
    )


def q_events_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _t

    return events_counter_rate(_t(spark, sf_dir, "events"))


COUNTER_RATE_SQL = """WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
         CAST(round(value * 100) AS BIGINT) AS cents,
         event_type,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS era
  FROM events
),
ctr AS (
  SELECT user_id, ts, event_id, epoch, era,
         SUM(CASE WHEN event_type = 'error' THEN 0 ELSE cents END)
           OVER (PARTITION BY user_id, era ORDER BY ts, event_id) AS counter
  FROM c
),
d AS (
  SELECT user_id, epoch, counter,
         counter - lag(counter) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM ctr
),
g AS (
  SELECT user_id, COUNT(*) AS n_samples,
         SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS n_resets,
         COALESCE(SUM(CASE WHEN delta > 0 THEN delta END), 0) AS increase_e2,
         MIN(epoch) AS t0, MAX(epoch) AS t1
  FROM d GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(n_resets AS BIGINT) AS n_resets,
       CAST(increase_e2 AS BIGINT) AS increase_e2,
       CAST(ROUND(CAST(CASE WHEN t1 > t0
            THEN CAST(increase_e2 AS DOUBLE) / ((t1 - t0) / 3600.0) / 100.0
            END AS DECIMAL(28,9)), 6) AS DOUBLE) AS rate_per_hour
FROM g"""


# ---------------------------------------------------- ES|QL FORK | FUSE

ESQL_FUSE_QUERY = """
FROM events
| FORK (STATS sv = SUM(value) BY user_id | SORT sv DESC, user_id ASC | LIMIT 20)
       (STATS n = COUNT(*) BY user_id | SORT n DESC, user_id ASC | LIMIT 20)
| FUSE user_id
| SORT fuse_score DESC, user_id ASC
| LIMIT 15
"""


def q_esql_fork_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_FUSE_QUERY, spark=spark, sf_dir=sf_dir)


ESQL_FUSE_SQL = """WITH s1 AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(28,9))) AS sv FROM events GROUP BY 1
),
b1 AS (
  SELECT user_id, ROW_NUMBER() OVER (ORDER BY sv DESC, user_id ASC) AS r1 FROM s1
),
t1 AS (SELECT user_id, r1 FROM b1 WHERE r1 <= 20),
s2 AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
b2 AS (
  SELECT user_id, ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS r2 FROM s2
),
t2 AS (SELECT user_id, r2 FROM b2 WHERE r2 <= 20),
m AS (
  SELECT COALESCE(t1.user_id, t2.user_id) AS user_id, r1, r2
  FROM t1 FULL OUTER JOIN t2 ON t1.user_id = t2.user_id
),
f AS (
  SELECT user_id,
         CAST(ROUND(CAST(COALESCE(1.0 / (60 + r1), 0.0)
              + COALESCE(1.0 / (60 + r2), 0.0) AS DECIMAL(28,9)), 6) AS DOUBLE) AS fuse_score,
         CAST((CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_sets
  FROM m
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY fuse_score DESC, user_id ASC) AS rnk FROM f
)
SELECT CAST(user_id AS BIGINT) AS user_id, fuse_score, n_sets
FROM r WHERE rnk <= 15"""


# -------------------------------------------- cascaded quantization ANN

TS_SHORTLIST1 = 100  # stage-1 BBQ hamming candidates
TS_SHORTLIST2 = 25   # stage-2 SQ8 survivors
TS_NQ = 5            # query set = vec_id < TS_NQ (the cosine_topk contract)
TS_K = 10


def ann_two_stage_topk(embeddings: DataFrame) -> DataFrame:
    """Cascaded-quantization ANN (the ES 9 / Lucene default retrieval
    pipeline: BBQ candidates → int8 rescore → float rescore) →
    DF[query_id, rank, vec_id, hamming, sq8_score, score]:

      1. sign-bit BBQ shortlist — {TS_SHORTLIST1} lowest-Hamming
         candidates per query on 2×32-bit packed words (16 bytes/vector
         scanned);
      2. SQ8 asymmetric rescore — full-precision query vs per-dim affine
         dequantization, keep {TS_SHORTLIST2} by (round6 DESC, vec_id
         ASC) (1 byte/dim fetched);
      3. exact float cosine over the survivors, top-{TS_K} under the
         engine total order.

    Each stage reads strictly less data per candidate than the next pays
    per survivor — the oversample→rescore cascade ES exposes as
    ``rescore_vector.oversample``. Composes the BBQ packing and SQ8
    quantizer verbatim (one encoded frame carries words + dequantized
    vectors; persisted — multi-consumer + the projection-collapse sharp
    edge). All three cut boundaries are on quantized/integer keys, so
    the cascade is engine-exact end to end."""
    from .stats import round6
    from .vectors import SQ_LEVELS, _bbq_words, _vecs, cosine, sq8_params

    vecs = _vecs(embeddings)
    params = sq8_params(embeddings)
    lv = float(SQ_LEVELS)
    codes = F.zip_with(
        F.zip_with(F.col("v"), F.col("mins"), lambda x, m: x - m),
        F.col("spans"),
        lambda d, s: F.when(s > 0, F.floor(d * lv / s + 0.5)).otherwise(F.lit(0)),
    )
    w0, w1 = _bbq_words(F.col("v"))
    enc = (
        vecs.crossJoin(F.broadcast(params))
        .select(
            "vec_id", "v", codes.alias("q8"), "mins", "spans",
            w0.alias("w0"), w1.alias("w1"),
        )
        .select(
            "vec_id", "v", "w0", "w1",
            F.zip_with(
                F.zip_with(F.col("q8"), F.col("spans"), lambda q, s: q * s / lv),
                F.col("mins"),
                lambda d, m: m + d,
            ).alias("xh"),
        )
        .persist()
    )
    enc.count()
    queries = enc.filter(F.col("vec_id") < TS_NQ).select(
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
        enc.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v", "xh", "qv", ham.alias("hamming"))
    )
    w_h = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    s1 = cand.withColumn("hr", F.row_number().over(w_h)).filter(
        F.col("hr") <= TS_SHORTLIST1
    )
    s2 = s1.select(
        "query_id", "vec_id", "v", "qv", "hamming",
        round6(cosine(F.col("xh"), F.col("qv"))).alias("sq8_score"),
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("sq8_score"), F.asc("vec_id")
    )
    s2 = s2.withColumn("qr", F.row_number().over(w_q)).filter(
        F.col("qr") <= TS_SHORTLIST2
    )
    s3 = s2.select(
        "query_id", "vec_id", "hamming", "sq8_score",
        round6(cosine(F.col("v"), F.col("qv"))).alias("score"),
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        s3.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= TS_K)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "vec_id", "hamming", "sq8_score", "score",
        )
        .persist()
    )
    out.count()
    enc.unpersist()
    return out


def q_ann_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _emb

    return ann_two_stage_topk(_emb(spark, sf_dir))


def _two_stage_sql() -> str:
    from .catalog_pipeline import EMB_SQL, _r6
    from .vectors import SQ_LEVELS, bbq_word_sql as word

    lv = float(SQ_LEVELS)

    cos_q = ("list_dot_product(xh, qv) / "
             "(sqrt(list_dot_product(xh, xh)) * sqrt(list_dot_product(qv, qv)))")
    cos_x = ("list_dot_product(v, qv) / "
             "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))")
    return f"""WITH {EMB_SQL.strip()},
d1 AS (SELECT vec_id, v, unnest(generate_series(1, len(v))) AS pos FROM e),
dimx AS (SELECT vec_id, pos, v[pos] AS x FROM d1),
pm AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM dimx GROUP BY 1),
prm AS (SELECT list(mn ORDER BY pos) AS mins, list(mx - mn ORDER BY pos) AS spans FROM pm),
enc AS (
  SELECT vec_id, v,
         CAST({word(0)} AS BIGINT) AS w0, CAST({word(1)} AS BIGINT) AS w1,
         list_transform(generate_series(1, len(v)),
           j -> mins[j] + (CASE WHEN spans[j] > 0
                           THEN floor((v[j] - mins[j]) * {lv} / spans[j] + 0.5)
                           ELSE 0 END) * spans[j] / {lv}) AS xh
  FROM e, prm
),
q AS (
  SELECT vec_id AS query_id, v AS qv, w0 AS q0, w1 AS q1
  FROM enc WHERE vec_id < {TS_NQ}
),
cand AS (
  SELECT q.query_id, p.vec_id, p.v, p.xh, q.qv,
         CAST(bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) AS BIGINT) AS hamming
  FROM enc p, q WHERE p.vec_id <> q.query_id
),
s1 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY hamming ASC, vec_id ASC) AS hr
    FROM cand
  ) WHERE hr <= {TS_SHORTLIST1}
),
s2 AS (
  SELECT * FROM (
    SELECT query_id, vec_id, v, qv, hamming,
           {_r6(cos_q)} AS sq8_score,
           ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY {_r6(cos_q)} DESC, vec_id ASC) AS qr
    FROM s1
  ) WHERE qr <= {TS_SHORTLIST2}
),
s3 AS (
  SELECT query_id, vec_id, hamming, sq8_score, {_r6(cos_x)} AS score,
         ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY {_r6(cos_x)} DESC, vec_id ASC) AS rnk
  FROM s2
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, hamming, sq8_score, score
FROM s3 WHERE rnk <= {TS_K}"""


# ----------------------------------------------- percolator, range clauses

#: stored alert queries: (query_id, event_type-or-None, lo, hi) — matches
#: events with (type == et OR et wildcard) AND lo <= value < hi. Query 5
#: is an inverted (empty) range and must match nothing.
PERC_RANGE_QUERIES: list[tuple[int, str | None, float, float]] = [
    (1, "purchase", 400.0, 1e9),
    (2, None, 0.0, 0.05),
    (3, "error", 200.0, 1e9),
    (4, "view", 250.0, 260.0),
    (5, "click", 500.0, 400.0),
]


def q_percolate_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator with RANGE clauses → DF[query_id, event_id]: the
    numeric companion of percolate_queries (term-only percolation) —
    stored alert queries carry a type clause plus a half-open [lo, hi)
    value range, and every arriving event is matched against ALL stored
    queries. The query table broadcasts (percolator indexes are small by
    contract) and the match is a map-side theta join — no shuffle of the
    event stream, the alerting shape at any throughput."""
    from .catalog_pipeline import _t

    q = spark.createDataFrame(
        PERC_RANGE_QUERIES,
        "query_id long, et string, lo double, hi double",
    )
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    cond = (
        (F.col("et").isNull() | (F.col("event_type") == F.col("et")))
        & (F.col("value") >= F.col("lo"))
        & (F.col("value") < F.col("hi"))
    )
    return ev.crossJoin(F.broadcast(q)).filter(cond).select(
        "query_id", F.col("event_id").cast("long").alias("event_id")
    )


def _percolate_range_sql() -> str:
    rows = ", ".join(
        f"({i}, {('NULL' if et is None else repr(et))}, {lo!r}, {hi!r})"
        for i, et, lo, hi in PERC_RANGE_QUERIES
    )
    return f"""WITH q(query_id, et, lo, hi) AS (VALUES {rows})
SELECT CAST(q.query_id AS BIGINT) AS query_id,
       CAST(e.event_id AS BIGINT) AS event_id
FROM events e JOIN q
  ON (q.et IS NULL OR e.event_type = q.et)
 AND e.value >= q.lo AND e.value < q.hi"""


# ------------------------------------- ES|QL CATEGORIZE + partitioned terms

ESQL_CATEGORIZE_QUERY = """
FROM documents
| EVAL cat = CATEGORIZE(text)
| STATS n = COUNT(*), example_doc_id = MIN(doc_id) BY cat
| SORT cat
"""


def q_esql_docs_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_CATEGORIZE_QUERY, spark=spark, sf_dir=sf_dir)


ESQL_CATEGORIZE_SQL = """WITH c AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         array_to_string(
           list_transform(
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                         x -> x <> '')[1:4],
             x -> regexp_replace(x, '[0-9]+', '#', 'g')),
           ' ') AS cat
  FROM documents
)
SELECT cat, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(doc_id) AS BIGINT) AS example_doc_id
FROM c GROUP BY 1 ORDER BY cat"""


#: ES terms-agg partitioning knobs (include.partition / num_partitions):
#: deterministic h60 dealing replaces ES's internal hash.
TERMS_PARTITION = 2
TERMS_NUM_PARTITIONS = 8


def q_terms_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation with include-partitioning (the documented
    way to page a huge-cardinality terms agg: each request processes
    partition i of n, terms dealt by hash) → DF[term, df, cf]: the
    vocabulary slice whose h60(term) lands in partition 2 of 8 — h60 is
    the deterministic stand-in for ES's internal term hash. The scan is
    vocab-sized; at any corpus scale the partition gate is a map-side
    filter on the already-aggregated term stats."""
    from .queries_catalog import _stats_for
    from .textpipe import h60

    _, _, ts, _ = _stats_for(spark, sf_dir)
    return (
        ts.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
        )
        .filter(
            F.pmod(h60(F.col("term")), F.lit(TERMS_NUM_PARTITIONS))
            == TERMS_PARTITION
        )
    )


def _terms_partitioned_sql() -> str:
    from .queries_catalog import TOK_SQL

    return f"""WITH {TOK_SQL.strip()}
SELECT term, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf
FROM termstats
WHERE ('0x' || substring(md5(term), 1, 15))::BIGINT % {TERMS_NUM_PARTITIONS}
      = {TERMS_PARTITION}"""


# --------------------------------------------- label-propagation communities

#: synchronous LPA rounds — PINNED (the oracle unrolls exactly this many;
#: determinism over convergence, the pagerank precedent).
LPA_ROUNDS = 4

#: relative edge gate: keep co-occurrence edges with weight ≥ max/20 —
#: a fixed count would pass everything or nothing as SF moves
#: (rare_terms precedent).
LPA_EDGE_DIV = 20


def term_communities(docs: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """Weighted label propagation (LPA) over the term co-occurrence graph
    → DF[term, community, n_members]: ``rounds`` SYNCHRONOUS rounds — each
    node adopts the label with the largest incident edge-weight sum, ties
    to the lexicographically smallest label — from self-labels, on the
    relative-gated top-vocabulary co-occurrence edges.

    The third graph algorithm beside connected_components (pointer
    jumping) and pagerank (decimal power steps): LPA finds denser-than-
    neighborhood clusters where CC finds reachability. Determinism:
    integer edge weights, (weight DESC, label ASC) argmax per node per
    round, a FIXED round count (plain LPA's convergence is order-
    dependent — the pinned unroll is the reproducible variant, the
    SAMPLE/variable-width-histogram precedent). Plan: each round is one
    vocab-sized join + grouped argmax window; at a 4-round pin no lineage
    checkpoint is needed (the connected_components discipline starts
    mattering at O(log n) variable rounds)."""
    from .textpipe import cooccurrence_edges

    edges = cooccurrence_edges(docs)
    mx = edges.agg(F.max("n_both").alias("mx"))
    e = (
        edges.crossJoin(F.broadcast(mx))
        .filter(F.col("n_both") * LPA_EDGE_DIV >= F.col("mx"))
        .select("term_a", "term_b", "n_both")
    )
    und = e.select(
        F.col("term_a").alias("node"), F.col("term_b").alias("nbr"), "n_both"
    ).unionByName(
        e.select(
            F.col("term_b").alias("node"), F.col("term_a").alias("nbr"), "n_both"
        )
    ).persist()
    labels = und.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    wv = Window.partitionBy("node").orderBy(F.desc("w"), F.asc("label"))
    for _ in range(rounds):
        nl = (
            und.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.sum("n_both").cast("long").alias("w"))
        )
        labels = (
            nl.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    out = labels.join(sizes, "label").select(
        F.col("node").alias("term"),
        F.col("label").alias("community"),
        "n_members",
    )
    und.unpersist()
    return out


def q_term_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _docs

    return term_communities(_docs(spark, sf_dir))


def _lpa_sql() -> str:
    # unrolled-round CTE oracle (the pagerank discipline): l0 = self
    # labels, each l{r} = the windowed weighted argmax over l{r-1}.
    rounds = []
    for r in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""nl{r} AS (
  SELECT u.node, l.label, SUM(u.n_both) AS w
  FROM und u JOIN l{r - 1} l ON u.nbr = l.node
  GROUP BY 1, 2
),
l{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY w DESC, label ASC) AS rn
    FROM nl{r}
  ) WHERE rn = 1
)""")
    return f"""WITH dt AS (
  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                            x -> x <> '')) AS term
  FROM documents
),
dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1),
vocab AS (
  SELECT term FROM (
    SELECT term, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rn FROM dfreq
  ) WHERE rn <= 32
),
dtv AS (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_both
  FROM dtv a JOIN dtv b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
),
mx AS (SELECT MAX(n_both) AS mx FROM pairs),
e AS (
  SELECT term_a, term_b, n_both FROM pairs, mx
  WHERE n_both * {LPA_EDGE_DIV} >= mx.mx
),
und AS (
  SELECT term_a AS node, term_b AS nbr, n_both FROM e
  UNION ALL
  SELECT term_b AS node, term_a AS nbr, n_both FROM e
),
l0 AS (SELECT DISTINCT node, node AS label FROM und),
{", ".join(rounds)},
sizes AS (SELECT label, COUNT(*) AS n_members FROM l{LPA_ROUNDS} GROUP BY 1)
SELECT l.node AS term, l.label AS community,
       CAST(s.n_members AS BIGINT) AS n_members
FROM l{LPA_ROUNDS} l JOIN sizes s USING (label)"""


# --------------------------------------------- HDR-histogram percentiles

#: HDR sub-bucket precision: 2 significant decimal digits → 2^7 = 128
#: sub-buckets (the smallest power of two ≥ 10^2), unit magnitude 0.
HDR_SUB_BITS = 7
HDR_PCTS = (50, 90, 99)


def lineitem_percentiles_hdr(lineitem: DataFrame) -> DataFrame:
    """ES percentiles with the HDR-histogram method (the TDigest
    alternative ES exposes via ``hdr.number_of_significant_value_digits``)
    → one-row DF[n, n_buckets, p50_e2, p90_e2, p99_e2]: l_extendedprice
    in exact integer CENTS bucketed by the HDR scheme — exponent
    e = max(0, bitlen(v) − {HDR_SUB_BITS}), sub-bucket v >> e — and each
    percentile reported as its bucket's HIGHEST equivalent value
    (((sub+1) << e) − 1, hdr's highestEquivalentValue), the ≤1%%
    relative-error contract of 2 significant digits.

    Everything is integer math: bitlen via length(bin(v)) (the HLL
    entry's engine-identical trick), the rank gate by exact
    cross-multiplication (cum·100 ≥ pct·n — no division), BIGINT outputs.
    One map-side bucket projection + a buckets-sized cumulative window —
    the sketch path's cost model at any corpus size (buckets are bounded
    by value RANGE, not row count)."""
    v = F.round(F.col("l_extendedprice") * 100).cast("long")
    b = lineitem.select(v.alias("v")).select(
        "v",
        F.greatest(
            F.length(F.bin(F.col("v"))) - F.lit(HDR_SUB_BITS), F.lit(0)
        ).cast("long").alias("e"),
    ).select(
        F.col("e"),
        # F.shiftright/shiftleft take only literal shift counts (the
        # round-4 s11 sharp edge) — the SQL forms accept a column
        F.expr("shiftright(v, cast(e as int))").alias("sub"),
    )
    g = b.groupBy("e", "sub").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    rep = (
        F.expr("shiftleft(sub + 1, cast(e as int))") - 1
    ).alias("rep")
    wc = Window.orderBy("rep").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(rep, "cnt").select(
        "rep", "cnt", F.sum("cnt").over(wc).cast("long").alias("cum")
    )
    tot = cum.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    joined = cum.crossJoin(F.broadcast(tot))
    aggs = [F.max("n").alias("n"), F.max("n_buckets").alias("n_buckets")]
    for p in HDR_PCTS:
        aggs.append(
            F.min(
                F.when(F.col("cum") * 100 >= F.lit(p) * F.col("n"), F.col("rep"))
            ).cast("long").alias(f"p{p}_e2")
        )
    return joined.agg(*aggs)


def q_lineitem_percentiles_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _t

    return lineitem_percentiles_hdr(_t(spark, sf_dir, "lineitem"))


def _hdr_sql() -> str:
    pcols = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum * 100 >= {p} * t.n THEN rep END) AS BIGINT) AS p{p}_e2"
        for p in HDR_PCTS
    )
    return f"""WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
),
b AS (
  SELECT v, greatest(length(bin(v)) - {HDR_SUB_BITS}, 0) AS e FROM v
),
g AS (
  SELECT e, (v >> e) AS sub, COUNT(*) AS cnt FROM b GROUP BY 1, 2
),
cum AS (
  SELECT (((sub + 1) << e) - 1) AS rep, cnt,
         SUM(cnt) OVER (ORDER BY (((sub + 1) << e) - 1)
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM g
),
t AS (SELECT SUM(cnt) AS n, COUNT(*) AS n_buckets FROM cum)
SELECT CAST(MAX(t.n) AS BIGINT) AS n,
       CAST(MAX(t.n_buckets) AS BIGINT) AS n_buckets,
       {pcols}
FROM cum, t"""


# ------------------------------------- ES significance heuristics roster

SIG_MIN_DF_FG = 5
SIG_K = 10


def significant_terms_modes(
    docs: DataFrame,
    tf_df: DataFrame,
    term_stats: DataFrame,
    stats: DataFrame,
    facet_col: str = "lang",
    min_df: int = SIG_MIN_DF_FG,
    k: int = SIG_K,
) -> DataFrame:
    """ES significant_terms significance heuristics, the full roster →
    DF[facet, rank, term, df_fg, jlh, chi2, mi, gnd]: per facet-value
    foreground, each candidate term scored by ES's four builtin
    heuristics — JLH, chi_square, mutual_information and
    google_normalized_distance — over the 2×2 contingency (ES's default
    SUPERSET counting: the background includes the foreground).

    Cells from exact integer counts: a = df_fg, row = df_bg, col = n_fg,
    T = N; b = row−a, c = col−a, d = T−col−b. Float discipline: every
    score is a PINNED IEEE op sequence over exact-integer-valued doubles
    (products < 2^53), LN mirrored verbatim (the PMI/DFR precedent —
    log2 = LN × the repr-shared 1/ln2 literal), chi² divides by each
    marginal SEQUENTIALLY (never forms the 4-way product, which would
    overflow), MI sums its four cell terms as a fixed chain (never a
    float agg). Undefined statistics go NULL on both engines: chi²
    whenever a COMPLEMENT marginal is zero (a term in every document, or
    a facet equal to the corpus); GND only when ln T equals the SMALLER
    marginal ln — both marginals at T (a term in every document alone
    leaves GND defined: (lnT − ln a)/(lnT − ln col)). round6 outputs;
    rank = (round6(jlh) DESC, term ASC) per facet, top-k.

    Plan: one postings⋈forward-index join into a map-combinable
    (facet, term) count; marginals broadcast onto the facets×vocab frame
    — the significant_terms entry's scale shape, reused."""
    from .catalog_s11b import INV_LN2
    from .stats import round6

    fg = (
        tf_df.select("doc_id", "term")
        .join(docs.select("doc_id", F.col(facet_col).alias("facet")), "doc_id")
        .groupBy("facet", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .filter(F.col("a") >= min_df)
    )
    n_fg = docs.groupBy(F.col(facet_col).alias("facet")).agg(
        F.count(F.lit(1)).cast("long").alias("col")
    )
    cells = (
        fg.join(F.broadcast(n_fg), "facet")
        .join(
            F.broadcast(term_stats.select("term", F.col("df").cast("long").alias("row"))),
            "term",
        )
        .crossJoin(F.broadcast(stats.select(F.col("n_docs").cast("long").alias("t"))))
        .select(
            "facet", "term", "a", "row", "col", "t",
            (F.col("row") - F.col("a")).alias("b"),
            (F.col("col") - F.col("a")).alias("c"),
            (F.col("t") - F.col("col") - (F.col("row") - F.col("a"))).alias("d"),
        )
    )
    ad, bd, cd, dd = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    rowd, cold, td = (F.col(x).cast("double") for x in ("row", "col", "t"))
    fgp = ad / cold
    bgp = rowd / td
    jlh = (fgp - bgp) * (fgp / bgp)
    x = (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    # nullif the complement marginals: a term present in EVERY document
    # (or a facet equal to the whole corpus) zeroes a marginal and chi²
    # is undefined (0/0 → NaN, which ANSI decimal casts reject) — NULL
    # on both engines instead.
    chi2 = (
        x * x * td / (rowd) / F.nullif(td - rowd, F.lit(0.0))
        / (cold) / F.nullif(td - cold, F.lit(0.0))
    )
    inv = F.lit(INV_LN2)

    def mi_cell(n, rw, cl):
        return F.when(
            n > 0,
            (n / td) * (F.log((n * td) / (rw * cl)) * inv),
        ).otherwise(F.lit(0.0))

    mi = (
        (
            mi_cell(ad, rowd, cold) + mi_cell(bd, rowd, td - cold)
        )
        + mi_cell(cd, td - rowd, cold)
    ) + mi_cell(dd, td - rowd, td - cold)
    l_row, l_col, l_a, l_t = (
        F.log(rowd), F.log(cold), F.log(ad), F.log(td)
    )
    gnd = (F.greatest(l_row, l_col) - l_a) / F.nullif(
        l_t - F.least(l_row, l_col), F.lit(0.0)
    )
    scored = cells.select(
        "facet", "term", F.col("a").alias("df_fg"),
        round6(jlh).alias("jlh"),
        round6(chi2).alias("chi2"),
        round6(mi).alias("mi"),
        round6(gnd).alias("gnd"),
    )
    w = Window.partitionBy("facet").orderBy(F.desc("jlh"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("facet", "rank", "term", "df_fg", "jlh", "chi2", "mi", "gnd")
    )


def q_significant_terms_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _docs
    from .queries_catalog import _stats_for

    tf_df, dl_df, ts, stats = _stats_for(spark, sf_dir)
    return significant_terms_modes(
        _docs(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "lang"
        ),
        tf_df, ts, stats,
    )


def _sig_modes_sql() -> str:
    from .catalog_s11b import INV_LN2
    from .queries_catalog import TOK_SQL

    mi_cell = (
        "(CASE WHEN {n} > 0 THEN ({n} / td) * (LN(({n} * td) / ({rw} * {cl}))"
        f" * {INV_LN2!r}) ELSE 0.0 END)"
    )
    cells = [
        mi_cell.format(n="ad", rw="rowd", cl="cold"),
        mi_cell.format(n="bd", rw="rowd", cl="(td - cold)"),
        mi_cell.format(n="cd", rw="(td - rowd)", cl="cold"),
        mi_cell.format(n="dd", rw="(td - rowd)", cl="(td - cold)"),
    ]
    mi = f"((({cells[0]} + {cells[1]}) + {cells[2]}) + {cells[3]})"
    return f"""WITH {TOK_SQL.strip()},
fg AS (
  SELECT d.lang AS facet, p.term, COUNT(*) AS a
  FROM postings p JOIN documents d ON p.doc_id = CAST(d.doc_id AS BIGINT)
  GROUP BY 1, 2 HAVING COUNT(*) >= {SIG_MIN_DF_FG}
),
nfg AS (SELECT lang AS facet, COUNT(*) AS col FROM documents GROUP BY 1),
cell AS (
  SELECT fg.facet, fg.term, fg.a, t.df AS row, nfg.col,
         (SELECT CAST(n_docs AS BIGINT) FROM gstats) AS t,
         t.df - fg.a AS b, nfg.col - fg.a AS c,
         (SELECT CAST(n_docs AS BIGINT) FROM gstats) - nfg.col - (t.df - fg.a) AS d
  FROM fg JOIN nfg USING (facet) JOIN termstats t USING (term)
),
dbl AS (
  SELECT facet, term, a,
         CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
         CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd,
         CAST(row AS DOUBLE) AS rowd, CAST(col AS DOUBLE) AS cold,
         CAST(t AS DOUBLE) AS td,
         CAST(a * d - b * c AS DOUBLE) AS x
  FROM cell
),
scored AS (
  SELECT facet, term, CAST(a AS BIGINT) AS df_fg,
         CAST(ROUND(CAST(((ad / cold) - (rowd / td)) * ((ad / cold) / (rowd / td)) AS DECIMAL(28,9)), 6) AS DOUBLE) AS jlh,
         CAST(ROUND(CAST(x * x * td / (rowd) / nullif(td - rowd, 0.0) / (cold) / nullif(td - cold, 0.0) AS DECIMAL(28,9)), 6) AS DOUBLE) AS chi2,
         CAST(ROUND(CAST({mi} AS DECIMAL(28,9)), 6) AS DOUBLE) AS mi,
         CAST(ROUND(CAST((greatest(LN(rowd), LN(cold)) - LN(ad))
              / nullif(LN(td) - least(LN(rowd), LN(cold)), 0.0) AS DECIMAL(28,9)), 6) AS DOUBLE) AS gnd
  FROM dbl
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY facet ORDER BY jlh DESC, term ASC) AS rnk
  FROM scored
)
SELECT facet, CAST(rnk AS BIGINT) AS rank, term, df_fg, jlh, chi2, mi, gnd
FROM r WHERE rnk <= {SIG_K}"""


# ----------------------------------------------- training shard assignment

#: number of training shards documents are dealt into.
N_TRAINING_SHARDS = 8


def training_shards(docs: DataFrame, n_shards: int = N_TRAINING_SHARDS) -> DataFrame:
    """Deterministic training-shard assignment + balance report →
    DF[shard, n_docs, n_tokens, n_chars, min_doc, max_doc]: every document
    deals into one of ``n_shards`` shards by a data-derived hash (h60 —
    invariant #1: rebuildable, no rand()), the layout a distributed
    pretraining job reads (one shard per data-parallel worker group).

    The report certifies what shard layouts must certify: coverage
    (Σ n_docs = |corpus|), balance (hash dealing → near-uniform), and the
    per-shard token budget (the number that actually schedules training).
    One map-side projection + one n_shards-sized group-by; token counts
    ride the pinned tokenizer."""
    from .textpipe import h60
    from .tokenize import tokens_col

    shard = F.pmod(
        h60(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))),
        F.lit(n_shards),
    ).cast("long")
    return (
        docs.select(
            shard.alias("shard"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(tokens_col(F.col("text"))).cast("long").alias("nt"),
            F.length("text").cast("long").alias("nc"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("nc").cast("long").alias("n_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog_pipeline import _docs

    return training_shards(_docs(spark, sf_dir))


def _training_shards_sql() -> str:
    from .catalog_pipeline import _TS

    return f"""WITH a AS (
  SELECT ('0x' || substring(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {N_TRAINING_SHARDS} AS shard,
         CAST(doc_id AS BIGINT) AS doc_id,
         len({_TS}) AS nt,
         length(text) AS nc
  FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens, CAST(SUM(nc) AS BIGINT) AS n_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM a GROUP BY 1"""


def build_round5():
    from .queries_catalog import QuerySpec

    return {
        "esql_events_enrich_range": QuerySpec(
            q_esql_events_enrich_range,
            _enrich_sql(),
            "ES|QL ENRICH with the range match type: the [range_lo, "
            "range_hi) policy table broadcast-LEFT-interval-joins onto the "
            "piped frame (the physical shape LOOKUP JOIN cannot express), "
            "composed with EVAL on the enriched columns and the exact-sum "
            "STATS discipline; values below every range pin the NULL-tier "
            "group",
        ),
        "bm25_topk_term_range": QuerySpec(
            q_bm25_topk_term_range,
            _term_range_sql(),
            "Lucene TermRangeQuery: lexicographic [lo, hi] vocabulary "
            "ranges (per-query includeLower/includeUpper) expanded over "
            "the term-sorted dictionary sidecar — the literal range OR is "
            "a pushed filter on the sorted scan (Lucene's terms-dict "
            "seek); includes a degenerate single-term range and an empty "
            "range that must yield zero rows",
        ),
        "bm25_collapse_topk": QuerySpec(
            q_bm25_collapse,
            _collapse_sql(),
            "ES field collapsing: one representative (best-scoring doc) "
            "per lang per query, groups ranked by their representative "
            "under the engine total order, n_group = the inner_hits "
            "cardinality — reuses score_all's broadcast-against-postings "
            "frame plus one forward-index join",
        ),
        "esql_row_eval": QuerySpec(
            q_esql_row_eval,
            ESQL_ROW_SQL,
            "ES|QL ROW: the literal one-row pipeline seed, composed with "
            "EVAL scalar functions and a wildcard KEEP (hea*) — the "
            "language's constant-expression surface certified end-to-end",
        ),
        "esql_keep_wildcard": QuerySpec(
            q_esql_keep_wildcard,
            ESQL_KEEP_WILDCARD_SQL,
            "ES|QL wildcard projections: KEEP event_*, value expands "
            "against the frame's columns at compile time (first-match "
            "order, duplicates dropped) before the exact-sum STATS",
        ),
        "curriculum_order": QuerySpec(
            q_curriculum_order,
            _curriculum_sql(),
            "curriculum ordering for pretraining: quality quartiles "
            "(phase 1 = cleanest) with a deterministic h60 shuffle within "
            "each phase — sort-by-quality-then-shuffle-within-band, "
            "reproducible (no rand()); token-less docs coalesce to the "
            "last phase",
        ),
        "events_counter_rate": QuerySpec(
            q_events_counter_rate,
            COUNTER_RATE_SQL,
            "ES TSDB rate on a counter field, reset-aware: positive-delta "
            "sums over a per-user synthesized counter (cumulative cents "
            "that reset at error events) — exact BIGINT counter math, "
            "resets forfeit in-flight increments (Prometheus semantics), "
            "one round6 division for the per-hour rate",
        ),
        "ann_two_stage": QuerySpec(
            q_ann_two_stage,
            _two_stage_sql(),
            "cascaded-quantization ANN (the ES 9 / Lucene default "
            "pipeline): BBQ sign-bit hamming shortlist (100) -> SQ8 "
            "asymmetric rescore (25) -> exact float cosine top-10 — the "
            "oversample/rescore cascade with every cut on quantized or "
            "integer keys, engine-exact end to end",
        ),
        "percolate_range": QuerySpec(
            q_percolate_range,
            _percolate_range_sql(),
            "ES percolator with range clauses: stored alert queries "
            "(type + half-open value range, NULL type = wildcard) "
            "broadcast against arriving events as a map-side theta join "
            "— the numeric companion of percolate_queries; an inverted "
            "range matches nothing",
        ),
        "esql_docs_categorize": QuerySpec(
            q_esql_docs_categorize,
            ESQL_CATEGORIZE_SQL,
            "ES|QL CATEGORIZE (8.18): the categorize_text template key "
            "lifted into the language (4-token digit-masked prefix), "
            "composed through EVAL + STATS BY — DuckDB twin needs the "
            "'g' regexp flag (Spark replaces globally by default)",
        ),
        "terms_partitioned": QuerySpec(
            q_terms_partitioned,
            _terms_partitioned_sql(),
            "ES terms agg include-partitioning: partition 2 of 8 of the "
            "vocabulary by h60 (the deterministic stand-in for ES's "
            "internal term hash) — how a huge-cardinality terms agg is "
            "paged; map-side gate on aggregated term stats",
        ),
        "term_communities": QuerySpec(
            q_term_communities,
            _lpa_sql(),
            "weighted label propagation over the term co-occurrence graph "
            "(the third graph algorithm beside CC and pagerank): 4 pinned "
            "synchronous rounds, (weight DESC, label ASC) argmax, "
            "relative-gated edges — the oracle unrolls every round as "
            "CTEs (the pagerank discipline)",
        ),
        "lineitem_percentiles_hdr": QuerySpec(
            q_lineitem_percentiles_hdr,
            _hdr_sql(),
            "ES percentiles, HDR-histogram method: integer-cents HDR "
            "bucketing (bitlen exponent + 128 sub-buckets = 2 significant "
            "digits), percentile = the bucket's highest equivalent value, "
            "rank gate by exact cross-multiplication — all-BIGINT sketch "
            "percentiles beside the engine's exact/GK paths",
        ),
        "significant_terms_modes": QuerySpec(
            q_significant_terms_modes,
            _sig_modes_sql(),
            "ES significant_terms heuristics roster: JLH, chi_square, "
            "mutual_information and google_normalized_distance over the "
            "superset-counted 2x2 contingency — pinned IEEE op sequences "
            "on exact-integer doubles, sequential marginal divisions, "
            "fixed-chain MI cell sums, NULL where a zero marginal makes "
            "the statistic undefined",
        ),
        "esql_fork_fuse": QuerySpec(
            q_esql_fork_fuse,
            ESQL_FUSE_SQL,
            "ES|QL FUSE (9.x): RRF over FORK branches — two retrievers "
            "(top spenders, most active) each ranked by its own final "
            "SORT, fused as a fixed 1/(60+rank) addition chain (never a "
            "float agg) merged on the explicit key, round6 total order, "
            "page cut after fusion",
        ),
        "training_shards": QuerySpec(
            q_training_shards,
            _training_shards_sql(),
            "deterministic training-shard assignment + balance report: "
            "h60 dealing into 8 shards with per-shard doc/token/char "
            "budgets — the layout a distributed pretraining job reads; "
            "coverage and balance are the certified invariants",
        ),
    }
