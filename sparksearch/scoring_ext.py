"""Result-shaping and score-shaping retrieval variants on top of the
flagship BM25 path: field collapsing, minimum_should_match, function_score
(field-value-factor), and disjunction-max (DisMax) multi-field scoring —
the Elasticsearch/Lucene result-quality toolkit.

All four reuse ``querying.score_all``'s plan skeleton (broadcast the tiny
per-query term table against the postings; one partial+final aggregation
per (query, doc)) so nothing here adds a corpus-sized shuffle beyond what
the flagship already pays:

* collapse/function_score join document METADATA (a narrow forward-index
  projection) onto the matched-doc set only — at cluster scale that is a
  doc_id-keyed join of |matches| rows against a column-pruned scan, never
  text.
* minimum_should_match is the conjunctive plan with the n_hit predicate
  relaxed — identical shuffle structure.
* dismax computes both fields' tf in the SAME single posexplode+groupBy
  pass bm25f uses (no second corpus pass), then takes max + tie_break
  instead of blending before saturation.

Float discipline matches the long-green BM25 entries: per-row ln/division,
sums only over a query's few matched terms, ROUND(…, 6) on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .querying import score_all, topk_per_query
from .stats import round6
from .rankers import BM25F_TITLE_LEN
from .tokenize import tokens_col


def collapse_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    doc_meta: DataFrame,
    collapse_col: str = "source",
    k: int = 10,
) -> DataFrame:
    """Field collapsing (Elasticsearch ``collapse``) →
    DF[query_id, rank, doc_id, <collapse_col>, score]: the top-k results
    keeping only the best-scoring document per (query, collapse-key) —
    dedup-by-field at result time, e.g. one hit per source/site/domain.

    Two windows: best-per-group under the engine total order
    (score DESC, doc_id ASC), then the usual per-query top-k over the
    group winners. The metadata join touches only matched docs."""
    scored = score_all(qterms, tf_df, dl_df, term_stats).join(
        doc_meta.select(F.col("doc_id").cast("long").alias("doc_id"), collapse_col),
        "doc_id",
    )
    wg = Window.partitionBy("query_id", collapse_col).orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    wq = Window.partitionBy("query_id").orderBy(round6("score").desc(), F.asc("doc_id"))
    return (
        best.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", collapse_col, "score")
    )


def msm_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    msm: int = 2,
    k: int = 10,
) -> DataFrame:
    """minimum_should_match retrieval (Lucene BooleanQuery.setMinimumNumber-
    ShouldMatch) → DF[query_id, rank, doc_id, score]: docs matching at
    least ``msm`` DISTINCT resolved query terms, BM25-scored over the
    matches. Lucene semantics exactly: a query with fewer resolved optional
    clauses than ``msm`` matches nothing (no silent cap). msm=1 degenerates
    to the disjunctive flagship; msm=n_terms to the conjunctive path."""
    from .querying import _attach_dl
    from .stats import bm25_term_score_col

    q = qterms.join(term_stats.select("term", "idf", "n_docs", "avgdl"), "term", "inner")
    contrib = _attach_dl(tf_df.join(F.broadcast(q), "term", "inner"), tf_df, dl_df)
    scored = (
        contrib.select(
            "query_id", "doc_id", "term",
            bm25_term_score_col(qtf="qtf").alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"), F.count_distinct("term").alias("n_hit"))
        .filter(F.col("n_hit") >= msm)
        .select("query_id", "doc_id", "score")
    )
    return topk_per_query(scored, k)


def function_score_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    doc_meta: DataFrame,
    factor_col: str = "n_chars",
    k: int = 10,
) -> DataFrame:
    """function_score with a field_value_factor (Elasticsearch), multiply
    mode with a log1p modifier → DF[query_id, rank, doc_id, score]:

        final = bm25 · ln(1 + factor_col)

    Static document signals (length priors, pagerank-style quality, click
    counts) folded into relevance without touching the index. The factor
    join hits only matched docs; the factor column is a pruned scan."""
    scored = score_all(qterms, tf_df, dl_df, term_stats).join(
        doc_meta.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(factor_col).cast("double").alias("_fv"),
        ),
        "doc_id",
    )
    final = scored.select(
        "query_id", "doc_id",
        (F.col("score") * F.log1p(F.col("_fv"))).alias("score"),
    )
    return topk_per_query(final, k)


DISMAX_TIE_BREAK = 0.3


def dismax_topk(
    qterms: DataFrame,
    docs: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
    title_len: int = BM25F_TITLE_LEN,
    tie_break: float = DISMAX_TIE_BREAK,
    mode: str = "best_fields",
) -> DataFrame:
    """Disjunction-max multi-field retrieval (Lucene DisjunctionMaxQuery /
    ES ``best_fields``) → DF[query_id, rank, doc_id, score]: each term
    scores independently per field (title = first ``title_len`` tokens,
    body = rest — the same deterministic positional split as BM25F), then

        term_score = max_f s_f + tie_break · (Σ_f s_f − max_f s_f)
        score      = Σ_t qtf · term_score

    ``mode="most_fields"`` completes the ES multi_match trio (best_fields =
    this DisMax, cross_fields ≈ bm25f's blend-before-saturation): the
    per-term combiner becomes the plain per-field SUM. It is computed as a
    DIRECT s_t + s_b — not as tie_break=1.0, which would evaluate
    max + ((s_t+s_b) − max) and can differ from the direct sum by an ULP
    (the op-sequence discipline: oracle and engine must run the same
    double arithmetic, invariant #3).

    Where BM25F blends tf across fields BEFORE saturation (combined_fields),
    DisMax saturates per field and takes the best — the classic
    best-field-wins behavior for short-field boosting.

    Per-field BM25 uses the engine's k1/b with field-specific length
    normalization (field length / field avg length); idf is the document-
    level idf (fields partition the token stream, so df is unchanged).
    Plan: ONE tokenize + posexplode + conditional-sum groupBy (shared shape
    with bm25f_topk), field averages a 1-row broadcast, query join
    broadcast-against-postings."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col("text").alias("toks"),
    )
    occ = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.posexplode("toks").alias("pos", "term"),
    )
    ftf = occ.groupBy("doc_id", "term").agg(
        F.sum(F.when(F.col("pos") < title_len, 1).otherwise(0)).alias("tf_t"),
        F.sum(F.when(F.col("pos") >= title_len, 1).otherwise(0)).alias("tf_b"),
        F.max("dl").alias("dl"),
    )
    lt = F.least(F.col("dl"), F.lit(title_len))
    favg = dl_df.agg(
        (F.sum(lt).cast("double") / F.count(F.lit(1))).alias("avg_t"),
        (F.sum(F.col("dl") - lt).cast("double") / F.count(F.lit(1))).alias("avg_b"),
    )
    q = qterms.join(term_stats.select("term", "idf"), "term", "inner")
    b, k1 = F.lit(BM25_B), F.lit(BM25_K1)
    len_t = F.least(F.col("dl"), F.lit(title_len))
    len_b = F.col("dl") - len_t

    def field_score(tf: Column, flen: Column, favg_c: Column) -> Column:
        # idf · tf·(k1+1) / (tf + k1·(1−b + b·len/avg)); 0 when the field is
        # empty corpus-wide (avg 0) or the term is absent from the field.
        norm = tf * (k1 + F.lit(1.0)) / (
            tf + k1 * (F.lit(1.0) - b + b * flen / favg_c)
        )
        return F.when((favg_c > 0) & (tf > 0), F.col("idf") * norm).otherwise(
            F.lit(0.0)
        )

    s_t = field_score(F.col("tf_t"), len_t, F.col("avg_t"))
    s_b = field_score(F.col("tf_b"), len_b, F.col("avg_b"))
    if mode == "most_fields":
        term_score = s_t + s_b
    else:
        term_score = F.greatest(s_t, s_b) + F.lit(tie_break) * (
            s_t + s_b - F.greatest(s_t, s_b)
        )
    contrib = (
        ftf.join(F.broadcast(q), "term", "inner")
        .crossJoin(F.broadcast(favg))
        .select("query_id", "doc_id", (F.col("qtf") * term_score).alias("s"))
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))
    return topk_per_query(scored, k)


RESCORE_WINDOW = 50
RESCORE_WEIGHT = 2.0


def rescore_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    window: int = RESCORE_WINDOW,
    query_weight: float = 1.0,
    rescore_weight: float = RESCORE_WEIGHT,
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval (Elasticsearch ``rescore``) →
    DF[query_id, rank, doc_id, score]: a cheap BM25 pass selects the top
    ``window`` candidates per query, then ONLY those are re-scored with an
    expensive proximity signal —

        final = query_weight · bm25
              + rescore_weight · 1/(1 + min_ordered_span)     (0 if no chain)

    where min_ordered_span is the tightest in-order occurrence of the query
    terms (the span_near_ordered measure, unbounded slop). The classic
    cluster-scale pattern: position data is touched for k·window docs, not
    for every match — the positional fetch is semi-joined down to the
    candidate set (broadcast: it is k·window rows by construction), so the
    expensive stage's cost is independent of corpus size.
    """
    from .phrase import _min_ordered_span, positional_postings
    from .querying import parse_queries
    from .tokenize import py_tokenize

    spark = docs.sparkSession
    qterms = parse_queries(spark, queries)
    scored = score_all(qterms, tf_df, dl_df, term_stats)
    wnd = Window.partitionBy("query_id").orderBy(round6("score").desc(), F.asc("doc_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") <= window)
        .drop("rn")
    )
    qdefs = {
        int(qid): list(dict.fromkeys(py_tokenize(text)))
        for qid, text in queries
        if py_tokenize(text)
    }
    all_terms = sorted({t for ts in qdefs.values() for t in ts})
    cand_docs = cand.select("doc_id").distinct()
    pp = (
        positional_postings(docs)
        .filter(F.col("term").isin(all_terms))
        .join(F.broadcast(cand_docs), "doc_id", "left_semi")
    )
    per_doc = pp.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "ps"))).alias("m")
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(qid).cast("int").alias("query_id"),
                _min_ordered_span(terms).cast("long").alias("min_span"),
            )
            for qid, terms in sorted(qdefs.items())
        ]
    )
    prox = (
        per_doc.select("doc_id", F.explode(entries).alias("e"))
        .select(
            "doc_id",
            F.col("e.query_id").alias("query_id"),
            F.col("e.min_span").alias("min_span"),
        )
        .filter(F.col("min_span").isNotNull())
    )
    final = cand.join(prox, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        (
            F.lit(query_weight) * F.col("score")
            + F.lit(rescore_weight)
            * F.coalesce(
                F.lit(1.0) / (F.lit(1.0) + F.col("min_span")), F.lit(0.0)
            )
        ).alias("score"),
    )
    return topk_per_query(final, k)


def top_hits_by_field(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    meta: DataFrame,
    field: str,
    per_bucket: int = 3,
) -> DataFrame:
    """ES ``top_hits`` aggregation: the best ``per_bucket`` BM25 hits inside
    EVERY metadata bucket per query → DF[query_id, <field>, bucket_rank,
    doc_id, score] — the "show me the top results per language / per repo /
    per source" result shape (field collapsing keeps 1 per bucket and
    re-ranks globally; top_hits keeps n per bucket and reports per bucket).

    Same plan as the flagship (score_all's broadcast-against-postings BM25)
    plus one metadata join on matched docs only, then ONE window per
    (query, bucket) under the engine total order (round6 DESC, doc_id ASC).
    Scale: the window partitions by (query_id, field) — strictly finer than
    topk_per_query's per-query partitioning, so skew is never worse than
    the flagship's."""
    scored = score_all(qterms, tf_df, dl_df, term_stats)
    w = Window.partitionBy("query_id", field).orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        scored.join(meta, "doc_id")
        .withColumn("bucket_rank", F.row_number().over(w))
        .filter(F.col("bucket_rank") <= per_bucket)
        .select("query_id", field, "bucket_rank", "doc_id", "score")
    )


#: boosting-query geometry: docs matching ANY negative term are demoted by
#: this factor (a power of two — the multiply is EXACT in IEEE double, so
#: no cross-engine quantize step is needed before the rank).
BOOSTING_NEGATIVE_BOOST = 0.5
BOOSTING_NEG_TERMS = ("dup",)


def boosting_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    neg_terms: tuple[str, ...] = BOOSTING_NEG_TERMS,
    negative_boost: float = BOOSTING_NEGATIVE_BOOST,
    k: int = 10,
) -> DataFrame:
    """Elasticsearch `boosting` query → DF[query_id, rank, doc_id, score]:
    the positive query scores normally (full BM25); any doc matching the
    NEGATIVE query keeps its match but is demoted to score·negative_boost
    — "relevant, but prefer not" (the classic deprecated/stale-content
    demotion), unlike must_not which removes the doc entirely.

    Plan: the negative match set is one semi-reduction of the postings by
    the (tiny, broadcast) negative term list — |neg docs| rows joined LEFT
    onto the scored frame before the per-query top-k; the demotion runs
    BEFORE the rank cut so a demoted doc can fall out of the page.
    negative_boost = 0.5 is a power of two: score·0.5 is exact, so both
    engines rank identical quantized keys."""
    scored = score_all(qterms, tf_df, dl_df, term_stats)
    neg = (
        tf_df.filter(F.col("term").isin(*neg_terms))
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(1).alias("_neg"))
    )
    demoted = scored.join(F.broadcast(neg), "doc_id", "left").select(
        "query_id",
        "doc_id",
        F.when(F.col("_neg") == 1, F.col("score") * F.lit(negative_boost))
        .otherwise(F.col("score"))
        .alias("score"),
    )
    return topk_per_query(demoted, k)


DIVERSIFIED_MAX_PER_BUCKET = 2
DIVERSIFIED_K = 5


def diversified_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    meta: DataFrame,
    field: str,
    max_per_bucket: int = DIVERSIFIED_MAX_PER_BUCKET,
    k: int = DIVERSIFIED_K,
) -> DataFrame:
    """ES diversified_sampler (+ top page): global top-k per query taken
    AFTER capping each metadata bucket at max_per_bucket hits → DF[query_id,
    rank, doc_id, <field>, score] — "best results, but never more than two
    per language/source/domain".

    Two windows on the flagship scored frame, both under the engine total
    order (round6 DESC, doc_id ASC): the bucket cap partitions by
    (query_id, field) — finer than per-query, so never more skewed than the
    flagship — and the final page ranks the ≤ |buckets|·cap survivors, a
    frame already reduced per query."""
    scored = score_all(qterms, tf_df, dl_df, term_stats)
    wb = Window.partitionBy("query_id", field).orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    kept = (
        scored.join(meta, "doc_id")
        .withColumn("br", F.row_number().over(wb))
        .filter(F.col("br") <= max_per_bucket)
    )
    wq = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        kept.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", field, "score")
    )


def search_after_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``search_after`` cursor pagination, the PHYSICAL form →
    DF[query_id, rank, doc_id, score]: page 2 (ranks 1..k within the page)
    fetched by pushing the page-1 cursor — the k-th (round6(score),
    doc_id) pair — as a strict-ordering predicate, never by a window over
    pages 1..N. The logical twin (window rank > k, entry bm25_topk_page2)
    and this cursor form return identical rows BECAUSE the engine order
    (round6(score) DESC, doc_id ASC) is total: no ties, so no skipped or
    duplicated docs across pages.

    The cursor round-trips through the driver exactly as ES's cursor
    round-trips through the client — a ≤ n_queries-row collect (8 rows
    here; the CLAUDE.md collect budget), re-entering the plan as a
    broadcast literal table. A query with fewer than k page-1 hits has no
    cursor and returns no page 2 (inner join), matching ES. At cluster
    scale the win over the window form: the filter reaches the scored
    frame BEFORE any rank window, so page N never re-ranks pages 1..N−1."""
    from .stats import round6

    # scored feeds BOTH the cursor collect and the returned page-2 plan —
    # two actions; without persist the whole scoring DAG executes twice
    # (the CLAUDE.md multi-consumer sharp edge). Left persisted: the frame
    # is (query, matched-doc)-sized and the page-2 plan still reads it
    # after this function returns (LRU eviction reclaims it).
    scored = score_all(qterms, tf_df, dl_df, term_stats).persist()
    p1 = topk_per_query(scored, k).filter(F.col("rank") == k).select(
        "query_id", round6("score").alias("cs"), F.col("doc_id").alias("cd")
    )
    cur = p1.collect()
    spark = qterms.sparkSession
    if not cur:
        return scored.select(
            "query_id", F.lit(0).alias("rank"), "doc_id", "score"
        ).limit(0)
    cursors = spark.createDataFrame(
        [(r["query_id"], float(r["cs"]), int(r["cd"])) for r in cur],
        "query_id long, cs double, cd long",
    )
    after = scored.join(F.broadcast(cursors), "query_id").filter(
        (round6("score") < F.col("cs"))
        | ((round6("score") == F.col("cs")) & (F.col("doc_id") > F.col("cd")))
    ).select("query_id", "doc_id", "score")
    return topk_per_query(after, k)


def terms_set_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``terms_set`` query (minimum_should_match_field) →
    DF[query_id, rank, doc_id, required, score]: like minimum_should_match
    but the required distinct-match count is PER-DOCUMENT, read from a doc
    field. The fixture has no such field, so it is derived deterministically
    (required = 1 + h60('req|'||doc_id) % 3 ∈ {1,2,3} — the geo/ip
    synthetic-field precedent) and computed INLINE from doc_id in the
    scored frame: zero extra joins, zero extra scans versus the msm plan.
    Uncapped ES semantics: a doc requiring more matches than the query has
    resolved terms simply never qualifies."""
    from .querying import _attach_dl
    from .stats import bm25_term_score_col, round6
    from .textpipe import h60

    q = qterms.join(
        term_stats.select("term", "idf", "n_docs", "avgdl"), "term", "inner"
    )
    contrib = _attach_dl(tf_df.join(F.broadcast(q), "term", "inner"), tf_df, dl_df)
    required = (
        F.pmod(h60(F.concat(F.lit("req|"), F.col("doc_id").cast("string"))), F.lit(3))
        + 1
    ).cast("long")
    scored = (
        contrib.select(
            "query_id", "doc_id", "term",
            bm25_term_score_col(qtf="qtf").alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"), F.count_distinct("term").alias("n_hit"))
        .withColumn("required", required)
        .filter(F.col("n_hit") >= F.col("required"))
        .select("query_id", "doc_id", "required", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "required", "score")
    )


DECAY_OFFSET_DAYS = 30
DECAY_SCALE_DAYS = 300
DECAY_AGE_MOD = 365


def decay_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``function_score`` with a LINEAR decay function on document
    recency → DF[query_id, rank, doc_id, age_days, score]:

        final = bm25 · max(0, scale − max(0, age − offset)) / scale

    (offset=30, scale=300 days). The fixture has no doc timestamp, so age
    is the deterministic h60-derived ``age_days = h60('age|'||doc_id) %
    365`` (synthetic-field precedent). Gauss/exp decay differ only in the
    shape function and would route exp() through the 9-dp quantize
    discipline; linear keeps everything exact-until-the-last-ops: the
    decay numerator is pure integer clamp math, decay = ONE double
    division of the same small integers on both engines, and the final
    score is round6(round6(bm25) · decay) — an identical double op
    sequence (invariant #3's output-precision ranking)."""
    from .stats import round6
    from .textpipe import h60

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    age = F.pmod(
        h60(F.concat(F.lit("age|"), F.col("doc_id").cast("string"))),
        F.lit(DECAY_AGE_MOD),
    ).cast("long")
    num = F.lit(DECAY_SCALE_DAYS) - F.least(
        F.greatest(age - DECAY_OFFSET_DAYS, F.lit(0)), F.lit(DECAY_SCALE_DAYS)
    )
    final = scored.select(
        "query_id", "doc_id", age.alias("age_days"),
        round6(
            round6("score")
            * (num.cast("double") / F.lit(float(DECAY_SCALE_DAYS)))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        final.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "age_days", "score")
    )


RANDOM_SCORE_SEED = 42
RANDOM_SCORE_MOD = 1000000


def random_score_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    seed: int = RANDOM_SCORE_SEED,
    k: int = 10,
) -> DataFrame:
    """ES ``function_score`` with ``random_score(seed, field: doc_id)`` →
    DF[query_id, rank, doc_id, score]: reproducible per-document jitter
    multiplied into relevance (result shuffling / A-B bucketing). ES's
    "random" with a seed + field is exactly a hash of (seed, doc_id) —
    which is the engine's h60 discipline verbatim, so the entry is
    value-checkable like any other: u = (h60(seed||doc_id) % 10^6) / 10^6
    ∈ [0, 1) (one exact-integer division — both engines divide the same
    small integers), final = round6(round6(bm25) · u) (the decay entry's
    op-sequence rule). No rand() anywhere — invariant #1."""
    from .stats import round6
    from .textpipe import h60

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    u = (
        F.pmod(
            h60(
                F.concat(
                    F.lit(f"rs|{seed}|"), F.col("doc_id").cast("string")
                )
            ),
            F.lit(RANDOM_SCORE_MOD),
        ).cast("double")
        / F.lit(float(RANDOM_SCORE_MOD))
    )
    final = scored.select(
        "query_id", "doc_id", round6(round6("score") * u).alias("score")
    )
    return topk_per_query(final, k)


PINNED_IDS = [3, 1]  # promoted doc ids, in promotion order (exist at every sf)


def pinned_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    pinned: list[int] | None = None,
    k: int = 10,
) -> DataFrame:
    """ES ``pinned`` query → DF[query_id, rank, doc_id, pinned, score]:
    the promoted ids occupy ranks 1..p in their GIVEN order (whether or
    not they match the organic query — ES retrieves pinned docs by id),
    then the organic results follow with the pinned ids excluded.

    Pinned rows carry their organic round6 score when they match and 0.0
    when they don't (ES sorts pinned by a constant boost; the reported
    score here is the informative one, quantized like every score
    column). One broadcast anti-condition on the scored frame — no extra
    corpus work; the pinned rows themselves are a p-row literal union."""
    from .stats import round6

    pins = PINNED_IDS if pinned is None else pinned
    spark = qterms.sparkSession
    scored = score_all(qterms, tf_df, dl_df, term_stats)
    qids = qterms.select("query_id").distinct()
    pin_rows = spark.createDataFrame(
        [(int(d), i + 1) for i, d in enumerate(pins)], "doc_id long, pin_rank long"
    )
    pinned_df = (
        qids.crossJoin(F.broadcast(pin_rows))
        .join(
            scored.select("query_id", "doc_id", round6("score").alias("s")),
            ["query_id", "doc_id"],
            "left",
        )
        .select(
            "query_id",
            F.col("pin_rank").alias("rank"),
            "doc_id",
            F.lit(True).alias("pinned"),
            F.coalesce("s", F.lit(0.0)).alias("score"),
        )
    )
    organic = scored.filter(~F.col("doc_id").isin([int(d) for d in pins]))
    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    organic_ranked = (
        organic.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k - len(pins))
        .select(
            "query_id",
            (F.col("r") + len(pins)).alias("rank"),
            "doc_id",
            F.lit(False).alias("pinned"),
            round6("score").alias("score"),
        )
    )
    return pinned_df.unionByName(organic_ranked)


# ------------------------------------------------- round-4 session-7
# Modern ES relevance features: rank_feature + distance_feature queries
# (score contributions from per-document numeric signals) and the sampler
# aggregation. All reuse score_all's broadcast-against-postings skeleton.

RANK_FEATURE_PIVOT = 10
RANK_FEATURE_BOOST = 2.0


def rank_feature_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``rank_feature`` query (saturation function) inside a bool
    ``should`` → DF[query_id, rank, doc_id, feature, score]:

        final = round6(round6(bm25) + round6(boost · f / (f + pivot)))

    with ``f`` a static per-document relevance signal (pagerank, url
    length, popularity). The fixture has no such column, so f =
    1 + h60('rf|'||doc_id) % 100 (the synthetic-field precedent: decay's
    age, terms_set's required). Saturation is the bounded monotone form
    ES defaults to; its numerator/denominator are SMALL INTEGERS, so the
    only doubles are one division, one multiply by the boost literal and
    the final add — identical op sequence both engines (the decay entry's
    discipline). At cluster scale the feature is a real column riding the
    forward index; the saturation math stays per-row and codegen-able."""
    from .stats import round6
    from .textpipe import h60

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    f_col = (
        F.pmod(h60(F.concat(F.lit("rf|"), F.col("doc_id").cast("string"))), F.lit(100))
        + 1
    ).cast("long")
    fin = scored.select(
        "query_id",
        "doc_id",
        f_col.alias("feature"),
        round6(
            round6("score")
            + round6(
                F.lit(RANK_FEATURE_BOOST)
                * (
                    f_col.cast("double")
                    / (f_col + RANK_FEATURE_PIVOT).cast("double")
                )
            )
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        fin.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "feature", "score")
    )


DISTANCE_FEATURE_ORIGIN = 180  # days — the "origin" recency anchor
DISTANCE_FEATURE_PIVOT = 60
DISTANCE_FEATURE_BOOST = 1.5


def distance_feature_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``distance_feature`` query → DF[query_id, rank, doc_id,
    dist_days, score]: a boost that DECAYS with distance from an origin,

        final = round6(round6(bm25) + round6(boost · pivot / (pivot + dist)))

    where dist = |age_days − origin| reuses the decay entry's h60-derived
    document age (age = h60('age|'||doc_id) % 365 — ONE synthetic time
    reality shared by both recency entries). Unlike function_score decay
    (which MULTIPLIES relevance), distance_feature ADDS a bounded bonus —
    ES's cheap "boost recent/nearby docs" primitive that skips
    non-competitive docs under WAND because its contribution is capped at
    ``boost``. Distance is pure integer math; then one division of small
    ints, one multiply, one add — the pinned double sequence."""
    from .stats import round6
    from .textpipe import h60

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    age = F.pmod(
        h60(F.concat(F.lit("age|"), F.col("doc_id").cast("string"))),
        F.lit(DECAY_AGE_MOD),
    ).cast("long")
    dist = F.abs(age - F.lit(DISTANCE_FEATURE_ORIGIN))
    fin = scored.select(
        "query_id",
        "doc_id",
        dist.alias("dist_days"),
        round6(
            round6("score")
            + round6(
                F.lit(DISTANCE_FEATURE_BOOST)
                * (
                    F.lit(float(DISTANCE_FEATURE_PIVOT))
                    / (dist + DISTANCE_FEATURE_PIVOT).cast("double")
                )
            )
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        fin.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "dist_days", "score")
    )


SAMPLER_SHARDS = 4
SAMPLER_SHARD_SIZE = 3


def sampler_agg(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    n_shards: int = SAMPLER_SHARDS,
    shard_size: int = SAMPLER_SHARD_SIZE,
) -> DataFrame:
    """ES ``sampler`` aggregation → DF[query_id, sample_n, n_shards_hit,
    max_score, avg_score]: sub-aggregations run over only the top
    ``shard_size`` highest-scoring docs PER SHARD (ES's knob for "agg
    over the best few hundred matches, not all of them"). Shards are the
    deterministic h60 doc shards (terms_shard_error's precedent — the
    distributed semantics made value-checkable), the per-shard page is
    the engine total order (round6(score) DESC, doc_id ASC), and the
    sub-agg here is the stats pair every dashboard asks for: max + mean
    score of the sample.

    Float discipline: per-shard top-k compares round6 keys; the mean sums
    round6 scores as EXACT decimal(18,6) (a 6-dp-grid double casts to
    decimal(18,6) identically on both engines — shortest-repr on Spark,
    value-rounding on DuckDB, equal on the grid) and divides ONCE. The
    window runs on the matched-docs frame, partitioned (query, shard) —
    at cluster scale this is the same per-partition bounded heap the DAAT
    path uses, never a global sort."""
    from .stats import round6
    from .textpipe import h60

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    shard = F.pmod(
        h60(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))),
        F.lit(n_shards),
    ).alias("shard")
    w = Window.partitionBy("query_id", "shard").orderBy(
        F.desc("s6"), F.asc("doc_id")
    )
    sample = (
        scored.select("query_id", "doc_id", shard, round6("score").alias("s6"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= shard_size)
    )
    return (
        sample.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sample_n"),
            F.count_distinct("shard").cast("long").alias("n_shards_hit"),
            F.max("s6").alias("max_score"),
            F.sum(F.col("s6").cast("decimal(18,6)")).alias("_sum"),
        )
        .select(
            "query_id",
            "sample_n",
            "n_shards_hit",
            "max_score",
            round6(
                F.col("_sum").cast("double") / F.col("sample_n").cast("double")
            ).alias("avg_score"),
        )
    )


HYBRID_ALPHA = 0.5
HYBRID_POOL = 20


def hybrid_linear_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    embeddings: DataFrame,
    alpha: float = HYBRID_ALPHA,
    pool: int = HYBRID_POOL,
    k: int = 10,
) -> DataFrame:
    """Hybrid lexical+vector retrieval with LINEAR score fusion (the
    score-level sibling of bm25_rrf_fusion's rank-level fusion; ES 8.9+
    "linear" retriever / Weaviate hybrid alpha) → DF[query_id, rank,
    doc_id, bm25_norm, cos_norm, score]:

        score = round6(alpha · norm(bm25) + (1−alpha) · norm(cosine))

    Each ranker retrieves its top ``pool`` candidates, scores are min-max
    normalized WITHIN the retrieved pool (the convention: fusion weighs
    relative standing in each list, absolute scales are incomparable), a
    doc missing from one pool contributes 0 from that ranker, and a flat
    pool (max == min) normalizes to 1.0 everywhere.

    Determinism: both pools cut on the engine total order; normalization
    subtracts/divides round6-grid doubles (deterministic — identical
    operands and single ops on both engines); the blend is the pinned
    alpha·nb + (1−alpha)·nc sequence. Query vectors are the embeddings
    with vec_id == query_id (doc-aligned fixture; in production the query
    encoder output). Scale: the vector side is the brute-force baseline
    (broadcast queries × scan — ann_cosine_topk's plan); the LSH/IVF/PQ
    entries are its sub-linear replacements, and fusion happens on two
    ≤ pool·|Q|-row frames — driver-free, shuffle-free beyond the pools."""
    from .stats import round6
    from .vectors import _vecs, cosine

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    wq = Window.partitionBy("query_id").orderBy(round6("score").desc(), F.asc("doc_id"))
    tpool = (
        scored.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= pool)
        .select("query_id", "doc_id", round6("score").alias("s6"))
    )
    vecs = _vecs(embeddings)
    qids = qterms.select("query_id").distinct()
    qv = vecs.join(
        qids, vecs.vec_id == qids.query_id
    ).select("query_id", F.col("v").alias("qv"))
    cscored = (
        vecs.join(F.broadcast(qv))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            round6(cosine(F.col("v"), F.col("qv"))).alias("c6"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("c6"), F.asc("doc_id"))
    cpool = (
        cscored.withColumn("r", F.row_number().over(wc))
        .filter(F.col("r") <= pool)
        .select("query_id", "doc_id", "c6")
    )

    def norm(df: DataFrame, col: str, out: str) -> DataFrame:
        wn = Window.partitionBy("query_id")
        mn, mx = F.min(col).over(wn), F.max(col).over(wn)
        return df.select(
            "query_id", "doc_id",
            F.when(mx > mn, (F.col(col) - mn) / (mx - mn))
            .otherwise(F.lit(1.0))
            .alias(out),
        )

    nb = norm(tpool, "s6", "nb")
    nc = norm(cpool, "c6", "nc")
    fused = (
        nb.join(nc, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id", "doc_id",
            F.coalesce("nb", F.lit(0.0)).alias("nb"),
            F.coalesce("nc", F.lit(0.0)).alias("nc"),
        )
        .select(
            "query_id", "doc_id",
            round6("nb").alias("bm25_norm"),
            round6("nc").alias("cos_norm"),
            round6(
                F.lit(alpha) * F.col("nb") + F.lit(1.0 - alpha) * F.col("nc")
            ).alias("score"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(round6("score").desc(), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "bm25_norm", "cos_norm", "score")
    )


def match_bool_prefix_topk(
    spark,
    queries: list[tuple[int, str]],
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``match_bool_prefix`` → DF[query_id, rank, doc_id, n_hit,
    prefix_hit, score]: every token but the last is an independent OR
    term clause (plain BM25 contribution), the last token is a PREFIX
    clause scoring a CONSTANT 1.0 when the document contains ANY term
    with that prefix (Lucene PrefixQuery under its constant-score
    rewrite — multi-term expansions score flat, not per-term BM25).
    Completes the match trio: match_phrase_prefix demands contiguity,
    this is its bag-of-words sibling (type-ahead over unordered terms).

        score = round6(Σ_leading bm25 + 1.0·[any prefix term present])

    The sum is the flagship's per-(query, doc) aggregation; +1.0 of a
    round6-grid double is deterministic. Docs matching neither clause do
    not appear (bool with all-should semantics). Prefix expansion is the
    dictionary range scan (sorted-sidecar-served in the physical path);
    the presence probe is a semi-join of the expanded terms against the
    postings, reduced to distinct (query, doc) BEFORE the outer join —
    no per-expansion scoring work."""
    from .stats import round6
    from .tokenize import py_tokenize

    rows_lead, rows_pre = [], []
    for qid, text in queries:
        toks = py_tokenize(text)
        if not toks:
            continue
        *lead, pre = toks
        from collections import Counter

        for t, n in sorted(Counter(lead).items()):
            rows_lead.append((int(qid), t, int(n)))
        rows_pre.append((int(qid), pre))
    qlead = spark.createDataFrame(
        rows_lead or [(None, None, None)], "query_id long, term string, qtf long"
    ).filter(F.col("query_id").isNotNull())
    qpre = spark.createDataFrame(rows_pre, "query_id long, prefix string")

    # score_all's plan skeleton with n_hit riding along for the output
    # contract (the msm shape)
    from .querying import _attach_dl
    from .stats import bm25_term_score_col

    q = qlead.join(
        term_stats.select("term", "idf", "n_docs", "avgdl"), "term", "inner"
    )
    contrib = _attach_dl(tf_df.join(F.broadcast(q), "term", "inner"), tf_df, dl_df)
    scored = (
        contrib.select(
            "query_id", "doc_id", bm25_term_score_col(qtf="qtf").alias("s"), "term"
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("s").alias("score"),
            F.count_distinct("term").cast("long").alias("n_hit"),
        )
        .select("query_id", "doc_id", round6("score").alias("s6"), "n_hit")
    )
    exp = term_stats.select("term").join(
        F.broadcast(qpre), F.col("term").startswith(F.col("prefix"))
    )
    pre_hits = (
        tf_df.select("term", "doc_id")
        .join(exp.select("query_id", "term"), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("prefix_hit", F.lit(1).cast("long"))
    )
    fused = (
        scored.join(pre_hits, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id", "doc_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.coalesce("prefix_hit", F.lit(0)).cast("long").alias("prefix_hit"),
            round6(
                F.coalesce("s6", F.lit(0.0))
                + F.coalesce("prefix_hit", F.lit(0)).cast("double") * F.lit(1.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "n_hit", "prefix_hit", "score")
    )


SPARSE_VEC_QMOD = 4   # query weights in 1..4
SPARSE_VEC_DMOD = 8   # per-(term,doc) impact multipliers in 1..8


def sparse_vector_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ES ``sparse_vector`` query (the ELSER / learned-sparse retrieval
    operator, 8.15+) → DF[query_id, rank, doc_id, score]: documents carry a
    term→weight map produced by a sparse encoder at index time; the query
    carries its own term→weight expansion; score = Σ over shared terms of
    w_q(t) · w_d(t, d) — a pure weighted-overlap dot product, no idf, no
    length normalization (the model's weights subsume both).

    The fixture has no learned weights, so both sides derive them
    deterministically (the synthetic-field precedent — decay's age,
    rank_feature's signal): w_q(t) = 1 + h60('svq|'||t) % 4 on the query's
    DISTINCT terms, w_d(t,d) = tf · (1 + h60('sv|'||t||'|'||d) % 8) — the
    doc weight stays text-dependent through tf, as a real encoder's
    would. All-integer weights ⇒ the score is an EXACT BIGINT sum (no
    float discipline needed anywhere); ranking ties break on doc_id under
    the engine total order.

    Plan: the flagship shape verbatim — tiny distinct-term query table
    broadcast against postings, one partial+final agg per (query, doc),
    TakeOrdered window top-k. At cluster scale the stored weights ride the
    inverted index exactly like tf does (one more int column per posting),
    so the sparse_vector query costs what a term query costs."""
    from .textpipe import h60

    wq = (
        F.pmod(h60(F.concat(F.lit("svq|"), F.col("term"))), F.lit(SPARSE_VEC_QMOD))
        + 1
    ).cast("long")
    q = qterms.select("query_id", "term").distinct().withColumn("wq", wq)
    wd = F.col("tf") * (
        F.pmod(
            h60(
                F.concat(
                    F.lit("sv|"),
                    F.col("term"),
                    F.lit("|"),
                    F.col("doc_id").cast("string"),
                )
            ),
            F.lit(SPARSE_VEC_DMOD),
        )
        + 1
    )
    scored = (
        tf_df.join(F.broadcast(q), "term", "inner")
        .select(
            "query_id",
            "doc_id",
            (F.col("wq") * wd).cast("long").alias("c"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("long").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def hard_negatives_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for retrieval-model training → DF[query_id,
    rank, doc_id, score]: the top-k BM25-scored documents per query that
    are NOT in the (deterministic conjunctive-containment) relevance set
    — the highest-scoring non-relevant docs, exactly the negatives a
    dense-retriever/reranker training pipeline mines from a lexical
    index (DPR's "BM25 hard negatives").

    Plan: the flagship scored frame anti-joins the qrels keyset (both
    sides (query, doc)-keyed, the anti join is a broadcast of the
    per-query relevant sets at any scale since qrels are query-bounded),
    then the standard quantized top-k window. Reuses evaluate.
    conjunctive_qrels — the same judgments bm25_rank_eval scores
    against, so metrics and mined negatives are mutually consistent."""
    from .evaluate import conjunctive_qrels

    scored = score_all(qterms, tf_df, dl_df, term_stats)
    qrels = conjunctive_qrels(qterms, tf_df)
    negs = scored.join(qrels, ["query_id", "doc_id"], "left_anti")
    return topk_per_query(negs, k)
