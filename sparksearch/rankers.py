"""Alternative ranking models beyond BM25: Dirichlet-smoothed query
likelihood (the Indri/Galago default) and BM25F multi-field scoring (the
Lucene/Elasticsearch ``combined_fields`` model).

Both reuse the engine's retrieval skeleton — broadcast the (tiny) per-query
term table against the postings, one partial+final aggregation per
(query, doc), window top-k under the pinned total order (score DESC,
doc_id ASC) — so the big side never shuffles for a join and every plan
survives a 100× scale-up exactly like the flagship BM25 path.

Float discipline: per-row ln()/division is bit-deterministic on both
engines; the only accumulated sums are over a query's few matched terms
(the same risk profile as the long-green BM25 entries). Integer quantities
(tf, dl, field lengths, C) are summed exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .tokenize import tokens_col

QLM_MU = 1000.0


def qlm_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (μ=1000) →
    DF[query_id, rank, doc_id, score]:

        score(q,d) = Σ_t qtf_t · ln( (tf_td + μ·p_t) / (dl_d + μ) )

    over the query's KNOWN terms (unknown terms drop, the engine-wide
    rule), where p_t = cf_t / C is the collection language model. The sum
    runs over ALL known query terms — absent terms contribute their
    background probability — yet the plan only touches matched postings via
    the standard decomposition:

        score = Σ_matched qtf·ln(1 + tf/(μ·p_t))           (postings join)
              + Σ_known  qtf·ln(μ·p_t)                      (per-query const)
              - qlen_known · ln(dl_d + μ)                   (per-doc term)

    Candidates = docs matching ≥1 known term (an all-background doc scores
    below any candidate for ranking purposes and is never retrievable by
    index lookup — same contract as the boolean path).
    """
    from .querying import topk_per_query

    # C = total collection tokens, exact integer sum (NOT n_docs·avgdl,
    # which would reintroduce a double rounding).
    coll = dl_df.agg(F.sum("dl").cast("double").alias("coll_len"))
    q = (
        qterms.join(term_stats.select("term", "cf"), "term", "inner")
        .crossJoin(F.broadcast(coll))
        .select(
            "query_id",
            "term",
            "qtf",
            (F.lit(QLM_MU) * F.col("cf") / F.col("coll_len")).alias("mu_p"),
        )
    )
    qconst = q.groupBy("query_id").agg(
        F.sum(F.col("qtf") * F.log(F.col("mu_p"))).alias("qc"),
        F.sum("qtf").alias("qlen"),
    )
    matched = (
        tf_df.join(F.broadcast(q), "term", "inner")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.col("qtf") * F.log(F.lit(1.0) + F.col("tf") / F.col("mu_p"))
            ).alias("ms"),
            F.max("dl").alias("dl"),
        )
    )
    scored = matched.join(F.broadcast(qconst), "query_id").select(
        "query_id",
        "doc_id",
        (
            F.col("ms")
            + F.col("qc")
            - F.col("qlen") * F.log(F.col("dl") + F.lit(QLM_MU))
        ).alias("score"),
    )
    return topk_per_query(scored, k)


def vsm_cosine_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Classic tf·idf vector-space-model retrieval (Salton's SMART cosine)
    → DF[query_id, rank, doc_id, score]:

        score(q,d) = Σ_t (qtf_t·idf_t)(tf_td·idf_t) / (‖q‖·‖d‖)

    with ‖d‖ = √Σ_t (tf_td·idf_t)² over ALL of d's terms and ‖q‖ over the
    query's KNOWN terms (unknown terms drop engine-wide). The cosine family
    is the pre-BM25 textbook ranker an academic search engine ships next to
    BM25 — rank order differs from BM25 exactly where document-length
    normalization matters.

    Plan: the dot product reuses the flagship shape (tiny per-query term
    table broadcast against postings, partial+final agg per (query, doc));
    doc norms are ONE postings⋈vocabulary aggregation — an index-build
    artifact in a real deployment (computed once, stored beside dl), here
    derived on the fly from the cached postings. The norm join keys on
    doc_id against the candidate set only.

    Float discipline: every accumulated addend (w², w_q·w_d) is quantized
    once to 9 decimals and summed EXACTLY (decimal(28,9)), so both the
    norms and the dot products are independent of aggregation order on
    both engines; the only double ops afterwards are one sqrt and one
    division per row — the repo-standard remedy for order-sensitive float
    sums."""
    from .querying import topk_per_query

    ts = term_stats.select("term", "idf")
    w_d = F.col("tf") * F.col("idf")
    dnorm = (
        tf_df.join(ts, "term")
        .select("doc_id", F.round(w_d * w_d, 9).cast("decimal(28,9)").alias("w2"))
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum("w2").cast("double")).alias("dnorm"))
    )
    q = qterms.join(ts, "term", "inner")
    w_q = F.col("qtf") * F.col("idf")
    qnorm = q.select(
        "query_id", F.round(w_q * w_q, 9).cast("decimal(28,9)").alias("w2")
    ).groupBy("query_id").agg(F.sqrt(F.sum("w2").cast("double")).alias("qnorm"))
    dot = (
        tf_df.join(F.broadcast(q), "term", "inner")
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("qtf") * F.col("idf") * F.col("tf") * F.col("idf"), 9)
            .cast("decimal(28,9)")
            .alias("p"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("p").alias("dot"))
    )
    scored = (
        dot.join(dnorm, "doc_id")
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("dot").cast("double") / (F.col("dnorm") * F.col("qnorm"))).alias(
                "score"
            ),
        )
    )
    return topk_per_query(scored, k)


BM25F_TITLE_LEN = 5      # first T tokens form the 'title' field
BM25F_W_TITLE = 2.0
BM25F_W_BODY = 1.0


def bm25f_topk(
    qterms: DataFrame,
    docs: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
    title_len: int = BM25F_TITLE_LEN,
    w_title: float = BM25F_W_TITLE,
    w_body: float = BM25F_W_BODY,
) -> DataFrame:
    """BM25F multi-field retrieval → DF[query_id, rank, doc_id, score]
    (simple BM25F, Robertson/Zaragoza): per-field tf is length-normalized
    then weight-blended into ONE pseudo-frequency before saturation —

        tf̃(t,d) = Σ_f  w_f · tf_f / B_f,   B_f = (1-b) + b·len_f/avglen_f
        score    = Σ_t  qtf · idf_t · tf̃ / (k1 + tf̃)

    Fields here are a deterministic positional split (the corpus is a
    single text column): title = first ``title_len`` tokens, body = rest.
    Because the fields partition the token stream, document-level df — and
    hence the engine's standard idf — is unchanged.

    Plan: ONE tokenize + ONE posexplode produce both fields' tf in a single
    groupBy(doc, term) with conditional sums (no second corpus pass, no
    per-field shuffle); per-doc field lengths are pure functions of dl
    (len_t = min(dl, T)), so they're computed map-side from the carried dl
    and the field average lengths ride a 1-row broadcast off the existing
    doc-length table; the query join is the usual broadcast-against-
    postings shape. An all-short corpus (avg body length 0) zeroes the
    body contribution instead of dividing by zero.
    """
    from .querying import topk_per_query

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
    tfw = F.lit(w_title) * F.col("tf_t") / (
        F.lit(1.0) - b + b * len_t / F.col("avg_t")
    ) + F.when(
        F.col("avg_b") > 0,
        F.lit(w_body) * F.col("tf_b") / (F.lit(1.0) - b + b * len_b / F.col("avg_b")),
    ).otherwise(F.lit(0.0))
    contrib = (
        ftf.join(F.broadcast(q), "term", "inner")
        .crossJoin(F.broadcast(favg))
        .select(
            "query_id",
            "doc_id",
            tfw.alias("tfw"),
            "qtf",
            "idf",
        )
        .select(
            "query_id",
            "doc_id",
            (F.col("qtf") * F.col("idf") * F.col("tfw") / (k1 + F.col("tfw"))).alias("s"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))
    return topk_per_query(scored, k)


CF_TITLE_LEN = BM25F_TITLE_LEN
CF_W_TITLE = 2  # combined_fields weights are INTEGERS -> exact tf/len
CF_W_BODY = 1


def combined_fields_topk(
    qterms: DataFrame,
    docs: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
    title_len: int = CF_TITLE_LEN,
    w_title: int = CF_W_TITLE,
    w_body: int = CF_W_BODY,
) -> DataFrame:
    """ES ``combined_fields`` retrieval (7.13+) → DF[query_id, rank,
    doc_id, score]: the TERM-CENTRIC multi-field model — per-field term
    frequencies merge into one synthetic combined field BEFORE scoring
    (weighted tf sum, weighted length sum), then plain BM25 runs once on
    that field:

        tf_c(t,d) = Σ_f w_f · tf_f(t,d)      (exact integer, w_f ∈ ℕ)
        len_c(d)  = Σ_f w_f · len_f(d)       (exact integer)
        score     = Σ_t qtf · idf_t · tf_c·(k1+1)
                        / (tf_c + k1·(1 − b + b·len_c/avg_c))

    This is the semantic contrast with BM25F (bm25f_topk above): BM25F
    normalizes each field's tf by its OWN field length before blending;
    combined_fields blends raw tfs and normalizes once by the combined
    length — ES documents it as the principled term-centric alternative
    to per-field scoring. Because ES restricts the weights to >= 1 and
    this dialect pins them to integers, tf_c and len_c stay exact
    integers and the whole float surface is the one BM25 expression.

    Fields are the same deterministic positional split as bm25f_topk
    (title = first ``title_len`` tokens, body = rest), so document df —
    and the engine's shared idf — is unchanged. Plan: one tokenize + one
    posexplode, tf_c in a single conditional-sum groupBy, avg_c a 1-row
    broadcast off the doc-length table, broadcast query join, one score
    shuffle, TakeOrderedAndProject top-k."""
    from .querying import topk_per_query

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col("text").alias("toks"),
    )
    occ = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.posexplode("toks").alias("pos", "term"),
    )
    ctf = occ.groupBy("doc_id", "term").agg(
        F.sum(
            F.when(F.col("pos") < title_len, w_title).otherwise(w_body)
        ).alias("tf_c"),
        F.max("dl").alias("dl"),
    )
    len_c = F.col("dl") * w_body + F.least(F.col("dl"), F.lit(title_len)) * (
        w_title - w_body
    )
    cavg = dl_df.agg(
        (F.sum(len_c).cast("double") / F.count(F.lit(1))).alias("avg_c")
    )
    q = qterms.join(term_stats.select("term", "idf"), "term", "inner")
    k1, k1p1, b = F.lit(BM25_K1), F.lit(BM25_K1 + 1.0), F.lit(BM25_B)
    contrib = (
        ctf.join(F.broadcast(q), "term", "inner")
        .crossJoin(F.broadcast(cavg))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * F.col("idf")
                * (F.col("tf_c") * k1p1)
                / (
                    F.col("tf_c")
                    + k1
                    * (F.lit(1.0) - b + b * len_c / F.col("avg_c"))
                )
            ).alias("s"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))
    return topk_per_query(scored, k)


JM_LAMBDA = 0.1  # Lucene LMJelinekMercerSimilarity default
#: (1-λ)/λ computed ONCE in doubles and shared with the SQL twin via repr()
#: — writing "9.0" in SQL while Spark computes (1.0-0.1)/0.1 (= 9.000…002)
#: would diverge at the 16th digit and leak into 6-dp ties.
JM_RATIO = (1.0 - JM_LAMBDA) / JM_LAMBDA


def jm_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Jelinek-Mercer-smoothed query likelihood (Lucene's
    ``LMJelinekMercerSimilarity``, λ=0.1) → DF[query_id, rank, doc_id,
    score] — the third classical LM ranker beside Dirichlet (qlm_topk):

        p(t|d) = (1-λ)·tf/dl + λ·cf/C
        score(q,d) = Σ_t qtf_t · ln p(t|d)

    over the query's KNOWN terms (unknown terms drop, the engine-wide
    rule). Unlike Dirichlet there is NO per-doc constant — an unmatched
    term contributes exactly ln(λ·cf/C) — so the matched-postings
    decomposition is two terms, not three:

        score = Σ_matched qtf·ln(1 + (1-λ)/λ · (tf/dl)/(cf/C))
              + Σ_known  qtf·ln(λ·cf/C)                    (per-query const)

    Plan: identical skeleton to qlm_topk — tiny per-query term table
    (with its background stat riding along) broadcast against postings,
    one partial+final agg per (query, doc); candidates = docs matching
    ≥1 known term. Float discipline: per-row ln/div sequences are pinned
    identically in the DuckDB twin (``1.0 + 9.0 * tf / dl / bg`` with
    bg = cf/C computed once per query term); the accumulated sum spans a
    query's few matched terms, the long-green qlm risk profile."""
    from .querying import topk_per_query

    lam = JM_LAMBDA
    ratio = JM_RATIO
    coll = dl_df.agg(F.sum("dl").cast("double").alias("coll_len"))
    q = (
        qterms.join(term_stats.select("term", "cf"), "term", "inner")
        .crossJoin(F.broadcast(coll))
        .select(
            "query_id",
            "term",
            "qtf",
            (F.col("cf") / F.col("coll_len")).alias("bg"),
        )
    )
    qconst = q.groupBy("query_id").agg(
        F.sum(F.col("qtf") * F.log(F.lit(lam) * F.col("bg"))).alias("qc")
    )
    matched = (
        tf_df.join(F.broadcast(q), "term", "inner")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + F.lit(ratio) * F.col("tf") / F.col("dl") / F.col("bg")
                )
            ).alias("ms")
        )
    )
    scored = matched.join(F.broadcast(qconst), "query_id").select(
        "query_id", "doc_id", (F.col("ms") + F.col("qc")).alias("score")
    )
    return topk_per_query(scored, k)


PASSAGE_SIZE = 32    # tokens per passage window
PASSAGE_STRIDE = 16  # window stride (50% overlap)


def passage_topk(
    qterms: DataFrame,
    docs: DataFrame,
    k: int = 10,
    size: int = PASSAGE_SIZE,
    stride: int = PASSAGE_STRIDE,
) -> DataFrame:
    """Passage-level BM25 retrieval (the RAG/unified-highlighter shape:
    rank PASSAGES, return their documents) → DF[query_id, rank, doc_id,
    passage_id, score]: every document splits into overlapping token
    windows (size 32, stride 16; starts 0, 16, 32, … — the last window
    may be short), and standard BM25 runs over the PASSAGE corpus —
    passage df/idf, passage lengths, passage avg length — with the
    flagship's k1/b and op sequence. Top-k per query under
    (round6(score) DESC, doc_id ASC, passage_id ASC).

    Why an operator and not a post-step: a RAG pipeline retrieves the
    best CHUNK, not the best document — chunk-granularity stats change
    both idf and length normalization, so this cannot be derived from
    the document-level entry's output.

    100 TB shape: windowing is a map-side array transform on the one
    tokenize pass (overlap factor = size/stride = 2× postings, the known
    cost of sliding windows); everything downstream is the flagship plan
    with (doc_id, passage_id) as the document key — same shuffles, same
    broadcast query table. The windowed token arrays never materialize
    through a shuffle: tf aggregation collapses them in the same stage
    that explodes them."""
    from .querying import topk_per_query  # noqa: F401  (shape reference)

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col("text").alias("toks"),
    ).filter(F.size("toks") > 0)
    # starts 0, 16, …, largest multiple of `stride` < n_tokens; (n-1) div
    # stride is non-negative here (size > 0 filter), so Spark `div` ==
    # DuckDB `//` (the geotile non-negative-operands precedent).
    pass_arr = F.transform(
        F.sequence(F.lit(0), ((F.size("toks") - 1) / stride).cast("long")),
        lambda s: F.slice(F.col("toks"), s * stride + 1, size),
    )
    passages = toks.select(
        "doc_id", F.posexplode(pass_arr)
    ).withColumnsRenamed({"pos": "passage_id", "col": "ptoks"})
    occ = passages.select(
        "doc_id", "passage_id", F.size("ptoks").alias("pl"),
        F.explode("ptoks").alias("term"),
    )
    ptf = occ.groupBy("doc_id", "passage_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("pl").alias("pl")
    )
    pstats = passages.agg(
        F.count(F.lit(1)).cast("double").alias("n_p"),
        (F.sum(F.size("ptoks")).cast("double") / F.count(F.lit(1))).alias("avgpl"),
    )
    pdf = ptf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = pdf.crossJoin(F.broadcast(pstats)).select(
        "term",
        F.log(
            F.lit(1.0) + (F.col("n_p") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgpl",
    )
    q = qterms.join(idf, "term", "inner")
    scored = (
        ptf.join(F.broadcast(q), "term", "inner")
        .groupBy("query_id", "doc_id", "passage_id")
        .agg(
            F.sum(
                F.col("qtf") * F.col("idf") * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("pl") / F.col("avgpl"))
                )
            ).alias("score")
        )
    )
    from .stats import round6

    w = Window.partitionBy("query_id").orderBy(
        round6("score").desc(), F.asc("doc_id"), F.asc("passage_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "passage_id", "score")
    )
