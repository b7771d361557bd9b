"""Search-engine extension operators, batch 2 (round 3): infix wildcards,
Lucene-SynonymQuery blended scoring, significant-terms facet analysis, and
forward-index term vectors.

All four follow the engine invariants: pinned tokenizer, no per-row Python
UDFs (everything here is pure Catalyst), deterministic total order
(score DESC, then id/term ASC), floats rounded to 6 decimals at the catalog
boundary with any order-sensitive arithmetic kept exact (integer products
before the single double division in significant_terms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .tokenize import tokens_col


def expand_wildcard_queries(
    spark: SparkSession,
    wilds: list[tuple[int, str, str]],
    term_stats: DataFrame,
) -> DataFrame:
    """Infix wildcard (``pre*suf``) query expansion via the dictionary →
    qterms DF[query_id, term, qtf=1] — Lucene WildcardQuery semantics with
    a single inner ``*``: every vocabulary term that starts with ``pre``,
    ends with ``suf`` and is long enough that the two anchors don't overlap
    becomes a disjunctive query term.

    Plan: same shape as the prefix/suffix entries — the tiny wildcard set
    broadcasts against ONE linear (term) dictionary scan with the
    startswith/endswith/length predicate fused into the scan. At 10^12-doc
    vocabulary sizes this stays a single narrow-column map stage; Lucene's
    automaton-over-sorted-terms is the upgrade path if wildcards dominated.
    """
    w = spark.createDataFrame(
        [(int(i), p, s) for i, p, s in wilds],
        "query_id int, pre string, suf string",
    )
    cond = (
        F.col("term").startswith(F.col("pre"))
        & F.col("term").endswith(F.col("suf"))
        & (F.length("term") >= F.length("pre") + F.length("suf"))
    )
    return (
        term_stats.select("term")
        .join(F.broadcast(w), cond, "inner")
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )


def expand_wildcard_indexed(
    spark: SparkSession,
    wilds: list[tuple[int, str, str]],
    dict_sorted: DataFrame,
) -> DataFrame:
    """``expand_wildcard_queries`` over the term-sorted dictionary sidecar:
    the ``pre`` anchors become pushed prefix ranges on the sorted scan
    (PushedFilters GreaterThanOrEqual/LessThan), the ``suf``/length residual
    is the broadcast-join re-check — Lucene's automaton-common-prefix seek
    re-expressed as a range-pruned columnar scan."""
    from .querying import prefix_range_pred

    w = spark.createDataFrame(
        [(int(i), p, s) for i, p, s in wilds],
        "query_id int, pre string, suf string",
    )
    cand = dict_sorted.select("term").filter(
        prefix_range_pred(F.col("term"), [p for _, p, _ in wilds])
    )
    cond = (
        F.col("term").startswith(F.col("pre"))
        & F.col("term").endswith(F.col("suf"))
        & (F.length("term") >= F.length("pre") + F.length("suf"))
    )
    return (
        cand.join(F.broadcast(w), cond, "inner")
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )


_TOKEN_ALPHABET = "0123456789_abcdefghijklmnopqrstuvwxyz"


def fuzzy_band_prefixes(q: str, max_edits: int = 2) -> list[str]:
    """The ≤2-char prefixes a term within ``max_edits`` Levenshtein edits of
    ``q`` can start with — the SOUND band for a sorted-dictionary fuzzy
    scan (a one/two-level unrolling of Lucene's Levenshtein-automaton
    intersection with the term dict).

    For each candidate prefix p (|p| ≤ 2 over the token alphabet) compute
    the standard DP row of lev(p, ·) against q; min over the row = the
    cheapest way to align p against ANY prefix of q, i.e. a lower bound on
    lev(t, q) for every term t starting with p — prune p when it exceeds
    the budget. 1-char entries are kept only as COMPLETE terms (their
    viable extensions are covered by the 2-char entries), so membership
    tests run against p2 = substring(term, 1, 2): 1-char terms match their
    own 1-char band entry, everything else its 2-char prefix. 37² DP rows,
    driver-side, microseconds."""

    def next_row(row: list[int], c: str) -> list[int]:
        nr = [row[0] + 1]
        for j in range(1, len(q) + 1):
            nr.append(min(nr[j - 1] + 1, row[j] + 1,
                          row[j - 1] + (q[j - 1] != c)))
        return nr

    row0 = list(range(len(q) + 1))
    out = set()
    for c1 in _TOKEN_ALPHABET:
        r1 = next_row(row0, c1)
        if r1[-1] <= max_edits:
            out.add(c1)  # the 1-char term c1 itself is within budget
        if min(r1) > max_edits:
            continue  # no term starting with c1 can be within budget
        for c2 in _TOKEN_ALPHABET:
            if min(next_row(r1, c2)) <= max_edits:
                out.add(c1 + c2)
    return sorted(out)


def expand_fuzzy_indexed(
    spark: SparkSession,
    fuzzies: list[tuple[int, str]],
    dict_sorted: DataFrame,
    max_edits: int = 2,
) -> DataFrame:
    """``expand_fuzzy_queries`` over the term-sorted dictionary sidecar:
    candidates are restricted to the union of the queries' sound prefix
    bands via ONE pushed In(p2, [...]) filter (the sidecar stores
    p2 = substring(term,1,2); term-sorted files are p2-sorted, so row-group
    stats prune), then the exact levenshtein re-check assigns query ids.
    Typical band ≈ 15-25% of the vocabulary for maxEdits=2 — bounded and
    scan-pruned, vs. the full linear scan of the logical path."""
    band = sorted(
        set().union(*(fuzzy_band_prefixes(t, max_edits) for _, t in fuzzies))
    )
    fz = spark.createDataFrame(
        [(int(i), s) for i, s in fuzzies], "query_id int, fterm string"
    )
    cand = dict_sorted.select("term").filter(F.col("p2").isin(band))
    return (
        cand.join(
            F.broadcast(fz),
            F.levenshtein(F.col("term"), F.col("fterm")) <= max_edits,
            "inner",
        )
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )


def regex_literal_prefixes(pat: str) -> list[str] | None:
    """Literal term prefixes implied by an ANCHORED regexp, or None when the
    pattern admits arbitrary starts (unanchored / leading metachar) — the
    regexp analog of Lucene's automaton common-prefix extraction.

    ``^(join|merge)$`` → ['join', 'merge']; ``^s.*t$`` → ['s'];
    ``a.*a`` / ``^.{3}$`` → None (full scan is genuinely required)."""
    import re as _re

    if not pat.startswith("^"):
        return None
    body = pat[1:]
    alt = _re.fullmatch(r"\(([a-z0-9_]+(?:\|[a-z0-9_]+)*)\)\$?", body)
    if alt:
        return alt.group(1).split("|")
    lit = _re.match(r"[a-z0-9_]+", body)
    return [lit.group(0)] if lit else None


def expand_regexp_indexed(
    spark: SparkSession,
    regexes: list[tuple[int, str]],
    dict_sorted: DataFrame,
) -> DataFrame:
    """``expand_regexp_queries`` over the term-sorted dictionary sidecar:
    anchored patterns contribute pushed literal-prefix ranges; any pattern
    with no extractable prefix keeps the full scan for the whole batch
    (its match set genuinely spans the vocabulary). The rlike re-check is
    unchanged, so output ≡ the logical path."""
    from .querying import prefix_range_pred

    prefix_sets = [regex_literal_prefixes(p) for _, p in regexes]
    if all(ps is not None for ps in prefix_sets):
        pred = prefix_range_pred(
            F.col("term"), [p for ps in prefix_sets for p in ps]
        )
    else:
        pred = F.lit(True)
    rx = spark.createDataFrame(
        [(int(i), p) for i, p in regexes], "query_id int, pat string"
    )
    return (
        dict_sorted.select("term").filter(pred)
        .join(F.broadcast(rx), F.expr("rlike(term, pat)"), "inner")
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )


def _idf_from_df(df_c: Column, n_docs_c: Column) -> Column:
    """The engine's BM25 idf as a function of df — shared by stats.with_idf
    (per-term) and the synonym path (per-GROUP, from the blended df)."""
    return F.log(
        F.lit(1.0) + (n_docs_c - df_c + F.lit(0.5)) / (df_c + F.lit(0.5))
    )


def synonym_topk(
    spark: SparkSession,
    syn_queries: list[tuple[int, list[list[str]]]],
    tf_df: DataFrame,
    term_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Lucene SynonymQuery-style blended retrieval → DF[query_id, rank,
    doc_id, score]: each query is a list of synonym GROUPS; a group scores
    as if its members were one term — tf blends additively across members
    (tf_g = Σ member tf in the doc) and the group's document frequency is
    the max member df (Lucene SynonymQuery.docFreq), so one idf per group.
    Group members absent from the corpus simply drop (unknown-term rule);
    a group with no present member contributes nothing.

    Plan: the (tiny) (query, group, term) table broadcasts against the
    postings for the member-term fetch (the big side never shuffles for the
    join); blending is one groupBy(query, group, doc) partial+final agg; the
    per-group idf comes from a broadcast join of the same table against the
    dictionary. Two shuffles total, both on (query, group/doc) keys.
    """
    from .querying import topk_per_query

    rows = [
        (int(qid), gi, t)
        for qid, groups in syn_queries
        for gi, group in enumerate(groups)
        for t in group
    ]
    syn = spark.createDataFrame(rows, "query_id int, group_id int, term string")

    # per-group blended df → idf (groups × members rows: tiny, broadcastable;
    # term_stats already carries n_docs/avgdl from with_idf's stats crossJoin)
    gidf = (
        syn.join(term_stats.select("term", "df", "n_docs", "avgdl"), "term")
        .groupBy("query_id", "group_id")
        .agg(
            F.max("df").alias("df_g"),
            F.max("n_docs").alias("n_docs"),
            F.max("avgdl").alias("avgdl"),
        )
        .select(
            "query_id",
            "group_id",
            _idf_from_df(F.col("df_g"), F.col("n_docs")).alias("idf_g"),
            "avgdl",
        )
    )

    blended = (
        tf_df.join(F.broadcast(syn), "term", "inner")
        .groupBy("query_id", "group_id", "doc_id")
        .agg(F.sum("tf").alias("tf_g"), F.max("dl").alias("dl"))
    )
    contrib = blended.join(F.broadcast(gidf), ["query_id", "group_id"]).select(
        "query_id",
        "doc_id",
        (
            F.col("idf_g")
            * (F.col("tf_g") * F.lit(BM25_K1 + 1.0))
            / (
                F.col("tf_g")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
            )
        ).alias("s"),
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))
    return topk_per_query(scored, k)


def significant_terms(
    docs: DataFrame,
    tf_df: DataFrame,
    term_stats: DataFrame,
    stats: DataFrame,
    facet_col: str = "lang",
    min_df: int = 5,
    k: int = 10,
) -> DataFrame:
    """Significant-terms facet aggregation (the Elasticsearch
    significant_terms analog) → DF[facet, rank, term, df_fg, score]: for
    each facet value, the top-k terms most overrepresented in the facet's
    documents vs the whole corpus, by foreground/background lift
    score = (df_fg / n_fg) / (df_bg / N).

    Determinism: both ratios are integer-valued counts, so the score is
    computed as ONE double division of two exact long products — no
    accumulation-order sensitivity — then rounded to 6 decimals; rank
    tie-break is (score DESC, df_fg DESC, term ASC).

    Plan: df_fg is a postings ⋈ forward-index join (co-partitioned on
    doc_id at scale — same shape as the facets entry) into ONE
    groupBy(facet, term) map-combinable count; facet sizes and the
    background df/N are broadcast onto the (≤ facets × vocab)-sized result.
    """
    fg = (
        tf_df.select("doc_id", "term")
        .join(docs.select("doc_id", F.col(facet_col).alias("facet")), "doc_id")
        .groupBy("facet", "term")
        .agg(F.count(F.lit(1)).alias("df_fg"))
        .filter(F.col("df_fg") >= min_df)
    )
    n_fg = docs.groupBy(F.col(facet_col).alias("facet")).agg(
        F.count(F.lit(1)).alias("n_fg")
    )
    scored = (
        fg.join(F.broadcast(n_fg), "facet")
        .join(F.broadcast(term_stats.select("term", F.col("df").alias("df_bg"))), "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "facet",
            "term",
            "df_fg",
            F.round(
                (F.col("df_fg") * F.col("n_docs")).cast("double")
                / (F.col("df_bg") * F.col("n_fg")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("facet").orderBy(
        F.desc("score"), F.desc("df_fg"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("facet", "rank", "term", "df_fg", "score")
    )


def term_vectors(docs: DataFrame, doc_ids: list[int]) -> DataFrame:
    """Forward-index term-vector API (Lucene TermVectors / ES termvectors
    endpoint) → DF[doc_id, term, tf, first_pos] for a small doc set:
    per-term frequency plus the 1-based position of the first occurrence.

    Plan: the doc_id IN filter pushes to the parquet scan, so only the
    requested docs are tokenized; posexplode + one groupBy(doc, term) — at
    any corpus size the work is O(requested docs), not O(corpus)."""
    ids = [int(d) for d in doc_ids]
    toks = (
        docs.filter(F.col("doc_id").isin(ids))
        .select(F.col("doc_id").cast("long").alias("doc_id"), tokens_col("text").alias("toks"))
        .select("doc_id", F.posexplode("toks").alias("pos", "term"))
    )
    return toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        (F.min("pos") + F.lit(1)).cast("long").alias("first_pos"),
    )


def expand_fuzzy_queries(
    spark: SparkSession,
    fuzzies: list[tuple[int, str]],
    term_stats: DataFrame,
    max_edits: int = 2,
) -> DataFrame:
    """Fuzzy query expansion (Lucene FuzzyQuery, maxEdits=2 default) via the
    dictionary → qterms DF[query_id, term, qtf=1]: every vocabulary term
    within ``max_edits`` Levenshtein edits of the query term becomes a
    disjunctive query term.

    Plan: the tiny fuzzy set broadcasts against one linear dictionary scan
    with the levenshtein predicate fused in — the same shape as
    prefix/suffix/wildcard. Lucene's Levenshtein automaton intersection with
    the sorted term dict is the upgrade path if fuzzy queries dominated; the
    spell-correction entry (query_suggestions) already shares this scan."""
    fz = spark.createDataFrame(
        [(int(i), s) for i, s in fuzzies], "query_id int, fterm string"
    )
    return (
        term_stats.select("term")
        .join(
            F.broadcast(fz),
            F.levenshtein(F.col("term"), F.col("fterm")) <= max_edits,
            "inner",
        )
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )


def expand_regexp_queries(
    spark: SparkSession,
    regexes: list[tuple[int, str]],
    term_stats: DataFrame,
) -> DataFrame:
    """Regexp query expansion (Lucene RegexpQuery) via the dictionary →
    qterms DF[query_id, term, qtf=1]: every vocabulary term matching the
    pattern (substring semantics — anchor with ^$ for whole-term) becomes a
    disjunctive query term. Same broadcast-vs-linear-dictionary-scan plan."""
    rx = spark.createDataFrame(
        [(int(i), p) for i, p in regexes], "query_id int, pat string"
    )
    return (
        term_stats.select("term")
        .join(F.broadcast(rx), F.expr("rlike(term, pat)"), "inner")
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_counters(
    tf_df: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of collection term frequencies →
    DF[row, bucket, cnt]: ``depth`` hash rows × ``width`` counters, each
    counter the exact sum of tf over every term hashing into it. Hash row i
    of term t is h60(i || ':' || t) % width — data-derived (the engine's
    no-rand invariant), so the sketch is byte-identical across engines,
    retries and partitionings.

    This is the bounded-memory heavy-hitter structure for 10^12-doc
    streams: the aggregation is map-combinable (depth × width partial
    states per task, here 1024 longs) no matter how large the vocabulary —
    the full dictionary never materializes."""
    from .textpipe import h60

    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    keyed = tf_df.select("term", "tf", rows).select(
        "row",
        F.pmod(
            h60(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("term"))),
            F.lit(width),
        ).alias("bucket"),
        "tf",
    )
    return keyed.groupBy("row", "bucket").agg(F.sum("tf").cast("long").alias("cnt"))


def cms_term_estimates(
    tf_df: DataFrame,
    term_stats: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query every dictionary term against the sketch →
    DF[term, cf_true, cf_est]: cf_est = min over rows of the term's
    counter, with the CMS guarantee cf_est ≥ cf_true (collisions only ever
    inflate). The dictionary side broadcasts its (term, row, bucket) probes
    against the (depth × width)-row counter table — both sides tiny, the
    only big-data pass is the counter build itself."""
    from .textpipe import h60

    counters = cms_counters(tf_df, depth, width)
    probes = term_stats.select("term", F.col("cf").cast("long").alias("cf_true")).select(
        "term",
        "cf_true",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    ).select(
        "term",
        "cf_true",
        "row",
        F.pmod(
            h60(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("term"))),
            F.lit(width),
        ).alias("bucket"),
    )
    return (
        probes.join(counters, ["row", "bucket"])
        .groupBy("term", "cf_true")
        .agg(F.min("cnt").alias("cf_est"))
    )


def percolate(qterms: DataFrame, tf_df: DataFrame) -> DataFrame:
    """Reverse search (the Elasticsearch percolator / Lucene Monitor):
    given the corpus and a set of STORED conjunctive queries, emit every
    (query_id, doc_id) where the doc contains ALL of the query's terms —
    the index-time alerting primitive ("which saved searches does this new
    document trigger?").

    Plan: the stored-query term table (queries ≪ corpus, by definition of
    the feature) broadcasts against the postings; rows of tf_df are
    already distinct per (term, doc), so the per-(query, doc) hit count is
    a plain map-combinable count compared against the per-query required
    count (1-row-per-query broadcast). Per-doc work is bounded by the
    doc's matched terms — the plan is a transpose of the conjunctive
    retrieval path and survives 100× the same way."""
    qd = qterms.select("query_id", "term").distinct()
    nreq = qd.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_req"))
    hits = (
        tf_df.join(F.broadcast(qd), "term", "inner")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.join(F.broadcast(nreq), "query_id")
        .filter(F.col("n_hit") == F.col("n_req"))
        .select("query_id", "doc_id")
    )


def sort_by_field_topk(
    qterms: DataFrame,
    tf_df: DataFrame,
    docs: DataFrame,
    field: str = "n_chars",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Lucene ``Sort``-by-field retrieval → DF[query_id, rank, doc_id,
    <field>]: candidates are the docs matching ≥1 query term (the standard
    disjunctive match set), but ranked by a stored document field instead
    of relevance — field DESC, doc_id ASC, top-k per query (the "newest
    matching documents" pattern).

    Plan: match set = broadcast query terms against postings with a
    DISTINCT (query, doc) projection (no scoring work at all); the sort
    key joins from the forward index on doc_id; per-query top-k is the
    standard bounded window. At scale the field join is doc_id-keyed and
    candidate-restricted — never corpus × queries."""
    from pyspark.sql.window import Window

    qd = qterms.select("query_id", "term").distinct()
    matched = (
        tf_df.join(F.broadcast(qd), "term", "inner")
        .select("query_id", "doc_id")
        .distinct()
    )
    keyed = matched.join(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), field), "doc_id"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(field), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", field)
    )


# ------------------------------------------------- round-4 session-7

PS_MAX_EDITS = 2
PS_TOPN = 3
#: "did you mean" inputs: one misspelled slot per query (transpositions are
#: levenshtein-2 — both engines implement CLASSIC levenshtein, no Damerau),
#: plus one all-correct query (the suggester should keep it on top).
PS_QUERIES = [
    (1, "hsah join"),
    (2, "sort mrege"),
    (3, "group scna"),
    (4, "window agg"),
]


def phrase_suggest(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    max_edits: int = PS_MAX_EDITS,
    topn: int = PS_TOPN,
) -> DataFrame:
    """ES ``phrase`` suggester ("did you mean") → DF[query_id, rank,
    suggestion, score]: per-slot spell candidates (vocabulary terms within
    levenshtein ``max_edits``, distance 0 included) re-ranked as WHOLE
    PHRASES by an add-one bigram language model — the component that makes
    phrase suggestion beat term-by-term correction ("sort mrege" →
    "sort merge" because the bigram is frequent, not because "merge" is
    the closest word):

        score(w1 w2) = round9(ln((uc1+1)/(T+V))) + round9(ln((bc+1)/(uc1+V)))

    (unigram prior + conditional; uc = corpus unigram count, bc = bigram
    count, T = token count, V = vocabulary). Both lns ride the round9→
    decimal(28,9) quantize, the sum is a 2-term decimal add, so ranking
    compares exact decimals (the nb_lang_confusion discipline); ties break
    (w1 ASC, w2 ASC). ES's collate/real-word-error heuristics are
    confidence knobs on top of this same candidate×LM core.

    Scale shape: unigram/bigram counts are the bigram_xent map-combinable
    aggregations (vocabulary²-bounded outputs); candidate generation is a
    |queries|·|vocab| levenshtein filter — the spell-correction linear
    dictionary scan, range-prunable by length/prefix exactly like the
    fuzzy entries; everything after is broadcast-tiny."""
    qs = PS_QUERIES if queries is None else queries
    from .tokenize import py_tokenize

    qrows = []
    for qid, text in qs:
        t = py_tokenize(text)
        assert len(t) == 2, f"phrase_suggest fixture queries are bigrams: {text}"
        qrows.append((qid, t[0], t[1]))
    qdf = spark.createDataFrame(qrows, "query_id long, t1 string, t2 string")

    toks = docs.select(tokens_col(F.col("text")).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("uc"))
        .persist()
    )
    tv = uni.agg(
        F.sum("uc").cast("long").alias("t_tokens"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - 1),
        lambda i: F.concat_ws(
            "|", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
        ),
    )
    big = (
        toks.select(
            F.when(F.size("toks") >= 2, grams)
            .otherwise(F.array().cast("array<string>"))
            .alias("g")
        )
        .select(F.explode("g").alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
    )
    c1 = qdf.crossJoin(F.broadcast(uni.select(F.col("term").alias("w1"), F.col("uc").alias("uc1")))).filter(
        F.levenshtein("t1", "w1") <= max_edits
    )
    c2 = qdf.select("query_id", "t2").crossJoin(
        F.broadcast(uni.select(F.col("term").alias("w2")))
    ).filter(F.levenshtein("t2", "w2") <= max_edits)
    pairs = (
        c1.join(c2, "query_id")
        .crossJoin(F.broadcast(tv))
        .join(
            F.broadcast(big),
            F.concat_ws("|", F.col("w1"), F.col("w2")) == F.col("bg"),
            "left",
        )
        .select(
            "query_id", "w1", "w2",
            (
                F.round(
                    F.log(
                        (F.col("uc1") + 1).cast("double")
                        / (F.col("t_tokens") + F.col("v")).cast("double")
                    ),
                    9,
                ).cast("decimal(28,9)")
                + F.round(
                    F.log(
                        (F.coalesce(F.col("bc"), F.lit(0)) + 1).cast("double")
                        / (F.col("uc1") + F.col("v")).cast("double")
                    ),
                    9,
                ).cast("decimal(28,9)")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("w1"), F.asc("w2")
    )
    from .stats import round6

    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("suggestion"),
            round6(F.col("s").cast("double")).alias("score"),
        )
    )


def phrase_suggest_sql(topn: int = PS_TOPN, max_edits: int = PS_MAX_EDITS) -> str:
    """DuckDB twin — query VALUES generated from the SAME py_tokenize parse."""
    from .tokenize import py_tokenize

    vals = []
    for qid, text in PS_QUERIES:
        t = py_tokenize(text)
        vals.append(f"({qid}, '{t[0]}', '{t[1]}')")
    return f"""WITH tokd AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ts
  FROM documents
),
uni AS (
  SELECT unnest(ts) AS term FROM tokd
),
uc AS (SELECT term, COUNT(*) AS uc FROM uni GROUP BY 1),
tv AS (SELECT SUM(uc) AS t_tokens, COUNT(*) AS v FROM uc),
big AS (
  SELECT unnest(CASE WHEN len(ts) >= 2
    THEN list_transform(generate_series(1, len(ts) - 1), i -> ts[i] || '|' || ts[i+1])
    ELSE [] END) AS bg
  FROM tokd
),
bc AS (SELECT bg, COUNT(*) AS bc FROM big GROUP BY 1),
q(query_id, t1, t2) AS (VALUES {', '.join(vals)}),
c1 AS (
  SELECT q.query_id, q.t2, u.term AS w1, u.uc AS uc1
  FROM q JOIN uc u ON levenshtein(q.t1, u.term) <= {max_edits}
),
c2 AS (
  SELECT q.query_id, u.term AS w2
  FROM q JOIN uc u ON levenshtein(q.t2, u.term) <= {max_edits}
),
pairs AS (
  SELECT c1.query_id, c1.w1, c2.w2,
         CAST(ROUND(ln(CAST(c1.uc1 + 1 AS DOUBLE) / CAST(tv.t_tokens + tv.v AS DOUBLE)), 9) AS DECIMAL(28,9))
         + CAST(ROUND(ln(CAST(COALESCE(b.bc, 0) + 1 AS DOUBLE) / CAST(c1.uc1 + tv.v AS DOUBLE)), 9) AS DECIMAL(28,9)) AS s
  FROM c1 JOIN c2 USING (query_id)
  CROSS JOIN tv
  LEFT JOIN bc b ON b.bg = c1.w1 || '|' || c2.w2
),
ranked AS (
  SELECT query_id, w1, w2, s,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, w1 ASC, w2 ASC) AS rnk
  FROM pairs
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       w1 || ' ' || w2 AS suggestion,
       CAST(ROUND(CAST(CAST(s AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
FROM ranked WHERE rnk <= {topn}"""


SIG_TEXT_FG_TERM = "merge"  # pinned foreground query (fixture-vocab-stable)
SIG_TEXT_MIN_DF = 3


def significant_text(
    docs: DataFrame,
    min_df: int = SIG_TEXT_MIN_DF,
    fg_term: str = SIG_TEXT_FG_TERM,
    k: int = 10,
) -> DataFrame:
    """ES ``significant_text`` aggregation → DF[rank, term, df_fg, df_bg,
    score]: significant terms computed from the raw TEXT of a query's
    hits — the two behaviors that distinguish it from significant_terms:

      * the foreground is the HIT SET of a query (here the pinned term
        query ``fg_term``), not a stored facet field;
      * ``filter_duplicate_text`` (the ES default here): exact-duplicate
        documents are collapsed BEFORE any counting — near-copy boiler-
        plate otherwise dominates the "significant" list. Survivor =
        min doc_id per sha256(text), the engine-wide dedup rule; both
        foreground AND background df are computed over the deduped
        corpus, so the lift is self-consistent.

    score = (df_fg · N) / (df_bg · n_fg) as ONE double division of exact
    long products (the significant_terms discipline), round6; order
    (score DESC, df_fg DESC, term ASC).

    Plan: dedup is the exact-dedup hash agg; tokenization runs ONCE over
    survivors; fg membership is a semi-join of the survivor postings on
    the query term — all map-combinable aggs over postings-sized data."""
    from .tokenize import tokens_col

    surv = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.sha2(F.col("text"), 256).alias("h"),
        )
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    toks = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .join(surv, "doc_id")
        .select("doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("term"))
    )
    fg_docs = toks.filter(F.col("term") == fg_term).select("doc_id")
    n_all = toks.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_fg = fg_docs.agg(F.count(F.lit(1)).alias("n_fg"))
    df_bg = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df_bg"))
    df_fg = (
        toks.join(fg_docs, "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_fg"))
        .filter(F.col("df_fg") >= min_df)
    )
    from .stats import round6

    scored = (
        df_fg.join(df_bg, "term")
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(n_fg))
        .select(
            "term", "df_fg", "df_bg",
            round6(
                (F.col("df_fg") * F.col("n_docs")).cast("double")
                / (F.col("df_bg") * F.col("n_fg"))
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.desc("df_fg"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("long").alias("rank"), "term",
            F.col("df_fg").cast("long").alias("df_fg"),
            F.col("df_bg").cast("long").alias("df_bg"), "score",
        )
    )


SIGNIFICANT_TEXT_SQL = f"""WITH surv AS (
  SELECT MIN(CAST(doc_id AS BIGINT)) AS doc_id
  FROM documents GROUP BY sha256(text)
),
toks AS (
  SELECT d.doc_id, t.term FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> ''
           ))) AS term
    FROM documents
  ) t JOIN surv d ON t.doc_id = d.doc_id
),
fg_docs AS (SELECT doc_id FROM toks WHERE term = '{SIG_TEXT_FG_TERM}'),
n_all AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
n_fg AS (SELECT COUNT(*) AS n_fg FROM fg_docs),
df_bg AS (SELECT term, COUNT(*) AS df_bg FROM toks GROUP BY 1),
df_fg AS (
  SELECT term, COUNT(*) AS df_fg
  FROM toks JOIN fg_docs USING (doc_id)
  GROUP BY 1 HAVING COUNT(*) >= {SIG_TEXT_MIN_DF}
),
scored AS (
  SELECT f.term, f.df_fg, b.df_bg,
         CAST(ROUND(CAST(
           CAST(f.df_fg * (SELECT n_docs FROM n_all) AS DOUBLE)
           / (b.df_bg * (SELECT n_fg FROM n_fg))
         AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
  FROM df_fg f JOIN df_bg b USING (term)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, df_fg DESC, term ASC) AS rnk
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rank, term, CAST(df_fg AS BIGINT) AS df_fg,
       CAST(df_bg AS BIGINT) AS df_bg, score
FROM ranked WHERE rnk <= 10"""


SPAN_FIRST_END = 10  # Lucene SpanFirstQuery end boundary (positions 0..9)


def span_first_topk(
    qterms: DataFrame, docs: DataFrame, end: int = SPAN_FIRST_END, k: int = 10
) -> DataFrame:
    """Lucene ``SpanFirstQuery`` → DF[query_id, rank, doc_id,
    n_first_hits]: documents where a query term occurs within the first
    ``end`` token positions — the "match near the start" primitive
    (headline/lead-paragraph boosting). Per (query, doc) the score is the
    COUNT of query-term occurrences inside the boundary (Lucene's span
    freq), an exact integer, ranked (n_first_hits DESC, doc_id ASC).

    Plan: one tokenize + posexplode with the position predicate applied
    MAP-SIDE (only the first ``end`` positions of each doc survive the
    explode), then the broadcast query join and one map-combinable
    count. The span family's indexed path (positional blocks) serves
    this at scale by reading only leading positions per posting — this
    logical form is its oracle."""
    from .tokenize import tokens_col

    occ = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(tokens_col("text")).alias("pos", "term"),
    ).filter(F.col("pos") < end)
    q = qterms.select("query_id", "term").distinct()
    scored = (
        occ.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_first_hits"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_first_hits"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "doc_id", "n_first_hits",
        )
    )
