"""Round-4 session-11 catalog entries.

Families added this session (SURVEY.md §11.11):

* training-data curation: soft dedup weighting (SoftDeDup-style loss
  reweighting instead of hard removal), BPE merge training (the tokenizer-
  training word-count + greedy-merge loop, exact-unrolled oracle).
* ES|QL widening: TOP/VALUES/MEDIAN/PERCENTILE aggregates, string
  functions, CIDR/IP functions.
* Lucene/ES query surface: combined_fields, span_containing, the
  deterministic query-profile surface.

Every entry follows the repo invariants: deterministic (no rand / no
wall-clock), h60 for cross-engine hashing, round6 for every float output,
BIGINT casts on both sides, column names identical between the Spark entry
and its DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .catalog_pipeline import (
    MINHASH_CAND_SQL,
    SHINGLE_SQL,
    _TS,
    _docs,
    _r6,
)

# --------------------------------------------------------------- soft dedup


def q_dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup-style duplicate DOWN-WEIGHTING (arXiv:2401.00448 family;
    the alternative to hard removal real pretraining mixes use): every doc
    is kept, but its sampling weight is 1/|near-dup cluster| so each
    distinct content unit contributes one document's worth of loss mass.

    Output per doc: cluster id/size (MinHash+LSH verified components,
    singletons are their own cluster), n_tokens, weight = round6(1/size),
    eff_tokens = round6(n_tokens/size). Scale: the component labels live on
    the pairs-sized graph (graph.connected_components — pointer-jumping,
    O(log n) rounds); attaching them to the corpus is one LEFT join; the
    two divisions are the only float ops and are round6-quantized
    (invariant #3/#5)."""
    from .graph import connected_components
    from .stats import round6
    from .textpipe import minhash_lsh_dedup
    from .tokenize import tokens_col

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_dedup(docs)
    cc = connected_components(pairs)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
    )
    lab = base.join(
        cc.select(
            F.col("node").cast("long").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id")
    sized = lab.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        "n_tokens",
    )
    return sized.select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "n_tokens",
        round6(F.lit(1.0) / F.col("cluster_size")).alias("weight"),
        round6(F.col("n_tokens") / F.col("cluster_size")).alias("eff_tokens"),
    )


def _soft_weights_sql() -> str:
    """DuckDB twin: the shared MinHash/LSH + recursive-closure cluster CTEs
    (same fragments as dedup_clusters), LEFT-joined onto per-doc token
    counts; both divisions mirror the Spark side's single-IEEE-divide +
    round6 discipline."""
    return f"""WITH RECURSIVE {SHINGLE_SQL.strip()},
{MINHASH_CAND_SQL.strip()},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.doc_id_a, p.doc_id_b, COUNT(*) AS i
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_id_a
  JOIN sh b ON b.doc_id = p.doc_id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
jp AS (
  SELECT i.doc_id_a, i.doc_id_b
  FROM inter i
  JOIN cnt ca ON ca.doc_id = i.doc_id_a
  JOIN cnt cb ON cb.doc_id = i.doc_id_b
  WHERE i.i / (ca.n + cb.n - i.i) >= 0.8
),
edges AS (
  SELECT doc_id_a AS u, doc_id_b AS v FROM jp
  UNION
  SELECT doc_id_b AS u, doc_id_a AS v FROM jp
),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
lbl AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
tk AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len({_TS}) AS BIGINT) AS n_tokens
  FROM documents
),
m AS (
  SELECT t.doc_id, t.n_tokens,
         CAST(COALESCE(l.cluster_id, t.doc_id) AS BIGINT) AS cluster_id
  FROM tk t LEFT JOIN lbl l ON l.doc_id = t.doc_id
),
sized AS (
  SELECT doc_id, cluster_id,
         CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
         n_tokens
  FROM m
)
SELECT doc_id, cluster_id, cluster_size, n_tokens,
       {_r6("CAST(1 AS DOUBLE) / cluster_size")} AS weight,
       {_r6("CAST(n_tokens AS DOUBLE) / cluster_size")} AS eff_tokens
FROM sized"""


# ------------------------------------------------------------- BPE training

#: number of merge rounds learned (and unrolled in the oracle).
BPE_MERGES = 8

#: symbol-sequence rendering: every symbol wrapped in its own '|...|' so a
#: plain (non-regex) left-to-right replace() of '|a||b|' -> '|ab|' is EXACTLY
#: the greedy non-overlapping BPE merge step in both engines ('|' can never
#: appear inside a token symbol — tokens are [a-z0-9_]+ runs).


#: lineage guard: localCheckpoint the words frame every this many merge
#: rounds. Each round chains one F.replace onto `cur`; at n_merges in the
#: thousands (production BPE vocabularies) the un-truncated plan nests once
#: per round — the graph.connected_components OOM edge (CLAUDE.md). 16
#: keeps the per-round analyzed plan O(1) while amortizing the checkpoint.
BPE_CHECKPOINT_EVERY = 16


def bpe_train_merges(
    spark: SparkSession, docs: DataFrame, n_merges: int = BPE_MERGES,
    checkpoint_every: int = BPE_CHECKPOINT_EVERY,
    stats_out: dict | None = None,
) -> DataFrame:
    """Deterministic BPE tokenizer training (Sennrich et al. 2016;
    the HF-tokenizers / SentencePiece word-count formulation) →
    DF[merge_rank, left_sym, right_sym, merged, pair_count].

    Phase 1 (distributed, corpus-sized): word frequencies = ONE
    map-combinable groupBy over the pinned tokenizer's tokens — this is the
    only pass that touches the corpus, exactly how real BPE trainers scale
    (count words once, learn merges on the distinct-word table).

    Phase 2 (vocab-sized): ``n_merges`` greedy rounds over the distinct-word
    table. Each round counts adjacent symbol pairs weighted by word
    frequency (ALL adjacent pairs, overlapping included — the reference
    counting), picks argmax on the total order (count DESC, left ASC,
    right ASC), and applies the merge with one literal ``replace``
    (see the '|sym||sym|' rendering note above: plain replace IS the greedy
    non-overlapping merge). The per-round argmax is a 1-row collect —
    merge learning is inherently sequential and the collected row is the
    round's scalar decision, the same driver role graph.connected_components'
    convergence check plays. Words frame is persisted once; each round's
    pair count is a vocab-sized job.

    Determinism: counts are exact integers; ties on the pair count break on
    the pair's symbols (binary ASCII compare in both engines)."""
    from .tokenize import tokens_col

    words = (
        docs.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            # NOTE: F.split uses limit=-1 (keeps trailing empties) and the
            # zero-width lookahead matches at end-of-string, so a trailing
            # '' element must be filtered before joining.
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
        .persist()
    )
    words.count()  # materialize once; every round reads this tiny table
    cur = words
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for r in range(1, n_merges + 1):
            syms = cur.select(
                F.split(
                    F.expr("substring(w, 2, length(w) - 2)"), r"\|\|"
                ).alias("s"),
                "freq",
            )
            pairs = (
                syms.select(
                    "s",
                    "freq",
                    F.explode(
                        F.when(
                            F.size("s") >= 2, F.sequence(F.lit(1), F.size("s") - 1)
                        ).otherwise(F.expr("array()").cast("array<int>"))
                    ).alias("i"),
                )
                .select(
                    F.element_at("s", F.col("i")).alias("a"),
                    F.element_at("s", F.col("i") + 1).alias("b"),
                    "freq",
                )
                .groupBy("a", "b")
                .agg(F.sum("freq").cast("long").alias("cnt"))
            )
            best = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
            if not best:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((r, a, b, a + b, cnt))
            cur = cur.select(
                F.replace(
                    F.col("w"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
                ).alias("w"),
                "freq",
            )
            # lineage guard: without truncation the replace chain nests
            # once per round (the connected_components discipline —
            # persist() does NOT truncate lineage, localCheckpoint does)
            if checkpoint_every and r % checkpoint_every == 0:
                cur = cur.localCheckpoint(eager=True)
            if stats_out is not None:
                stats_out.setdefault("plan_chars", []).append(
                    len(cur._jdf.queryExecution().analyzed().toString())
                )
    finally:
        words.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, merged string, pair_count long",
    )


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train_merges(spark, _docs(spark, sf_dir))


def _bpe_ctes(n_merges: int = BPE_MERGES) -> list[str]:
    """The unrolled BPE training CTE chain (w0 … w{n}, m1 … m{n}) shared
    by the training oracle and the encode oracle (catalog_s11b)."""
    parts = [
        f"""wf AS (
  SELECT t AS term, COUNT(*) AS freq
  FROM (SELECT unnest({_TS}) AS t FROM documents)
  GROUP BY 1
),
w0 AS (
  SELECT '|' || array_to_string(
           list_transform(generate_series(1, length(term)), i -> term[i]),
           '||') || '|' AS w,
         freq
  FROM wf
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(
            f"""p{r} AS (
  SELECT pr.a AS a, pr.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq,
           unnest(list_transform(generate_series(1, len(s) - 1),
                  i -> struct_pack(a := s[i], b := s[i+1]))) AS pr
    FROM (SELECT string_split(substring(w, 2, length(w) - 2), '||') AS s, freq
          FROM w{p})
  )
  GROUP BY 1, 2
),
m{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
w{r} AS (
  SELECT replace(w, '|' || a || '||' || b || '|', '|' || a || b || '|') AS w,
         freq
  FROM w{p}, m{r}
)"""
        )
    return parts


def _bpe_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB twin: the merge loop unrolled as CTE rounds (the Lloyd-chain
    pattern from the IVF/PQ oracles). Same '|sym||sym|' rendering, same
    plain-replace merge step, same (count DESC, pair ASC) argmax."""
    parts = _bpe_ctes(n_merges)
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, cnt AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


# ---------------------------------------------------------- ES|QL widening

ESQL_TOP_QUERY = """
FROM orders
| STATS n = COUNT(*), med = MEDIAN(o_totalprice),
        p90 = PERCENTILE(o_totalprice, 90),
        tops = TOP(o_orderpriority, 3, "asc"),
        vals = VALUES(o_orderpriority) BY o_orderstatus
| EVAL top3 = MV_CONCAT(tops, ","), pris = MV_CONCAT(vals, ",")
| DROP tops, vals
| SORT o_orderstatus
"""


def q_esql_stats_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_TOP_QUERY, spark=spark, sf_dir=sf_dir)


def _pct_sql(p: int) -> str:
    """DuckDB twin of esql._percentile_agg over CTE columns (ls, m):
    exact interpolated percentile at p — identical op sequence (decimal
    grid sort, integer h split, exact-decimal interpolation, round6)."""
    tot = f"(m - 1) * {p}"
    return (
        f"CAST(ROUND(CAST("
        f"ls[CAST(FLOOR(({tot}) / 100.0) AS BIGINT) + 1]"
        f" + (CAST(({tot}) % 100 AS DECIMAL(3,0)) * CAST(0.01 AS DECIMAL(3,2)))"
        f" * (ls[LEAST(CAST(FLOOR(({tot}) / 100.0) AS BIGINT) + 2, m)]"
        f"    - ls[CAST(FLOOR(({tot}) / 100.0) AS BIGINT) + 1])"
        f" AS DECIMAL(28,9)), 6) AS DOUBLE)"
    )


ESQL_TOP_SQL = f"""WITH g AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS BIGINT) AS n,
         list_sort(list(CAST(o_totalprice AS DECIMAL(28,9)))) AS ls,
         array_to_string(list_sort(list(o_orderpriority))[1:3], ',') AS top3,
         array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS pris
  FROM orders GROUP BY 1
),
pc AS (SELECT o_orderstatus, n, top3, pris, len(ls) AS m, ls FROM g)
SELECT o_orderstatus, n,
       {_pct_sql(50)} AS med,
       {_pct_sql(90)} AS p90,
       top3, pris
FROM pc ORDER BY o_orderstatus"""


ESQL_STRINGS_QUERY = """
FROM documents
| WHERE doc_id < 120
| EVAL low = TO_LOWER(text),
       head = LEFT(text, 24),
       tail = RIGHT(text, 9),
       rev = REVERSE(LEFT(low, 12)),
       pos = LOCATE(low, "the"),
       clean = REPLACE(LEFT(low, 40), "[aeiou]", "*"),
       bigger = GREATEST(pos, n_chars % 7),
       smaller = LEAST(pos, 3),
       root = FLOOR(SQRT(TO_DOUBLE(n_chars))),
       up = CEIL(TO_DOUBLE(n_chars) / 7.0),
       trimmed = LENGTH(TRIM(CONCAT(" ", head, "  ")))
| KEEP doc_id, head, tail, rev, pos, clean, bigger, smaller, root, up, trimmed
| SORT doc_id
"""


def q_esql_docs_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_STRINGS_QUERY, spark=spark, sf_dir=sf_dir)


ESQL_STRINGS_SQL = """SELECT CAST(doc_id AS BIGINT) AS doc_id,
  substring(text, 1, 24) AS head,
  substring(text, greatest(length(text) - 8, 1), 9) AS tail,
  reverse(substring(lower(text), 1, 12)) AS rev,
  CAST(strpos(lower(text), 'the') AS BIGINT) AS pos,
  regexp_replace(substring(lower(text), 1, 40), '[aeiou]', '*', 'g') AS clean,
  CAST(greatest(strpos(lower(text), 'the'), n_chars % 7) AS BIGINT) AS bigger,
  CAST(least(strpos(lower(text), 'the'), 3) AS BIGINT) AS smaller,
  CAST(floor(sqrt(CAST(n_chars AS DOUBLE))) AS BIGINT) AS root,
  CAST(ceil(CAST(n_chars AS DOUBLE) / 7.0) AS BIGINT) AS up,
  CAST(length(trim(' ' || substring(text, 1, 24) || '  ')) AS BIGINT) AS trimmed
FROM documents WHERE doc_id < 120 ORDER BY doc_id"""


ESQL_CIDR_QUERY = """
FROM events
| EVAL ip = CONCAT("10.", TO_STRING(event_id % 200), ".",
                   TO_STRING(user_id % 250), ".",
                   TO_STRING((user_id * 7 + event_id) % 256))
| EVAL net = IP_PREFIX(ip, 12),
       hit = TO_LONG(CIDR_MATCH(ip, "10.8.0.0/13", "10.64.0.0/10"))
| STATS n = COUNT(*), users = COUNT_DISTINCT(user_id) BY net, hit
| SORT net, hit
"""


def q_esql_events_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql

    return compile_esql(ESQL_CIDR_QUERY, spark=spark, sf_dir=sf_dir)


#: "10.8.0.0/13" -> base >> 19 = 321; "10.64.0.0/10" -> base >> 22 = 41.
ESQL_CIDR_SQL = """WITH e AS (
  SELECT user_id,
         '10.' || CAST(event_id % 200 AS VARCHAR) || '.' ||
         CAST(user_id % 250 AS VARCHAR) || '.' ||
         CAST((user_id * 7 + event_id) % 256 AS VARCHAR) AS ip
  FROM events
),
i AS (
  SELECT user_id,
         ((10 * 256 + CAST(string_split(ip, '.')[2] AS BIGINT)) * 256
           + CAST(string_split(ip, '.')[3] AS BIGINT)) * 256
           + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipi
  FROM e
),
m AS (
  SELECT user_id, ((ipi >> 20) << 20) AS mi,
         CAST((ipi >> 19) = 321 OR (ipi >> 22) = 41 AS BIGINT) AS hit
  FROM i
)
SELECT CAST(mi >> 24 AS VARCHAR) || '.' || CAST((mi >> 16) % 256 AS VARCHAR)
         || '.' || CAST((mi >> 8) % 256 AS VARCHAR)
         || '.' || CAST(mi % 256 AS VARCHAR) AS net,
       hit,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
FROM m GROUP BY 1, 2 ORDER BY net, hit"""


# ------------------------------------------- combined_fields + span family


def q_combined_fields_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_catalog import K, _round6, _stats_for, reference_queries
    from .querying import parse_queries
    from .rankers import combined_fields_topk

    _, dl_df, ts, _ = _stats_for(spark, sf_dir)
    qterms = parse_queries(spark, reference_queries())
    df = combined_fields_topk(qterms, _docs(spark, sf_dir), dl_df, ts, k=K)
    return df.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _round6("score").alias("score"),
    )


def _combined_fields_sql() -> str:
    """DuckDB twin of rankers.combined_fields_topk: same positional field
    split, integer tf_c/len_c (w_title=2, w_body=1 → len_c = dl +
    min(dl,5)), identical one-expression BM25 op sequence (constants
    repr()-shared: k1+1 = 2.2 exactly)."""
    from .queries_catalog import K, query_values_sql

    return f"""WITH tokd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ts
  FROM documents
),
{query_values_sql()},
occ AS (
  SELECT doc_id, len(ts) AS dl, unnest(ts) AS term,
         unnest(generate_series(1, len(ts))) AS pos
  FROM tokd
),
ctf AS (
  SELECT doc_id, dl, term,
         SUM(CASE WHEN pos <= 5 THEN 2 ELSE 1 END) AS tf_c
  FROM occ GROUP BY 1, 2, 3
),
gstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM tokd WHERE len(ts) > 0),
termstats AS (
  SELECT term,
         LN(1.0 + ((SELECT n_docs FROM gstats) - COUNT(DISTINCT doc_id) + 0.5)
                  / (COUNT(DISTINCT doc_id) + 0.5)) AS idf
  FROM occ GROUP BY 1
),
cavg AS (
  SELECT CAST(SUM(dl * 1 + LEAST(dl, 5) * 1) AS DOUBLE) / COUNT(*) AS avg_c
  FROM tokd, LATERAL (SELECT len(ts) AS dl) WHERE dl > 0
),
contrib AS (
  SELECT q.query_id, f.doc_id,
         q.qtf * t.idf * (f.tf_c * {BM25_K1 + 1.0!r})
           / (f.tf_c + {BM25_K1!r} * (1.0 - {BM25_B!r}
                + {BM25_B!r} * (f.dl * 1 + LEAST(f.dl, 5) * 1) / cavg.avg_c)) AS s
  FROM ctf f
  JOIN q USING (term)
  JOIN termstats t USING (term)
  CROSS JOIN cavg
),
scored AS (SELECT query_id, doc_id, SUM(s) AS score FROM contrib GROUP BY 1, 2),
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


#: (query_id, "big: ordered pair", slop, "little term") — the big span is
#: the minimal ordered (a, b) window with interior gap <= slop; a span
#: survives when the little term occurs INSIDE [pa, pb].
SPANC_QUERIES = [
    (1, "hash join", 6, "merge"),
    (2, "scan filter", 8, "column"),
    (3, "sort merge", 7, "join"),
    (4, "group window", 9, "agg"),
    (5, "order line", 8, "part"),
]


def q_span_containing_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .phrase import span_containing_topk
    from .queries_catalog import K

    return span_containing_topk(_docs(spark, sf_dir), SPANC_QUERIES, k=K)


def _span_containing_sql() -> str:
    """Generated brute-force twin: per query, big spans = (pa, MIN
    qualifying pb) via a group-by over the position self-join (the
    independent formulation of the Spark side's array_min probe), then an
    EXISTS for the little term inside the span."""
    from .queries_catalog import K
    from .tokenize import py_tokenize

    parts = []
    for qid, big, slop, little in SPANC_QUERIES:
        a, b = py_tokenize(big)
        (c,) = py_tokenize(little)
        parts.append(
            f"""SELECT {qid} AS query_id, s.doc_id, COUNT(*) AS n_spans
FROM (
  SELECT av.doc_id, av.pos AS pa, MIN(bv.pos) AS pb
  FROM (SELECT doc_id, pos FROM occ WHERE term = '{a}') av
  JOIN (SELECT doc_id, pos FROM occ WHERE term = '{b}') bv
    ON bv.doc_id = av.doc_id AND bv.pos > av.pos AND bv.pos <= av.pos + {slop + 1}
  GROUP BY 1, 2
) s
WHERE EXISTS (
  SELECT 1 FROM occ c
  WHERE c.term = '{c}' AND c.doc_id = s.doc_id
    AND c.pos >= s.pa AND c.pos <= s.pb
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


# ----------------------------------------- profile + calibration surfaces


def q_query_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query-execution profile (the ES ``_profile`` /
    ``_validate`` surface made value-checkable): per query — resolved and
    unknown term counts, total postings a term-at-a-time scorer touches
    (Σ df over resolved terms), and the candidate-set size (distinct docs
    matching ≥ 1 term). These are exactly the numbers the DAAT/WAND
    entries' pruning is judged against, surfaced as data. All exact
    integers; the token-less reference query drops on both sides
    (parse_queries emits no rows for it — the documented queries.json
    id-9 edge)."""
    from .queries_catalog import _stats_for, reference_queries
    from .querying import parse_queries

    tf_df, _, ts, _ = _stats_for(spark, sf_dir)
    q = parse_queries(spark, reference_queries())
    res = q.join(F.broadcast(ts.select("term", "df")), "term", "left")
    prof = res.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.when(F.col("df").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unknown"),
        F.sum(F.coalesce(F.col("df"), F.lit(0))).cast("long").alias("postings"),
    )
    cand = (
        tf_df.join(F.broadcast(q.select("query_id", "term")), "term")
        .select("query_id", "doc_id")
        .distinct()
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("candidates"))
    )
    return (
        prof.join(cand, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "n_terms",
            "n_unknown",
            "postings",
            F.coalesce(F.col("candidates"), F.lit(0)).cast("long").alias("candidates"),
        )
    )


def _query_profile_sql() -> str:
    from .queries_catalog import TOK_SQL, query_values_sql

    return f"""WITH {TOK_SQL.strip()},
{query_values_sql()},
res AS (SELECT q.query_id, q.term, t.df FROM q LEFT JOIN termstats t USING (term)),
p1 AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(CASE WHEN df IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown,
         CAST(SUM(COALESCE(df, 0)) AS BIGINT) AS postings
  FROM res GROUP BY 1
),
cand AS (
  SELECT q.query_id, COUNT(DISTINCT p.doc_id) AS c
  FROM q JOIN postings p USING (term) GROUP BY 1
)
SELECT CAST(p1.query_id AS BIGINT) AS query_id, n_terms, n_unknown, postings,
       CAST(COALESCE(cand.c, 0) AS BIGINT) AS candidates
FROM p1 LEFT JOIN cand USING (query_id)"""


def q_quality_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the heuristic quality score against the Gopher
    gate (the reliability-diagram table behind Expected Calibration
    Error): decile bins of the round6 score → per-bin count, positives,
    observed pass rate, mean score, |mean − rate| gap. Score sums are
    exact (a round6-grid double casts to decimal(18,6) losslessly — the
    bm25_sampler_agg discipline); rate/mean are ONE division each; the
    bin key floor(score·10) is a single shared IEEE op. Companion to
    quality_auc: AUC grades ranking, this grades the score's use as a
    probability threshold."""
    from .stats import round6
    from .textpipe import gopher_rules, text_quality

    docs = _docs(spark, sf_dir)
    j = (
        text_quality(docs)
        .select("doc_id", "quality_score")
        .join(
            gopher_rules(docs).select(
                "doc_id", F.col("passes").cast("long").alias("y")
            ),
            "doc_id",
        )
    )
    b = j.select(
        F.least(F.floor(F.col("quality_score") * 10.0), F.lit(9))
        .cast("long")
        .alias("bin"),
        "quality_score",
        "y",
    )
    agg = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.col("quality_score").cast("decimal(18,6)")).alias("ssum"),
    )
    rate = round6(F.col("n_pos") / F.col("n"))
    mean = round6(F.col("ssum").cast("double") / F.col("n"))
    return agg.select(
        "bin",
        "n",
        "n_pos",
        rate.alias("rate"),
        mean.alias("mean_score"),
        round6(F.abs(mean - rate)).alias("gap"),
    )


def _quality_ece_sql() -> str:
    from .catalog_pipeline import _gopher_sql

    _sw = "('a','the','of','to','and','in','is','it','on','for')"
    return f"""WITH gp AS ({_gopher_sql()}),
base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len({_TS}) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform({_TS}, x -> length(x))), 0) AS DOUBLE) AS sum_len,
         CAST(len(list_filter({_TS}, x -> x IN {_sw})) AS BIGINT) AS sw
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         {_r6("sum_len / nullif(n_tokens, 0)")} AS mean_token_len,
         {_r6("sw / nullif(n_tokens, 0)")} AS stopword_ratio
  FROM base
),
s AS (
  SELECT CAST(gp.passes AS BIGINT) AS y,
         {_r6("least(r.n_tokens / 100.0, 1.0) * 0.4 + (1.0 - least(abs(r.mean_token_len - 5.0) / 5.0, 1.0)) * 0.3 + least(r.stopword_ratio * 5.0, 1.0) * 0.3")} AS score
  FROM r JOIN gp USING (doc_id)
),
b AS (
  SELECT CAST(LEAST(FLOOR(score * 10.0), 9) AS BIGINT) AS bin, score, y FROM s
),
agg AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
         SUM(CAST(score AS DECIMAL(18,6))) AS ssum
  FROM b GROUP BY 1
)
SELECT bin, n, n_pos,
       {_r6("CAST(n_pos AS DOUBLE) / n")} AS rate,
       {_r6("CAST(ssum AS DOUBLE) / n")} AS mean_score,
       {_r6(f"abs({_r6('CAST(ssum AS DOUBLE) / n')} - {_r6('CAST(n_pos AS DOUBLE) / n')})")} AS gap
FROM agg"""


# ------------------------------------------------------ classic similarity


def q_classic_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene ClassicSimilarity (the pre-BM25 TFIDFSimilarity default) →
    top-k — the deterministic variant: score = coord ·
    Σ_t qtf · idf_c² · √tf / √dl with idf_c = 1 + ln(N/(df+1)) and
    coord = matched/|q| (Lucene's coordination factor). Omitted vs
    Lucene: queryNorm (a per-query constant — rank-neutral) and the
    lossy byte-encoded norm (the deterministic-variant policy: exact
    1/√dl instead of the 8-bit table). √ is IEEE-correctly-rounded and
    ln matches across engines (the bm25/qlm precedent); ranking is on
    the round6-quantized score (invariant #3). Completes the similarity
    family: BM25(+F), Dirichlet, Jelinek-Mercer, VSM, boolean, classic."""
    from .queries_catalog import K, _round6, _stats_for, reference_queries
    from .querying import parse_queries, topk_per_query

    tf_df, _, ts, gs = _stats_for(spark, sf_dir)
    q = parse_queries(spark, reference_queries())
    nq = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("nq"))
    qj = q.join(F.broadcast(ts.select("term", "df")), "term", "inner")
    contrib = tf_df.join(F.broadcast(qj), "term", "inner").crossJoin(
        F.broadcast(gs.select(F.col("n_docs").cast("double").alias("nd")))
    )
    idf_c = F.lit(1.0) + F.log(F.col("nd") / (F.col("df") + F.lit(1.0)))
    s = (
        F.col("qtf")
        * (idf_c * idf_c)
        * F.sqrt(F.col("tf"))
        / F.sqrt(F.col("dl"))
    )
    scored = (
        contrib.select("query_id", "doc_id", s.alias("s"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("ssum"), F.count(F.lit(1)).alias("m"))
        .join(F.broadcast(nq), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("ssum") * F.col("m") / F.col("nq")).alias("score"),
        )
    )
    df = topk_per_query(scored, K)
    return df.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _round6("score").alias("score"),
    )


def _classic_tfidf_sql() -> str:
    from .queries_catalog import K, TOK_SQL, query_values_sql

    return f"""WITH {TOK_SQL.strip()},
{query_values_sql()},
nq AS (SELECT query_id, COUNT(*) AS nq FROM q GROUP BY 1),
contrib AS (
  SELECT q.query_id, p.doc_id,
         q.qtf * ((1.0 + LN((SELECT n_docs FROM gstats) / (t.df + 1.0)))
                  * (1.0 + LN((SELECT n_docs FROM gstats) / (t.df + 1.0))))
              * SQRT(p.tf) / SQRT(d.dl) AS s
  FROM q
  JOIN termstats t USING (term)
  JOIN postings p USING (term)
  JOIN doclen d ON d.doc_id = p.doc_id
),
scored AS (
  SELECT c.query_id, c.doc_id, SUM(c.s) * COUNT(*) / nq.nq AS score
  FROM contrib c JOIN nq ON nq.query_id = c.query_id
  GROUP BY c.query_id, c.doc_id, nq.nq
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


# ----------------------------------------------------------- L2 similarity


def q_ann_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES dense_vector ``similarity: l2_norm`` retrieval → top-k: score =
    1/(1 + ‖q−v‖²) (the ES scoring form), exact brute-force baseline over
    the embeddings table (queries = vec_id < 5, the ann family's pinned
    query set). The squared distance is the dot product of the DIFFERENCE
    vector with itself — reusing the engine↔DuckDB dot-product pairing
    every cosine entry already proves bit-stable, instead of introducing
    a new Σ(x−y)² reduction with its own fold-order channel. round6
    output, (score DESC, vec_id ASC) total order. Completes the ES
    vector-similarity trio: cosine, dot-product (maxsim family), l2."""
    from .stats import round6
    from .vectors import _dot, _vecs

    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    vecs = _vecs(emb)
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dv = F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x - y)
    scored = (
        vecs.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            dv.alias("dv"),
        )
        .select(
            "query_id",
            "vec_id",
            round6(F.lit(1.0) / (F.lit(1.0) + _dot(F.col("dv"), F.col("dv")))).alias(
                "score"
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "score"
        )
    )


def _ann_l2_sql() -> str:
    from .catalog_pipeline import EMB_SQL

    return f"""WITH {EMB_SQL.strip()},
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
d AS (
  SELECT q.query_id, e.vec_id,
         list_transform(generate_series(1, len(e.v)),
                        i -> e.v[i] - q.qv[i]) AS dv
  FROM e, q WHERE e.vec_id <> q.query_id
),
scored AS (
  SELECT query_id, vec_id,
         {_r6("1.0 / (1.0 + list_dot_product(dv, dv))")} AS score
  FROM d
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, vec_id ASC) AS rnk
      FROM scored)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id, score
FROM r WHERE rnk <= 10"""


# ---------------------------------------------------------------- registry


def build_round4_s11a():
    from .queries_catalog import QuerySpec

    return {
        "dedup_soft_weights": QuerySpec(
            q_dedup_soft_weights,
            _soft_weights_sql(),
            "SoftDeDup duplicate down-weighting: keep every doc, sampling "
            "weight = 1/|near-dup cluster| (MinHash+LSH verified components,"
            " singletons weight 1), effective-token accounting — the "
            "loss-reweighting alternative to hard dedup removal",
        ),
        "bpe_train_merges": QuerySpec(
            q_bpe_train_merges,
            _bpe_sql(),
            "BPE tokenizer training: one distributed word-count pass, then "
            f"{BPE_MERGES} greedy merge rounds on the distinct-word table "
            "(all-adjacent pair counts, argmax on count DESC/pair ASC, "
            "plain-replace merge over '|sym||sym|' renderings = exact "
            "greedy non-overlapping semantics) — oracle unrolls every "
            "round as CTEs",
        ),
        "esql_stats_top": QuerySpec(
            q_esql_stats_top,
            ESQL_TOP_SQL,
            "ES|QL MEDIAN/PERCENTILE/TOP/VALUES aggregates: exact "
            "interpolated percentiles (decimal grid sort + exact-decimal "
            "interpolation replacing ES's TDigest), multivalue TOP/VALUES "
            "rendered through MV_CONCAT — hand-derived oracle checks the "
            "compiler's agg layer",
        ),
        "esql_docs_strings": QuerySpec(
            q_esql_docs_strings,
            ESQL_STRINGS_SQL,
            "ES|QL string/math function surface: LEFT/RIGHT/REVERSE/TRIM/"
            "LOCATE/REPLACE(regex, global)/GREATEST/LEAST/CEIL/FLOOR/SQRT "
            "— RIGHT uses explicit start arithmetic (negative-start "
            "substring is not engine-portable on short strings), REPLACE "
            "twins need DuckDB's 'g' flag",
        ),
        "esql_events_cidr": QuerySpec(
            q_esql_events_cidr,
            ESQL_CIDR_SQL,
            "ES|QL IP functions: CIDR_MATCH compiles each literal block to "
            "one integer shiftright+equality, IP_PREFIX masks and "
            "re-renders the dotted quad — deterministic ips synthesized "
            "in-language from integer columns (fixture has no real ips)",
        ),
        "combined_fields_topk": QuerySpec(
            q_combined_fields_topk,
            _combined_fields_sql(),
            "ES combined_fields retrieval: term-centric multi-field BM25 — "
            "integer-weighted tfs and lengths merge into ONE synthetic "
            "field before a single BM25 saturation (the documented "
            "contrast to BM25F's per-field normalization); tf_c/len_c "
            "stay exact integers",
        ),
        "span_containing_topk": QuerySpec(
            q_span_containing_topk,
            _span_containing_sql(),
            "Lucene SpanContainingQuery: minimal ordered (a,b) big spans "
            "that CONTAIN a little-term occurrence (the dual of span_not/"
            "not_containing) — transform-to-struct span materialization, "
            "exact integer counts vs the brute self-join oracle",
        ),
        "query_profile": QuerySpec(
            q_query_profile,
            _query_profile_sql(),
            "deterministic query-execution profile (the ES _profile/"
            "_validate surface as data): per query — term counts, unknown "
            "terms, postings a TAAT scorer touches, candidate-set size; "
            "exact integers, the numbers WAND pruning is judged against",
        ),
        "quality_ece": QuerySpec(
            q_quality_ece,
            _quality_ece_sql(),
            "calibration audit (reliability-diagram bins behind ECE): "
            "decile bins of the round6 quality score vs the Gopher gate — "
            "exact decimal(18,6) score sums, one division per rate/mean, "
            "shared-IEEE floor(score*10) bin key; companion to "
            "quality_auc's ranking grade",
        ),
        "classic_tfidf_topk": QuerySpec(
            q_classic_tfidf_topk,
            _classic_tfidf_sql(),
            "Lucene ClassicSimilarity (pre-BM25 TF-IDF): coord * sum of "
            "qtf * idf_c^2 * sqrt(tf)/sqrt(dl), idf_c = 1+ln(N/(df+1)) — "
            "deterministic variant (exact norm instead of the lossy byte "
            "table); completes the similarity family",
        ),
        "ann_l2_topk": QuerySpec(
            q_ann_l2_topk,
            _ann_l2_sql(),
            "ES dense_vector l2_norm similarity: score = 1/(1+||q-v||^2), "
            "squared distance as the difference-vector dot product "
            "(reuses the proven cross-engine dot pairing) — completes the "
            "vector-similarity trio beside cosine and dot-product",
        ),
    }
