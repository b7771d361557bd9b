"""Deterministic dataset splitting + contamination checks — the two sampling
operators every large-scale training-data pipeline needs.

* ``dataset_splits`` — hash-deterministic train/val/test assignment (h60 of
  the stable doc id, NOT rand(): assignments survive retries, resumes, and
  cluster-size changes — repo invariant #1) with per-(lang, split) counts.
* ``split_contamination`` — exact-duplicate leakage across splits: pairs of
  distinct docs with identical content landing in different splits (the
  classic train/test contamination check), reported per split pair.

Both are pure Catalyst (hash, groupBy, self-join on content hash) and both
have exact DuckDB twins (h60 and sha256 are cross-engine — textpipe.h60).

Scale: split assignment is a map-side projection; the contamination join
groups by content_sha256 (uniform keys, map-side combinable) and only
multi-copy groups (tiny at any scale) reach the pair expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textpipe import h60

SPLIT_BOUNDS = (80, 90)  # <80 train, 80-89 val, 90-99 test


def split_col(id_col: str = "doc_id"):
    """Deterministic 0-99 split bucket: h60 of the doc id string."""
    return F.pmod(h60(F.col(id_col).cast("string")), F.lit(100))


def split_name_col(id_col: str = "doc_id"):
    b = split_col(id_col)
    return (
        F.when(b < SPLIT_BOUNDS[0], F.lit("train"))
        .when(b < SPLIT_BOUNDS[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )


def dataset_splits(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-(lang, split) doc counts under the deterministic assignment →
    DF[lang, split, n_docs]."""
    return (
        docs.select("lang", split_name_col(id_col).alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def split_contamination(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-split exact-duplicate leakage → DF[split_a, split_b, n_pairs]:
    pairs of distinct docs with identical content whose splits differ
    (split_a < split_b lexicographically). Empty ⟺ no leakage."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("h"),
        split_name_col(id_col).alias("split"),
    )
    a = d.select(F.col("doc_id").alias("id_a"), "h", F.col("split").alias("sa"))
    b = d.select(F.col("doc_id").alias("id_b"), "h", F.col("split").alias("sb"))
    pairs = (
        a.join(b, "h")
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("sa") != F.col("sb")))
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    return pairs.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def dsir_log_weights(
    tf_df: DataFrame,
    docs: DataFrame,
    term_stats: DataFrame,
    target_lang: str = "en",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    *Data Selection for Language Models via Importance Resampling*, unigram
    feature space) → DF[doc_id, logw]:

        logw(d) = Σ_t tf_td · ( ln p_tgt(t) − ln p_src(t) )

    where the target LM is estimated from the docs whose ``lang`` equals
    ``target_lang``, the source LM from the whole corpus, both
    Laplace-smoothed over the joint vocabulary:
    p(t) = (cf(t)+1) / (C+V). High logw = the doc looks more like the
    target domain than the average corpus doc; a pipeline resamples with
    probability ∝ exp(logw) (the deterministic h60-threshold variant of
    that sampling is ``split_col``'s trick). Selection happens WITHOUT
    scoring against any model — two corpus-count vectors suffice.

    Plan: target counts are one semi-join + re-aggregation of the already-
    cached postings (doc_id-keyed, uniform); the per-term log-ratio table
    is vocabulary-sized and broadcasts back onto the postings — the only
    corpus-scale work is the final per-doc sum, map-side combinable. Float
    discipline: each term's log-ratio is quantized ONCE to 9 decimals and
    the per-doc sum runs over exact decimals (the unigram_xent remedy), so
    the result is independent of aggregation order on both engines."""
    lang = docs.select(F.col(id_col).cast("long").alias("doc_id"), "lang")
    tgt_ids = lang.filter(F.col("lang") == target_lang).select("doc_id")
    tgt_cf = (
        tf_df.join(tgt_ids, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.sum("tf").alias("cf_t"))
    )
    lm = (
        term_stats.select("term", "cf")
        .join(tgt_cf, "term", "left")
        .select("term", "cf", F.coalesce("cf_t", F.lit(0)).alias("cf_t"))
    )
    consts = lm.agg(
        F.sum("cf").cast("double").alias("c_src"),
        F.sum("cf_t").cast("double").alias("c_tgt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    lr = lm.crossJoin(F.broadcast(consts)).select(
        "term",
        F.round(
            F.log((F.col("cf_t") + 1) / (F.col("c_tgt") + F.col("v")))
            - F.log((F.col("cf") + 1) / (F.col("c_src") + F.col("v"))),
            9,
        )
        .cast("decimal(28,9)")
        .alias("lr"),
    )
    # tf rides as decimal(9,0) so the product is decimal(38,9) EXACTLY at
    # Spark's 38-digit cap — a bare long×decimal(28,9) would exceed it and
    # Spark silently drops the scale to 8, quantizing differently from
    # DuckDB's exact decimal math (measured: 8/500 docs flipped at 6dp).
    tfd = F.col("tf").cast("decimal(9,0)")
    return (
        tf_df.join(lr, "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(tfd * F.col("lr")).cast("double"), 6).alias("logw"))
    )


PACK_BUDGET = 256     # tokens per training sequence (fixture-scaled)
PACK_SHARDS = 8       # packing shards — scales with the cluster


def sequence_packing(
    dl_df: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing accounting →
    DF[shard, seq_id, n_docs, n_tokens, n_spanning]: docs are concatenated
    in doc_id order within each deterministic shard and the token stream is
    chunked into fixed ``budget``-token training sequences; each output row
    is one sequence with the number of documents STARTING in it, their
    total tokens, and how many of them span into the next sequence (the
    cross-boundary fraction is the classic packing-efficiency diagnostic).

    Shard assignment is h60-deterministic (repo invariant #1 — identical
    across retries/cluster sizes), and packing is per-shard: the only
    non-map work is a window cumsum PARTITIONED by shard, so the operator
    is embarrassingly parallel — shards scale with the cluster and no
    global order is ever materialized (a single global concat order would
    be the 100 TB antipattern)."""
    from pyspark.sql.window import Window

    from .textpipe import h60

    d = dl_df.select(
        "doc_id",
        "dl",
        F.pmod(h60(F.col("doc_id").cast("string")), F.lit(n_shards)).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = d.withColumn("start", F.sum("dl").over(w) - F.col("dl"))
    seq = F.floor(F.col("start") / budget)
    last = F.floor((F.col("start") + F.col("dl") - 1) / budget)
    return (
        o.select(
            F.col("shard").cast("long").alias("shard"),
            seq.cast("long").alias("seq_id"),
            "dl",
            (seq != last).cast("int").alias("sp"),
        )
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("n_tokens"),
            F.sum("sp").cast("long").alias("n_spanning"),
        )
    )


def importance_resample(
    tf_df: DataFrame,
    docs: DataFrame,
    term_stats: DataFrame,
    k: int = 50,
    target_lang: str = "en",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of ``k`` docs
    with probability ∝ exp(dsir logw) — Efraimidis–Spirakis A-Res reservoir
    keys in FULLY-log form → DF[rank, doc_id, skey]:

        A-Res picks the top-k by u_d^(1/w_d), w_d = exp(logw_d). Taking
        ln twice (ln u < 0, so negate first) gives the order-equivalent

            skey(d) = logw_d − ln(−ln u_d)

        which never materializes exp(logw): the naive ln(u)/exp(logw) key
        overflows to ±0/−inf for |logw| ≳ 710 (routine for long docs at
        corpus scale), silently collapsing all extreme-weight docs into a
        doc_id-ordered tie. Both −ln u and logw are finite here by
        construction.

    u_d ∈ (0,1) is the h60-hash uniform of the doc id (repo invariant #1:
    no rand() — the sample is identical across retries, resumes and
    cluster sizes). This is the selection step DSIR's importance weights
    exist for, as one deterministic distributed operator: keys are
    map-side, the top-k is a TakeOrderedAndProject (per-partition bounded
    heaps merged on the driver — no global sort), exactly the flagship
    ranking shape. Ties break (key DESC, doc_id ASC), the engine-wide
    total order."""
    from pyspark.sql.window import Window

    from .textpipe import h60

    lw = dsir_log_weights(tf_df, docs, term_stats, target_lang=target_lang)
    u = (
        F.pmod(h60(F.col("doc_id").cast("string")), F.lit(1_000_000)).cast("double")
        + 0.5
    ) / 1_000_000.0
    sel = (
        lw.select("doc_id", (F.col("logw") - F.log(-F.log(u))).alias("skey"))
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("skey"), F.asc("doc_id"))
    return sel.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", F.round("skey", 6).alias("skey")
    )


DECONTAM_K = 8  # n-gram width for overlap decontamination (GPT-3 used 13)


def ngram_decontamination(
    docs: DataFrame, k: int = DECONTAM_K,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """N-gram overlap decontamination (the GPT-3 appendix-C rule, on the
    engine's deterministic splits): for every **test**-split document, the
    fraction of its k-token windows that also occur anywhere in the
    **train** split →

        DF[doc_id, n_windows, dirty_windows, dirty_frac]

    one row per test doc with ≥ 1 window (dirty_windows may be 0 — the
    clean rows are the point of the report; an eval-set curator drops or
    trims docs above a dirty_frac threshold).

    Spark-first plan, 100 TB shape: map-side split assignment + window
    hashes (same h60 window hash as exact_substring_spans); train-side
    window hashes deduplicate through ONE map-combinable distinct; the
    test windows LEFT-join that key set (key-partitioned shuffle join on
    uniform hashes — the train set is corpus-sized, never broadcast/driver
    bound); per-doc accounting is one map-combinable agg. Val-split rows
    are dropped at the scan."""
    from .stats import round6
    from .textpipe import h60 as _h60
    from .tokenize import tokens_col

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        split_name_col(id_col).alias("split"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).filter(F.col("split") != "val")
    whash_arr = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - (k - 1)),
        lambda i: _h60(F.concat_ws(
            "|", *[F.element_at(F.col("toks"), i + off) for off in range(k)]
        )),
    )
    # sequence(1, n) counts DOWN for n < 1 — short docs get no windows.
    wins = (
        toks.select(
            "doc_id", "split",
            F.when(F.size("toks") >= k, whash_arr)
            .otherwise(F.array().cast("array<long>")).alias("ws"),
        )
        .select("doc_id", "split", F.explode("ws").alias("whash"))
    )
    train = (
        wins.filter(F.col("split") == "train")
        .select("whash").distinct()
        .withColumn("hit", F.lit(1))
    )
    test = wins.filter(F.col("split") == "test").select("doc_id", "whash")
    return (
        test.join(train, "whash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
            .alias("dirty_windows"),
        )
        .select(
            "doc_id", "n_windows", "dirty_windows",
            round6(
                F.col("dirty_windows").cast("double")
                / F.col("n_windows").cast("double")
            ).alias("dirty_frac"),
        )
    )


def training_data_stats(
    docs: DataFrame,
    quality_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end training-data gauntlet as ONE composed plan →
    DF[split, lang, n_docs, n_tokens, avg_quality]: heuristic quality gate
    (textpipe.text_quality ≥ threshold) → exact-dedup survivors (min doc_id
    per sha256, the engine-wide survivor rule) → deterministic split
    assignment → per-(split, lang) accounting (docs, total tokens, mean
    quality).

    This is the acceptance report a 100 TB pretraining-data build emits:
    every stage is a map-side projection or a map-combinable aggregation
    except the survivor selection, whose one shuffle keys on the content
    hash (uniform by construction — no skew). Exact duplicates share text,
    hence share quality scores, so gate-then-dedup ≡ dedup-then-gate; the
    composed plan gates FIRST so the shuffle moves only passing rows."""
    from pyspark.sql.window import Window

    from .textpipe import text_quality

    q = text_quality(docs, text_col, id_col).select(
        "doc_id", "n_tokens", "quality_score"
    )
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        "lang",
        F.sha2(F.col(text_col), 256).alias("h"),
        split_name_col(id_col).alias("split"),
    )
    gated = d.join(q, "doc_id").filter(F.col("quality_score") >= quality_threshold)
    w = Window.partitionBy("h")
    surv = gated.withColumn("keep_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keep_id")
    )
    # quality_score is exactly-6-decimal, so the group mean is computed from
    # an EXACT decimal sum (order-independent under any partitioning) and one
    # double division — plain F.avg over doubles is partial-agg-order
    # sensitive and can flip the 6th rounded decimal between runs.
    from .stats import round6

    return surv.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        # round6 (exact-decimal): the division can land on a 6-dp half where
        # plain ROUND(double, 6) differs between engines (seen at sf0.001)
        round6(
            F.sum(F.col("quality_score").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


STRATA_QUOTA = 20   # docs per stratum
STRATA_SALTS = 16   # per-stratum pre-prune fan-in (scale lever)


def stratified_sample(
    docs: DataFrame, per_stratum: int = STRATA_QUOTA, n_salt: int = STRATA_SALTS,
    strata_col: str = "lang", id_col: str = "doc_id",
) -> DataFrame:
    """Exact-quota stratified sampling → DF[lang, rank, doc_id]: the
    ``per_stratum`` docs per stratum with the smallest h60 sampling keys —
    a uniform without-replacement sample per language with HARD quotas
    (``dataset_splits``' proportional hash-split cannot balance skewed
    strata; a balanced eval set or per-language SFT mix needs exact counts
    per stratum). Deterministic (invariant #1): the sample is identical
    across retries, resumes and cluster sizes, and exactly reproducible in
    SQL. Ties cannot occur twice per stratum (key ties still break doc_id
    ASC — the engine total order).

    Scale shape: the sampling key is map-side; the selection never funnels
    a whole stratum through one partition — a first window prunes per
    (stratum, key mod n_salt) to the quota (the global smallest are
    provably among every salt class's smallest), the final per-stratum
    window sorts ≤ n_salt·quota rows. Strata keys are few → the salt IS
    the skew defense."""
    d = docs.select(
        F.col(strata_col).alias("lang"),
        F.col(id_col).cast("long").alias("doc_id"),
        h60(F.col(id_col).cast("string")).alias("skey"),
    )
    from pyspark.sql.window import Window

    w_salt = Window.partitionBy(
        "lang", F.pmod(F.col("skey"), F.lit(n_salt))
    ).orderBy(F.asc("skey"), F.asc("doc_id"))
    w_lang = Window.partitionBy("lang").orderBy(F.asc("skey"), F.asc("doc_id"))
    return (
        d.withColumn("rs", F.row_number().over(w_salt))
        .filter(F.col("rs") <= per_stratum)
        .withColumn("rank", F.row_number().over(w_lang).cast("long"))
        .filter(F.col("rank") <= per_stratum)
        .select("lang", "rank", "doc_id")
    )


def lang_mixture_weights(docs: DataFrame) -> DataFrame:
    """Temperature-scaled language mixing weights → DF[lang, n_tokens, p,
    weight]: the multilingual-pretraining data-mixing op — sampling weight
    w_i ∝ p_i^τ with τ = 1/2 (square-root temperature sampling, the
    published low-resource-upweighting heuristic; mBERT-family exponents
    0.3–0.7), normalized over languages.

    τ is pinned at 1/2 so p^τ = sqrt(p) — a correctly-rounded IEEE op,
    bit-identical across engines on identical inputs; arbitrary τ would
    route through exp(τ·ln p) (the quantize-to-9dp ln discipline, rankers
    pattern). Float discipline: p is ONE double division of exact ints;
    sqrt(p) is quantized to decimal(28,9) (round-then-cast, the DSIR
    pattern) so the normalizer Σ is an exact decimal sum; one final double
    division + round6. Plan: per-lang token counts are one map-side
    combinable agg over size(tokens); everything after is
    languages-cardinality (broadcast 1-row normalizers)."""
    from .stats import round6
    from .tokenize import tokens_col

    per_lang = (
        docs.select("lang", F.size(tokens_col("text")).alias("ntok"))
        .groupBy("lang")
        .agg(F.sum("ntok").cast("long").alias("n_tokens"))
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("double").alias("total"))
    q = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total")).alias("p"),
    )
    q = q.select(
        "lang",
        "n_tokens",
        "p",
        F.round(F.sqrt("p"), 9).cast("decimal(28,9)").alias("qd"),
    )
    norm = q.agg(F.sum("qd").alias("ws"))
    return q.crossJoin(F.broadcast(norm)).select(
        "lang",
        "n_tokens",
        round6(F.col("p")).alias("p"),
        round6(
            F.col("qd").cast("double") / F.col("ws").cast("double")
        ).alias("weight"),
    )


BLOOM_M = 4096  # filter bits
BLOOM_K = 3     # hash functions per window


def bloom_decontamination(
    docs: DataFrame, k: int = DECONTAM_K,
    m: int = BLOOM_M, n_hashes: int = BLOOM_K,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter n-gram decontamination (the Dolma/CCNet-style scale
    path for ``ngram_decontamination``) → DF[doc_id, n_windows,
    bloom_dirty, exact_dirty, fp_windows]: a Bloom filter with m bits and
    ``n_hashes`` hash functions is built over the TRAIN split's k-token
    window hashes; every TEST window probes it. ``bloom_dirty`` counts
    windows whose every bit is set (the filter's answer), ``exact_dirty``
    the true membership (the exact join the sibling entry does), and
    ``fp_windows = bloom_dirty − exact_dirty`` the realized false
    positives — the one-sided Bloom error surfaced as a checkable value
    (invariant: bloom_dirty ≥ exact_dirty, pinned in tests).

    Determinism: bit j of window w is h60('bloom<j>|'||w) % m — no seeds,
    no SipHash state; both engines compute the identical bit set, so even
    the false positives are value-checked (an approximate data structure
    made exact-oracle, the HLL/KMV discipline applied to membership).

    100 TB shape: the materialized filter is ≤ m DISTINCT bit rows — a
    map-combinable distinct that collapses a corpus-sized window stream
    into a KILOBYTE-scale broadcast (this is why Dolma ships a Bloom
    dedup: the train side never shuffles full windows again); probes
    explode to n_hashes rows, semi-join the broadcast bit set, and reduce
    per window then per doc. Real deployments size m per the published
    (1−e^{−kn/m})^k bound; the fixture's m=4096 keeps a measurable FP
    rate so the accounting path is exercised."""
    from .tokenize import tokens_col

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        split_name_col(id_col).alias("split"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).filter(F.col("split") != "val")
    whash_arr = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - (k - 1)),
        lambda i: h60(F.concat_ws(
            "|", *[F.element_at(F.col("toks"), i + off) for off in range(k)]
        )),
    )
    # posexplode: widx keeps REPEATED window hashes within a doc distinct —
    # n_windows must count every window, duplicates included, exactly like
    # the exact sibling entry.
    wins = (
        toks.select(
            "doc_id", "split",
            F.when(F.size("toks") >= k, whash_arr)
            .otherwise(F.array().cast("array<long>")).alias("ws"),
        )
        .select("doc_id", "split", F.posexplode("ws"))
        .withColumnsRenamed({"pos": "widx", "col": "whash"})
    )

    def bits(whash):
        return [
            F.pmod(
                h60(F.concat(F.lit(f"bloom{j}|"), whash.cast("string"))),
                F.lit(m),
            )
            for j in range(n_hashes)
        ]

    train = wins.filter(F.col("split") == "train")
    train_bits = (
        train.select(F.explode(F.array(*bits(F.col("whash")))).alias("bit"))
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    train_keys = train.select("whash").distinct().withColumn("hit", F.lit(1))
    test = wins.filter(F.col("split") == "test")
    probe = test.select(
        "doc_id", "widx", "whash",
        F.explode(F.array(*bits(F.col("whash")))).alias("bit"),
    )
    per_win = (
        probe.join(F.broadcast(train_bits), "bit", "left")
        .groupBy("doc_id", "widx", "whash")
        .agg(
            (F.sum(F.coalesce(F.col("set_"), F.lit(0))) == n_hashes)
            .cast("int").alias("bloom_pos")
        )
    )
    return (
        per_win.join(train_keys, "whash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("bloom_pos").cast("long").alias("bloom_dirty"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
            .alias("exact_dirty"),
        )
        .select(
            "doc_id", "n_windows", "bloom_dirty", "exact_dirty",
            (F.col("bloom_dirty") - F.col("exact_dirty")).cast("long")
            .alias("fp_windows"),
        )
    )


def split_kl_divergence(docs: DataFrame) -> DataFrame:
    """Distribution drift between the train and test splits → DF[lang,
    n_terms, tot_train, tot_test, kl_train_test, kl_test_train]: per
    language, the add-one-smoothed unigram KL divergence in both
    directions — the split-health audit a pretraining pipeline runs
    beside contamination checks (a large KL means the deterministic
    split accidentally stratified content; near-zero means the splits
    are distributionally exchangeable).

        p(t) = (c_train(t)+1)/(T_train+V),  q(t) = (c_test(t)+1)/(T_test+V)
        KL(p‖q) = Σ_t p·ln(p/q)   over the two splits' UNION vocabulary V

    Float discipline (the bigram_xent rule): each term's contribution is
    one pinned chain of double ops on exact integers — two divisions, one
    division, one ln, one multiply — identical in the twin, quantized to
    9 dp and summed as exact decimals, so the corpus-sized sum is
    aggregation-order-free; outputs round6.

    Plan: one tokenize pass with map-side split assignment; per-(lang,
    term) conditional counts in ONE group-by (no per-split scans); the
    per-lang totals/vocab broadcast back onto the vocabulary-sized
    frame."""
    from .stats import round6
    from .tokenize import tokens_col

    toks = docs.select(
        F.col("lang").alias("lang"),
        split_name_col("doc_id").alias("split"),
        F.explode(tokens_col(F.col("text"))).alias("term"),
    ).filter(F.col("split") != "val")
    ct = toks.groupBy("lang", "term").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("c_tr"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("c_te"),
    )
    tot = ct.groupBy("lang").agg(
        F.sum("c_tr").alias("tot_tr"),
        F.sum("c_te").alias("tot_te"),
        F.count(F.lit(1)).alias("v"),
    )
    p = F.col("c_tr").cast("double") + 1.0
    q = F.col("c_te").cast("double") + 1.0
    pd_ = p / (F.col("tot_tr") + F.col("v")).cast("double")
    qd_ = q / (F.col("tot_te") + F.col("v")).cast("double")
    contrib = ct.join(F.broadcast(tot), "lang").select(
        "lang", "tot_tr", "tot_te", "v",
        F.round(pd_ * F.log(pd_ / qd_), 9).cast("decimal(28,9)").alias("kpq"),
        F.round(qd_ * F.log(qd_ / pd_), 9).cast("decimal(28,9)").alias("kqp"),
    )
    return (
        contrib.groupBy("lang")
        .agg(
            F.max("v").cast("long").alias("n_terms"),
            F.max("tot_tr").cast("long").alias("tot_train"),
            F.max("tot_te").cast("long").alias("tot_test"),
            round6(F.sum("kpq").cast("double")).alias("kl_train_test"),
            round6(F.sum("kqp").cast("double")).alias("kl_test_train"),
        )
    )


def split_neardup_leakage(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """NEAR-duplicate train→eval leakage → DF[train_doc, eval_doc,
    eval_split, jaccard]: MinHash+LSH near-dup pairs (textpipe's verified
    candidates, jaccard ≥ 0.8) whose endpoints land in different splits
    with one end in train — the fuzzy complement of
    ``split_contamination``'s exact-hash check. Pretraining pipelines run
    exactly this before releasing a benchmark: an eval doc that is a
    near-copy of a train doc contaminates the metric even though its
    sha256 differs.

    The split is the same deterministic h60 assignment as
    ``dataset_splits`` — a pure function of the doc id, so attaching
    splits to pairs is a map-side projection, no join. Scale profile is
    minhash_lsh_dedup's (banded self-join + candidate-restricted verify);
    this adds one filter."""
    from .textpipe import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(docs)
    sa = split_name_col("doc_id_a")
    sb = split_name_col("doc_id_b")
    p = pairs.select(
        "doc_id_a", "doc_id_b", "jaccard", sa.alias("sa"), sb.alias("sb")
    ).filter(
        ((F.col("sa") == "train") & (F.col("sb") != "train"))
        | ((F.col("sb") == "train") & (F.col("sa") != "train"))
    )
    train_first = F.col("sa") == "train"
    return p.select(
        F.when(train_first, F.col("doc_id_a")).otherwise(F.col("doc_id_b"))
        .cast("long")
        .alias("train_doc"),
        F.when(train_first, F.col("doc_id_b")).otherwise(F.col("doc_id_a"))
        .cast("long")
        .alias("eval_doc"),
        F.when(train_first, F.col("sb")).otherwise(F.col("sa")).alias("eval_split"),
        F.round("jaccard", 6).alias("jaccard"),
    )
