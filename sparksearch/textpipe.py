"""Training-data pipeline: deduplication + text analysis over the corpus.

Large-scale corpora (the 10^12-file regime of BASELINE.json:14) need more than
retrieval: dedup, quality filtering, language ID, token accounting and
fingerprinting are first-class build steps. Everything here is expressed as
declarative DataFrame ops (JVM-side, whole-stage codegen) — no Python in the
hot path — and every deterministic operator has an exact DuckDB SQL twin in
``queries_catalog`` (driver correctness gate).

Cross-engine hash: ``h60(s)`` = the first 15 hex chars of md5(s) as int64
(60 bits, always non-negative). Spark ``conv(substring(md5(s),1,15),16,10)``
and DuckDB ``('0x'||substring(md5(s),1,15))::BIGINT`` agree bit-for-bit
(validated in tests), so MinHash signatures, SimHash bits and winnowing
fingerprints are *identical* across engines — the oracle checks real values,
not just shapes. md5 here is a deterministic mixer, not a security primitive.

Scale design notes (per operator):

* exact dedup — one hash-aggregate on sha256(content); fully map-side
  combinable; no skew (hashes are uniform).
* MinHash+LSH — the scale path for near-dup: cost is O(docs × shingles ×
  n_hashes) map-side + a self-join on LSH band keys whose buckets are small
  by construction. Exact verification runs only on candidate pairs. The
  brute-force n² jaccard join (``ngram_jaccard_pairs``) exists as the
  small-scale oracle/baseline, never the scale path.
* SimHash — per-term 60-bit hashes aggregated into a weighted-majority
  signature (linear in postings), then the *exact* pigeonhole bucket join:
  4 chunks of 15 bits; any pair at Hamming distance ≤ 3 shares ≥ 1 chunk,
  so the chunk-equality self-join finds all such pairs without n² compare.
* winnowing fingerprints — Schleimer/Wilkerson/Aiken local minima of k-gram
  hashes; linear map-side work, output ~n_tokens/w rows per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import tokens_col

# ----------------------------------------------------------------- primitives

SHINGLE_K = 3            # word n-gram width for jaccard/minhash dedup
MINHASH_N = 24           # minhash signature length
LSH_ROWS = 3             # rows per LSH band → 8 bands of 3: a jaccard-0.9
                         # pair is missed with prob (1-0.9³)^8 ≈ 3e-5, while
                         # false candidates scale with j³ (not j²) — the
                         # difference between O(n) and O(n²) verify work on
                         # low-jaccard corpora
LSH_BANDS = MINHASH_N // LSH_ROWS
JACCARD_THRESHOLD = 0.8  # fixture near-dups sit at ≥0.9, noise at <0.1
SIMHASH_BITS = 60        # h60 width
SIMHASH_CHUNKS = 4       # pigeonhole chunks → exact for hamming ≤ 3
SIMHASH_MAX_HAMMING = 3
FINGERPRINT_K = 5        # winnowing k-gram (tokens)
FINGERPRINT_W = 4        # winnowing window (k-grams)


def h60(col: Column) -> Column:
    """60-bit md5-derived int64 — bit-identical to the DuckDB twin
    ``('0x'||substring(md5(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles_col(tokens: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-grams joined with '|', 1-based positions (mirrors the
    DuckDB twin exactly). Docs shorter than k shingle to the whole doc."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (k - 1)),
        lambda i: F.concat_ws(
            "|", *[F.element_at(tokens, i + off) for off in range(k)]
        ),
    )
    # Guard: Spark sequence(1, n) with n < 1 counts DOWN — never let it.
    return F.array_distinct(
        F.when(F.size(tokens) >= k, grams).otherwise(
            F.array(F.concat_ws("|", F.array_join(tokens, "|")))
        )
    )


def doc_shingle_arrays(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[doc_id, shs:array<string>] — distinct word k-grams per document,
    kept as a bound array column so downstream MinHash work stays map-side.

    The token array is materialized as a bound column BEFORE the shingle
    lambda: an inline ``tokens_col(text)`` expression would be re-evaluated
    (full split of the text) by every ``element_at`` inside the transform —
    O(tokens²) per document. Measured 6× on the fixture corpus."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).select("doc_id", shingles_col(F.col("toks")).alias("shs"))


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """DF[doc_id, shingle] — exploded form of ``doc_shingle_arrays``."""
    return doc_shingle_arrays(docs, text_col, id_col).select(
        "doc_id", F.explode("shs").alias("shingle")
    )


# -------------------------------------------------------------- exact dedup

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash → DF[content_sha256, n_copies,
    keep_doc_id]. ``keep_doc_id`` = min doc_id (the canonical survivor).

    Scale: single hash-aggregate, map-side combinable, uniform keys — the one
    dedup that is embarrassingly scalable. Run it first; it shrinks the input
    to every near-dup pass behind it."""
    return docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256")).agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min(F.col(id_col).cast("long")).alias("keep_doc_id"),
    )


# --------------------------------------------------- n-gram jaccard (exact)

def _pair_jaccard(sh: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """Exact jaccard for doc pairs from a shingle table DF[doc_id, shingle].

    With ``pairs`` (DF[doc_id_a, doc_id_b]) only those pairs are scored
    (the LSH verify path); without, all intersecting pairs are (brute force —
    small-scale oracle/baseline only, this is the n² join)."""
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    if pairs is not None:
        # BOTH sides are semi-joined to the candidate ids before the shingle
        # join — an unrestricted build side would fan every candidate-a row
        # across the FULL corpus's posting for each hot shingle (at 100 TB
        # that is the whole df(shingle) per row, the pairs filter pruning it
        # only after the blowup). The candidate-id sets are small relative to
        # the corpus by LSH construction → broadcast, so the big shingle
        # table never shuffles for the restriction. Same for cnt: only
        # candidate docs need their shingle counts downstream.
        ids_a = pairs.select("doc_id_a").distinct()
        ids_b = pairs.select("doc_id_b").distinct()
        a = a.join(F.broadcast(ids_a), "doc_id_a")
        b = b.join(F.broadcast(ids_b), "doc_id_b")
        ids = ids_a.select(F.col("doc_id_a").alias("doc_id")).union(
            ids_b.select(F.col("doc_id_b").alias("doc_id"))
        ).distinct()
        cnt = cnt.join(F.broadcast(ids), "doc_id")
        inter = a.join(b, "shingle").join(pairs, ["doc_id_a", "doc_id_b"])
    else:
        inter = a.join(b, "shingle").filter(F.col("doc_id_a") < F.col("doc_id_b"))
    inter = inter.groupBy("doc_id_a", "doc_id_b").agg(F.count(F.lit(1)).alias("n_inter"))
    return (
        inter.join(cnt.withColumnsRenamed({"doc_id": "doc_id_a", "n_sh": "n_a"}), "doc_id_a")
        .join(cnt.withColumnsRenamed({"doc_id": "doc_id_b", "n_sh": "n_b"}), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Brute-force shingle-jaccard near-dup pairs (doc_id_a < doc_id_b,
    jaccard ≥ threshold). The exact baseline LSH is checked against — at
    cluster scale use ``minhash_lsh_dedup`` (this one self-joins on shingle,
    which is n·df_shingle and blows up on 10^12 docs)."""
    return _pair_jaccard(doc_shingles(docs)).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------- MinHash + LSH

def minhash_sig_col(shs: Column, n_hashes: int = MINHASH_N) -> Column:
    """array<long> MinHash signature: sig[seed] = min over shingles of
    h60(seed|shingle) — identical values to the historical explode-by-seed →
    groupBy(doc_id, seed) min plan, but computed ENTIRELY map-side as one
    nested transform over the bound shingle array. The n_hashes × |shingles|
    md5s are the same arithmetic; the n_hashes× row exchange is gone (the old
    plan shuffled 24 rows per doc just to take per-seed mins that each task
    already had locally). ``shs`` must be a bound column (see doc_shingle_
    arrays — inline expressions re-evaluate inside lambdas)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(shs, lambda s: h60(F.concat_ws("|", seed.cast("string"), s)))
        ),
    )


def minhash_signatures(sharr: DataFrame, n_hashes: int = MINHASH_N) -> DataFrame:
    """DF[doc_id, seed, minh] from DF[doc_id, shs] — posexplode of the
    map-side signature array; shuffle-free."""
    return sharr.select(
        "doc_id",
        F.posexplode(minhash_sig_col(F.col("shs"), n_hashes)).alias("seed", "minh"),
    )


def lsh_band_keys(
    sharr: DataFrame, n_hashes: int = MINHASH_N, rows_per_band: int = LSH_ROWS
) -> DataFrame:
    """DF[doc_id, band, bkey] from DF[doc_id, shs]: band key = h60 of the
    band's comma-joined min-hash slice, seeds ascending (DuckDB twin:
    h60(string_agg(minh, ',' ORDER BY seed))). A 64-bit join key, not an
    md5 string — 8 bytes through the candidate-join exchange instead of 32.

    Every band's min-hashes are computed DIRECTLY from the bound ``shs``
    column in ONE projection. Deliberately NOT routed through a shared
    sig-array column: Catalyst's projection collapse would inline the
    24-hash signature expression into each band's slice() and re-evaluate
    the full signature once PER BAND (measured 8×: 7.5s → 0.9s at sf0.1).
    Here each seed's array_min is its own expression, evaluated once.

    Non-divisible n_hashes gets a partial final band (same banding as the
    DuckDB twin's ``seed // rows_per_band`` — no seed is ever dropped)."""
    n_bands = -(-n_hashes // rows_per_band)  # ceil: trailing seeds keep a band

    def minh(seed: int) -> Column:
        return F.array_min(
            F.transform(
                F.col("shs"), lambda s: h60(F.concat_ws("|", F.lit(str(seed)), s))
            )
        )

    def bkey(b: int) -> Column:
        vals = [
            minh(seed).cast("string")
            for seed in range(b * rows_per_band, min((b + 1) * rows_per_band, n_hashes))
        ]
        return h60(F.concat_ws(",", *vals))

    bands = F.array(
        *[
            F.struct(F.lit(b).cast("int").alias("band"), bkey(b).alias("bkey"))
            for b in range(n_bands)
        ]
    )
    return sharr.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    n_hashes: int = MINHASH_N,
    rows_per_band: int = LSH_ROWS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact verification →
    DF[doc_id_a, doc_id_b, jaccard] (jaccard ≥ threshold).

    The scale path: candidates come from equality self-joins on LSH band
    keys (bucket sizes are tiny by construction; with 8 bands × 3 rows a
    jaccard-0.9 pair is missed with prob (1-0.9³)^8 ≈ 3e-5), then only
    candidates pay the exact jaccard join. Deterministic end-to-end (h60
    seeds, no rand()) — the DuckDB oracle reproduces the identical pipeline
    and the driver compares actual pair sets and jaccard values.

    Shuffle budget: shingling + signatures + band keys are ONE map-side
    projection over the persisted shingle arrays; the first exchange in the
    whole pipeline is the band-key self-join, the second is the (candidate-
    restricted) verify join."""
    sharr = doc_shingle_arrays(docs).persist()  # reused: band keys + verify
    # keys is consumed twice (both sides of the self-join) — persist so the
    # 24-hash min-hash pass runs once, not once per side.
    keys = lsh_band_keys(sharr, n_hashes, rows_per_band).persist()
    a = keys.select(F.col("doc_id").alias("doc_id_a"), "band", "bkey")
    b = keys.select(F.col("doc_id").alias("doc_id_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
        .persist()  # consumed 4× by the verify restrictions — don't re-derive
    )
    sh = sharr.select("doc_id", F.explode("shs").alias("shingle"))
    out = _pair_jaccard(sh, pairs=cand).filter(F.col("jaccard") >= threshold)
    # Eagerly materialize the (near-dup-pairs-sized, i.e. tiny) result and
    # release the three intermediate caches — repeated invocations in one
    # session (driver catalog run, bench reps) must not accumulate pinned
    # storage. ``out`` itself stays cached; it IS the returned value.
    out = out.persist()
    out.count()
    for df in (cand, keys, sharr):
        df.unpersist()
    return out


# ------------------------------------------------------------------- SimHash

def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DF[doc_id, simhash]: 60-bit SimHash — per-bit tf-weighted majority over
    h60(term) of the document's terms.

    Computed ENTIRELY map-side in one vectorized Arrow pass (mapInPandas):
    tokenize → per-doc tf counts → h60 per distinct term → a NumPy
    bit-matrix weighted sum → the packed 60-bit signature. Zero shuffle (the
    historical declarative plan exploded postings × 60 bit positions through
    two hash-aggregate exchanges). Values are pinned by the DuckDB oracle
    twin (SIMHASH_SIG_SQL) and the pure-Python reference test — the plan
    changed, the bits did not."""
    import hashlib

    def kernel(it):
        import numpy as np
        import pandas as pd

        from .tokenize import TOKEN_RE

        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        hcache: dict[str, int] = {}

        def h(term: str) -> int:
            v = hcache.get(term)
            if v is None:
                v = hcache[term] = int(
                    hashlib.md5(term.encode()).hexdigest()[:15], 16
                )
            return v

        for pdf in it:
            if not len(pdf):
                continue
            out_ids, out_sigs = [], []
            toks = pdf[text_col].str.lower().str.findall(TOKEN_RE)
            for doc_id, tl in zip(pdf[id_col].to_numpy(), toks):
                if not tl:
                    continue
                u, c = np.unique(np.asarray(tl, dtype=object), return_counts=True)
                hv = np.fromiter((h(t) for t in u), dtype=np.int64, count=len(u))
                # ±tf per bit: bit set → +tf else −tf; majority per column
                bits = ((hv[:, None] >> shifts) & 1) * 2 - 1
                wsum = (bits * c[:, None]).sum(axis=0)
                sig = int(((wsum > 0).astype(np.int64) << shifts).sum())
                out_ids.append(doc_id)
                out_sigs.append(sig)
            if out_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.asarray(out_ids, dtype=np.int64),
                        "simhash": np.asarray(out_sigs, dtype=np.int64),
                    }
                )

    return docs.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        kernel, "doc_id long, simhash long"
    )


def simhash_dedup(
    docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """SimHash near-dup pairs → DF[doc_id_a, doc_id_b, hamming] (≤ max_hamming).

    Exact at scale via pigeonhole: the 60 signature bits are cut into
    ``max_hamming + 1`` chunks — a pair within Hamming distance max_hamming
    must agree on ≥ 1 whole chunk, so the chunk-equality self-join (small
    buckets, no n²) finds every such pair; bit_count(xor) then verifies
    exactly. The chunk count is DERIVED from the requested radius (not a
    fixed 4), so the exactness guarantee holds for any max_hamming < 60 —
    wider radii just mean narrower chunks / bigger buckets. The DuckDB
    oracle brute-forces n² — results equal. Default radius 3 → the classic
    4 × 15-bit layout."""
    if not 0 <= max_hamming < SIMHASH_BITS:
        raise ValueError(f"max_hamming must be in [0, {SIMHASH_BITS}), got {max_hamming}")
    n_chunks = max_hamming + 1
    bounds = [i * SIMHASH_BITS // n_chunks for i in range(n_chunks + 1)]
    sig = simhash_signatures(docs)
    chunk_vals = F.array(*[
        F.expr(f"(simhash >> {bounds[c]}) & {(1 << (bounds[c + 1] - bounds[c])) - 1}")
        for c in range(n_chunks)
    ])
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(chunk_vals).alias("c", "chunk_val"),
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sh_a"), "c", "chunk_val"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sh_b"), "c", "chunk_val"
    )
    return (
        a.join(b, ["c", "chunk_val"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------- fingerprints

def doc_fingerprints(
    docs: DataFrame,
    k: int = FINGERPRINT_K,
    w: int = FINGERPRINT_W,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints → DF[doc_id, fp].

    k-token rolling h60 hashes; a fingerprint is the minimum hash in each
    window of w consecutive k-grams (Schleimer et al., SIGMOD 2003 — local
    algorithm, so purely map-side: no shuffle until the final distinct).

    Tokens and k-gram hashes are each materialized as bound columns before
    the lambdas that index into them (see doc_shingles — inline expressions
    are re-evaluated per element_at)."""
    tokens = F.col("toks")
    khs = F.when(
        F.size(tokens) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (k - 1)),
            lambda i: h60(
                F.concat_ws("|", *[F.element_at(tokens, i + off) for off in range(k)])
            ),
        ),
    ).otherwise(F.array(h60(F.array_join(tokens, "|"))))
    fps = F.when(
        F.size(F.col("khs")) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("khs")) - (w - 1)),
            lambda j: F.array_min(F.slice(F.col("khs"), j, w)),
        ),
    ).otherwise(F.array(F.array_min(F.col("khs"))))
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            tokens_col(F.col(text_col)).alias("toks"),
        )
        .select("doc_id", khs.alias("khs"))
        .select("doc_id", F.explode(F.array_distinct(fps)).alias("fp"))
        .distinct()
    )


# ------------------------------------------------------------ text analysis

EN_STOPWORDS = ("a", "the", "of", "to", "and", "in", "is", "it", "on", "for")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
FR_STOPWORDS = ("le", "la", "les", "et", "est", "un", "une", "dans")


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda x: x.isin(*words))).cast("long")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID → DF[doc_id, en_hits, de_hits, fr_hits,
    predicted_lang]. Deterministic tiebreak: en ≥ de ≥ fr.

    The n-gram-profile heuristic reduced to function-word hit counting —
    pure codegen, no UDF; real corpora swap in bigger profiles, same plan."""
    t = tokens_col(F.col(text_col))
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        _hits(t, EN_STOPWORDS).alias("en_hits"),
        _hits(t, DE_STOPWORDS).alias("de_hits"),
        _hits(t, FR_STOPWORDS).alias("fr_hits"),
    )
    return d.withColumn(
        "predicted_lang",
        F.when(
            (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")),
            F.lit("en"),
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), F.lit("de"))
        .otherwise(F.lit("fr")),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token accounting → DF[doc_id, n_ws_tokens, n_word_tokens, n_subword_est].

    n_ws: whitespace pieces; n_word: regex word tokens (the engine
    tokenizer); n_subword_est: Σ ceil(len/4) per word — the standard
    chars/4 BPE budget estimate, computed per token."""
    t = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_ws_tokens"),
        F.size(t).cast("long").alias("n_word_tokens"),
        F.aggregate(
            t,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.ceil(F.length(x) / F.lit(4.0)).cast("long"),
        ).alias("n_subword_est"),
    )


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score → DF[doc_id, n_chars, n_tokens, mean_token_len,
    stopword_ratio, quality_score].

    quality = 0.4·min(n_tokens/100, 1) + 0.3·(1 − min(|mean_len − 5|/5, 1))
            + 0.3·min(5·stopword_ratio, 1)   — length, shape, naturalness."""
    t = tokens_col(F.col(text_col))
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("sum_len"),
        _hits(t, EN_STOPWORDS).alias("sw"),
    )
    # nullif guard: a zero-token document yields NULL ratios (and NULL score)
    # on BOTH engines — without it Spark gives NULL but DuckDB gives inf/nan.
    from .stats import round6

    nt = F.nullif(F.col("n_tokens"), F.lit(0))
    d = d.withColumn(
        "mean_token_len", round6(F.col("sum_len") / nt)
    ).withColumn("stopword_ratio", round6(F.col("sw") / nt))
    q = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (
            F.lit(1.0)
            - F.least(F.abs(F.col("mean_token_len") - 5.0) / F.lit(5.0), F.lit(1.0))
        )
        * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
    )
    return d.select(
        "doc_id", "n_chars", "n_tokens", "mean_token_len", "stopword_ratio",
        # round6 (exact-decimal): plain ROUND(double, 6) flipped the 6th
        # decimal between engines on half-boundary values at sf0.1
        round6(q).alias("quality_score"),
    )


# ------------------------------------------------- term co-occurrence / PMI
def cooccurrence_edges(
    docs: DataFrame,
    top_v: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document co-occurrence pairs over the top-``top_v``-df
    vocabulary → DF[term_a, term_b, n_both] (term_a < term_b) — the edge
    list the term-graph entries (PageRank) run on.

    Same vocabulary bounding + pair semantics as ``term_cooccurrence`` (a
    doc contributes at most C(top_v, 2) pairs; the doc×term frame is
    semi-reduced by a broadcast of the tiny vocabulary before the
    self-join), without the PMI scoring tail. Pairs are materialized
    (persist + count) before the persisted doc×term frame is released, so
    callers may iterate over the result freely (PageRank joins it every
    round)."""
    from pyspark.sql.window import Window

    dt = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    wv = Window.orderBy(F.desc("df"), F.asc("term"))
    vocab = (
        dfreq.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") <= top_v)
        .select("term")
    )
    dtv = dt.join(F.broadcast(vocab), "term").persist()
    pairs = (
        dtv.select("doc_id", F.col("term").alias("term_a"))
        .join(dtv.select("doc_id", F.col("term").alias("term_b")), "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .persist()
    )
    pairs.count()
    dtv.unpersist()
    return pairs


def term_cooccurrence(
    docs: DataFrame,
    top_v: int = 32,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k within-document co-occurring term pairs ranked by PMI →
    DF[rank, term_a, term_b, n_both, pmi] — the corpus-statistics operator
    behind related-terms / query-expansion panels (pointwise mutual
    information over document-level co-occurrence, Church & Hanks 1990).

    pmi(a,b) = ln( n_both · N / (df_a · df_b) ), rounded to 6 then ranked
    (pmi DESC, term_a ASC, term_b ASC) — round-then-tiebreak determinism.

    Scale contract: the pair expansion is VOCABULARY-BOUNDED — only the
    ``top_v`` highest-df terms participate, so a doc contributes at most
    C(top_v, 2) pairs regardless of length, and the pair-count aggregation
    is map-side combinable over ≤ C(top_v, 2) distinct keys. The doc×term
    frame never self-joins unrestricted: both sides are first semi-reduced
    by a broadcast of the tiny vocabulary. The df ranking shuffles only the
    (term, df) dictionary — narrow columns, vocabulary-sized."""
    from pyspark.sql.window import Window

    dt = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    n_docs = docs.count()  # one scalar; the PMI normalizer
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    wv = Window.orderBy(F.desc("df"), F.asc("term"))
    vocab = (
        dfreq.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") <= top_v)
        .select("term", "df")
    )
    # consumed by both sides of the self-join AND twice for df lookup —
    # persist per the repo's self-join invariant.
    dtv = dt.join(F.broadcast(vocab.select("term")), "term").persist()
    a = dtv.select("doc_id", F.col("term").alias("term_a"))
    b = dtv.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    va = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    scored = (
        pairs.join(F.broadcast(va), "term_a")
        .join(F.broadcast(vb), "term_b")
        .select(
            "term_a", "term_b", "n_both",
            F.round(
                F.log((F.col("n_both") * F.lit(n_docs)).cast("double")
                      / (F.col("df_a") * F.col("df_b"))),
                6,
            ).alias("pmi"),
        )
    )
    wr = Window.orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
    out = (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "term_a", "term_b", "n_both", "pmi")
    )
    out = out.persist()
    out.count()
    dtv.unpersist()
    return out


def keyword_extraction(
    tf_df: DataFrame, term_stats: DataFrame, topn: int = 3
) -> DataFrame:
    """Per-document keyword extraction → DF[doc_id, rank, term, tfidf]: the
    top-``topn`` terms of every doc by tf·idf (ties → term ASC) — the
    classic corpus-descriptor / tag-suggestion primitive of a training-data
    pipeline (and Lucene's MoreLikeThis seed selection applied corpus-wide).

    Plan: postings ⋈ vocabulary on term (broadcast at fixture scale; at
    10^8-term vocabulary this is the one sort-merge the corpus-wide tf·idf
    definition inherently requires), then a doc_id-keyed window — uniform
    keys, no skew. tf·idf itself is a per-row product, no float
    accumulation."""
    scored = tf_df.join(term_stats.select("term", "idf"), "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
        .select("doc_id", "rank", "term", F.round("tfidf", 6).alias("tfidf"))
    )


def unigram_xent(tf_df: DataFrame, term_stats: DataFrame) -> DataFrame:
    """Per-document cross-entropy against the corpus unigram language model
    (the CCNet/KenLM-style quality signal, unigram order) →
    DF[doc_id, xent]:

        xent(d) = −(1/dl_d) Σ_t tf_td · ln(cf_t / C)

    Low xent = doc looks like the corpus; high = outlier (boilerplate,
    noise, wrong language). Float discipline: each term's log-probability
    is quantized ONCE (9 decimals — part of the operator's definition) and
    the per-doc sum runs over exact decimals, so the result is independent
    of aggregation order on both engines (the training_data_stats remedy);
    the only double ops are one ln per vocab term and one division per doc.
    Plan: the same postings ⋈ vocabulary join as keyword_extraction plus a
    1-row broadcast of C — no extra corpus pass (dl rides the postings)."""
    coll = term_stats.agg(F.sum("cf").cast("double").alias("coll_len"))
    lp = (
        term_stats.crossJoin(F.broadcast(coll))
        .select(
            "term",
            F.round(F.log(F.col("cf") / F.col("coll_len")), 9)
            .cast("decimal(28,9)")
            .alias("lp"),
        )
    )
    # tf as decimal(9,0) keeps the product at decimal(38,9) exactly —
    # long×decimal(28,9) would blow Spark's 38-digit precision cap and
    # silently lose the 9th decimal (see sampling.dsir_log_weights).
    tfd = F.col("tf").cast("decimal(9,0)")
    return (
        tf_df.join(lp, "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                -(F.sum(tfd * F.col("lp")).cast("double"))
                / F.max("dl"),
                6,
            ).alias("xent")
        )
        .select("doc_id", "xent")
    )


NGRAM_REP_K = 3


def ngram_repetition(
    docs: DataFrame, k: int = NGRAM_REP_K,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate-k-gram fraction (the Gopher/MassiveText
    repetition quality rule) → DF[doc_id, n_grams, dup_frac]:

        dup_frac = (n_grams − n_distinct_grams) / n_grams     (0 when < k
                                                               tokens)

    High values flag templated/boilerplate text a pretraining pipeline
    drops. Entirely map-side: token array → raw k-gram array (NOT the
    deduped shingles_col — duplicates are the signal here) → two sizes and
    one division per row. Zero shuffle at any corpus size."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - (k - 1)),
        lambda i: F.concat_ws(
            "|", *[F.element_at(F.col("toks"), i + off) for off in range(k)]
        ),
    )
    # sequence(1, n) counts DOWN for n < 1 — short docs get an empty array.
    garr = toks.select(
        "doc_id",
        F.when(F.size("toks") >= k, grams)
        .otherwise(F.array().cast("array<string>"))
        .alias("g"),
    )
    return garr.select(
        "doc_id",
        F.size("g").cast("long").alias("n_grams"),
        F.round(
            F.when(
                F.size("g") > 0,
                (F.size("g") - F.size(F.array_distinct("g")))
                / F.size("g").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )


# ------------------------------------------- exact-substring (span) dedup

EXACT_SUBSTR_K = 8  # duplicated-run window width in tokens


def exact_substring_spans(
    docs: DataFrame, k: int = EXACT_SUBSTR_K,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Suffix-array-style exact-substring dedup accounting (the
    "deduplicating training data" ExactSubstr semantics): every maximal
    token run of length ≥ k whose k-token windows ALL occur ≥ 2 times in
    the corpus (any document, including self-repetition — the literature's
    "second occurrence anywhere" rule) → per-document span statistics

        DF[doc_id, n_tokens, n_dup_spans, dup_tokens, dup_fraction]

    (docs with at least one duplicated span; dup_fraction = dup_tokens /
    n_tokens, round6). A pretraining pipeline cuts the spans rather than the
    whole doc — dup_fraction is the cut budget per doc.

    Spark-first plan, 100 TB shape:
      1. map-side: token array (bound column — the transform would otherwise
         re-split the text per window, the documented O(n²) lambda edge) →
         per-window (start, h60(window)) structs, exploded. ~n_tokens rows.
      2. ONE map-combinable groupBy(whash) count — duplicated windows are
         `count ≥ 2` (a 60-bit collision can only over-mark a window as
         duplicated; acceptable for an accounting/cut list, and the oracle
         mirrors the same hash).
      3. hits = windows ⋈ duplicated hashes (key-partitioned; AQE broadcasts
         when the dup set is small).
      4. gaps-and-islands per doc over hit starts — closed intervals
         [start, start+k-1] merged when overlapping or ADJACENT (a run of
         duplicated windows with consecutive starts is one maximal span) —
         two window passes over the (small) hit set, one doc_id shuffle.
    No Python rows anywhere; every stage is codegen or hash-agg."""
    from .stats import round6

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    wins_arr = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - (k - 1)),
        lambda i: F.struct(
            i.cast("int").alias("start"),
            h60(F.concat_ws(
                "|", *[F.element_at(F.col("toks"), i + off) for off in range(k)]
            )).alias("whash"),
        ),
    )
    # sequence(1, n) counts DOWN for n < 1 — short docs get no windows.
    wins = (
        toks.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.when(F.size("toks") >= k, wins_arr)
            .otherwise(F.array().cast("array<struct<start:int,whash:long>>"))
            .alias("w"),
        )
        .select("doc_id", "n_tokens", F.explode("w").alias("win"))
        .select("doc_id", "n_tokens", F.col("win.start").alias("start"),
                F.col("win.whash").alias("whash"))
    )
    dup = wins.groupBy("whash").count().filter(F.col("count") >= 2).select("whash")
    hits = wins.join(dup, "whash")
    w_ord = Window.partitionBy("doc_id").orderBy("start")
    prev_end = F.max(F.col("start") + (k - 1)).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "brk",
        F.when(prev_end.isNull() | (F.col("start") > prev_end + 1), 1).otherwise(0),
    )
    spans = (
        marked.withColumn("island", F.sum("brk").over(w_ord))
        .groupBy("doc_id", "n_tokens", "island")
        .agg(
            F.min("start").alias("s"),
            (F.max("start") + (k - 1)).alias("e"),
        )
    )
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
        )
        .select(
            "doc_id", "n_tokens", "n_dup_spans", "dup_tokens",
            round6(
                F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double")
            ).alias("dup_fraction"),
        )
    )


# --------------------------------------------------- Gopher quality gates

GOPHER_MIN_WORDS = 10          # Rae et al. 2021 use 50; fixture-scaled so
GOPHER_MAX_WORDS = 100_000     # both outcomes occur in the test corpus
GOPHER_MEAN_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_rules(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher/MassiveText rule-based quality gate (Rae et al. 2021,
    §A.1.1) as ONE map-side projection → DF[doc_id, n_tokens,
    flag_wordcount, flag_meanlen, flag_symbol, flag_bullet, flag_alpha,
    flag_stopwords, passes] (flags are 1 = rule satisfied):

    1. word count in [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS];
    2. mean word length in [3, 10];
    3. symbol-to-word ratio ('#' chars + '...' occurrences) ≤ 0.1;
    4. ≤ 90% of lines start with a bullet AND ≤ 30% end with an ellipsis;
    5. ≥ 80% of words contain an alphabetic character;
    6. ≥ 2 hits from the engine stopword profile (the "stop word" filter).

    ``passes`` = every flag = the doc survives the gate. The published rule
    set is reproduced 1:1 on the engine tokenizer (thresholds are module
    constants; the word-count floor is fixture-scaled so both outcomes are
    exercised). Zero shuffle at any corpus size — every rule is a
    whole-stage-codegen expression over one row; ratio flags on zero-token
    docs evaluate through NULL → CASE-else → 0 identically on both engines.
    """
    from .stats import round6

    t = tokens_col(F.col(text_col))
    lines = F.split(F.col(text_col), "\n")
    hashes = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    # non-overlapping left-to-right '...' occurrences — same replace
    # semantics in java.lang.String.replace and DuckDB replace()
    dots = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(t).cast("long").alias("n_tokens"),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
        ).alias("sum_len"),
        F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("long").alias("n_alpha"),
        _hits(t, EN_STOPWORDS).alias("sw_hits"),
        (hashes + dots).cast("double").alias("n_symbols"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda x: F.ltrim(x).startswith("-")
                | F.ltrim(x).startswith("*")
                | F.ltrim(x).startswith("•"),
            )
        ).cast("long").alias("n_bullet"),
        F.size(F.filter(lines, lambda x: F.rtrim(x).endswith("...")))
        .cast("long").alias("n_ellipsis"),
    )
    nt = F.nullif(F.col("n_tokens"), F.lit(0)).cast("double")
    nl = F.nullif(F.col("n_lines"), F.lit(0)).cast("double")
    d = d.select(
        "doc_id", "n_tokens",
        round6(F.col("sum_len") / nt).alias("mean_len"),
        round6(F.col("n_symbols") / nt).alias("symbol_ratio"),
        round6(F.col("n_bullet") / nl).alias("bullet_frac"),
        round6(F.col("n_ellipsis") / nl).alias("ellipsis_frac"),
        round6(F.col("n_alpha") / nt).alias("alpha_frac"),
        "sw_hits",
    )

    def flag(cond) -> Column:
        # NULL ratio (zero-token doc) → ELSE → 0 on both engines
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")

    d = d.select(
        "doc_id", "n_tokens",
        flag(
            (F.col("n_tokens") >= GOPHER_MIN_WORDS)
            & (F.col("n_tokens") <= GOPHER_MAX_WORDS)
        ).alias("flag_wordcount"),
        flag(
            (F.col("mean_len") >= GOPHER_MEAN_LEN[0])
            & (F.col("mean_len") <= GOPHER_MEAN_LEN[1])
        ).alias("flag_meanlen"),
        flag(F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO).alias("flag_symbol"),
        flag(
            (F.col("bullet_frac") <= GOPHER_MAX_BULLET_FRAC)
            & (F.col("ellipsis_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        ).alias("flag_bullet"),
        flag(F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC).alias("flag_alpha"),
        flag(F.col("sw_hits") >= GOPHER_MIN_STOPWORD_HITS).alias("flag_stopwords"),
    )
    return d.withColumn(
        "passes",
        F.least(
            "flag_wordcount", "flag_meanlen", "flag_symbol",
            "flag_bullet", "flag_alpha", "flag_stopwords",
        ).cast("long"),
    )


# -------------------------------------------- bigram LM cross-entropy

def bigram_xent(docs: DataFrame, term_stats: DataFrame,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy against an add-one-smoothed corpus BIGRAM
    language model (the CCNet perplexity-filtering signal, one order above
    ``unigram_xent``) → DF[doc_id, n_bigrams, xent]:

        p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
        xent(d)  = −(1/|bigrams_d|) Σ_bg tf_bg · ln p(bg)

    with V = |unigram vocabulary| (from term_stats) and c(w1 ·) the bigram
    left-marginal (derived from the bigram counts themselves — no extra
    corpus pass). Docs with < 2 tokens have no bigrams and no row. Low
    xent = the doc matches corpus phrase statistics; high = boilerplate /
    wrong-language / shuffled text that unigram stats miss.

    Scale shape: per-doc bigram tfs are one map-combinable aggregation on
    uniform (doc_id, bigram) keys; corpus counts re-aggregate them by
    bigram then by left token (vocabulary²-bounded, tiny next to
    postings); the per-bigram log-prob table joins back key-partitioned.
    Float discipline (the unigram_xent remedy): each bigram TYPE's ln p is
    quantized ONCE to 9 decimals; the per-doc sum runs over exact decimals
    (tf rides as decimal(9,0) to stay inside Spark's 38-digit cap), so the
    result is independent of aggregation order on both engines."""
    from .stats import round6

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("toks")) - 1),
        lambda i: F.concat_ws(
            "|", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
        ),
    )
    # sequence(1, n) counts DOWN for n < 1 — short docs get an empty array
    dbt = (
        toks.select(
            "doc_id",
            F.when(F.size("toks") >= 2, grams)
            .otherwise(F.array().cast("array<string>")).alias("g"),
        )
        .select("doc_id", F.explode("g").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # dbt feeds BOTH the corpus-count chain (cbg → cw1 → lp) and the final
    # per-doc join — without a persist the tokenize+explode DAG re-executes
    # once per consumer (repo self-join sharp edge; measured 22s → ~8s at
    # sf0.01 with the cache).
    dbt = dbt.persist()
    cbg = dbt.groupBy("bg").agg(F.sum("tf").alias("c"))
    cw1 = (
        cbg.select(F.substring_index("bg", "|", 1).alias("w1"), "c")
        .groupBy("w1")
        .agg(F.sum("c").alias("cw"))
    )
    v = term_stats.agg(F.count(F.lit(1)).cast("long").alias("v"))
    lp = (
        cbg.select("bg", F.substring_index("bg", "|", 1).alias("w1"), "c")
        .join(cw1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "bg",
            F.round(
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("cw") + F.col("v")).cast("double")
                ),
                9,
            ).cast("decimal(28,9)").alias("lp"),
        )
    )
    tfd = F.col("tf").cast("decimal(9,0)")
    out = (
        dbt.join(lp, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            round6(
                -(F.sum(tfd * F.col("lp")).cast("double"))
                / F.sum("tf").cast("double")
            ).alias("xent"),
        )
        .select("doc_id", "n_bigrams", "xent")
    )
    out = out.persist()
    out.count()
    dbt.unpersist()
    return out


# ------------------------------------------------ KMV distinct sketch

KMV_K = 64        # sketch size
KMV_SALTS = 16    # per-group pre-prune fan-in (scale lever, not accuracy)
_H60_RANGE = float(1 << 60)


def kmv_distinct_terms(
    docs: DataFrame, k: int = KMV_K, n_salt: int = KMV_SALTS,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """K-minimum-values distinct-cardinality sketch (Bar-Yossef et al. 2002)
    of the term vocabulary per language → DF[lang, n_exact, n_sketch,
    kth_hash, est_distinct]:

        est = (k−1) / (kth_min_hash / 2^60)     (h60 is uniform on [0,2^60))
        est = n_sketch when the sketch is not full (< k distinct hashes).

    The mergeable-sketch counterpart to ``cms_term_counts`` (counts) —
    KMV answers distinct-counts. Deterministic (h60, invariant #1), so the
    sketch AND the estimate are exactly reproducible in SQL — the oracle
    checks values, not a tolerance; ``n_exact`` rides along so the entry
    doubles as an accuracy report.

    Scale shape: the only corpus-sized work is the distinct on uniform
    (lang, hash) keys (map-combinable). The k-smallest selection never
    funnels a language's whole vocabulary through one partition: a first
    window prunes per (lang, salt = h mod n_salt) — each sees ~1/n_salt of
    the vocabulary — to k rows, and the global k-smallest are provably
    among those n_salt·k survivors (every salt class keeps its k smallest);
    the final per-lang window sorts ≤ n_salt·k rows."""
    from .stats import round6

    pairs = (
        docs.select(
            F.col("lang").alias("lang"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .select("lang", h60(F.col("term")).alias("h"))
        .distinct()
    )
    pairs = pairs.persist()
    exact = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    w_salt = Window.partitionBy("lang", F.pmod(F.col("h"), F.lit(n_salt))).orderBy("h")
    w_lang = Window.partitionBy("lang").orderBy("h")
    sk = (
        pairs.withColumn("rs", F.row_number().over(w_salt))
        .filter(F.col("rs") <= k)
        .withColumn("rn", F.row_number().over(w_lang))
        .filter(F.col("rn") <= k)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").alias("kth_hash"),
        )
    )
    out = exact.join(sk, "lang").select(
        "lang", "n_exact", "n_sketch", "kth_hash",
        round6(
            F.when(
                F.col("n_sketch") < k, F.col("n_sketch").cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / _H60_RANGE)
            )
        ).alias("est_distinct"),
    )
    out = out.persist()
    out.count()
    pairs.unpersist()
    return out


# ---------------------------------------------- line-level boilerplate

LINE_BOILER_MIN_DOCS = 3   # a line is boilerplate when >= this many docs share it


def line_boilerplate(
    docs: DataFrame, min_docs: int = LINE_BOILER_MIN_DOCS,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style line-level boilerplate accounting → DF[doc_id, n_lines,
    n_boiler, boiler_frac]: a (trimmed, non-empty) line is boilerplate when
    it occurs in ≥ ``min_docs`` DISTINCT documents (headers, footers,
    license banners, nav bars — the text dedup granularity BETWEEN exact
    whole-doc (sha256) and token windows (ExactSubstr)); each doc reports
    its total lines, boilerplate-line occurrences, and the removable
    fraction. Docs with zero non-empty lines have no row.

    Scale shape (the ngram_decontamination pattern at line granularity):
    map-side line split + h60 line keys; the corpus line-frequency is one
    map-combinable distinct + count on uniform hashes; the boilerplate key
    set LEFT-joins back key-partitioned (never broadcast/driver-bound —
    at 100 TB the boilerplate set is corpus-scale); per-doc accounting is
    one map-combinable agg."""
    from .stats import round6

    lines = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
        )
        .select("doc_id", F.trim(F.col("raw")).alias("line"))
        .filter(F.col("line") != "")
        .select("doc_id", h60(F.col("line")).alias("lh"))
    )
    lines = lines.persist()
    boiler = (
        lines.distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("lh", F.lit(1).alias("b"))
    )
    out = (
        lines.join(boiler, "lh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.coalesce(F.col("b"), F.lit(0))).cast("long").alias("n_boiler"),
        )
        .select(
            "doc_id", "n_lines", "n_boiler",
            round6(
                F.col("n_boiler").cast("double") / F.col("n_lines").cast("double")
            ).alias("boiler_frac"),
        )
    )
    out = out.persist()
    out.count()
    lines.unpersist()
    return out


# ------------------------------------------- content-defined chunking (CDC)

CDC_WINDOW = 16   # rolling-window width (chars)
CDC_DIVISOR = 64  # boundary when window-hash % DIVISOR == 0 (E[chunk] ~ 64)


def cdc_chunks(
    docs: DataFrame,
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking → DF[doc_id, chunk_idx, start, chunk_len,
    chunk_h60]: cut after every ``window``-char substring whose h60 hash is
    ≡ 0 (mod ``divisor``) — the rsync/LBFS boundary rule (Muthitacharoen et
    al., SOSP'01). Chunk-level hashes are what sub-document dedup and
    delta-storage key on: insertions shift byte offsets but boundaries
    re-synchronize, so unchanged content keeps identical chunk hashes.

    Boundary selection is POSITION-LOCAL (no sequential scan state, unlike
    min/max-size CDC variants): every position is tested independently, so
    the operator is one map-side projection — embarrassingly parallel at
    any corpus size, zero shuffle. A production gear-hash is a faster
    rolling window; h60 is used so the DuckDB twin is bit-identical
    (engine-wide invariant #6).

    Plan shape: the cut array is materialized in ONE projection behind a
    persist barrier before being indexed per-chunk — Catalyst's projection
    collapse would otherwise re-inline the full md5 chain once per chunk
    (CLAUDE.md sharp edge). The barrier frame is released before return.
    """
    w, d = window, divisor
    text = F.col(text_col)
    L = F.length(text)
    npos = L - (w - 1)
    cuts = F.filter(
        F.transform(
            F.sequence(F.lit(1), npos),
            lambda i: F.when(h60(text.substr(i, F.lit(w))) % d == 0, i + (w - 1)),
        ),
        lambda c: c.isNotNull() & (c < L),
    )
    mid = (
        docs.filter(L >= 1)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            text.alias("text"),
            F.when(npos >= 1, cuts)
            .otherwise(F.array().cast("array<int>"))
            .alias("cuts"),
        )
        .select(
            "doc_id", "text",
            F.concat(F.col("cuts"), F.array(F.length("text"))).alias("ends"),
        )
        .persist()
    )
    ex = mid.select(
        "doc_id", "text", "ends",
        F.posexplode("ends").alias("j", "end"),
    )
    start = F.when(F.col("j") == 0, F.lit(1)).otherwise(
        F.element_at(F.col("ends"), F.col("j")) + 1
    )
    out = (
        ex.select(
            "doc_id",
            (F.col("j") + 1).cast("long").alias("chunk_idx"),
            start.cast("long").alias("start"),
            (F.col("end") - start + 1).cast("long").alias("chunk_len"),
            h60(
                F.col("text").substr(start, F.col("end") - start + 1)
            ).alias("chunk_h60"),
        )
        .persist()
    )
    out.count()
    mid.unpersist()
    return out


def xent_buckets(
    tf_df: DataFrame, term_stats: DataFrame, n_buckets: int = 3
) -> DataFrame:
    """CCNet-style perplexity bucketing → DF[doc_id, xent, bucket]: docs
    ranked by unigram-LM cross-entropy and split into equal-size tiers
    (bucket 1 = 'head' = most corpus-like … n = 'tail'), the standard
    quality-tiered sampling key for pretraining curation (Wenzek et al.,
    CCNet, 2020).

    Determinism: NTILE over the engine-wide total order (round6(xent) ASC,
    doc_id ASC) — rank identity holds across engines because xent is
    already quantized at output precision (invariant #3). The global
    window sorts only (doc_id, xent) — two narrow columns; the 100 TB
    variant broadcasts sample-quantile thresholds instead of ranking
    exactly (same operator contract, approximate tier boundaries), which
    this exact NTILE is the small-scale oracle for."""
    from pyspark.sql.window import Window

    from .textpipe import unigram_xent

    x = unigram_xent(tf_df, term_stats)
    wn = Window.orderBy(F.asc("xent"), F.asc("doc_id"))
    return x.select(
        "doc_id", "xent",
        F.ntile(n_buckets).over(wn).cast("long").alias("bucket"),
    )


def cdc_chunk_dedup(docs: DataFrame) -> DataFrame:
    """Chunk-level duplication accounting over the CDC chunks → DF[doc_id,
    n_chunks, n_dup_chunks, dup_len, dup_chunk_frac]: a chunk is
    duplicated when its h60 occurs in ≥ 2 DISTINCT documents — the
    sub-document dedup granularity between whole-doc sha256 and token
    windows, keyed on content-defined boundaries so it survives
    insertions/shifts (the line_boilerplate pattern one level down).

    Scale: chunk keys are uniform hashes; the shared-set detection is one
    map-combinable aggregate and the per-doc accounting joins back
    KEY-PARTITIONED on chunk_h60 (never broadcast — the shared set is
    corpus-scale at 100 TB)."""
    from .stats import round6

    ch = cdc_chunks(docs)
    shared = (
        ch.groupBy("chunk_h60")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_h60", F.lit(1).alias("is_dup"))
    )
    out = (
        ch.join(shared, "chunk_h60", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.coalesce("is_dup", F.lit(0))).cast("long").alias("n_dup_chunks"),
            F.sum(
                F.when(F.col("is_dup") == 1, F.col("chunk_len")).otherwise(0)
            ).cast("long").alias("dup_len"),
        )
        .select(
            "doc_id", "n_chunks", "n_dup_chunks", "dup_len",
            round6(
                F.col("n_dup_chunks").cast("double")
                / F.col("n_chunks").cast("double")
            ).alias("dup_chunk_frac"),
        )
    )
    out = out.persist()
    out.count()
    ch.unpersist()
    return out


#: PII patterns — identical regex STRINGS on both engines (no lookarounds:
#: RE2-safe), scanned non-overlapping leftmost by both regex engines.
PII_EMAIL = r"[a-z0-9_.+-]+@[a-z0-9-]+\.[a-z0-9.-]+"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_NUMBER = r"\d{2,}"


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII / sensitive-pattern scan → DF[<id_col>, n_emails, n_ipv4,
    n_numbers, has_pii]: per-row non-overlapping match counts for the
    published curation patterns (email, IPv4, long digit runs) — the
    detection half of a redaction pass (the replace is the same three
    regexes through regexp_replace). A pre-training corpus gate next to
    gopher_rules/line_boilerplate.

    Pure codegen: three regexp_extract_all + size per row, no shuffle at
    all — the same exchange-free contract as cdc_chunks; at 100 TB this
    is a map-only scan. Patterns avoid lookarounds so the Java-regex and
    RE2 scans agree token-for-token."""
    # NULL text scans as empty (0 counts) — bare size(regexp(NULL)) would
    # yield Spark's legacy -1 while the DuckDB twin yields NULL.
    c = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    cnt = lambda p: F.size(F.regexp_extract_all(c, F.lit(p), 0)).cast("long")  # noqa: E731
    out = df.select(
        F.col(id_col).cast("long").alias(id_col),
        cnt(PII_EMAIL).alias("n_emails"),
        cnt(PII_IPV4).alias("n_ipv4"),
        cnt(PII_NUMBER).alias("n_numbers"),
    )
    return out.select(
        id_col,
        "n_emails",
        "n_ipv4",
        "n_numbers",
        (
            (F.col("n_emails") + F.col("n_ipv4") + F.col("n_numbers")) > 0
        ).cast("long").alias("has_pii"),
    )


#: ES adjacency_matrix filters: named doc-sets by term membership, over the
#: fixture's three highest-df vocabulary terms.
ADJACENCY_FILTERS = {"q_query": "query", "w_window": "window", "s_scan": "scan"}


def term_adjacency_matrix(
    docs: DataFrame, filters: dict[str, str] = ADJACENCY_FILTERS
) -> DataFrame:
    """ES adjacency_matrix aggregation → DF[key_a, key_b, n_docs]: for
    named filters (here: docs containing a given term), the document count
    of every filter and every pairwise intersection (key_a ≤ key_b, empty
    intersections omitted — ES semantics).

    Plan: ONE tokenize pass filtered to the filter terms (the IN predicate
    prunes before the explode collapses), distinct (doc_id, key)
    membership, then a doc_id-keyed self-join of a frame bounded by
    |docs|·|filters| — at 100 TB the join is co-partitioned on doc_id and
    the output is |filters|² rows. The membership frame is persisted: both
    self-join sides would otherwise re-run the tokenize (CLAUDE.md sharp
    edge)."""
    from .tokenize import tokens_col

    key_of = F.create_map(
        *[x for k, t in sorted(filters.items()) for x in (F.lit(t), F.lit(k))]
    )
    terms = list(filters.values())
    m = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.array_distinct(tokens_col("text"))).alias("term"),
        )
        .filter(F.col("term").isin(*terms))
        .select("doc_id", key_of[F.col("term")].alias("key"))
        .persist()
    )
    m.count()
    a, b = m.alias("a"), m.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.key") <= F.col("b.key")),
        )
        .groupBy(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    out = out.persist()
    out.count()
    m.unpersist()
    return out


def term_triangles(docs: DataFrame) -> DataFrame:
    """Triangle counts per node over the term co-occurrence graph →
    DF[term, n_triangles] (every graph node appears; 0 when in no
    triangle) — the classic graph-analytics kernel (local clustering /
    community density) on the same edge list PageRank runs on.

    Edges are stored once per unordered pair with term_a < term_b — a
    fixed total-order ORIENTATION, so each triangle a<b<c is enumerated
    exactly once by the wedge join e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c), no
    dedup/division pass. At web scale the same plan holds with the order
    switched to (degree, id) — the standard bound that caps wedge fanout
    by the max ORIENTED degree (Schank/Wagner): the joins stay
    key-partitioned on the shared endpoint and nothing is ever global."""
    from .tokenize import tokens_col  # noqa: F401  (module convention)

    # keep the ORIGINAL persisted handle: unpersist on a projected child
    # is a no-op (plan sameResult never matches), leaking the cache
    pairs = cooccurrence_edges(docs)
    e = pairs.select("term_a", "term_b")
    w = (
        e.alias("e1")
        .join(
            e.alias("e2"),
            F.col("e2.term_a") == F.col("e1.term_b"),
        )
        .join(
            e.alias("e3"),
            (F.col("e3.term_a") == F.col("e1.term_a"))
            & (F.col("e3.term_b") == F.col("e2.term_b")),
        )
        .select(
            F.col("e1.term_a").alias("a"),
            F.col("e1.term_b").alias("b"),
            F.col("e2.term_b").alias("c"),
        )
    )
    members = w.select(F.explode(F.array("a", "b", "c")).alias("term"))
    counts = members.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    nodes = (
        e.select(F.col("term_a").alias("term"))
        .union(e.select(F.col("term_b").alias("term")))
        .distinct()
    )
    out = nodes.join(counts, "term", "left").select(
        "term", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )
    out = out.persist()
    out.count()
    pairs.unpersist()
    return out


def lang_token_fertility(docs: DataFrame) -> DataFrame:
    """Tokenizer-fertility diagnostic per language → DF[lang, n_docs,
    n_tokens, n_chars, chars_per_token, tokens_per_doc]: the chars-per-
    token ratio is the standard cross-lingual tokenizer-cost metric (a
    language whose ratio diverges pays more sequence length per
    character). One map-side-combinable aggregate; exact int sums, two
    round6 divisions."""
    from .stats import round6
    from .tokenize import tokens_col

    per = (
        docs.select(
            "lang",
            F.size(tokens_col("text")).alias("ntok"),
            F.col("n_chars").cast("long").alias("nch"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum("nch").cast("long").alias("n_chars"),
        )
    )
    return per.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.when(
            F.col("n_tokens") > 0,
            round6(F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")),
        ).alias("chars_per_token"),
        round6(
            F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
        ).alias("tokens_per_doc"),
    )


#: ln(2) as an identical double literal in both engines (correctly-rounded
#: strtod of the same digits) — entropy-in-bits conversion never executes a
#: cross-engine log2 (whose libm implementations differ), only ln (the
#: bigram_xent 9-dp-quantize discipline).
LN2_LITERAL = "0.6931471805599453"


def doc_string_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ES string_stats aggregation per language → DF[lang, n_docs, min_len,
    max_len, avg_len, entropy]: length stats plus the Shannon entropy of the
    CHARACTER distribution (ES's showed_distribution source).

    Entropy discipline: per character CLASS, ln(c/T) is quantized once to
    9 dp (bigram_xent precedent), weighted by the exact integer count and
    summed in decimals (order-independent); the nats→bits conversion
    divides by an ln(2) double LITERAL shared verbatim by both engines —
    no cross-engine log2 executes. The char explode is heavy but
    map-side-combinable into a (lang × charset)-bounded frame; '[\\s\\S]'
    (not '.') so Java and RE2 agree on newline handling."""
    from .stats import round6

    chars = docs.select(
        "lang", F.explode(F.regexp_extract_all(text_col, F.lit(r"[\s\S]"), 0)).alias("ch")
    )
    cc = chars.groupBy("lang", "ch").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cc.groupBy("lang").agg(F.sum("c").cast("long").alias("t"))
    ent = (
        cc.join(tot, "lang")
        .select(
            "lang", "t",
            (
                F.col("c").cast("decimal(9,0)")
                * F.round(
                    F.log(F.col("c").cast("double") / F.col("t").cast("double")), 9
                ).cast("decimal(28,9)")
            ).alias("term"),
        )
        .groupBy("lang")
        .agg(F.sum("term").cast("decimal(38,9)").alias("s"), F.max("t").alias("t"))
    )
    lens = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min(F.length(text_col)).cast("long").alias("min_len"),
        F.max(F.length(text_col)).cast("long").alias("max_len"),
        F.sum(F.length(text_col).cast("decimal(18,0)")).alias("sl"),
    )
    return lens.join(ent, "lang").select(
        "lang", "n_docs", "min_len", "max_len",
        round6(F.col("sl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avg_len"
        ),
        round6(
            (-F.col("s").cast("double") / F.col("t").cast("double"))
            / F.lit(float(LN2_LITERAL))
        ).alias("entropy"),
    )


STRING_STATS_SQL = f"""WITH chars AS (
  SELECT lang, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch FROM documents
),
cc AS (SELECT lang, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM cc GROUP BY 1),
ent AS (
  SELECT cc.lang,
         CAST(SUM(CAST(cc.c AS DECIMAL(9,0))
              * CAST(ROUND(ln(CAST(cc.c AS DOUBLE) / CAST(tot.t AS DOUBLE)), 9)
                     AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS s,
         MAX(tot.t) AS t
  FROM cc JOIN tot ON cc.lang = tot.lang GROUP BY 1
),
lens AS (
  SELECT lang, COUNT(*) AS n_docs,
         MIN(length(text)) AS min_len, MAX(length(text)) AS max_len,
         SUM(CAST(length(text) AS DECIMAL(18,0))) AS sl
  FROM documents GROUP BY 1
)
SELECT l.lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(min_len AS BIGINT) AS min_len, CAST(max_len AS BIGINT) AS max_len,
       CAST(ROUND(CAST(CAST(sl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_len,
       CAST(ROUND(CAST((-CAST(e.s AS DOUBLE) / CAST(e.t AS DOUBLE)) / {LN2_LITERAL} AS DECIMAL(28,9)), 6) AS DOUBLE) AS entropy
FROM lens l JOIN ent e ON l.lang = e.lang"""


TERMS_ERR_NSHARDS = 4
TERMS_ERR_SHARD_K = 12
TERMS_ERR_TOPN = 10


def terms_shard_error(
    tf_df: DataFrame,
    nshards: int = TERMS_ERR_NSHARDS,
    shard_k: int = TERMS_ERR_SHARD_K,
    topn: int = TERMS_ERR_TOPN,
) -> DataFrame:
    """ES terms aggregation's DISTRIBUTED APPROXIMATION contract →
    DF[rank, term, est_df, err_bound, exact_df]: per-shard top-k term doc
    counts merged into a global top-n with the documented
    doc_count_error_upper_bound — a term missing from a shard's page may
    hide at most that shard's k-th count.

    Shards are deterministic h60 doc partitions (the real engine's routing
    hash), so estimate AND bound are value-checkable. Everything is
    integer: per-shard counts map-combine; the per-shard page is a window
    over the (shards × vocab)-bounded frame (a TakeOrdered per shard at web
    scale); candidates (≤ shards·k rows) cross the tiny shard-kth frame
    broadcast-style. exact_df rides along as the accuracy report —
    invariant: est_df ≤ exact_df ≤ est_df + err_bound."""
    shard = F.pmod(
        h60(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))),
        F.lit(nshards),
    )
    per = (
        tf_df.select("term", shard.alias("shard"))
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("term"))
    ranked = per.withColumn("rn", F.row_number().over(w)).persist()
    kept = ranked.filter(F.col("rn") <= shard_k)
    kth = ranked.filter(F.col("rn") == shard_k).select(
        "shard", F.col("c").alias("kth")
    )
    shards = (
        per.select("shard")
        .distinct()
        .join(kth, "shard", "left")
        .select("shard", F.coalesce("kth", F.lit(0)).cast("long").alias("kth"))
    )
    grid = kept.select("term").distinct().crossJoin(shards)
    j = grid.join(kept.select("shard", "term", "c"), ["shard", "term"], "left")
    agg = j.groupBy("term").agg(
        F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("est_df"),
        F.sum(F.when(F.col("c").isNull(), F.col("kth")).otherwise(0))
        .cast("long")
        .alias("err_bound"),
    )
    exact = tf_df.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("exact_df")
    )
    out = agg.join(exact, "term")
    w2 = Window.orderBy(F.desc("est_df"), F.asc("term"))
    res = (
        out.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= topn)
        .select("rank", "term", "est_df", "err_bound", "exact_df")
    )
    res = res.persist()
    res.count()
    ranked.unpersist()
    return res


# ------------------------------------------------- round-4 session-7

CATEGORIZE_TOKENS = 4


def categorize_text(docs: DataFrame, n_tokens: int = CATEGORIZE_TOKENS) -> DataFrame:
    """ES ``categorize_text`` aggregation (log-message categorization) →
    DF[category, n_docs, example_doc_id]: documents grouped by message
    TEMPLATE — the leading token sequence with digit runs masked to '#'
    (ES's categorizer also tokenizes, strips numerics and clusters on the
    residual token stream; its online drain-tree is arrival-order-dependent, so
    this entry pins the deterministic core: mask + fixed-prefix key,
    reproducible on any engine — the variable_width_histogram precedent).

    One codegen projection (tokenize → slice → per-token digit mask →
    join) and one map-combinable group-by; example_doc_id = MIN(doc_id)
    gives each category a stable exemplar. The masked-prefix key is also
    what a 100 TB log pipeline shards on — categories are Zipfian but the
    agg is two-level combinable, the terms-agg shape."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.slice(tokens_col(F.col("text")), 1, n_tokens).alias("head"),
    )
    cat = toks.select(
        "doc_id",
        F.array_join(
            F.transform("head", lambda x: F.regexp_replace(x, "[0-9]+", "#")),
            " ",
        ).alias("category"),
    )
    return cat.groupBy("category").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("example_doc_id"),
    )


CATEGORIZE_SQL = f"""WITH tokd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ts
  FROM documents
),
cat AS (
  SELECT doc_id,
         array_to_string(
           list_transform(ts[1:{CATEGORIZE_TOKENS}], x -> regexp_replace(x, '[0-9]+', '#', 'g')),
           ' ') AS category
  FROM tokd
)
SELECT category, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS example_doc_id
FROM cat GROUP BY 1"""


def nb_lang_confusion(docs: DataFrame) -> DataFrame:
    """Multinomial naive-Bayes language classifier, trained AND evaluated
    in one job → confusion matrix DF[true_lang, pred_lang, n_docs]: the
    label-quality audit a training-data pipeline runs on its language
    tags (fastText-style linear classification reduced to its exactly-
    checkable core — NB is the one text classifier whose training is a
    single group-by).

        logp(t|L) = round9(ln((cnt+1) / (tot_L + V)))   (add-one smoothing)
        score(d, L) = round9(ln(n_L / N)) + Σ_t tf · logp(t|L)
        pred(d) = argmax_L score  (DECIMAL compare — exact; tie → lang ASC)

    Float discipline: every ln routes through the string_stats round9
    quantize, is cast to decimal(28,9) and weighted by exact integer tf
    (decimal(9,0) cast BEFORE the product — the 38-digit-cap sharp edge);
    scores are decimal(38,9) sums, so the argmax compares exact decimals,
    never doubles. Plan: training is one (lang, term) group-by; scoring
    joins the postings against the (V × n_langs)-bounded model table —
    broadcast at any corpus scale — and reduces per (doc, lang); the only
    corpus-sized shuffle is the per-doc aggregation the flagship already
    pays. Docs with zero tokens have no posterior and are excluded (both
    engines identically)."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("true_lang"),
        F.explode(tokens_col(F.col("text"))).alias("term"),
    )
    postings = toks.groupBy("doc_id", "true_lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    cnt = postings.groupBy(F.col("true_lang").alias("lang"), "term").agg(
        F.sum("tf").cast("long").alias("c")
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("t"))
    vocab = postings.select("term").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    nl = docs.groupBy(F.col("lang")).agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    n_tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    model = (
        cnt.join(tot, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang", "term",
            F.round(
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("t") + F.col("v")).cast("double")
                ),
                9,
            ).cast("decimal(28,9)").alias("logp"),
        )
    )
    lang_side = (
        tot.crossJoin(F.broadcast(vocab))
        .join(nl, "lang")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "lang",
            F.round(
                F.log(F.lit(1.0) / (F.col("t") + F.col("v")).cast("double")), 9
            ).cast("decimal(28,9)").alias("logp_unseen"),
            F.round(
                F.log(F.col("n_l").cast("double") / F.col("n").cast("double")), 9
            ).cast("decimal(28,9)").alias("log_prior"),
        )
    )
    scored = (
        postings.crossJoin(F.broadcast(lang_side))
        .join(F.broadcast(model), ["lang", "term"], "left")
        .select(
            "doc_id", "true_lang", "lang", "log_prior",
            (
                F.col("tf").cast("decimal(9,0)")
                * F.coalesce("logp", "logp_unseen")
            ).alias("contrib"),
        )
        .groupBy("doc_id", "true_lang", "lang")
        .agg(
            (F.sum("contrib").cast("decimal(38,9)") + F.max("log_prior")).alias(
                "score"
            )
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    pred = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("doc_id", "true_lang", F.col("lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


NB_LANG_SQL = """WITH tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS true_lang,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS term
  FROM documents
),
postings AS (
  SELECT doc_id, true_lang, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3
),
cnt AS (SELECT true_lang AS lang, term, SUM(tf) AS c FROM postings GROUP BY 1, 2),
tot AS (SELECT lang, SUM(c) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT term) AS v FROM postings),
nl AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
ntot AS (SELECT COUNT(*) AS n FROM documents),
model AS (
  SELECT cnt.lang, cnt.term,
         CAST(ROUND(ln(CAST(cnt.c + 1 AS DOUBLE) / CAST(tot.t + vocab.v AS DOUBLE)), 9) AS DECIMAL(28,9)) AS logp
  FROM cnt JOIN tot USING (lang), vocab
),
lang_side AS (
  SELECT tot.lang,
         CAST(ROUND(ln(1.0 / CAST(tot.t + vocab.v AS DOUBLE)), 9) AS DECIMAL(28,9)) AS logp_unseen,
         CAST(ROUND(ln(CAST(nl.n_l AS DOUBLE) / CAST(ntot.n AS DOUBLE)), 9) AS DECIMAL(28,9)) AS log_prior
  FROM tot JOIN nl USING (lang), vocab, ntot
),
scored AS (
  SELECT p.doc_id, p.true_lang, ls.lang,
         CAST(SUM(CAST(p.tf AS DECIMAL(9,0)) * COALESCE(m.logp, ls.logp_unseen)) AS DECIMAL(38,9))
           + MAX(ls.log_prior) AS score
  FROM postings p
  CROSS JOIN lang_side ls
  LEFT JOIN model m ON m.lang = ls.lang AND m.term = p.term
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS r
  FROM scored
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE r = 1 GROUP BY 1, 2"""


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction (the replace half of ``pii_scan``) → DF[<id_col>,
    n_redactions, redacted_h60]: the three published patterns replace with
    typed placeholder tokens in a FIXED order — email → <email> first
    (emails contain dots and digits that would otherwise shred into the
    later patterns), IPv4 → <ip> second, remaining ≥2-digit runs → <num>
    last. n_redactions counts the replacements actually made (each
    pattern's matches on the text as it stands AFTER the previous
    replacement — counting all three on the raw text would double-count
    the digits inside an address). The redacted text itself is
    value-checked as its h60 hash, so a single divergent byte anywhere in
    any row fails the oracle.

    Pure codegen map-only scan (the pii_scan contract); Java regex and
    RE2 agree on these lookaround-free patterns, and the DuckDB twin's
    regexp_replace carries the 'g' flag (DuckDB replaces first-only by
    default; Spark always replaces all)."""
    c0 = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n1 = F.size(F.regexp_extract_all(c0, F.lit(PII_EMAIL), 0))
    c1 = F.regexp_replace(c0, F.lit(PII_EMAIL), F.lit("<email>"))
    n2 = F.size(F.regexp_extract_all(c1, F.lit(PII_IPV4), 0))
    c2 = F.regexp_replace(c1, F.lit(PII_IPV4), F.lit("<ip>"))
    n3 = F.size(F.regexp_extract_all(c2, F.lit(PII_NUMBER), 0))
    c3 = F.regexp_replace(c2, F.lit(PII_NUMBER), F.lit("<num>"))
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        (n1 + n2 + n3).cast("long").alias("n_redactions"),
        h60(c3).alias("redacted_h60"),
    )
