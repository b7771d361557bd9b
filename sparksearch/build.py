"""B1–B5 + S4: physical inverted-index build (SURVEY.md §2.4).

Segment layout (flat block rows — parquet-native so term/bucket predicates
push down to the scan, no nested decode needed for pruning):

    segments/bucket=<b>/*.parquet
      term, range_id, first_doc_id, last_doc_id, n, doc_gaps, tfs, max_score
    dictionary/*.parquet
      term, bucket, df, cf, idf, max_score
    stats.json   {n_docs, avgdl, range_size, n_ranges, n_buckets, block_size}

Scale design (BASELINE.json:6,14 — "salted repartitioning on term to defuse
Zipfian term skew"):

* ``range_id = doc_id // range_size`` is the deterministic doc-space salt:
  repartitioning on (term, range_id) fans a hot term's postings over
  ``n_ranges`` independent reducers — no single task ever owns a hot term's
  full list. Deterministic (derived from doc_id, never rand()) so retries,
  resume and rebuilds produce byte-identical segments.
* Ranges are *contiguous* docID intervals, so (a) delta gaps stay small
  (good compression), (b) a document's postings for every term live in the
  same range — which is exactly what lets query-time DAAT shard by range_id
  and keep a bounded min-heap per shard (sparksearch.daat).
* The "global segment layout" merge (B4) is the (term, range_id) → bucket
  repartition + partitionBy(bucket) write: ranges are disjoint and ordered,
  so the global docID-sorted list per term is the range-ordered concatenation
  of sub-lists — the k-way merge is positional, paid zero compute.
* BM25 block-max scores are computed JVM-side (one Catalyst expression) and
  travel into the encode UDF as a column; the Python side is pure NumPy over
  Arrow batches (BASELINE.json:15 — no per-row Python).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import BLOCK_SIZE, encode_sublist
from .stats import bm25_term_score_col, doc_freq, with_idf

SEGMENT_COLS = (
    "term string, range_id int, first_doc_id long, last_doc_id long, n int, "
    "doc_gaps binary, tfs binary, dls binary, max_score double"
)


def _tok_tf_kernel(text_col: str, id_col: str, code_aware: bool = False):
    """mapInPandas kernel: raw docs → exploded (doc_id, term, tf, dl) postings
    in ONE vectorized Arrow pass — tokenize, per-doc term counting and doc
    length all happen map-side, so the postings frame needs NO occurrence
    shuffle (the old explode → groupBy(term, doc_id) moved every token
    occurrence — ~2.3× the posting count — through an exchange) and NO
    doc-length join later (dl rides along as a column). Token-empty docs
    contribute no rows — identical to the explode/groupBy semantics and the
    DuckDB oracle's ``WHERE term <> ''``. Per-batch work is pandas/NumPy
    C kernels (str.findall, hash groupby, repeat/concat) — no per-row Python
    beyond the token-list flatten."""

    def fn(it):
        from itertools import chain

        from .tokenize import _CAMEL_RE, TOKEN_RE

        for pdf in it:
            if not len(pdf):
                continue
            # NULL text ⇒ no tokens ⇒ no postings — same as the declarative
            # twin (tokens_col of NULL is NULL, explode drops it) and the
            # DuckDB oracle's WHERE term <> ''. Without the fillna,
            # str.findall yields None rows and the flatten crashes.
            texts = pdf[text_col].fillna("")
            if code_aware:
                # identifier splitting (snake_case/camelCase) — same
                # semantics as tokenize._tokenize_code_udf / py_tokenize_code
                texts = texts.str.replace(_CAMEL_RE, " ", regex=True).str.replace("_", " ")
            toks = texts.str.lower().str.findall(TOKEN_RE)
            lens = toks.str.len().to_numpy(dtype=np.int64)
            if int(lens.sum()) == 0:
                continue
            flat = np.asarray(list(chain.from_iterable(toks)), dtype=object)
            didx = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            g = (
                pd.DataFrame({"d": didx, "term": flat})
                .groupby(["d", "term"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            d = g["d"].to_numpy()
            # lead: exactly one True row per document (its first posting) —
            # lets per-DOC stats (n_docs, Σdl, doclens) ride the posting
            # frame as map-only filters/Observations, no doc_id shuffle.
            lead = np.empty(len(d), dtype=bool)
            if len(d):
                lead[0] = True
                lead[1:] = d[1:] != d[:-1]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy()[d],
                    "term": g["term"].to_numpy(),
                    "tf": g["tf"].to_numpy().astype(np.int32),
                    "dl": lens[d].astype(np.int32),
                    "lead": lead,
                }
            )

    return fn


def tokenize_tf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                code_aware: bool = False) -> DataFrame:
    """The build hot path's first stage: DF[doc_id, term, tf, dl, lead] via
    the one-pass Arrow kernel. Tested equal to the declarative twin
    term_freq(explode_postings(tokenize(docs))) ⋈ doc_len (test_index.py).

    ``code_aware=True`` (opt-in, off by default — golden tests and oracles
    pin the plain tokenizer) splits snake_case/camelCase identifiers before
    tokenizing, for source-code corpora (BASELINE.json input_hint)."""
    return docs.mapInPandas(
        _tok_tf_kernel(text_col, id_col, code_aware),
        "doc_id long, term string, tf int, dl int, lead boolean",
    )


def _encode_group_fn(block_size: int):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        # One group = one (term, range_id) sub-list. Arrow batch in, NumPy only.
        order = np.argsort(pdf["doc_id"].values, kind="stable")
        ids = pdf["doc_id"].values[order]
        tfs = pdf["tf"].values[order]
        dls = pdf["dl"].values[order]
        scores = pdf["score"].values[order]
        enc = encode_sublist(ids, tfs, scores, block_size, dls=dls)
        nb = len(enc["n"])
        return pd.DataFrame(
            {
                "term": np.repeat(pdf["term"].iloc[0], nb),
                "range_id": np.repeat(np.int32(pdf["range_id"].iloc[0]), nb),
                "first_doc_id": enc["first_doc_id"],
                "last_doc_id": enc["last_doc_id"],
                "n": enc["n"],
                "doc_gaps": enc["doc_gaps"],
                "tfs": enc["tfs"],
                "dls": enc["dls"],
                "max_score": enc["max_score"],
            }
        )

    return encode


def build_segments(
    tf_df: DataFrame,
    dl_df: DataFrame,
    term_stats: DataFrame,
    range_size: int,
    n_buckets: int = 64,
    block_size: int = BLOCK_SIZE,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """B1–B4: postings + stats → flat block rows with bucket column.

    tf_df: [term, doc_id, tf(, dl)]; dl_df: [doc_id, dl]; term_stats must
    carry (term, idf, avgdl) (from stats.with_idf). When tf_df already
    carries dl (the one-pass tokenize_tf path) the doc-length join — a full
    shuffle of the postings on doc_id — is skipped entirely: the salted
    (term, range_id) repartition below is then the ONLY full-data exchange
    in the whole build."""
    base = tf_df.join(term_stats.select("term", "idf", "avgdl"), "term")
    if "dl" not in tf_df.columns:
        base = base.join(dl_df, "doc_id")
    scored = (
        base
        .select(
            "term",
            "doc_id",
            # Narrow types through the B1 exchange + Arrow boundary: tf/dl
            # fit int32 by construction (dl is a per-doc token count).
            F.col("tf").cast("int").alias("tf"),
            F.col("dl").cast("int").alias("dl"),
            bm25_term_score_col().alias("score"),
            (F.col("doc_id") / F.lit(int(range_size))).cast("int").alias("range_id"),
        )
    )
    # B1: deterministic salted repartition — hot terms fan out over ranges.
    parts = shuffle_partitions or tf_df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    salted = scored.repartition(int(parts), "term", "range_id")
    # B2+B3: per-(term, range) sort + block encode (NumPy inside Arrow batches).
    blocks = salted.groupBy("term", "range_id").applyInPandas(
        _encode_group_fn(block_size), SEGMENT_COLS
    )
    # B4: assign the global layout bucket (deterministic hash of term).
    return blocks.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_ranges: int | None = None,
    block_size: int = BLOCK_SIZE,
    mode: str = "overwrite",
    code_aware: bool = False,
) -> dict:
    """Full single-shot build: documents → segments + dictionary + stats.json.

    For the resumable per-unit path see ``checkpoint.build_resumable`` — it
    stages postings per source partition and then calls ``finalize_index``
    over the committed units' postings. ``code_aware`` opts into identifier
    splitting for source-code corpora (queries must then be tokenized with
    tokenize.py_tokenize_code to match).
    """
    # ONE Arrow pass: tokenize + per-doc tf + dl, all map-side (tokenize_tf).
    tf_df = tokenize_tf(
        docs.select(F.col(id_col).alias("doc_id"), text_col), text_col,
        code_aware=code_aware,
    )
    return finalize_index(
        spark, tf_df, index_path,
        n_buckets=n_buckets, n_ranges=n_ranges, block_size=block_size, mode=mode,
    )


def finalize_index(
    spark: SparkSession,
    tf_df: DataFrame,
    index_path: str,
    n_buckets: int = 64,
    n_ranges: int | None = None,
    block_size: int = BLOCK_SIZE,
    mode: str = "overwrite",
) -> dict:
    """Stage II: (term, doc_id, tf[, dl, lead]) postings → segments +
    dictionary + stats.

    At cluster scale tf_df is the committed per-unit postings table on disk
    (checkpoint.build_resumable) — every downstream branch re-reads cheap
    columnar postings instead of re-tokenizing raw text.

    Scaling-efficiency design (the serial/fixed costs here directly cap the
    N→4N rule — every job barrier and every exchange was audited):

    * global stats (n_docs, Σdl, max doc_id) ride an ``Observation`` on the
      job that materializes the postings cache — no separate doc-aggregate
      job, no doc_id exchange, one driver round-trip total. The ``lead``
      flag (one True per doc) makes the per-doc sums exact over posting rows.
    * dl_df is a map-only ``filter(lead)`` projection of the cache.
    * the encoded block frame is cached once and the three sinks (segments,
      doclens, dictionary) are written by CONCURRENT driver threads — writes
      overlap instead of serializing three commit barriers; the dictionary's
      global block-max aggregates the cached blocks, not a re-read of the
      just-written files.
    * the only full-data exchange left in the whole build is the salted
      (term, range_id) repartition feeding the encoder (build_segments).
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))

    has_lead = "lead" in tf_df.columns
    if has_lead:
        obs = Observation()
        tf_df = tf_df.observe(
            obs,
            F.sum(F.when(F.col("lead"), 1).otherwise(0)).alias("n_docs"),
            F.sum(F.when(F.col("lead"), F.col("dl")).otherwise(0)).alias("sum_dl"),
            F.max("doc_id").alias("max_id"),
        )
        tf_df = tf_df.persist()
        tf_df.count()  # materialize cache; stats ride this one job
        m = obs.get
        n_docs, avgdl, max_id = int(m["n_docs"]), m["sum_dl"] / m["n_docs"], int(m["max_id"])
        dl_df = tf_df.filter("lead").select("doc_id", "dl")
    else:
        # Legacy path: bare (term, doc_id, tf) postings (no dl column).
        tf_df = tf_df.persist()
        dl_df = tf_df.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl"))
        srow = dl_df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.max("doc_id").alias("max_id"),
        ).collect()[0]
        n_docs, avgdl, max_id = int(srow["n_docs"]), float(srow["avgdl"]), int(srow["max_id"])

    range_size = max(1, math.ceil((max_id + 1) / n_ranges))
    # Literal 1-row stats frame (already collected) — keeps every downstream
    # plan free of an embedded re-aggregation of dl_df.
    stats_df = spark.createDataFrame([(n_docs, float(avgdl))], "n_docs long, avgdl double")
    term_stats = with_idf(doc_freq(tf_df), stats_df)

    seg = build_segments(
        tf_df, dl_df, term_stats, range_size, n_buckets, block_size
    ).persist()
    seg.count()  # run the one big exchange + encode; sinks below read cache
    gmax = seg.groupBy("term").agg(
        F.max("max_score").alias("max_score"), F.first("bucket").alias("bucket")
    )
    dictionary = term_stats.select("term", "df", "cf", "idf").join(gmax, "term")

    def _w_segments():
        seg.write.mode(mode).partitionBy("bucket").parquet(
            os.path.join(index_path, "segments")
        )

    def _w_doclens():
        # Doc-length sidecar (audits + rebuild checks; queries don't need it —
        # blocks are self-contained via the dls stream).
        dl_df.write.mode(mode).parquet(os.path.join(index_path, "doclens"))

    def _w_dictionary():
        dictionary.write.mode(mode).parquet(os.path.join(index_path, "dictionary"))

    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = [pool.submit(w) for w in (_w_segments, _w_doclens, _w_dictionary)]
        for f in futures:
            f.result()

    stats = {
        "n_docs": n_docs,
        "avgdl": float(avgdl),
        "range_size": int(range_size),
        "n_ranges": int(n_ranges),
        "n_buckets": int(n_buckets),
        "block_size": int(block_size),
    }
    seg.unpersist()
    tf_df.unpersist()
    with open(os.path.join(index_path, "stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def load_index(spark: SparkSession, index_path: str):
    """(segments_df, dictionary_df, stats_dict) from an index directory."""
    seg = spark.read.parquet(os.path.join(index_path, "segments"))
    dic = spark.read.parquet(os.path.join(index_path, "dictionary"))
    with open(os.path.join(index_path, "stats.json")) as f:
        stats = json.load(f)
    return seg, dic, stats


def decoded_postings(segments: DataFrame) -> DataFrame:
    """Inverse of the codec as a DataFrame op — decodes every block back to
    (term, doc_id, tf) rows. Test/audit path proving segments ≡ logical
    postings (SURVEY.md §5.2 'decoded-equality')."""

    def decode(it):
        from .codec import decode_block

        for pdf in it:
            terms, ids, tfs = [], [], []
            for term, first, gaps, tfb in zip(
                pdf["term"].values, pdf["first_doc_id"].values,
                pdf["doc_gaps"].values, pdf["tfs"].values,
            ):
                d_ids, d_tfs = decode_block(int(first), gaps, tfb)
                terms.append(np.repeat(term, d_ids.size))
                ids.append(d_ids)
                tfs.append(d_tfs)
            if not terms:
                yield pd.DataFrame({"term": [], "doc_id": [], "tf": []})
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(ids),
                    "tf": np.concatenate(tfs),
                }
            )

    return segments.mapInPandas(decode, "term string, doc_id long, tf long")
