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
from .stats import bm25_term_score_col, doc_freq, term_freq, with_idf
from .tokenize import explode_postings, tokenize

SEGMENT_COLS = (
    "term string, range_id int, first_doc_id long, last_doc_id long, n int, "
    "doc_gaps binary, tfs binary, dls binary, max_score double"
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

    tf_df: [term, doc_id, tf]; dl_df: [doc_id, dl]; term_stats must carry
    (term, idf, avgdl) (from stats.with_idf)."""
    scored = (
        tf_df.join(term_stats.select("term", "idf", "avgdl"), "term")
        .join(dl_df, "doc_id")
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
) -> dict:
    """Full single-shot build: documents → segments + dictionary + stats.json.

    For the resumable per-unit path see ``checkpoint.build_resumable`` — it
    stages postings per source partition and then calls ``finalize_index``
    over the committed units' postings.
    """
    tokenized = tokenize(docs.select(F.col(id_col).alias("doc_id"), text_col), text_col)
    postings = explode_postings(tokenized)
    # Single text pass: tf is the only child of tokenize; dl derives from tf.
    tf_df = term_freq(postings)
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
    """Stage II: (term, doc_id, tf) postings → segments + dictionary + stats.

    At cluster scale tf_df is the committed per-unit postings table on disk
    (checkpoint.build_resumable) — every downstream branch re-reads cheap
    columnar postings instead of re-tokenizing raw text."""
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tf_df = tf_df.persist()
    # ONE driver round-trip for global stats + docID bounds (each collect is a
    # full job — scheduling/codegen latency is serial driver time that caps
    # scaling efficiency, so jobs are merged wherever granularities allow).
    dl_df = tf_df.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl"))
    srow = dl_df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.max("doc_id").alias("max_id"),
    ).collect()[0]
    range_size = max(1, math.ceil((int(srow["max_id"]) + 1) / n_ranges))
    # Literal 1-row stats frame (already collected) — keeps every downstream
    # plan free of an embedded re-aggregation of dl_df.
    stats_df = spark.createDataFrame(
        [(int(srow["n_docs"]), float(srow["avgdl"]))], "n_docs long, avgdl double"
    )
    term_stats = with_idf(doc_freq(tf_df), stats_df)

    seg = build_segments(tf_df, dl_df, term_stats, range_size, n_buckets, block_size)
    seg.write.mode(mode).partitionBy("bucket").parquet(os.path.join(index_path, "segments"))

    # Doc-length sidecar (audits + rebuild checks; queries don't need it —
    # blocks are self-contained via the dls stream).
    dl_df.write.mode(mode).parquet(os.path.join(index_path, "doclens"))

    # B5: dictionary — term stats + global block-max, from the written segments
    # (re-reading parquet is cheap and avoids recomputing the encode DAG).
    seg_r = spark.read.parquet(os.path.join(index_path, "segments"))
    gmax = seg_r.groupBy("term").agg(
        F.max("max_score").alias("max_score"), F.first("bucket").alias("bucket")
    )
    dictionary = term_stats.select("term", "df", "cf", "idf").join(gmax, "term")
    dictionary.write.mode(mode).parquet(os.path.join(index_path, "dictionary"))

    stats = {
        "n_docs": int(srow["n_docs"]),
        "avgdl": float(srow["avgdl"]),
        "range_size": int(range_size),
        "n_ranges": int(n_ranges),
        "n_buckets": int(n_buckets),
        "block_size": int(block_size),
    }
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
