"""Every StructType used across the pipeline — declared, never inferred.

SURVEY.md §1.2. The corpus shape is mandated by BASELINE.json:15 (input_hint);
the fixture ``documents`` table is its small proxy (doc_id↔hash(repo,path,commit),
text↔content — FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Input corpus (BASELINE.json:15): one row per source-code file.
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

#: Fixture documents table (FIXTURES.md §A, measured).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

#: Exploded posting rows, pre-aggregation (SURVEY.md §1.1 "Posting").
POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)

#: One compressed posting-list block (SURVEY.md §1.1 "Posting list / segment"):
#: docIDs delta-gap + varint in ``doc_gaps``; tfs varint in ``tfs``;
#: ``max_tf``/``min_dl`` = the stats-free block-max impact pair (codec.py) —
#: the BM25 block upper bound is derived at query time from the current
#: idf/avgdl (block-max WAND metadata that survives corpus growth).
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("range_id", T.IntegerType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
    ]
)

#: Global segment layout: one row per term per doc-range sub-list
#: (bucket = hash(term) % NB is the storage partition; range_id lets the
#: query engine shard DAAT traversal by docID range at cluster scale).
SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("range_id", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("n_postings", T.LongType(), False),
        T.StructField("blocks", T.ArrayType(BLOCK_SCHEMA), False),
    ]
)

#: Dictionary: one row per term (query planning + idf).
DICTIONARY_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("idf", T.DoubleType(), False),
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
    ]
)

#: Build-manifest row: per-source-partition lineage + throughput metrics
#: (BASELINE.json:6 "resumable … with lineage and postings/sec metrics").
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_postings", T.LongType(), False),
        T.StructField("n_terms", T.LongType(), False),
        T.StructField("build_secs", T.DoubleType(), False),
        T.StructField("postings_per_sec", T.DoubleType(), False),
        T.StructField("docs_per_sec", T.DoubleType(), False),
        T.StructField("committed_at", T.StringType(), False),
    ]
)

#: Query results (S6).
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
