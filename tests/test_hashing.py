"""Pin the driver-side xxhash64 replica to Spark's JVM implementation —
the positional-sidecar/segment bucket layout depends on exact equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch.hashing import term_bucket, xxhash64

#: Length boundaries of the XXH64 algorithm (0, <4, 4, <8, 8, 31/32/33 for
#: the stripe loop, 64+) plus multi-byte UTF-8.
CASES = [
    "",
    "a",
    "abc",
    "hash",
    "joins",
    "12345678",
    "123456789",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 64,
    "y" * 100,
    "naïve-tökens-日本語",
    "snake_case_identifier_with_length",
]


def test_replica_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in CASES:
        assert xxhash64(s) == got[s], repr(s)


def test_replica_matches_spark_on_fixture_vocab(spark, docs_sf0001):
    from sparksearch.stats import corpus_stats

    _, _, ts, _ = corpus_stats(docs_sf0001)
    vocab = ts.select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b"),
    ).collect()
    assert vocab
    for r in vocab:
        assert xxhash64(r.term) == r.h
        assert term_bucket(r.term, 16) == r.b
