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


def test_round6_cross_engine_on_half_boundaries(spark):
    """stats.round6 == catalog_pipeline._r6 on adversarial inputs: exact
    6-dp halves (where plain ROUND(double, 6) was measured to disagree
    between engines), ULP neighbors of halves, negatives, and assorted
    rationals."""
    import math

    import duckdb

    from sparksearch.catalog_pipeline import _r6
    from sparksearch.stats import round6

    vals = []
    for k in (1, 3, 7, 607001, 1214001, 1276719):
        half = (2 * k + 1) / 2e6          # exact x.xxxxxx5 half
        vals += [half, -half, math.nextafter(half, 0.0),
                 math.nextafter(half, 2.0)]
    vals += [i / 3.0 for i in range(1, 8)]
    vals += [0.0, 1.0, -0.5563345 / 51 * 100]

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(round6("x").alias("y")).collect()]

    con = duckdb.connect()
    rows = ", ".join(f"({v!r})" for v in vals)
    exp = [r[0] for r in con.execute(
        f"SELECT {_r6('x')} FROM (VALUES {rows}) t(x)"
    ).fetchall()]
    assert [f"{a:.6f}" for a in got] == [f"{b:.6f}" for b in exp]
