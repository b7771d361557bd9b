"""T1: SQL tokenizer == pandas-UDF tokenizer == driver tokenizer; invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch.tokenize import py_tokenize, tokenize_pandas, tokenize_sql


def test_sql_equals_pandas_udf(spark, docs_sf0001):
    a = tokenize_sql(docs_sf0001, "text").select("doc_id", "tokens")
    b = tokenize_pandas(docs_sf0001, "text").select("doc_id", "tokens")
    diff = a.join(b.withColumnRenamed("tokens", "t2"), "doc_id").filter(
        F.col("tokens") != F.col("t2")
    )
    assert diff.count() == 0


def test_matches_driver_tokenizer(spark):
    texts = [
        "Hello, World! foo_bar BAZ42",
        "  leading; trailing  ",
        "",
        "a",
        "x--y__z",
        "ümlaut café naïve",  # non-ascii letters are separators by definition
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {
        r["doc_id"]: r["tokens"]
        for r in tokenize_sql(df, "text").select("doc_id", "tokens").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_tokenize(t), (i, t)


def test_nchars_invariant(docs_sf0001):
    # measured fixture property: n_chars == length(text) row-wise (FIXTURES.md §A)
    bad = docs_sf0001.filter(F.col("n_chars") != F.length("text")).count()
    assert bad == 0


def test_doclen_variants_equal(spark, docs_sf0001):
    from sparksearch.stats import doc_len, doc_len_via_agg
    from sparksearch.tokenize import explode_postings

    tok = tokenize_sql(docs_sf0001.select("doc_id", "text"), "text")
    a = doc_len(tok)
    b = doc_len_via_agg(explode_postings(tok))
    diff = a.join(b.withColumnRenamed("dl", "dl2"), "doc_id", "full_outer").filter(
        F.col("dl").isNull() | F.col("dl2").isNull() | (F.col("dl") != F.col("dl2"))
    )
    assert diff.count() == 0
