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


def test_code_aware_tokenizer_splits_identifiers(spark):
    from sparksearch.tokenize import py_tokenize_code, tokenize_pandas

    texts = [
        "getValue(get_value) GET_VALUE httpURLConnection",
        "def parse_buffer(buf_ptr): return bufPtr.readAll()",
        "plain words stay identical",
        "x86_64 camelCase2Numbers",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    code = {
        r["doc_id"]: r["tokens"]
        for r in tokenize_pandas(df, "text", code_aware=True).collect()
    }
    plain = {
        r["doc_id"]: r["tokens"] for r in tokenize_pandas(df, "text").collect()
    }
    for i, t in enumerate(texts):
        assert code[i] == py_tokenize_code(t), (i, t)
        assert plain[i] == py_tokenize(t), (i, t)
    # identifier splitting actually fires ...
    assert "value" in code[0] and "get" in code[0]
    assert "value" not in plain[0]           # default mode untouched
    assert code[1][:4] == ["def", "parse", "buffer", "buf"]
    # ... and pure-word text is mode-invariant
    assert code[2] == plain[2]


def test_code_aware_on_synthetic_source_corpus(spark):
    # gen_corpus content is snake_case identifiers: every code-mode token
    # stream must be the concatenation of the underscore-split plain tokens.
    from tests.gen_corpus import gen_corpus
    from sparksearch.tokenize import py_tokenize_code, tokenize_pandas

    pdf = gen_corpus(50)
    df = spark.createDataFrame(pdf[["commit", "content"]])
    got = {
        r["commit"]: r["tokens"]
        for r in tokenize_pandas(df, "content", code_aware=True).collect()
    }
    for row in pdf.itertuples():
        expected = py_tokenize_code(row.content)
        assert got[row.commit] == expected
        assert expected == [p for w in row.content.split() for p in w.split("_") if p]
