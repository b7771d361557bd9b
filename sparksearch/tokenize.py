"""T1–T3: tokenization, posting explode, projection/filter (SURVEY.md §2.2).

Canonical tokenizer (pinned in ONE place — the NumPy oracle, the DuckDB oracle
SQL and both Spark paths all implement exactly this):

    terms(text) = all maximal runs of [a-z0-9_] in lower(text)

Two interchangeable implementations, tested equal (tests/test_tokenize.py):

* ``tokenize_sql``   — pure Catalyst expressions (JVM, whole-stage codegen).
  This is the default hot path: no Python boundary at all.
* ``tokenize_pandas`` — the mandated vectorized Arrow/pandas UDF path
  (BASELINE.json:15), kept as the demonstration of the UDF discipline and as
  the extension point for code-aware tokenization (identifier splitting).

Plain per-row ``F.udf`` is banned in this repo — tests/test_plans.py
(test_no_per_row_python_udf_anywhere) asserts no BatchEvalPython node ever
appears in a plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_RE = r"[a-z0-9_]+"
_SPLIT_RE = r"[^a-z0-9_]+"


def tokens_col(text: Column | str) -> Column:
    """Array-of-terms column, pure Catalyst (split on complement + drop '')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), _SPLIT_RE), lambda x: x != F.lit(""))


def tokenize_sql(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    """T1a: add ``out`` = array<string> of terms via built-in expressions."""
    return df.withColumn(out, tokens_col(text_col))


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokenize_udf(texts: pd.Series) -> pd.Series:
    # Vectorized: one Arrow batch in, pandas str-kernels, one batch out.
    return texts.str.lower().str.findall(TOKEN_RE)


#: camelCase boundary: lower/digit followed by upper (getValue → get Value).
_CAMEL_RE = r"(?<=[a-z0-9])(?=[A-Z])"


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokenize_code_udf(texts: pd.Series) -> pd.Series:
    # Code-aware mode (SURVEY.md §2.2 T1 extension point): split identifiers
    # at camelCase boundaries and underscores BEFORE the standard lowercase
    # token regex, so getValue / get_value / GET_VALUE all yield [get, value].
    # Same vectorized Arrow shape as the plain tokenizer.
    split = texts.str.replace(_CAMEL_RE, " ", regex=True).str.replace("_", " ")
    return split.str.lower().str.findall(TOKEN_RE)


def tokenize_pandas(
    df: DataFrame, text_col: str = "text", out: str = "tokens",
    code_aware: bool = False,
) -> DataFrame:
    """T1b: same semantics as T1a through the Arrow/pandas-UDF boundary.

    ``code_aware=True`` (OPT-IN — default off so every golden test and the
    pinned-tokenizer invariant stay untouched) additionally splits
    snake_case / camelCase identifiers; for source-code corpora this makes
    `getValue` findable by the query `value`."""
    udf = _tokenize_code_udf if code_aware else _tokenize_udf
    return df.withColumn(out, udf(F.col(text_col)))


def tokenize(df: DataFrame, text_col: str = "text", out: str = "tokens",
             impl: str | None = None) -> DataFrame:
    """The build hot path. Default = the Arrow/pandas tokenizer: measured 5×
    faster end-to-end than the Catalyst split on this corpus (1.4s vs 7.2s
    for tokenize→explode→tf at sf0.1×20, local[16] — Spark 4.1's Generate
    over split-produced arrays is the bottleneck, and it does not improve
    with cores), and it is the spec-mandated discipline (BASELINE.json:15
    "vectorized pandas/Arrow UDFs throughout"). ``tokenize_sql`` remains the
    optimizer-visible twin used by oracles and equality tests.

    Override with impl="sql" or env SPARKSEARCH_TOKENIZER=sql."""
    import os

    impl = impl or os.environ.get("SPARKSEARCH_TOKENIZER", "arrow")
    fn = tokenize_pandas if impl == "arrow" else tokenize_sql
    return fn(df, text_col, out)


def explode_postings(df: DataFrame, id_col: str = "doc_id", tokens: str = "tokens") -> DataFrame:
    """T2: one output row per (token occurrence, doc): DF[doc_id, term]."""
    return df.select(F.col(id_col), F.explode(F.col(tokens)).alias("term"))


def py_tokenize(text: str) -> list[str]:
    """Driver-side tokenizer for query strings (Q1) — same definition."""
    import re

    return re.findall(TOKEN_RE, text.lower())


def py_tokenize_code(text: str) -> list[str]:
    """Driver-side twin of the code-aware mode (identifier splitting)."""
    import re

    split = re.sub(_CAMEL_RE, " ", text).replace("_", " ")
    return re.findall(TOKEN_RE, split.lower())
