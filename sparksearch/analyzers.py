"""Opt-in analyzer stages beyond the pinned tokenizer: the Harman
"S-stemmer" (Donna Harman, *How Effective Is Suffixing?*, JASIS 1991) —
the three-rule plural conflation classic IR engines run between
tokenization and indexing.

Why the S-stemmer and not Porter: the engine's correctness contract is an
EXACT DuckDB twin for every operator, and the S-stemmer's three suffix
rules are expressible as one shared SQL ``CASE`` both engines evaluate
verbatim — the stem map is identical by construction, not by a re-derived
second implementation. (A Porter port would need a per-token Python UDF
on the Spark side and be inexpressible in the oracle.)

Pinned rules, applied in order, first match wins (our exact variant —
length guards keep 3-letter tokens untouched):

    1. len > 3 and ends ``ies`` but not ``eies``/``aies`` → ``ies`` → ``y``
    2. len > 3 and ends ``es``  but not ``aes``/``ees``/``oes`` → drop ``s``
    3. len > 2 and ends ``s``   but not ``us``/``ss``           → drop ``s``

The stemmer is a PURE TERM MAP, so stemmed postings derive from the
already-aggregated (term, doc, tf) table — ``tf`` re-grouped under the
stemmed key — with no second pass over the corpus text. Document length
(dl) is conflation-invariant (stemming never changes the token count), so
BM25's length normalization is untouched; only tf/df/idf move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The shared stem expression. `{t}` is the term column/SQL-expression name;
#: the string is valid verbatim in BOTH Spark SQL and DuckDB (LIKE, substr,
#: length, || concatenation are common dialect).
STEM_CASE_SQL = (
    "CASE "
    "WHEN length({t}) > 3 AND {t} LIKE '%ies' "
    "AND {t} NOT LIKE '%eies' AND {t} NOT LIKE '%aies' "
    "THEN substr({t}, 1, length({t}) - 3) || 'y' "
    "WHEN length({t}) > 3 AND {t} LIKE '%es' "
    "AND {t} NOT LIKE '%aes' AND {t} NOT LIKE '%ees' AND {t} NOT LIKE '%oes' "
    "THEN substr({t}, 1, length({t}) - 1) "
    "WHEN length({t}) > 2 AND {t} LIKE '%s' "
    "AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss' "
    "THEN substr({t}, 1, length({t}) - 1) "
    "ELSE {t} END"
)


def stem_col(term_col: str = "term") -> Column:
    """The S-stem of ``term_col`` as a Spark Column (JVM-side, codegen)."""
    return F.expr(STEM_CASE_SQL.format(t=term_col))


def py_stem(t: str) -> str:
    """Python twin of :data:`STEM_CASE_SQL` — used to stem query text
    driver-side (queries are tiny) and by the property tests that pin the
    three implementations together."""
    if len(t) > 3 and t.endswith("ies") and not t.endswith(("eies", "aies")):
        return t[:-3] + "y"
    if len(t) > 3 and t.endswith("es") and not t.endswith(("aes", "ees", "oes")):
        return t[:-1]
    if len(t) > 2 and t.endswith("s") and not t.endswith(("us", "ss")):
        return t[:-1]
    return t


def stem_postings(tf_df: DataFrame) -> DataFrame:
    """Re-key the (term, doc_id, tf[, dl]) table under stemmed terms →
    same shape, tf summed within each (stem, doc).

    Plan: one projection + one partial+final hash aggregation over keys
    that are a superset-coarsening of the input's — NO tokenize pass, no
    corpus scan. At 100 TB this is the cheap path: the stemmed index
    derives from the unstemmed postings (already a ~100× reduction of the
    corpus), and conflation only ever SHRINKS the key space."""
    aggs = [F.sum("tf").alias("tf")]
    if "dl" in tf_df.columns:
        # dl is per-doc constant — max() is exact and keeps the
        # dl-on-postings shape score_logical's no-join fast path needs.
        aggs.append(F.max("dl").alias("dl"))
    return (
        tf_df.withColumn("term", stem_col("term"))
        .groupBy("term", "doc_id")
        .agg(*aggs)
    )


def stem_qterms(qterms: DataFrame) -> DataFrame:
    """Stem the (tiny) per-query term table and re-aggregate qtf — two query
    tokens that conflate to one stem become qtf=2, the same query-term-
    frequency semantics the unstemmed parser applies to repeated tokens."""
    return (
        qterms.withColumn("term", stem_col("term"))
        .groupBy("query_id", "term")
        .agg(F.sum("qtf").alias("qtf"))
    )
