"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship BM25 top-k query at sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives each a DuckDB-runnable ANSI-SQL twin (views: region
nation customer supplier part orders lineitem events documents embeddings).

Conventions (driver compares row-count + schema + order-insensitive
value-hash): every computed column is aliased identically on both sides;
integer outputs are BIGINT, floating outputs are DOUBLE rounded to 6 decimals
on both sides (guards against summation-order ULP drift).
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksearch import queries_catalog

_REPO = os.path.dirname(os.path.abspath(__file__))


def _reference_queries() -> list[tuple[int, str]]:
    qs = json.loads(open(os.path.join(_REPO, "tests", "queries.json")).read())["queries"]
    return [(q["id"], q["text"]) for q in qs]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full BM25 top-10 over the reference query set at sf0.001."""
    from sparksearch.querying import bm25_topk_from_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return bm25_topk_from_docs(spark, docs, _reference_queries(), k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in queries_catalog.CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql
        for name, spec in queries_catalog.CATALOG.items()
        if spec.sql is not None
    }
