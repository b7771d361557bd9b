"""S2 + S3: deterministic document identity and the content-integrity
invariant (SURVEY.md §2.1; BASELINE.json:15).

``monotonically_increasing_id()`` is banned engine-wide: it changes across
retries, partition counts and resumes, which breaks rank-identity and the
resume guarantees (SURVEY.md §4.2 determinism table). Two sanctioned paths:

* test/fixture scale — dense ``row_number()`` over the natural key
  (repo, path, commit): stable, but a global sort (fine below ~10^8 rows);
* cluster scale — ``xxhash64(repo, path, commit)``: shuffle-free, stable by
  construction; collisions audited explicitly (10^12 rows in a 64-bit space
  ⇒ expected ~27k collisions — the audit catches them and the dense path or
  a (hash, row_number-within-hash) disambiguation handles hot spots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NATURAL_KEY = ("repo", "path", "commit")


def assign_doc_ids_dense(df: DataFrame, key=NATURAL_KEY) -> DataFrame:
    """S2 (test scale): dense 0-based docIDs ordered by the natural key."""
    w = Window.orderBy(*[F.col(c) for c in key])
    return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)


def assign_doc_ids_hashed(df: DataFrame, key=NATURAL_KEY) -> DataFrame:
    """S2 (cluster scale): shuffle-free 64-bit hash IDs; pair with
    ``audit_id_collisions`` before trusting the assignment."""
    return df.withColumn("doc_id", F.xxhash64(*[F.col(c) for c in key]))


def audit_id_collisions(df: DataFrame, key=NATURAL_KEY) -> DataFrame:
    """DF of doc_ids claimed by more than one distinct natural key (must be
    empty before an index build may proceed)."""
    return (
        df.groupBy("doc_id")
        .agg(F.countDistinct(F.concat_ws("", *key)).alias("n_keys"))
        .filter(F.col("n_keys") > 1)
    )


def content_sha256(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S3: attach the row-wise integrity hash."""
    return df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))


def sha256_mismatches(
    df: DataFrame, ref: DataFrame, id_col: str = "doc_id",
    content_col: str = "content", ref_hash_col: str = "sha256",
) -> DataFrame:
    """S3 invariant: rows whose sha256(content) differs from the reference
    hash (inner join on the stable id; must be empty — BASELINE.json:6)."""
    lhs = df.select(F.col(id_col), F.sha2(F.col(content_col), 256).alias("h"))
    rhs = ref.select(F.col(id_col), F.col(ref_hash_col).alias("ref_h"))
    return lhs.join(rhs, id_col).filter(F.col("h") != F.col("ref_h"))
