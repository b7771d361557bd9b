"""S5 + R1–R3: resumable index builds with per-unit lineage + metrics
(BASELINE.json:6: "resumable from per-partition … checkpoint snapshots with
lineage and postings/sec metrics emitted per task").

Table-format note (SURVEY.md §7.4.1): on a real cluster these commits are
Iceberg append snapshots (one per unit; snapshot metadata carries the
metrics). This sandbox has no iceberg-spark-runtime jar, so the same
semantics are emulated with the ``parquet-manifest`` layout:

    <index>/postings/unit_id=<u>/*.parquet   committed unit postings
    <index>/manifest/unit_<u>.json           atomic (tmp + os.replace) commit
                                             record: lineage + metrics
    <index>/segments|dictionary|doclens|stats.json   finalized index

Crash model: a unit's parquet write and its manifest rename are ordered; a
crash between them leaves an uncommitted (and overwrite-safe) unit dir, so a
resume redoes at most one unit. Unit membership is hash-derived from doc_id —
deterministic across retries, cluster sizes and resumes (never rand()).
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .build import finalize_index, tokenize_tf


def unit_col(id_col: str, n_units: int):
    """Deterministic build-unit assignment (hash of the stable docID)."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_units)).cast("int")


def manifest_dir(index_path: str) -> str:
    return os.path.join(index_path, "manifest")


def committed_units(index_path: str) -> dict[int, dict]:
    """unit_id → manifest record, from the committed JSON files."""
    d = manifest_dir(index_path)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith("unit_") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["partition_id"])] = rec
    return out


def resume_plan(index_path: str, n_units: int) -> list[int]:
    """R1 (driver form): unit ids not yet committed."""
    done = set(committed_units(index_path))
    return [u for u in range(n_units) if u not in done]


def resume_plan_df(spark: SparkSession, index_path: str, n_units: int) -> DataFrame:
    """R1 (DataFrame form — the left-anti-join operator demo)."""
    units = spark.range(n_units).select(F.col("id").cast("int").alias("partition_id"))
    done = committed_units(index_path)
    man = spark.createDataFrame(
        [(int(u),) for u in done] or spark.sparkContext.emptyRDD(),
        "partition_id int",
    ) if done else spark.createDataFrame([], "partition_id int")
    return units.join(man, "partition_id", "left_anti")


def manifest_df(spark: SparkSession, index_path: str) -> DataFrame:
    """The manifest as a DataFrame (lineage + metrics per unit)."""
    recs = list(committed_units(index_path).values())
    schema = (
        "partition_id int, n_docs long, n_postings long, n_terms long, "
        "build_secs double, postings_per_sec double, docs_per_sec double, "
        "committed_at string"
    )
    rows = [
        (
            int(r["partition_id"]), int(r["n_docs"]), int(r["n_postings"]),
            int(r["n_terms"]), float(r["build_secs"]),
            float(r["postings_per_sec"]), float(r["docs_per_sec"]),
            str(r["committed_at"]),
        )
        for r in recs
    ]
    return spark.createDataFrame(rows, schema)


def _commit_unit(index_path: str, rec: dict) -> None:
    d = manifest_dir(index_path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".unit_{rec['partition_id']}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(d, f"unit_{rec['partition_id']}.json"))  # atomic


def build_unit(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    unit: int,
    n_units: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Stage I for one unit: one-pass tokenize+tf (build.tokenize_tf) →
    commit postings (with the dl column riding along for the finalize).

    Metrics come from an Observation riding the write (no extra pass over the
    data) plus wall-clock around the unit job."""
    t0 = time.monotonic()
    docs_u = docs.filter(unit_col(id_col, n_units) == unit)
    obs_docs = Observation(f"docs_u{unit}")
    observed = docs_u.select(F.col(id_col).alias("doc_id"), text_col).observe(
        obs_docs, F.count(F.lit(1)).alias("n_docs")
    )
    tf = tokenize_tf(observed, text_col)
    obs_tf = Observation(f"tf_u{unit}")
    tf = tf.observe(
        obs_tf,
        F.count(F.lit(1)).alias("n_postings"),
        F.approx_count_distinct("term").alias("n_terms"),
    )
    out = os.path.join(index_path, "postings", f"unit_id={unit}")
    tf.write.mode("overwrite").parquet(out)
    secs = max(time.monotonic() - t0, 1e-9)
    n_docs = int(obs_docs.get["n_docs"])
    n_postings = int(obs_tf.get["n_postings"])
    rec = {
        "partition_id": unit,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "n_terms": int(obs_tf.get["n_terms"]),
        "build_secs": secs,
        "postings_per_sec": n_postings / secs,
        "docs_per_sec": n_docs / secs,
        "committed_at": datetime.now(timezone.utc).isoformat(),
    }
    _commit_unit(index_path, rec)
    return rec


def build_resumable(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    n_units: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_ranges: int | None = None,
    finalize: bool = True,
    fail_after_units: int | None = None,
) -> dict:
    """§3.3 entry point: commit missing units, then finalize the global index.

    ``fail_after_units`` injects a crash after N unit commits (test hook for
    the resume gate). Re-running after any crash is idempotent: committed
    units are skipped (R1), the segment merge is a deterministic function of
    the committed postings (R2 union happens by reading the postings root)."""
    todo = resume_plan(index_path, n_units)
    built = 0
    for u in todo:
        build_unit(spark, docs, index_path, u, n_units, text_col, id_col)
        built += 1
        if fail_after_units is not None and built >= fail_after_units:
            raise RuntimeError(f"injected crash after {built} units")
    if not finalize:
        return {"built_units": built}
    tf_all = spark.read.parquet(os.path.join(index_path, "postings"))
    # lead stays valid globally: every doc lives in exactly one unit, so the
    # one-True-row-per-doc invariant survives the union of unit postings.
    stats = finalize_index(
        spark, tf_all.select("term", "doc_id", "tf", "dl", "lead"), index_path,
        n_buckets=n_buckets, n_ranges=n_ranges,
    )
    stats["built_units"] = built
    stats["n_units"] = n_units
    return stats
