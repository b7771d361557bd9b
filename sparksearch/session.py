"""SparkSession builder with the configs this engine pins (SURVEY.md §4.2).

Design notes for cluster scale (the sandbox runs local[N], a 1000-executor
cluster runs the same code):

* AQE on — runtime coalescing + skew-join splitting for the relational joins;
  the Zipf-skewed ``groupBy(term)`` paths are salted explicitly (build.B1)
  because AQE does not split skewed aggregation keys.
* Arrow on — every Python-side transform crosses the JVM boundary as Arrow
  RecordBatches (BASELINE.json:15 mandates vectorized pandas/Arrow UDFs only).
* shuffle partitions default to ~cores locally; on a real cluster set via
  spark-submit --conf (jobs/ scripts take it as a flag).
* ``table_format``: "iceberg" on real clusters (needs iceberg-spark-runtime on
  the classpath — not present in this sandbox, verified); "parquet-manifest"
  here: parquet dirs + atomic-rename JSON manifests emulate snapshot/lineage
  semantics with the same code shape (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Table-format switch. Only "parquet-manifest" is runnable in this sandbox;
#: "iceberg" documents the production config and is gated behind an import-try
#: style jar check at session build.
PARQUET_MANIFEST = "parquet-manifest"
ICEBERG = "iceberg"


def get_spark(
    app_name: str = "sparksearch",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    table_format: str = PARQUET_MANIFEST,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session with this engine's pinned configs."""
    if master is None:
        master = os.environ.get("SPARKSEARCH_MASTER", "local[8]")
    if shuffle_partitions is None:
        # ~1 partition per core locally; clusters override via spark-submit.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Executors here have tens of GB of memory: dimension tables up to
        # 64 MB (e.g. the doc-length table at bench scale) should broadcast
        # instead of forcing a sort-merge shuffle of the postings fact table.
        # At true cluster scale AQE re-plans joins whose small side exceeds
        # this anyway, and genuinely huge dims (doclens at 10^12 docs) go
        # through the shuffle join as they must.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bigger Arrow batches across the JVM↔Python boundary: the grouped
        # encode/DAAT UDFs do pure NumPy per batch, so fewer, larger batches
        # amortize the per-batch pickle/FFI overhead.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARKSEARCH_DRIVER_MEM", "8g"))
    )
    if table_format == ICEBERG:
        # Production-cluster config (documented, not runnable here — no
        # iceberg-spark-runtime jar in the sandbox; see SURVEY.md §7.4.1):
        builder = (
            builder.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config(
                "spark.sql.catalog.local.warehouse",
                os.environ.get("SPARKSEARCH_WAREHOUSE", "/tmp/sparksearch_warehouse"),
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
