"""Structured Streaming: incremental index maintenance + windowed event
aggregation (SURVEY.md §2.8).

The reference is a batch engine; these are the documented streaming
extensions, built so the batch and streaming paths share every transform:

* ``incremental_postings`` — readStream over a document feed directory →
  the SAME tokenize→explode→tf stages as the batch build inside
  ``foreachBatch``, each micro-batch committed as an append-only postings
  unit. After any number of micro-batches, finalize_index over the
  accumulated postings equals the single-shot batch build byte-for-byte
  (proven in tests/test_streaming.py) — the streaming path cannot drift
  from the batch path because it IS the batch path per micro-batch.
* ``windowed_event_counts`` — tumbling event-time windows with a watermark
  (late rows beyond the watermark are dropped by Spark's state store);
  ``session_event_counts`` — session windows (gap-based), the streaming twin
  of relational.sessionize.

Scale notes: foreachBatch writes are per-micro-batch parquet appends keyed by
batch_id — idempotent on retry (same batch_id → same deterministic rows →
overwrite of the same directory), the streaming analog of the resumable
build's per-unit manifest commit. State-store size for the windowed aggs is
bounded by the watermark horizon × key cardinality.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def incremental_postings(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Streaming index maintenance: document feed → per-micro-batch postings
    units under ``out_dir`` (append-only; one subdir per batch_id).

    Returns the StreamingQuery (caller awaits / processAllAvailable). Batch
    semantics per micro-batch: exactly build.build_index stage I."""

    feed = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        from .build import tokenize_tf

        # Same one-pass kernel as the batch build (tf + dl + lead map-side);
        # lead stays globally one-per-doc because a doc lives in exactly one
        # micro-batch. Idempotent on retry: same batch_id ⇒ same rows.
        tf = tokenize_tf(batch_df.select("doc_id", "text"))
        tf.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return (
        feed.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_user_totals(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals that survive across micro-batches in the state store —
    the operator shape Spark's built-in windowed aggs can't express
    (arbitrary user state + per-batch emission).

    Emits one row per user per micro-batch with the UPDATED running state
    (n_events, total_value). Batch equivalence (tests/test_streaming.py):
    after all batches, each user's last emission equals the batch
    groupBy totals exactly — state accumulation is associative and the
    per-batch Arrow kernel is deterministic.

    Scale: state is 16 bytes/user; the state store shuffles each batch's
    rows once on user_id (uniform keys). Use GroupStateTimeout for eviction
    in unbounded-key deployments (not needed for the bounded fixture)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": pd.Series([round(total, 6)], dtype="float64"),
            }
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_events long, total_value double",
        "n long, total double",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts with late-data handling: rows later than the
    watermark are dropped from state. Works on a streaming OR batch frame
    (same plan — the batch twin is catalog entry ``events_hourly``)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def session_event_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) per user — streaming twin of
    relational.sessionize."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events",
        )
    )
