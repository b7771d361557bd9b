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


def stream_index_units(
    spark: SparkSession,
    feed_dir: str,
    index_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """CONTINUOUS INDEXING: document feed → checkpoint units → incremental
    index, tying Structured Streaming to the resumable build machinery.

    Prereq: ``checkpoint.build_geometry`` has pinned the unit/range geometry
    for ``index_path`` (build_meta.json). Each micro-batch runs the same
    one-pass tokenize kernel as the batch build and appends its postings
    bucketed by ``unit_id`` (doc_id // unit_span). Afterwards,
    ``commit_stream_units`` turns fully-arrived units into manifest commits
    and ``checkpoint.finalize_incremental`` folds them into segment
    generations — identical bytes to a batch build of the same corpus
    (tests/test_streaming.py).

    Scale shape: the feed is append-only with non-decreasing doc ids (the
    natural shape when ids are assigned per arriving source partition), so
    a unit is COMPLETE exactly when a doc beyond its span has arrived; the
    frontier unit stays open across finalizes. Idempotent on retry: same
    batch_id ⇒ same deterministic rows, overwrite of the same directory."""
    feed = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )

    from .checkpoint import load_geometry, unit_col

    span = int(load_geometry(index_path)["unit_span"])
    out_root = os.path.join(index_path, "postings")

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        from .build import tokenize_tf

        tf = tokenize_tf(batch_df.select("doc_id", "text"))
        tf.withColumn("unit_id", unit_col("doc_id", span)).write.mode(
            "overwrite"
        ).partitionBy("unit_id").parquet(
            os.path.join(out_root, f"batch_id={batch_id}")
        )

    return (
        feed.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def commit_stream_units(
    spark: SparkSession, index_path: str, declare_complete: bool = False
) -> list[int]:
    """Turn fully-arrived streamed units into manifest commits (S5).

    A unit is complete when a doc beyond its span has arrived (in-order
    append feed); ``declare_complete=True`` marks end-of-corpus and commits
    the frontier unit too. Per-unit doc/posting counts come from one pruned
    aggregation over the streamed postings. Returns the committed unit ids;
    ``checkpoint.finalize_incremental`` then folds exactly these."""
    import time
    from datetime import datetime, timezone

    from .checkpoint import _commit_unit, committed_units, load_geometry

    span = int(load_geometry(index_path)["unit_span"])
    t0 = time.monotonic()
    rows = (
        spark.read.parquet(os.path.join(index_path, "postings"))
        .groupBy("unit_id")
        .agg(
            F.sum(F.when(F.col("lead"), 1).otherwise(0)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_postings"),
            F.approx_count_distinct("term").alias("n_terms"),
            F.max("doc_id").alias("max_id"),
        )
        .collect()
    )
    secs = max(time.monotonic() - t0, 1e-9)
    frontier = max(int(r["max_id"]) for r in rows) if rows else -1
    already = set(committed_units(index_path))
    committed = []
    for r in rows:
        u = int(r["unit_id"])
        if u in already:
            continue
        # doc ids are unique and arrive in increasing order, so once the
        # frontier reaches a unit's last possible id no further doc can
        # land in its span — the unit is complete. The frontier unit stays
        # open until then (or until end-of-corpus is declared).
        if not declare_complete and (u + 1) * span - 1 > frontier:
            continue
        _commit_unit(index_path, {
            "partition_id": u,
            "n_docs": int(r["n_docs"]),
            "n_postings": int(r["n_postings"]),
            "n_terms": int(r["n_terms"]),
            "build_secs": secs,
            "postings_per_sec": int(r["n_postings"]) / secs,
            "docs_per_sec": int(r["n_docs"]) / secs,
            "committed_at": datetime.now(timezone.utc).isoformat(),
        })
        committed.append(u)
    return sorted(committed)


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


def trending_terms_stream(
    docs_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Windowed term counts over a TIMESTAMPED document stream — the
    trending-terms feed: each arriving document explodes through the
    pinned tokenizer INSIDE the watermarked tumbling aggregation, so the
    stream emits (window_start, term, n) rows once a window closes
    (append mode; late documents past the watermark drop from state).

    Top-k per window is deliberately NOT in the stream: a streaming
    aggregation cannot sort (no window functions over unbounded input),
    and production trending pipelines rank over the materialized sink —
    the rank is one TakeOrdered per window downstream. State is bounded
    by (windows in the watermark horizon) × (vocabulary), the same
    envelope the batch term-stats pass holds per window of data.

    Works unchanged on a batch frame (same plan — groupBy over the
    window expression), which is what the stream≡batch test pins."""
    from .tokenize import tokens_col

    src = docs_stream
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.select(F.col(ts_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(F.window(ts_col, window).alias("w"), "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "term", "n")
    )


def dedup_events_stream(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once event dedup: drop re-deliveries of the same
    event_id arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — Spark 3.5+). The state store keeps
    only the keys of one watermark window, so state is BOUNDED regardless
    of stream length — the streaming twin of the batch ``dedup_exact``
    contract (at-least-once ingestion → exactly-once index units is how
    commit_stream_units stays idempotent; this is the same guarantee at
    the row level). Works unchanged on a batch frame, where it degenerates
    to dropDuplicates on the key."""
    if events_stream.isStreaming:
        return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events_stream.dropDuplicates(["event_id"])


def sequence_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    maxspan_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the batch EQL two-step sequence
    (relational.eql_sequence): a watermarked STREAM-STREAM interval join —
    each view event joins the same user's click events that arrive
    strictly after it and within ``maxspan_s`` seconds.

    The time-bound condition on both inputs plus the watermark is what
    makes stream-stream join state FINITE: Spark evicts a buffered view
    row once the click-side watermark passes view.ts + maxspan (no
    qualifying click can arrive anymore), and vice versa — without the
    interval condition the state store would grow without bound, the
    canonical stream-stream-join mistake. Emits the raw qualifying pairs;
    the batch form's min(struct) "first successor" pick needs completed
    windows, so a consumer applies it per micro-batch downstream (or uses
    the batch entry on the lakehouse table — same rows by construction,
    asserted in tests on identical input).

    Works unchanged on batch frames, where it degenerates to the plain
    interval join (the engine's streaming≡batch discipline)."""
    v = views.select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("a_event_id"),
        F.col("ts").alias("a_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("b_event_id"),
        F.col("ts").alias("b_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("a_ts", watermark)
        c = c.withWatermark("b_ts", watermark)
    joined = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (
            F.col("b_ts")
            <= F.col("a_ts") + F.expr(f"INTERVAL {maxspan_s} SECONDS")
        ),
        "inner",
    )
    return joined.select(
        "user_id", "a_event_id", "b_event_id",
        (
            F.col("b_ts").cast("timestamp").cast("long")
            - F.col("a_ts").cast("timestamp").cast("long")
        ).cast("long").alias("span_s"),
    )


def percolate_stream(
    docs_stream: DataFrame, stored_queries: DataFrame
) -> DataFrame:
    """Streaming percolation (the Elasticsearch percolator as an alerting
    stream): every incoming document is checked against the STORED
    conjunctive queries and emits (query_id, doc_id) for each saved
    search it triggers — search_ext.percolate transposed onto a stream.

    STATELESS by construction: the stored queries collapse to per-query
    term arrays (tiny by the feature's definition — broadcast), and a
    document fires a query when array_intersect covers the query's terms
    — the whole check is row-local, so the query runs in append mode with
    ZERO state store and no watermark; at any corpus rate the work per
    document is bounded by |queries|. Works unchanged on a batch frame
    (where it must equal the postings-side percolate — tested)."""
    from .tokenize import tokens_col

    qarr = (
        stored_queries.select("query_id", "term")
        .distinct()
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_set("term")).alias("q_terms"))
    )
    toks = docs_stream.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    return (
        toks.crossJoin(F.broadcast(qarr))
        .filter(
            F.size(F.array_intersect("toks", "q_terms")) == F.size("q_terms")
        )
        .select("query_id", "doc_id")
    )


def counter_rate_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of catalog_s12.events_counter_rate: per-user
    reset-aware counter-rate state via ``applyInPandasWithState``.

    State per user = (counter, n_samples, n_resets, increase_e2, t0, t1)
    — 48 bytes; each micro-batch's rows sort by (ts, event_id) inside the
    Arrow kernel and replay the batch operator's exact recurrence
    (counter += cents, reset to 0 at error events; positive lag deltas
    accumulate, resets forfeit the in-flight increment). Emits the
    UPDATED totals per user per batch (update mode).

    Stream ≡ batch (tests/test_streaming.py) holds when micro-batches
    are time-ordered per user — the at-least-once feed contract the
    other stateful twins pin; the final emission equals
    events_counter_rate on the same rows exactly, including the
    round6 (decimal HALF_UP, never python round()) rate."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import GroupStateTimeout

    def _r6(x: float):
        # the canonical round6 mirror: quantize to the decimal(28,9) grid
        # FIRST, then 6dp HALF_UP — a straight 1e-6 quantize diverges on
        # dp7-13 ...4999 values (stats.round6's documented two-step)
        return float(
            Decimal(repr(x))
            .quantize(Decimal("0.000000001"), ROUND_HALF_UP)
            .quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def update(key, pdfs, state):
        counter, n, resets, inc, t0, t1 = (
            state.get if state.exists else (0, 0, 0, 0, -1, -1)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            epochs = (
                pdf["ts"].to_numpy().astype("datetime64[s]").astype("int64")
            )
            cents = pdf["value"].round(2).mul(100).round().astype("int64")
            for et, cent, ep in zip(pdf["event_type"], cents, epochs):
                prev = counter
                counter = 0 if et == "error" else counter + int(cent)
                if n >= 1:
                    delta = counter - prev
                    if delta < 0:
                        resets += 1
                    elif delta > 0:
                        inc += delta
                t0 = int(ep) if t0 < 0 else min(t0, int(ep))
                t1 = max(t1, int(ep))
                n += 1
        state.update((counter, n, resets, inc, t0, t1))
        rate = (
            _r6(inc / ((t1 - t0) / 3600.0) / 100.0) if t1 > t0 else None
        )
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_samples": pd.Series([n], dtype="int64"),
                "n_resets": pd.Series([resets], dtype="int64"),
                "increase_e2": pd.Series([inc], dtype="int64"),
                "rate_per_hour": pd.Series([rate], dtype="float64"),
            }
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_samples long, n_resets long, "
        "increase_e2 long, rate_per_hour double",
        "counter long, n long, resets long, inc long, t0 long, t1 long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
