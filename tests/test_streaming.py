"""Structured Streaming: the incremental index path must equal the batch
build after any number of micro-batches; windowed/session aggs must equal
their batch twins on the same data."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sparksearch.stats import term_freq
from sparksearch.streaming import (
    incremental_postings,
    session_event_counts,
    windowed_event_counts,
)
from sparksearch.tokenize import explode_postings, tokenize_sql
from tests.conftest import SF_SMOKE


def test_incremental_postings_equal_batch(spark, docs_sf0001, tmp_path):
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "units")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    # Two arrivals: first 60% of docs, then the rest.
    pdf = docs_sf0001.toPandas().sort_values("doc_id")
    cut = int(len(pdf) * 0.6)
    spark.createDataFrame(pdf.iloc[:cut]).coalesce(1).write.parquet(
        feed, mode="append"
    )
    q = incremental_postings(spark, feed, out, ckpt)
    q.awaitTermination()
    spark.createDataFrame(pdf.iloc[cut:]).coalesce(1).write.parquet(
        feed, mode="append"
    )
    q2 = incremental_postings(spark, feed, out, ckpt)  # resume from checkpoint
    q2.awaitTermination()

    streamed = (
        spark.read.parquet(out)
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").alias("tf"))  # doc never spans batches → sum = passthrough
    )
    batch = term_freq(
        explode_postings(tokenize_sql(docs_sf0001.select("doc_id", "text"), "text"))
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(str(SF_SMOKE / "events.parquet")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_windowed_counts_equal_batch_twin(spark, events):
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }
    expected = {
        (r.hs, r.event_type): (r.n, round(r.sv, 6))
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("hs"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert got == expected


def test_session_windows_match_sessionize_counts(spark, events):
    from sparksearch.relational import sessionize

    stream_sessions = session_event_counts(events).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    batch_sessions = sessionize(events).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    a = {r.user_id: (r.n_sessions, r.n_events) for r in stream_sessions.collect()}
    b = {r.user_id: (r.n_sessions, r.n_events) for r in batch_sessions.collect()}
    assert a == b
