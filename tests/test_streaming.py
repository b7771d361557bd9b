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


def test_stream_index_units_equal_batch_build(spark, docs_sf0001, tmp_path):
    """Continuous indexing end-to-end: in-order document feed → streamed
    unit commits → incremental finalize ≡ a batch build_resumable of the
    same corpus, byte for byte. The frontier unit stays open until the feed
    declares end-of-corpus."""
    from sparksearch.build import load_index
    from sparksearch.checkpoint import (
        build_geometry,
        build_resumable,
        committed_units,
        finalize_incremental,
    )
    from sparksearch.streaming import commit_stream_units, stream_index_units

    N_UNITS = 4
    batch_idx = str(tmp_path / "batch_idx")
    build_resumable(spark, docs_sf0001, batch_idx, n_units=N_UNITS,
                    n_buckets=8, n_ranges=4)

    stream_idx = str(tmp_path / "stream_idx")
    meta = build_geometry(spark, docs_sf0001, stream_idx, N_UNITS, 4, 8, 128)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    pdf = docs_sf0001.toPandas().sort_values("doc_id")
    cut = int(len(pdf) * 0.6)

    # Arrival 1: first 60% — only fully-covered units commit.
    spark.createDataFrame(pdf.iloc[:cut]).coalesce(1).write.parquet(feed, mode="append")
    stream_index_units(spark, feed, stream_idx, ckpt).awaitTermination()
    first = commit_stream_units(spark, stream_idx)
    frontier = int(pdf.iloc[cut - 1]["doc_id"])
    assert all((u + 1) * meta["unit_span"] - 1 <= frontier for u in first)
    if first:
        finalize_incremental(spark, stream_idx)  # partial fold, gen 0

    # Arrival 2: the rest + end-of-corpus declaration.
    spark.createDataFrame(pdf.iloc[cut:]).coalesce(1).write.parquet(feed, mode="append")
    stream_index_units(spark, feed, stream_idx, ckpt).awaitTermination()
    second = commit_stream_units(spark, stream_idx, declare_complete=True)
    assert sorted(first + second) == sorted(committed_units(stream_idx))
    stats = finalize_incremental(spark, stream_idx)
    assert sorted(stats["finalized_units"]) == sorted(first + second)

    cols = ["term", "range_id", "first_doc_id", "last_doc_id", "n",
            "doc_gaps", "tfs", "dls", "max_tf", "min_dl", "bucket"]
    seg_b, dic_b, st_b = load_index(spark, batch_idx)
    seg_s, dic_s, st_s = load_index(spark, stream_idx)
    assert sorted(map(tuple, seg_b.select(cols).collect())) == \
        sorted(map(tuple, seg_s.select(cols).collect()))
    dcols = ["term", "df", "cf", "idf", "max_tf", "min_dl", "bucket"]
    assert sorted(map(tuple, dic_b.select(dcols).collect())) == \
        sorted(map(tuple, dic_s.select(dcols).collect()))
    for key in ("n_docs", "sum_dl", "avgdl", "range_size"):
        assert st_b[key] == st_s[key], key


def test_trending_terms_stream_equals_batch(spark, docs_sf0001, tmp_path):
    """The trending-terms feed run as a REAL file-source stream
    (availableNow → memory sink) must emit exactly the batch plan's
    windowed term counts over the same timestamped corpus. Timestamps
    derive from doc_id (deterministic; 5 distinct hours so several
    windows close)."""
    from sparksearch.streaming import trending_terms_stream

    stamped = docs_sf0001.select(
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id") % 5) * 3600
        ).alias("ts"),
        "text",
    )
    feed = str(tmp_path / "feed")
    stamped.coalesce(2).write.parquet(feed)

    stream = spark.readStream.schema("ts timestamp, text string").parquet(feed)
    q = (
        trending_terms_stream(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("trending_terms_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.term): r.n
        for r in spark.sql("select * from trending_terms_sink").collect()
    }
    want = {
        (r.window_start, r.term): r.n
        for r in trending_terms_stream(stamped).collect()
    }
    # append mode emits exactly the CLOSED windows: end <= max event time
    # minus the watermark (here 0s → the four windows before the last);
    # the final window stays open in state — the streaming contract, not
    # a loss.
    last_start = max(w for w, _ in want)
    closed = {k: v for k, v in want.items() if k[0] < last_start}
    assert got == closed
    assert len({w for w, _ in want}) == 5
    assert len({w for w, _ in got}) == 4, "four windows must have closed"
    # downstream rank (one TakeOrdered per window) is deterministic
    top = sorted(got.items(), key=lambda kv: (kv[0][0], -kv[1], kv[0][1]))
    assert top, "feed must produce counts"


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


def test_stateful_user_totals_equal_batch(spark, tmp_path):
    """applyInPandasWithState custom stateful op: running per-user totals
    accumulated across TWO micro-batches must end exactly at the batch
    groupBy totals (state survives the batch boundary in the state store)."""
    from sparksearch.streaming import EVENTS_STREAM_SCHEMA, stateful_user_totals

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    pdf = events.toPandas().sort_values("event_id")
    cut = len(pdf) // 2
    feed = str(tmp_path / "efeed")
    os.makedirs(feed)
    spark.createDataFrame(pdf.iloc[:cut]).coalesce(1).write.parquet(feed, mode="append")

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = stateful_user_totals(stream)
    # One continuous query; two files → two micro-batches (maxFilesPerTrigger=1),
    # so the state store carries the running totals across the batch boundary.
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(pdf.iloc[cut:]).coalesce(1).write.parquet(feed, mode="append")
    q.processAllAvailable()
    q.stop()

    # counts only grow → the max-n_events emission per user is the final state
    final = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) AS rn
                 FROM stateful_totals) WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert final == batch


def test_events_trend_windows(spark):
    """Pipeline aggs vs a from-scratch pandas reference on synthetic hours."""
    import datetime as dt

    from sparksearch.relational import events_trend

    rows = []
    base = dt.datetime(2024, 1, 1, 0, 30)
    counts = {"a": [3, 1, 4, 1, 5], "b": [2, 7]}
    eid = 0
    for typ, per_hour in counts.items():
        for h, n in enumerate(per_hour):
            for _ in range(n):
                rows.append((eid, base + dt.timedelta(hours=h), typ))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {
        (r["event_type"], r["hour_start"]): (r["n_events"], r["cum_events"], r["delta"], r["ma3"])
        for r in events_trend(df).collect()
    }
    assert len(got) == 7
    for typ, per_hour in counts.items():
        cum = 0
        for h, n in enumerate(per_hour):
            key = (typ, f"2024-01-01 {h:02d}:00:00")
            cum += n
            window = per_hour[max(0, h - 2): h + 1]
            want = (
                n, cum,
                None if h == 0 else n - per_hour[h - 1],
                round(sum(window) / len(window), 6),
            )
            assert got[key] == want, (key, got[key], want)


def test_events_asof_join_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import events_asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        # user 1: view, view, purchase (matches 2nd view), view-after, purchase
        (1, T("2024-01-01 10:00:00"), 1, "view"),
        (2, T("2024-01-01 10:05:00"), 1, "view"),
        (3, T("2024-01-01 10:06:30"), 1, "purchase"),
        (4, T("2024-01-01 11:00:00"), 1, "view"),
        (5, T("2024-01-01 11:30:00"), 1, "purchase"),
        # user 2: purchase with NO prior view → NULL match (left as-of)
        (6, T("2024-01-01 09:00:00"), 2, "purchase"),
        (7, T("2024-01-01 09:30:00"), 2, "view"),
        # other types are ignored entirely
        (8, T("2024-01-01 10:06:00"), 1, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r["purchase_event_id"]: r for r in events_asof_join(df).collect()}
    assert set(got) == {3, 5, 6}
    assert got[3]["view_event_id"] == 2 and got[3]["lag_seconds"] == 90
    assert got[5]["view_event_id"] == 4 and got[5]["lag_seconds"] == 1800
    assert got[6]["view_event_id"] is None and got[6]["lag_seconds"] is None
    assert got[6]["view_ts"] is None


def test_events_asof_join_equal_ts_tiebreak(spark):
    """At equal ts, the (ts, event_id) total order decides: a view with a
    SMALLER event_id than the purchase is at-or-before; a larger one is
    after."""
    import datetime as dt

    from sparksearch.relational import events_asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (10, t0, 7, "view"),
        (11, t0, 7, "purchase"),   # matches view 10 (same ts, lower id)
        (12, t0, 7, "view"),       # after purchase 11 in the total order
        (13, t0, 8, "purchase"),
        (14, t0, 8, "view"),       # only view for user 8 sorts after → NULL
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r["purchase_event_id"]: r for r in events_asof_join(df).collect()}
    assert got[11]["view_event_id"] == 10 and got[11]["lag_seconds"] == 0
    assert got[13]["view_event_id"] is None


def test_events_funnel_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import events_funnel

    T = lambda m: dt.datetime(2024, 1, 1, 10, m, 0)  # noqa: E731
    rows = [
        # user 1 completes the whole funnel in order
        (1, T(0), 1, "signup"), (2, T(1), 1, "view"),
        (3, T(2), 1, "click"), (4, T(3), 1, "purchase"),
        # user 2: view BEFORE signup doesn't count; purchase without a
        # post-signup view doesn't either -> depth 1
        (5, T(0), 2, "view"), (6, T(1), 2, "signup"), (7, T(2), 2, "purchase"),
        # user 3: signup then view -> depth 2
        (8, T(0), 3, "signup"), (9, T(1), 3, "view"),
        # user 4: never signs up -> depth 0 (not in any count)
        (10, T(0), 4, "click"), (11, T(1), 4, "purchase"),
        # ignored type
        (12, T(0), 1, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.step: r for r in events_funnel(df).collect()}
    assert [got[s].n_users for s in (1, 2, 3, 4)] == [3, 2, 1, 1]
    assert got[1].frac_prev is None and got[1].frac_top == 1.0
    assert got[2].frac_prev == round(2 / 3, 6) and got[2].frac_top == round(2 / 3, 6)
    assert got[3].frac_prev == 0.5 and got[4].frac_prev == 1.0
    assert got[4].frac_top == round(1 / 3, 6)
    assert [got[s].step_name for s in (1, 2, 3, 4)] == [
        "signup", "view", "click", "purchase",
    ]


def test_cohort_retention_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import cohort_retention

    # 2024-01-01 is a Monday -> clean week boundaries on the epoch grid.
    W = lambda w, d=0: dt.datetime(2024, 1, 1 + 7 * w + d, 12, 0, 0)  # noqa: E731
    rows = [
        # users 1,2 start week 0; user 1 returns week 1
        (1, W(0), 1, "view"), (2, W(1), 1, "click"),
        (3, W(0, 3), 2, "view"),
        # user 3 starts week 1, returns week 3
        (4, W(1), 3, "signup"), (5, W(3), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = cohort_retention(df).collect()
    w0 = min(r.cohort_week for r in out)
    got = {(r.cohort_week - w0, r.week_offset): r for r in out}
    assert set(got) == {(0, 0), (0, 1), (1, 0), (1, 2)}
    assert got[(0, 0)].n_users == 2 and got[(0, 0)].cohort_size == 2
    assert got[(0, 0)].retention == 1.0
    assert got[(0, 1)].n_users == 1 and got[(0, 1)].retention == 0.5
    assert got[(1, 0)].n_users == 1 and got[(1, 2)].retention == 1.0


def test_user_rfm_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import user_rfm

    D = lambda d: dt.datetime(2024, 1, d, 12, 0, 0)  # noqa: E731
    rows = []
    # five users: user i has last activity on day 30-i (u1 most recent),
    # i events, and value 10*i per event
    eid = 0
    for u in range(1, 6):
        for j in range(u):
            eid += 1
            rows.append((eid, D(30 - u + 1) if j == u - 1 else D(1), u, "view", 10.0 * u))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.user_id: r for r in user_rfm(df).collect()}
    assert len(got) == 5
    # recency: u1 last on day 30 -> 0 days from anchor; u5 on day 26 -> 4
    assert got[1].recency_days == 0 and got[5].recency_days == 4
    # frequency/monetary exact
    for u in range(1, 6):
        assert got[u].frequency == u
        assert got[u].monetary == round(10.0 * u * u, 6)
    # 5 rows, 5 buckets -> each quintile hit exactly once per dimension
    for col in ("r_q", "f_q", "m_q"):
        assert sorted(getattr(got[u], col) for u in range(1, 6)) == [1, 2, 3, 4, 5]
    # best recency = quintile 1; best frequency/monetary (u5) = quintile 1
    assert got[1].r_q == 1 and got[5].f_q == 1 and got[5].m_q == 1


def test_analytics_report_job_deterministic(spark, tmp_path):
    """The spark-submit analytics composition: funnel + cohorts + RFM +
    trend + sessions from ONE events read. Re-running produces identical
    summaries and byte-identical report rows (invariant #1), and the
    summary is internally consistent."""
    import jobs.analytics_report as ar

    sf = "/root/testdata/sf0.001"
    s1 = ar.report(spark, sf, str(tmp_path / "a"))
    s2 = ar.report(spark, sf, str(tmp_path / "b"))
    for k in ("n_events", "n_users", "n_sessions", "funnel",
              "rfm_champions", "week1_retention_by_cohort"):
        assert s1[k] == s2[k], k
    for name in s1["reports"]:
        a = sorted(map(tuple, spark.read.parquet(s1["reports"][name]).collect()))
        b = sorted(map(tuple, spark.read.parquet(s2["reports"][name]).collect()))
        assert a == b, name
    # consistency: sessions cover every event; funnel steps are monotone
    assert s1["n_events"] > 0 and s1["n_sessions"] >= s1["n_users"] > 0
    steps = ["signup", "view", "click", "purchase"]
    counts = [s1["funnel"][s][0] for s in steps]
    assert counts == sorted(counts, reverse=True)


def test_cumulative_cardinality_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import events_cumulative_cardinality

    H = lambda h, m=0: dt.datetime(2024, 1, 1, h, m, 0)  # noqa: E731
    rows = [
        (1, H(0), 1, "view"), (2, H(2), 1, "view"),    # u1 first at hour 0
        (3, H(0, 30), 2, "click"),                      # u2 first at hour 0
        (4, H(2), 3, "view"), (5, H(5), 3, "view"),     # u3 first at hour 2
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.hour_start: r for r in events_cumulative_cardinality(df).collect()}
    # only FIRST-seen hours appear; repeat activity adds nothing
    assert set(got) == {"2024-01-01 00:00:00", "2024-01-01 02:00:00"}
    assert got["2024-01-01 00:00:00"].n_new_users == 2
    assert got["2024-01-01 00:00:00"].cum_users == 2
    assert got["2024-01-01 02:00:00"].n_new_users == 1
    assert got["2024-01-01 02:00:00"].cum_users == 3


def test_serial_diff_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import events_serial_diff

    D = lambda d, h=0: dt.datetime(2024, 1, d, h, 0, 0)  # noqa: E731
    # days 1, 2, 9 active (day 9 = day 2 + 7); days 3-8 empty -> dense grid
    rows = [(1, D(1)), (2, D(1, 5)), (3, D(2)), (4, D(9)), (5, D(9, 23))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r.day: r for r in events_serial_diff(df).collect()}
    assert len(got) == 9  # dense min_doc_count=0 grid: 2024-01-01..09
    assert got["2024-01-03"].n_events == 0  # gap day materialized
    assert got["2024-01-01"].diff7 is None  # first `lag` buckets NULL
    assert got["2024-01-07"].diff7 is None
    assert got["2024-01-08"].diff7 == 0 - 2  # day8(0) - day1(2)
    assert got["2024-01-09"].diff7 == 2 - 1  # day9(2) - day2(1)


def test_latest_by_user_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import events_latest_by_user

    T = lambda h: dt.datetime(2024, 3, 1, h, 0, 0)  # noqa: E731
    rows = [
        (10, T(1), 1, "view", 1.5),
        (11, T(9), 1, "click", 2.5),   # u1 latest
        (12, T(5), 2, "view", 3.0),
        (13, T(5), 2, "purchase", 4.0),  # u2: equal ts -> higher event_id wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.user_id: r for r in events_latest_by_user(df).collect()}
    assert got[1].last_event_id == 11 and got[1].last_event_type == "click"
    assert got[1].last_ts == "2024-03-01 09:00:00"
    assert got[2].last_event_id == 13 and got[2].last_event_type == "purchase"
    assert abs(got[2].last_value - 4.0) < 1e-9


def test_events_rate_hand_case(spark):
    import datetime as dt

    from sparksearch.relational import events_rate

    rows = [
        (1, dt.datetime(2024, 2, 3), "view"),   # Feb 2024: leap, 29 days
        (2, dt.datetime(2024, 2, 28), "view"),
        (3, dt.datetime(2023, 2, 10), "view"),  # Feb 2023: 28 days
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {r.month: r for r in events_rate(df).collect()}
    assert got["2024-02"].days_in_month == 29
    assert got["2023-02"].days_in_month == 28
    assert abs(got["2024-02"].rate_per_day - 2 / 29) < 5e-7
    assert abs(got["2023-02"].rate_per_day - 1 / 28) < 5e-7


def test_geotile_bounds_and_coverage(spark):
    from sparksearch.relational import GEOTILE_ZOOM, events_geotile
    from tests.conftest import SF_SMOKE

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    rows = events_geotile(events).collect()
    n = events.count()
    assert sum(r.n_events for r in rows) == n  # tiles partition the events
    nt = 1 << GEOTILE_ZOOM
    for r in rows:
        z, x, y = map(int, r.tile.split("/"))
        assert z == GEOTILE_ZOOM and 0 <= x < nt and 0 <= y < nt
        assert 1 <= r.n_users <= r.n_events
    # deterministic: a user's position is a pure function of user_id
    again = {r.tile: (r.n_events, r.n_users) for r in events_geotile(events).collect()}
    assert again == {r.tile: (r.n_events, r.n_users) for r in rows}


def test_auto_date_histogram_picks_smallest_fitting_interval(spark):
    import datetime as dt

    from sparksearch.relational import events_auto_date_histogram

    # 30-day span: day buckets (31) exceed target 12 -> week (5-6) chosen
    month = [(i, dt.datetime(2024, 1, 1 + (i * 29) // 10)) for i in range(11)]
    df = spark.createDataFrame(month, "event_id long, ts timestamp")
    rows = events_auto_date_histogram(df).collect()
    assert {r.interval_sec for r in rows} == {604800}
    assert sum(r.n_events for r in rows) == len(month)

    # 10-minute span fits in <= 12 minute buckets -> minute rung
    tight = [(i, dt.datetime(2024, 1, 1, 0, i)) for i in range(10)]
    df2 = spark.createDataFrame(tight, "event_id long, ts timestamp")
    rows2 = events_auto_date_histogram(df2).collect()
    assert {r.interval_sec for r in rows2} == {60}
    assert len(rows2) == 10 and all(r.n_events == 1 for r in rows2)


def _py_pos(user_id):
    import hashlib

    h = lambda p: int(  # noqa: E731
        hashlib.md5(f"{p}|{user_id}".encode()).hexdigest()[:15], 16
    )
    return h("geo-lon") % 360000 - 180000, h("geo-lat") % 170000 - 85000


def test_geo_distance_matches_bruteforce(spark):
    from sparksearch.relational import (
        GEO_DISTANCE_K,
        GEO_ORIGIN,
        events_geo_distance_topk,
    )
    from tests.conftest import SF_SMOKE

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    rows = sorted(events_geo_distance_topk(events).collect(), key=lambda r: r.rank)
    pdf = events.toPandas()
    lon0, lat0 = GEO_ORIGIN
    cand = []
    for eid, uid in zip(pdf.event_id, pdf.user_id):
        lon, lat = _py_pos(uid)
        cand.append(((lon - lon0) ** 2 + (lat - lat0) ** 2, eid, lon, lat))
    want = sorted(cand)[:GEO_DISTANCE_K]
    assert [(r.d2, r.event_id, r.lon_mdeg, r.lat_mdeg) for r in rows] == want


def test_geo_bounds_centroid_matches_bruteforce(spark):
    import math

    from sparksearch.relational import events_geo_bounds_centroid
    from tests.conftest import SF_SMOKE

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    rows = {r.event_type: r for r in events_geo_bounds_centroid(events).collect()}
    pdf = events.toPandas()
    pdf["pos"] = pdf.user_id.map(_py_pos)
    for et, grp in pdf.groupby("event_type"):
        lons = grp.pos.map(lambda p: p[0])
        lats = grp.pos.map(lambda p: p[1])
        r = rows[et]
        assert (r.min_lon, r.max_lon) == (lons.min(), lons.max())
        assert (r.min_lat, r.max_lat) == (lats.min(), lats.max())
        assert math.isclose(r.centroid_lon, lons.sum() / len(grp), abs_tol=5e-7)
        assert math.isclose(r.centroid_lat, lats.sum() / len(grp), abs_tol=5e-7)


def test_moving_percentiles_hand_case(spark):
    import datetime as dt

    import numpy as np

    from sparksearch.relational import MOVING_PCT_WINDOW, events_moving_percentiles

    # 10 days, counts 1..10 except day 4 empty (0 via the dense grid)
    rows = []
    eid = 0
    for d in range(10):
        if d == 3:
            continue
        for _ in range(d + 1):
            eid += 1
            rows.append((eid, dt.datetime(2024, 5, 1 + d, 12)))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = sorted(events_moving_percentiles(df).collect(), key=lambda r: r.day)
    series = [1, 2, 3, 0, 5, 6, 7, 8, 9, 10]
    assert [r.n_events for r in got] == series
    for i, r in enumerate(got):
        wnd = series[max(0, i - (MOVING_PCT_WINDOW - 1)) : i + 1]
        assert r.p50_e1 / 10.0 == np.percentile(wnd, 50, method="linear")
        assert r.p90_e1 / 10.0 == np.percentile(wnd, 90, method="linear")


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once feed (every event delivered twice, across two
    micro-batches) → the deduped stream emits each event_id exactly once,
    and the result equals the batch distinct — the row-level
    exactly-once contract."""
    from sparksearch.streaming import EVENTS_STREAM_SCHEMA, dedup_events_stream

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    pdf = events.toPandas().sort_values("event_id").head(200)
    feed = str(tmp_path / "dfeed")
    os.makedirs(feed)
    # batch 1: first copy; batch 2: the duplicate redelivery of the SAME rows
    spark.createDataFrame(pdf).coalesce(1).write.parquet(feed, mode="append")

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = dedup_events_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(feed, mode="append")
    q.processAllAvailable()
    q.stop()

    got = [r.event_id for r in spark.sql("SELECT event_id FROM dedup_stream").collect()]
    assert sorted(got) == sorted(pdf.event_id.tolist())  # once each, no dups
    # batch twin: the same callable on a batch frame is plain dropDuplicates
    batch = dedup_events_stream(events.unionAll(events))
    assert batch.count() == events.count()


def test_sequence_join_stream_matches_batch_eql(spark, tmp_path):
    """The watermarked stream-stream interval join, fed the fixture events
    over two micro-batches, emits exactly the qualifying (view, click)
    pairs — and reducing them with the batch first-successor pick
    reproduces relational.eql_sequence row for row."""
    import pyspark.sql.functions as F

    from sparksearch.relational import (
        EQL_FIRST,
        EQL_MAXSPAN_S,
        EQL_SECOND,
        eql_sequence,
    )
    from sparksearch.streaming import EVENTS_STREAM_SCHEMA, sequence_join_stream
    from tests.conftest import SF_SMOKE

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    # batch degenerate form == plain interval join
    batch_pairs = sequence_join_stream(
        events.filter(F.col("event_type") == EQL_FIRST),
        events.filter(F.col("event_type") == EQL_SECOND),
        maxspan_s=EQL_MAXSPAN_S,
    )
    first = (
        batch_pairs.groupBy("user_id", "a_event_id")
        .agg(F.min(F.struct("span_s", "b_event_id")).alias("m"))
        .select(
            "user_id", "a_event_id",
            F.col("m.b_event_id").alias("b_event_id"),
            F.col("m.span_s").alias("span_s"),
        )
    )
    want = sorted(tuple(r) for r in eql_sequence(events).collect())
    got = sorted(tuple(r) for r in first.collect())
    assert got == want

    # streaming form: two micro-batches through a memory sink
    src = tmp_path / "seq_src"
    src.mkdir()
    pdf = events.toPandas().sort_values("event_id")
    half = len(pdf) // 2
    pdf.iloc[:half].to_json(src / "b0.json", orient="records", lines=True,
                            date_format="iso")
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = sequence_join_stream(
        stream.filter(F.col("event_type") == EQL_FIRST),
        stream.filter(F.col("event_type") == EQL_SECOND),
        maxspan_s=EQL_MAXSPAN_S,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("seq_join_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        pdf.iloc[half:].to_json(src / "b1.json", orient="records", lines=True,
                                date_format="iso")
        q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, a_event_id, b_event_id, span_s FROM seq_join_test"
        ).collect()
    )
    batch_rows = sorted(tuple(r) for r in batch_pairs.collect())
    assert stream_rows == batch_rows


def test_percolate_stream_matches_batch_percolate(spark, tmp_path):
    """Streaming percolation: the stateless row-local check over two
    micro-batches emits exactly the batch percolator's (query, doc) set —
    and the batch-frame degenerate form equals search_ext.percolate on
    the postings, two algorithms one answer."""
    from sparksearch.search_ext import percolate
    from sparksearch.streaming import DOCS_STREAM_SCHEMA, percolate_stream
    from sparksearch.tokenize import explode_postings, py_tokenize, tokenize_sql

    docs = spark.read.parquet(str(SF_SMOKE / "documents.parquet"))
    stored = [(1, "hash join"), (2, "query scan filter"), (3, "customer")]
    qterms = spark.createDataFrame(
        [(qid, t) for qid, text in stored for t in py_tokenize(text)],
        "query_id long, term string",
    )
    tf_df = term_freq(explode_postings(tokenize_sql(docs)))
    want = sorted(
        (r.query_id, r.doc_id) for r in percolate(qterms, tf_df).collect()
    )
    assert want and len({q for q, _ in want}) >= 2

    # batch degenerate form
    got = sorted(
        (r.query_id, r.doc_id)
        for r in percolate_stream(docs, qterms).collect()
    )
    assert got == want

    # streaming form over two micro-batches, append mode, no state
    src = tmp_path / "perc_src"
    src.mkdir()
    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id")
    half = len(pdf) // 2
    pdf.iloc[:half].to_json(src / "b0.json", orient="records", lines=True)
    pdf.iloc[half:].to_json(src / "b1.json", orient="records", lines=True)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        percolate_stream(stream, qterms)
        .writeStream.format("memory")
        .queryName("perc_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sgot = sorted(
        (r.query_id, r.doc_id)
        for r in spark.sql("SELECT * FROM perc_sink").collect()
    )
    assert sgot == want


def test_counter_rate_stream_equals_batch(spark, tmp_path):
    """Round-5 stateful twin: reset-aware counter rate accumulated across
    two time-ordered micro-batches ends exactly at the batch operator's
    answer (including the HALF_UP round6 rate)."""
    from sparksearch.catalog_s12 import events_counter_rate
    from sparksearch.streaming import EVENTS_STREAM_SCHEMA, counter_rate_stream

    events = spark.read.parquet(str(SF_SMOKE / "events.parquet"))
    pdf = events.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    # time-ordered split: advance the cut until ts strictly increases so no
    # user's in-flight tie straddles the batch boundary
    cut = len(pdf) // 2
    while cut < len(pdf) and pdf.ts.iloc[cut] == pdf.ts.iloc[cut - 1]:
        cut += 1
    feed = str(tmp_path / "crfeed")
    os.makedirs(feed)
    spark.createDataFrame(pdf.iloc[:cut]).coalesce(1).write.parquet(feed, mode="append")

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        counter_rate_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("counter_rate")
        .option("checkpointLocation", str(tmp_path / "crckpt"))
        .start()
    )
    q.processAllAvailable()
    spark.createDataFrame(pdf.iloc[cut:]).coalesce(1).write.parquet(feed, mode="append")
    q.processAllAvailable()
    q.stop()

    final = {
        r.user_id: (r.n_samples, r.n_resets, r.increase_e2, r.rate_per_hour)
        for r in spark.sql(
            """SELECT user_id, n_samples, n_resets, increase_e2, rate_per_hour
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n_samples DESC) AS rn
                     FROM counter_rate) WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n_samples, r.n_resets, r.increase_e2, r.rate_per_hour)
        for r in events_counter_rate(events).collect()
    }
    assert final == batch
