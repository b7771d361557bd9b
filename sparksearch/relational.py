"""Relational coverage operators over the events/orders fixtures
(SURVEY.md §2.7 scalar-function surface + §2.8 batch twins of the streaming
windows): date bucketing, JSON extraction, tumbling windows, sessionization.

These are the date / JSON / map / window function families the engine uses,
each as a driver-oracle-checked query. All pure Catalyst — partial+final
aggregation, window functions, no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-hour rollup per event type → DF[hour_start, event_type,
    n_events, sum_value]. The batch twin of the streaming windowed count
    (streaming.windowed_event_counts uses F.window over the same column)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def events_json_props(events: DataFrame) -> DataFrame:
    """JSON prop extraction → DF[event_type, k_bucket, n]: parse props with
    from_json into a typed map, bucket the numeric payload. Exercises the
    map/JSON function family (from_json + element_at)."""
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "map<string,long>").alias("m"),
    )
    return (
        parsed.select(
            "event_type",
            # floor, not truncate-toward-zero — and the DuckDB twin must use
            # floor(k/10.0) too: DuckDB's `//` TRUNCATES (-4 // 7 = 0,
            # measured), so the two disagree on negative k otherwise.
            F.floor(F.element_at(F.col("m"), "k") / F.lit(10)).cast("long").alias("k_bucket"),
        )
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def orders_monthly(orders: DataFrame) -> DataFrame:
    """Monthly order rollup → DF[o_year, o_month, n_orders, total_price]."""
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("total_price"),
        )
    )


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization → DF[user_id, session_id, n_events,
    duration_sec]. A session breaks when a user is idle > gap_min minutes.

    Classic lag + conditional cumsum over a per-user window — shuffles once
    on user_id (hash-partitioned, no skew: user activity is bounded); the
    streaming twin is session_window in streaming.py."""
    # ts is TIMESTAMP_NTZ in the fixtures — route to epoch seconds through a
    # session-TZ cast (session is pinned UTC, so this equals DuckDB's naive
    # epoch(ts) exactly).
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id", "event_id", "ts", epoch.alias("ep"),
        F.when(
            epoch - F.lag(epoch).over(w) > gap_min * 60,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "session_id", F.sum("is_new").over(w).cast("long")
    )
    return sess.groupBy(
        F.col("user_id").cast("long").alias("user_id"), "session_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("ep") - F.min("ep")).cast("long").alias("duration_sec"),
    )


def delta_encode_demo(events: DataFrame) -> DataFrame:
    """Array higher-order-function coverage: per-user ordered event-id list →
    delta-encoded gaps via zip_with on a shifted copy (the pure-SQL cousin of
    codec.encode_sublist). DF[user_id, n_ids, sum_gaps, max_gap]."""
    per_user = events.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.sort_array(F.collect_list(F.col("event_id").cast("long"))).alias("ids")
    )
    gaps = F.zip_with(
        F.slice(F.col("ids"), 2, F.greatest(F.size("ids") - 1, F.lit(0))),
        F.slice(F.col("ids"), 1, F.greatest(F.size("ids") - 1, F.lit(0))),
        lambda a, b: a - b,
    )
    return per_user.select(
        "user_id",
        F.size("ids").cast("long").alias("n_ids"),
        F.coalesce(
            F.aggregate(gaps, F.lit(0).cast("long"), lambda acc, x: acc + x), F.lit(0)
        ).cast("long").alias("sum_gaps"),
        F.coalesce(F.array_max(gaps), F.lit(0)).cast("long").alias("max_gap"),
    )


def events_trend(events: DataFrame) -> DataFrame:
    """ES pipeline-aggregation family over the hourly series → DF[
    hour_start, event_type, n_events, cum_events, delta, ma3]:
    cumulative_sum, derivative (serial_diff lag-1) and moving_fn avg
    (trailing 3-hour window) per event type — the dashboard trio layered on
    the tumbling-hour rollup.

    Determinism: windows are keyed (event_type) and ordered by the unique
    hour_start; cum/delta are exact integer arithmetic; ma3 is one double
    division of two exact window ints, rounded via the engine-wide round6.
    First-hour delta is NULL on both engines (no previous bucket — ES
    emits no derivative there either). Scale: one partial-aggregated
    rollup shuffle + per-type windows over narrow (ts-bucket, long) rows;
    no global sort."""
    from .stats import round6

    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("h")
    wm = w.rowsBetween(-2, 0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return hourly.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        F.sum("n_events").over(wc).cast("long").alias("cum_events"),
        (F.col("n_events") - F.lag("n_events", 1).over(w))
        .cast("long")
        .alias("delta"),
        round6(
            F.sum("n_events").over(wm).cast("double")
            / F.count(F.lit(1)).over(wm).cast("double")
        ).alias("ma3"),
    )


ASOF_LEFT = "purchase"   # each left event matches ...
ASOF_RIGHT = "view"      # ... the most recent right event at-or-before it


def events_asof_join(events: DataFrame) -> DataFrame:
    """As-of join (the attribution query): for every ``purchase`` event,
    the most recent ``view`` by the same user at-or-before it in the total
    order (ts, event_id) → DF[purchase_event_id, user_id, ts,
    view_event_id, view_ts, lag_seconds] (NULLs when no prior view — kept,
    as a LEFT as-of join).

    Spark-first shape — the UNION-MERGE formulation, not a join: both
    sides union into one frame, one per-user window pass carries the last
    view's attributes forward with last(ignorenulls) over rows ≤ current.
    That is a single shuffle on user_id and a linear merge per user — the
    classic sort-merge as-of plan; an actual range/inequality join would
    be quadratic per user. At 100 TB the window is per-user-key sequential
    (that IS the semantics); monster keys are bounded by sessionize-style
    time-bucketing if ever needed. Determinism: (ts, event_id) is a total
    order; epoch math goes through the TIMESTAMP_NTZ→timestamp→long cast
    chain (session TZ pinned UTC — CLAUDE.md sharp edge)."""
    t = events.filter(
        F.col("event_type").isin(ASOF_LEFT, ASOF_RIGHT)
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_r = F.col("event_type") == ASOF_RIGHT
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    m = t.select(
        "user_id", "ts", "event_id", "event_type",
        F.last(F.when(is_r, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("view_event_id"),
        F.last(F.when(is_r, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("view_ts"),
    )
    return m.filter(F.col("event_type") == ASOF_LEFT).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "view_event_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        (epoch("ts") - epoch("view_ts")).cast("long").alias("lag_seconds"),
    )


#: ordered funnel steps (the conversion sequence the fixture's event types
#: naturally form); FUNNEL_STEPS[k] must complete before [k+1] counts.
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def events_funnel(events: DataFrame, steps=FUNNEL_STEPS) -> DataFrame:
    """Ordered funnel analysis → DF[step, step_name, n_users, frac_top,
    frac_prev]: per user, the deepest prefix of ``steps`` completable by
    events in the (ts, event_id) total order (each step strictly after the
    previous step's matched event); then per-step user counts and
    conversion fractions (frac_prev is NULL on step 1).

    Greedy = optimal here: advancing on the EARLIEST event matching the
    next step never forecloses later steps (any later match leaves a
    subset of remaining events), so one per-user fold over the sorted
    event list computes the same depth as the nested earliest-completion
    chain the oracle builds with k min-joins.

    Spark-first shape: one user_id shuffle (collect_list + sort_array),
    one F.aggregate fold per user — no self-joins, no window cascade; the
    final per-step counts are a single global aggregate of 1 row/user.
    At 100 TB the per-user event list is the unit of memory — bounded by
    per-key activity, the same contract as sessionize; a time-bucketed
    pre-filter caps monster keys if ever needed. Determinism: struct sort
    on (ts, event_id) is total; all outputs are exact ints + round6
    fractions."""
    from .stats import round6

    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )[F.col("event_type")]
    t = events.filter(F.col("event_type").isin(*steps)).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
        step_idx.alias("step_idx"),
    )
    reached = (
        t.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "step_idx"))
            ).alias("evs")
        )
        .select(
            F.aggregate(
                "evs",
                F.lit(0),
                lambda acc, e: F.when(
                    e["step_idx"] == acc, acc + F.lit(1)
                ).otherwise(acc),
            ).alias("reached")
        )
    )
    n = len(steps)
    counts = reached.agg(
        *[
            F.sum((F.col("reached") >= i + 1).cast("long")).alias(f"n{i + 1}")
            for i in range(n)
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("step"),
                        F.lit(steps[i]).alias("step_name"),
                        F.coalesce(F.col(f"n{i + 1}"), F.lit(0))
                        .cast("long")
                        .alias("n_users"),
                        F.coalesce(
                            F.col(f"n{i}") if i else F.col("n1"), F.lit(0)
                        )
                        .cast("long")
                        .alias("n_prev"),
                        # n1 rides every struct — no self-join back for the
                        # top-of-funnel denominator (a joined-back 1-row
                        # frame would re-execute the whole upstream agg).
                        F.coalesce(F.col("n1"), F.lit(0))
                        .cast("long")
                        .alias("n_top"),
                    )
                    for i in range(n)
                ]
            )
        ).alias("r")
    ).select("r.*")
    top = F.col("n_users").cast("double")
    return rows.select(
        "step",
        "step_name",
        "n_users",
        F.when(
            F.col("n_top") > 0,
            round6(top / F.col("n_top").cast("double")),
        ).alias("frac_top"),
        F.when(
            F.col("step") == 1, F.lit(None).cast("double")
        ).otherwise(
            F.when(
                F.col("n_prev") > 0,
                round6(top / F.col("n_prev").cast("double")),
            )
        ).alias("frac_prev"),
    )


#: Monday 1970-01-05 anchors the week grid — identical integer floor-div
#: weeks on both engines (date_trunc('week') semantics differ subtly).
WEEK_EPOCH = "1970-01-05"


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention → DF[cohort_week, week_offset, n_users,
    cohort_size, retention]: cohort = a user's first-ever active week
    (integer weeks since the Monday epoch anchor), offset = active week −
    cohort week, n_users = distinct users of that cohort active at that
    offset, retention = n_users / cohort_size (round6). Offset 0 rows
    equal the cohort size by construction.

    Plan: ONE user_id-keyed stage (first-week agg + join back are
    co-partitioned; the (user, offset) distinct rides the same key), then
    one (cohort, offset) count agg — everything map-side combinable; no
    windows, no skew (cohort keys are calendar weeks). Week index is pure
    integer math — exact on both engines (date_trunc('week') is NOT: ISO
    vs locale weeks)."""
    from .stats import round6

    t = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(
            F.datediff(F.to_date("ts"), F.to_date(F.lit(WEEK_EPOCH))) / 7
        )
        .cast("long")
        .alias("week_idx"),
    )
    first = t.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    active = (
        t.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            "cohort_size",
            round6(
                F.col("n_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


RFM_BUCKETS = 5


def user_rfm(events: DataFrame, n_buckets: int = RFM_BUCKETS) -> DataFrame:
    """RFM segmentation → DF[user_id, recency_days, frequency, monetary,
    r_q, f_q, m_q]: per-user Recency (days from last activity to the
    corpus's last day), Frequency (event count), Monetary (Σ value,
    round9-quantized exact sum), each NTILE'd into quintiles on the
    engine total order (metric, user_id) — quintile 1 = best (most
    recent / most frequent / highest spend).

    Scale: one user_id aggregate; the three quintile windows are the
    deterministic small-scale oracle of the production variant (broadcast
    sample-quantile thresholds — the xent_buckets precedent). Monetary
    follows the DSIR float discipline: per-row round9 → decimal sum →
    one double division-free round6."""
    from .stats import round6

    per = events.groupBy(
        F.col("user_id").cast("long").alias("user_id")
    ).agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(
            F.round(F.col("value"), 9).cast("decimal(28,9)")
        ).alias("msum"),
    )
    anchor = events.agg(F.max("ts").alias("anchor_ts"))
    base = per.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.to_date("anchor_ts"), F.to_date("last_ts"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        round6(F.col("msum").cast("double")).alias("monetary"),
    )
    wr = Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
    wf = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    wm = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    return base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_buckets).over(wr).cast("long").alias("r_q"),
        F.ntile(n_buckets).over(wf).cast("long").alias("f_q"),
        F.ntile(n_buckets).over(wm).cast("long").alias("m_q"),
    )


def events_cumulative_cardinality(events: DataFrame) -> DataFrame:
    """ES cumulative_cardinality pipeline agg → DF[hour_start, n_new_users,
    cum_users]: running distinct-user count over the hourly series — the
    cumulative-uniques/DAU curve. Exact at any scale WITHOUT a running
    distinct: a user contributes to the cumulative count exactly at their
    FIRST hour, so cum_users(h) = Σ_{h' ≤ h} first_seen(h') — one user_id
    min-aggregate (map-side combinable), one hour count, one narrow window
    cumsum over the hours-sized frame. (ES computes this with merged HLL
    sketches; the exact first-occurrence rewrite is the engine's
    deterministic equivalent and needs no sketch.)"""
    first = events.groupBy(
        F.col("user_id").cast("long").alias("user_id")
    ).agg(F.min(F.date_trunc("hour", F.col("ts"))).alias("h"))
    hourly = first.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n_new_users")
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "n_new_users",
        F.sum("n_new_users").over(w).cast("long").alias("cum_users"),
    )


SERIAL_DIFF_LAG = 7


def dense_daily_counts(events: DataFrame, aggs: "dict[str, object] | None" = None,
                       keep: tuple = ()) -> DataFrame:
    """DF[day_i, <agg cols>] over the DENSE min_doc_count=0 epoch-day grid —
    the shared scaffold of every daily pipeline agg (serial_diff,
    moving_percentiles, normalize, bucket_correlation, change_point): ES
    date_histogram emits empty buckets, so missing days are explicit zero
    rows. Integer epoch-day discipline (floor(epoch/86400) — date_trunc is
    NOT engine-identical, the cohort_retention precedent). The grid explode
    and left join run on the days-sized frame; events are touched once by
    the group-by. ``aggs``: name → aggregate Column (default: n_events
    count); ``keep``: extra input columns the aggregates read. Missing-day
    fills are 0 (every agg here is a count)."""
    day = (
        F.floor(F.col("ts").cast("timestamp").cast("long") / F.lit(86400))
        .cast("long")
        .alias("day_i")
    )
    if aggs is None:
        aggs = {"n_events": F.count(F.lit(1)).cast("long")}
    counts = events.select(day, *keep).groupBy("day_i").agg(
        *[v.alias(k) for k, v in aggs.items()]
    )
    grid = (
        counts.agg(F.min("day_i").alias("lo"), F.max("day_i").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day_i"))
    )
    return grid.join(counts, "day_i", "left").select(
        "day_i",
        *[F.coalesce(k, F.lit(0).cast("long")).alias(k) for k in aggs],
    )



def events_serial_diff(events: DataFrame, lag: int = SERIAL_DIFF_LAG) -> DataFrame:
    """ES serial_diff pipeline agg (lag=7: week-over-week seasonality
    removal) → DF[day, n_events, diff7]: daily event counts on a DENSE day
    grid (ES date_histogram emits min_doc_count=0 buckets — missing days
    count 0, exactly like the histogram the pipeline agg runs over), then
    n(d) − n(d−lag) with NULL for the first `lag` buckets. Day bucketing is
    the integer epoch-day discipline (cohort_retention precedent:
    date_trunc is NOT engine-identical; floor(epoch/86400) is). The grid
    explode + lag window run on the days-sized frame, never the events."""
    full = dense_daily_counts(events)
    w = Window.orderBy("day_i")
    return full.select(
        F.date_format(
            F.date_add(F.to_date(F.lit("1970-01-01")), F.col("day_i").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "n_events",
        (F.col("n_events") - F.lag("n_events", lag).over(w)).cast("long").alias(
            "diff7"
        ),
    )


def events_latest_by_user(events: DataFrame) -> DataFrame:
    """ES 'latest' transform (continuous latest-doc-per-entity
    materialization) → DF[user_id, last_ts, last_event_id, last_event_type,
    last_value]: the most recent event per user, ties (impossible — event_id
    is unique at equal ts) broken by highest event_id. ONE map-side-
    combinable max(struct) aggregate — sort keys (ts, event_id) lead the
    struct so lexicographic max IS the latest row; no window, no per-user
    sort, so a monster user costs the same as any other. Oracle is the
    row_number form — two algorithms, one answer. last_value ships round6
    (raw-double passthrough quantized on both sides, invariant #5)."""
    s = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("et"),
        F.col("value").alias("v"),
    )
    g = events.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max(s).alias("t")
    )
    from .stats import round6

    return g.select(
        "user_id",
        F.date_format("t.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("t.eid").cast("long").alias("last_event_id"),
        F.col("t.et").alias("last_event_type"),
        round6(F.col("t.v")).alias("last_value"),
    )


def events_rate(events: DataFrame) -> DataFrame:
    """ES rate aggregation (unit=day inside a monthly date_histogram) →
    DF[month, event_type, n_events, days_in_month, rate_per_day]: per-type
    monthly event counts normalized to events/day. Calendar length comes
    from integer date math (datediff of consecutive month starts — exact
    and identical cross-engine, unlike day-of-last-day juggling); the rate
    is ONE double division of exact integers, round6 on both sides. One
    map-side-combinable aggregate, zero joins."""
    ms = F.date_trunc("month", F.col("ts")).cast("date")
    g = events.groupBy(
        F.date_format(ms, "yyyy-MM").alias("month"),
        F.datediff(F.add_months(ms, 1), ms).cast("long").alias("days_in_month"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    from .stats import round6

    return g.select(
        "month", "event_type", "n_events", "days_in_month",
        round6(
            F.col("n_events").cast("double") / F.col("days_in_month").cast("double")
        ).alias("rate_per_day"),
    )


RATE_SQL = """WITH g AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
         CAST(date_diff('day', CAST(date_trunc('month', ts) AS DATE),
              CAST(date_trunc('month', ts) AS DATE) + INTERVAL 1 MONTH) AS BIGINT)
           AS days_in_month,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
)
SELECT month, event_type, CAST(n_events AS BIGINT) AS n_events, days_in_month,
       CAST(ROUND(CAST(CAST(n_events AS DOUBLE) / CAST(days_in_month AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS rate_per_day
FROM g"""


GEOTILE_ZOOM = 6

#: DuckDB twin of _geo_pos (kept next to it; the geo entries' oracles embed it)
GEO_POS_SQL = """pos AS (
  SELECT event_id, user_id, event_type,
         ('0x' || substring(md5('geo-lon|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 360000 - 180000 AS lon_mdeg,
         ('0x' || substring(md5('geo-lat|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 170000 - 85000 AS lat_mdeg
  FROM events
)"""


def _geo_pos(events: DataFrame) -> DataFrame:
    """Deterministic synthetic position per event (the fixture has no geo
    column): integer MILLI-degrees derived from h60 of the user id —
    lon ∈ [−180000, 180000), lat ∈ [−85000, 85000) (the geotile clamp
    band). Pure BIGINT on both engines (h60 is non-negative, so DuckDB %
    equals Spark pmod). Shared by the geotile / geo_distance / geo_bounds
    entries so every geo operator sees the same world."""
    from .textpipe import h60

    lon = (
        F.pmod(
            h60(F.concat(F.lit("geo-lon|"), F.col("user_id").cast("string"))),
            F.lit(360000),
        )
        - 180000
    ).alias("lon_mdeg")
    lat = (
        F.pmod(
            h60(F.concat(F.lit("geo-lat|"), F.col("user_id").cast("string"))),
            F.lit(170000),
        )
        - 85000
    ).alias("lat_mdeg")
    return events.select("event_id", "user_id", "event_type", lon, lat)


def events_geotile(events: DataFrame, zoom: int = GEOTILE_ZOOM) -> DataFrame:
    """ES geotile_grid aggregation → DF[tile, n_events, n_users]: events
    bucketed into z/x/y map tiles at a fixed zoom. The fixture has no geo
    column, so a deterministic synthetic position derives from the data
    itself (h60 of the user id, the repo's cross-engine hash): integer
    MILLI-degrees lon ∈ [−180000, 180000), lat ∈ [−85000, 85000) — the
    geotile latitude clamp band.

    Tile math is PURE BIGINT — x = (lon_mdeg+180000)·2^z div 360000, and an
    equirectangular y (documented divergence: ES projects Web-Mercator,
    whose ln/tan would need the quantize discipline; the grid CONTRACT —
    fixed-zoom keyed buckets, map-side-combinable — is identical). Integer
    div with provably non-negative operands, so Spark `div` (truncating)
    and DuckDB `//` (truncating) agree. One codegen projection + one
    grouped agg; n_users is an exact distinct (at 100 TB the HLL variant
    swaps in per the cumulative_cardinality precedent)."""
    nt = 1 << zoom
    pos = _geo_pos(events)
    tx = F.expr(f"((lon_mdeg + 180000) * {nt}) div 360000")
    ty = F.expr(f"((85000 - 1 - lat_mdeg) * {nt}) div 170000")
    g = pos.groupBy(
        F.concat_ws("/", F.lit(zoom), tx, ty).alias("tile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return g


GEOTILE_SQL = f"""WITH {GEO_POS_SQL}
SELECT CAST({GEOTILE_ZOOM} AS VARCHAR) || '/' ||
       CAST(((lon_mdeg + 180000) * {1 << GEOTILE_ZOOM}) // 360000 AS VARCHAR) || '/' ||
       CAST(((85000 - 1 - lat_mdeg) * {1 << GEOTILE_ZOOM}) // 170000 AS VARCHAR) AS tile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM pos GROUP BY 1"""


AUTO_HIST_TARGET = 12
#: fixed-interval ladder in seconds (minute, hour, day, week, ~month,
#: ~quarter, ~year). ES auto_date_histogram walks calendar intervals; the
#: fixed-width rungs keep every bucket boundary pure integer epoch math
#: (engine-identical), which is the part of the contract that matters:
#: smallest rung whose bucket count fits the target.
AUTO_HIST_LADDER = (60, 3600, 86400, 604800, 2592000, 7776000, 31536000)


def events_auto_date_histogram(
    events: DataFrame, target: int = AUTO_HIST_TARGET
) -> DataFrame:
    """ES auto_date_histogram aggregation → DF[interval_sec, bucket_start,
    n_events]: the engine picks the bucketing interval — the smallest
    ladder rung whose bucket count over [min ts, max ts] is ≤ target — and
    the caller gets both the chosen interval and the histogram.

    Two tiny jobs + one agg: a 2-value min/max epoch aggregate, a
    when-chain over the ladder (integer floor-div bucket counts, exact both
    engines), then the chosen 1-row interval broadcast onto the group-by.
    All epoch math floors POSITIVE seconds (the serial_diff discipline:
    DuckDB epoch() is fractional — floor it first)."""
    ep = F.col("ts").cast("timestamp").cast("long")
    mm = events.select(ep.alias("ep")).agg(
        F.min("ep").alias("lo"), F.max("ep").alias("hi")
    )

    def n_buckets(i):
        return (
            F.floor(F.col("hi") / F.lit(float(i)))
            - F.floor(F.col("lo") / F.lit(float(i)))
            + 1
        )

    choice = F.coalesce(
        *[F.when(n_buckets(i) <= target, F.lit(i)) for i in AUTO_HIST_LADDER],
        F.lit(AUTO_HIST_LADDER[-1]),
    )
    iv = mm.select(choice.cast("long").alias("interval_sec"))
    b = (
        events.select(ep.alias("ep"))
        .crossJoin(F.broadcast(iv))
        .groupBy(
            "interval_sec",
            (
                F.floor(F.col("ep") / F.col("interval_sec").cast("double")).cast(
                    "long"
                )
                * F.col("interval_sec")
            ).alias("bucket_epoch"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return b.select(
        "interval_sec",
        F.date_format(
            F.col("bucket_epoch").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket_start"),
        "n_events",
    )


def _auto_hist_sql(target: int = AUTO_HIST_TARGET) -> str:
    rungs = "\n".join(
        f"    WHEN CAST(floor(hi/{i}.0) AS BIGINT) - CAST(floor(lo/{i}.0) AS BIGINT) + 1 <= {target} THEN {i}"
        for i in AUTO_HIST_LADDER
    )
    return f"""WITH ep AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
),
mm AS (SELECT MIN(ep) AS lo, MAX(ep) AS hi FROM ep),
iv AS (
  SELECT CAST(CASE
{rungs}
    ELSE {AUTO_HIST_LADDER[-1]} END AS BIGINT) AS interval_sec
  FROM mm
)
SELECT interval_sec,
       strftime(TIMESTAMP '1970-01-01 00:00:00'
                + (CAST(floor(ep / CAST(interval_sec AS DOUBLE)) AS BIGINT)
                   * interval_sec) * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ep, iv GROUP BY 1, 2"""


AUTO_HIST_SQL = _auto_hist_sql()


GEO_ORIGIN = (12345, -6789)  # (lon_mdeg, lat_mdeg) of the query point
GEO_DISTANCE_K = 20


def events_geo_distance_topk(
    events: DataFrame,
    origin: tuple = GEO_ORIGIN,
    k: int = GEO_DISTANCE_K,
) -> DataFrame:
    """ES geo_distance sort / query → DF[rank, event_id, user_id, lon_mdeg,
    lat_mdeg, d2]: the k events nearest a fixed origin, ranked by squared
    equirectangular distance in integer milli-degrees — PURE BIGINT
    (|Δ| < 4·10⁵ → d2 < 3.2·10¹¹, far inside int64), so the sort key is
    engine-exact with no haversine trig anywhere (the great-circle variant
    would route sin/cos through the 9-dp quantize discipline; the CONTRACT
    — distance-ordered page — is identical). TakeOrderedAndProject page
    cut; total order (d2 ASC, event_id ASC)."""
    lon0, lat0 = origin
    pos = _geo_pos(events)
    d2 = (
        (F.col("lon_mdeg") - lon0) * (F.col("lon_mdeg") - lon0)
        + (F.col("lat_mdeg") - lat0) * (F.col("lat_mdeg") - lat0)
    ).cast("long")
    scored = pos.select(
        "event_id", F.col("user_id").cast("long").alias("user_id"),
        "lon_mdeg", "lat_mdeg", d2.alias("d2"),
    )
    page = scored.orderBy(F.asc("d2"), F.asc("event_id")).limit(k)
    w = Window.orderBy(F.asc("d2"), F.asc("event_id"))
    return page.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "event_id", "user_id", "lon_mdeg", "lat_mdeg", "d2"
    )


GEO_DISTANCE_SQL = f"""WITH {GEO_POS_SQL},
s AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS user_id, lon_mdeg, lat_mdeg,
         CAST((lon_mdeg - {GEO_ORIGIN[0]}) * (lon_mdeg - {GEO_ORIGIN[0]})
              + (lat_mdeg - {GEO_ORIGIN[1]}) * (lat_mdeg - {GEO_ORIGIN[1]}) AS BIGINT) AS d2
  FROM pos
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY d2 ASC, event_id ASC) AS rank FROM s
)
SELECT CAST(rank AS BIGINT) AS rank, event_id, user_id, lon_mdeg, lat_mdeg, d2
FROM r WHERE rank <= {GEO_DISTANCE_K}"""


def events_geo_bounds_centroid(events: DataFrame) -> DataFrame:
    """ES geo_bounds + geo_centroid aggregations per event_type →
    DF[event_type, n, min_lon, max_lon, min_lat, max_lat, centroid_lon,
    centroid_lat]: the bounding box is pure integer min/max; the centroid
    is an exact-decimal coordinate sum with ONE double division per axis
    (round6 both sides). One map-side-combinable aggregate, no joins."""
    from .stats import round6

    pos = _geo_pos(events)
    g = pos.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("lon_mdeg").cast("long").alias("min_lon"),
        F.max("lon_mdeg").cast("long").alias("max_lon"),
        F.min("lat_mdeg").cast("long").alias("min_lat"),
        F.max("lat_mdeg").cast("long").alias("max_lat"),
        F.sum(F.col("lon_mdeg").cast("decimal(18,0)")).alias("slon"),
        F.sum(F.col("lat_mdeg").cast("decimal(18,0)")).alias("slat"),
    )
    return g.select(
        "event_type", "n", "min_lon", "max_lon", "min_lat", "max_lat",
        round6(F.col("slon").cast("double") / F.col("n").cast("double")).alias(
            "centroid_lon"
        ),
        round6(F.col("slat").cast("double") / F.col("n").cast("double")).alias(
            "centroid_lat"
        ),
    )


GEO_BOUNDS_SQL = f"""WITH {GEO_POS_SQL},
g AS (
  SELECT event_type, COUNT(*) AS n,
         MIN(lon_mdeg) AS min_lon, MAX(lon_mdeg) AS max_lon,
         MIN(lat_mdeg) AS min_lat, MAX(lat_mdeg) AS max_lat,
         SUM(CAST(lon_mdeg AS DECIMAL(18,0))) AS slon,
         SUM(CAST(lat_mdeg AS DECIMAL(18,0))) AS slat
  FROM pos GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(min_lon AS BIGINT) AS min_lon, CAST(max_lon AS BIGINT) AS max_lon,
       CAST(min_lat AS BIGINT) AS min_lat, CAST(max_lat AS BIGINT) AS max_lat,
       CAST(ROUND(CAST(CAST(slon AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS centroid_lon,
       CAST(ROUND(CAST(CAST(slat AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS centroid_lat
FROM g"""


MOVING_PCT_WINDOW = 7


def events_moving_percentiles(
    events: DataFrame, window: int = MOVING_PCT_WINDOW
) -> DataFrame:
    """ES moving_percentiles pipeline aggregation → DF[day, n_events,
    p50_e1, p90_e1] (exact ×10 BIGINTs): exact interpolated percentiles of
    the trailing `window` daily counts (dense min_doc_count=0 day grid,
    the serial_diff discipline).

    The trailing frame is collected per bucket (collect_list over a rows
    window — ≤ `window` longs), sort_array'd, and interpolated with the
    engine-exact percentile discipline: h = (w−1)·p with p ∈ {0.5, 0.9}
    exact decimal(2,1), so floor/frac are exact decimals and the
    interpolation is integer±decimal arithmetic — no TDigest and no engine
    percentile builtin (ES backs this agg with TDigest; the window frame
    here is days-sized, so exact is FREE at any corpus scale — the buckets,
    not the events, bound the cost)."""
    import decimal as _d

    full = dense_daily_counts(events)
    w = Window.orderBy("day_i").rowsBetween(-(window - 1), 0)
    arr = F.sort_array(F.collect_list("n_events").over(w))

    def pct(a, p: str):
        pd_ = F.lit(_d.Decimal(p))
        h = (F.size(a) - 1) * pd_
        lo = F.floor(h).cast("int")
        frac = h - lo.cast("decimal(10,1)")
        vlo = F.element_at(a, lo + 1)
        vhi = F.element_at(a, F.least(lo + 2, F.size(a)))
        return (vlo + (vhi - vlo) * frac).cast("decimal(14,1)")

    withp = full.select(
        "day_i", "n_events", arr.alias("a")
    ).select(
        F.date_format(
            F.date_add(F.to_date(F.lit("1970-01-01")), F.col("day_i").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "n_events",
        (pct(F.col("a"), "0.5") * 10).cast("long").alias("p50_e1"),
        (pct(F.col("a"), "0.9") * 10).cast("long").alias("p90_e1"),
    )
    return withp


MOVING_PCT_SQL = f"""WITH d AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day_i FROM events
),
c AS (SELECT day_i, COUNT(*) AS n_events FROM d GROUP BY 1),
rng AS (SELECT MIN(day_i) AS lo, MAX(day_i) AS hi FROM c),
grid AS (SELECT unnest(generate_series(lo, hi)) AS day_i FROM rng),
filled AS (
  SELECT g.day_i, COALESCE(c.n_events, 0) AS n_events
  FROM grid g LEFT JOIN c ON c.day_i = g.day_i
),
win AS (
  SELECT day_i, n_events,
         list_sort(list(n_events) OVER (ORDER BY day_i
           ROWS BETWEEN {MOVING_PCT_WINDOW - 1} PRECEDING AND CURRENT ROW)) AS a
  FROM filled
),
p AS (
  SELECT day_i, n_events, a,
         CAST(floor((len(a) - 1) * 0.5) AS INTEGER) AS lo5,
         (len(a) - 1) * 0.5 - CAST(floor((len(a) - 1) * 0.5) AS INTEGER) AS f5,
         CAST(floor((len(a) - 1) * 0.9) AS INTEGER) AS lo9,
         (len(a) - 1) * 0.9 - CAST(floor((len(a) - 1) * 0.9) AS INTEGER) AS f9
  FROM win
)
SELECT strftime(DATE '1970-01-01' + CAST(day_i AS INTEGER), '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(CAST(a[lo5 + 1] + (a[least(lo5 + 2, len(a))] - a[lo5 + 1]) * f5 AS DECIMAL(14,1)) * 10 AS BIGINT) AS p50_e1,
       CAST(CAST(a[lo9 + 1] + (a[least(lo9 + 2, len(a))] - a[lo9 + 1]) * f9 AS DECIMAL(14,1)) * 10 AS BIGINT) AS p90_e1
FROM p"""


# ------------------------------------------------- round-4 session-6 aggs


def events_normalize(events: DataFrame) -> DataFrame:
    """ES ``normalize`` pipeline aggregation (methods ``percent_of_sum`` +
    ``rescale_0_1``) → DF[day, n_events, pct_of_sum, rescale01]: daily event
    counts on the DENSE min_doc_count=0 day grid (serial_diff discipline —
    missing days count 0 and legitimately pin the rescale minimum), each
    bucket normalized against the whole histogram.

    Float discipline: every input is an exact BIGINT (counts, min, max,
    total), each output is ONE double division of exact integers —
    IEEE-identical cross-engine — then round6 (invariant #5). A flat
    histogram (max == min) yields NULL rescale01 on both engines (NULLIF).
    The grid explode, the 1-row stats frame and the broadcast join all run
    on the days-sized frame — the events table is touched once by the
    count aggregation."""
    full = dense_daily_counts(events)
    st = full.agg(
        F.sum("n_events").cast("long").alias("tot"),
        F.min("n_events").cast("long").alias("mn"),
        F.max("n_events").cast("long").alias("mx"),
    )
    from .stats import round6

    return full.crossJoin(F.broadcast(st)).select(
        F.date_format(
            F.date_add(F.to_date(F.lit("1970-01-01")), F.col("day_i").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "n_events",
        round6(
            F.col("n_events").cast("double") / F.col("tot").cast("double")
        ).alias("pct_of_sum"),
        round6(
            (F.col("n_events") - F.col("mn")).cast("double")
            / F.nullif((F.col("mx") - F.col("mn")), F.lit(0)).cast("double")
        ).alias("rescale01"),
    )


NORMALIZE_SQL = """WITH d AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day_i FROM events
),
c AS (SELECT day_i, COUNT(*) AS n_events FROM d GROUP BY 1),
rng AS (SELECT MIN(day_i) AS lo, MAX(day_i) AS hi FROM c),
grid AS (SELECT unnest(generate_series(lo, hi)) AS day_i FROM rng),
filled AS (
  SELECT g.day_i, COALESCE(c.n_events, 0) AS n_events
  FROM grid g LEFT JOIN c ON c.day_i = g.day_i
),
st AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS tot,
         CAST(MIN(n_events) AS BIGINT) AS mn,
         CAST(MAX(n_events) AS BIGINT) AS mx
  FROM filled
)
SELECT strftime(DATE '1970-01-01' + CAST(day_i AS INTEGER), '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(ROUND(CAST(CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS pct_of_sum,
       CAST(ROUND(CAST(CAST(n_events - mn AS DOUBLE)
            / CAST(NULLIF(mx - mn, 0) AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS rescale01
FROM filled, st"""


BUCKET_CORR_X = "click"
BUCKET_CORR_Y = "purchase"


def events_bucket_correlation(
    events: DataFrame, x_type: str = BUCKET_CORR_X, y_type: str = BUCKET_CORR_Y
) -> DataFrame:
    """ES ``bucket_correlation`` pipeline aggregation (x-pack, function
    ``count_correlation``) → one-row DF[n_days, sum_x, sum_y, r]: Pearson
    correlation between the daily-count series of two event types over the
    dense day grid (min_doc_count=0 — a day with clicks and no purchases is
    a (x, 0) point, not a dropped row; dropping zero days would bias r
    toward busy days).

    Exactness: the five moment sums (Σx, Σy, Σxy, Σx², Σy²) are integer
    sums of integer products — exact BIGINT at fixture scale and widened
    through decimal(38,0) for the n·Σxy − Σx·Σy style products so the
    10^2-events/day ... 10^9-events/day range never wraps (the
    lineitem_matrix_stats width-budget discipline). The only doubles are
    the final CAST → sqrt → multiply → divide sequence, pinned identically
    in both engines (sqrt of the same double is IEEE-exact), then round6."""
    full = dense_daily_counts(
        events,
        aggs={
            "x": F.sum(F.when(F.col("event_type") == x_type, 1).otherwise(0)).cast("long"),
            "y": F.sum(F.when(F.col("event_type") == y_type, 1).otherwise(0)).cast("long"),
        },
        keep=("event_type",),
    )
    # widen to decimal BEFORE the product AND the sum — long*long products
    # summed in a long accumulator wrap silently (non-ANSI) right at the
    # 1e9-events/day scale the width budget is for; the DuckDB twin sums
    # in HUGEINT (exact), so a wrap here is a cross-engine mismatch, not
    # an error. Same rule events_change_point applies to its sl·nr.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = full.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    from .stats import round6

    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("sx").cast("long").alias("sum_x"),
        F.col("sy").cast("long").alias("sum_y"),
        round6(num / (F.sqrt(dx) * F.sqrt(dy))).alias("r"),
    )


BUCKET_CORR_SQL = f"""WITH d AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day_i, event_type
  FROM events
),
c AS (
  SELECT day_i,
         SUM(CASE WHEN event_type = '{BUCKET_CORR_X}' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = '{BUCKET_CORR_Y}' THEN 1 ELSE 0 END) AS y
  FROM d GROUP BY 1
),
rng AS (SELECT MIN(day_i) AS lo, MAX(day_i) AS hi FROM c),
grid AS (SELECT unnest(generate_series(lo, hi)) AS day_i FROM rng),
filled AS (
  SELECT g.day_i, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
  FROM grid g LEFT JOIN c ON c.day_i = g.day_i
),
m AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
  FROM filled
)
SELECT CAST(n AS BIGINT) AS n_days, CAST(sx AS BIGINT) AS sum_x,
       CAST(sy AS BIGINT) AS sum_y,
       CAST(ROUND(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS r
FROM m"""


#: DuckDB twin of the deterministic per-user IPv4 (the fixture has no IP
#: column — same synthetic-world precedent as GEO_POS_SQL). h60 is
#: non-negative so DuckDB % equals Spark pmod.
IP_POS_SQL = """ip AS (
  SELECT event_id, user_id,
         ('0x' || substring(md5('ip|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 4294967296 AS ip32
  FROM events
)"""


def _ip32(events: DataFrame) -> DataFrame:
    """Deterministic synthetic IPv4 (as a BIGINT in [0, 2^32)) per event,
    derived from h60 of the user id — pure integer math on both engines,
    shared by the ip_range entry and its oracle (IP_POS_SQL is the twin)."""
    from .textpipe import h60

    return events.select(
        "event_id", "user_id",
        F.pmod(
            h60(F.concat(F.lit("ip|"), F.col("user_id").cast("string"))),
            F.lit(4294967296),
        ).alias("ip32"),
    )


def _dotted(ip: "F.Column"):
    """Dotted-quad rendering of a BIGINT IPv4 — integer div/mod only."""
    return F.concat_ws(
        ".",
        ((ip / F.lit(16777216)).cast("long") % 256).cast("string"),
        ((ip / F.lit(65536)).cast("long") % 256).cast("string"),
        ((ip / F.lit(256)).cast("long") % 256).cast("string"),
        (ip % 256).cast("string"),
    )


def events_ip_range(events: DataFrame) -> DataFrame:
    """ES ``ip_range`` aggregation (CIDR form, /2 blocks) → DF[cidr,
    from_ip, to_ip, n_events, n_users]: events bucketed by the top two bits
    of a deterministic per-user IPv4 (h60-derived — the fixture carries no
    IP column; same synthetic-world discipline as the geo entries).

    Pure-BIGINT bucketing (ip32 div 2^30 ∈ {0..3} — operands non-negative,
    so Spark `div` == DuckDB `//`, the geotile precedent), dotted-quad
    boundary rendering via integer div/mod. n_users is exact distinct:
    children_agg discipline — reduce per (bucket, user) FIRST, then the
    distinct-user count is a plain second-level COUNT with the event count
    a SUM, so no countDistinct ever sees raw events and a monster user
    costs one row per bucket."""
    b = _ip32(events).select(
        (F.col("ip32") / F.lit(1073741824)).cast("long").alias("bucket"),
        "user_id",
    )
    per_user = b.groupBy("bucket", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    g = per_user.groupBy("bucket").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    lo = F.col("bucket") * F.lit(1073741824)
    hi = (F.col("bucket") + 1) * F.lit(1073741824) - 1
    return g.select(
        F.concat(_dotted(lo), F.lit("/2")).alias("cidr"),
        _dotted(lo).alias("from_ip"),
        _dotted(hi).alias("to_ip"),
        "n_events",
        "n_users",
    )


IP_RANGE_SQL = f"""WITH {IP_POS_SQL.strip()},
b AS (SELECT ip32 // 1073741824 AS bucket, user_id FROM ip),
pu AS (SELECT bucket, user_id, COUNT(*) AS n FROM b GROUP BY 1, 2),
g AS (
  SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM pu GROUP BY 1
),
r AS (
  SELECT bucket, n_events, n_users,
         bucket * 1073741824 AS lo, (bucket + 1) * 1073741824 - 1 AS hi
  FROM g
)
SELECT CAST((lo // 16777216) % 256 AS VARCHAR) || '.' ||
       CAST((lo // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((lo // 256) % 256 AS VARCHAR) || '.' ||
       CAST(lo % 256 AS VARCHAR) || '/2' AS cidr,
       CAST((lo // 16777216) % 256 AS VARCHAR) || '.' ||
       CAST((lo // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((lo // 256) % 256 AS VARCHAR) || '.' ||
       CAST(lo % 256 AS VARCHAR) AS from_ip,
       CAST((hi // 16777216) % 256 AS VARCHAR) || '.' ||
       CAST((hi // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((hi // 256) % 256 AS VARCHAR) || '.' ||
       CAST(hi % 256 AS VARCHAR) AS to_ip,
       n_events, n_users
FROM r"""


GLOBAL_MISSING_FILTER = "purchase"


def events_global_missing(events: DataFrame) -> DataFrame:
    """ES ``global`` + ``missing`` + ``terms`` aggregations in one search
    context → DF[bucket_kind, bucket_key, n_events, sum_k]: the query
    filter is event_type = 'purchase'; inside it a terms agg over a derived
    nullable ``plan`` field (k % 7 == 0 → the field is ABSENT — the
    fixture's props always carry k, so missingness is synthesized
    deterministically, the geo/ip precedent), a ``missing`` bucket counting
    the absent rows, and a ``global`` bucket that escapes the query filter
    (ES global agg semantics: aggregates over ALL documents in scope, not
    the query's hits).

    One events pass: every bucket kind is a conditional aggregation over
    the same frame grouped by a precomputed (kind, key) pair built with a
    single explode of at most 2 tags per row — no unions, no second scan.
    sum_k is an exact BIGINT sum."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    plan = F.when(F.pmod(k, F.lit(7)) == 0, F.lit(None).cast("string")).otherwise(
        F.when(F.pmod(k, F.lit(3)) == 0, F.lit("pro"))
        .when(F.pmod(k, F.lit(3)) == 1, F.lit("free"))
        .otherwise(F.lit("team"))
    )
    filt = F.col("event_type") == GLOBAL_MISSING_FILTER
    tagged = events.select(
        k.alias("k"),
        F.explode(
            F.concat(
                F.array(F.struct(F.lit("global").alias("kind"), F.lit("(all)").alias("key"))),
                F.when(
                    filt,
                    F.array(
                        F.struct(
                            F.when(plan.isNull(), F.lit("missing"))
                            .otherwise(F.lit("term")).alias("kind"),
                            F.coalesce(plan, F.lit("(missing)")).alias("key"),
                        )
                    ),
                ).otherwise(F.array().cast("array<struct<kind:string,key:string>>")),
            )
        ).alias("t"),
    )
    return tagged.groupBy(
        F.col("t.kind").alias("bucket_kind"), F.col("t.key").alias("bucket_key")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
    )


GLOBAL_MISSING_SQL = f"""WITH e AS (
  SELECT json_extract_string(props, '$.k')::BIGINT AS k,
         event_type = '{GLOBAL_MISSING_FILTER}' AS hit,
         CASE WHEN json_extract_string(props, '$.k')::BIGINT % 7 = 0 THEN NULL
              WHEN json_extract_string(props, '$.k')::BIGINT % 3 = 0 THEN 'pro'
              WHEN json_extract_string(props, '$.k')::BIGINT % 3 = 1 THEN 'free'
              ELSE 'team' END AS plan
  FROM events
),
tagged AS (
  SELECT 'global' AS bucket_kind, '(all)' AS bucket_key, k FROM e
  UNION ALL
  SELECT CASE WHEN plan IS NULL THEN 'missing' ELSE 'term' END,
         COALESCE(plan, '(missing)'), k
  FROM e WHERE hit
)
SELECT bucket_kind, bucket_key, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM tagged GROUP BY 1, 2"""


GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_PRECISION = 4  # 4 base32 chars = 20 bits (10 lon + 10 lat)


def _geohash_terms() -> list[tuple[str, int, int]]:
    """The 20 (column, divisor, weight) terms of the geohash bit
    interleave, shared by the Spark and DuckDB code generators: geohash
    packs bits lon-first (bit 0 = lon MSB), so code bit (19−2i) is lon bit
    (9−i) and code bit (18−2i) is lat bit (9−i). All integer div/mod on
    non-negative operands — the geotile `div`/`//` equivalence."""
    out = []
    for i in range(10):
        out.append(("lonbin", 2 ** (9 - i), 2 ** (19 - 2 * i)))
        out.append(("latbin", 2 ** (9 - i), 2 ** (18 - 2 * i)))
    return out


def events_geohash(events: DataFrame) -> DataFrame:
    """ES ``geohash_grid`` aggregation (precision 4) → DF[geohash,
    n_events, n_users]: events bucketed by the base32 geohash of their
    deterministic position (the shared _geo_pos world — one geo reality
    across geotile/geohash/distance/bounds/line entries).

    Pure-BIGINT bit math end-to-end: 10-bit lon/lat bins from integer
    milli-degrees ((x+off)·1024 // span — non-negative, so Spark `div` ==
    DuckDB `//`), the 20-bit interleave as a sum of div/mod terms
    (generated from ONE shared table, _geohash_terms, so the two engines
    cannot drift), and base32 rendering via substring into the alphabet
    literal — no floats anywhere. Distinct users per cell use the
    two-level reduce (children_agg discipline)."""
    pos = _geo_pos(events)
    # true integer `div` (the geotile F.expr pattern), NOT double `/` +
    # cast: double division is exact here only by an unstated margin
    # (numerators < 2^53), and the contract is pure-BIGINT on both engines
    b = pos.select(
        "user_id",
        # clamp the exact top edge (lat=+90000 would bin to 1024)
        F.expr("least((lon_mdeg + 180000) * 1024 div 360000, 1023)").alias("lonbin"),
        F.expr("least((lat_mdeg + 90000) * 1024 div 180000, 1023)").alias("latbin"),
    )
    code_expr = " + ".join(
        f"(({col} div {div}) % 2) * {w}" for col, div, w in _geohash_terms()
    )
    coded = b.select("user_id", F.expr(f"cast(({code_expr}) as bigint)").alias("code"))
    gh = F.concat(
        *[
            F.lit(GEOHASH_B32).substr(
                F.expr(
                    f"cast((code div {2 ** (5 * (3 - i))}) % 32 + 1 as int)"
                ),
                F.lit(1),
            )
            for i in range(GEOHASH_PRECISION)
        ]
    )
    per_user = coded.groupBy("code", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    g = per_user.groupBy("code").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    return g.select(gh.alias("geohash"), "n_events", "n_users")


def _geohash_code_sql() -> str:
    terms = " + ".join(
        f"(({col} // {div}) % 2) * {w}" for col, div, w in _geohash_terms()
    )
    return terms


GEOHASH_SQL = f"""WITH {GEO_POS_SQL.strip()},
b AS (
  SELECT user_id,
         LEAST((lon_mdeg + 180000) * 1024 // 360000, 1023) AS lonbin,
         LEAST((lat_mdeg + 90000) * 1024 // 180000, 1023) AS latbin
  FROM pos
),
coded AS (SELECT user_id, {_geohash_code_sql()} AS code FROM b),
pu AS (SELECT code, user_id, COUNT(*) AS n FROM coded GROUP BY 1, 2),
g AS (
  SELECT code, CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM pu GROUP BY 1
)
SELECT substring('{GEOHASH_B32}', CAST((code // 32768) % 32 AS INTEGER) + 1, 1) ||
       substring('{GEOHASH_B32}', CAST((code // 1024) % 32 AS INTEGER) + 1, 1) ||
       substring('{GEOHASH_B32}', CAST((code // 32) % 32 AS INTEGER) + 1, 1) ||
       substring('{GEOHASH_B32}', CAST(code % 32 AS INTEGER) + 1, 1) AS geohash,
       n_events, n_users
FROM g"""


GEO_LINE_SIZE = 5


def events_geo_line(events: DataFrame, size: int = GEO_LINE_SIZE) -> DataFrame:
    """ES ``geo_line`` aggregation → DF[user_id, total_points, n_points,
    line]: per user, the first ``size`` positions in (ts, event_id) order
    joined into a "lon,lat lon,lat …" linestring. Positions here are
    per-EVENT (salt 'line|'||event_id — a per-user salt would collapse
    every user's track to one point).

    Determinism without a sort-within-group shuffle trick: each point is
    rendered as ONE sortable string — a zero-padded (epoch-seconds,
    event_id) prefix, a ':', then the payload — so array_sort's bytewise
    string order IS the (ts, event_id) order on both engines; the prefix
    is stripped after the slice. One groupBy; the per-user array is
    size-capped by slice before any string concat (ES caps at size), so a
    monster user's line cost is bounded by its collect_list. At true
    monster-key scale the established remedy is the pre-aggregation cap
    (diversified_sampler's bucket window); documented, not needed at the
    fixture's ≤ thousands of events per user."""
    from .textpipe import h60

    lon = (
        F.pmod(
            h60(F.concat(F.lit("line-lon|"), F.col("event_id").cast("string"))),
            F.lit(360000),
        )
        - 180000
    )
    lat = (
        F.pmod(
            h60(F.concat(F.lit("line-lat|"), F.col("event_id").cast("string"))),
            F.lit(170000),
        )
        - 85000
    )
    elem = F.concat(
        F.lpad(F.col("ts").cast("timestamp").cast("long").cast("string"), 11, "0"),
        F.lpad(F.col("event_id").cast("string"), 9, "0"),
        F.lit(":"),
        lon.cast("string"), F.lit(","), lat.cast("string"),
    )
    g = events.select(
        F.col("user_id").cast("long").alias("user_id"), elem.alias("e")
    ).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("total_points"),
        F.array_sort(F.collect_list("e")).alias("a"),
    )
    sliced = F.slice(F.col("a"), 1, size)
    return g.select(
        "user_id",
        "total_points",
        F.least(F.col("total_points"), F.lit(size)).cast("long").alias("n_points"),
        F.array_join(
            F.transform(sliced, lambda x: F.substring(x, 22, 100)), " "
        ).alias("line"),
    )


GEO_LINE_SQL = f"""WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         lpad(CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR), 11, '0') ||
         lpad(CAST(event_id AS VARCHAR), 9, '0') || ':' ||
         CAST(('0x' || substring(md5('line-lon|' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 360000 - 180000 AS VARCHAR)
         || ',' ||
         CAST(('0x' || substring(md5('line-lat|' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 170000 - 85000 AS VARCHAR)
         AS el
  FROM events
),
g AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS total_points,
         list_sort(list(el)) AS a
  FROM e GROUP BY 1
)
SELECT user_id, total_points,
       CAST(LEAST(total_points, {GEO_LINE_SIZE}) AS BIGINT) AS n_points,
       array_to_string(list_transform(a[1:{GEO_LINE_SIZE}], x -> substring(x, 22, 100)), ' ') AS line
FROM g"""


def events_change_point(events: DataFrame) -> DataFrame:
    """ES ``change_point`` pipeline aggregation (x-pack), the deterministic
    mean-shift variant → one-row DF[change_day, n_left, n_right, mean_left,
    mean_right, stat]: the split of the dense daily-count series that
    maximizes the between-segment mean difference

        stat(t) = |mean(days < t) − mean(days ≥ t)|

    (ES fits several change types — step_change is this statistic's
    argmax; its p-value machinery is a significance gate on top of the
    same split scan). Determinism discipline: the statistic's numerator
    |sum_l·n_r − sum_r·n_l| and denominator n_l·n_r are exact BIGINTs from
    one prefix-sum window over the days-sized frame (widened to
    decimal(38,0) before the cross-products — width-budget rule), the
    ranking key is the round6-quantized double ratio with day ASC
    tiebreak (invariant #3), and the argmax is a TakeOrderedAndProject
    LIMIT 1 — never a driver-side scan. Events are touched once by the
    day count; everything after runs on the grid."""
    full = dense_daily_counts(
        events, aggs={"n": F.count(F.lit(1)).cast("long")}
    )
    w = Window.orderBy("day_i").rowsBetween(Window.unboundedPreceding, -1)
    tot = full.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("st"),
    )
    pre = full.select(
        "day_i",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).cast("long").alias("nl"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("sl"),
    ).filter(F.col("nl") > 0)
    from .stats import round6

    c = pre.crossJoin(F.broadcast(tot)).select(
        "day_i", "nl", "sl",
        (F.col("nd") - F.col("nl")).alias("nr"),
        (F.col("st") - F.col("sl")).alias("sr"),
    )
    num = F.abs(
        F.col("sl").cast("decimal(38,0)") * F.col("nr")
        - F.col("sr").cast("decimal(38,0)") * F.col("nl")
    ).cast("double")
    den = (F.col("nl").cast("decimal(38,0)") * F.col("nr")).cast("double")
    scored = c.select(
        "day_i", "nl", "nr", "sl", "sr", round6(num / den).alias("stat")
    )
    best = scored.orderBy(F.desc("stat"), F.asc("day_i")).limit(1)
    return best.select(
        F.date_format(
            F.date_add(F.to_date(F.lit("1970-01-01")), F.col("day_i").cast("int")),
            "yyyy-MM-dd",
        ).alias("change_day"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        round6(F.col("sl").cast("double") / F.col("nl").cast("double")).alias(
            "mean_left"
        ),
        round6(F.col("sr").cast("double") / F.col("nr").cast("double")).alias(
            "mean_right"
        ),
        "stat",
    )


CHANGE_POINT_SQL = """WITH d AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day_i FROM events
),
c AS (SELECT day_i, COUNT(*) AS n FROM d GROUP BY 1),
rng AS (SELECT MIN(day_i) AS lo, MAX(day_i) AS hi FROM c),
grid AS (SELECT unnest(generate_series(lo, hi)) AS day_i FROM rng),
filled AS (
  SELECT g.day_i, COALESCE(c.n, 0) AS n
  FROM grid g LEFT JOIN c ON c.day_i = g.day_i
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(n) AS BIGINT) AS st FROM filled),
pre AS (
  SELECT day_i,
         CAST(COALESCE(COUNT(*) OVER (ORDER BY day_i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nl,
         CAST(COALESCE(SUM(n) OVER (ORDER BY day_i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sl
  FROM filled
),
s AS (
  SELECT day_i, nl, sl, nd - nl AS nr, st - sl AS sr
  FROM pre, tot WHERE nl > 0
),
scored AS (
  SELECT day_i, nl, nr, sl, sr,
         CAST(ROUND(CAST(
           CAST(abs(CAST(sl AS DECIMAL(38,0)) * nr - CAST(sr AS DECIMAL(38,0)) * nl) AS DOUBLE)
           / CAST(CAST(nl AS DECIMAL(38,0)) * nr AS DOUBLE)
         AS DECIMAL(28,9)), 6) AS DOUBLE) AS stat
  FROM s
),
best AS (
  SELECT * FROM scored ORDER BY stat DESC, day_i ASC LIMIT 1
)
SELECT strftime(DATE '1970-01-01' + CAST(day_i AS INTEGER), '%Y-%m-%d') AS change_day,
       nl AS n_left, nr AS n_right,
       CAST(ROUND(CAST(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_left,
       CAST(ROUND(CAST(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_right,
       stat
FROM best"""


# ------------------------------------------------- rollup / downsampling


def build_events_rollup(events: DataFrame, path: str) -> None:
    """ES rollup job / TSDB downsampling → materialize the HOURLY
    pre-aggregation of the events stream as a parquet artifact:
    DF[hour_i (epoch-hour BIGINT), event_type, n_events, sum_value
    (decimal(28,2))]. Coarser-grain queries (daily/monthly) are then
    answered FROM the rollup — at 100 TB the raw events are cold storage
    and every dashboard query touches only the downsampled table (ES
    rollup-search contract: answers from the rollup equal answers from
    raw for any grouping coarser than the rollup grain).

    Exactness is what makes the contract checkable: counts are integers
    and values are summed as exact decimals, so re-aggregating hourly
    sums to months is bit-equal to aggregating raw rows to months
    (associativity of exact decimal addition — doubles would NOT give
    this; their reassociated sums drift by ULPs)."""
    hour = F.floor(
        F.col("ts").cast("timestamp").cast("long") / F.lit(3600)
    ).cast("long").alias("hour_i")
    (
        events.groupBy(hour, "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(28,2)")
            .alias("sum_value"),
        )
        .repartition(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def events_rollup_monthly(spark, rollup_path: str) -> DataFrame:
    """Monthly revenue/count per event type answered FROM the hourly
    rollup artifact (never the raw events) → DF[month, event_type,
    n_events, sum_value_e2, avg_value] (sum as exact BIGINT cents): the
    ES rollup-search path. The month
    key derives from the epoch-hour by integer-exact timestamp math; sums
    re-aggregate the hourly decimals (exact); avg is ONE double division
    round6. The oracle computes the same answer from RAW events — two
    data layouts, one answer, which is precisely the rollup guarantee."""
    r = spark.read.parquet(rollup_path)
    month = F.date_format(
        F.timestamp_seconds(F.col("hour_i") * 3600), "yyyy-MM"
    ).alias("month")
    g = r.groupBy(month, "event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value").cast("decimal(30,2)").alias("sum_value"),
    )
    from .stats import round6

    return g.select(
        "month", "event_type", "n_events",
        (F.col("sum_value") * 100).cast("long").alias("sum_value_e2"),
        round6(
            F.col("sum_value").cast("double") / F.col("n_events").cast("double")
        ).alias("avg_value"),
    )


ROLLUP_MONTHLY_SQL = """WITH m AS (
  SELECT strftime(ts, '%Y-%m') AS month, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT month, event_type, n_events,
       CAST(sum_value * 100 AS BIGINT) AS sum_value_e2,
       CAST(ROUND(CAST(CAST(sum_value AS DOUBLE) / CAST(n_events AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_value
FROM m"""


FIS_MIN_SUPPORT_PCT = 5  # itemset must appear in >= 5% of baskets


def events_frequent_item_sets(events: DataFrame) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (exact Apriori for sizes 2-3)
    → DF[items, size, support, n_baskets]: a basket is a (user_id,
    epoch-day) pair, its items the DISTINCT event_types that day; an
    itemset is frequent when its basket count clears the RELATIVE support
    gate (≥ 5% of all baskets — the rare_terms precedent: a fixed count
    would pass everything or nothing as SF moves).

    The item vocabulary is the event-type domain (single digits), so the
    candidate lattice is bounded (≤ C(|types|, 3)) and the exact form is
    a pair/triple self-join on the baskets-sized distinct frame — the PMI
    / term_triangles wedge-join shape with the a<b(<c) order dedup; ES's
    approximate transaction sampling is an efficiency knob this exact
    form oracles. Support gate by exact-integer CROSS-MULTIPLICATION
    (support·100 ≥ pct·n_baskets — no division in the filter); the
    reported ratio is one double division round6."""
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / F.lit(86400)
    ).cast("long")
    # persisted: b feeds FOUR consumers (nb, the pair join's both sides,
    # the triple join's third side) — without persist the events scan +
    # distinct shuffle re-executes per consumer (the LSH band-keys sharp
    # edge). Left persisted for the returned lazy plan; LRU reclaims it.
    b = events.select(
        F.concat_ws("|", F.col("user_id").cast("string"), day.cast("string"))
        .alias("basket"),
        F.col("event_type").alias("item"),
    ).distinct().persist()
    nb = b.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    b2 = b.select("basket", F.col("item").alias("i2"))
    pairs = (
        b.join(b2, "basket")
        .filter(F.col("item") < F.col("i2"))
        .groupBy("item", "i2")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .select(
            F.concat_ws("|", "item", "i2").alias("items"),
            F.lit(2).cast("long").alias("size"),
            "support",
        )
    )
    b3 = b.select("basket", F.col("item").alias("i3"))
    triples = (
        b.join(b2, "basket")
        .filter(F.col("item") < F.col("i2"))
        .join(b3, "basket")
        .filter(F.col("i2") < F.col("i3"))
        .groupBy("item", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .select(
            F.concat_ws("|", "item", "i2", "i3").alias("items"),
            F.lit(3).cast("long").alias("size"),
            "support",
        )
    )
    from .stats import round6

    out = pairs.unionByName(triples).crossJoin(F.broadcast(nb)).filter(
        F.col("support") * 100 >= F.lit(FIS_MIN_SUPPORT_PCT) * F.col("n_baskets")
    )
    return out.select(
        "items", "size", "support",
        round6(
            F.col("support").cast("double") / F.col("n_baskets").cast("double")
        ).alias("support_ratio"),
    )


FREQUENT_ITEM_SETS_SQL = f"""WITH b AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' ||
         CAST(CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS VARCHAR) AS basket,
         event_type AS item
  FROM events
),
nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
pairs AS (
  SELECT a.item || '|' || c.item AS items, CAST(2 AS BIGINT) AS size,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
  GROUP BY 1
),
triples AS (
  SELECT a.item || '|' || c.item || '|' || d.item AS items,
         CAST(3 AS BIGINT) AS size, CAST(COUNT(*) AS BIGINT) AS support
  FROM b a
  JOIN b c ON a.basket = c.basket AND a.item < c.item
  JOIN b d ON a.basket = d.basket AND c.item < d.item
  GROUP BY 1
),
u AS (SELECT * FROM pairs UNION ALL SELECT * FROM triples)
SELECT items, size, support,
       CAST(ROUND(CAST(CAST(support AS DOUBLE) / CAST(n_baskets AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS support_ratio
FROM u, nb
WHERE support * 100 >= {FIS_MIN_SUPPORT_PCT} * n_baskets"""


#: Fixed query polygon (CCW, integer milli-degrees) for the geo_polygon
#: entry — covers a meaningful slice of the h60 position space.
GEO_POLYGON = [
    (-120000, -60000),
    (90000, -70000),
    (150000, 20000),
    (10000, 75000),
    (-140000, 40000),
]


def _pip_parity_terms(px: str, py: str) -> list[str]:
    """The shared edge-crossing terms of the ray-casting point-in-polygon
    test, emitted as engine-neutral SQL boolean expressions over integer
    coordinate columns ``px``/``py`` (generated from ONE vertex table so
    Spark and DuckDB cannot drift — the _geohash_terms pattern).

    Exactness: the crossing test px < x1 + (x2−x1)(py−y1)/(y2−y1) is
    cross-multiplied into t = (x2−x1)(py−y1) − (px−x1)(y2−y1) compared
    against 0 with the sign of (y2−y1) — pure BIGINT, no division, no
    floats (products ≤ ~360000·160000 ≈ 6e10, far inside int64). A point
    exactly on an edge (t = 0) counts OUTSIDE (strict crossing) —
    deterministic either way, and unreachable for h60-derived points
    against these vertices."""
    terms = []
    n = len(GEO_POLYGON)
    for i in range(n):
        x1, y1 = GEO_POLYGON[i]
        x2, y2 = GEO_POLYGON[(i + 1) % n]
        t = f"(({x2} - {x1}) * ({py} - {y1}) - ({px} - {x1}) * ({y2} - {y1}))"
        straddles = f"(({y1} > {py}) <> ({y2} > {py}))"
        crossing = f"({t} {'>' if y2 > y1 else '<'} 0)"
        terms.append(
            f"(CASE WHEN {straddles} AND {crossing} THEN 1 ELSE 0 END)"
        )
    return terms


def events_geo_polygon(events: DataFrame) -> DataFrame:
    """ES ``geo_polygon`` query (+ the implied filtered aggregation) →
    DF[event_type, n_events, n_users]: events whose deterministic position
    falls INSIDE the fixed query polygon, counted per type with exact
    distinct users.

    Point-in-polygon by ray casting with the crossing test cross-
    multiplied into pure BIGINT sign comparisons (no division, no floats —
    _pip_parity_terms, shared verbatim with the oracle). The whole filter
    is one codegen projection over the positions; counts use the two-level
    (type, user) reduce."""
    pos = _geo_pos(events)
    parity = " + ".join(_pip_parity_terms("lon_mdeg", "lat_mdeg"))
    inside = pos.filter(F.expr(f"(({parity}) % 2) = 1"))
    per_user = inside.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return per_user.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )


def geo_polygon_sql() -> str:
    parity = " + ".join(_pip_parity_terms("lon_mdeg", "lat_mdeg"))
    return f"""WITH {GEO_POS_SQL.strip()},
inside AS (
  SELECT event_type, user_id FROM pos WHERE (({parity}) % 2) = 1
),
pu AS (SELECT event_type, user_id, COUNT(*) AS n FROM inside GROUP BY 1, 2)
SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM pu GROUP BY 1"""


# ------------------------------------------------- round-4 session-7 sketches

HLL_M = 64            # registers (p = 6)
HLL_RANK_BITS = 24    # rank window bits -> rank in [1, 25]
#: alpha_64 from Flajolet et al. 2007 (the m=64 bias constant), folded with
#: m^2 * 2^25 into ONE shared double literal so neither engine multiplies:
#: C = 0.709 * 64^2 * 2^25. repr() so both engines parse the identical double.
HLL_EST_NUMERATOR = 0.709 * float(HLL_M * HLL_M) * float(1 << (HLL_RANK_BITS + 1))


def events_hll_cardinality(events: DataFrame) -> DataFrame:
    """HyperLogLog distinct-user sketch per event type → DF[event_type,
    n_exact, v_zero, s_sum, hll_est]: the ES ``cardinality`` agg's actual
    algorithm (the engine's exact first-occurrence rewrite in
    cumulative_cardinality is the small-scale twin; THIS is the 100 TB
    estimator), made value-checkable because every step is integer:

        h = h60('hll|'||user_id); register = h % 64
        w = (h >> 6) % 2^24; rank = 25 − bitlen(w)   (w = 0 → 25)
        S = Σ_regs 2^(25 − max_rank) + V·2^25        (V = empty registers)
        est = C / S     with C = alpha_64·m²·2^25 a SHARED double literal

    bitlen via length(bin(w)) — both engines render minimal binary
    strings, so the register ranks are engine-identical; S is an exact
    BIGINT (≤ 64·2^25); the raw estimate is ONE double division. The
    published SMALL-RANGE correction applies (raw ≤ 2.5m with empty
    registers → linear counting m·ln(m/V)): the branch predicate compares
    the identical raw double on both engines, and ln routes through the
    string_stats round9-quantize discipline (ROUND(ln(x), 9) — libm ulp
    noise sits 7 decimal orders below the cut) before the exact ×m
    (a power of two) and round6. n_exact makes the entry its own accuracy
    report (the KMV precedent).

    Scale shape: register build is ONE map-combinable groupBy on
    (event_type, idx) — 64 rows per type out of any corpus size; sketches
    merge by register-max, the property that makes HLL the distributed
    cardinality workhorse."""
    from .stats import round6
    from .textpipe import h60

    m, rb = HLL_M, HLL_RANK_BITS
    h = h60(F.concat(F.lit("hll|"), F.col("user_id").cast("string")))
    base = events.select(
        "event_type",
        F.pmod(h, F.lit(m)).alias("idx"),
        F.pmod(F.shiftright(h, 6), F.lit(1 << rb)).alias("w"),
    )
    rank = F.when(F.col("w") == 0, rb + 1).otherwise(
        F.lit(rb + 1) - F.length(F.bin(F.col("w")))
    )
    regs = base.groupBy("event_type", "idx").agg(F.max(rank).alias("r"))
    sk = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        # shiftleft's python wrapper takes only an int literal for the
        # shift amount; the Catalyst expression accepts a column — SQL form.
        F.sum(F.expr(f"CAST(shiftleft(1, {rb + 1} - r) AS BIGINT)"))
        .cast("long")
        .alias("s_hit"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    s_sum = (
        F.col("s_hit") + (F.lit(m) - F.col("n_hit")) * F.lit(1 << (rb + 1))
    ).cast("long")
    est_raw = F.lit(HLL_EST_NUMERATOR) / s_sum.cast("double")
    return exact.join(sk, "event_type").select(
        "event_type",
        "n_exact",
        (F.lit(m) - F.col("n_hit")).cast("long").alias("v_zero"),
        s_sum.alias("s_sum"),
        round6(
            F.when(
                (est_raw <= F.lit(2.5 * m)) & (F.col("n_hit") < m),
                F.lit(float(m))
                * F.round(
                    F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_hit")).cast("double")),
                    9,
                ),
            ).otherwise(est_raw)
        ).alias("hll_est"),
    )


HLL_SQL = f"""WITH base AS (
  SELECT event_type,
         ('0x' || substring(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
rw AS (
  SELECT event_type, h % {HLL_M} AS idx, (h >> 6) % {1 << HLL_RANK_BITS} AS w
  FROM base
),
regs AS (
  SELECT event_type, idx,
         MAX(CASE WHEN w = 0 THEN {HLL_RANK_BITS + 1}
                  ELSE {HLL_RANK_BITS + 1} - length(bin(w)) END) AS r
  FROM rw GROUP BY 1, 2
),
sk AS (
  SELECT event_type, COUNT(*) AS n_hit,
         SUM((1::BIGINT << ({HLL_RANK_BITS + 1} - r))) AS s_hit
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
),
ss AS (
  SELECT event_type, n_hit,
         s_hit + ({HLL_M} - n_hit) * {1 << (HLL_RANK_BITS + 1)} AS s
  FROM sk
)
SELECT e.event_type, CAST(e.n_exact AS BIGINT) AS n_exact,
       CAST({HLL_M} - s.n_hit AS BIGINT) AS v_zero,
       CAST(s.s AS BIGINT) AS s_sum,
       CAST(ROUND(CAST(
         CASE WHEN ({HLL_EST_NUMERATOR!r} / CAST(s.s AS DOUBLE)) <= {2.5 * HLL_M}
                   AND s.n_hit < {HLL_M}
              THEN {float(HLL_M)!r} * ROUND(ln({float(HLL_M)!r} / CAST({HLL_M} - s.n_hit AS DOUBLE)), 9)
              ELSE {HLL_EST_NUMERATOR!r} / CAST(s.s AS DOUBLE) END
       AS DECIMAL(28,9)), 6) AS DOUBLE) AS hll_est
FROM exact e JOIN ss s USING (event_type)"""


KMV_OVERLAP_K = 64
KMV_TYPE_A = "click"
KMV_TYPE_B = "purchase"
_KMV_RANGE_LIT = repr(float(1 << 60))


def events_kmv_overlap(
    events: DataFrame,
    type_a: str = KMV_TYPE_A,
    type_b: str = KMV_TYPE_B,
    k: int = KMV_OVERLAP_K,
) -> DataFrame:
    """Theta/KMV sketch SET OPERATIONS (union + intersection across two
    sketches — the DataSketches workflow behind "how many users did BOTH")
    → one-row DF[type_a, type_b, n_a_sketch, n_b_sketch, theta, est_union,
    est_intersection, exact_union, exact_intersection]:

        sketch_T = k smallest distinct h60('u|'||user) of type T
        merged   = k smallest of (sketch_A ∪ sketch_B)
        θ        = kth smallest of merged (2^60 when |merged| < k = exact regime)
        est_∪    = |{h ∈ merged : h < θ}| / (θ/2^60)
        est_∩    = |{h ∈ A ∩ B : h < θ}| / (θ/2^60)

    One formula covers both regimes: θ = 2^60 makes the divisor exactly
    1.0, so the estimate degenerates to the exact count. The op sequence
    (count → double, θ → double, ONE inner division by the shared 2^60
    literal, ONE outer division, round6) is pinned identically in SQL —
    the kmv_distinct_terms form extended to sketch algebra. Exact
    union/intersection counts ride along as the accuracy report.

    Scale shape: distinct (type, h) is map-combinable; per-type k-smallest
    would use the salted two-phase prune at vocabulary scale (the
    kmv_distinct_terms lever — distinct users per type here is fixture-
    bounded, and the sketches themselves are ≤ k rows from there on)."""
    from .stats import round6
    from .textpipe import h60

    uh = (
        events.filter(F.col("event_type").isin([type_a, type_b]))
        .select(
            "event_type",
            h60(F.concat(F.lit("u|"), F.col("user_id").cast("string"))).alias("h"),
        )
        .distinct()
        .persist()
    )
    w_t = Window.partitionBy("event_type").orderBy("h")
    sk = (
        uh.withColumn("r", F.row_number().over(w_t))
        .filter(F.col("r") <= k)
        .select("event_type", "h")
        .persist()
    )
    ska = sk.filter(F.col("event_type") == type_a).select("h")
    skb = sk.filter(F.col("event_type") == type_b).select("h")
    merged = (
        ska.unionByName(skb)
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("r") <= k)
        .persist()
    )
    theta = merged.agg(
        F.when(F.count(F.lit(1)) >= k, F.max("h"))
        .otherwise(F.lit(1 << 60))
        .cast("long")
        .alias("theta")
    )
    n_below = (
        merged.crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_below"))
    )
    c_int = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_int"))
    )
    sizes = sk.groupBy().pivot("event_type", [type_a, type_b]).count()
    ex_union = (
        uh.select("h").distinct().agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
    )
    ex_int = (
        uh.groupBy("h")
        .agg(F.count_distinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    est = lambda c: round6(
        c.cast("double")
        / (F.col("theta").cast("double") / F.lit(float(1 << 60)))
    )
    out = (
        theta.crossJoin(n_below)
        .crossJoin(c_int)
        .crossJoin(sizes)
        .crossJoin(ex_union)
        .crossJoin(ex_int)
        .select(
            F.lit(type_a).alias("type_a"),
            F.lit(type_b).alias("type_b"),
            F.coalesce(F.col(type_a), F.lit(0)).cast("long").alias("n_a_sketch"),
            F.coalesce(F.col(type_b), F.lit(0)).cast("long").alias("n_b_sketch"),
            "theta",
            est(F.col("n_below")).alias("est_union"),
            est(F.col("c_int")).alias("est_intersection"),
            "exact_union",
            "exact_intersection",
        )
    )
    return out


KMV_OVERLAP_SQL = f"""WITH uh AS (
  SELECT DISTINCT event_type,
         ('0x' || substring(md5('u|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE event_type IN ('{KMV_TYPE_A}', '{KMV_TYPE_B}')
),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
    FROM uh
  ) WHERE r <= {KMV_OVERLAP_K}
),
merged AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE r <= {KMV_OVERLAP_K}
),
th AS (
  SELECT CASE WHEN COUNT(*) >= {KMV_OVERLAP_K} THEN MAX(h)
              ELSE {1 << 60} END AS theta
  FROM merged
),
nb AS (SELECT COUNT(*) AS n_below FROM merged, th WHERE h < theta),
ci AS (
  SELECT COUNT(*) AS c_int
  FROM (SELECT h FROM sk WHERE event_type = '{KMV_TYPE_A}') a
  JOIN (SELECT h FROM sk WHERE event_type = '{KMV_TYPE_B}') b USING (h), th
  WHERE h < theta
),
sz AS (
  SELECT SUM(CASE WHEN event_type = '{KMV_TYPE_A}' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN event_type = '{KMV_TYPE_B}' THEN 1 ELSE 0 END) AS n_b
  FROM sk
),
exu AS (SELECT COUNT(DISTINCT h) AS exact_union FROM uh),
exi AS (
  SELECT COUNT(*) AS exact_intersection FROM (
    SELECT h FROM uh GROUP BY h HAVING COUNT(DISTINCT event_type) = 2
  )
)
SELECT '{KMV_TYPE_A}' AS type_a, '{KMV_TYPE_B}' AS type_b,
       CAST(sz.n_a AS BIGINT) AS n_a_sketch, CAST(sz.n_b AS BIGINT) AS n_b_sketch,
       CAST(th.theta AS BIGINT) AS theta,
       CAST(ROUND(CAST(CAST(nb.n_below AS DOUBLE)
            / (CAST(th.theta AS DOUBLE) / {_KMV_RANGE_LIT})
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS est_union,
       CAST(ROUND(CAST(CAST(ci.c_int AS DOUBLE)
            / (CAST(th.theta AS DOUBLE) / {_KMV_RANGE_LIT})
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS est_intersection,
       CAST(exu.exact_union AS BIGINT) AS exact_union,
       CAST(exi.exact_intersection AS BIGINT) AS exact_intersection
FROM th, nb, ci, sz, exu, exi"""


FILTERS_HIGH_VALUE = 150.0  # high_value bucket threshold (parquet doubles
                            # compare identically against the shared literal)


def events_filters_agg(events: DataFrame) -> DataFrame:
    """ES ``filters`` aggregation (named filter buckets + other_bucket) →
    DF[bucket, n_events, n_users]: three named buckets — clicks
    (event_type='click'), errors (event_type='error'), high_value
    (value >= 150.0) — where one event lands in EVERY bucket it matches
    (ES filters-agg semantics: buckets are independent predicates, not a
    partition), plus ``_other_`` for events matching none
    (other_bucket=true, other_bucket_key='_other_').

    One events pass: the matched-bucket list is built map-side as a
    filtered literal array and exploded (≤ 3 tags/row + the other
    fallback); distinct users reduce per (bucket, user) first so the
    final count is a plain second-level COUNT — no countDistinct over raw
    rows, monster-bucket-proof at any scale. All outputs exact BIGINTs."""
    tags = F.filter(
        F.array(
            F.when(F.col("event_type") == "click", F.lit("clicks")),
            F.when(F.col("event_type") == "error", F.lit("errors")),
            F.when(F.col("value") >= FILTERS_HIGH_VALUE, F.lit("high_value")),
        ),
        lambda x: x.isNotNull(),
    )
    tagged = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.explode(
            F.when(F.size(tags) == 0, F.array(F.lit("_other_"))).otherwise(tags)
        ).alias("bucket"),
    )
    per_user = tagged.groupBy("bucket", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_user.groupBy("bucket").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )


FILTERS_AGG_SQL = f"""WITH tagged AS (
  SELECT user_id,
         unnest(CASE WHEN len(l) = 0 THEN ['_other_'] ELSE l END) AS bucket
  FROM (
    SELECT user_id,
           list_filter([
             CASE WHEN event_type = 'click' THEN 'clicks' END,
             CASE WHEN event_type = 'error' THEN 'errors' END,
             CASE WHEN value >= {FILTERS_HIGH_VALUE} THEN 'high_value' END
           ], x -> x IS NOT NULL) AS l
    FROM events)
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM tagged GROUP BY 1"""


EQL_FIRST, EQL_SECOND = "view", "click"
EQL_MAXSPAN_S = 3600


def eql_sequence(events: DataFrame) -> DataFrame:
    """EQL two-step sequence query (``sequence by user_id with maxspan=1h
    [view] [click]``) → DF[user_id, a_event_id, b_event_id, span_s]: for
    every head event (view) the FIRST qualifying successor (click) by the
    same user strictly after it and within maxspan — the pinned
    deterministic contract for ES EQL's sequence matcher (real EQL's
    internal event reuse rules are engine-version-dependent; first-
    successor-per-head is the form every version agrees on for two-step
    sequences, and it is the events_asof_join/funnel family's semantics).

    Time discipline: BOTH epochs floored to whole seconds before any
    comparison or diff (the asof-join sharp edge — DuckDB epoch() is
    fractional and CAST rounds while Spark ts→long truncates); the
    successor pick is min(struct(b_epoch, b_event_id)) — the max(struct)
    top_metrics precedent, map-combinable, no window over the join.

    Plan at scale: the join is an equality join on user_id with range
    residuals — sort-merge co-partitioned on the by-key, exactly how a
    SIEM would shard it; per-user match lists are bounded by per-key
    activity like sessionize."""
    ep = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    a = events.filter(F.col("event_type") == EQL_FIRST).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("a_event_id"),
        ep("ts").alias("ae"),
    )
    b = events.filter(F.col("event_type") == EQL_SECOND).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("b_event_id"),
        ep("ts").alias("be"),
    )
    j = a.join(
        b,
        [
            a.user_id == b.user_id,
            b.be > a.ae,
            b.be <= a.ae + F.lit(EQL_MAXSPAN_S),
        ],
    ).select(a.user_id, "a_event_id", "ae", "b_event_id", "be")
    first = j.groupBy("user_id", "a_event_id", "ae").agg(
        F.min(F.struct("be", "b_event_id")).alias("m")
    )
    return first.select(
        "user_id",
        "a_event_id",
        F.col("m.b_event_id").alias("b_event_id"),
        (F.col("m.be") - F.col("ae")).cast("long").alias("span_s"),
    )


EQL_SEQUENCE_SQL = f"""WITH a AS (
  SELECT user_id, event_id AS a_event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ae
  FROM events WHERE event_type = '{EQL_FIRST}'
),
b AS (
  SELECT user_id, event_id AS b_event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS be
  FROM events WHERE event_type = '{EQL_SECOND}'
),
j AS (
  SELECT a.user_id, a.a_event_id, a.ae, b.b_event_id, b.be,
         ROW_NUMBER() OVER (PARTITION BY a.a_event_id
                            ORDER BY b.be ASC, b.b_event_id ASC) AS rn
  FROM a JOIN b ON a.user_id = b.user_id
               AND b.be > a.ae AND b.be <= a.ae + {EQL_MAXSPAN_S}
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(a_event_id AS BIGINT) AS a_event_id,
       CAST(b_event_id AS BIGINT) AS b_event_id,
       CAST(be - ae AS BIGINT) AS span_s
FROM j WHERE rn = 1"""


CM_DEPTH = 4   # hash rows
CM_WIDTH = 64  # counters per row
CM_TOPN = 10


def events_count_min(events: DataFrame) -> DataFrame:
    """Count-min sketch per-user event counts → DF[user_id, n_exact,
    est_cm, overcount]: the streaming heavy-hitters estimator (Cormode &
    Muthukrishnan 2005) evaluated against exact truth on one frame. A
    d×w counter matrix (d=4, w=64) is filled by hashing every event's
    user into one cell per row; est(u) = min over rows of its cell —
    always ≥ the exact count (one-sided error ≤ εN with ε=e/w at the
    published depth), surfaced as ``overcount`` and pinned as an
    invariant in tests. Output = the top-10 users by EXACT count (ties
    user_id ASC), their estimates alongside — the shape a production
    heavy-hitters report has.

    Determinism: cell(r, u) = h60('cm<r>|'||u) % w — both engines fill
    bit-identical counters, so the approximate estimate is exact-oracle
    value-checked (the HLL/KMV/Bloom discipline).

    100 TB shape: counters are a (d·w)-row map-combinable aggregate
    (constant size — THE point of a CM sketch); per-user exact counts are
    one group-by; the estimate join touches d rows per REPORTED user
    only. No corpus-sized shuffle beyond the one user group-by that the
    exact report needs anyway."""
    per_user = events.groupBy(
        F.col("user_id").cast("long").alias("user_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_exact"))

    def cell(r):
        from .textpipe import h60

        return F.pmod(
            h60(F.concat(F.lit(f"cm{r}|"), F.col("user_id").cast("string"))),
            F.lit(CM_WIDTH),
        )

    cells = per_user.select(
        "user_id", "n_exact",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), cell(r).alias("c"))
                for r in range(CM_DEPTH)
            ])
        ).alias("rc"),
    ).select("user_id", "n_exact", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    counters = cells.groupBy("r", "c").agg(F.sum("n_exact").alias("cnt"))
    est = (
        cells.join(counters, ["r", "c"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("long").alias("est_cm"), F.max("n_exact").alias("n_exact"))
    )
    top = (
        est.orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(CM_TOPN)
        .select(
            "user_id", "n_exact", "est_cm",
            (F.col("est_cm") - F.col("n_exact")).cast("long").alias("overcount"),
        )
    )
    return top


_CM_CELL_SQL = "('0x' || substring(md5('cm{r}|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % {w}"

COUNT_MIN_SQL = f"""WITH per_user AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
),
cells AS (
  {" UNION ALL ".join(f'''SELECT user_id, n_exact, {r} AS r, {_CM_CELL_SQL.format(r=r, w=CM_WIDTH)} AS c FROM per_user''' for r in range(CM_DEPTH))}
),
counters AS (
  SELECT r, c, SUM(n_exact) AS cnt FROM cells GROUP BY 1, 2
),
est AS (
  SELECT cells.user_id, MAX(cells.n_exact) AS n_exact,
         CAST(MIN(counters.cnt) AS BIGINT) AS est_cm
  FROM cells JOIN counters USING (r, c) GROUP BY 1
)
SELECT user_id, n_exact, est_cm, CAST(est_cm - n_exact AS BIGINT) AS overcount
FROM est ORDER BY n_exact DESC, user_id ASC LIMIT {CM_TOPN}"""


GEO_RING_RADII = (50000, 100000, 150000)  # milli-degrees from GEO_ORIGIN


def events_geo_rings(events: DataFrame) -> DataFrame:
    """ES ``geo_distance`` AGGREGATION (ring buckets around an origin) →
    DF[ring, n_events, n_users]: events bucketed by distance band from
    the pinned origin — the "how far are my users" dashboard agg,
    completing the geo family (grid/tile/bounds/line/sort → rings).

    Distance stays the squared-equirectangular INTEGER of the
    geo_distance entry (pure BIGINT, engine-exact — ES's arc distances
    would route trig through the quantize discipline; the keyed-bucket
    contract is identical); ring edges compare d2 against squared radii,
    half-open [from, to) like ES date_range. One events pass, two-level
    distinct-user reduce."""
    lon0, lat0 = GEO_ORIGIN
    pos = _geo_pos(events)
    d2 = (
        (F.col("lon_mdeg") - lon0) * (F.col("lon_mdeg") - lon0)
        + (F.col("lat_mdeg") - lat0) * (F.col("lat_mdeg") - lat0)
    ).cast("long")
    r1, r2, r3 = (r * r for r in GEO_RING_RADII)
    ring = (
        F.when(d2 < r1, F.lit("ring_0"))
        .when(d2 < r2, F.lit("ring_1"))
        .when(d2 < r3, F.lit("ring_2"))
        .otherwise(F.lit("ring_3"))
    )
    tagged = pos.select(
        ring.alias("ring"), F.col("user_id").cast("long").alias("user_id")
    )
    per_user = tagged.groupBy("ring", "user_id").agg(F.count(F.lit(1)).alias("n"))
    return per_user.groupBy("ring").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )


def _geo_rings_sql() -> str:
    lon0, lat0 = GEO_ORIGIN
    r1, r2, r3 = (r * r for r in GEO_RING_RADII)
    return f"""WITH {GEO_POS_SQL},
tagged AS (
  SELECT CASE WHEN d2 < {r1} THEN 'ring_0'
              WHEN d2 < {r2} THEN 'ring_1'
              WHEN d2 < {r3} THEN 'ring_2'
              ELSE 'ring_3' END AS ring,
         user_id
  FROM (
    SELECT user_id,
           CAST((lon_mdeg - {lon0}) * (lon_mdeg - {lon0})
                + (lat_mdeg - {lat0}) * (lat_mdeg - {lat0}) AS BIGINT) AS d2
    FROM pos)
)
SELECT ring, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM tagged GROUP BY 1"""



# ----------------------------------------------------- round-4 session-10
# ES moving_fn presets (MovingFunctions.ewma / linearWeightedAvg) made
# exact. With alpha = 1/2 the EWMA recurrence over a w-bucket window
# unrolls to dyadic-rational coefficients (sixteenths at w=5), and the
# linear weights are integers over m(m+1)/2 — so BOTH presets are one
# integer dot product + ONE double division, engine-identical with no
# per-step float state.

MOVING_FN_WINDOW = 5


def events_moving_fn(events: DataFrame) -> DataFrame:
    """ES ``moving_fn`` over the daily per-type series → DF[day,
    event_type, n_events, ewma, lwma]: the two classic presets on a
    trailing 5-bucket window of existing buckets (ES slides over the
    histogram's buckets; this series has no empty days by construction
    at every SF).

    ewma is MovingFunctions.ewma with alpha = 1/2: the oldest value
    seeds, each newer value averages in — unrolled, bucket t-i carries
    coefficient 2^-(i+1) (the two oldest share the tail), so
    16·ewma is an exact integer at w = 5. lwma is linearWeightedAvg:
    weight m-i over m(m+1)/2. Both reduce to a CASE on the observed
    window size m, integer numerators, and one round6 double division —
    the discipline every order-dependent ES float fold gets here.

    Scale: one partial-aggregated daily rollup shuffle, then per-type
    windows over narrow (day, long) rows; lag/row_number reuse ONE sort
    within the partition; no global order anywhere."""
    from .stats import round6

    daily = events.groupBy(
        F.floor(F.col("ts").cast("timestamp").cast("long") / 86400)
        .cast("long")
        .alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    v = [F.coalesce(F.lag("n_events", i).over(w), F.lit(0)).cast("long")
         for i in range(MOVING_FN_WINDOW)]
    m = F.least(F.row_number().over(w), F.lit(MOVING_FN_WINDOW))
    ewma_n = (
        F.when(m == 1, v[0])
        .when(m == 2, v[0] + v[1])
        .when(m == 3, 2 * v[0] + v[1] + v[2])
        .when(m == 4, 4 * v[0] + 2 * v[1] + v[2] + v[3])
        .otherwise(8 * v[0] + 4 * v[1] + 2 * v[2] + v[3] + v[4])
    )
    ewma_d = (
        F.when(m == 1, 1).when(m == 2, 2).when(m == 3, 4).when(m == 4, 8)
        .otherwise(16)
    )
    lwma_n = (
        F.when(m == 1, v[0])
        .when(m == 2, 2 * v[0] + v[1])
        .when(m == 3, 3 * v[0] + 2 * v[1] + v[2])
        .when(m == 4, 4 * v[0] + 3 * v[1] + 2 * v[2] + v[3])
        .otherwise(5 * v[0] + 4 * v[1] + 3 * v[2] + 2 * v[3] + v[4])
    )
    lwma_d = (
        F.when(m == 1, 1).when(m == 2, 3).when(m == 3, 6).when(m == 4, 10)
        .otherwise(15)
    )
    return daily.select(
        "day",
        "event_type",
        "n_events",
        round6(ewma_n.cast("double") / ewma_d.cast("double")).alias("ewma"),
        round6(lwma_n.cast("double") / lwma_d.cast("double")).alias("lwma"),
    )


MOVING_FN_SQL = """
WITH daily AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400.0) AS BIGINT) AS day,
         event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT day, event_type, n_events,
         LEAST(ROW_NUMBER() OVER w, 5) AS m,
         COALESCE(LAG(n_events, 1) OVER w, 0) AS v1,
         COALESCE(LAG(n_events, 2) OVER w, 0) AS v2,
         COALESCE(LAG(n_events, 3) OVER w, 0) AS v3,
         COALESCE(LAG(n_events, 4) OVER w, 0) AS v4
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT day, event_type, n_events,
       CAST(ROUND(CAST(
         CAST(CASE m WHEN 1 THEN n_events
                     WHEN 2 THEN n_events + v1
                     WHEN 3 THEN 2 * n_events + v1 + v2
                     WHEN 4 THEN 4 * n_events + 2 * v1 + v2 + v3
                     ELSE 8 * n_events + 4 * v1 + 2 * v2 + v3 + v4 END AS DOUBLE)
         / CAST(CASE m WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4
                       WHEN 4 THEN 8 ELSE 16 END AS DOUBLE)
       AS DECIMAL(28,9)), 6) AS DOUBLE) AS ewma,
       CAST(ROUND(CAST(
         CAST(CASE m WHEN 1 THEN n_events
                     WHEN 2 THEN 2 * n_events + v1
                     WHEN 3 THEN 3 * n_events + 2 * v1 + v2
                     WHEN 4 THEN 4 * n_events + 3 * v1 + 2 * v2 + v3
                     ELSE 5 * n_events + 4 * v1 + 3 * v2 + 2 * v3 + v4 END AS DOUBLE)
         / CAST(CASE m WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 6
                       WHEN 4 THEN 10 ELSE 15 END AS DOUBLE)
       AS DECIMAL(28,9)), 6) AS DOUBLE) AS lwma
FROM lagged"""
