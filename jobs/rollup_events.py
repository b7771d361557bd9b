"""Downsampling / rollup job (spark-submit entry point): materialize the
HOURLY rollup of the events stream and serve coarser-grain reports FROM it
— the ES rollup-job + rollup-search pair (and the TSDB downsampling
contract) as ONE submitted application:

    spark-submit --py-files sparksearch.zip jobs/rollup_events.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/rollup

Writes the hourly artifact, answers the monthly report from it, and
SELF-VERIFIES the rollup guarantee (rollup-served == raw-served, row for
row) before printing a JSON summary. The guarantee is exact, not
approximate, because counts are integers and value sums are exact
decimals end-to-end (relational.build_events_rollup) — re-aggregating
hourly sums to months is bit-equal to aggregating raw rows.

Scale shape: the raw events are read ONCE (the rollup build's group-by);
every report after that touches only the hours-sized artifact. At 100 TB
this is the difference between a dashboard query scanning 100 TB and one
scanning the ~10^5-row downsample. Determinism: resubmits are
byte-identical (repo invariant #1)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, out_dir: str) -> dict:
    from sparksearch.relational import (
        build_events_rollup,
        events_rollup_monthly,
    )
    from sparksearch.stats import round6

    events = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    rollup_path = os.path.join(out_dir, "hourly.parquet")
    build_events_rollup(events, rollup_path)

    monthly = events_rollup_monthly(spark, rollup_path)
    monthly_path = os.path.join(out_dir, "monthly.parquet")
    monthly.write.mode("overwrite").parquet(monthly_path)

    # self-verify the rollup guarantee: rollup-served == raw-served
    raw = (
        events.groupBy(
            F.date_format("ts", "yyyy-MM").alias("month"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(30,2)")
            .alias("sum_value"),
        )
        .select(
            "month", "event_type", "n_events",
            (F.col("sum_value") * 100).cast("long").alias("sum_value_e2"),
            round6(
                F.col("sum_value").cast("double") / F.col("n_events").cast("double")
            ).alias("avg_value"),
        )
    )
    served = spark.read.parquet(monthly_path)
    mismatches = (
        served.unionByName(raw).groupBy(served.columns).count()
        .filter(F.col("count") != 2)
        .count()
    )
    r = spark.read.parquet(rollup_path)
    return {
        "rollup_rows": r.count(),
        "raw_rows": events.count(),
        "monthly_rows": served.count(),
        "rollup_equals_raw": mismatches == 0,
        "artifacts": {"hourly": rollup_path, "monthly": monthly_path},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/rollup")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from sparksearch.session import get_spark

    spark = get_spark("rollup-events", master=args.master or "local[8]")
    t0 = time.time()
    summary = run(spark, args.sf_dir, args.out)
    summary["wall_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))
    if not summary["rollup_equals_raw"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
