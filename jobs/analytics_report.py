"""Product-analytics report job (spark-submit entry point): the event
analytics family as ONE submitted application —

    funnel (ordered conversion) + weekly cohort retention + RFM
    segmentation + hourly trend (pipeline aggs) + sessionization
    → one parquet output per report + a JSON executive summary

Every report is the library operator the catalog checks one-by-one
(relational.events_funnel / cohort_retention / user_rfm / events_trend /
sessionize); this job is the composition a daily product-analytics run
submits:

    spark-submit --py-files sparksearch.zip jobs/analytics_report.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/analytics

Determinism: every report ranks/buckets on the engine total order
(round6 metrics, id tiebreaks) — resubmits and cluster-size changes
produce byte-identical reports (repo invariant #1).

Scale shape: ONE events read feeds all five reports; funnel/cohort/
session/RFM each shuffle once on user_id (the natural analytics key,
bounded per-key activity), trend shuffles once on the hour bucket. No
report ever sorts globally except the k-row RFM quintile windows, whose
production variant (broadcast sample-quantile thresholds) is documented
on the operator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def report(spark, sf_dir: str, out_dir: str) -> dict:
    from sparksearch.catalog_s12 import events_counter_rate
    from sparksearch.relational import (
        cohort_retention,
        events_funnel,
        events_trend,
        sessionize,
        user_rfm,
    )

    events = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    reports = {
        "funnel": events_funnel(events),
        "cohorts": cohort_retention(events),
        "rfm": user_rfm(events),
        "trend": events_trend(events),
        "sessions": sessionize(events),
        # round-5: the TSDB view — reset-aware per-user counter rates
        "counter_rates": events_counter_rate(events),
    }
    paths = {}
    for name, df in reports.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        paths[name] = path

    funnel = {
        r.step_name: (r.n_users, r.frac_top)
        for r in spark.read.parquet(paths["funnel"]).collect()
    }
    rfm = spark.read.parquet(paths["rfm"])
    champions = rfm.filter(
        (F.col("r_q") == 1) & (F.col("f_q") == 1) & (F.col("m_q") == 1)
    ).count()
    sess = spark.read.parquet(paths["sessions"]).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    ).collect()[0]
    coh = spark.read.parquet(paths["cohorts"])
    week1 = {
        r.cohort_week: r.retention
        for r in coh.filter(F.col("week_offset") == 1).collect()
    }
    cr = spark.read.parquet(paths["counter_rates"]).agg(
        F.sum("n_resets").alias("resets"),
        F.sum("increase_e2").alias("inc"),
    ).collect()[0]
    return {
        "n_events": int(sess.n_events),
        "n_users": rfm.count(),
        "n_sessions": int(sess.n_sessions),
        "counter_resets": int(cr.resets),
        "counter_increase_e2": int(cr.inc),
        "funnel": {k: [int(n), f] for k, (n, f) in sorted(funnel.items())},
        "rfm_champions": champions,
        "week1_retention_by_cohort": {
            str(k): v for k, v in sorted(week1.items())
        },
        "reports": paths,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/analytics")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from sparksearch.session import get_spark

    spark = get_spark("analytics-report", master=args.master or "local[8]")
    t0 = time.time()
    summary = report(spark, args.sf_dir, args.out)
    summary["wall_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
