"""Search-quality report job (spark-submit entry point): the retrieval-
and-filter evaluation family as ONE submitted application —

    BM25@10 run → _rank_eval metrics (precision/recall/MRR/nDCG@10)
    + expected reciprocal rank (graded cascade metric)
    + quality-score ROC-AUC vs the Gopher gate
    + quality-score calibration (reliability bins / ECE)
    → one parquet output per audit + a JSON executive summary

Every audit is a library operator the catalog checks one-by-one
(evaluate.ranking_eval / catalog_s11b.q_err_rank_eval / the quality_auc
and quality_ece entries); this job is the composition a search team
submits after an index or scorer change:

    spark-submit --py-files sparksearch.zip jobs/search_quality_report.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/sqreport

Determinism: every ranking is on the engine total order, judgments and
grades are h60-derived, metric floats are round6-quantized — resubmits
produce byte-identical reports (repo invariant #1).

Scale shape: the run and qrels are (query_id, doc_id)-keyed joins with
the tiny query side broadcast; AUC is the exact rank-sum over distinct
scores; the summary means are python-side folds over one row per query /
bin (≤ dozens of rows) — no data-path collect()s beyond the report.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def report(spark, sf_dir: str, out_dir: str) -> dict:
    from sparksearch.catalog_s11 import q_quality_ece
    from sparksearch.catalog_s11b import q_err_rank_eval
    from sparksearch.queries_catalog import q_quality_auc
    from sparksearch.catalog_pipeline import q_ranking_eval

    audits = {
        "rank_eval": q_ranking_eval(spark, sf_dir),
        "err": q_err_rank_eval(spark, sf_dir),
        "quality_auc": q_quality_auc(spark, sf_dir),
        "quality_ece": q_quality_ece(spark, sf_dir),
    }
    paths = {}
    for name, df in audits.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        paths[name] = path

    re_rows = spark.read.parquet(paths["rank_eval"]).collect()
    err_rows = spark.read.parquet(paths["err"]).collect()
    ece_rows = spark.read.parquet(paths["quality_ece"]).collect()
    auc_row = spark.read.parquet(paths["quality_auc"]).collect()[0]

    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:
        # the repo's quantize discipline (decimal HALF_UP), NOT python
        # round() which is HALF-EVEN — the documented 6-dp-grid hazard
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def mean6(vals):
        vals = [v for v in vals if v is not None]
        return r6(sum(vals) / len(vals)) if vals else None

    n_docs = sum(r.n for r in ece_rows)
    # ECE = Σ (n_bin / N) · |rate − mean_score| over the reliability bins.
    ece = r6(sum(r.n * r.gap for r in ece_rows) / n_docs) if n_docs else None
    return {
        "n_queries": len(re_rows),
        "mean_precision_at_10": mean6([r.precision_at_k for r in re_rows]),
        "mean_recall_at_10": mean6([r.recall_at_k for r in re_rows]),
        "mean_mrr": mean6([r.mrr for r in re_rows]),
        "mean_ndcg_at_10": mean6([r.ndcg_at_k for r in re_rows]),
        "mean_err_at_10": mean6([r.err_at_10 for r in err_rows]),
        "quality_auc": float(auc_row.auc),
        "quality_ece": ece,
        "calibration_bins": len(ece_rows),
        "audits": paths,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/sqreport")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from sparksearch.session import get_spark

    spark = get_spark("search-quality-report", master=args.master or "local[8]")
    t0 = time.time()
    summary = report(spark, args.sf_dir, args.out)
    summary["wall_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
