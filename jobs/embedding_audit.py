"""Embedding-space audit job (spark-submit entry point): the vector-quality
family as ONE submitted application —

    kth-NN outlier ranking + Lloyd-cluster semantic dedup (semdedup) +
    LSH-vs-exact ANN recall measurement + exact near-dup pairs
    → one parquet output per audit + a JSON executive summary

Every audit is the library operator the catalog checks one-by-one
(vectors.embedding_outliers / semdedup / lsh_ann_topk vs cosine_topk /
embedding_neardup_pairs); this job is the composition a training pipeline
submits before trusting a new embedding table:

    spark-submit --py-files sparksearch.zip jobs/embedding_audit.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/embaudit

Determinism: every ranking is on the engine total order (round6 cosines,
id tiebreaks), LSH planes and Lloyd seeds are h60-derived — resubmits
produce byte-identical audits (repo invariant #1).

Scale shape: outliers/neardup run LSH/IVF-bucketed candidate generation in
their production form (the exact quadratic runs only on the bounded audit
sample); recall is measured on the fixed query panel (|Q|·k rows). The
summary collects only counts and the recall scalar — no data-path
collect()s beyond the report itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def audit(spark, sf_dir: str, out_dir: str) -> dict:
    from sparksearch.vectors import (
        cosine_topk,
        embedding_neardup_pairs,
        embedding_outliers,
        lsh_ann_topk,
        semdedup,
    )

    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    audits = {
        "outliers": embedding_outliers(emb),
        "semdedup": semdedup(emb),
        "neardup_pairs": embedding_neardup_pairs(emb),
        "ann_lsh": lsh_ann_topk(emb),
        "ann_exact": cosine_topk(emb),
    }
    paths = {}
    for name, df in audits.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        paths[name] = path

    # LSH recall vs the exact scan: |approx ∩ exact| / |exact| over the
    # shared (query_id, vec_id) panel — the audit number that gates an
    # ANN rollout.
    exact = spark.read.parquet(paths["ann_exact"]).select("query_id", "vec_id")
    approx = spark.read.parquet(paths["ann_lsh"]).select("query_id", "vec_id")
    n_exact = exact.count()
    n_hit = exact.join(approx, ["query_id", "vec_id"]).count()

    outl = spark.read.parquet(paths["outliers"])
    top_outlier = outl.orderBy("rank").limit(1).collect()[0]
    nd = spark.read.parquet(paths["neardup_pairs"]).count()
    sd = spark.read.parquet(paths["semdedup"])
    return {
        "n_vectors": emb.count(),
        "ann_recall_vs_exact": round(n_hit / n_exact, 6) if n_exact else None,
        "ann_panel_size": n_exact,
        "top_outlier": {
            "vec_id": int(top_outlier.vec_id),
            "knn_dist": float(top_outlier.knn_dist),
        },
        "neardup_pairs": nd,
        "semdedup_dropped": sd.filter(F.col("keep") == 0).count(),
        "semdedup_kept": sd.filter(F.col("keep") == 1).count(),
        "audits": paths,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/embaudit")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from sparksearch.session import get_spark

    spark = get_spark("embedding-audit", master=args.master or "local[8]")
    t0 = time.time()
    summary = audit(spark, args.sf_dir, args.out)
    summary["wall_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
