"""End-to-end corpus curation job (spark-submit entry point): the
training-data gauntlet as ONE submitted application —

    gate (Gopher rules) → exact-dedup survivors → line-boilerplate report
    → deterministic splits → curated manifest parquet + JSON summary

Every stage is the library operator the catalog checks one-by-one
(textpipe.gopher_rules / exact_dedup / line_boilerplate,
sampling.split_name_col); this job is the composition a 100 TB pretraining
build submits:

    spark-submit --py-files sparksearch.zip jobs/curate_corpus.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated

Determinism: every stage derives from data (h60/sha256) — resubmits and
cluster-size changes produce byte-identical manifests (repo invariant #1).

Scale shape: gate is exchange-free (plan-asserted in tests); the dedup
shuffle keys on uniform content hashes and moves only gate-passing rows;
the boilerplate join is key-partitioned on uniform line hashes; split
assignment is map-side. One corpus read feeds the gate+hash projection.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    from sparksearch.sampling import split_name_col
    from sparksearch.textpipe import gopher_rules, line_boilerplate

    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    gate = gopher_rules(docs).select("doc_id", "n_tokens", "passes")
    hashes = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.sha2(F.col("text"), 256).alias("h"),
        split_name_col().alias("split"),
    )
    gated = hashes.join(gate, "doc_id").filter(F.col("passes") == 1)
    w = Window.partitionBy("h")
    surv = gated.withColumn("keep_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keep_id")
    )
    boiler = line_boilerplate(docs).select("doc_id", "boiler_frac")
    manifest = (
        surv.join(boiler, "doc_id", "left")
        .select(
            "doc_id", "lang", "split", "n_tokens",
            F.coalesce("boiler_frac", F.lit(0.0)).alias("boiler_frac"),
        )
    )
    path = os.path.join(out_dir, "curated_manifest.parquet")
    manifest.write.mode("overwrite").parquet(path)
    kept = spark.read.parquet(path)
    by = {
        (r.split, r.lang): (r.n_docs, r.n_tokens)
        for r in kept.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    return {
        "input_docs": docs.count(),
        "kept_docs": kept.count(),
        "kept_tokens": sum(v[1] for v in by.values()),
        "by_split_lang": {f"{s}/{lg}": list(v) for (s, lg), v in sorted(by.items())},
        "manifest": path,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/curated")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from sparksearch.session import get_spark

    spark = get_spark("curate-corpus", master=args.master or "local[8]")
    t0 = time.time()
    summary = curate(spark, args.sf_dir, args.out)
    summary["wall_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
