"""spark-submit entry point: full index build.

Cluster usage (the north-rule invocation, BASELINE.json:14):

    zip -r sparksearch.zip sparksearch/
    spark-submit --master <cluster> --py-files sparksearch.zip \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        jobs/build_index.py --input <corpus> --output <index> \\
        --n-buckets 4096 --n-units 1024 --resumable

Sandbox usage (local, parquet fixtures):

    python jobs/build_index.py --input /root/testdata/sf0.01 \\
        --output /tmp/idx --master 'local[8]'

The input is either an Iceberg table name (cluster, --format iceberg) or a
directory containing documents.parquet (sandbox). ``--resumable`` routes
through checkpoint.build_resumable (per-unit lineage + metrics + crash-safe
manifest commits); otherwise a single-shot build.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--format", choices=["parquet", "iceberg"], default="parquet")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--n-ranges", type=int, default=None)
    p.add_argument("--n-units", type=int, default=8)
    p.add_argument("--resumable", action="store_true")
    p.add_argument("--verify-sha256", action="store_true",
                   help="assert row-wise sha256(content) integrity vs the source")
    args = p.parse_args()

    from sparksearch.session import get_spark
    from sparksearch.build import build_index
    from sparksearch.checkpoint import build_resumable

    spark = get_spark("sparksearch-build", master=args.master,
                      table_format=args.format)
    if args.format == "iceberg":
        docs = spark.read.format("iceberg").load(args.input)
    else:
        docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))

    n_docs = docs.count()  # warm file listing; excluded from throughput window
    t0 = time.perf_counter()
    if args.resumable:
        stats = build_resumable(
            spark, docs, args.output, n_units=args.n_units,
            n_buckets=args.n_buckets, n_ranges=args.n_ranges,
        )
    else:
        stats = build_index(
            spark, docs, args.output,
            n_buckets=args.n_buckets, n_ranges=args.n_ranges,
        )
    secs = time.perf_counter() - t0

    if args.verify_sha256:
        # Row-wise integrity gate: re-read the source and diff hashes (on a
        # cluster, `ref` is the upstream table's recorded sha256 column).
        from pyspark.sql import functions as F

        from sparksearch.ids import content_sha256, sha256_mismatches

        reread = (
            spark.read.format("iceberg").load(args.input)
            if args.format == "iceberg"
            else spark.read.parquet(os.path.join(args.input, "documents.parquet"))
        )
        ref = content_sha256(reread, "text").select(
            "doc_id", F.col("content_sha256").alias("sha256")
        )
        bad = sha256_mismatches(docs, ref, content_col="text").count()
        assert bad == 0, f"{bad} sha256 mismatches"

    out = {"n_docs": n_docs, "build_secs": round(secs, 3),
           "docs_per_sec": round(n_docs / secs, 3), **stats}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
