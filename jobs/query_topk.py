"""spark-submit entry point: top-k BM25 retrieval over a built index.

    spark-submit --master <cluster> --py-files sparksearch.zip \\
        jobs/query_topk.py --index <index> --queries tests/queries.json \\
        --k 10 [--no-wand] [--output <dir>]

Prints one JSON line per query rank row (or writes parquet with --output).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True, help="JSON file: {queries: [{id, text}]}")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--no-wand", action="store_true")
    p.add_argument("--output", default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from sparksearch.daat import daat_topk
    from sparksearch.session import get_spark

    with open(args.queries) as f:
        qs = [(q["id"], q["text"]) for q in json.load(f)["queries"]]

    spark = get_spark("sparksearch-query", master=args.master)
    result = daat_topk(spark, args.index, qs, k=args.k, wand=not args.no_wand)
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
    else:
        for r in result.orderBy("query_id", "rank").collect():
            print(json.dumps({"query_id": r.query_id, "rank": r.rank,
                              "doc_id": r.doc_id, "score": round(r.score, 6)}))
    spark.stop()


if __name__ == "__main__":
    main()
