"""Supplementary query-side scaling evidence (BENCH/BASELINE.md tail).

The north rule's scaling criterion is INDEXING throughput
(jobs/bench_scaling.py); this job measures the query path's scaling for
completeness: DAAT + block-max WAND over a replicated index, same pinned
two-level protocol (taskset quota per level — the cgroup-executor analog;
Python UDF workers escape local[N]'s thread cap otherwise, see CLAUDE.md).

Protocol: ONE index is built unpinned at MULT×sf0.1 (the index is identical
regardless of parallelism — determinism invariant), then each level runs the
full 20-query reference set best-of-R in a fresh pinned subprocess.

    python jobs/bench_daat_scaling.py [--mult 160] [--base-cpus 2] [--scale 4]

Appends a supplementary row to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEVEL_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from sparksearch.session import get_spark
from sparksearch import queries_catalog
from sparksearch.daat import daat_topk

spark = get_spark("daat-scale", master="local[{cpus}]",
                  shuffle_partitions=max({cpus}, 8))

def _noop(it):
    import numpy, pandas  # noqa: F401
    yield from it

spark.range({cpus} * 4, numPartitions={cpus} * 2).mapInPandas(_noop, "id long").count()
qs = queries_catalog.reference_queries()
daat_topk(spark, {index!r}, qs, k=10, wand=True).collect()  # warm plan/codegen
best = float("inf")
for _ in range({reps}):
    t0 = time.perf_counter()
    n = daat_topk(spark, {index!r}, qs, k=10, wand=True).count()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"cpus": {cpus}, "secs": best, "rows": n}}))
spark.stop()
"""


def run_level(cpus: int, index: str, reps: int) -> dict:
    code = _LEVEL_SNIPPET.format(repo=REPO, cpus=cpus, index=index, reps=reps)
    cmd = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--mult", type=int, default=160)
    p.add_argument("--base-cpus", type=int, default=2)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--repeat", type=int, default=2, help="pinned runs per level")
    p.add_argument("--reps", type=int, default=3, help="in-session best-of reps")
    args = p.parse_args()

    index = f"/tmp/sparksearch_daat_scale_idx_m{args.mult}"
    if not os.path.exists(os.path.join(index, "stats.json")):
        # Build ONCE, unpinned (deterministic output — parallelism-independent).
        env = dict(os.environ, SPARK_GRAFT_MULT=str(args.mult),
                   SPARK_GRAFT_SF_DIR=args.sf_dir)
        code = (
            "import os, sys; sys.path.insert(0, %r)\n"
            "from sparksearch.session import get_spark\n"
            "from sparksearch.build import build_index\n"
            "from pyspark.sql import functions as F\n"
            "spark = get_spark('daat-scale-build', master='local[16]')\n"
            "docs = spark.read.parquet(%r + '/documents.parquet')\n"
            "docs = docs.repartition(32, 'doc_id')\n"
            "m = int(os.environ['SPARK_GRAFT_MULT'])\n"
            "if m > 1:\n"
            "    off = docs.agg(F.max('doc_id')).collect()[0][0] + 1\n"
            "    docs = (docs.select('*', F.explode(F.array(*[F.lit(i) for i in range(m)])).alias('rep'))\n"
            "            .withColumn('doc_id', F.col('doc_id') + F.col('rep') * F.lit(off)).drop('rep'))\n"
            "build_index(spark, docs, %r, n_buckets=32, n_ranges=32)\n"
            "spark.stop()\n"
        ) % (REPO, args.sf_dir, index)
        subprocess.run([sys.executable, "-c", code], env=env, check=True)

    lo = run_level(args.base_cpus, index, args.reps)
    hi = run_level(args.base_cpus * args.scale, index, args.reps)
    for _ in range(args.repeat - 1):
        r = run_level(args.base_cpus, index, args.reps)
        lo = min(lo, r, key=lambda x: x["secs"])
        r = run_level(args.base_cpus * args.scale, index, args.reps)
        hi = min(hi, r, key=lambda x: x["secs"])
    eff = (lo["secs"] / hi["secs"]) / args.scale
    result = {
        "metric": "daat_query_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "mult": args.mult,
        "base": lo,
        "scaled": hi,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\nSupplementary query-side row (jobs/bench_daat_scaling.py, "
            f"mult={args.mult}, pinned, best-of-{args.repeat}×{args.reps}): "
            f"local[{lo['cpus']}] {lo['secs']:.1f}s → local[{hi['cpus']}] "
            f"{hi['secs']:.1f}s, E = {eff:.4f} "
            f"({'PASS' if eff >= 0.8 else 'below target'}).\n"
        )


if __name__ == "__main__":
    main()
