"""Headline benchmark — driver contract (run per-round → BENCH_r{N}.json).

Runs the engine's headline operations at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints
ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>, ...extras}

Headline set (each is a full job, timed to action completion):

* ``index_build``        — documents → compressed posting segments + dictionary
                           (tokenize, explode, tf agg, salted repartition,
                           block encode, bucket layout write)
* ``bm25_topk_logical``  — pure-DataFrame BM25 top-10, full reference query set
* ``daat_topk_wand``     — physical path: pruned segment scan, DAAT + block-max
                           WAND + bounded heap
* training-data pipeline ops (dedup / ANN / text analysis) when present —
  registered in ``_PIPELINE_BENCHES`` below.

Scaling-efficiency evidence (north rule N→4N) is produced by
``jobs/bench_scaling.py``, which runs THIS module's index_build at two
parallelism levels 4× apart (default local[1] vs local[4] — see
BASELINE.md §scaling protocol) and appends to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: Task slots actually used. Each slot here drives a JVM task thread PLUS an
#: Arrow Python worker concurrently, and this host's 32 vCPUs are 16 physical
#: cores + SMT — local[32] oversubscribes and measures SLOWER than local[16]
#: (see CLAUDE.md / BENCH/BASELINE.md). Cap at 16; both numbers are reported.
SLOTS = min(CPUS, 16)
#: Deterministic input replication (scaling runs only): MULT copies of the
#: documents table with doc_ids offset into disjoint ranges. The two-level
#: scaling job needs enough compute that fixed costs don't dominate; both
#: levels see the identical replicated input.
MULT = int(os.environ.get("SPARK_GRAFT_MULT", "1"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    # Size the (local-mode) heap for the task-thread count before the JVM
    # starts; a 32-thread local JVM in the default 8g thrashes GC.
    os.environ.setdefault("SPARKSEARCH_DRIVER_MEM", "48g")
    from sparksearch.session import get_spark

    spark = get_spark(
        app_name="sparksearch-bench",
        master=f"local[{SLOTS}]",
        shuffle_partitions=max(SLOTS, 8),
    )

    # Warm the Python-UDF worker pool across all task slots BEFORE any timed
    # window: a cold pool pays ~0.5s/worker of simultaneous numpy/pandas
    # imports (measured: 18s cold vs 2.5s warm for the encode stage at
    # local[32]). A long-running cluster's executors are warm; the protocol
    # (BENCH/BASELINE.md) excludes session startup from throughput windows,
    # and the warmup is identical at every parallelism level.
    def _noop(it):
        import numpy  # noqa: F401
        import pandas as _pd  # noqa: F401

        yield from it

    spark.range(SLOTS * 4, numPartitions=SLOTS * 2).mapInPandas(
        _noop, "id long"
    ).count()
    from sparksearch import queries_catalog
    from sparksearch.build import build_index
    from sparksearch.daat import daat_topk
    from sparksearch.querying import bm25_topk_from_docs

    from pyspark.sql import functions as F

    # The fixture is ONE parquet file → one input split, which would cap every
    # map stage at 1 task regardless of cores. A production corpus arrives as
    # thousands of files/Iceberg splits; emulate that with a deterministic
    # hash repartition of the raw rows BEFORE any replication/tokenize work,
    # so the heavy map side actually fans out.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs.repartition(max(SLOTS * 2, 16), "doc_id")
    if MULT > 1:
        offset = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        docs = (
            docs.select(
                "*", F.explode(F.array(*[F.lit(i) for i in range(MULT)])).alias("rep")
            )
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(offset))
            .drop("rep")
        )
    n_docs = docs.count()  # warm the session + file listing outside the window
    ref_queries = queries_catalog.reference_queries()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {"n_docs": float(n_docs), "mult": float(MULT)}

    index_path = f"/tmp/sparksearch_bench_index_{CPUS}"

    # Layout params are FIXED across parallelism levels so the built index is
    # byte-identical at every level — only task parallelism varies.
    #
    # Repetition policy: best-of-N per operation (SPARK_GRAFT_BUILD_REPS
    # builds, default 3; SPARK_GRAFT_QUERY_REPS per query, default 3), with
    # the reps INTERLEAVED round-robin across the whole headline set rather
    # than run back-to-back. Rationale: the first run of a plan pays one-time
    # janino codegen + broadcast-job setup a continuously-serving cluster pays
    # once per deployment, and this co-tenant VM's noise comes in SUSTAINED
    # multi-minute windows (measured: 4× swings between whole invocations on
    # identical code, and best-of-3 CONSECUTIVE reps still recorded 16.9s for
    # a 1.8s query). Spreading each operation's samples across the full bench
    # duration means a bad window taxes every operation's worst sample, not
    # any operation's best. Same policy at every parallelism level.
    reps = max(int(os.environ.get("SPARK_GRAFT_BUILD_REPS", "3")), 1)
    qreps = max(int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3")), 1)

    build_stats: dict = {}

    def _build() -> None:
        build_stats["stats"] = build_index(
            spark, docs, index_path, n_buckets=32, n_ranges=32
        )

    ops: list[tuple[str, int, object]] = [("index_build", reps, _build)]

    if not os.environ.get("SPARK_GRAFT_BUILD_ONLY"):
        ops.append((
            "bm25_topk_logical", qreps,
            lambda: bm25_topk_from_docs(spark, docs, ref_queries, k=10).collect(),
        ))
        ops.append((
            "daat_topk_wand", qreps,
            lambda: daat_topk(
                spark, index_path, ref_queries, k=10, wand=True
            ).collect(),
        ))

    # Training-data pipeline headliners — any catalog entry named here that
    # exists runs against the same sf dir (they self-contain their inputs).
    # SPARK_GRAFT_SKIP_PIPELINE=1 (scaling runs) times only the build+query
    # core so the two-level comparison isn't diluted by fixed-size stages.
    pipeline_names = () if os.environ.get("SPARK_GRAFT_SKIP_PIPELINE") else (
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_cosine_topk",
        "text_quality",
        "phrase_topk_indexed",
        "tpch_revenue_by_nation",
        # round-4 session-3 family representative: content-defined chunking
        # (map-side only — benches the pure-codegen path at corpus scale)
        "cdc_chunks",
    )
    for name in pipeline_names:
        spec = queries_catalog.CATALOG.get(name)
        if spec is None:
            continue
        ops.append((
            name, qreps, lambda spec=spec: spec.fn(spark, SF_DIR).collect()
        ))

    for rnd in range(max(reps, qreps)):
        for name, n_reps, fn in ops:
            if rnd >= n_reps:
                continue
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            timings[name] = min(timings.get(name, float("inf")), dt)

    extras["docs_per_sec"] = n_docs / timings["index_build"]
    extras["n_postings"] = float(
        spark.read.parquet(f"{index_path}/segments").agg({"n": "sum"}).collect()[0][0]
    )
    extras["postings_per_sec"] = extras["n_postings"] / timings["index_build"]
    extras["avgdl"] = float(build_stats["stats"]["avgdl"])

    result = {
        "metric": "headline_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        "slots": SLOTS,
        **{k: round(v, 3) for k, v in extras.items()},
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
