"""Scaling-efficiency evidence for the north rule (BASELINE.json:14).

The rule requires indexing-throughput scaling efficiency ≥ 0.8 between N and
4N executors. This sandbox has no multi-node cluster, so (per driver
instruction) the same build job runs on the same input at two parallelism
levels 4× apart and we report throughput at both plus E = (Thr_4N / Thr_N)/4.

Level choice — local[2] vs local[8]: the host exposes 32 vCPUs that are 16
physical cores + SMT (a pure-CPU burn measures 8→32 procs at only 2.9× and
4→16 at 3.76×), AND every Spark task slot here drives a JVM thread plus an
Arrow Python worker concurrently, so local[N] consumes up to 2N hardware
threads. local[8] is the largest level whose 16 busy threads still fit the
physical cores; 2→8 is therefore the largest saturation-free 4× pair — the
honest single-host analog of N→4N executors (a real cluster adds whole
machines, not hyperthread siblings or oversubscribed cores).

Noise control: this VM shows co-tenant CPU bursts (single-run build times
vary up to 7× at identical config). Each bench invocation repeats the build
in-session (SPARK_GRAFT_BUILD_REPS, steady-state: warm codegen + worker
pool) and reports the best; the two levels alternate across invocations so
a burst cannot bias one side; the best run per level is kept.

Each level runs in a fresh subprocess (a JVM's master is fixed at startup),
invoking bench.py which times the build window from first tokenize task to
last segment commit — session startup and file-listing warmup excluded.

    python jobs/bench_scaling.py [--sf-dir /root/testdata/sf0.1] [--repeat 2]

Appends a measured row to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str, mult: int, build_reps: int = 3,
              pin: bool = True) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_MULT=str(mult), SPARK_GRAFT_SKIP_PIPELINE="1",
               SPARK_GRAFT_BUILD_ONLY="1", SPARK_GRAFT_BUILD_REPS=str(build_reps))
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    # Pin the whole process tree (JVM task threads + Arrow Python workers +
    # GC) to exactly `cpus` hardware threads. Without this, local[N]'s Python
    # workers run OUTSIDE the N-thread cap, so the low level silently uses
    # ~2N cores and the ratio under-reports true engine scaling. Pinning is
    # the honest single-host analog of a cluster executor's cgroup quota.
    if pin and os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    # bench.py prints exactly one JSON line on stdout.
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--base-cpus", type=int, default=1)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--repeat", type=int, default=2,
                   help="runs per level; best (max throughput) kept — "
                   "guards against one-off JIT/page-cache noise")
    p.add_argument("--mult", type=int, default=160,
                   help="deterministic input replication: the build must be "
                   "compute-bound for the efficiency ratio to measure "
                   "scaling rather than fixed job overhead; both levels "
                   "see the identical replicated input")
    args = p.parse_args()

    # Alternate the levels across repeats so a co-tenant CPU burst cannot
    # bias one level; keep the best (max-throughput) run per level.
    levels: dict[int, dict] = {}
    for rep in range(args.repeat):
        for cpus in (args.base_cpus, args.base_cpus * args.scale):
            r = run_level(cpus, args.sf_dir, args.mult)
            if cpus not in levels or r["docs_per_sec"] > levels[cpus]["docs_per_sec"]:
                levels[cpus] = r
            print(json.dumps({"rep": rep, "cpus": cpus,
                              "docs_per_sec": r["docs_per_sec"],
                              "build_sec": r["queries"]["index_build"]}),
                  file=sys.stderr)

    lo, hi = levels[args.base_cpus], levels[args.base_cpus * args.scale]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / args.scale
    result = {
        "metric": "indexing_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "sf": lo["sf"],
        "n_docs": lo["n_docs"],
        "mult": args.mult,
        "base": {"cpus": args.base_cpus,
                 "docs_per_sec": lo["docs_per_sec"],
                 "postings_per_sec": lo["postings_per_sec"],
                 "build_sec": lo["queries"]["index_build"]},
        "scaled": {"cpus": args.base_cpus * args.scale,
                   "docs_per_sec": hi["docs_per_sec"],
                   "postings_per_sec": hi["postings_per_sec"],
                   "build_sec": hi["queries"]["index_build"]},
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    bench_dir = os.path.join(REPO, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    path = os.path.join(bench_dir, "BASELINE.md")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write(
                "# BENCH/BASELINE.md — measured rows (jobs/bench_scaling.py)\n\n"
                "Single-host proxy for the N→4N-executor rule: same job, same "
                "input, local[N] vs local[4N]; E = (Thr_4N/Thr_N)/4, target ≥ 0.8.\n\n"
                "| date | sf | n_docs | cpus_lo | docs/s lo | postings/s lo | "
                "cpus_hi | docs/s hi | postings/s hi | E | pass |\n"
                "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |\n"
            )
        f.write(
            f"| {datetime.date.today().isoformat()} | {lo['sf']} | {int(lo['n_docs'])} "
            f"| {args.base_cpus} | {lo['docs_per_sec']} | {lo['postings_per_sec']} "
            f"| {args.base_cpus * args.scale} | {hi['docs_per_sec']} | {hi['postings_per_sec']} "
            f"| {round(eff, 4)} | {'YES' if eff >= 0.8 else 'NO'} |\n"
        )


if __name__ == "__main__":
    main()
