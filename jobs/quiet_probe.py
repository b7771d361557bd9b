"""Host-quietness probe for scaling attempts: measures pure-CPU burn
throughput at taskset-pinned 2 and 8 workers (the same cores the scaling
bench will use) and prints the burn efficiency E_burn = (thr8/thr2)/4.

The six round-3 2->8 scaling attempts (BENCH/BASELINE.md) improved
monotonically with window quietness; this probe makes the gate explicit:
only start jobs/bench_scaling.py when E_burn is near its ceiling (>= 0.85
observed on quiet windows), otherwise the wide level is pre-taxed by
co-tenant memory-bandwidth pressure and the engine measurement is wasted.

    python jobs/quiet_probe.py [--seconds 6]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _burn(q, seconds):
    # integer-mix loop: exercises ALU + L1 the way varint encode does
    t_end = time.perf_counter() + seconds
    x, n = 0x9E3779B97F4A7C15, 0
    while time.perf_counter() < t_end:
        for _ in range(10000):
            x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        n += 10000
    q.put(n)


def _stream(q, seconds):
    # memory-bandwidth stream: the contention that actually taxes the wide
    # level is DRAM bandwidth (BENCH/BASELINE.md round-3 interpretation);
    # copy a cache-busting array and count bytes moved.
    import numpy as np

    a = np.ones(8 << 20, dtype=np.float64)  # 64 MiB >> LLC share
    b = np.empty_like(a)
    t_end = time.perf_counter() + seconds
    n = 0
    while time.perf_counter() < t_end:
        np.copyto(b, a)
        n += a.nbytes * 2
    q.put(n)


def level(workers: int, seconds: float, fn=_burn) -> float:
    os.sched_setaffinity(0, set(range(workers)))
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, seconds)) for _ in range(workers)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    os.sched_setaffinity(0, set(range(os.cpu_count())))
    return total / seconds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    t2 = level(2, args.seconds)
    t8 = level(8, args.seconds)
    e = (t8 / t2) / 4
    m2 = level(2, args.seconds, _stream)
    m8 = level(8, args.seconds, _stream)
    em = (m8 / m2) / 4
    print(json.dumps({
        "thr2": round(t2), "thr8": round(t8), "e_burn": round(e, 4),
        "gbs2": round(m2 / 1e9, 2), "gbs8": round(m8 / 1e9, 2),
        "e_mem": round(em, 4),
        "quiet": e >= 0.85 and em >= 0.6,
    }))


if __name__ == "__main__":
    main()
