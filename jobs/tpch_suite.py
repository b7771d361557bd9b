"""TPC-H decision-support suite (spark-submit entry point): all 22 query
shapes as ONE submitted application —

    spark-submit --py-files sparksearch.zip jobs/tpch_suite.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/tpch

Every query is the library operator the catalog oracle-checks one-by-one
(sparksearch.joins; the six fixture-schema adaptations are documented on
their operator docstrings). The job materializes each result to parquet
and prints a JSON summary with per-query row counts and a value
fingerprint (md5 over the %.6f-formatted sorted rows), so resubmits and
cluster-size changes can be diffed in one line; oracle equivalence is
the catalog's DuckDB comparison, not this hash.

Determinism: every query ranks on the engine total order (exact-decimal
or round6 keys, id tiebreaks) — fingerprints are byte-stable across
resubmits (repo invariant #1; tested in tests/test_round4_s10.py).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: catalog entry names in TPC-H query order, Q1..Q22.
SUITE = [
    "tpch_pricing_summary",        # Q1
    "tpch_min_cost_supplier",      # Q2
    "tpch_shipping_priority",      # Q3
    "tpch_order_priority",         # Q4
    "tpch_revenue_by_nation",      # Q5
    "tpch_revenue_forecast",       # Q6
    "tpch_volume_shipping",        # Q7
    "tpch_regional_share",         # Q8
    "tpch_product_profit",         # Q9
    "tpch_returned_items",         # Q10
    "tpch_important_stock",        # Q11
    "tpch_shipping_modes",         # Q12
    "tpch_customer_distribution",  # Q13
    "tpch_promo_effect",           # Q14
    "tpch_top_supplier",           # Q15
    "tpch_parts_suppliers",        # Q16
    "tpch_small_quantity",         # Q17
    "tpch_large_orders",           # Q18
    "tpch_discount_revenue",       # Q19
    "tpch_promo_suppliers",        # Q20
    "tpch_blamed_suppliers",       # Q21
    "tpch_idle_customers",         # Q22
]


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def fingerprint(df) -> tuple[int, str]:
    """(n_rows, md5 of the column-name-sorted, row-sorted %.6f rendering).

    Rerun-vs-rerun determinism evidence ONLY: %.6f is binary half-even
    formatting of the raw double, not the driver's round6 (decimal-
    quantize, HALF_UP) discipline — the oracle-equivalence evidence for
    these queries is the catalog's DuckDB comparison, not this hash."""
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.md5()
    h.update("|".join(cols).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return len(rows), h.hexdigest()


def run_suite(spark, sf_dir: str, out_dir: str) -> dict:
    from sparksearch.queries_catalog import CATALOG

    results = {}
    for qn, name in enumerate(SUITE, start=1):
        t0 = time.time()
        df = CATALOG[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"q{qn:02d}_{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        n, fp = fingerprint(spark.read.parquet(path))
        results[f"q{qn}"] = {
            "entry": name,
            "rows": n,
            "fingerprint": fp,
            "seconds": round(time.time() - t0, 2),
        }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/tpch_suite")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from sparksearch.session import get_spark

    spark = get_spark("tpch-suite", master=args.master or "local[8]")
    t0 = time.time()
    results = run_suite(spark, args.sf_dir, args.out)
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "wall_seconds": round(time.time() - t0, 1),
        "queries": results,
    }))


if __name__ == "__main__":
    main()
