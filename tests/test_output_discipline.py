"""Catalog-wide output-type discipline (round-4 verdict item #1 + #2).

The grading driver's value normalization has proven semantics for exactly
{round6 double, BIGINT/int, string, boolean}: the only driver-red row ever
recorded (`lineitem_extended_stats`, CORRECTNESS_r04) was the only recorded
entry shipping DECIMAL output columns, while its collected values were
byte-identical across engines — the driver's fetch coerces wide decimals to
float64. These tests pin the two defenses:

1. NO `queries()` entry may return a DecimalType column (allowlist empty).
2. The driver mirror (jobs/driver_sim.py) must HARD-FAIL any entry whose
   output carries a decimal on either engine — so the mirror can never again
   be green where the driver is red.
"""

from __future__ import annotations

import decimal
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "jobs"))

from conftest import SF_SMOKE  # noqa: E402


#: Spark types any catalog entry is allowed to ship. DecimalType is
#: deliberately absent; extend only with types whose driver normalization
#: is proven by a green driver row.
ALLOWED_OUTPUT_TYPES = {"bigint", "int", "smallint", "tinyint",
                        "double", "float", "string", "boolean"}


def test_no_decimal_output_columns_catalog_wide(spark):
    """Every catalog entry's analyzed schema uses only driver-safe types.

    Analysis-only (no execution) — entries that build artifacts reuse the
    suite's cached /tmp artifacts, so this sweeps all ~278 entries fast.
    """
    import __spark_entry__ as contract

    bad: dict[str, list[str]] = {}
    try:
        for name, fn in contract.queries().items():
            df = fn(spark, str(SF_SMOKE))
            offending = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if f.dataType.simpleString() not in ALLOWED_OUTPUT_TYPES
            ]
            if offending:
                bad[name] = offending
    finally:
        # constructing 294 entries persists frames (FORK parents, encoded
        # ANN frames, shared corpus stats). A cached frame makes Catalyst
        # substitute InMemoryTableScan into any LATER query that contains
        # the same subtree — the plan-pin tests (test_plans.py, the tpch
        # plan waves) would then see cached scans instead of the
        # pushdown/join shapes they assert. Clear everything this sweep
        # cached; persisted frames recompute deterministically.
        from sparksearch import esql as _esql

        _esql.release_cached_frames()
        spark.catalog.clearCache()
    assert not bad, f"driver-unsafe output columns: {bad}"


def test_driver_sim_norm_rejects_decimal():
    from driver_sim import _norm

    assert _norm(None) == "NULL"
    assert _norm(1.25) == "1.250000"
    assert _norm(7) == "7"
    assert _norm(True) == "True"
    with pytest.raises(TypeError, match="decimal"):
        _norm(decimal.Decimal("74364878754370.0359"))
    with pytest.raises(TypeError):
        _norm([1, 2])


def test_driver_sim_gate_fails_synthetic_decimal_entry(spark):
    """run_entry must FAIL (not pass) an entry whose output is decimal on
    both engines even when the values are byte-identical — the exact
    blind spot that let the r04 mirror pass what the driver failed."""
    import duckdb

    from driver_sim import run_entry

    con = duckdb.connect()

    def q(sp, sf_dir):
        return sp.sql("SELECT CAST('74364878754370.0359' AS DECIMAL(28,4)) AS v")

    osql = {"synthetic": "SELECT CAST('74364878754370.0359' AS DECIMAL(28,4)) AS v"}
    rec = run_entry(spark, con, str(SF_SMOKE), "synthetic", q, osql)
    assert rec["err"] is not None and "type_gate" in rec["err"], rec
    assert not rec["hash_match"]


def test_driver_sim_gate_passes_safe_types(spark):
    import duckdb

    from driver_sim import run_entry

    con = duckdb.connect()

    def q(sp, sf_dir):
        return sp.sql(
            "SELECT CAST(7 AS BIGINT) AS n, CAST(1.5 AS DOUBLE) AS x, 'a' AS s"
        )

    osql = {"ok": "SELECT CAST(7 AS BIGINT) AS n, CAST(1.5 AS DOUBLE) AS x, 'a' AS s"}
    rec = run_entry(spark, con, str(SF_SMOKE), "ok", q, osql)
    assert rec["err"] is None and rec["hash_match"], rec
