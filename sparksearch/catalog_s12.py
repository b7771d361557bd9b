"""Round-5 catalog entries.

ES|QL ENRICH with the RANGE match type (round-4 verdict item #6): the one
absent ES|QL command whose physical shape — a broadcast LEFT interval join —
LOOKUP JOIN's equi-key cannot express. The engine already had the interval
primitives (events_asof_join, eql_sequence); this entry pins the language
surface over them.

Output discipline: no DECIMAL columns (round-5 invariant) — the language's
exact sums descale to BIGINT cents via queries_catalog._descale_long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: the pinned value-tier enrich policy: disjoint [lo, hi) ranges (the range
#: field's gte/lt convention). Values below 0.05 match nothing — the
#: LEFT-join NULL-tier group is part of the pinned contract.
VALUE_TIERS: list[tuple[float, float, str, int]] = [
    (0.05, 10.0, "micro", 1),
    (10.0, 50.0, "small", 2),
    (50.0, 150.0, "medium", 3),
    (150.0, 400.0, "large", 5),
    (400.0, 100000.0, "jumbo", 8),
]

ESQL_ENRICH_QUERY = """
FROM events
| ENRICH value_tiers ON value WITH tier, tier_boost
| EVAL boosted = ROUND(value * tier_boost, 6)
| STATS n = COUNT(*), sv = SUM(value), bs = SUM(boosted) BY tier
| SORT tier
"""


def _tiers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        VALUE_TIERS,
        "range_lo double, range_hi double, tier string, tier_boost int",
    )


def q_esql_events_enrich_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .esql import compile_esql
    from .queries_catalog import _descale_long

    df = compile_esql(
        ESQL_ENRICH_QUERY,
        tables={"value_tiers": _tiers_df(spark)},
        spark=spark,
        sf_dir=sf_dir,
    )
    # both sums sit on the 2-dp money grid (value is 2-dp; boost integer)
    df = _descale_long(df, "sv", "sv_e2", 2)
    return _descale_long(df, "bs", "bs_e2", 2)


def _enrich_sql() -> str:
    tiers = ",\n         ".join(
        f"({lo!r}, {hi!r}, '{t}', {b})" for lo, hi, t, b in VALUE_TIERS
    )
    return f"""WITH tiers(range_lo, range_hi, tier, tier_boost) AS (
  VALUES {tiers}
),
e AS (
  SELECT t.tier,
         value,
         CAST(ROUND(CAST(value * t.tier_boost AS DECIMAL(28,9)), 6) AS DOUBLE) AS boosted
  FROM events LEFT JOIN tiers t
    ON value >= t.range_lo AND value < t.range_hi
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS sv_e2,
       CAST(CAST(SUM(CAST(boosted AS DECIMAL(28,9))) AS DECIMAL(20,9)) * 100 AS BIGINT) AS bs_e2
FROM e GROUP BY 1 ORDER BY tier"""


def build_round5():
    from .queries_catalog import QuerySpec

    return {
        "esql_events_enrich_range": QuerySpec(
            q_esql_events_enrich_range,
            _enrich_sql(),
            "ES|QL ENRICH with the range match type: the [range_lo, "
            "range_hi) policy table broadcast-LEFT-interval-joins onto the "
            "piped frame (the physical shape LOOKUP JOIN cannot express), "
            "composed with EVAL on the enriched columns and the exact-sum "
            "STATS discipline; values below every range pin the NULL-tier "
            "group",
        ),
    }
