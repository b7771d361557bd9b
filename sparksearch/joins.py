"""Multi-way join coverage over the TPC-H-ish star schema (region, nation,
customer, supplier, part, orders, lineitem — FIXTURES.md §A).

Joins are the most common thing an analytics engine does; these operators
demonstrate that join-STRATEGY selection is encoded for cluster scale rather
than left to small-fixture statistics:

* fact ⋈ fact (lineitem⋈orders, orders⋈customer, lineitem⋈part) carries an
  explicit ``merge`` hint — all of these tables grow with the scale factor
  (TPC-H: lineitem 6M×SF, orders 1.5M×SF, customer 0.15M×SF, part 0.2M×SF),
  so a broadcast picked off 60k-row fixture stats would OOM the real cluster.
  SortMergeJoin shuffles both sides on the equi-key; AQE handles skew splits.
* dim ⋈ anything (nation 25 rows, region 5 rows — CONSTANT size at every SF)
  is explicitly ``F.broadcast``: the fact side never shuffles for them, at
  any scale.

tests/test_plans.py asserts the physical plans: the fact chain contains
SortMergeJoin, the dim chain is pure BroadcastHashJoin.

Float policy (driver-hash invariant #5): every SUM over a double measure is
accumulated as DECIMAL(28,6) on BOTH engines — decimal addition is exact and
associative, so the partial+final aggregation order (which differs between
Spark and DuckDB) cannot perturb the 6-decimal rounding. Per-row products
(l_extendedprice·(1−l_discount)) are rounded to 6 decimals BEFORE the decimal
cast so both engines quantize identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stats import round6

def _rev():
    """Per-row revenue contribution, quantized before exact accumulation.
    (A function, not a module constant: Column construction needs an active
    SparkContext, and this module is imported at catalog-registration time.)"""
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
    ).cast("decimal(28,6)")


_REV_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(28,6))"


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5-shaped 5-way star join → DF[r_name, n_name, o_year, revenue,
    n_lineitems]: lineitem⋈orders⋈customer (fact chain, SMJ) ⋈ nation⋈region
    (broadcast dims). Revenue = Σ l_extendedprice·(1−l_discount)."""
    facts = (
        lineitem.select("l_orderkey", _rev().alias("rev"))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey").hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    dims = nation.select("n_nationkey", "n_name", "n_regionkey").join(
        F.broadcast(region.select("r_regionkey", "r_name")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        facts.join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.sum("rev").cast("double"), 6).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


REVENUE_BY_NATION_SQL = f"""
SELECT r_name, n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3"""


def supplier_geo(supplier: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """region⋈nation⋈supplier broadcast chain → DF[r_name, n_name,
    n_suppliers, total_acctbal]. Both dims are constant-size → the supplier
    table (the only SF-growing side) is never shuffled: two BroadcastHashJoins
    and one partial+final aggregate."""
    return (
        supplier.select("s_nationkey", F.col("s_acctbal").cast("decimal(28,6)").alias("bal"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.round(F.sum("bal").cast("double"), 6).alias("total_acctbal"),
        )
    )


SUPPLIER_GEO_SQL = """
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2"""


def top_parts_per_brand(lineitem: DataFrame, part: DataFrame, k: int = 3) -> DataFrame:
    """Top-N-per-group window over a fact⋈fact join → DF[p_brand, rank,
    p_partkey, revenue]: per-part revenue (lineitem⋈part, SMJ — part grows
    with SF), then the engine-wide (revenue DESC, key ASC) total order ranks
    parts within each brand; top k per brand survive.

    Scale: the part-revenue aggregate is map-side combinable on l_partkey;
    the window shuffles one row PER PART (not per lineitem) on p_brand."""
    per_part = (
        lineitem.select("l_partkey", _rev().alias("rev"))
        .join(
            part.select("p_partkey", "p_brand").hint("merge"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "p_brand",
            F.col("rank").cast("long").alias("rank"),
            "p_partkey",
            F.round(F.col("rev").cast("double"), 6).alias("revenue"),
        )
    )


TOP_PARTS_PER_BRAND_SQL = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey, SUM({_REV_SQL}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
r AS (
  SELECT p_brand, p_partkey, rev,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey ASC) AS rnk
  FROM per_part
)
SELECT p_brand, CAST(rnk AS BIGINT) AS rank, p_partkey,
       ROUND(CAST(rev AS DOUBLE), 6) AS revenue
FROM r WHERE rnk <= 3"""


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary → one row per (l_returnflag,
    l_linestatus) with exact-decimal sums and a double average. Pure
    partial+final hash aggregate — the canonical scan-heavy rollup."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double"), 6
            ).alias("sum_base_price"),
            F.round(F.sum(_rev()).cast("double"), 6).alias("sum_disc_price"),
            F.round(F.avg(F.col("l_discount").cast("decimal(28,6)")).cast("double"), 6).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 6) AS sum_base_price,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS sum_disc_price,
       ROUND(CAST(AVG(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY 1, 2"""


def orders_cube(orders: DataFrame) -> DataFrame:
    """A6 completion: CUBE over (o_orderstatus, o_orderpriority) — all four
    grouping combinations in one partial+final aggregate pass."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double"), 6
            ).alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "total_price")
    )


ORDERS_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""


def orders_grouping_sets(orders: DataFrame) -> DataFrame:
    """A6 completion: explicit GROUPING SETS ((status), (priority), ()) —
    the two independent one-column rollups plus the grand total, computed in
    one pass (no self-union of three aggregates)."""
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double"), 6
            ).alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "total_price")
    )


ORDERS_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_price
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""


def lineitem_quantiles(lineitem: DataFrame) -> DataFrame:
    """Percentile-aggregate coverage → one row per l_returnflag with exact
    p25/p50/p75 of l_extendedprice. Spark's ``percentile`` (exact, linear
    interpolation) matches DuckDB's ``quantile_cont`` bit-for-bit on the
    same input; the approx_percentile variant exists for the 100 TB path
    (one-pass sketch) but the oracle pins the exact form."""
    pcts = [0.25, 0.5, 0.75]
    return lineitem.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {p})"), 6).alias(f"p{int(p * 100)}")
            for p in pcts
        ],
        F.count(F.lit(1)).cast("long").alias("n"),
    )


LINEITEM_QUANTILES_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1"""


ORDER_STATUSES = ["F", "O", "P"]


def orders_pivot(orders: DataFrame) -> DataFrame:
    """Pivot coverage → one row per o_orderpriority with per-status order
    counts as columns (explicit value list — REQUIRED at scale: an implicit
    pivot runs an extra distinct job over the fact table to discover
    values). DuckDB twin = conditional aggregation."""
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s}")
            for s in ORDER_STATUSES
        ],
    )


ORDERS_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY 1"""


def customer_order_balance(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Outer-join coverage: every customer with their order count and spend —
    customers with NO orders surface with zeros (left outer ⋈ on the fact
    side, aggregated pre-join so the outer join moves one row per customer,
    not one per order)."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("spend"),
    )
    return (
        customer.select("c_custkey", "c_mktsegment")
        .join(per_cust.hint("merge"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.when(F.col("n_orders").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_without_orders"),
            F.coalesce(F.sum("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            F.round(F.coalesce(F.sum("spend"), F.lit(0)).cast("double"), 6).alias(
                "total_spend"
            ),
        )
    )


CUSTOMER_ORDER_BALANCE_SQL = """
WITH per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend
  FROM orders GROUP BY 1
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders,
       CAST(COALESCE(SUM(n_orders), 0) AS BIGINT) AS n_orders,
       ROUND(CAST(COALESCE(SUM(spend), 0) AS DOUBLE), 6) AS total_spend
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY 1"""


PCT_RANK_THRESHOLDS = [1000.0, 25000.0, 50000.0]


def lineitem_percentile_ranks(lineitem: DataFrame) -> DataFrame:
    """ES percentile_ranks (inverse percentiles) → one row per l_returnflag
    with the fraction of l_extendedprice values ≤ each fixed threshold —
    the dual of lineitem_quantiles. Exact integer count ratios (one
    conditional-count aggregate, map-side combinable at any scale; the ES
    agg's TDigest is the approximate 100 TB variant of the same contract),
    one double division per cell, round6 output."""
    n = F.count(F.lit(1))
    return lineitem.groupBy("l_returnflag").agg(
        *[
            round6(
                F.sum(
                    F.when(F.col("l_extendedprice") <= t, 1).otherwise(0)
                ).cast("double")
                / n.cast("double")
            ).alias(f"le_{int(t)}")
            for t in PCT_RANK_THRESHOLDS
        ],
        n.cast("long").alias("n"),
    )


PCT_RANKS_SQL = """
SELECT l_returnflag,
""" + ",\n".join(
    f"       CAST(ROUND(CAST(CAST(SUM(CASE WHEN l_extendedprice <= {t} THEN 1 ELSE 0 END) AS DOUBLE)"
    f" / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS le_{int(t)}"
    for t in PCT_RANK_THRESHOLDS
) + """,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1"""


#: matrix_stats fields — 2-dp numeric lineitem measures; DECIMAL(9,2) holds
#: every raw value exactly (max l_extendedprice ≈ 1.05e5).
MATRIX_FIELDS = ("l_quantity", "l_extendedprice", "l_discount")


def lineitem_matrix_stats(lineitem: DataFrame) -> DataFrame:
    """ES matrix_stats aggregation → one row per unordered field pair
    (i ≤ j) of MATRIX_FIELDS: DF[field_x, field_y, n, mean_x, mean_y,
    covariance, correlation] (population covariance; correlation of a
    field with itself = 1).

    Plan: ONE aggregate computes all 10 sums (n, 3 Σx, 6 Σxy) in a single
    pass — map-side combinable, no joins, no second scan; the 6 output
    rows explode from the 1-row result. Survives any scale: the shuffle
    is one row.

    Float discipline (the loglog_fit remedy): inputs quantize to
    DECIMAL(9,2) (exact — the data is 2-dp), so every sum is exact
    decimal; the covariance/correlation numerators n·Σxy − Σx·Σy are
    computed in decimal with operands first narrowed to the smallest
    sufficient width (n→DECIMAL(12,0), Σx→DECIMAL(18,2),
    Σxy→DECIMAL(24,4) — products stay ≤ 38 digits, exact to ~10^9 rows;
    the Spark 38-digit silent-scale-drop sharp edge), and only the final
    division/sqrt runs in double (correctly-rounded IEEE ops on identical
    inputs) before round6."""
    fields = MATRIX_FIELDS
    d = lineitem.select(
        *[F.col(f).cast("decimal(9,2)").alias(f"x{i}") for i, f in enumerate(fields)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(fields)):
        aggs.append(F.sum(F.col(f"x{i}")).alias(f"s{i}"))
        for j in range(i, len(fields)):
            aggs.append(F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"p{i}{j}"))
    g = d.agg(*aggs)

    nd = F.col("n").cast("decimal(12,0)")
    n2 = F.col("n").cast("double") * F.col("n").cast("double")

    def s(i):
        return F.col(f"s{i}").cast("decimal(18,2)")

    def num(i, j):
        # n·Σxy − Σx·Σy: (12,0)×(24,4) → (37,4) and (18,2)² → (37,4),
        # both inside the cap, subtraction exact.
        return (nd * F.col(f"p{i}{j}").cast("decimal(24,4)")) - (s(i) * s(j))

    rows = []
    for i in range(len(fields)):
        for j in range(i, len(fields)):
            cov = num(i, j).cast("double")
            vx = num(i, i).cast("double")
            vy = num(j, j).cast("double")
            rows.append(
                F.struct(
                    F.lit(fields[i]).alias("field_x"),
                    F.lit(fields[j]).alias("field_y"),
                    F.col("n").cast("long").alias("n"),
                    round6(s(i).cast("double") / F.col("n").cast("double")).alias("mean_x"),
                    round6(s(j).cast("double") / F.col("n").cast("double")).alias("mean_y"),
                    round6(cov / n2).alias("covariance"),
                    F.when(
                        (vx > 0) & (vy > 0),
                        round6(cov / F.sqrt(vx * vy)),
                    ).alias("correlation"),
                )
            )
    return g.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def _matrix_stats_sql() -> str:
    """DuckDB twin of lineitem_matrix_stats, generated from the same
    MATRIX_FIELDS list so the two sides cannot drift."""
    fields = MATRIX_FIELDS
    sums = ["COUNT(*) AS n"]
    for i in range(len(fields)):
        sums.append(f"SUM(x{i}) AS s{i}")
        for j in range(i, len(fields)):
            sums.append(f"SUM(x{i} * x{j}) AS p{i}{j}")
    r6 = lambda e: f"CAST(ROUND(CAST({e} AS DECIMAL(28,9)), 6) AS DOUBLE)"  # noqa: E731

    def num(i, j):
        # Σx casts to DECIMAL(19,2), not the Spark side's (18,2): DuckDB
        # executes width-≤18 decimal multiplies in int64 and overflows at
        # Σx² ≈ 1e21 (seen at sf0.001); 19 forces int128 (19+19=38 ≤ cap).
        # Values are exact either way, so the engines still agree.
        return (
            f"(CAST(n AS DECIMAL(12,0)) * CAST(p{i}{j} AS DECIMAL(24,4))"
            f" - CAST(s{i} AS DECIMAL(19,2)) * CAST(s{j} AS DECIMAL(19,2)))"
        )

    selects = []
    for i in range(len(fields)):
        for j in range(i, len(fields)):
            cov, vx, vy = (f"CAST({num(a, b)} AS DOUBLE)" for a, b in ((i, j), (i, i), (j, j)))
            selects.append(f"""SELECT '{fields[i]}' AS field_x, '{fields[j]}' AS field_y,
       CAST(n AS BIGINT) AS n,
       {r6(f"CAST(s{i} AS DOUBLE) / CAST(n AS DOUBLE)")} AS mean_x,
       {r6(f"CAST(s{j} AS DOUBLE) / CAST(n AS DOUBLE)")} AS mean_y,
       {r6(f"{cov} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))")} AS covariance,
       CASE WHEN {vx} > 0 AND {vy} > 0
            THEN {r6(f"{cov} / sqrt({vx} * {vy})")} END AS correlation
FROM g""")
    cols = ", ".join(
        f"CAST(x{i} AS DECIMAL(9,2)) AS x{i}"
        for i in range(len(fields))
    )
    src = ", ".join(f"{f} AS x{i}" for i, f in enumerate(fields))
    return (
        f"WITH d AS (SELECT {cols} FROM (SELECT {src} FROM lineitem)),\n"
        f"g AS (SELECT {', '.join(sums)} FROM d)\n"
        + "\nUNION ALL\n".join(selects)
    )


MATRIX_STATS_SQL = _matrix_stats_sql()


def lineitem_extended_stats(lineitem: DataFrame) -> DataFrame:
    """ES extended_stats aggregation per l_returnflag → DF[l_returnflag,
    n, min_v, max_v, sum_v_e2, avg_v, sum_of_squares_str, variance,
    std_dev] over l_extendedprice (population variance, the ES default).

    Same float discipline as lineitem_matrix_stats: DECIMAL(9,2)-exact
    inputs, one aggregate pass (map-side combinable), decimal numerator
    n·Σx² − (Σx)² for the variance, doubles only at the final division —
    std_dev = sqrt of the identical unrounded double on both engines
    (IEEE sqrt is correctly rounded), round6 output.

    Output discipline (round-4 verdict #1 — the one driver-red row): no
    DECIMAL output columns, ever.  The driver's value normalization is
    proven only for {round6 double, BIGINT, string, bool}; its fetch
    coerces wide decimals to float64 (74364878754370.0359 is not
    representable) even though both engines' collected values are
    byte-identical.  So: sum_v_e2 = the exact sum in CENTS as BIGINT
    (×100 of a scale-2 decimal is exact; ≤1.1e12 at sf0.1 — int64-safe at
    any SF), and sum_of_squares_str = the exact scale-4 decimal rendered
    as a STRING (×1e4 would reach 7.4e18 at sf0.1 — too close to the
    int64 cap; decimal→string rendering is verified engine-identical
    including trailing scale zeros)."""
    x = F.col("l_extendedprice").cast("decimal(9,2)")
    g = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("ss"),
    )
    num = (
        F.col("n").cast("decimal(12,0)") * F.col("ss").cast("decimal(24,4)")
    ) - (F.col("s").cast("decimal(19,2)") * F.col("s").cast("decimal(19,2)"))
    nd = F.col("n").cast("double")
    var = num.cast("double") / (nd * nd)
    return g.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        round6(F.col("mn").cast("double")).alias("min_v"),
        round6(F.col("mx").cast("double")).alias("max_v"),
        # sum_v ~1e10 at sf0.1 already exceeds double's 6-dp resolution
        # (ulp 2e-6) -> exact BIGINT cents (×100 of a scale-2 decimal).
        (F.col("s").cast("decimal(28,2)") * 100).cast("long").alias("sum_v_e2"),
        round6(F.col("s").cast("double") / nd).alias("avg_v"),
        # sum_of_squares ~ 1e13+: beyond double's 6-dp resolution, and
        # ×1e4 flirts with the int64 cap -> exact decimal rendered as a
        # STRING (engine-identical incl. trailing scale zeros).
        F.col("ss").cast("decimal(28,4)").cast("string").alias("sum_of_squares_str"),
        round6(var).alias("variance"),
        round6(F.sqrt(var)).alias("std_dev"),
    )


EXTENDED_STATS_SQL = """WITH d AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(9,2)) AS x FROM lineitem
),
g AS (
  SELECT l_returnflag, COUNT(*) AS n, MIN(x) AS mn, MAX(x) AS mx,
         SUM(x) AS s, SUM(x * x) AS ss
  FROM d GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(ROUND(CAST(CAST(mn AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS min_v,
       CAST(ROUND(CAST(CAST(mx AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS max_v,
       CAST(CAST(s AS DECIMAL(28,2)) * 100 AS BIGINT) AS sum_v_e2,
       CAST(ROUND(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_v,
       CAST(CAST(ss AS DECIMAL(28,4)) AS VARCHAR) AS sum_of_squares_str,
       CAST(ROUND(CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(ss AS DECIMAL(24,4)) - CAST(s AS DECIMAL(19,2)) * CAST(s AS DECIMAL(19,2)) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS DECIMAL(28,9)), 6) AS DOUBLE) AS variance,
       CAST(ROUND(CAST(sqrt(CAST(CAST(n AS DECIMAL(12,0)) * CAST(ss AS DECIMAL(24,4)) - CAST(s AS DECIMAL(19,2)) * CAST(s AS DECIMAL(19,2)) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS DECIMAL(28,9)), 6) AS DOUBLE) AS std_dev
FROM g"""


#: has_child query geometry: child predicate + page size.
HAS_CHILD_MIN_QTY = 48.0
HAS_CHILD_K = 20


def orders_has_child_topk(
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = HAS_CHILD_MIN_QTY,
    k: int = HAS_CHILD_K,
) -> DataFrame:
    """ES parent-child `has_child` query (score_mode=max) → DF[rank,
    o_orderkey, o_orderpriority, n_matching_children, score]: parents
    (orders) having ≥ 1 child (lineitem) matching the child query
    (l_quantity ≥ min_qty), scored by the MAX matching child's revenue
    contribution, top-k under the engine total order (round6(score) DESC,
    o_orderkey ASC).

    ES stores parent+child in one shard and joins in memory; the engine
    twin is the distributed equivalent: the child query REDUCES BEFORE the
    join (one map-side-combinable agg to one row per matching parent), so
    the parent join carries |matching parents| rows, never |children| —
    then a TakeOrderedAndProject page cut. Score stays exact decimal
    until the final round6 (the _rev discipline)."""
    child = (
        lineitem.filter(F.col("l_quantity") >= min_qty)
        .select("l_orderkey", _rev().alias("rev"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matching_children"),
            F.max("rev").alias("best"),
        )
    )
    scored = child.join(
        orders.select("o_orderkey", "o_orderpriority").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "o_orderkey",
        "o_orderpriority",
        "n_matching_children",
        round6(F.col("best").cast("double")).alias("score"),
    )
    # page cut FIRST (TakeOrderedAndProject — distributed top-k, never a
    # global single-partition sort); the rank window then runs over k rows.
    page = scored.orderBy(F.desc("score"), F.asc("o_orderkey")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("o_orderkey"))
    return page.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("long").alias("rank"),
        "o_orderkey",
        "o_orderpriority",
        "n_matching_children",
        "score",
    )


HAS_CHILD_SQL = f"""WITH child AS (
  SELECT l_orderkey, COUNT(*) AS n_matching_children,
         MAX({_REV_SQL}) AS best
  FROM lineitem WHERE l_quantity >= {HAS_CHILD_MIN_QTY}
  GROUP BY 1
),
scored AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(n_matching_children AS BIGINT) AS n_matching_children,
         CAST(ROUND(CAST(CAST(best AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
  FROM child JOIN orders ON l_orderkey = o_orderkey
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, o_orderkey ASC) AS rnk
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rank, o_orderkey, o_orderpriority,
       n_matching_children, score
FROM r WHERE rnk <= {HAS_CHILD_K}"""


HISTOGRAM_INTERVAL = 10000.0


def price_histogram(lineitem: DataFrame) -> DataFrame:
    """ES histogram aggregation (fixed interval) → DF[bucket_start,
    n_items, sum_qty_e2]: l_extendedprice bucketed by floor(x / interval) —
    the numeric sibling of the date_histogram entries. One map-side
    combinable aggregate; bucket math is exact (floor of a positive
    double ratio; both engines compute the identical double before the
    floor)."""
    b = (
        F.floor(F.col("l_extendedprice") / F.lit(HISTOGRAM_INTERVAL))
        .cast("long")
        .alias("bucket")
    )
    return (
        lineitem.groupBy(b)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            # exact sum in centi-units as BIGINT (×100 of a scale-2
            # decimal is exact; no DECIMAL output — driver discipline)
            (F.sum(F.col("l_quantity").cast("decimal(9,2)"))
             .cast("decimal(28,2)") * 100)
            .cast("long")
            .alias("sum_qty_e2"),
        )
        .select(
            (F.col("bucket").cast("double") * F.lit(HISTOGRAM_INTERVAL)).alias(
                "bucket_start"
            ),
            "n_items",
            "sum_qty_e2",
        )
    )


PRICE_HISTOGRAM_SQL = f"""WITH g AS (
  SELECT CAST(floor(l_extendedprice / {HISTOGRAM_INTERVAL}) AS BIGINT) AS bucket,
         COUNT(*) AS n_items,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(28,2)) * 100 AS BIGINT) AS sum_qty_e2
  FROM lineitem GROUP BY 1
)
SELECT CAST(bucket AS DOUBLE) * {HISTOGRAM_INTERVAL} AS bucket_start,
       CAST(n_items AS BIGINT) AS n_items, sum_qty_e2
FROM g"""


def discount_weighted_avg(lineitem: DataFrame) -> DataFrame:
    """ES weighted_avg aggregation per l_returnflag → DF[l_returnflag,
    n, weighted_avg_discount]: Σ(discount·quantity) / Σ(quantity) —
    quantity-weighted mean discount. Exact decimal numerator and
    denominator (2-dp inputs quantize exactly), ONE double division,
    round6 — the order-independent weighted-mean discipline
    (training_data_stats precedent)."""
    d = F.col("l_discount").cast("decimal(9,2)")
    q = F.col("l_quantity").cast("decimal(9,2)")
    g = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d * q).cast("decimal(30,4)").alias("num"),
        F.sum(q).cast("decimal(28,2)").alias("den"),
    )
    return g.select(
        "l_returnflag",
        "n",
        round6(F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "weighted_avg_discount"
        ),
    )


WEIGHTED_AVG_SQL = """WITH g AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_discount AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(30,4)) AS num,
         CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(28,2)) AS den
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(ROUND(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS weighted_avg_discount
FROM g"""


MULTI_TERMS_K = 10


def orders_multi_terms(orders: DataFrame, k: int = MULTI_TERMS_K) -> DataFrame:
    """ES multi_terms aggregation → DF[rank, o_orderpriority, o_orderstatus,
    n_orders, sum_total_e2]: top-k composite (priority, status) buckets by doc
    count — the multi-field sibling of the terms agg (one bucket per value
    COMBINATION, unlike a nested terms tree). One map-side-combinable
    group-by; the rank window runs over the bucket-count-sized frame
    (|priorities|x|statuses| ≤ 15), never the order rows. Total order
    (n_orders DESC, priority ASC, status ASC); sums exact decimal."""
    g = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
         .cast("decimal(28,2)") * 100)
        .cast("long")
        .alias("sum_total_e2"),
    )
    w = Window.orderBy(
        F.desc("n_orders"), F.asc("o_orderpriority"), F.asc("o_orderstatus")
    )
    return (
        g.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "o_orderpriority", "o_orderstatus", "n_orders",
                "sum_total_e2")
    )


MULTI_TERMS_SQL = f"""WITH g AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) * 100 AS BIGINT) AS sum_total_e2
  FROM orders GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY n_orders DESC, o_orderpriority ASC, o_orderstatus ASC) AS rank
  FROM g
)
SELECT CAST(rank AS BIGINT) AS rank, o_orderpriority, o_orderstatus,
       CAST(n_orders AS BIGINT) AS n_orders, sum_total_e2
FROM r WHERE rank <= {MULTI_TERMS_K}"""


def lineitem_top_metrics(lineitem: DataFrame) -> DataFrame:
    """ES top_metrics aggregation per l_returnflag → DF[l_returnflag,
    latest_shipdate, l_orderkey, top_price_e2, top_discount_e2]: the metric
    columns taken from the row with the LATEST l_shipdate (ties broken
    lowest (l_orderkey, l_linenumber) — a total order since that pair is
    the table key). Implemented as ONE map-side-combinable max(struct)
    aggregate — sort keys lead the struct with tiebreakers negated so
    lexicographic max IS the wanted row; no window, no per-group sort, so
    a 3-group key can't skew at scale. The oracle uses the row_number
    form — two algorithms, one answer."""
    s = F.struct(
        F.col("l_shipdate").alias("sd"),
        (-F.col("l_orderkey")).alias("nok"),
        (-F.col("l_linenumber").cast("long")).alias("nln"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_discount").cast("decimal(9,2)").alias("disc"),
    )
    g = lineitem.groupBy("l_returnflag").agg(F.max(s).alias("t"))
    return g.select(
        "l_returnflag",
        F.date_format("t.sd", "yyyy-MM-dd").alias("latest_shipdate"),
        (-F.col("t.nok")).cast("long").alias("l_orderkey"),
        (F.col("t.price") * 100).cast("long").alias("top_price_e2"),
        (F.col("t.disc") * 100).cast("long").alias("top_discount_e2"),
    )


TOP_METRICS_SQL = """WITH r AS (
  SELECT l_returnflag, l_shipdate, l_orderkey,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS top_price_e2,
         CAST(CAST(l_discount AS DECIMAL(9,2)) * 100 AS BIGINT) AS top_discount_e2,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
           ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC) AS rn
  FROM lineitem
)
SELECT l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS latest_shipdate,
       CAST(l_orderkey AS BIGINT) AS l_orderkey, top_price_e2, top_discount_e2
FROM r WHERE rn = 1"""


BUCKET_SORT_K = 6


def orders_bucket_selector(orders: DataFrame, k: int = BUCKET_SORT_K) -> DataFrame:
    """ES bucket_selector + bucket_sort pipeline aggs → DF[rank, month,
    n_orders, revenue_e2]: monthly revenue buckets, selector keeps buckets
    ABOVE the mean monthly revenue, bucket_sort takes the top-k by revenue.
    The above-mean gate is exact-decimal CROSS-MULTIPLICATION
    (revenue·n_months > total) — no division anywhere, so the selector is
    engine-exact and scale-factor-robust (a fixed threshold would pass
    everything or nothing as SF moves). Rank window runs on the
    months-sized frame only."""
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(28,2)")
        .alias("revenue"),
    )
    tot = m.agg(
        F.sum("revenue").cast("decimal(38,2)").alias("tot"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("nm"),
    )
    kept = m.crossJoin(F.broadcast(tot)).filter(
        F.col("revenue").cast("decimal(28,2)") * F.col("nm") > F.col("tot")
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("month"))
    return (
        kept.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "month", "n_orders",
                # ordering ran on the exact decimal; output ships as
                # BIGINT cents (driver discipline: no DECIMAL columns)
                (F.col("revenue") * 100).cast("long").alias("revenue_e2"))
    )


BUCKET_SELECTOR_SQL = f"""WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS revenue
  FROM orders GROUP BY 1
),
t AS (
  SELECT CAST(SUM(revenue) AS DECIMAL(38,2)) AS tot,
         CAST(COUNT(*) AS DECIMAL(10,0)) AS nm
  FROM m
),
kept AS (
  SELECT m.* FROM m, t WHERE CAST(m.revenue AS DECIMAL(28,2)) * t.nm > t.tot
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, month ASC) AS rank FROM kept
)
SELECT CAST(rank AS BIGINT) AS rank, month, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(revenue * 100 AS BIGINT) AS revenue_e2
FROM r WHERE rank <= {BUCKET_SORT_K}"""


DATE_RANGE_BOUNDS = ("1997-01-01", "1999-01-01")


def orders_date_range(orders: DataFrame) -> DataFrame:
    """ES date_range aggregation → DF[range_key, from_date, to_date,
    n_orders, sum_total_e2]: keyed half-open [from, to) date buckets (the ES
    contract: from inclusive, to exclusive, unbounded edges allowed) over
    o_orderdate. One map-side-combinable when-chain group-by — the bucket
    expression is pure codegen, zero extra shuffle beyond the 3-key agg;
    sums exact decimal."""
    lo, hi = DATE_RANGE_BOUNDS
    d = F.col("o_orderdate").cast("date")
    key = (
        F.when(d < F.lit(lo).cast("date"), F.lit(f"*-{lo}"))
        .when(d < F.lit(hi).cast("date"), F.lit(f"{lo}-{hi}"))
        .otherwise(F.lit(f"{hi}-*"))
    )
    g = orders.groupBy(key.alias("range_key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
         .cast("decimal(28,2)") * 100)
        .cast("long")
        .alias("sum_total_e2"),
    )
    return g.select(
        "range_key",
        F.when(F.col("range_key") == f"*-{lo}", F.lit(None).cast("string"))
        .when(F.col("range_key") == f"{lo}-{hi}", F.lit(lo))
        .otherwise(F.lit(hi))
        .alias("from_date"),
        F.when(F.col("range_key") == f"*-{lo}", F.lit(lo))
        .when(F.col("range_key") == f"{lo}-{hi}", F.lit(hi))
        .otherwise(F.lit(None).cast("string"))
        .alias("to_date"),
        "n_orders",
        "sum_total_e2",
    )


DATE_RANGE_SQL = f"""WITH b AS (
  SELECT CASE WHEN CAST(o_orderdate AS DATE) < DATE '{DATE_RANGE_BOUNDS[0]}'
                THEN '*-{DATE_RANGE_BOUNDS[0]}'
              WHEN CAST(o_orderdate AS DATE) < DATE '{DATE_RANGE_BOUNDS[1]}'
                THEN '{DATE_RANGE_BOUNDS[0]}-{DATE_RANGE_BOUNDS[1]}'
              ELSE '{DATE_RANGE_BOUNDS[1]}-*' END AS range_key,
         o_totalprice
  FROM orders
)
SELECT range_key,
       CASE range_key WHEN '*-{DATE_RANGE_BOUNDS[0]}' THEN NULL
                      WHEN '{DATE_RANGE_BOUNDS[0]}-{DATE_RANGE_BOUNDS[1]}' THEN '{DATE_RANGE_BOUNDS[0]}'
                      ELSE '{DATE_RANGE_BOUNDS[1]}' END AS from_date,
       CASE range_key WHEN '*-{DATE_RANGE_BOUNDS[0]}' THEN '{DATE_RANGE_BOUNDS[0]}'
                      WHEN '{DATE_RANGE_BOUNDS[0]}-{DATE_RANGE_BOUNDS[1]}' THEN '{DATE_RANGE_BOUNDS[1]}'
                      ELSE NULL END AS to_date,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) * 100 AS BIGINT) AS sum_total_e2
FROM b GROUP BY 1"""


def lineitem_boxplot(lineitem: DataFrame) -> DataFrame:
    """ES boxplot aggregation per l_returnflag → DF[l_returnflag, n, vmin_e2,
    vmax_e2, q1_e4, q2_e4, q3_e4, lower_whisker_e2, upper_whisker_e2]
    (exact scaled BIGINTs — ×100 / ×1e4): exact linear-interpolated
    quartiles (the R-7/NumPy 'linear' rule ES documents) plus the 1.5·IQR
    whiskers (nearest actual values inside the fences).

    Engine-exact percentile discipline: with h = (n−1)·p, p ∈ {¼,½,¾},
    lo = floor(h) and frac = h − lo ∈ {0,¼,½,¾} are EXACT in both engines
    (integer products divided by 4.0 — a power of two), the two bracketing
    order statistics are picked by conditional aggregation over a
    row_number window, and the interpolation runs in exact decimals — no
    engine percentile builtin executes (Spark percentile / DuckDB quantile
    interpolate in doubles and may differ by ULPs). Cost: ONE
    per-group-sort window shuffle; at 100 TB the same contract is served by
    the documented sketch path (ES boxplot itself is TDigest-backed;
    stats.quantile_thresholds is this repo's GK variant) with this exact
    form as its small-scale oracle. Whisker pass re-scans with the 3-row
    quartile frame broadcast."""
    import decimal as _d

    v = lineitem.select(
        "l_returnflag", F.col("l_extendedprice").cast("decimal(12,2)").alias("v")
    )
    ws = Window.partitionBy("l_returnflag").orderBy("v")
    wa = Window.partitionBy("l_returnflag")
    r = v.select(
        "l_returnflag", "v",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    aggs = [
        F.max("n").cast("long").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    ]
    for p in (1, 2, 3):
        lo = F.floor(((F.col("n") - 1) * p) / F.lit(4.0)).cast("long")
        aggs += [
            F.max(F.when(F.col("rn") == lo + 1, F.col("v"))).alias(f"lo{p}"),
            F.max(F.when(F.col("rn") == lo + 2, F.col("v"))).alias(f"hi{p}"),
            F.max((F.col("n") - 1) * p - 4 * lo).cast("long").alias(f"rem{p}"),
        ]
    g = r.groupBy("l_returnflag").agg(*aggs)
    qcols = []
    for p in (1, 2, 3):
        frac = (F.col(f"rem{p}") * F.lit(_d.Decimal("0.25"))).cast("decimal(3,2)")
        q = (
            F.col(f"lo{p}")
            + (F.coalesce(f"hi{p}", f"lo{p}") - F.col(f"lo{p}")) * frac
        ).cast("decimal(19,4)")
        qcols.append(q.alias(f"q{p}"))
    q = g.select("l_returnflag", "n", "vmin", "vmax", *qcols).select(
        "*",
        (F.col("q1") - (F.col("q3") - F.col("q1")) * F.lit(_d.Decimal("1.5")))
        .cast("decimal(24,5)")
        .alias("fence_lo"),
        (F.col("q3") + (F.col("q3") - F.col("q1")) * F.lit(_d.Decimal("1.5")))
        .cast("decimal(24,5)")
        .alias("fence_hi"),
    )
    wk = (
        v.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("v") >= F.col("fence_lo"), F.col("v"))).alias(
                "lower_whisker"
            ),
            F.max(F.when(F.col("v") <= F.col("fence_hi"), F.col("v"))).alias(
                "upper_whisker"
            ),
        )
    )
    # output discipline: no DECIMAL columns — exact scaled BIGINTs
    # (scale-2 values ×100, scale-4 quartiles ×1e4; max ~8e8, int64-safe)
    return q.join(wk, "l_returnflag").select(
        "l_returnflag", "n",
        (F.col("vmin") * 100).cast("long").alias("vmin_e2"),
        (F.col("vmax") * 100).cast("long").alias("vmax_e2"),
        (F.col("q1") * 10000).cast("long").alias("q1_e4"),
        (F.col("q2") * 10000).cast("long").alias("q2_e4"),
        (F.col("q3") * 10000).cast("long").alias("q3_e4"),
        (F.col("lower_whisker") * 100).cast("long").alias("lower_whisker_e2"),
        (F.col("upper_whisker") * 100).cast("long").alias("upper_whisker_e2"),
    )


BOXPLOT_SQL = """WITH v AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS v FROM lineitem
),
r AS (
  SELECT l_returnflag, v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM v
),
g AS (
  SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
         MIN(v) AS vmin, MAX(v) AS vmax,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*1)/4.0) AS BIGINT) + 1 THEN v END) AS lo1,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*1)/4.0) AS BIGINT) + 2 THEN v END) AS hi1,
         CAST(MAX((n-1)*1 - 4*CAST(floor(((n-1)*1)/4.0) AS BIGINT)) AS BIGINT) AS rem1,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*2)/4.0) AS BIGINT) + 1 THEN v END) AS lo2,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*2)/4.0) AS BIGINT) + 2 THEN v END) AS hi2,
         CAST(MAX((n-1)*2 - 4*CAST(floor(((n-1)*2)/4.0) AS BIGINT)) AS BIGINT) AS rem2,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*3)/4.0) AS BIGINT) + 1 THEN v END) AS lo3,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*3)/4.0) AS BIGINT) + 2 THEN v END) AS hi3,
         CAST(MAX((n-1)*3 - 4*CAST(floor(((n-1)*3)/4.0) AS BIGINT)) AS BIGINT) AS rem3
  FROM r GROUP BY 1
),
q AS (
  SELECT l_returnflag, n, vmin, vmax,
         CAST(lo1 + (COALESCE(hi1, lo1) - lo1) * CAST(rem1 * 0.25 AS DECIMAL(3,2)) AS DECIMAL(19,4)) AS q1,
         CAST(lo2 + (COALESCE(hi2, lo2) - lo2) * CAST(rem2 * 0.25 AS DECIMAL(3,2)) AS DECIMAL(19,4)) AS q2,
         CAST(lo3 + (COALESCE(hi3, lo3) - lo3) * CAST(rem3 * 0.25 AS DECIMAL(3,2)) AS DECIMAL(19,4)) AS q3
  FROM g
),
qf AS (
  SELECT *, CAST(q1 - (q3 - q1) * 1.5 AS DECIMAL(24,5)) AS fence_lo,
            CAST(q3 + (q3 - q1) * 1.5 AS DECIMAL(24,5)) AS fence_hi
  FROM q
),
wk AS (
  SELECT v.l_returnflag,
         MIN(CASE WHEN v.v >= qf.fence_lo THEN v.v END) AS lower_whisker,
         MAX(CASE WHEN v.v <= qf.fence_hi THEN v.v END) AS upper_whisker
  FROM v JOIN qf USING (l_returnflag) GROUP BY 1
)
SELECT qf.l_returnflag, n,
       CAST(vmin * 100 AS BIGINT) AS vmin_e2,
       CAST(vmax * 100 AS BIGINT) AS vmax_e2,
       CAST(q1 * 10000 AS BIGINT) AS q1_e4,
       CAST(q2 * 10000 AS BIGINT) AS q2_e4,
       CAST(q3 * 10000 AS BIGINT) AS q3_e4,
       CAST(lower_whisker * 100 AS BIGINT) AS lower_whisker_e2,
       CAST(upper_whisker * 100 AS BIGINT) AS upper_whisker_e2
FROM qf JOIN wk ON qf.l_returnflag = wk.l_returnflag"""


T_TEST_FLAGS = ("A", "R")


def lineitem_t_test(lineitem: DataFrame) -> DataFrame:
    """ES t_test aggregation (heteroscedastic / Welch, the ES default) →
    one-row DF[n_a, n_b, mean_a, mean_b, t_stat]: two-sample t-statistic of
    l_discount between l_returnflag populations A and R.

    Decimal-exact moments (width budget good past 10^8 rows/side: x is
    decimal(4,2), Σx decimal(12,2), Σx² decimal(12,4) — the n·Σx²−(Σx)²
    variance numerators stay ≤ decimal(26,4), order-independent), then the
    SAME final double op sequence on both engines: two divisions per
    moment, one add, one sqrt, one subtract, one divide — each correctly
    rounded IEEE from identical decimal inputs. ONE map-side-combinable
    2-key aggregate + a scalar fold; no shuffle wider than 2 rows."""
    x = F.col("l_discount").cast("decimal(4,2)")
    g = (
        lineitem.filter(F.col("l_returnflag").isin(*T_TEST_FLAGS))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
            F.sum(x).cast("decimal(12,2)").alias("s"),
            F.sum((x * x).cast("decimal(8,4)")).cast("decimal(12,4)").alias("ss"),
        )
    )
    a, b = T_TEST_FLAGS
    p = g.agg(
        *[
            F.max(F.when(F.col("l_returnflag") == f, F.col(c))).alias(f"{c}_{f}")
            for f in (a, b)
            for c in ("n", "s", "ss")
        ]
    )

    def m(f):
        return F.col(f"s_{f}").cast("double") / F.col(f"n_{f}").cast("double")

    def var(f):
        num = (
            F.col(f"n_{f}") * F.col(f"ss_{f}") - F.col(f"s_{f}") * F.col(f"s_{f}")
        ).cast("decimal(28,4)")
        den = F.col(f"n_{f}") * (F.col(f"n_{f}") - 1)
        return num.cast("double") / den.cast("double")

    from .stats import round6

    se = F.sqrt(
        var(a) / F.col(f"n_{a}").cast("double")
        + var(b) / F.col(f"n_{b}").cast("double")
    )
    return p.select(
        F.col(f"n_{a}").cast("long").alias("n_a"),
        F.col(f"n_{b}").cast("long").alias("n_b"),
        round6(m(a)).alias("mean_a"),
        round6(m(b)).alias("mean_b"),
        round6((m(a) - m(b)) / se).alias("t_stat"),
    )


T_TEST_SQL = """WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
         CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(12,2)) AS s,
         CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(8,4))) AS DECIMAL(12,4)) AS ss
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
),
p AS (
  SELECT MAX(CASE WHEN l_returnflag = 'A' THEN n END) AS n_a,
         MAX(CASE WHEN l_returnflag = 'A' THEN s END) AS s_a,
         MAX(CASE WHEN l_returnflag = 'A' THEN ss END) AS ss_a,
         MAX(CASE WHEN l_returnflag = 'R' THEN n END) AS n_b,
         MAX(CASE WHEN l_returnflag = 'R' THEN s END) AS s_b,
         MAX(CASE WHEN l_returnflag = 'R' THEN ss END) AS ss_b
  FROM g
),
d AS (
  SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS m_a,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m_b,
         CAST(CAST(n_a * ss_a - s_a * s_a AS DECIMAL(28,4)) AS DOUBLE)
           / CAST(n_a * (n_a - 1) AS DOUBLE) AS var_a,
         CAST(CAST(n_b * ss_b - s_b * s_b AS DECIMAL(28,4)) AS DOUBLE)
           / CAST(n_b * (n_b - 1) AS DOUBLE) AS var_b
  FROM p
)
SELECT n_a, n_b,
       CAST(ROUND(CAST(m_a AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_a,
       CAST(ROUND(CAST(m_b AS DECIMAL(28,9)), 6) AS DOUBLE) AS mean_b,
       CAST(ROUND(CAST((m_a - m_b) / sqrt(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)) AS DECIMAL(28,9)), 6) AS DOUBLE) AS t_stat
FROM d"""


HAS_PARENT_K = 15
HAS_PARENT_PRIORITY = "1-URGENT"


def lineitem_has_parent_topk(
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = HAS_PARENT_K,
) -> DataFrame:
    """ES parent-child `has_parent` query → DF[rank, l_orderkey,
    l_linenumber, score]: children (lineitem) whose PARENT (orders) matches
    the parent query (o_orderpriority = 1-URGENT), scored by the child's
    own revenue, top-k under the engine total order (round6(score) DESC,
    l_orderkey ASC, l_linenumber ASC).

    The mirror of has_child: the PARENT side reduces before the join (a
    bare keyset — the parent predicate never touches child rows), the join
    is key-partitioned (AQE broadcasts the filtered keyset when small; at
    100 TB a 20%-selectivity parent set stays a shuffle join, co-partitioned
    with any bucketed child layout), and the page cut is
    TakeOrderedAndProject — no global sort, no window over child rows."""
    parents = orders.filter(
        F.col("o_orderpriority") == HAS_PARENT_PRIORITY
    ).select("o_orderkey")
    scored = lineitem.join(
        parents, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        round6(_rev().cast("double")).alias("score"),
    )
    page = scored.orderBy(
        F.desc("score"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("l_orderkey"), F.asc("l_linenumber"))
    return page.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "l_orderkey", "l_linenumber", "score"
    )


HAS_PARENT_SQL = f"""WITH s AS (
  SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
         CAST(ROUND(CAST(CAST({_REV_SQL} AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS score
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '{HAS_PARENT_PRIORITY}'
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY score DESC, l_orderkey ASC, l_linenumber ASC) AS rnk
  FROM s
)
SELECT CAST(rnk AS BIGINT) AS rank, l_orderkey, l_linenumber, score
FROM r WHERE rnk <= {HAS_PARENT_K}"""


def lineitem_mad(lineitem: DataFrame) -> DataFrame:
    """ES median_absolute_deviation aggregation per l_returnflag →
    DF[l_returnflag, n, median_e4, mad_e5] (exact scaled BIGINTs — ×1e4 /
    ×1e5): median(|v − median(v)|), the robust dispersion ES pairs with
    the boxplot agg.

    Same engine-exact percentile discipline as lineitem_boxplot (integer
    floor/frac from h = (n−1)/2, bracketing order statistics by conditional
    agg over a row_number window, decimal interpolation — frac ∈ {0, ½} is
    exact decimal(2,1)), applied TWICE: once on v, once on the absolute
    deviations (exact decimals, so the second pass inherits exactness).
    Cost: two per-group-sort window shuffles + a 3-row broadcast join; at
    100 TB the same contract runs on the TDigest/GK sketch path (ES MAD is
    TDigest-backed) with this exact form as its oracle."""
    import decimal as _d

    half = F.lit(_d.Decimal("0.5"))

    def _median(frame, vcol, out_width):
        ws = Window.partitionBy("l_returnflag").orderBy(vcol)
        wa = Window.partitionBy("l_returnflag")
        r = frame.select(
            "l_returnflag", F.col(vcol).alias("x"),
            F.row_number().over(ws).alias("rn"),
            F.count(F.lit(1)).over(wa).alias("n"),
        )
        lo = F.floor((F.col("n") - 1) / F.lit(2.0)).cast("long")
        g = r.groupBy("l_returnflag").agg(
            F.max("n").cast("long").alias("n"),
            F.max(F.when(F.col("rn") == lo + 1, F.col("x"))).alias("xlo"),
            F.max(F.when(F.col("rn") == lo + 2, F.col("x"))).alias("xhi"),
            F.max((F.col("n") - 1) - 2 * lo).cast("long").alias("rem"),
        )
        med = (
            F.col("xlo")
            + (F.coalesce("xhi", "xlo") - F.col("xlo"))
            * (F.col("rem") * half).cast("decimal(2,1)")
        ).cast(out_width)
        return g.select("l_returnflag", "n", med.alias("med"))

    v = lineitem.select(
        "l_returnflag", F.col("l_extendedprice").cast("decimal(12,2)").alias("v")
    )
    m1 = _median(v, "v", "decimal(19,4)")
    dev = v.join(F.broadcast(m1), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("v") - F.col("med")).cast("decimal(20,4)").alias("d"),
    )
    m2 = _median(dev, "d", "decimal(26,5)")
    return (
        m1.join(m2.select("l_returnflag", F.col("med").alias("mad")), "l_returnflag")
        .select(
            "l_returnflag", "n",
            (F.col("med") * 10000).cast("long").alias("median_e4"),
            (F.col("mad") * 100000).cast("long").alias("mad_e5"),
        )
    )


def _mad_median_cte(src: str, xexpr: str, name: str, width: str) -> str:
    return f"""{name}_r AS (
  SELECT l_returnflag, {xexpr} AS x,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY {xexpr}) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM {src}
),
{name}_g AS (
  SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
         MAX(CASE WHEN rn = CAST(floor((n-1)/2.0) AS BIGINT) + 1 THEN x END) AS xlo,
         MAX(CASE WHEN rn = CAST(floor((n-1)/2.0) AS BIGINT) + 2 THEN x END) AS xhi,
         CAST(MAX((n-1) - 2*CAST(floor((n-1)/2.0) AS BIGINT)) AS BIGINT) AS rem
  FROM {name}_r GROUP BY 1
),
{name} AS (
  SELECT l_returnflag, n,
         CAST(xlo + (COALESCE(xhi, xlo) - xlo) * CAST(rem * 0.5 AS DECIMAL(2,1)) AS {width}) AS med
  FROM {name}_g
)"""


MAD_SQL = f"""WITH v AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS v FROM lineitem
),
{_mad_median_cte('v', 'v', 'm1', 'DECIMAL(19,4)')},
dev AS (
  SELECT v.l_returnflag, CAST(abs(v.v - m1.med) AS DECIMAL(20,4)) AS d
  FROM v JOIN m1 USING (l_returnflag)
),
{_mad_median_cte('dev', 'd', 'm2', 'DECIMAL(26,5)')}
SELECT m1.l_returnflag, m1.n,
       CAST(m1.med * 10000 AS BIGINT) AS median_e4,
       CAST(m2.med * 100000 AS BIGINT) AS mad_e5
FROM m1 JOIN m2 ON m1.l_returnflag = m2.l_returnflag"""


def orders_children_agg(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """ES `children` aggregation → DF[o_orderpriority, n_parents,
    n_children, sum_child_revenue_e6]: bucket PARENTS (orders) by priority,
    then aggregate over each bucket's CHILDREN (lineitem) — the agg-side
    sibling of the has_child query.

    Two-level map-combinable shape: children first reduce per
    (priority, parent key) — so the heavy agg runs on the co-partitioned
    join key and the distinct-parent count is a plain COUNT(*) on the
    already-unique second level, never a countDistinct shuffle of raw child
    rows. Revenue exact decimal end-to-end; ships as BIGINT micro-units
    (×1e6 of the scale-6 sum — ≤6.1e15 at sf0.1, int64-safe)."""
    per_parent = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority", "o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nc"),
            F.sum(_rev()).cast("decimal(38,6)").alias("rev"),
        )
    )
    return per_parent.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_parents"),
        F.sum("nc").cast("long").alias("n_children"),
        (F.sum("rev").cast("decimal(26,6)") * 1000000)
        .cast("long")
        .alias("sum_child_revenue_e6"),
    )


CHILDREN_AGG_SQL = f"""WITH per_parent AS (
  SELECT o.o_orderpriority, o.o_orderkey, COUNT(*) AS nc,
         CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_parents,
       CAST(SUM(nc) AS BIGINT) AS n_children,
       CAST(CAST(SUM(rev) AS DECIMAL(26,6)) * 1000000 AS BIGINT) AS sum_child_revenue_e6
FROM per_parent GROUP BY 1"""


# ------------------------------------------------- round-4 session-6 aggs


def orders_stats_bucket(orders: DataFrame) -> DataFrame:
    """ES sibling pipeline aggregations over a monthly date_histogram —
    ``stats_bucket`` (which subsumes min_bucket / max_bucket / avg_bucket /
    sum_bucket) → one-row DF[n_buckets, min_rev_e2, max_rev_e2, sum_rev_e2,
    avg_rev] (revenues as exact BIGINT cents): monthly revenue buckets
    reduced to bucket-level statistics.

    Two-level aggregation: the month group-by is the only events-sized
    exchange; the sibling agg runs on the months-sized frame. min/max/sum
    are exact decimals end-to-end; avg is ONE double division of two exact
    values then round6 (the training_data_stats float-mean remedy —
    never an engine AVG over doubles, whose summation order differs)."""
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(28,2)")
        .alias("revenue")
    )
    from .stats import round6

    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.min("revenue").alias("min_rev"),
        F.max("revenue").alias("max_rev"),
        F.sum("revenue").cast("decimal(30,2)").alias("sum_rev"),
    ).select(
        "n_buckets",
        (F.col("min_rev") * 100).cast("long").alias("min_rev_e2"),
        (F.col("max_rev") * 100).cast("long").alias("max_rev_e2"),
        (F.col("sum_rev") * 100).cast("long").alias("sum_rev_e2"),
        round6(
            F.col("sum_rev").cast("double") / F.col("n_buckets").cast("double")
        ).alias("avg_rev"),
    )


STATS_BUCKET_SQL = """WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS revenue
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets, MIN(revenue) AS min_rev,
         MAX(revenue) AS max_rev,
         CAST(SUM(revenue) AS DECIMAL(30,2)) AS sum_rev
  FROM m
)
SELECT n_buckets,
       CAST(min_rev * 100 AS BIGINT) AS min_rev_e2,
       CAST(max_rev * 100 AS BIGINT) AS max_rev_e2,
       CAST(sum_rev * 100 AS BIGINT) AS sum_rev_e2,
       CAST(ROUND(CAST(CAST(sum_rev AS DOUBLE) / CAST(n_buckets AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_rev
FROM s"""


def orders_bucket_script(orders: DataFrame) -> DataFrame:
    """ES ``bucket_script`` pipeline aggregation → DF[month, n_orders,
    urgent_rev_e2, total_rev_e2, urgent_share, avg_order_value]
    (revenues as exact BIGINT cents): per-month
    derived metrics computed FROM other aggregations' outputs (the
    bucket_script contract) — urgent-priority revenue share and average
    order value.

    One map-combinable group-by (the conditional urgent sum rides the same
    pass — no second scan, no join); the script part is per-bucket scalar
    math on the months-sized frame: exact decimal sums, each ratio ONE
    double division then round6. Priority gate is a startswith, pure
    codegen."""
    urgent = F.when(
        F.col("o_orderpriority").startswith("1-"),
        F.col("o_totalprice").cast("decimal(12,2)"),
    ).otherwise(F.lit(None).cast("decimal(12,2)"))
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.coalesce(F.sum(urgent).cast("decimal(28,2)"), F.lit(0).cast("decimal(28,2)"))
        .alias("urgent_rev"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(28,2)")
        .alias("total_rev"),
    )
    from .stats import round6

    return m.select(
        "month", "n_orders",
        (F.col("urgent_rev") * 100).cast("long").alias("urgent_rev_e2"),
        (F.col("total_rev") * 100).cast("long").alias("total_rev_e2"),
        round6(
            F.col("urgent_rev").cast("double") / F.col("total_rev").cast("double")
        ).alias("urgent_share"),
        round6(
            F.col("total_rev").cast("double") / F.col("n_orders").cast("double")
        ).alias("avg_order_value"),
    )


BUCKET_SCRIPT_SQL = """WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COALESCE(SUM(CASE WHEN o_orderpriority LIKE '1-%'
              THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0)
              AS DECIMAL(28,2)) AS urgent_rev,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS total_rev
  FROM orders GROUP BY 1
)
SELECT month, n_orders,
       CAST(urgent_rev * 100 AS BIGINT) AS urgent_rev_e2,
       CAST(total_rev * 100 AS BIGINT) AS total_rev_e2,
       CAST(ROUND(CAST(CAST(urgent_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS urgent_share,
       CAST(ROUND(CAST(CAST(total_rev AS DOUBLE) / CAST(n_orders AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_order_value
FROM m"""


def lineitem_percentiles_bucket(lineitem: DataFrame) -> DataFrame:
    """ES ``percentiles_bucket`` pipeline aggregation → one-row
    DF[n_buckets, p25_e4, p50_e4, p75_e4] (exact ×1e4 BIGINTs): exact
    linear-interpolated percentiles of the monthly sum(l_quantity) bucket
    values.

    The bucket frame is months-sized BY CONSTRUCTION (pipeline aggs run
    over a histogram's buckets, never the raw rows), so the exact
    order-statistic form costs one tiny sort — the boxplot entry's
    engine-exact discipline (h = (n−1)p, p ∈ {¼,½,¾} → floor/frac exact
    because ÷4 is a power of two; decimal interpolation; no engine
    percentile builtin executes). The only lineitem-sized work is the
    month group-by."""
    import decimal as _d

    m = lineitem.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("decimal(28,2)")
        .alias("v")
    )
    ws = Window.orderBy("v")
    r = m.select(
        "v",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_buckets")]
    for p in (1, 2, 3):
        lo = F.floor(((F.col("n") - 1) * p) / F.lit(4.0)).cast("long")
        aggs += [
            F.max(F.when(F.col("rn") == lo + 1, F.col("v"))).alias(f"lo{p}"),
            F.max(F.when(F.col("rn") == lo + 2, F.col("v"))).alias(f"hi{p}"),
            F.max((F.col("n") - 1) * p - 4 * lo).cast("long").alias(f"rem{p}"),
        ]
    g = r.groupBy().agg(*aggs)
    out = ["n_buckets"]
    cols = []
    for p, name in ((1, "p25_e4"), (2, "p50_e4"), (3, "p75_e4")):
        frac = (F.col(f"rem{p}") * F.lit(_d.Decimal("0.25"))).cast("decimal(3,2)")
        cols.append(
            (
                (
                    F.col(f"lo{p}")
                    + (F.coalesce(f"hi{p}", f"lo{p}") - F.col(f"lo{p}")) * frac
                ).cast("decimal(19,4)") * 10000
            ).cast("long").alias(name)
        )
    return g.select(*out, *cols)


PCTL_BUCKET_SQL = """WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS v
  FROM lineitem GROUP BY 1
),
r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n FROM m
),
g AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_buckets,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*1)/4.0) AS BIGINT) + 1 THEN v END) AS lo1,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*1)/4.0) AS BIGINT) + 2 THEN v END) AS hi1,
         CAST(MAX((n-1)*1 - 4*CAST(floor(((n-1)*1)/4.0) AS BIGINT)) AS BIGINT) AS rem1,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*2)/4.0) AS BIGINT) + 1 THEN v END) AS lo2,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*2)/4.0) AS BIGINT) + 2 THEN v END) AS hi2,
         CAST(MAX((n-1)*2 - 4*CAST(floor(((n-1)*2)/4.0) AS BIGINT)) AS BIGINT) AS rem2,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*3)/4.0) AS BIGINT) + 1 THEN v END) AS lo3,
         MAX(CASE WHEN rn = CAST(floor(((n-1)*3)/4.0) AS BIGINT) + 2 THEN v END) AS hi3,
         CAST(MAX((n-1)*3 - 4*CAST(floor(((n-1)*3)/4.0) AS BIGINT)) AS BIGINT) AS rem3
  FROM r
)
SELECT n_buckets,
       CAST(CAST(lo1 + (COALESCE(hi1, lo1) - lo1) * CAST(rem1 * 0.25 AS DECIMAL(3,2)) AS DECIMAL(19,4)) * 10000 AS BIGINT) AS p25_e4,
       CAST(CAST(lo2 + (COALESCE(hi2, lo2) - lo2) * CAST(rem2 * 0.25 AS DECIMAL(3,2)) AS DECIMAL(19,4)) * 10000 AS BIGINT) AS p50_e4,
       CAST(CAST(lo3 + (COALESCE(hi3, lo3) - lo3) * CAST(rem3 * 0.25 AS DECIMAL(3,2)) AS DECIMAL(19,4)) * 10000 AS BIGINT) AS p75_e4
FROM g"""


# ------------------------------------------------- round-4 session-7

VWH_BUCKETS = 8


def price_variable_width_histogram(orders: DataFrame, b: int = VWH_BUCKETS) -> DataFrame:
    """ES ``variable_width_histogram`` agg (deterministic variant) →
    DF[bucket, min_price_e2, max_price_e2, n_orders, avg_price]
    (prices as exact BIGINT cents): o_totalprice
    split into ``b`` natural clusters. ES's implementation is an online
    shard-local clusterer whose buckets depend on document arrival order —
    unacceptable under invariant #1 — so this entry pins the
    ORDER-INDEPENDENT definition of the same contract: cut the sorted
    DISTINCT values at the b−1 LARGEST adjacent gaps (ties broken by lower
    value ASC). Same promise to the user (buckets hug the data's clusters,
    no fixed interval), reproducible on any engine.

    Exactness: prices quantize to DECIMAL(12,2) (2-dp inputs, exact on
    both engines), gaps are decimal subtractions, the per-bucket mean is
    an exact decimal sum with ONE double division (the stats_bucket
    discipline). The gap ranking runs on the distinct-values frame — a
    global window, fixture-fine; at 100 TB the distinct frame is first
    quantized/sampled (the boxplot→TDigest note), then the same b−1-cut
    runs on the bounded sketch. Bucket assignment is a 7-value broadcast
    array membership count — map-side, no shuffle beyond the distinct."""
    from .stats import round6

    v = F.col("o_totalprice").cast("decimal(12,2)")
    d = orders.select(v.alias("v")).distinct()
    wv = Window.orderBy("v")
    gaps = d.withColumn("gap", F.col("v") - F.lag("v").over(wv)).filter(
        F.col("gap").isNotNull()
    )
    wg = Window.orderBy(F.desc("gap"), F.asc("v"))
    bounds = (
        gaps.withColumn("r", F.row_number().over(wg))
        .filter(F.col("r") <= b - 1)
        .agg(F.sort_array(F.collect_list("v")).alias("bs"))
    )
    assigned = orders.select(v.alias("v")).crossJoin(F.broadcast(bounds)).select(
        "v",
        (
            F.lit(1)
            + F.size(F.filter("bs", lambda x: x <= F.col("v")))
        ).cast("long").alias("bucket"),
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.min("v").alias("min_price"),
            F.max("v").alias("max_price"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("v").cast("decimal(28,2)").alias("_sum"),
        )
        .select(
            "bucket",
            (F.col("min_price") * 100).cast("long").alias("min_price_e2"),
            (F.col("max_price") * 100).cast("long").alias("max_price_e2"),
            "n_orders",
            round6(
                F.col("_sum").cast("double") / F.col("n_orders").cast("double")
            ).alias("avg_price"),
        )
    )


VWH_SQL = f"""WITH d AS (
  SELECT DISTINCT CAST(o_totalprice AS DECIMAL(12,2)) AS v FROM orders
),
gaps AS (
  SELECT v, v - lag(v) OVER (ORDER BY v) AS gap FROM d
),
bounds AS (
  SELECT list_sort(list(v)) AS bs FROM (
    SELECT v, ROW_NUMBER() OVER (ORDER BY gap DESC, v ASC) AS r
    FROM gaps WHERE gap IS NOT NULL
  ) WHERE r <= {VWH_BUCKETS - 1}
),
assigned AS (
  SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS v,
         1 + len(list_filter(bs, x -> x <= CAST(o_totalprice AS DECIMAL(12,2)))) AS bucket
  FROM orders, bounds
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(MIN(v) * 100 AS BIGINT) AS min_price_e2,
       CAST(MAX(v) * 100 AS BIGINT) AS max_price_e2,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(CAST(CAST(CAST(SUM(v) AS DECIMAL(28,2)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_price
FROM assigned GROUP BY 1"""


Q3_CUTOFF = "1997-01-01"
Q3_SEGMENT = "BUILDING"


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    cutoff: str = Q3_CUTOFF,
    segment: str = Q3_SEGMENT,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 (shipping priority) → DF[l_orderkey, o_orderdate,
    o_orderpriority, revenue, n_items]: unshipped-revenue top-10 — orders
    from one market segment placed before the cutoff whose line items
    shipped after it, ranked by order revenue.

    Plan shape: both date filters push into the scans BEFORE the fact
    chain (l_shipdate on lineitem, o_orderdate on orders — at 100 TB this
    is most of the win; the joins see only the filtered slices), the
    segment-filtered customer keyset joins on custkey, the top-10 is
    TakeOrderedAndProject. Ranking compares the EXACT decimal revenue
    (quantized per-row contributions, exact sum — no float order
    anywhere), ties break (o_orderdate ASC, l_orderkey ASC), the Q3
    output order made total."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = lineitem.filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    ).select("l_orderkey", _rev().alias("rev"))
    g = (
        li.join(ords.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.hint("merge"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum("rev").cast("decimal(28,6)").alias("rev_d"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )
    return (
        g.orderBy(F.desc("rev_d"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(k)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            F.round(F.col("rev_d").cast("double"), 6).alias("revenue"),
            "n_items",
        )
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       ROUND(CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) AS DOUBLE), 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10"""


Q10_START = "1996-01-01"   # one-quarter window [start, end)
Q10_END = "1996-04-01"
Q10_K = 20


def returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    k: int = Q10_K,
) -> DataFrame:
    """TPC-H Q10 (returned-item reporting) → DF[c_custkey, c_name, n_name,
    revenue, n_items]: customers who returned items (l_returnflag = 'R')
    on orders placed in one quarter, ranked by lost revenue — the classic
    4-table chain (lineitem ⋈ orders ⋈ customer ⋈ nation).

    Plan: the quarter predicate pushes into the orders scan and the
    returnflag predicate into the lineitem scan before the fact chain;
    nation (25 rows) broadcasts; revenue accumulates as the exact
    quantized decimal the whole tpch family uses (_rev); top-20 is
    TakeOrderedAndProject on (revenue DESC, c_custkey ASC) — decimal
    compare, total order."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev().alias("rev")
    )
    g = (
        li.join(ords.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_name", "c_nationkey").hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum("rev").cast("decimal(28,6)").alias("rev_d"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )
    return (
        g.orderBy(F.desc("rev_d"), F.asc("c_custkey"))
        .limit(k)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            F.round(F.col("rev_d").cast("double"), 6).alias("revenue"),
            "n_items",
        )
    )


RETURNED_ITEMS_SQL = f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       ROUND(CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) AS DOUBLE), 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_END} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) DESC, c_custkey ASC
LIMIT {Q10_K}"""


# --------------------------------------------------------------- round-4 s9
# TPC-H join-breadth completion: the Q4 / Q6 / Q7 / Q14 / Q18 / Q19 / Q22
# query SHAPES (semi-join, pure scan-agg, nation-pair 6-way chain, promo
# ratio, HAVING group filter, OR-of-ANDs pushdown, scalar-subquery +
# anti-join) adapted to the fixture schema — no partsupp / l_shipmode /
# l_commitdate / c_phone columns exist (FIXTURES.md §A), so each query
# keeps the reference query's PLAN shape and swaps the missing predicate
# for an equivalent one on available columns. Float discipline and join
# strategy follow the module header.

Q4_START = "1997-01-01"   # one-quarter window [start, end)
Q4_END = "1997-04-01"


def order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 (order-priority checking) → DF[o_orderpriority, n_orders]:
    orders placed in one quarter having at least one RETURNED line item
    (l_returnflag = 'R' replaces the reference's commitdate < receiptdate —
    the fixture carries no commit/receipt dates), counted by priority.

    Plan: the quarter predicate pushes into the orders scan and the
    returnflag predicate into the lineitem scan; the EXISTS is a LEFT SEMI
    join (never duplicates orders, never materializes match counts) on the
    two filtered slices — both sides grow with SF, so it shuffles on
    orderkey (SMJ), then one tiny 5-group aggregate."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    li = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(
            li.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1"""


Q6_START = "1996-01-01"   # one-year window [start, end)
Q6_END = "1997-01-01"


def revenue_forecast(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) → DF[revenue, n_items]: the
    discount revenue that would vanish if discounts in [0.03, 0.07] on
    small (< 25) quantities were eliminated for one shipping year.

    Plan: a PURE scan-side aggregate — every predicate (two date bounds,
    two discount bounds, the quantity bound) reaches PushedFilters, no
    join, no shuffle beyond the 1-row partial+final agg. Per-row
    l_extendedprice·l_discount is 6-dp-quantized then summed as exact
    decimal (module float policy)."""
    disc = F.round(F.col("l_extendedprice") * F.col("l_discount"), 6).cast(
        "decimal(28,6)"
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25.0)
        )
        .agg(
            F.round(F.sum(disc).cast("double"), 6).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


REVENUE_FORECAST_SQL = f"""
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * l_discount, 6) AS DECIMAL(28,6))) AS DOUBLE), 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_END} 00:00:00'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 25.0"""


Q7_START = "1996-01-01"   # two shipping years [start, end)
Q7_END = "1998-01-01"


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 (volume shipping) → DF[supp_nation, cust_nation, l_year,
    revenue, n_items]: revenue shipped between every distinct (supplier
    nation → customer nation) pair over two years — the widest fact chain
    in the family (lineitem ⋈ supplier ⋈ orders ⋈ customer) with the
    nation dim broadcast TWICE under different roles.

    The reference query pins two specific nations; the fixture keeps all
    cross-nation pairs (supp ≠ cust) so the result is non-degenerate at
    every SF while the plan shape — date bounds pushed into the lineitem
    scan, three SMJ fact joins, two 25-row broadcasts, inequality applied
    after the broadcasts — is exactly Q7's."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q7_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_END).cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        _rev().alias("rev"),
        F.year("l_shipdate").cast("long").alias("l_year"),
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(
            supplier.select("s_suppkey", "s_nationkey").hint("merge"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey").hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum("rev").cast("double"), 6).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


VOLUME_SHIPPING_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier  ON l_suppkey = s_suppkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q7_END} 00:00:00'
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3"""


Q14_START = "1997-09-01"   # one-month window [start, end)
Q14_END = "1997-10-01"


def promo_effect(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 (promotion effect) → DF[promo_pct, promo_revenue,
    total_revenue, n_items]: the percentage of one month's revenue that
    came from PROMO-type parts (the fixture's p_type is the single word
    the reference embeds as a prefix).

    Plan: the month bounds push into the lineitem scan; lineitem ⋈ part is
    an SMJ (part grows with SF — a 60k-fixture broadcast pick would OOM at
    real scale); both revenue branches accumulate as exact decimal. The
    ratio is the repo's division discipline: exact decimal sums, ONE
    pinned double op sequence (cast, ×100.0, divide), round6 quantize —
    decimal×100 in-engine is avoided entirely because Spark widens a
    decimal(38,6)×int product by dropping scale silently (CLAUDE.md
    round-3 sharp edge)."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_END).cast("timestamp"))
    ).select("l_partkey", _rev().alias("rev"))
    zero = F.lit(0).cast("decimal(28,6)")
    g = (
        li.join(
            part.select("p_partkey", "p_type").hint("merge"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(zero))
            .cast("decimal(28,6)")
            .alias("promo_d"),
            F.sum("rev").cast("decimal(28,6)").alias("tot_d"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )
    pct = (F.col("promo_d").cast("double") * F.lit(100.0)) / F.col("tot_d").cast(
        "double"
    )
    return g.select(
        round6(pct).alias("promo_pct"),
        F.round(F.col("promo_d").cast("double"), 6).alias("promo_revenue"),
        F.round(F.col("tot_d").cast("double"), 6).alias("total_revenue"),
        "n_items",
    )


PROMO_EFFECT_SQL = f"""
WITH g AS (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                       ELSE CAST(0 AS DECIMAL(28,6)) END) AS DECIMAL(28,6)) AS promo_d,
         CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) AS tot_d,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q14_END} 00:00:00'
)
SELECT CAST(ROUND(CAST(CAST(promo_d AS DOUBLE) * 100.0 / CAST(tot_d AS DOUBLE) AS DECIMAL(28,9)), 6) AS DOUBLE) AS promo_pct,
       ROUND(CAST(promo_d AS DOUBLE), 6) AS promo_revenue,
       ROUND(CAST(tot_d AS DOUBLE), 6) AS total_revenue,
       n_items
FROM g"""


Q18_MIN_QTY = 200   # "large volume" threshold on Σ l_quantity per order
Q18_K = 100


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    k: int = Q18_K,
    min_qty: int = Q18_MIN_QTY,
) -> DataFrame:
    """TPC-H Q18 (large-volume customer) → DF[c_name, c_custkey,
    o_orderkey, o_orderdate, o_totalprice, total_qty]: orders whose total
    line quantity exceeds the threshold, with their customers, ranked by
    quantity.

    Plan: the HAVING filter runs on the lineitem-only aggregate FIRST —
    the orders/customer chain joins against the (tiny) surviving keyset,
    not the raw fact table; quantity sums as exact decimal(12,2) (the
    fixture's quantities are integral doubles, but the decimal
    accumulator keeps the compare and the rank key order-independent on
    both engines); top-k is TakeOrderedAndProject on (qty DESC,
    o_orderkey ASC)."""
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(28,2)")
            .alias("qty_d")
        )
        .filter(F.col("qty_d") > F.lit(min_qty))
    )
    j = per_order.join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice").hint(
            "merge"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).join(
        customer.select("c_custkey", "c_name").hint("merge"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        j.orderBy(F.desc("qty_d"), F.asc("o_orderkey"))
        .limit(k)
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 6).alias("o_totalprice"),
            F.col("qty_d").cast("double").alias("total_qty"),
        )
    )


LARGE_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS qty_d
  FROM lineitem GROUP BY 1
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) > {Q18_MIN_QTY}
)
SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 6) AS o_totalprice,
       CAST(qty_d AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY qty_d DESC, o_orderkey ASC
LIMIT {Q18_K}"""


#: Q19's three (brand, size-range, quantity-range) clauses — the fixture's
#: brands are Brand#1..Brand#25, sizes 1..50, quantities 1..50.
Q19_CLAUSES = (
    ("Brand#3", 1, 15, 1, 20),
    ("Brand#15", 10, 30, 5, 25),
    ("Brand#21", 20, 50, 20, 40),
)


def discount_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 (discounted revenue) → DF[revenue, n_items]: revenue from
    line items matching ANY of three (brand, part-size range, quantity
    range) clause conjunctions — the classic OR-of-ANDs predicate.

    Plan: the quantity envelope (the OR's per-table projection: qty
    between the min of all lows and the max of all highs) and the brand
    IN-list both reach PushedFilters on their respective scans, so the
    SMJ joins only candidate rows; the exact OR applies post-join."""
    qlo = min(c[3] for c in Q19_CLAUSES)
    qhi = max(c[4] for c in Q19_CLAUSES)
    li = lineitem.filter(
        (F.col("l_quantity") >= float(qlo)) & (F.col("l_quantity") <= float(qhi))
    ).select("l_partkey", "l_quantity", _rev().alias("rev"))
    pt = part.filter(
        F.col("p_brand").isin([c[0] for c in Q19_CLAUSES])
    ).select("p_partkey", "p_brand", "p_size")
    cond = None
    for brand, slo, shi, lo, hi in Q19_CLAUSES:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & (F.col("l_quantity") >= float(lo))
            & (F.col("l_quantity") <= float(hi))
        )
        cond = c if cond is None else (cond | c)
    return (
        li.join(pt.hint("merge"), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum("rev").cast("double"), 6).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def _q19_clause_sql() -> str:
    parts = [
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {lo}.0 AND {hi}.0)"
        for b, slo, shi, lo, hi in Q19_CLAUSES
    ]
    return "\n   OR ".join(parts)


DISCOUNT_REVENUE_SQL = f"""
SELECT ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_q19_clause_sql()}"""


Q22_CUTOFF = "2000-01-01"   # "lapsed" = no orders on/after this date


def idle_customers(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) → DF[n_name, n_custs,
    total_acctbal]: above-average-balance customers with NO recent orders
    (the reference's "never ordered" is degenerate on the fixture — every
    customer has orders — so the anti-join keys on orders placed after
    the cutoff; same plan shape), grouped by nation instead of the
    missing phone country code.

    Plan: the threshold is a 1-row broadcast (exact decimal sum → ONE
    double division), the candidate set crossJoins it (never shuffles),
    the NOT EXISTS is a LEFT ANTI SMJ against the date-filtered orders
    slice, nation broadcasts for the name."""
    pos = customer.filter(F.col("c_acctbal") > 0.0)
    avg_row = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    cand = (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        cand.join(
            recent.hint("merge"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double"), 6
            ).alias("total_acctbal"),
        )
    )


IDLE_CUSTOMERS_SQL = f"""
WITH a AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_acctbal
FROM customer CROSS JOIN a
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > a.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY 1"""


# ------------------------------------------------------------ round-4 s9b
# Second TPC-H wave: Q8 / Q13 / Q15 / Q17 / Q21 shapes (share-of-group
# division, left-outer distribution, agg-max scalar subquery, correlated
# avg threshold by cross-multiplication, sole-blame exists/not-exists as
# one aggregate). Same schema-adaptation and float rules as the first wave.

Q8_START = "1996-01-01"   # two order years [start, end)
Q8_END = "1998-01-01"


def regional_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q8 (national market share) shape → DF[r_name, o_year,
    local_share, local_revenue, total_revenue, n_items]: per customer
    region and order year, the fraction of revenue supplied from WITHIN
    that region (the reference pins one nation's share of one region —
    the fixture keeps every region so the result is non-degenerate at
    every SF; the plan is identical: the revenue rows fan out through the
    full 7-table chain, the share is a conditional sum over the same
    rows).

    Plan: two-year bound pushed into the orders scan, four SMJ fact
    joins (lineitem ⋈ supplier is the extra hop Q7 lacks on the customer
    side), nation broadcast twice + region broadcast once; the share is
    exact-decimal local/total sums and ONE pinned double division."""
    li = lineitem.select("l_orderkey", "l_suppkey", _rev().alias("rev"))
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
    ).select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    n_c = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_region")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("s_region")
    )
    zero = F.lit(0).cast("decimal(28,6)")
    g = (
        li.join(ords.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey").hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey").hint("merge"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("c_region") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "o_year")
        .agg(
            F.sum(
                F.when(F.col("s_region") == F.col("c_region"), F.col("rev")).otherwise(
                    zero
                )
            )
            .cast("decimal(28,6)")
            .alias("local_d"),
            F.sum("rev").cast("decimal(28,6)").alias("tot_d"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )
    share = F.col("local_d").cast("double") / F.col("tot_d").cast("double")
    return g.select(
        "r_name",
        "o_year",
        round6(share).alias("local_share"),
        F.round(F.col("local_d").cast("double"), 6).alias("local_revenue"),
        F.round(F.col("tot_d").cast("double"), 6).alias("total_revenue"),
        "n_items",
    )


REGIONAL_SHARE_SQL = f"""
WITH g AS (
  SELECT r.r_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CASE WHEN sn.n_regionkey = cn.n_regionkey THEN {_REV_SQL}
                       ELSE CAST(0 AS DECIMAL(28,6)) END) AS DECIMAL(28,6)) AS local_d,
         CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) AS tot_d,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN region r  ON cn.n_regionkey = r.r_regionkey
  WHERE o_orderdate >= TIMESTAMP '{Q8_START} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q8_END} 00:00:00'
  GROUP BY 1, 2
)
SELECT r_name, o_year,
       CAST(ROUND(CAST(CAST(local_d AS DOUBLE) / CAST(tot_d AS DOUBLE)
            AS DECIMAL(28,9)), 6) AS DOUBLE) AS local_share,
       ROUND(CAST(local_d AS DOUBLE), 6) AS local_revenue,
       ROUND(CAST(tot_d AS DOUBLE), 6) AS total_revenue,
       n_items
FROM g"""


Q13_EXCLUDED_PRIORITY = "1-URGENT"


def customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 (customer distribution) → DF[c_count, custdist]: the
    histogram of per-customer order counts, INCLUDING zero-order
    customers — the reference excludes orders by a comment pattern (no
    comment column in the fixture), this adaptation excludes one
    priority class; the defining plan feature survives: a LEFT OUTER
    join so customers with no qualifying orders land in the c_count = 0
    bucket, then a second aggregate over the first."""
    ords = orders.filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    ).select("o_custkey")
    per_cust = (
        customer.select("c_custkey")
        .join(
            ords.hint("merge"), F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


CUSTOMER_DISTRIBUTION_SQL = f"""
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (SELECT o_custkey FROM orders
             WHERE o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}') o
    ON c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY 1"""


Q15_START = "1996-10-01"   # one-quarter window [start, end)
Q15_END = "1997-01-01"


def top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 (top supplier) → DF[s_suppkey, s_name, total_revenue]:
    the supplier(s) whose quarter revenue equals the maximum — the
    reference's revenue view + scalar MAX subquery.

    Plan: revenue aggregates per suppkey from the date-sliced lineitem
    scan alone; the 1-row MAX re-aggregates that (tiny) frame and joins
    back as a broadcast, so the fact table is read ONCE; the equality
    compares exact decimals (a double max would tie-break differently
    across engines). Supplier joins in last, for names only."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("decimal(28,6)").alias("rev_d"))
    )
    mx = rev.agg(F.max("rev_d").alias("max_d"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_d") == F.col("max_d"))
        .join(
            supplier.select("s_suppkey", "s_name").hint("merge"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.round(F.col("rev_d").cast("double"), 6).alias("total_revenue"),
        )
    )


TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DECIMAL(28,6)) AS rev_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_END} 00:00:00'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       ROUND(CAST(rev_d AS DOUBLE), 6) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_d = (SELECT MAX(rev_d) FROM rev)"""


Q17_BRAND = "Brand#5"


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) → DF[avg_weekly_revenue,
    total_revenue, n_items]: revenue lost if orders of one brand below
    20% of that part's average order quantity were no longer taken.

    The correlated subquery (l_quantity < 0.2·AVG per part) is decided
    WITHOUT any division: l_quantity · 5 · n(part) < Σ quantity(part) in
    exact decimal cross-multiplication — engine-identical where a
    0.2·avg double threshold could flip rows at the boundary. Plan: the
    brand keyset filters lineitem FIRST (broadcast-size at any SF: one
    brand is 1/25 of parts — but part still joins SMJ per module
    policy), the per-part aggregate joins back to the same filtered
    rows; /7.0 is the reference's weekly scaling, ONE double division."""
    pa = part.filter(F.col("p_brand") == Q17_BRAND).select("p_partkey")
    li = lineitem.join(
        pa.hint("merge"), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty_d"),
        _rev().alias("rev"),
    )
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty_d").cast("decimal(28,2)").alias("sum_qty"),
    )
    small = li.join(
        per_part.hint("merge"), F.col("l_partkey") == F.col("agg_partkey")
    ).filter(
        F.col("qty_d") * F.lit(5) * F.col("n") < F.col("sum_qty")
    )
    g = small.agg(
        F.sum("rev").cast("decimal(28,6)").alias("tot_d"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    weekly = F.col("tot_d").cast("double") / F.lit(7.0)
    return g.select(
        round6(weekly).alias("avg_weekly_revenue"),
        F.round(F.col("tot_d").cast("double"), 6).alias("total_revenue"),
        "n_items",
    )


SMALL_QUANTITY_SQL = f"""
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty_d, {_REV_SQL} AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
per_part AS (
  SELECT l_partkey AS agg_partkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qty_d) AS DECIMAL(28,2)) AS sum_qty
  FROM li GROUP BY 1
),
g AS (
  SELECT CAST(SUM(rev) AS DECIMAL(28,6)) AS tot_d,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM li JOIN per_part ON l_partkey = agg_partkey
  WHERE qty_d * 5 * n < sum_qty
)
SELECT CAST(ROUND(CAST(CAST(tot_d AS DOUBLE) / 7.0 AS DECIMAL(28,9)), 6) AS DOUBLE) AS avg_weekly_revenue,
       ROUND(CAST(tot_d AS DOUBLE), 6) AS total_revenue,
       n_items
FROM g"""


Q21_K = 25


def blamed_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    k: int = Q21_K,
) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) shape →
    DF[s_name, n_name, numwait]: per supplier, the count of finalized
    multi-supplier orders where that supplier was the ONLY one whose
    line items were returned (l_returnflag = 'R' replaces the missing
    receipt/commit-date lateness; "sole blame" preserves the reference's
    EXISTS other-supplier / NOT EXISTS other-late-supplier structure).

    Plan: the reference's two correlated lineitem self-joins are
    rewritten as ONE aggregate per order (distinct suppliers, distinct
    returned suppliers, the single returned suppkey via a conditional
    max) — the scale-right form: lineitem is scanned once, the blame
    assignment is a filter on a per-order frame that is strictly smaller
    than lineitem, and the per-supplier count is map-combinable. Top-25
    is TakeOrderedAndProject on (numwait DESC, s_name ASC)."""
    fo = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    per_order = (
        li.join(fo.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("ret"), F.col("l_suppkey"))
            ).alias("n_ret_supp"),
            F.max(F.when(F.col("ret"), F.col("l_suppkey"))).alias("blame_key"),
        )
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
    )
    g = blamed.groupBy("blame_key").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    j = g.join(
        supplier.select("s_suppkey", "s_name", "s_nationkey").hint("merge"),
        F.col("blame_key") == F.col("s_suppkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        j.orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
        .select("s_name", "n_name", "numwait")
    )


BLAMED_SUPPLIERS_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp,
         MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blame_key
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1
),
g AS (
  SELECT blame_key, CAST(COUNT(*) AS BIGINT) AS numwait
  FROM per_order WHERE n_supp >= 2 AND n_ret_supp = 1
  GROUP BY 1
)
SELECT s_name, n_name, numwait
FROM g
JOIN supplier ON blame_key = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
ORDER BY numwait DESC, s_name ASC
LIMIT {Q21_K}"""


# --------------------------------------------------------------------------
# Round-4 session-10: the six remaining TPC-H query shapes (Q2, Q9, Q11,
# Q12, Q16, Q20).  These are the queries whose reference text needs the
# partsupp table (supplier-part availability/cost) or ship/commit/receipt
# columns the fixture schema does not carry.  The established adaptation
# policy applies: keep the reference query's PLAN SHAPE (the joins, the
# correlated-aggregate structure, the semi/anti forms, where each predicate
# pushes) and swap only the missing column, documenting the swap on the
# docstring.  The partsupp relation is derived deterministically from
# lineitem itself: DISTINCT (l_partkey, l_suppkey) with MIN(l_extendedprice)
# as the supply-cost stand-in — the natural "who supplies what, at what
# price" evidence the fact table already carries.

Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"
Q2_MAX_SIZE = 25
Q2_K = 100


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    k: int = Q2_K,
) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) shape → DF[s_acctbal, s_name,
    n_name, p_partkey, supply_cost]: for every qualifying part, the
    region's supplier(s) offering it at the minimum cost — the family's
    canonical correlated-MIN subquery.

    Fixture swaps (documented per adaptation policy): partsupp →
    DISTINCT (l_partkey, l_suppkey) pairs from lineitem with
    MIN(l_extendedprice) as ps_supplycost; ``p_type LIKE '%BRASS' AND
    p_size = 15`` → ``p_type = 'STANDARD' AND p_size <= 25`` (the
    single-word fixture p_type carries no suffix to LIKE on).

    Plan: supplier ⋈ broadcast(nation ⋈ broadcast(region filtered))
    restricts the pair relation to one region BEFORE the per-part MIN —
    exactly where the reference's correlated subquery scopes it; the
    part filter pushes into the part scan; the MIN re-aggregates the
    (already small) region-scoped pair frame and joins back on exact
    decimal equality (a double min would tie-break differently across
    engines).  Top-k total order is (acctbal DESC, n_name, s_name,
    p_partkey) on the exact decimal balance — TakeOrderedAndProject."""
    cost = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("cost_d"))
    )
    rkeys = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q2_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(rkeys), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(
        "s_suppkey",
        "s_name",
        "n_name",
        F.col("s_acctbal").cast("decimal(18,2)").alias("acct_d"),
    )
    pa = part.filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    ).select("p_partkey")
    scoped = cost.join(
        sup.hint("merge"), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(pa.hint("merge"), F.col("l_partkey") == F.col("p_partkey"))
    min_cost = scoped.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.min("cost_d").alias("min_cost")
    )
    return (
        scoped.join(
            min_cost.hint("merge"),
            (F.col("l_partkey") == F.col("agg_partkey"))
            & (F.col("cost_d") == F.col("min_cost")),
        )
        .orderBy(
            F.desc("acct_d"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(k)
        .select(
            F.col("acct_d").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.col("cost_d").cast("double").alias("supply_cost"),
        )
    )


MIN_COST_SUPPLIER_SQL = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_d
  FROM lineitem GROUP BY 1, 2
),
sup AS (
  SELECT s_suppkey, s_name, n_name,
         CAST(s_acctbal AS DECIMAL(18,2)) AS acct_d
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
),
scoped AS (
  SELECT * FROM cost
  JOIN sup ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
)
SELECT CAST(acct_d AS DOUBLE) AS s_acctbal, s_name, n_name,
       CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(cost_d AS DOUBLE) AS supply_cost
FROM scoped
WHERE cost_d = (SELECT MIN(s2.cost_d) FROM scoped s2
                WHERE s2.l_partkey = scoped.l_partkey)
ORDER BY acct_d DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {Q2_K}"""


Q9_NOUN = "bolt"   # p_name LIKE '%bolt' replaces the reference's '%green%'


def product_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 (product-type profit) shape → DF[nation, o_year,
    sum_profit, n_items]: per supplier nation and order year, the profit
    on parts matching a name pattern — profit = revenue − supply cost ·
    quantity.

    Fixture swap: ps_supplycost → 0.1 · p_retailprice (a per-part cost
    fraction; partsupp is absent).  The cost term is computed ENTIRELY in
    exact decimals — qty and retailprice are exact 2-dp-grid casts, 0.1
    is a decimal(2,1) literal — so the profit sum has no double rounding
    anywhere before the one output conversion (the plain ROUND(x,6)
    double path would sit on engine-divergent half boundaries for a
    three-factor product).

    Plan: the name filter pushes into the part scan (StringEndsWith);
    lineitem ⋈ part, ⋈ supplier, ⋈ orders are all SMJ (every side grows
    with SF); nation broadcasts; the 5-way chain aggregates once on
    (nation, year)."""
    pa = part.filter(F.col("p_name").endswith(Q9_NOUN)).select(
        "p_partkey", F.col("p_retailprice").cast("decimal(12,2)").alias("rp_d")
    )
    cost = (
        (F.col("l_quantity").cast("decimal(12,2)") * F.col("rp_d"))
        .cast("decimal(28,4)")
        * F.lit("0.1").cast("decimal(2,1)")
    )
    li = lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", _rev().alias("rev"),
    )
    j = (
        li.join(pa.hint("merge"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            supplier.select("s_suppkey", "s_nationkey").hint("merge"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select(
                "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
            ).hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    amount = F.col("rev") - cost
    return (
        j.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            F.round(F.sum(amount).cast("double"), 6).alias("sum_profit"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(
         {_REV_SQL}
         - CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) AS DECIMAL(28,4))
           * CAST('0.1' AS DECIMAL(2,1))
       ) AS DOUBLE), 6) AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NOUN}'
GROUP BY 1, 2"""


Q11_REGION = "EUROPE"


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q11 (important stock identification) shape → DF[p_partkey,
    value]: parts whose traded value through one region's suppliers
    exceeds a fraction of the region's total — the scalar-subquery
    HAVING over a grouped value.

    Fixture swaps: ps_supplycost·ps_availqty → the lineitem revenue
    through the region's suppliers; the reference's one nation →  one
    REGION (the smallest fixture SF has ~1 supplier per nation — a
    nation filter would be degenerate); the 0.0001 total fraction → the
    mean part value (value·n_parts > total), scale-stable because both
    sides grow identically with SF.

    Plan: supplier scopes to the region via two broadcast dims; the
    scope applies to lineitem as a LEFT SEMI join BEFORE the per-part
    aggregate (the reference's WHERE ps_suppkey IN region-suppliers);
    the grand total re-aggregates the (part-sized) value frame and
    broadcasts back as ONE row; the threshold is exact-decimal
    cross-multiplication — value·n > total — with NO division (a double
    fraction could flip boundary parts between engines)."""
    rkeys = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q11_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    sup = supplier.join(
        F.broadcast(rkeys), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    value = (
        lineitem.join(
            sup.hint("merge"), F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).cast("decimal(20,6)").alias("value_d"))
    )
    tot = value.agg(
        F.sum("value_d").cast("decimal(28,6)").alias("total_d"),
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n_parts"),
    )
    return (
        value.crossJoin(F.broadcast(tot))
        .filter(F.col("value_d") * F.col("n_parts") > F.col("total_d"))
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            F.round(F.col("value_d").cast("double"), 6).alias("value"),
        )
    )


IMPORTANT_STOCK_SQL = f"""
WITH sup AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
),
value AS (
  SELECT l_partkey, CAST(SUM({_REV_SQL}) AS DECIMAL(20,6)) AS value_d
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM sup)
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(value_d) AS DECIMAL(28,6)) AS total_d,
         CAST(COUNT(*) AS DECIMAL(9,0)) AS n_parts
  FROM value
)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       ROUND(CAST(value_d AS DOUBLE), 6) AS value
FROM value, tot
WHERE value_d * n_parts > total_d"""


Q12_START = "1997-01-01"   # one shipping year [start, end)
Q12_END = "1998-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def shipping_modes(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority) shape →
    DF[l_linestatus, high_line_count, low_line_count]: per mode class,
    how many shipped line items belonged to urgent/high-priority orders
    vs the rest.

    Fixture swaps: l_shipmode IN ('MAIL','SHIP') → the l_linestatus
    classes (the fixture carries no shipmode); the commitdate <
    receiptdate lateness chain → one shipdate year window (no
    commit/receipt dates).

    Plan: the year window pushes into the lineitem scan; lineitem ⋈
    orders is SMJ on orderkey; the priority CASE folds into two
    map-combinable conditional sums over 2 groups — Q12's exact
    aggregate shape."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q12_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_END).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.join(
            orders.select("o_orderkey", "o_orderpriority").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


SHIPPING_MODES_SQL = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q12_END} 00:00:00'
GROUP BY 1"""


Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (3, 7, 11, 14, 19, 23, 31, 42)
Q16_COMPLAINT_BAL = 2000.0


def parts_supplier_relation(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) shape → DF[p_brand,
    p_type, p_size, supplier_cnt]: how many suppliers can supply each
    qualifying (brand, type, size) — excluding a fixed "complaints"
    supplier subset.

    Fixture swaps: partsupp → DISTINCT (l_partkey, l_suppkey) from
    lineitem; ``s_comment LIKE '%Customer%Complaints%'`` →
    ``s_acctbal < 2000`` (no comment column; the balance gate is a
    similarly-arbitrary fixed subset, non-degenerate at every SF);
    ``p_type NOT LIKE 'MEDIUM POLISHED%'`` → one excluded single-word
    type.

    Plan: the brand/type exclusions and the size IN-list all push into
    the part scan (In + Not(EqualTo)); the complaint subset excludes by
    LEFT ANTI on suppkey (the reference's NOT IN — never duplicates,
    NULL-safe by construction since keys are non-null); COUNT(DISTINCT
    l_suppkey) per 3-col group is the one shuffle that matters and is
    partial-aggregatable on (group, suppkey)."""
    pa = part.filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & (F.col("p_size").isin(*Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_acctbal") < Q16_COMPLAINT_BAL).select(
        "s_suppkey"
    )
    return (
        pairs.join(
            bad.hint("merge"), F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(pa.hint("merge"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


PARTS_SUPPLIER_SQL = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_COMPLAINT_BAL})
GROUP BY 1, 2, 3"""


Q20_PREFIX = "large"       # p_name LIKE 'large%' replaces 'forest%'
Q20_REGION = "EUROPE"      # region scope replaces the one-nation filter
Q20_START = "1997-01-01"   # one shipping year [start, end)
Q20_END = "1998-01-01"


def promotion_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q20 (potential part promotion) shape → DF[s_suppkey,
    s_name, n_name]: suppliers in one region holding a concentrated
    position in a part family — the nested per-(supplier, part)
    aggregate threshold feeding a supplier semi-join.

    Fixture swaps: ``ps_availqty > 0.5 · qty shipped in the year`` →
    ``qty shipped in the year > 0.5 · all-time qty`` for that
    (supplier, part) — the same half-threshold against the same inner
    aggregate, decidable from lineitem alone; nation = 'CANADA' → one
    REGION (smallest-SF nations hold ~1 supplier); p_name 'forest%' →
    'large%'.

    Plan: the name prefix pushes into the part scan (StringStartsWith)
    and semi-joins lineitem FIRST (the reference's innermost IN); the
    per-pair aggregate computes both windowed and total quantity in ONE
    pass (conditional sum — lineitem is scanned once, not twice); the
    half threshold is exact-decimal cross-multiplication (qty_win·2 >
    qty_tot, no 0.5 double); qualifying suppliers dedupe map-side and
    LEFT SEMI the region-scoped supplier dim."""
    pa = part.filter(F.col("p_name").startswith(Q20_PREFIX)).select("p_partkey")
    in_win = (F.col("l_shipdate") >= F.lit(Q20_START).cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(Q20_END).cast("timestamp")
    )
    qty_d = F.col("l_quantity").cast("decimal(12,2)")
    zero = F.lit(0).cast("decimal(12,2)")
    per_pair = (
        lineitem.join(
            pa.hint("merge"), F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_win, qty_d).otherwise(zero))
            .cast("decimal(28,2)")
            .alias("qty_win"),
            F.sum(qty_d).cast("decimal(28,2)").alias("qty_tot"),
        )
    )
    qualifying = (
        per_pair.filter(F.col("qty_win") * F.lit(2) > F.col("qty_tot"))
        .select("l_suppkey")
        .distinct()
    )
    rkeys = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q20_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        supplier.join(
            F.broadcast(rkeys), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            qualifying.hint("merge"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
    )


PROMOTION_SUPPLIERS_SQL = f"""
WITH per_pair AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_START} 00:00:00'
                        AND l_shipdate <  TIMESTAMP '{Q20_END} 00:00:00'
                       THEN CAST(l_quantity AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(28,2)) AS qty_win,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS qty_tot
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PREFIX}%')
  GROUP BY 1, 2
),
qualifying AS (
  SELECT DISTINCT l_suppkey FROM per_pair WHERE qty_win * 2 > qty_tot
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (SELECT l_suppkey FROM qualifying)"""
