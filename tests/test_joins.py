"""Multi-way join operators vs independent pandas references (sf0.001).

The DuckDB driver oracle checks these end-to-end at sf0.01; here the join
semantics are pinned against from-scratch pandas merges — a third code path."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tpch(spark):
    return {
        name: spark.read.parquet(str(SF_SMOKE / f"{name}.parquet"))
        for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    }


def test_revenue_by_nation_matches_pandas(spark, tpch):
    from sparksearch.joins import revenue_by_nation

    got = {
        (r.r_name, r.n_name, r.o_year): (round(float(r.revenue), 4), r.n_lineitems)
        for r in revenue_by_nation(
            tpch["lineitem"], tpch["orders"], tpch["customer"],
            tpch["nation"], tpch["region"],
        ).collect()
    }
    li = tpch["lineitem"].toPandas()
    od = tpch["orders"].toPandas()
    cu = tpch["customer"].toPandas()
    na = tpch["nation"].toPandas()
    re_ = tpch["region"].toPandas()
    m = (
        li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .merge(re_, left_on="n_regionkey", right_on="r_regionkey")
    )
    m["rev"] = (m.l_extendedprice * (1 - m.l_discount)).round(6)
    m["o_year"] = m.o_orderdate.dt.year
    exp = m.groupby(["r_name", "n_name", "o_year"]).agg(
        revenue=("rev", "sum"), n=("rev", "size")
    )
    assert len(got) == len(exp)
    for key, row in exp.iterrows():
        rev, n = got[key]
        assert n == row["n"]
        assert rev == pytest.approx(round(row["revenue"], 4), abs=1e-3)


def test_outer_join_surfaces_orderless_customers(spark, tpch):
    from sparksearch.joins import customer_order_balance

    got = {r.c_mktsegment: r for r in customer_order_balance(
        tpch["customer"], tpch["orders"]).collect()}
    cu = tpch["customer"].toPandas()
    od = tpch["orders"].toPandas()
    without = set(cu.c_custkey) - set(od.o_custkey)
    exp_without = cu[cu.c_custkey.isin(without)].groupby("c_mktsegment").size()
    total_without = sum(r.n_without_orders for r in got.values())
    assert total_without == len(without)
    for seg, n in exp_without.items():
        assert got[seg].n_without_orders == n
    assert sum(r.n_orders for r in got.values()) == len(od)


def test_cube_and_grouping_sets_shapes(spark, tpch):
    from sparksearch.joins import orders_cube, orders_grouping_sets

    od = tpch["orders"].toPandas()
    ns, np_ = od.o_orderstatus.nunique(), od.o_orderpriority.nunique()
    cube = orders_cube(tpch["orders"]).collect()
    # cube = full cross + status subtotals + priority subtotals + grand total
    n_pairs = len(od.groupby(["o_orderstatus", "o_orderpriority"]))
    assert len(cube) == n_pairs + ns + np_ + 1
    gs = orders_grouping_sets(tpch["orders"]).collect()
    assert len(gs) == ns + np_ + 1
    grand = [r for r in gs if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1 and grand[0].n_orders == len(od)
    # every grouping-set row is also a cube row with identical measures
    cube_map = {(r.o_orderstatus, r.o_orderpriority): (r.n_orders, r.total_price) for r in cube}
    for r in gs:
        assert cube_map[(r.o_orderstatus, r.o_orderpriority)] == (r.n_orders, r.total_price)


def test_top_parts_per_brand_rank_and_ties(spark, tpch):
    from sparksearch.joins import top_parts_per_brand

    rows = top_parts_per_brand(tpch["lineitem"], tpch["part"]).collect()
    by_brand: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.p_brand, r.rank)):
        by_brand.setdefault(r.p_brand, []).append(r)
    for brand, rs in by_brand.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # total order: revenue DESC, partkey ASC
        for a, b in zip(rs, rs[1:]):
            assert (a.revenue, -a.p_partkey) >= (b.revenue, -b.p_partkey)


def test_matrix_stats_matches_numpy(spark, tpch):
    import math

    import numpy as np

    from sparksearch.joins import MATRIX_FIELDS, lineitem_matrix_stats

    got = {
        (r.field_x, r.field_y): r
        for r in lineitem_matrix_stats(tpch["lineitem"]).collect()
    }
    pdf = tpch["lineitem"].toPandas()
    cols = {f: np.round(pdf[f].to_numpy(np.float64), 2) for f in MATRIX_FIELDS}
    n = len(pdf)
    assert len(got) == 6
    for i, a in enumerate(MATRIX_FIELDS):
        for b in MATRIX_FIELDS[i:]:
            r = got[(a, b)]
            assert r.n == n
            # outputs are round6'd -> compare at 6-dp resolution
            assert math.isclose(r.mean_x, cols[a].mean(), abs_tol=5e-7)
            assert math.isclose(r.mean_y, cols[b].mean(), abs_tol=5e-7)
            cov = float(
                ((cols[a] - cols[a].mean()) * (cols[b] - cols[b].mean())).mean()
            )
            assert math.isclose(r.covariance, cov, rel_tol=1e-6, abs_tol=5e-7), (a, b)
            corr = cov / (cols[a].std() * cols[b].std())
            assert math.isclose(r.correlation, corr, rel_tol=1e-5, abs_tol=1e-6), (a, b)
    # self-correlation is exactly 1 after round6
    for f in MATRIX_FIELDS:
        assert got[(f, f)].correlation == 1.0


def test_composite_page_keyset_semantics(spark, docs_sf0001):
    from sparksearch.stats import (
        COMPOSITE_AFTER,
        COMPOSITE_PAGE_SIZE,
        composite_buckets_page,
    )

    rows = composite_buckets_page(docs_sf0001).collect()
    keys = [(r.lang, r.source) for r in rows]
    # page cap, strict after-key bound, composite key order
    assert 0 < len(rows) <= COMPOSITE_PAGE_SIZE
    assert all(k > COMPOSITE_AFTER for k in keys)
    assert keys == sorted(keys)
    # metrics agree with a direct recount of the same buckets
    pdf = docs_sf0001.toPandas()
    g = pdf.groupby(["lang", "source"])
    for r in rows:
        grp = g.get_group((r.lang, r.source))
        assert r.n_docs == len(grp)
        assert r.total_chars == int(grp["n_chars"].sum())
    # the page is exactly the FIRST size buckets after the key
    all_keys = sorted(
        k for k in g.groups.keys() if k > COMPOSITE_AFTER
    )
    assert keys == all_keys[: COMPOSITE_PAGE_SIZE]


def test_extended_stats_matches_numpy(spark, tpch):
    import math

    import numpy as np

    from sparksearch.joins import lineitem_extended_stats

    got = {r.l_returnflag: r for r in lineitem_extended_stats(tpch["lineitem"]).collect()}
    pdf = tpch["lineitem"].toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = np.round(grp["l_extendedprice"].to_numpy(np.float64), 2)
        r = got[flag]
        assert r.n == len(x)
        assert r.min_v == round(float(x.min()), 6)
        assert r.max_v == round(float(x.max()), 6)
        assert math.isclose(r.sum_v_e2 / 100.0, float(x.sum()), rel_tol=1e-12, abs_tol=1e-6)
        assert math.isclose(r.avg_v, float(x.mean()), abs_tol=5e-7)
        assert math.isclose(
            float(r.sum_of_squares_str), float((x * x).sum()), rel_tol=1e-9
        )
        assert math.isclose(r.variance, float(x.var()), rel_tol=1e-9, abs_tol=1e-4)
        assert math.isclose(r.std_dev, float(x.std()), rel_tol=1e-9, abs_tol=1e-6)


def test_has_child_topk_matches_pandas(spark, tpch):
    from sparksearch.joins import (
        HAS_CHILD_K,
        HAS_CHILD_MIN_QTY,
        orders_has_child_topk,
    )

    rows = orders_has_child_topk(tpch["orders"], tpch["lineitem"]).collect()
    li = tpch["lineitem"].toPandas()
    m = li[li.l_quantity >= HAS_CHILD_MIN_QTY].copy()
    m["rev"] = (m.l_extendedprice * (1 - m.l_discount)).round(6)
    per = m.groupby("l_orderkey").agg(n=("rev", "size"), best=("rev", "max"))
    exp = sorted(
        ((round(b, 6), k) for k, (n, b) in per.iterrows()),
        key=lambda t: (-t[0], t[1]),
    )[:HAS_CHILD_K]
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, len(exp) + 1)
    )
    got = [(r.score, r.o_orderkey) for r in sorted(rows, key=lambda r: r.rank)]
    assert [(round(s, 6), k) for s, k in exp] == [
        (round(s, 6), k) for s, k in got
    ]
    # child counts ride along correctly
    per_n = {k: n for k, (n, b) in per.iterrows()}
    for r in rows:
        assert r.n_matching_children == per_n[r.o_orderkey]


def test_histogram_and_weighted_avg_match_pandas(spark, tpch):
    import math

    import numpy as np

    from sparksearch.joins import (
        HISTOGRAM_INTERVAL,
        discount_weighted_avg,
        price_histogram,
    )

    pdf = tpch["lineitem"].toPandas()
    got_h = {r.bucket_start: r for r in price_histogram(tpch["lineitem"]).collect()}
    buckets = np.floor(pdf.l_extendedprice.to_numpy() / HISTOGRAM_INTERVAL)
    for b in np.unique(buckets):
        sel = pdf[buckets == b]
        r = got_h[b * HISTOGRAM_INTERVAL]
        assert r.n_items == len(sel)
        assert r.sum_qty_e2 == round(float(np.round(sel.l_quantity, 2).sum()) * 100)
    # buckets partition the table
    assert sum(r.n_items for r in got_h.values()) == len(pdf)

    got_w = {r.l_returnflag: r for r in discount_weighted_avg(tpch["lineitem"]).collect()}
    for flag, grp in pdf.groupby("l_returnflag"):
        d = np.round(grp.l_discount.to_numpy(), 2)
        q = np.round(grp.l_quantity.to_numpy(), 2)
        want = float((d * q).sum() / q.sum())
        assert math.isclose(got_w[flag].weighted_avg_discount, want, abs_tol=5e-7)
        assert got_w[flag].n == len(grp)


def test_multi_terms_matches_pandas(spark, tpch):
    from sparksearch.joins import MULTI_TERMS_K, orders_multi_terms

    rows = sorted(orders_multi_terms(tpch["orders"]).collect(), key=lambda r: r.rank)
    pdf = tpch["orders"].toPandas()
    g = (
        pdf.groupby(["o_orderpriority", "o_orderstatus"])
        .agg(n=("o_orderkey", "size"), s=("o_totalprice", "sum"))
        .reset_index()
    )
    exp = sorted(
        g.itertuples(), key=lambda t: (-t.n, t.o_orderpriority, t.o_orderstatus)
    )[:MULTI_TERMS_K]
    assert [(r.o_orderpriority, r.o_orderstatus, r.n_orders) for r in rows] == [
        (t.o_orderpriority, t.o_orderstatus, t.n) for t in exp
    ]
    for r, t in zip(rows, exp):
        assert abs(r.sum_total_e2 / 100.0 - round(t.s, 2)) < 0.02
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_top_metrics_matches_pandas(spark, tpch):
    from sparksearch.joins import lineitem_top_metrics

    rows = {r.l_returnflag: r for r in lineitem_top_metrics(tpch["lineitem"]).collect()}
    pdf = tpch["lineitem"].toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        top = grp.sort_values(
            ["l_shipdate", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
        ).iloc[0]
        r = rows[flag]
        assert r.latest_shipdate == top.l_shipdate.strftime("%Y-%m-%d")
        assert r.l_orderkey == top.l_orderkey
        assert abs(r.top_price_e2 / 100.0 - round(top.l_extendedprice, 2)) < 0.005
        assert abs(r.top_discount_e2 / 100.0 - round(top.l_discount, 2)) < 0.005


def test_bucket_selector_above_mean_gate(spark, tpch):
    from sparksearch.joins import BUCKET_SORT_K, orders_bucket_selector

    rows = sorted(orders_bucket_selector(tpch["orders"]).collect(), key=lambda r: r.rank)
    pdf = tpch["orders"].toPandas()
    pdf["month"] = pdf.o_orderdate.map(lambda d: d.strftime("%Y-%m"))
    m = pdf.groupby("month").agg(n=("o_orderkey", "size"), rev=("o_totalprice", "sum"))
    mean_rev = m.rev.sum() / len(m)
    kept = m[m.rev > mean_rev + 1e-9].sort_index()
    exp = sorted(kept.itertuples(), key=lambda t: (-t.rev, t.Index))[:BUCKET_SORT_K]
    assert [r.month for r in rows] == [t.Index for t in exp]
    assert [r.n_orders for r in rows] == [t.n for t in exp]
    # every returned bucket is strictly above the mean; ranks are dense
    for r in rows:
        assert r.revenue_e2 / 100.0 > mean_rev - 0.01
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_date_range_partitions_orders(spark, tpch):
    import datetime as dt

    from sparksearch.joins import DATE_RANGE_BOUNDS, orders_date_range

    rows = {r.range_key: r for r in orders_date_range(tpch["orders"]).collect()}
    pdf = tpch["orders"].toPandas()
    lo = dt.date.fromisoformat(DATE_RANGE_BOUNDS[0])
    hi = dt.date.fromisoformat(DATE_RANGE_BOUNDS[1])
    d = pdf.o_orderdate.dt.date
    assert rows[f"*-{DATE_RANGE_BOUNDS[0]}"].n_orders == int((d < lo).sum())
    assert rows[f"{DATE_RANGE_BOUNDS[0]}-{DATE_RANGE_BOUNDS[1]}"].n_orders == int(
        ((d >= lo) & (d < hi)).sum()
    )
    assert rows[f"{DATE_RANGE_BOUNDS[1]}-*"].n_orders == int((d >= hi).sum())
    # half-open buckets partition the table; from/to edges carried
    assert sum(r.n_orders for r in rows.values()) == len(pdf)
    assert rows[f"*-{DATE_RANGE_BOUNDS[0]}"].from_date is None
    assert rows[f"{DATE_RANGE_BOUNDS[1]}-*"].to_date is None


def test_boxplot_matches_numpy_linear(spark, tpch):
    import numpy as np

    from sparksearch.joins import lineitem_boxplot

    rows = {r.l_returnflag: r for r in lineitem_boxplot(tpch["lineitem"]).collect()}
    pdf = tpch["lineitem"].toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        v = np.round(grp.l_extendedprice.to_numpy(), 2)
        r = rows[flag]
        assert r.n == len(v)
        assert r.vmin_e2 / 100.0 == v.min() and r.vmax_e2 / 100.0 == v.max()
        q1, q2, q3 = np.percentile(v, [25, 50, 75], method="linear")
        assert abs(r.q1_e4 / 10000.0 - q1) < 1e-6
        assert abs(r.q2_e4 / 10000.0 - q2) < 1e-6
        assert abs(r.q3_e4 / 10000.0 - q3) < 1e-6
        iqr = q3 - q1
        inside = v[(v >= q1 - 1.5 * iqr) & (v <= q3 + 1.5 * iqr)]
        assert r.lower_whisker_e2 / 100.0 == inside.min()
        assert r.upper_whisker_e2 / 100.0 == inside.max()


def test_t_test_matches_numpy_welch(spark, tpch):
    import math

    import numpy as np

    from sparksearch.joins import lineitem_t_test

    r = lineitem_t_test(tpch["lineitem"]).collect()[0]
    pdf = tpch["lineitem"].toPandas()
    a = np.round(pdf[pdf.l_returnflag == "A"].l_discount.to_numpy(), 2)
    b = np.round(pdf[pdf.l_returnflag == "R"].l_discount.to_numpy(), 2)
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert math.isclose(r.mean_a, a.mean(), abs_tol=5e-7)
    assert math.isclose(r.mean_b, b.mean(), abs_tol=5e-7)
    t = (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert math.isclose(r.t_stat, t, abs_tol=5e-6)


def test_has_parent_matches_pandas(spark, tpch):
    from sparksearch.joins import (
        HAS_PARENT_K,
        HAS_PARENT_PRIORITY,
        lineitem_has_parent_topk,
    )

    rows = sorted(
        lineitem_has_parent_topk(tpch["orders"], tpch["lineitem"]).collect(),
        key=lambda r: r.rank,
    )
    od = tpch["orders"].toPandas()
    li = tpch["lineitem"].toPandas()
    keys = set(od[od.o_orderpriority == HAS_PARENT_PRIORITY].o_orderkey)
    m = li[li.l_orderkey.isin(keys)].copy()
    m["score"] = (m.l_extendedprice * (1 - m.l_discount)).round(6)
    exp = sorted(
        m.itertuples(), key=lambda t: (-round(t.score, 6), t.l_orderkey, t.l_linenumber)
    )[:HAS_PARENT_K]
    assert [(r.l_orderkey, r.l_linenumber) for r in rows] == [
        (t.l_orderkey, t.l_linenumber) for t in exp
    ]
    # every hit's parent really matches the parent query
    assert all(r.l_orderkey in keys for r in rows)


def test_mad_matches_numpy(spark, tpch):
    import numpy as np

    from sparksearch.joins import lineitem_mad

    rows = {r.l_returnflag: r for r in lineitem_mad(tpch["lineitem"]).collect()}
    pdf = tpch["lineitem"].toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        v = np.round(grp.l_extendedprice.to_numpy(), 2)
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        r = rows[flag]
        assert r.n == len(v)
        assert abs(r.median_e4 / 10000.0 - med) < 1e-9
        assert abs(r.mad_e5 / 100000.0 - mad) < 1e-9


def test_children_agg_matches_pandas(spark, tpch):
    from sparksearch.joins import orders_children_agg

    rows = {
        r.o_orderpriority: r
        for r in orders_children_agg(tpch["orders"], tpch["lineitem"]).collect()
    }
    od = tpch["orders"].toPandas()[["o_orderkey", "o_orderpriority"]]
    li = tpch["lineitem"].toPandas()
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    m["rev"] = (m.l_extendedprice * (1 - m.l_discount)).round(6)
    for prio, grp in m.groupby("o_orderpriority"):
        r = rows[prio]
        assert r.n_parents == grp.o_orderkey.nunique()
        assert r.n_children == len(grp)
        assert abs(r.sum_child_revenue_e6 / 1e6 - grp.rev.sum()) < 1e-3
