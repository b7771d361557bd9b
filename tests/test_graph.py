"""Connected components + duplicate clustering (sparksearch.graph).

The catalog-level oracle test covers the end-to-end dedup_clusters entry
against a DuckDB recursive-CTE transitive closure; these tests pin the
component-finding semantics on hand-built graphs (chain, star, disjoint
components, adversarial edge order) and the transitive-grouping property
pairwise dedup output cannot express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")


def _cc(spark, edges):
    from sparksearch.graph import connected_components

    rows = connected_components(_pairs(spark, edges)).collect()
    return {r.node: r.component for r in rows}


def test_cc_chain_star_and_disjoint(spark):
    got = _cc(
        spark,
        [(1, 2), (2, 3), (3, 4),          # chain
         (10, 11), (10, 12), (10, 13),    # star
         (21, 20)],                       # reversed pair
    )
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_cc_long_chain_adversarial_order(spark):
    # path graph 0-1-…-19 fed highest-first: needs real propagation, not
    # just the seeded one-hop min.
    edges = [(i + 1, i) for i in range(19)][::-1]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(20)}


def test_cc_partitioning_invariance(spark):
    edges = [(1, 2), (2, 3), (5, 6), (6, 7), (3, 5)]
    base = _cc(spark, edges)
    from sparksearch.graph import connected_components

    rep = connected_components(_pairs(spark, edges).repartition(7))
    assert {r.node: r.component for r in rep.collect()} == base
    assert set(base.values()) == {1}  # all one component via the 3-5 bridge


def _chain_docs(spark):
    """d1~d2 and d2~d3 are near-dups (one interior token changed → 3-gram
    jaccard = 35/41 ≈ 0.854 ≥ 0.8) but d1~d3 is NOT (two well-separated
    interior tokens changed → 32/44 ≈ 0.727): the pairwise output has no
    (1,3) row, yet all three must land in one duplicate cluster."""
    words = [f"w{i:02d}" for i in range(40)]
    t2 = list(words); t2[10] = "xmid"
    t3 = list(t2); t3[25] = "ymid"
    d1, d2, d3 = " ".join(words), " ".join(t2), " ".join(t3)
    far = " ".join(f"z{i:02d}" for i in range(40))
    return spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (9, far)], "doc_id long, text string"
    )


def test_neardup_clusters_transitive_grouping(spark):
    from sparksearch.graph import neardup_clusters
    from sparksearch.textpipe import minhash_lsh_dedup

    docs = _chain_docs(spark)
    pair_set = {
        (r.doc_id_a, r.doc_id_b) for r in minhash_lsh_dedup(docs).collect()
    }
    assert pair_set == {(1, 2), (2, 3)}  # (1,3) below threshold, 9 isolated

    rows = neardup_clusters(docs).collect()
    got = {r.doc_id: (r.cluster_id, r.cluster_size, r.is_keeper) for r in rows}
    assert got == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
    }
    # the training-data contract: dropping non-keepers removes every
    # transitive duplicate, keeps exactly one survivor per group.
    keepers = [d for d, (_, _, keep) in got.items() if keep]
    assert keepers == [1]


def test_cc_scale_stress_log_rounds_and_flat_plans(spark):
    """Scale-stress (round-3 verdict item #7): a 2^17-edge path graph — the
    adversarial worst case for label propagation (diameter = edge count) —
    plus star components, must converge in O(log2(diameter)) rounds
    (pointer jumping) with a PER-ROUND ANALYZED PLAN OF CONSTANT SIZE
    (localCheckpoint truncates lineage; without it the plan nests once per
    round and the driver OOMs on the explain string alone at ~19 rounds)."""
    import math

    from sparksearch.graph import connected_components

    n = 1 << 17  # 131072 path edges; diameter = n
    path = spark.range(n).select(
        F.col("id").alias("doc_id_a"), (F.col("id") + 1).alias("doc_id_b")
    )
    # large star components on a disjoint id range: hub h with 64 leaves
    star = (
        spark.range(64 * 200)
        .select(
            (F.lit(10_000_000) + (F.col("id") / 64).cast("long") * 1000)
            .alias("doc_id_a"),
            (F.lit(10_000_001) + (F.col("id") / 64).cast("long") * 1000
             + F.col("id") % 64).alias("doc_id_b"),
        )
    )
    stats: dict = {}
    cc = connected_components(path.unionByName(star), stats_out=stats).persist()

    # one component for the whole path, labelled by its min node (0)
    path_labels = cc.filter(F.col("node") < n + 1).select("component").distinct()
    assert [r[0] for r in path_labels.collect()] == [0]
    assert cc.filter(F.col("node") < n + 1).count() == n + 1
    # each star is its own component labelled by the hub id
    star_cc = cc.filter(F.col("node") >= 10_000_000)
    assert star_cc.select("component").distinct().count() == 200
    assert star_cc.groupBy("component").count().filter("count <> 65").count() == 0
    cc.unpersist()

    # O(log n) rounds: pointer jumping doubles reach per round (+1 for the
    # fixpoint-detection round, +1 seed slack)
    bound = math.ceil(math.log2(n)) + 2
    assert 0 < stats["rounds"] <= bound, (stats["rounds"], bound)
    # lineage truncation: the analyzed plan must NOT grow with rounds —
    # every round's plan within 1.5x of the first (nesting would be ~x2^r)
    pc = stats["plan_chars"]
    assert max(pc) <= 1.5 * pc[0] + 500, pc


def _pr_oracle(edges, iterations=5, damping="0.85"):
    """From-scratch Decimal simulation of graph.pagerank's exact arithmetic
    (different code path from both engines)."""
    from decimal import ROUND_HALF_UP, Decimal

    Q9 = Decimal("1e-9")

    def q9(x):  # double → decimal(·,9), HALF_UP — the engines' cast.
        # repr(x), not Decimal(x): Spark's double→decimal goes through the
        # SHORTEST round-trip string (BigDecimal.valueOf/Double.toString),
        # not the exact binary expansion — on ...4999 doubles whose
        # shortest form is ...5 the two disagree by 1 ulp at scale 9.
        return Decimal(repr(x)).quantize(Q9, ROUND_HALF_UP)

    deg: dict = {}
    nodes = set()
    for s, d, w in edges:
        deg[s] = deg.get(s, 0) + w
        nodes.update((s, d))
    n = len(nodes)
    tele = q9((1.0 - float(damping)) / n)
    dd = Decimal(damping)
    r = {u: q9(1.0 / n) for u in nodes}
    for _ in range(iterations):
        insum = {u: Decimal(0) for u in nodes}
        for s, d, w in edges:
            share = q9(float(r[s]) / float(deg[s]))
            insum[d] += share * w
        r = {
            u: (tele + dd * insum[u]).quantize(Q9, ROUND_HALF_UP)
            for u in nodes
        }
    return {u: (deg.get(u, 0), r[u]) for u in nodes}


def test_pagerank_matches_decimal_oracle(spark):
    from decimal import Decimal

    from sparksearch.graph import pagerank

    # weighted path 1-2-3-4 (symmetric), a source-only node 5 → 1, and a
    # dangling sink 1 → 6 (in-edges, no out-edges: keeps teleport + inflow,
    # contributes nothing — deterministic mass leak)
    und = [(1, 2, 2), (2, 3, 1), (3, 4, 3)]
    edges = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    edges += [(5, 1, 1), (1, 6, 4)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: (r["wdeg"], r["r"])
        for r in pagerank(df, iterations=5).collect()
    }
    want = _pr_oracle(edges, iterations=5)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u
        assert Decimal(got[u][1]) == want[u][1], (u, got[u], want[u])
    # mass: Σr ≤ 1 + rounding slack; node 5 (no in-edges) sits at teleport
    total = sum(v[1] for v in got.values())
    assert Decimal("0.5") < total <= Decimal("1.000001")


def test_pagerank_partitioning_invariant_and_flat_plans(spark):
    from sparksearch.graph import pagerank

    und = [(i, i + 1, (i % 3) + 1) for i in range(1, 40)]
    edges = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    stats: dict = {}
    a = sorted(map(tuple, pagerank(df, stats_out=stats).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(7, "dst")).collect()))
    assert a == b  # invariant #1: partitioning cannot move a bit
    # lineage truncation: analyzed plan flat across all 10 rounds
    pc = stats["plan_chars"]
    assert len(pc) == 10 and max(pc) <= 1.5 * pc[0] + 500, pc
