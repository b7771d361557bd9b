"""Duplicate-cluster graph operators: connected components over a near-dup
pair graph, and the end-to-end "LSH pairs → duplicate groups" pipeline a
training-data dedup pass needs (keep one representative per component, not
one per pair — pairwise output alone can keep both b and c of a chain
a~b~c if only a is dropped).

Spark-first shape:

* The input graph is the NEAR-DUP PAIR SET, which is orders of magnitude
  smaller than the corpus (it is the output of the banded LSH join, already
  candidate-restricted and verified) — so component finding runs on a
  pairs-sized frame, never corpus-sized.
* ``connected_components`` is iterative min-label propagation expressed as
  pure DataFrame joins/aggregations: label(v) ← min(label(v),
  min_{u~v} label(u)) until fixpoint. Convergence is detected with a single
  scalar aggregate per round (Σ labels is strictly decreasing until the
  fixpoint — no row-wise old-vs-new join needed). Each round is one
  shuffle of the (tiny) edge frame; rounds = graph diameter, which for
  near-dup clusters is small (dup groups are quasi-cliques: LSH emits most
  intra-group pairs directly). For adversarially long path-graphs the
  classic O(log n)-round alternation (large-star/small-star, Kiveris et al.
  "Connected Components in MapReduce and Beyond", SoCC'14) is the upgrade;
  the propagation loop here is the same join pattern, so swapping the step
  function is local.
* Determinism: labels are doc_ids, the step function is min(), and the
  result (min reachable doc_id = canonical representative) is
  iteration-order independent — byte-identical across retries/partitionings,
  per the repo invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iter: int = 50,
    stats_out: dict | None = None,
) -> DataFrame:
    """DF[node, component] — component = MIN node id reachable from ``node``
    over the undirected pair graph (the canonical representative).

    Only nodes that appear in at least one pair are emitted (isolated docs
    are their own trivial component; emitting corpus-sized identity rows is
    the caller's choice, not forced here).

    ``stats_out`` (test/audit hook): when given a dict, records ``rounds``
    (loop iterations run, including the fixpoint-detection round) and
    ``plan_chars`` (the label frame's analyzed-plan size per round) — the
    two invariants the scale-stress test pins: rounds stay O(log diameter)
    (pointer jumping) and the plan stays O(1) per round (localCheckpoint
    truncates lineage; a regression here OOMs the driver long before the
    data hurts — CLAUDE.md sharp edge).
    """
    edges = (
        pairs.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
        .union(pairs.select(F.col(b_col).cast("long").alias("u"),
                            F.col(a_col).cast("long").alias("v")))
        .distinct()
        .persist()  # re-joined every round — one materialization
    )
    # Seed: label(v) = min(v, min neighbor) — one round of propagation for
    # free, and star graphs (the common dup-cluster shape) converge in the
    # first check. localCheckpoint (NOT persist) each round: an iterative
    # DataFrame loop must TRUNCATE lineage, or the analyzed plan nests once
    # per round and planning blows up long before the data does. (Reliable
    # checkpoint(dir) is the executor-loss-safe variant on a real cluster;
    # content is deterministic either way.)
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("nmin"))
        .select(F.col("u").alias("node"),
                F.least(F.col("u"), F.col("nmin")).alias("label"))
        .localCheckpoint(eager=True)
    )
    # Convergence key = exact decimal Σ labels: LongType sum wraps silently
    # (non-ANSI) once ids reach h60 scale (~2^60 × >16 nodes), and the
    # fixpoint test would then compare wrapped values. decimal(38,0) is
    # exact up to 10^38 — safe past 10^19 h60-scale nodes.
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).collect()[0][0]
    if stats_out is not None:
        stats_out["rounds"] = 0
        stats_out["plan_chars"] = []
    for _ in range(max_iter):
        # (a) neighbor labels flow along edges; (b) pointer jumping:
        # label(label(node)) — composing the label map with itself halves
        # pointer-chain depth every round, so convergence is O(log n) rounds
        # even on path graphs (plain neighbor propagation alone is O(n)).
        nbr = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        jump = (
            labels.select("node", F.col("label").alias("mid"))
            .join(
                labels.select(F.col("node").alias("mid"),
                              F.col("label").alias("label")),
                "mid",
            )
            .select("node", "label")
        )
        new_labels = (
            nbr.unionByName(jump).unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(_label_sum).collect()[0][0]
        labels = new_labels
        if stats_out is not None:
            stats_out["rounds"] += 1
            stats_out["plan_chars"].append(
                len(labels._jdf.queryExecution().analyzed().toString())
            )
        if new_sum == prev_sum:  # Σ min-labels strictly decreases until fixpoint
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    iterations: int = 10,
    damping: str = "0.85",
    stats_out: dict | None = None,
) -> DataFrame:
    """Weighted PageRank over a directed edge list → DF[node, wdeg, r]
    (r = DECIMAL(28,9) rank after ``iterations`` fixed power steps).

    Cross-engine-exact by construction, so a DuckDB oracle can UNROLL the
    iterations as CTEs (catalog_pipeline._pagerank_sql):

    * All sums are exact decimal arithmetic — contribution =
      share(10,9) × w(19,0) = DECIMAL(30,9), summed exactly; aggregation
      order cannot move a bit (the repo's decimal-exact-sum remedy).
    * The only doubles are single divisions computed identically by both
      engines (share = r/wdeg, teleport = (1-d)/N), each quantized straight
      back to decimal via the same double→decimal(·,9) cast stats.round6
      already relies on engine-wide.
    * Per-step quantization: r' = ROUND(teleport + d·Σcontrib, 9) cast to
      DECIMAL(28,9) — both engines round positive decimals half-up, so
      every iteration starts from identical state.
    * ``damping`` is a 2-dp decimal STRING (never a float) so d·Σ stays a
      DECIMAL(3,2)×DECIMAL(12,9) exact product — an int×decimal(28,9)-style
      38-digit overflow (CLAUDE.md sharp edge) is impossible at these
      precisions.

    Scale shape: the loop is ``iterations`` rounds of (edges ⋈ ranks on
    src) → groupBy(dst) — partial-aggregated, shuffling only (node,
    decimal) pairs; ranks are localCheckpoint'ed each round (lineage
    truncation, the iterative-loop invariant), edges/deg persisted once.
    Dangling nodes (no out-edges) keep teleport mass only — deterministic
    mass leak, documented rather than redistributed.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(w_col).cast("long").alias("w"),
    ).persist()
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.sum("w").cast("long").alias("wdeg"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg, "node", "left")
        .select("node", F.coalesce("wdeg", F.lit(0).cast("long")).alias("wdeg"))
        .persist()
    )
    n = nodes.count()  # one scalar: the teleport normalizer
    d_dec = F.expr(f"CAST({damping} AS DECIMAL(3,2))")
    teleport = F.lit((1.0 - float(damping)) / n).cast("decimal(28,9)")
    ranks = nodes.select(
        "node", F.lit(1.0 / n).cast("decimal(28,9)").alias("r")
    ).localCheckpoint(eager=True)
    if stats_out is not None:
        stats_out["plan_chars"] = []
    for _ in range(iterations):
        shares = ranks.join(nodes.filter(F.col("wdeg") > 0), "node").select(
            F.col("node").alias("src"),
            (F.col("r").cast("double") / F.col("wdeg").cast("double"))
            .cast("decimal(10,9)")
            .alias("share"),
        )
        insum = (
            e.join(shares, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("share") * F.col("w").cast("decimal(19,0)")).alias("insum"))
        )
        ranks = (
            nodes.join(insum, "node", "left")
            .select(
                "node",
                F.round(
                    teleport
                    + d_dec
                    * F.coalesce(
                        F.col("insum"), F.lit(0).cast("decimal(38,9)")
                    ).cast("decimal(12,9)"),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        if stats_out is not None:
            stats_out["plan_chars"].append(
                len(ranks._jdf.queryExecution().analyzed().toString())
            )
    out = (
        nodes.join(ranks, "node")
        .select("node", "wdeg", "r")
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    nodes.unpersist()
    return out


def neardup_clusters(docs: DataFrame) -> DataFrame:
    """End-to-end duplicate grouping → DF[doc_id, cluster_id, cluster_size,
    is_keeper]: MinHash+LSH verified pairs (textpipe.minhash_lsh_dedup) →
    connected components → per-doc cluster assignment with the canonical
    survivor flagged (min doc_id per component — the same survivor rule as
    exact dedup's keep_doc_id).

    The training-data contract: ``filter(~is_keeper)`` removes every
    transitive duplicate while keeping exactly one representative per
    group, which pairwise output alone cannot guarantee.
    """
    from .textpipe import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(docs)
    cc = connected_components(pairs)
    w = Window.partitionBy("component")
    return (
        cc.withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").cast("long").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_keeper"),
        )
    )


def quality_survivors(docs: DataFrame) -> DataFrame:
    """Quality-aware dedup retention → DF[doc_id, cluster_id, cluster_size,
    quality_score, is_keeper] over the WHOLE corpus: near-dup clusters from
    MinHash+LSH verified pairs (neardup_clusters' graph), but the survivor
    is the HIGHEST-quality member (text_quality score), not the lowest id —
    the curation policy real pretraining pipelines use (keep the best copy,
    drop the rest). Docs outside every cluster are their own singleton
    cluster and always keep.

    Total order inside a cluster is (quality_score DESC, doc_id ASC) on the
    round6-quantized score (invariant #3 — a raw-double argmax could pick
    different members across engines at a 6-dp tie). Scale: the component
    labels live on the pairs-sized graph; attaching them to the corpus is
    one LEFT join on doc_id; size/keeper are two window passes over the
    cluster key (the second reuses the first's hash partition)."""
    from .textpipe import minhash_lsh_dedup, text_quality

    pairs = minhash_lsh_dedup(docs)
    cc = connected_components(pairs)
    q = text_quality(docs).select("doc_id", "quality_score")
    lab = q.join(
        cc.select(
            F.col("node").cast("long").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "quality_score",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    wr = w.orderBy(F.desc("quality_score"), F.asc("doc_id"))
    return lab.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        "quality_score",
        (F.row_number().over(wr) == 1).alias("is_keeper"),
    )
