"""Graph analytics over corpus-derived edge sets.

Connected components (dedup clustering) lives in operators/dedup.py; this
module holds the spectral/centrality side. Everything here is expressed as
joins + aggregations with DECIMAL-accumulated float sums, so fixed-
iteration algorithms stay oracle-exact (the DuckDB twin chains the same
iterations as CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.localrel import local_values_df

#: teleport/damping as explicit literals — BOTH engines parse "0.15" /
#: "0.85" to the same nearest-double; computing 1 - 0.85 driver-side
#: would yield 0.15000000000000002 and break oracle equality.
DAMPING = 0.85
TELEPORT = 0.15


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank (power iteration, damping 0.85).

    pr'(v) = 0.15/N + 0.85 * Σ_{u->v} pr(u)/outdeg(u); dangling nodes
    (no out-edges) simply leak their mass — the simplified variant, chosen
    because it is exactly expressible in both engines.

    Scale shape per iteration: one equi-join of the edge list against the
    (narrow) rank vector + one aggregation on the destination key, both
    with map-side partials; contributions accumulate in DECIMAL(38,18) so
    the sum is independent of partition merge order (oracle-exact). The
    edge list and degree table are materialized once (localCheckpoint) —
    each unrolled iteration references them, and rebuilding a derived
    edge set (e.g. the LSH kNN graph) per iteration would dominate.

    At 100 TB: partition edges by dst (the aggregation key) and the rank
    vector co-partitions after the first iteration — each subsequent
    round is a narrow join + partial agg; iters stays O(10).
    """
    n = nodes.count()
    if n == 0:  # empty node set: no ranks (and no 1/N teleport to divide)
        id_type = nodes.schema[id_col].dataType.simpleString()
        return local_values_df(
            nodes.sparkSession,
            [], f"{id_col} {id_type}, pagerank double"
        )
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint()
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint()
    # the node-id set is referenced in EVERY unrolled iteration (the
    # left join that restores teleport-only nodes) — materialize it once
    # (round 16, guide §2.4): without this each iteration re-ran the
    # upstream node derivation (a parquet scan per iteration here; at
    # scale, a full id-column read per iteration).
    ids = nodes.select(F.col(id_col).alias("_id")).localCheckpoint()
    pr = ids.select("_id", (F.lit(1.0) / F.lit(float(n))).alias("_pr"))
    # NOTE (round 16): pre-joining deg onto the edge list before the loop
    # was tried and measured WORSE (cpu 8 s -> 24 s on the bench box):
    # the extra edge-list materialization costs more than the iters tiny
    # broadcast re-joins of the checkpointed deg it saves. Kept as-is.
    for _ in range(iters):
        contrib = (
            e.join(pr, e["_src"] == pr["_id"])
            .join(deg, "_src")
            .select(
                F.col("_dst"),
                (F.col("_pr") / F.col("_deg")).alias("_c"),
            )
        )
        summed = contrib.groupBy("_dst").agg(
            F.sum(F.col("_c").cast("decimal(38,18)")).cast("double").alias("_s")
        )
        pr = ids.join(summed, ids["_id"] == summed["_dst"], "left").select(
            "_id",
            (
                F.lit(TELEPORT) / F.lit(float(n))
                + F.lit(DAMPING) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("_pr"),
        )
    return pr.select(
        F.col("_id").alias(id_col), F.round("_pr", 9).alias("pagerank")
    )


def triangle_counts(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle count, undirected degree, and local clustering
    coefficient (2*tri / (deg*(deg-1))) — the cohesion signal over a kNN
    graph: high coefficient = the doc sits in a dense semantic cluster
    (near-dup hotspot), coefficient ~0 = a hub bridging topics.

    Canonicalizes to undirected distinct edges (a < b), then counts each
    triangle once via the ordered wedge join: (a,b)⋈(b,c) gives wedges
    with a < b < c by construction, and an edge-set semi-check on (a,c)
    closes them. All equi-joins on node ids — O(sum of deg^2) wedge
    candidates, the standard bound; on a kNN graph degree is capped by
    construction (~2k), so candidates are linear in nodes and no skew
    materializes. Zero-triangle/low-degree nodes get coefficient 0.
    """
    und = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .distinct()
        # referenced three times by the wedge join below — materialize
        # once or each reference re-runs the full upstream edge pipeline
        .localCheckpoint()
    )
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("wa"), F.col("b").alias("wc"))
    tris = (
        und.join(e2, "b")                     # wedges a < b < c
        .join(e3, (F.col("a") == F.col("wa")) & (F.col("c") == F.col("wc")),
              "left_semi")                    # close the (a, c) edge
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(per_node, "node", "left")
        .join(deg, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.coalesce("degree", F.lit(0)).alias("degree"),
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                F.round(
                    F.lit(2.0) * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — community
    detection, the frequency-vote sibling of connected components: every
    node starts labeled with its own id and each iteration adopts the
    MOST FREQUENT label among its neighbors (tie-break: lowest label —
    the engine-stable rule, and the determinism knob the async original
    lacks). Fixed `iters` keeps it oracle-exact: the DuckDB twin chains
    the same iterations as CTEs.

    Scale shape per iteration: one equi-join of the (symmetrized,
    materialized-once) edge list against the narrow label vector + two
    aggregations — the PageRank loop's cost model with a mode() instead
    of a sum. At 100 TB: partition edges by the join key once; each
    round is a co-partitioned join + partial-agg counts. Degenerate
    inputs are safe: self-loops are dropped, isolated nodes never enter
    (no neighbors -> no vote -> not in the edge-derived node set).
    """
    s, d = F.col(src_col), F.col(dst_col)
    # canonicalize-then-mirror (round 16, guide §2.3): distinct runs over
    # ONE canonical (least, greatest) row per undirected edge, then the
    # mirror union is a narrow map — the old mirror-then-distinct shape
    # pushed both directions (2x the rows) through the distinct exchange
    # for the identical symmetric-closure result.
    canon = (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    und = (
        canon.union(
            canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # referenced every iteration — materialize once or each round
        # re-runs the full upstream edge derivation
        .localCheckpoint()
        # Co-partition by the vote key (round 16 close, guide §2.4 —
        # "two operations keyed the same way can share one exchange"):
        # HashPartitioning(a) satisfies the clustering of BOTH
        # aggregations of every round (groupBy(a, label) — a is a
        # subset of the keys — and groupBy(a)), and the labels join
        # broadcasts, preserving the streamed side's partitioning. So
        # ONE reusable exchange here replaces one full 2|E| vote-stream
        # exchange per iteration plus the per-(a, label) count exchange
        # (executed plan: 3 Exchange -> 1). Placed AFTER the checkpoint
        # because an AQE-finalized localCheckpoint does not carry its
        # outputPartitioning (measured: the same repartition BEFORE the
        # checkpoint still plans 2 downstream exchanges); within one
        # action, ReuseExchange collapses the identical repartition
        # references. This is also the docstring's 100 TB contract made
        # literal: partition edges by the join key once, every round is
        # a co-partitioned join + partial-agg counts.
        .repartition("a")
    )
    if iters <= 0:
        return (
            und.select(F.col("a").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("community"))
        )
    # Iteration 1 collapsed (round 16, guide §2.4): with self-label
    # initialization, node a's neighbor labels are exactly its distinct
    # neighbor ids — each appearing ONCE in the distinct undirected edge
    # list — so "most frequent, tie-break lowest" degenerates to min(b).
    # One partial-agged groupBy replaces the edge⋈labels join + two
    # aggregations of the generic round: the full 2|E| row stream crosses
    # one fewer shuffle, and the node-set distinct disappears (groupBy(a)
    # over the symmetric closure IS the node set). Provably identical for
    # any input and any iters >= 1.
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("label"))
        .select(F.col("a").alias("node"), "label")
    )
    for _ in range(iters - 1):
        counts = (
            und.join(labels, F.col("b") == F.col("node"))
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.groupBy("a")
            .agg(
                F.min_by(
                    "label",
                    F.struct((-F.col("c")).alias("nc"), F.col("label")),
                ).alias("label")
            )
            .select(F.col("a").alias("node"), "label")
        )
    return labels.select("node", F.col("label").alias("community"))
