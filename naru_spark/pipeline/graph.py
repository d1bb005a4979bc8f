"""Iterative graph analytics over document/embedding graphs.

Connected components (pipeline.dedup.dup_groups) handles the dedup use
case; this module adds PageRank over the k-NN similarity graph — the
centrality signal SemDeDup-style curation uses to pick REPRESENTATIVE
documents (keep the most central member of a near-dup neighborhood, not
an arbitrary one).

The iterative pattern is the part that matters at scale: each round is
one join + one aggregation over the EDGE list (|V| * k rows, never
|V|^2), the rank vector is re-persisted per round, and lineage is cut
with localCheckpoint every few iterations — without that, 10 rounds of
joins build a plan whose analysis time dwarfs the compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "vec_id",
    dst_col: str = "neighbor_id",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
    shuffle_partitions: int | None = None,
    round_decimals: int | None = None,
) -> DataFrame:
    """PageRank via power iteration on an edge DataFrame:

        r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u) / outdeg(u)

    Dangling mass (nodes with no out-edges — absent from a k-NN edge list
    only if the corpus is smaller than k) redistributes uniformly.
    Returns (node, rank) for every node appearing as src or dst.

    Scale: per iteration one broadcast-free equi-join edge x rank (shuffle
    on src) and one groupBy(dst) — both linear in |E|; the rank vector is
    |V| rows. ``checkpoint_every`` truncates the growing lineage with
    localCheckpoint (eager) so round t's plan does not replay rounds
    0..t-1. The per-iteration dangling-mass job is SKIPPED entirely when
    the graph has no dangling nodes (one upfront check — true for every
    k-NN graph, where each node emits exactly k edges).
    ``shuffle_partitions`` pins the loop's shuffle width — iterative jobs
    over a small rank vector should not pay 32-partition task overhead
    per round. ``round_decimals`` rounds the rank vector after EVERY
    iteration — the determinism handle that lets a SQL oracle replay the
    power iteration bit-for-bit (per-iteration rounding quenches the
    float fold-order divergence that would otherwise compound across
    rounds; see the knn_pagerank_oracle entry)."""
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))
        ).distinct().persist()
        n = nodes.count()
        outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
        # pre-join the contribution denominator once: edges are static
        contrib_edges = e.join(outdeg, "src").persist()
        contrib_edges.count()
        has_dangling = (
            nodes.join(outdeg.withColumnRenamed("src", "node"), "node", "left_anti")
            .limit(1)
            .count()
            > 0
        )

        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
        base = (1.0 - damping) / n
        for t in range(iters):
            # one union + one aggregate instead of contribs + a second
            # nodes-side join per round: every node rides into the same
            # groupBy as a 0.0 contribution, so nodes with no in-edges
            # still surface (exactly what the left join provided) and one
            # broadcast build + join drops from every iteration. Adding
            # 0.0 to an IEEE sum is an identity, so in_mass is unchanged;
            # the per-iteration rounding (round_decimals) quenches fold-
            # order effects exactly as before (oracle hash-gated).
            contribs = (
                contrib_edges.join(
                    ranks.withColumnRenamed("node", "src"), "src"
                )
                .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
                .unionByName(
                    nodes.select(F.col("node").alias("dst"),
                                 F.lit(0.0).alias("c"))
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
            )
            # dangling mass: rank held by nodes without out-edges
            dangling = 0.0
            if has_dangling:
                dangling = (
                    ranks.join(
                        outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
                    )
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .collect()[0][0]
                )
            rank_expr = F.lit(base) + F.lit(damping) * (
                F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(dangling / n)
            )
            if round_decimals is not None:
                rank_expr = F.round(rank_expr, round_decimals)
            new_ranks = contribs.select(
                F.col("dst").alias("node"), rank_expr.alias("rank")
            )
            if (t + 1) % checkpoint_every == 0 or t == iters - 1:
                new_ranks = new_ranks.localCheckpoint(eager=True)
            else:
                new_ranks = new_ranks.persist()
                new_ranks.count()
            ranks.unpersist()
            ranks = new_ranks
        contrib_edges.unpersist()
        nodes.unpersist()
        return ranks
    finally:
        spark.conf.set(conf_key, saved)
