"""Connected components over duplicate-pair edges — the step that
turns near-dup PAIRS into dedup GROUPS (pick one representative per
cluster, drop the rest). The LLM-corpus pipeline is
pairs (minhash/simhash/embedding) → components → keep min-id doc.

Algorithm: iterative min-label propagation on DataFrames — each round
every node adopts the minimum component label among itself and its
neighbors; converges in O(graph diameter) rounds (duplicate clusters
are near-cliques, so diameter is tiny — 2-3 rounds in practice).

Scale notes:
* State per round is (node, comp) — two longs — and edges shuffle by
  node id; no adjacency materialization beyond the edge list.
* Lineage is truncated with ``localCheckpoint`` each round: iterative
  self-joins otherwise stack exponentially-growing plans (the classic
  iterative-DataFrame failure mode; checkpointing keeps each round's
  plan O(1)).
* The convergence check is one tiny aggregate per round — an action,
  but over a frame already computed for the next round's input.
* For graphs with whale components (adversarial chains), switch to
  the large-star/small-star contraction (same join primitives, fewer
  rounds); duplicate clusters don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the minimum node id in the node's connected component."""
    # Cache the EDGE list before symmetrizing: the union below reads
    # its input twice, and edges usually arrive with an expensive
    # lineage (a similarity self-join) — uncached, that whole pipeline
    # would run twice just to build sym (observed: 13 s vs 5 s on the
    # near-dup graph). sym itself is cached for the per-round joins
    # and the (tiny) pair frame released once sym is materialized.
    e = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).persist()
    sym = e.union(e.select(F.col("dst"), F.col("src"))).distinct().persist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    e.unpersist(blocking=False)
    n_changed = 0
    for _ in range(max_rounds):
        # neighbor-min pass: comp[n] <- min(comp[n], min_{m~n} comp[m])
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("n_comp"))
        )
        stepped = (
            labels.withColumnRenamed("comp", "old")
            .join(neighbor_min, "node", "left")
            .select(
                "node",
                "old",
                F.least(F.col("old"), F.coalesce("n_comp", "old")).alias("comp"),
            )
        )
        # path halving (pointer jumping): comp[n] <- min(comp[n],
        # comp[comp[n]]). Neighbor-min alone needs O(diameter) rounds —
        # near-dup graphs grow chains (observed diameter ~11 at a 0.95
        # threshold); the jump join contracts label chains by half each
        # round, so convergence is O(log diameter). The join is on the
        # label frame itself — node-count-sized, never edge-sized.
        jump = stepped.select(
            F.col("node").alias("comp"), F.col("comp").alias("jcomp")
        )
        updated = (
            stepped.join(jump, "comp", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("jcomp", "comp")).alias("comp"),
                (
                    F.least(F.col("comp"), F.coalesce("jcomp", "comp"))
                    < F.col("old")
                ).alias("changed"),
            )
            .localCheckpoint()  # truncate the iterative lineage
        )
        n_changed = updated.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    else:
        # fail LOUDLY: pointer jumping converges in O(log diameter),
        # so 25 rounds cover diameters past 2^25 — exhausting them
        # means an adversarial whale chain (or a bug), and returning
        # the partial labels would silently split true clusters into
        # several representatives downstream (r13 operator review).
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds}"
            f" rounds ({n_changed} labels still moving) — graph"
            " diameter exceeds the pointer-jumping budget; raise"
            " max_rounds or pre-contract with large-star/small-star"
        )
    sym.unpersist()
    return labels


def dedup_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: (id, cluster_rep, cluster_size, keep). Documents
    not in any dup pair are their own singleton cluster. ``keep`` marks
    the canonical representative — the dedup'd corpus is
    ``filter(keep)``.

    ``cluster_rep`` is the minimum id among the component's rows IN
    ``docs`` — not the component's raw min-label. The two coincide
    whenever every edge endpoint appears in ``docs`` (true for every
    in-repo caller: edges come from pair generators over the same
    frame), but if an upstream filter ever drops a doc after pair
    generation, a ghost min-label would make ``keep`` false for every
    member and silently delete the whole cluster (r13 operator
    review); deriving the rep from the doc rows keeps exactly one
    representative regardless."""
    comp = connected_components(edges)
    # identity grain: a replayed id (at-least-once upstream, r11
    # duplicates sweep) is the SAME document — one membership row per
    # identity, and cluster_size counts identities, not delivery
    # copies. distinct() is a no-op on clean input.
    labeled = (
        docs.select(F.col(id_col))
        .distinct()
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col, F.coalesce("comp", F.col(id_col)).alias("__comp")
        )
    )
    # same shuffle count as the old groupBy(cluster_rep) form: one
    # agg + one join, both keyed on the component label
    per_comp = labeled.groupBy("__comp").agg(
        F.min(id_col).alias("cluster_rep"),
        F.count("*").alias("cluster_size"),
    )
    return (
        labeled.join(per_comp, "__comp")
        .select(
            id_col,
            "cluster_rep",
            "cluster_size",
            (F.col(id_col) == F.col("cluster_rep")).alias("keep"),
        )
    )
