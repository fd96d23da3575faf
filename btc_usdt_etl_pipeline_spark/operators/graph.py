"""Connected components over an edge list — near-dup CLUSTER assignment.

The dedup family (minhash_near_dedup, ngram_jaccard_pairs,
cosine_pairs_within) emits PAIRS; a real dedup pipeline needs clusters:
transitively-linked groups with one elected representative.  That is
connected components, computed here by min-label propagation:

1. every node starts labeled with its own id;
2. each round, every node takes the min label over itself and its
   neighbors (one shuffle keyed by node id — parallel everywhere);
3. converge when no label changes.

Rounds = graph diameter.  Near-dup graphs are short-diameter by nature
(clusters are quasi-cliques — duplicates of a document are duplicates of
each other), so a handful of rounds closes them; the alternating
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond") is the O(log n)-round upgrade if a pathological
chain graph ever shows up — same per-round shuffle shape, so it drops in.

Each round issues one metadata-sized driver action (the converged?
count); lineage is truncated per round with ``localCheckpoint`` so the
iterated plan doesn't grow (Catalyst would otherwise re-analyze a
J^rounds-deep tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    comp_col: str = "component",
    max_iter: int = 64,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    min node id reachable from the node.  Nodes with no edges don't
    appear (callers union isolated ids back if they need singletons)."""
    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Materialized once: every round joins against bi, and the upstream
    # edge computation (e.g. an n-gram similarity join) would otherwise
    # re-execute per round — measured 32 s → 9 s on the q62 plan.
    bi = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = (
        bi.select(F.col("u").alias(node_col))
        .distinct()
        .withColumn(comp_col, F.col(node_col))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = bi.join(
            labels, bi["u"] == labels[node_col]
        ).select(F.col("v").alias(node_col), F.col(comp_col))
        new_labels = (
            msgs.unionByName(labels)
            .groupBy(node_col)
            .agg(F.min(comp_col).alias(comp_col))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), node_col)
            .filter(F.col(f"n.{comp_col}") != F.col(f"o.{comp_col}"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
