"""Canonicalization: iterative connected components over the mention-similarity graph.

[KG-new] operators J3/J4 (SURVEY.md §2.6). Vertices are mention keys
("m:<type>:<norm>") and linked entity anchors ("e:<entity_id>"). Edges:
 * mention → its linked entity anchor (from entity linking);
 * mention → mention within a similarity block — blocked self-join (J3) on
   (type, last token of the normalized surface), which connects "сергей козлов",
   "козлов", "с . козлов" without an O(n²) cross join.

Components via min-label propagation (the dataframe form of large-star/small-star):
each iteration joins labels to the symmetric edge list, takes the min neighbor label,
and ``localCheckpoint``s to cut lineage (north-star: "checkpointed DataFrame
iterations"); stops when no label changes. Iterations are O(diameter); blocks are
star-shaped (hub = block min) so this converges in 2-3 iterations at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mention_vertices(links: DataFrame) -> DataFrame:
    return links.select(
        F.concat(F.lit("m:"), F.col("mention_type"), F.lit(":"), F.col("mention_norm")).alias("v"),
        "mention_norm", "mention_type", "n_mentions", "entity_id",
    )


def build_edges(links: DataFrame) -> DataFrame:
    """Symmetric-ready (src, dst) edge list (deduplicated, J5)."""
    m = _mention_vertices(links)
    e_link = (
        m.where(F.col("entity_id").isNotNull())
        .select(F.col("v").alias("src"),
                F.concat(F.lit("e:"), F.col("entity_id")).alias("dst"))
    )
    # similarity block: same type + crude stem of the last token — the SAME stem as
    # fuzzy linking (linking._stem), so fuzzy-linked mentions always co-block here;
    # connect each block member to the block min (star shape)
    from .linking import _stem

    bkey = _stem(F.col("mention_norm"))
    blocked = m.select(
        "v",
        F.col("mention_type").alias("btype"),
        bkey.alias("bkey"),
    )
    block_min = blocked.groupBy("btype", "bkey").agg(F.min("v").alias("hub"),
                                                     F.count(F.lit(1)).alias("bn"))
    e_block = (
        blocked.join(block_min, ["btype", "bkey"])
        .where((F.col("bn") > 1) & (F.col("v") != F.col("hub")))
        .select(F.col("v").alias("src"), F.col("hub").alias("dst"))
    )
    return e_link.unionByName(e_block).dropDuplicates(["src", "dst"])


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """(v, component) for every vertex appearing in edges; component = min vertex id
    reachable. Checkpointed loop; converges when no label changes."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates(["src", "dst"])
    sym = sym.repartition("src").localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
        .localCheckpoint()
    )

    changed = 0
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.v)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.v == neighbor_min.src, "left")
            .select(
                "v",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                F.col("component").alias("old_component"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        labels = new_labels.select("v", "component")
        # convergence check every 2nd iteration: each check is a driver round-trip,
        # and one extra (idempotent) propagation pass is cheaper than a check
        if it % 2 == 1 or it == max_iter - 1:
            changed = new_labels.where(F.col("component") != F.col("old_component")).limit(1).count()
            if changed == 0:
                break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} iterations — "
            "component labels would be silently wrong; raise max_iter"
        )
    return labels


def canonical_map(links: DataFrame, max_iter: int = 25) -> DataFrame:
    """→ (mention_norm, mention_type, n_mentions, entity_id, canonical_id).

    ``links`` is materialized once up front (localCheckpoint): it is consumed three
    times (vertices, edges, final join) and is itself the head of the whole
    docs→triples→mentions plan — without the cut, Spark re-executes that full plan per
    consumer (measured 172 s → 9 s at sf0.1)."""
    links = links.localCheckpoint()
    m = _mention_vertices(links)
    edges = build_edges(links)
    comp = connected_components(edges, max_iter=max_iter)
    return (
        m.join(comp, m.v == comp.v, "left")
        .select(
            "mention_norm", "mention_type", "n_mentions", "entity_id",
            F.coalesce(F.col("component"), m.v).alias("canonical_id"),
        )
    )
