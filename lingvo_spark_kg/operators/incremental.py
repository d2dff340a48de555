"""Incremental KG maintenance: apply a delta batch of documents to an existing
materialized graph WITHOUT re-scanning the base corpus.

[KG-new] beyond-inventory companion to the batch pipeline (SURVEY.md §2.1 S11,
north-star "resumable from checkpoint"): a web-scale KG is built continuously —
re-running the full docs→triples→graph DAG per ingest batch re-pays the corpus-volume
extraction cost for data that has not changed. This module maintains the graph with
work proportional to ``delta + vocabulary``:

 * mention counts are additive → the merged link table comes from re-linking the
   UNION of the (vocabulary-bounded) base mention counts with the delta's counts —
   never from re-reading base docs (``linking.link_mentions`` is deterministic per
   surface, so re-linking old surfaces is cheap and exactly reproduces a full run);
 * canonicalization re-runs connected components on the merged link table's surface
   graph — also vocabulary-bounded. Adding documents only ADDS vertices/edges, so
   components only ever MERGE (an old cluster maps entirely into one new cluster):
   the old→new canonical-id remap is a well-defined function, derived by joining the
   old and new canonical maps on the mention surface;
 * the base EDGE table is re-keyed through that (vocabulary-bounded, broadcastable)
   remap and merge-aggregated with the delta's edges. ``n_occurrences`` (sum),
   ``example_doc_id`` (min) and ``avg_confidence`` (recovered integer micro-unit
   sums — exact: the extractor quantizes confidence to 1e-6, model/triples.py) merge
   exactly; ``n_docs`` merges through the Datasketches HLL doc sketch each edge row
   carries (``build_edges_table(doc_sketch=True)``) — countDistinct is NOT mergeable
   from aggregated rows once cluster merges re-key them (one doc can contribute to
   two old edges that collapse into one), while HLL register state is a per-item
   max, so re-aggregating sketches of the same underlying doc sets yields the SAME
   estimate as a full recompute, bit-for-bit (pinned in tests/test_incremental.py).

Scale shape: NOTHING here shuffles base-corpus volume. The delta chain is
delta-volume; mention merge, CC, remap derivation and node rebuild are
vocabulary-bounded; the base-edge re-key is two joins of the edges table against the
remap (AQE broadcasts the remap when small, strategy inherited from linking.dim_join
thinking), and the final merge aggregate re-shuffles only the EDGE table (entity-
pair-bounded, ≪ corpus volume — same argument as docs/SCALE.md "Graph analytics").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import linking
from .canonicalize import canonical_map
from .graph import N_BUCKETS_DEFAULT, build_edges_table, build_nodes

_EDGE_MERGE_COLS = ("src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
                    "doc_sketch", "example_doc_id")


def merged_mention_counts(base_links: DataFrame, delta_triples: DataFrame) -> DataFrame:
    """Base link table (which carries the base corpus's per-surface ``n_mentions``)
    + delta triples → merged (mention_norm, mention_type, n_mentions). Counting is
    additive, so the union-then-sum over two vocabulary-bounded frames reproduces
    ``mentions_from_triples`` over the full corpus exactly."""
    base = base_links.select("mention_norm", "mention_type", "n_mentions")
    delta = linking.mentions_from_triples(delta_triples)
    return (base.unionByName(delta)
            .groupBy("mention_norm", "mention_type")
            .agg(F.sum("n_mentions").alias("n_mentions")))


def canonical_remap(old_canon: DataFrame, new_canon: DataFrame) -> DataFrame:
    """→ distinct (old_id, new_id): every old canonical id mapped to the canonical id
    its surfaces carry after the delta. Well-defined (one new_id per old_id) because
    components only merge when documents are added — asserted cheaply downstream by
    the merge aggregate itself (a split would double rows, which the equality tests
    would catch) and directly in tests."""
    old = old_canon.select(F.col("canonical_id").alias("old_id"),
                           "mention_norm", "mention_type")
    new = new_canon.select("mention_norm", "mention_type",
                           F.col("canonical_id").alias("new_id"))
    return (old.join(new, ["mention_norm", "mention_type"])
            .select("old_id", "new_id").distinct())


def remap_edge_ids(edges: DataFrame, remap: DataFrame) -> DataFrame:
    """Re-key an edge table's src_id/dst_id through the old→new canonical remap
    (left joins — ids absent from the remap, e.g. never-reclustered fallback
    ``m:`` ids, pass through unchanged). The remap is vocabulary-bounded; AQE
    broadcasts it at runtime, so at scale this is two broadcast hash joins over the
    edge table with no shuffle of the fact side."""
    src_map = remap.select(F.col("old_id").alias("src_id"),
                           F.col("new_id").alias("_new_src"))
    dst_map = remap.select(F.col("old_id").alias("dst_id"),
                           F.col("new_id").alias("_new_dst"))
    return (edges.join(src_map, "src_id", "left")
            .join(dst_map, "dst_id", "left")
            .withColumn("src_id", F.coalesce("_new_src", "src_id"))
            .withColumn("dst_id", F.coalesce("_new_dst", "dst_id"))
            .drop("_new_src", "_new_dst"))


def merge_edge_tables(base_edges: DataFrame, delta_edges: DataFrame,
                      n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    """Union two sketch-carrying edge tables (same key space — re-key the base
    through :func:`remap_edge_ids` first) and re-aggregate per (src_id, pred,
    dst_id). Exact for n_occurrences / avg_confidence / example_doc_id; n_docs is
    the estimate of the HLL union, identical to a full recompute's estimate because
    the union of sketches of the same doc sets has identical register state."""
    for df in (base_edges, delta_edges):
        if "doc_sketch" not in df.columns:
            raise ValueError(
                "merge_edge_tables needs doc_sketch columns — build both sides with "
                "build_edges_table(doc_sketch=True); a countDistinct n_docs is not "
                "mergeable from aggregated rows")
    conf_micro = F.round(F.col("avg_confidence") * F.col("n_occurrences")
                         * F.lit(1e6)).cast("long")
    pre = (base_edges.select(*_EDGE_MERGE_COLS)
           .unionByName(delta_edges.select(*_EDGE_MERGE_COLS))
           .withColumn("_conf_micro", conf_micro))
    agg = pre.groupBy("src_id", "pred", "dst_id").agg(
        F.sum("n_occurrences").alias("n_occurrences"),
        ((F.sum("_conf_micro").cast("double") / F.sum("n_occurrences"))
         / F.lit(1e6)).alias("avg_confidence"),
        F.hll_union_agg("doc_sketch").alias("doc_sketch"),
        F.min("example_doc_id").alias("example_doc_id"),
    )
    return (agg.withColumn("n_docs", F.hll_sketch_estimate("doc_sketch"))
            .withColumn("bucket", F.pmod(F.hash("src_id"), F.lit(n_buckets))))


def apply_delta(base_links: DataFrame, base_canon: DataFrame, base_edges: DataFrame,
                delta_triples: DataFrame, aliases: DataFrame,
                link_fn=None, n_buckets: int = N_BUCKETS_DEFAULT,
                cc_checkpoint_dir: str | None = None) -> dict[str, DataFrame]:
    """The full incremental step: base graph state (links / canonical map / edge
    table with doc sketches) + a delta batch's triples → updated
    {links, canon, remap, edges, nodes}.

    ``link_fn(mentions, aliases)`` must match whatever built the base links
    (default :func:`linking.link_mentions`; pass ``linking.link_mentions_fuzzy``
    for fuzzy-linked bases) — determinism per surface is what makes re-linking the
    merged counts reproduce a full run exactly.

    Output equals a full recompute over base∪delta docs bit-for-bit on every edge
    column (n_docs included, via the sketch-estimate argument above) — pinned in
    tests/test_incremental.py against the fixture corpus split two ways."""
    link = link_fn or linking.link_mentions
    mentions = merged_mention_counts(base_links, delta_triples)
    new_links = link(mentions, aliases).localCheckpoint()
    new_canon = canonical_map(new_links, checkpoint_dir=cc_checkpoint_dir)
    new_canon = new_canon.localCheckpoint()  # consumed by remap, edges and nodes
    remap = canonical_remap(base_canon, new_canon)
    delta_linked = linking.link_triples(delta_triples, new_links)
    delta_edges = build_edges_table(delta_linked, new_canon, n_buckets,
                                    doc_sketch=True)
    edges = merge_edge_tables(remap_edge_ids(base_edges, remap), delta_edges,
                              n_buckets)
    return {"links": new_links, "canon": new_canon, "remap": remap,
            "edges": edges, "nodes": build_nodes(new_canon, n_buckets)}
