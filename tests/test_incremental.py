"""Incremental KG maintenance (operators/incremental.py): applying a delta doc
batch to an existing graph must equal a full recompute bit-for-bit — including
n_docs, which merges through the HLL doc sketch (register state is grouping-
independent) — and must do so without shuffling base-corpus volume."""

import pandas as pd
import pytest
from conftest import SF_DIR  # noqa: F401
from pyspark.sql import functions as F

from lingvo_spark_kg.fixtures.corpus import make_aliases
from lingvo_spark_kg.operators import incremental, linking
from lingvo_spark_kg.operators.canonicalize import canonical_map
from lingvo_spark_kg.operators.docsgen import generate_docs
from lingvo_spark_kg.operators.graph import build_edges_table, build_nodes
from lingvo_spark_kg.operators.schemas import ALIASES_SCHEMA
from lingvo_spark_kg.operators.triples import docs_to_triples_fused

N_DOCS = 300

EDGE_COLS = ["src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
             "n_docs", "example_doc_id", "bucket"]


@pytest.fixture(scope="module")
def aliases(spark):
    return spark.createDataFrame(pd.DataFrame(make_aliases(seed=42)),
                                 schema=ALIASES_SCHEMA)


@pytest.fixture(scope="module")
def all_triples(spark, gaz_bc):
    return docs_to_triples_fused(generate_docs(spark, N_DOCS), gaz_bc).localCheckpoint()


def _graph_state(triples, aliases):
    links = linking.link_mentions(
        linking.mentions_from_triples(triples), aliases).localCheckpoint()
    canon = canonical_map(links).localCheckpoint()
    edges = build_edges_table(linking.link_triples(triples, links), canon,
                              doc_sketch=True)
    return links, canon, edges


def _edge_rows(edges):
    return [tuple(r) for r in
            edges.select(*EDGE_COLS).orderBy("src_id", "pred", "dst_id").collect()]


@pytest.mark.parametrize("split_frac", [0.7, 0.3])
def test_incremental_equals_full_recompute(spark, aliases, all_triples, split_frac):
    """Full pipeline over base∪delta vs base state + apply_delta(delta): identical
    edge rows on every column. Two split points so both a delta-dominated and a
    base-dominated merge are exercised."""
    cut = f"doc-{int(N_DOCS * split_frac):08d}"
    base_t = all_triples.where(F.col("doc_id") < cut)
    delta_t = all_triples.where(F.col("doc_id") >= cut)
    assert base_t.count() > 0 and delta_t.count() > 0

    base_links, base_canon, base_edges = _graph_state(base_t, aliases)
    res = incremental.apply_delta(base_links, base_canon, base_edges,
                                  delta_t, aliases)

    full_links, full_canon, full_edges = _graph_state(all_triples, aliases)
    assert _edge_rows(res["edges"]) == _edge_rows(full_edges)

    # links and canonical map also reproduce the full run exactly
    lk = ["mention_norm", "mention_type", "n_mentions", "entity_id", "link_score"]
    assert (sorted(map(tuple, res["links"].select(*lk).collect()))
            == sorted(map(tuple, full_links.select(*lk).collect())))
    ck = ["mention_norm", "mention_type", "canonical_id"]
    assert (sorted(map(tuple, res["canon"].select(*ck).collect()))
            == sorted(map(tuple, full_canon.select(*ck).collect())))

    # nodes rebuild from the (vocabulary-bounded) merged canon — equal to full
    nk = ["canonical_id", "label", "node_type", "n_mentions", "n_surfaces"]
    assert (sorted(map(tuple, res["nodes"].select(*nk).collect()))
            == sorted(map(tuple, build_nodes(full_canon).select(*nk).collect())))


def test_delta_merges_base_clusters(spark):
    """A delta surface can BRIDGE two base components (it links to an entity from
    one component and stem-blocks with a surface from another): the remap must
    re-key the swallowed old cluster and the merged edge table must re-aggregate
    rows that collapse onto one new key — with n_docs exact via the sketch union
    even though one doc contributed to both old edges."""
    aliases = spark.createDataFrame(
        pd.DataFrame([
            {"alias_norm": "ту", "entity_id": "e_tu", "entity_type": "ORG",
             "prior": 1.0},
            {"alias_norm": "туполева", "entity_id": "e_tu", "entity_type": "ORG",
             "prior": 1.0},
        ]), schema=ALIASES_SCHEMA)
    t_schema = ("doc_id string, subj_norm string, subj_type string, pred string, "
                "obj_norm string, obj_type string, confidence double")
    # base: 'ту' links to e_tu; 'туполев' is unlinked and in its own stem block →
    # two components; doc d1 contributes to BOTH base edges
    base_t = spark.createDataFrame(
        [("d1", "ту", "ORG", "строил", "туполев", "ORG", 0.5),
         ("d1", "туполев", "ORG", "работал", "ту", "ORG", 0.25),
         ("d2", "ту", "ORG", "строил", "туполев", "ORG", 0.75)], t_schema)
    # delta: 'туполева' links to e_tu AND stems to 'туполев' → bridges the two
    delta_t = spark.createDataFrame(
        [("d3", "туполева", "ORG", "строил", "ту", "ORG", 1.0)], t_schema)

    base_links, base_canon, base_edges = _graph_state(base_t, aliases)
    # precondition: the base really has two components
    assert (base_canon.select("canonical_id").distinct().count() == 2)

    res = incremental.apply_delta(base_links, base_canon, base_edges,
                                  delta_t, aliases)
    remap = {r["old_id"]: r["new_id"] for r in res["remap"].collect()}
    assert remap["m:ORG:туполев"] == "e:e_tu"  # the swallowed cluster re-keyed
    assert all(v == "e:e_tu" for v in remap.values())

    full = _graph_state(base_t.unionByName(delta_t), aliases)[2]
    assert _edge_rows(res["edges"]) == _edge_rows(full)
    # the two base 'строил' edges collapsed onto (e_tu, строил, e_tu): n_occurrences
    # summed across re-keyed rows, n_docs = 3 distinct docs (d1 counted ONCE despite
    # feeding two old edges — the sketch union, not a sum of counts)
    row = {(r[0], r[1], r[2]): r for r in _edge_rows(res["edges"])}
    merged = row[("e:e_tu", "строил", "e:e_tu")]
    assert merged[3] == 3 and merged[5] == 3


def test_merge_requires_doc_sketch(spark, aliases, all_triples):
    base_t = all_triples.where(F.col("doc_id") < "doc-00000150")
    links, canon, _ = _graph_state(base_t, aliases)
    plain = build_edges_table(linking.link_triples(base_t, links), canon)
    with pytest.raises(ValueError, match="doc_sketch"):
        incremental.merge_edge_tables(plain, plain)


def test_incremental_plan_shape(spark, aliases, all_triples):
    """The merge plan never cross-joins, partial-aggregates map-side before the
    edge-key shuffle, and the base edge table enters as a checkpoint scan (no base
    triple re-extraction in the lineage)."""
    cut = "doc-00000150"
    base_t = all_triples.where(F.col("doc_id") < cut)
    delta_t = all_triples.where(F.col("doc_id") >= cut)
    base_links, base_canon, base_edges = _graph_state(base_t, aliases)
    base_edges = base_edges.localCheckpoint()  # the materialized stage table
    res = incremental.apply_delta(base_links, base_canon, base_edges,
                                  delta_t, aliases)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = res["edges"]._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan
    assert "Scan ExistingRDD" in plan
