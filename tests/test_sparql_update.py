"""SPARQL 1.1 Update (operators/sparql.parse_sparql_update / sparql_update +
KgPipeline.sparql_update): the assertional-edit path. Operator semantics are
DuckDB-parity-checked (each form's new edge set vs the same anti-join/union
SQL); the pipeline layer is checked for the generation contract — atomic
commit, time travel, snapshot REUSE of links/canonical_map via ingest-log
aliases (zero data copy), reference-counted expiry, and delta ingest still
working on top of an updated graph."""
from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

EDGE_SCHEMA = "src_id string, pred string, dst_id string, n_occurrences long"


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(s, p, d, n) for s, d, p, n in rows], EDGE_SCHEMA)


def _rand_rows(seed, n=120, nodes=16, preds=("w", "p", "c")):
    rng = random.Random(seed)
    uniq = sorted({(f"n{rng.randrange(nodes)}", f"n{rng.randrange(nodes)}",
                    rng.choice(preds)) for _ in range(n)})
    return [(s, d, p, rng.randrange(1, 9)) for s, d, p in uniq]


def _duck(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, p, d, n)"
                % ",".join(f"('{s}','{p}','{d}',{n})"
                           for s, d, p, n in rows))
    return con


def _got(df):
    return sorted(tuple(r) for r in df.select(
        "src_id", "pred", "dst_id", "n_occurrences").collect())


def test_insert_delete_data_match_duckdb(spark):
    """Ground-triple forms: DELETE DATA removes exactly the listed keys
    (metadata and all); INSERT DATA adds missing triples with
    n_occurrences=1 and is a NO-OP on present ones (the existing row keeps
    its metadata — set semantics on the key)."""
    from lingvo_spark_kg.operators.sparql import sparql_update

    rows = _rand_rows(301)
    df = _edges_df(spark, rows)
    con = _duck(rows)
    s0, d0, p0, n0 = rows[0]

    got = _got(sparql_update(
        df, f"DELETE DATA {{ <{s0}> <{p0}> <{d0}> . <zz> <q> <zz> }}"))
    ref = sorted(con.execute(
        f"SELECT s, p, d, n FROM e WHERE NOT (s = '{s0}' AND p = '{p0}' "
        f"AND d = '{d0}')").fetchall())
    assert got == ref and len(got) == len(rows) - 1

    got = _got(sparql_update(
        df, f"INSERT DATA {{ <zz:a> <q> <zz:b> . <{s0}> <{p0}> <{d0}> }}"))
    ref = sorted(con.execute(
        "SELECT s, p, d, n FROM e "
        "UNION ALL SELECT 'zz:a', 'q', 'zz:b', 1").fetchall())
    assert got == ref   # the present triple kept n_occurrences = n0, not 1
    assert (s0, p0, d0, n0) in got


def test_delete_where_and_full_form_match_duckdb(spark):
    """DELETE WHERE (pattern doubles as template) and the full
    DELETE-INSERT-WHERE form (predicate migration): both templates
    instantiate against the ORIGINAL store, deletes before inserts,
    inserted rows carry n_occurrences=1."""
    from lingvo_spark_kg.operators.sparql import sparql_update

    rows = _rand_rows(307)
    df = _edges_df(spark, rows)
    con = _duck(rows)

    got = _got(sparql_update(df, "DELETE WHERE { ?s <w> ?o }"))
    ref = sorted(con.execute(
        "SELECT s, p, d, n FROM e WHERE p <> 'w'").fetchall())
    assert got == ref and len(got) > 0

    got = _got(sparql_update(
        df, "DELETE { ?s <w> ?o } INSERT { ?s <v2> ?o } "
            "WHERE { ?s <w> ?o }"))
    ref = sorted(con.execute("""
        SELECT s, p, d, n FROM e WHERE p <> 'w'
        UNION ALL SELECT DISTINCT s, 'v2', d, 1 FROM e WHERE p = 'w'
    """).fetchall())
    assert got == ref

    # conditional insert with FILTER in the WHERE group
    got = _got(sparql_update(
        df, "INSERT { ?o <rev> ?s } WHERE { ?s <p> ?o FILTER (?s < ?o) }"))
    ref = sorted(con.execute("""
        SELECT s, p, d, n FROM e
        UNION ALL
        SELECT d, 'rev', s, 1 FROM (SELECT DISTINCT s, d FROM e
                                    WHERE p = 'p' AND s < d) q
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.s = q.d AND e.p = 'rev' AND e.d = q.s)
    """).fetchall())
    assert got == ref


def test_unbound_optional_slot_produces_no_triple(spark):
    """A template slot instantiated to NULL (unbound OPTIONAL variable)
    yields no triple — the spec's rule, not a NULL-keyed edge row."""
    from lingvo_spark_kg.operators.sparql import sparql_update

    df = _edges_df(spark, [("a", "b", "w", 1), ("b", "c", "p", 1)])
    out = sparql_update(
        df, "INSERT { ?o <thru> ?z } WHERE { ?s <w> ?o "
            "OPTIONAL { ?o <p> ?z } }")
    got = _got(out)
    assert ("b", "thru", "c", 1) in got
    assert all(all(x is not None for x in t[:3]) for t in got)
    assert len(got) == 3


def test_update_parse_error_contracts(spark):
    from lingvo_spark_kg.operators.sparql import parse_sparql_update

    cases = [
        ("INSERT DATA { ?s <w> <y> }", "ground triples"),
        ("DELETE DATA { <a> <w> ?o }", "ground triples"),
        ("DELETE WHERE { <a> <w> <b> }", "DELETE DATA"),
        ("DELETE { ?s <w>+ ?o } WHERE { ?s <w> ?o }", "predicate"),
        ("INSERT { ?s <v> ?o }", "needs WHERE"),
        ("DELETE { ?s <w> ?o } INSERT { ?s <v> ?o }", "needs WHERE"),
        ("INSERT DATA { <x> <w> <y> } ; DELETE DATA { <a> <w> <b> }",
         "one update operation"),
        ("SELECT ?s WHERE { ?s <w> ?o }", "expected INSERT / DELETE"),
        ("INSERT DATA { }", "at least one triple"),
    ]
    for text, pat in cases:
        with pytest.raises(ValueError, match=pat):
            parse_sparql_update(text)
    # an unbound template variable raises at execution
    from lingvo_spark_kg.operators.sparql import sparql_update

    df = _edges_df(spark, [("a", "b", "w", 1)])
    with pytest.raises(ValueError, match="not bound"):
        sparql_update(df, "INSERT { ?s <v> ?zz } WHERE { ?s <w> ?o }")


def test_pipeline_update_generations_alias_and_expire(spark, tmp_path):
    """KgPipeline.sparql_update commits a real generation: time travel keeps
    the old edges, diff_generations reports the assertion, links /
    canonical_map carry forward as ingest-log ALIASES (no physical copy on
    disk), expiry is reference-counted (the alias target outlives the
    generations that alias it), and a later ingest_delta still works on the
    updated graph."""
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.pipeline import KgPipeline

    wd = str(tmp_path / "kg")
    p = KgPipeline(spark, wd, n_docs=120, edge_doc_sketch=True)
    p.run()
    n0 = p.table("edges").count()
    nn0 = p.table("nodes").count()
    l0 = sorted(tuple(r) for r in p.table("links").collect())

    c1 = p.sparql_update(
        "INSERT DATA { <zz:new1> <asserted_rel> <zz:new2> }")
    assert c1 == {"nodes": nn0 + 2, "edges": n0 + 1, "graph_gen": 1}
    assert p.generations() == [0, 1]
    # zero-copy: no physical links/canonical_map for g1, but both readable
    assert not os.path.exists(os.path.join(wd, "links__g1"))
    assert sorted(tuple(r) for r in
                  p.table("links", generation=1).collect()) == l0
    # time travel + audit
    assert p.table("edges", generation=0).count() == n0
    d = p.diff_generations(0)
    assert [tuple(r) for r in
            d.select("src_id", "pred", "dst_id", "status").collect()] == \
        [("zz:new1", "asserted_rel", "zz:new2", "added")]
    # stub node rows: asserted, no mention provenance
    stub = p.table("nodes").where(
        F.col("canonical_id") == "zz:new1").collect()[0]
    assert stub["node_type"] == "asserted" and stub["n_mentions"] == 0

    # predicate migration on top (g2 aliases the same base links table)
    pred = p.table("edges").groupBy("pred").count().orderBy(
        F.desc("count"), "pred").first()["pred"]
    p.sparql_update(
        f"DELETE {{ ?s <{pred}> ?o }} INSERT {{ ?s <{pred}_v2> ?o }} "
        f"WHERE {{ ?s <{pred}> ?o }}")
    assert p.table("edges").where(F.col("pred") == pred).count() == 0
    assert p.table("edges", generation=1).where(
        F.col("pred") == pred).count() > 0
    assert p.sparql(
        f"ASK {{ ?s <{pred}_v2> ?o }}").collect()[0]["ask"] is True
    # AS-OF queries: the pre-migration snapshot still answers on the old
    # predicate, the live graph does not
    assert p.sparql(f"ASK {{ ?s <{pred}> ?o }}",
                    generation=1).collect()[0]["ask"] is True
    assert p.query([("?s", pred, "?o")], generation=1).count() > 0
    assert p.query([("?s", pred, "?o")]).count() == 0

    # expire g1: g2's alias target (the base links table) must survive
    assert p.expire_generations(keep=1) == [1]
    assert p.generations() == [0, 2]
    assert sorted(tuple(r) for r in p.table("links").collect()) == l0
    with pytest.raises(ValueError, match="not readable"):
        p.table("edges", generation=1)

    # delta ingest on top of the updated graph: aliases resolve, the graph
    # accumulates, and the asserted edge survives the merge
    p.ingest_delta(generate_docs(spark, 30, start=500))
    assert p.generations() == [0, 2, 3]
    assert p.table("edges").where(
        (F.col("src_id") == "zz:new1")
        & (F.col("pred") == "asserted_rel")).count() == 1
    assert p.table("links").count() >= len(l0)

    # snapshot dump: generation-0 N-Triples lack the asserted edge, the
    # latest dump carries it (export → LOAD is the backup/restore loop)
    from lingvo_spark_kg.operators.rdf import from_ntriples

    p.export_ntriples(str(tmp_path / "nt_g0"), generation=0)
    p.export_ntriples(str(tmp_path / "nt_new"))
    g0 = from_ntriples(spark.read.text(str(tmp_path / "nt_g0")))
    new = from_ntriples(spark.read.text(str(tmp_path / "nt_new")))
    flt = (F.col("src_id") == "zz:new1") & (F.col("pred") == "asserted_rel")
    assert g0.where(flt).count() == 0 and new.where(flt).count() == 1


def test_load_and_clear(spark, tmp_path):
    """LOAD round-trips an export_ntriples-format dump back into the store
    (insert semantics — present triples keep their metadata); CLEAR empties
    the store but keeps the schema."""
    from lingvo_spark_kg.operators.rdf import to_ntriples
    from lingvo_spark_kg.operators.sparql import sparql_update

    rows = _rand_rows(311, n=40)
    df = _edges_df(spark, rows)
    path = str(tmp_path / "dump.nt")
    to_ntriples(df).write.mode("overwrite").text(path)

    # loading a dump of a DISJOINT store inserts every triple at occ=1
    empty = df.where(F.lit(False))
    loaded = sparql_update(empty, f"LOAD <{path}>")
    assert sorted(tuple(r) for r in
                  loaded.select("src_id", "pred", "dst_id").collect()) == \
        sorted((s, p, d) for s, d, p, n in rows)
    assert loaded.where(F.col("n_occurrences") != 1).count() == 0

    # loading a dump of the store itself is a full no-op (set semantics)
    assert _got(sparql_update(df, f"LOAD <{path}>")) == _got(df)

    cleared = sparql_update(df, "CLEAR ALL")
    assert cleared.columns == df.columns and cleared.count() == 0
    with pytest.raises(ValueError, match="CLEAR takes"):
        sparql_update(df, "CLEAR GRAPH <g>")
    with pytest.raises(ValueError, match="LOAD needs"):
        sparql_update(df, "LOAD dump.nt")


def test_constant_pred_update_prunes_the_scan(spark, tmp_path):
    """Constant-predicate deletes/inserts anti-join only the matching pred
    slice: the slice filter must reach the parquet reader (PushedFilters),
    and the semantics must equal the unpruned variable-pred spelling."""
    from lingvo_spark_kg.operators.sparql import sparql_update

    rows = _rand_rows(313, n=60)
    path = str(tmp_path / "edges.parquet")
    _edges_df(spark, rows).write.parquet(path)
    edges = spark.read.parquet(path)

    out = sparql_update(
        edges, "DELETE { ?s <w> ?o } INSERT { ?s <w2> ?o } "
               "WHERE { ?s <w> ?o }")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(pred,w)" in plan
    # the variable-pred spelling (no pruning possible) agrees exactly:
    # ?p is constrained to 'w' by the WHERE scan, but the template pred is
    # a VARIABLE, so the executor must fall back to the full-store anti-join
    out2 = sparql_update(
        edges, "DELETE { ?s ?p ?o } INSERT { ?s <w2> ?o } "
               "WHERE { ?s ?p ?o FILTER (?p = 'w') }")
    assert _got(out) == _got(out2)


def test_pipeline_infer_rules_commits_a_generation(spark, tmp_path):
    """KgPipeline.infer_rules saturates the committed KG under a rule
    program and commits it like an update: the inferred edges equal the
    operator-level delta, diff_generations reports exactly them as
    'added', time travel keeps the pre-inference graph, and the
    mention-provenance stages alias through (zero copy)."""
    from lingvo_spark_kg.operators.graph import materialize_rules
    from lingvo_spark_kg.pipeline import KgPipeline

    wd = str(tmp_path / "kg")
    p = KgPipeline(spark, wd, n_docs=120)
    p.run()
    # the raw fixture graph has no 2-chains under one predicate (subjects
    # and objects are disjoint NER classes), so seed a chain through the
    # update path first — generation 1 — then infer on top of it
    p.sparql_update("INSERT DATA { <zz:a> <part_of> <zz:b> . "
                    "<zz:b> <part_of> <zz:c> . <zz:c> <part_of> <zz:d> }")
    edges1 = p.table("edges")
    n1 = edges1.count()
    rules = [([("?x", "part_of", "?y"), ("?y", "part_of", "?z")],
              ("?x", "part_of", "?z"))]
    exp = sorted(tuple(r) for r in materialize_rules(
        edges1, rules, include_base=False).collect())
    assert len(exp) == 3    # (a,c), (a,d), (b,d)

    c = p.infer_rules(rules)
    assert c["graph_gen"] == 2 and c["edges"] == n1 + 3
    d = p.diff_generations(1)
    got = sorted((r["src_id"], r["pred"], r["dst_id"])
                 for r in d.collect())
    assert got == exp and all(
        r["status"] == "added" for r in d.collect())
    # inferred rows carry the asserted-metadata contract
    new = p.table("edges").join(
        p.table("edges", generation=1).select("src_id", "pred", "dst_id"),
        ["src_id", "pred", "dst_id"], "left_anti")
    assert new.where((F.col("n_occurrences") != 1)
                     | F.col("avg_confidence").isNotNull()).count() == 0
    assert p.table("edges", generation=1).count() == n1
    assert not os.path.exists(os.path.join(wd, "links__g2"))
    assert p.table("links", generation=2).count() == p.table("links").count()


def test_update_sequence_matches_set_model(spark):
    """Model-based property test: a random sequence of ground INSERT DATA /
    DELETE DATA operations applied to the Spark store must equal a plain
    Python dict model implementing the spec (delete removes the key;
    insert adds n_occ=1 ONLY when absent — present keys keep their
    metadata), for every sequence."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lingvo_spark_kg.operators.sparql import sparql_update

    nodes = [f"n{i}" for i in range(5)]
    triple = st.tuples(st.sampled_from(nodes), st.sampled_from(["p", "q"]),
                       st.sampled_from(nodes))
    op = st.tuples(st.sampled_from(["INSERT", "DELETE"]),
                   st.lists(triple, min_size=1, max_size=3))
    base_rows = [("n0", "p", "n1", 5), ("n1", "q", "n2", 7),
                 ("n2", "p", "n0", 3), ("n3", "p", "n4", 2)]

    @settings(max_examples=12, deadline=None)
    @given(st.lists(op, min_size=1, max_size=3))
    def check(ops):
        df = spark.createDataFrame(base_rows, EDGE_SCHEMA)
        model = {(s, p, d): n for s, p, d, n in base_rows}
        for kind, triples in ops:
            body = " . ".join(f"<{s}> <{p}> <{d}>" for s, p, d in triples)
            df = sparql_update(df, f"{kind} DATA {{ {body} }}")
            for t in triples:
                if kind == "DELETE":
                    model.pop(t, None)
                else:
                    model.setdefault(t, 1)
        got = {(r["src_id"], r["pred"], r["dst_id"]): r["n_occurrences"]
               for r in df.collect()}
        assert got == model

    check()
