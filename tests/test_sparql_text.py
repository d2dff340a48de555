"""SPARQL text front-end (`operators/sparql.py`): parsing real SPARQL strings
onto the match_pattern / construct_edges algebra. Equivalence tests pin the
parsed query against the SAME query phrased through the kwargs API (which is
itself DuckDB-oracled in test_graph_query / test_round7 / test_sparql_algebra
and the kg_graph_query driver row), plus direct DuckDB parity for the
composite reads and the full error-contract battery."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(s, d, p, 1) for s, d, p in rows],
        "src_id string, dst_id string, pred string, n_occurrences long")


def _rand_rows(seed, n=120, nodes=16, preds=("w", "p", "c")):
    rng = random.Random(seed)
    return sorted({(f"n{rng.randrange(nodes)}", f"n{rng.randrange(nodes)}",
                    rng.choice(preds)) for _ in range(n)})


def _same(a, b):
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert a.columns == b.columns
    assert ra == rb
    return ra


def test_select_equiv_kwargs_basic_and_paths(spark):
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(5)
    df = _edges_df(spark, rows)
    got = _same(
        sparql_query(df, "SELECT ?a ?b WHERE { ?a w ?b }"),
        match_pattern(df, [("?a", "w", "?b")], select=["a", "b"]))
    assert len(got) > 0
    _same(sparql_query(df, "SELECT ?a ?c WHERE { ?a w|p/c ?c }"),
          match_pattern(df, [("?a", "w|p/c", "?c")],
                        select=["a", "c"]))
    # (w|p)/c is a PARTIAL paren wrap — grouping the linear grammar cannot
    # re-associate — and must fail loudly, never silently parse as w|p/c
    with pytest.raises(ValueError, match="malformed property-path"):
        sparql_query(df, "SELECT ?a ?c WHERE { ?a (w|p)/c ?c }").collect()
    _same(sparql_query(df, "SELECT ?a ?b WHERE { ?a !(w|^p)+ ?b }"),
          match_pattern(df, [("?a", "!(w|^p)+", "?b")], select=["a", "b"]))


def test_select_full_wrap_parens_only(spark):
    """`(w|p)` strips to `w|p`; `(w)+` (partial wrap — grouping the algebra
    cannot close) raises at compile, never silently re-associates."""
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(7)
    df = _edges_df(spark, rows)
    _same(sparql_query(df, "SELECT ?a ?b WHERE { ?a (w|p) ?b }"),
          match_pattern(df, [("?a", "w|p", "?b")], select=["a", "b"]))
    with pytest.raises(ValueError, match="malformed property-path"):
        sparql_query(df, "SELECT ?a ?b WHERE { ?a (w)+ ?b }").collect()


def test_semicolon_comma_lists_and_comments(spark):
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(11)
    df = _edges_df(spark, rows)
    q = """
    # predicate-object list + object list
    SELECT ?x ?y ?z ?w WHERE {
      ?x w ?y , ?z ;     # two objects, then a second predicate
         p ?w .
    }"""
    _same(sparql_query(df, q),
          match_pattern(df, [("?x", "w", "?y"), ("?x", "w", "?z"),
                             ("?x", "p", "?w")],
                        select=["x", "y", "z", "w"]))


def test_optional_minus_exists_filter_bind_values(spark):
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(13)
    df = _edges_df(spark, rows)
    q = """SELECT ?a ?b ?c ?tag WHERE {
        ?a w ?b .
        OPTIONAL { ?b p ?c }
        MINUS { ?a c ?m }
        FILTER EXISTS { ?b w ?e }
        BIND (CONCAT(?a, '+', ?b) AS ?tag)
        FILTER (?a != ?b && STRSTARTS(?tag, 'n'))
        VALUES ?a { 'n1' 'n2' 'n3' 'n4' 'n5' }
    }"""
    _same(sparql_query(df, q),
          match_pattern(df, [("?a", "w", "?b")],
                        optional=[[("?b", "p", "?c")]],
                        minus=[[("?a", "c", "?m")]],
                        exists=[[("?b", "w", "?e")]],
                        bind={"tag": "concat(a, '+', b)"},
                        filter=["a != b AND startswith(tag, 'n')"],
                        values={"a": ["n1", "n2", "n3", "n4", "n5"]},
                        select=["a", "b", "c", "tag"]))


def test_union_and_row_values(spark):
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(17)
    df = _edges_df(spark, rows)
    _same(sparql_query(
        df, "SELECT ?s ?o WHERE { { ?s w ?o } UNION { ?s p ?o } "
            "UNION { ?s c ?o } }"),
        match_pattern(df, [("?s", "w", "?o")],
                      union=[[("?s", "p", "?o")], [("?s", "c", "?o")]],
                      select=["s", "o"]))
    pairs = sorted({(s, d) for s, d, p in rows if p == "w"})[:3]
    values_block = " ".join(f"('{a}' '{b}')" for a, b in pairs)
    _same(sparql_query(
        df, "SELECT ?a ?b WHERE { VALUES (?a ?b) { %s } ?a w ?b }"
            % values_block),
        match_pattern(df, [("?a", "w", "?b")],
                      values=(("a", "b"), pairs), select=["a", "b"]))


def test_aggregation_matches_duckdb_via_text(spark):
    """End-to-end text → plan → result vs DuckDB running the same SQL."""
    import duckdb

    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(19)
    df = _edges_df(spark, rows)
    got = [tuple(r) for r in sparql_query(df, """
        SELECT ?a (COUNT(*) AS ?n) (MAX(?b) AS ?top) WHERE { ?a w ?b }
        GROUP BY ?a HAVING (?n >= 2) ORDER BY DESC(?n) ?a
    """).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d, p)"
                % ",".join(f"('{s}','{d}','{p}')" for s, d, p in rows))
    ref = [tuple(r) for r in con.execute("""
        SELECT s, COUNT(*) AS n, MAX(d) AS top FROM e WHERE p = 'w'
        GROUP BY s HAVING n >= 2 ORDER BY n DESC, s""").fetchall()]
    assert got == ref and len(got) > 0
    one = sparql_query(
        df, "SELECT (COUNT(DISTINCT ?b) AS ?n) WHERE { ?a ?p ?b }").collect()
    assert [tuple(r) for r in one] == [
        tuple(con.execute("SELECT COUNT(DISTINCT d) FROM e").fetchone())]


def test_select_expression_is_bind(spark):
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(23)
    df = _edges_df(spark, rows)
    _same(sparql_query(
        df, "SELECT ?a (STRLEN(?b) AS ?l) WHERE { ?a w ?b } "
            "ORDER BY ?a ?b LIMIT 7"),
        match_pattern(df, [("?a", "w", "?b")], bind={"l": "length(b)"},
                      select=["a", "l"], order_by=["a", "b"], limit=7))


def test_distinct_order_offset_limit(spark):
    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(29)
    df = _edges_df(spark, rows)
    _same(sparql_query(
        df, "SELECT DISTINCT ?a WHERE { ?a w ?b } "
            "ORDER BY DESC(?a) LIMIT 4 OFFSET 2"),
        match_pattern(df, [("?a", "w", "?b")], distinct=True,
                      select=["a"], order_by=["-a"], limit=4, offset=2))


def test_ask_constant_path_and_mixed(spark):
    from lingvo_spark_kg.operators.sparql import sparql_query

    df = _edges_df(spark, [("a", "b", "w"), ("b", "c", "w"),
                           ("c", "d", "p")])
    ask = lambda q: sparql_query(df, q).collect()[0]["ask"]
    assert ask("ASK { 'a' w 'b' }") is True
    assert ask("ASK { 'a' w 'c' }") is False
    assert ask("ASK { 'a' w+ 'c' }") is True       # constant path probe
    assert ask("ASK { 'a' w 'b' . ?x p ?y }") is True
    assert ask("ASK { 'a' w 'b' . ?x zz ?y }") is False
    assert ask("ASK WHERE { ?x w ?y FILTER(?x = 'b') }") is True
    out = sparql_query(df, "ASK { 'a' w 'b' }")
    assert out.columns == ["ask"] and out.schema["ask"].dataType.typeName() \
        == "boolean"


def test_construct_matches_construct_edges(spark):
    from lingvo_spark_kg.operators.graph import construct_edges
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(31)
    df = _edges_df(spark, rows)
    got = sparql_query(df, """
        CONSTRUCT { ?a linked ?c } WHERE { ?a w ?b . ?b p ?c
                                           FILTER (?a != ?c) }""")
    ref = construct_edges(df, [("?a", "w", "?b"), ("?b", "p", "?c")],
                          ("?a", "linked", "?c"), filter="a != c")
    _same(got, ref)
    # multi-triple template: the body matches once, both heads emitted —
    # equivalent to the bag-union of the per-head single-template queries
    got2 = sparql_query(df, """
        CONSTRUCT { ?a fwd ?c . ?c rev ?a } WHERE { ?a w ?b . ?b p ?c }""")
    ref2 = construct_edges(
        df, [("?a", "w", "?b"), ("?b", "p", "?c")], ("?a", "fwd", "?c")) \
        .unionByName(construct_edges(
            df, [("?a", "w", "?b"), ("?b", "p", "?c")], ("?c", "rev", "?a")))
    _same(got2, ref2)


def test_prefixes_and_iris(spark):
    from lingvo_spark_kg.operators.sparql import parse_sparql

    q = """PREFIX ex: <http://ex.org/>
           PREFIX r: <urn:rel#>
           SELECT ?x WHERE { ex:alice r:knows ?x . ?x a <urn:t#Person> }"""
    parsed = parse_sparql(q)
    assert parsed["kwargs"]["patterns"] == [
        ("http://ex.org/alice", "urn:rel#knows", "?x"),
        ("?x", "rdf:type", "urn:t#Person")]


def test_literals_numbers_booleans(spark):
    from lingvo_spark_kg.operators.sparql import parse_sparql

    kw = parse_sparql("SELECT ?x WHERE { ?x w 3 . ?x p 2.5 . ?x c true . "
                      "?x w 'it\\'s' }")["kwargs"]
    assert kw["patterns"] == [("?x", "w", 3), ("?x", "p", 2.5),
                              ("?x", "c", True), ("?x", "w", "it's")]


def test_error_contracts(spark):
    from lingvo_spark_kg.operators.sparql import parse_sparql

    bad = [
        ("SELECT ?x WHERE { }", "no triple"),
        ("SELECT ?x WHERE { ?x p ?y", "unterminated"),
        ("SELECT WHERE { ?x p ?y }", "empty SELECT"),
        ("SELECT ?x WHERE { ?x p ?y } GROUP BY ?x", "GROUP BY needs"),
        ("SELECT (COUNT(*) AS ?n) ?y WHERE { ?y p ?z }", "not GROUP BY"),
        ("SELECT ?x WHERE { ?x p ?y { ?a c ?b } UNION { ?a w ?b } }",
         "whole pattern"),
        ("SELECT ?x WHERE { OPTIONAL { ?x p ?y FILTER(?x>1) } ?x c ?z }",
         "triple patterns only"),
        ("CONSTRUCT { } WHERE { ?a p ?b }", "at least one head"),
        ("CONSTRUCT { ?a x+ ?b } WHERE { ?a p ?b }", "plain constant"),
        ("CONSTRUCT { ?a x ?b } WHERE { { ?a p ?b } UNION { ?a c ?b } }",
         "CONSTRUCT supports"),
        ("FOO ?x WHERE { ?x p ?y }", "SELECT / ASK / CONSTRUCT"),
        ("SELECT ?x WHERE { ?x p ?y } LIMIT x", "integer"),
        ("SELECT ?x WHERE { ?x p ?y } BANANA", "trailing"),
        ("PREFIX ex <http://x> SELECT ?x WHERE { ?x p ?y }", "ns:"),
        ("SELECT ?x WHERE { ?x p ?y . BIND(1 + 1) }", "AS"),
        ("SELECT ?x WHERE { ?x p ?y . VALUES ?v { 'a' } VALUES ?w { 'b' } }",
         "one VALUES"),
    ]
    for q, why in bad:
        with pytest.raises(ValueError, match=why.replace("(", "\\(")):
            parse_sparql(q)


def test_ask_const_only_rejects_extra_algebra(spark):
    from lingvo_spark_kg.operators.sparql import sparql_query

    df = _edges_df(spark, [("a", "b", "w")])
    with pytest.raises(ValueError, match="constant-only"):
        sparql_query(df, "ASK { 'a' w 'b' FILTER(1 = 1) }")


def test_pipeline_sparql_sugar(spark, tmp_path):
    from lingvo_spark_kg.pipeline import KgPipeline

    p = KgPipeline(spark, str(tmp_path / "wd"), n_docs=30, seed=4)
    p.run(resume=True)
    pred = p.table("edges").select("pred").first()["pred"]
    out = p.sparql("SELECT ?s (COUNT(*) AS ?n) WHERE { ?s <%s> ?o } "
                   "GROUP BY ?s" % pred)
    assert out.columns == ["s", "n"]
    ref = (p.table("edges").where(F.col("pred") == pred)
           .groupBy("src_id").count())
    assert out.count() == ref.count()
    assert p.sparql("ASK { ?s <%s> ?o }" % pred).collect()[0]["ask"] is True


def test_describe_constants_and_vars(spark):
    """DESCRIBE returns every edge row touching the described nodes (the
    induced star, all columns kept, set semantics) — constants directly,
    variables through the WHERE solutions."""
    from lingvo_spark_kg.operators.sparql import sparql_query

    df = _edges_df(spark, [("a", "b", "w"), ("b", "c", "w"),
                           ("c", "d", "p"), ("d", "e", "p")])
    got = sorted((r["src_id"], r["pred"], r["dst_id"]) for r in
                 sparql_query(df, "DESCRIBE 'b'").collect())
    assert got == [("a", "w", "b"), ("b", "w", "c")]
    assert sparql_query(df, "DESCRIBE 'b'").columns == df.columns

    # every node with an outgoing p edge → c and d → edges touching c or d
    got = sorted((r["src_id"], r["pred"], r["dst_id"]) for r in sparql_query(
        df, "DESCRIBE ?x WHERE { ?x p ?y }").collect())
    assert got == [("b", "w", "c"), ("c", "p", "d"), ("d", "p", "e")]

    # mixed: a constant plus a bound variable, WHERE algebra applies
    got = sorted((r["src_id"], r["pred"], r["dst_id"]) for r in sparql_query(
        df, "DESCRIBE 'e' ?x WHERE { ?x p ?y FILTER(?x = 'c') }").collect())
    assert got == [("b", "w", "c"), ("c", "p", "d"), ("d", "p", "e")]


def test_describe_errors(spark):
    from lingvo_spark_kg.operators.sparql import parse_sparql, sparql_query

    df = _edges_df(spark, [("a", "b", "w")])
    with pytest.raises(ValueError, match="DESCRIBE needs terms"):
        parse_sparql("DESCRIBE WHERE { ?x w ?y }")
    with pytest.raises(ValueError, match="WHERE group binding"):
        parse_sparql("DESCRIBE ?x")
    with pytest.raises(ValueError, match="not bound"):
        sparql_query(df, "DESCRIBE ?zz WHERE { ?x w ?y }")
    with pytest.raises(ValueError, match="triples \\+"):
        parse_sparql("DESCRIBE ?x WHERE { { ?x w ?y } UNION { ?x p ?y } }")


def test_subquery_text_matches_duckdb(spark):
    """Nested ``{ SELECT ... }`` (§12): the inner grouped query joins the
    outer pattern on the shared projected variable — direct DuckDB parity,
    plus the kwargs-API equivalence through ``sub=``."""
    import duckdb

    from lingvo_spark_kg.operators.graph import match_pattern
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(201)
    df = _edges_df(spark, rows)
    q = """SELECT ?a ?b ?n WHERE { ?a <w> ?b .
             { SELECT ?a (COUNT(*) AS ?n) WHERE { ?a <w> ?z } GROUP BY ?a }
           }"""
    got = _same(
        sparql_query(df, q),
        match_pattern(df, [("?a", "w", "?b")],
                      sub=[match_pattern(df, [("?a", "w", "?z")],
                                         group_by=["a"],
                                         agg={"n": "count(*)"})],
                      select=["a", "b", "n"]))
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d, p)"
                % ",".join(f"('{s}','{d}','{p}')" for s, d, p in rows))
    ref = sorted(con.execute("""
        SELECT w.s, w.d, q.n FROM e w
        JOIN (SELECT s, COUNT(*) AS n FROM e WHERE p = 'w' GROUP BY s) q
          ON q.s = w.s
        WHERE w.p = 'w'""").fetchall())
    assert got == ref and len(got) > 0


def test_subquery_uncorrelated_and_nested(spark):
    """An aggregate subquery projecting no shared variable gives every
    solution the global total (broadcast product); subqueries NEST — the
    inner WHERE group may itself hold a subquery."""
    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(203)
    df = _edges_df(spark, rows)
    n_w = len([r for r in rows if r[2] == "w"])
    got = sorted(tuple(r) for r in sparql_query(
        df, """SELECT ?a ?t WHERE { ?a <p> ?b .
                 { SELECT (COUNT(*) AS ?t) WHERE { ?x <w> ?y } } }"""
    ).collect())
    assert len(got) > 0 and all(t == n_w for _, t in got)
    # two levels: innermost counts w-edges per subject, middle keeps the
    # subjects seen ≥2 times, outer joins the p-scan onto that subject set
    got2 = sorted(tuple(r) for r in sparql_query(
        df, """SELECT ?a ?b ?n WHERE { ?a <p> ?b .
                 { SELECT ?a ?n WHERE { ?a <w> ?z .
                     { SELECT ?a (COUNT(*) AS ?n) WHERE { ?a <w> ?q }
                       GROUP BY ?a } }
                 }
               }"""
    ).collect())
    exp = {}
    for s, d, p in rows:
        if p == "w":
            exp[s] = exp.get(s, 0) + 1
    # bag semantics: the middle SELECT ?a ?n keeps one row per (a, z)
    # binding, so each outer row repeats exp[a] times
    ref2 = sorted((s, d, exp[s])
                  for s, d, p in rows if p == "p" and s in exp
                  for _ in range(exp[s]))
    assert got2 == ref2 and len(got2) > 0


def test_group_concat_and_sample_match_duckdb(spark):
    """GROUP_CONCAT (sorted, custom separator, DISTINCT) and SAMPLE (→ min,
    a legal deterministic choice) vs DuckDB's ordered string_agg / MIN."""
    import duckdb

    from lingvo_spark_kg.operators.sparql import sparql_query

    rows = _rand_rows(207)
    df = _edges_df(spark, rows)
    got = sorted(tuple(r) for r in sparql_query(
        df, """SELECT ?a (GROUP_CONCAT(?b; SEPARATOR=",") AS ?gc)
                      (SAMPLE(?b) AS ?smp)
               WHERE { ?a <w> ?b } GROUP BY ?a"""
    ).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d, p)"
                % ",".join(f"('{s}','{d}','{p}')" for s, d, p in rows))
    ref = sorted(con.execute("""
        SELECT s, string_agg(d, ',' ORDER BY d), MIN(d)
        FROM e WHERE p = 'w' GROUP BY s""").fetchall())
    assert got == ref and len(got) > 0
    # DISTINCT + default separator (single space, the spec's)
    got = sorted(tuple(r) for r in sparql_query(
        df, """SELECT ?a (GROUP_CONCAT(DISTINCT ?b) AS ?gc)
               WHERE { ?a <w> ?b } GROUP BY ?a"""
    ).collect())
    ref = sorted(con.execute("""
        SELECT s, string_agg(DISTINCT d, ' ' ORDER BY d)
        FROM e WHERE p = 'w' GROUP BY s""").fetchall())
    assert got == ref and len(got) > 0


def test_subquery_and_agg_error_contracts(spark):
    """Subqueries inside OPTIONAL/MINUS/EXISTS/union branches, next to a
    UNION chain, in CONSTRUCT/DESCRIBE, and malformed GROUP_CONCAT /
    SAMPLE arguments all raise with the reason — never a silent
    mis-lowering."""
    from lingvo_spark_kg.operators.sparql import parse_sparql

    sub = "{ SELECT ?a WHERE { ?a <w> ?b } }"
    with pytest.raises(ValueError, match="subquery"):
        parse_sparql(
            f"SELECT ?a WHERE {{ ?a <w> ?c OPTIONAL {{ {sub} }} }}")
    with pytest.raises(ValueError, match="subquery"):
        parse_sparql(
            f"SELECT ?a WHERE {{ ?a <w> ?c MINUS {{ {sub} }} }}")
    with pytest.raises(ValueError, match="whole pattern"):
        parse_sparql(
            f"SELECT ?a WHERE {{ {sub} {{ ?a <w> ?b }} UNION "
            "{ ?a <p> ?b } }")
    with pytest.raises(ValueError, match="CONSTRUCT"):
        parse_sparql(
            f"CONSTRUCT {{ ?a <r> ?a }} WHERE {{ ?a <w> ?b . {sub} }}")
    with pytest.raises(ValueError, match="DESCRIBE"):
        parse_sparql(f"DESCRIBE ?a WHERE {{ ?a <w> ?b . {sub} }}")
    with pytest.raises(ValueError, match="no triple patterns"):
        parse_sparql(f"SELECT ?a WHERE {{ {sub} }}")
    with pytest.raises(ValueError, match="GROUP_CONCAT takes a single"):
        parse_sparql("SELECT (GROUP_CONCAT(CONCAT(?a, ?b)) AS ?g) "
                     "WHERE { ?a <w> ?b }")
    with pytest.raises(ValueError, match="SAMPLE takes a single"):
        parse_sparql("SELECT (SAMPLE(?a + 1) AS ?s) WHERE { ?a <w> ?b }")
