"""Round-7 second-pass SPARQL algebra completions in ``graph.match_pattern``:
negated property sets ``!p`` / ``!(p|^q)`` (§9.1 PathNegatedPropertySet,
composable with closures), FILTER EXISTS / NOT EXISTS (correlated semi/anti
join + the uncorrelated one-row-flag case), BIND (computed variables), and the
solution modifiers SELECT / ORDER BY / LIMIT / OFFSET — each checked against
DuckDB lowering the identical algebra, plus the error contracts."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(s, d, p, 1) for s, d, p in rows],
        "src_id long, dst_id long, pred string, n_occurrences long")


def _duck(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d, p)"
                % ",".join(f"({s},{d},'{p}')" for s, d, p in rows))
    return con


def _rand_rows(seed, n=140, nodes=18, preds=("w", "p", "c", "m")):
    rng = random.Random(seed)
    return sorted({(rng.randrange(nodes), rng.randrange(nodes),
                    rng.choice(preds)) for _ in range(n)})


def test_nps_forward_matches_duckdb(spark):
    """``!p`` = any edge whose predicate is not p — vs ``p <> 'p'``. Bag
    semantics: one solution per matching EDGE, so an (s, d) pair connected by
    two non-excluded predicates appears twice (multiset compare)."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(41)
    got = sorted(tuple(r) for r in match_pattern(
        _edges_df(spark, rows), [("?a", "!p", "?b")]).collect())
    ref = sorted(_duck(rows).execute(
        "SELECT s, d FROM e WHERE p <> 'p'").fetchall())
    assert got == ref and len(got) > 0


def test_nps_multi_element_and_inverse(spark):
    """``!(w|c)`` excludes both names; ``!^p`` is the inverse-only set (the
    swapped scan); ``!(w|^w)`` unions the forward and swapped complements as
    a bag (spec translation: NPS(fwd) UNION ^NPS(inv))."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(43)
    df = _edges_df(spark, rows)
    con = _duck(rows)

    got = sorted(tuple(r) for r in
                 match_pattern(df, [("?a", "!(w|c)", "?b")]).collect())
    ref = sorted(con.execute(
        "SELECT s, d FROM e WHERE p NOT IN ('w', 'c')").fetchall())
    assert got == ref and len(got) > 0

    got = sorted(tuple(r) for r in
                 match_pattern(df, [("?a", "!^p", "?b")]).collect())
    ref = sorted(con.execute(
        "SELECT d, s FROM e WHERE p <> 'p'").fetchall())
    assert got == ref and len(got) > 0

    got = sorted(tuple(r) for r in
                 match_pattern(df, [("?a", "!(w|^w)", "?b")]).collect())
    ref = sorted(con.execute(
        "SELECT s, d FROM e WHERE p <> 'w' "
        "UNION ALL SELECT d, s FROM e WHERE p <> 'w'").fetchall())
    assert got == ref


def test_nps_closure_matches_recursive_cte(spark):
    """``!(p|m)+`` closes over the complement scan — one-or-more hops through
    any edge whose predicate is outside the set, distinct pair semantics —
    vs a recursive CTE over the same complement in DuckDB."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(47, n=60, nodes=12)
    got = sorted(tuple(r) for r in match_pattern(
        _edges_df(spark, rows), [("?a", "!(p|m)+", "?b")]).collect())
    ref = sorted(_duck(rows).execute("""
        WITH RECURSIVE clo(s, d) AS (
            SELECT s, d FROM e WHERE p NOT IN ('p', 'm')
            UNION SELECT clo.s, e.d FROM clo
            JOIN e ON e.s = clo.d AND e.p NOT IN ('p', 'm'))
        SELECT s, d FROM clo""").fetchall())
    assert got == ref and len(got) > 0


def test_nps_composes_in_sequences_and_alternation(spark):
    """NPS is a step like any other: ``!(w)/c`` sequences the complement scan
    into a mid-keyed join; the path splitter keeps ``|`` inside ``!(...)``
    out of the alternation level."""
    from lingvo_spark_kg.operators.graph import match_pattern, _parse_path

    assert _parse_path("!(a|b)/c") == [[
        (False, ("!", frozenset({"a", "b"}), frozenset()), ""),
        (False, "c", ""),
    ]]
    rows = _rand_rows(53)
    got = sorted(tuple(r) for r in match_pattern(
        _edges_df(spark, rows), [("?a", "!(w)/c", "?b")]).collect())
    ref = sorted(_duck(rows).execute("""
        SELECT x.s, y.d FROM e x JOIN e y ON y.s = x.d
        WHERE x.p <> 'w' AND y.p = 'c'""").fetchall())
    assert got == ref and len(got) > 0


def test_nps_malformed_raises(spark):
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "p")])
    for bad in ("!", "!()", "!(p", "!p)", "(p)", "!(p|)", "!(^)", "!(p|q"):
        with pytest.raises(ValueError):
            match_pattern(df, [("?x", bad, "?y")])


def test_exists_correlated_matches_duckdb(spark):
    """FILTER EXISTS keeps the solutions whose shared variable has a match —
    a left-semi join, vs SQL EXISTS; NOT EXISTS is the anti-join."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(59)
    df = _edges_df(spark, rows)
    con = _duck(rows)

    got = sorted(tuple(r) for r in match_pattern(
        df, [("?a", "w", "?b")], exists=[[("?b", "c", "?z")]]).collect())
    ref = sorted(con.execute("""
        SELECT s, d FROM e x WHERE p = 'w' AND EXISTS (
            SELECT 1 FROM e y WHERE y.s = x.d AND y.p = 'c')""").fetchall())
    assert got == ref and len(got) > 0

    got = sorted(tuple(r) for r in match_pattern(
        df, [("?a", "w", "?b")], not_exists=[[("?b", "c", "?z")]]).collect())
    ref = sorted(con.execute("""
        SELECT s, d FROM e x WHERE p = 'w' AND NOT EXISTS (
            SELECT 1 FROM e y WHERE y.s = x.d AND y.p = 'c')""").fetchall())
    assert got == ref and len(got) > 0


def test_exists_uncorrelated_is_group_boolean(spark):
    """A group sharing no variable is the spec's uncorrelated EXISTS: one
    boolean over the whole group — all-or-nothing on the solutions — and is
    legal here (unlike ``minus``, where the disjoint domain raises)."""
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "w"), (2, 3, "c")])
    base = [("?a", "w", "?b")]
    assert match_pattern(df, base,
                         exists=[[("?x", "c", "?y")]]).count() == 1
    assert match_pattern(df, base,
                         exists=[[("?x", "zz", "?y")]]).count() == 0
    assert match_pattern(df, base,
                         not_exists=[[("?x", "c", "?y")]]).count() == 0
    assert match_pattern(df, base,
                         not_exists=[[("?x", "zz", "?y")]]).count() == 1
    with pytest.raises(ValueError, match="exists group must not be empty"):
        match_pattern(df, base, exists=[[]])
    with pytest.raises(ValueError, match="not_exists group must not be empty"):
        match_pattern(df, base, not_exists=[[]])


def test_exists_differs_from_minus_on_null_shared_var(spark):
    """The documented NULL caveat, exercised: a union-branch solution whose
    shared variable is unbound (NULL) never anti-matches — NOT EXISTS keeps
    it, EXISTS drops it — the standard SQL lowering for both."""
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "w"), (9, 8, "u"), (1, 7, "c")])
    kw = dict(union=[[("?z", "u", "?b")]])  # union rows leave ?a NULL
    kept = match_pattern(df, [("?a", "w", "?b")],
                         not_exists=[[("?a", "c", "?y")]], **kw).collect()
    # (1,2) anti-matched away (1 has a c-edge); the NULL-a union row survives
    assert [(r["a"], r["b"]) for r in kept] == [(None, 8)]
    kept = match_pattern(df, [("?a", "w", "?b")],
                         exists=[[("?a", "c", "?y")]], **kw).collect()
    assert [(r["a"], r["b"]) for r in kept] == [(1, 2)]


def test_bind_matches_duckdb_and_projects_after_pattern_vars(spark):
    """BIND extends solutions with computed columns (SQL string or Column),
    later entries can reference earlier ones, and bound variables join the
    output after the pattern variables, visible to FILTER."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(61)
    out = match_pattern(
        _edges_df(spark, rows), [("?a", "w", "?b")],
        bind={"total": "a + b", "big": F.col("total") * 2},
        filter="big >= 20")
    assert out.columns == ["a", "b", "total", "big"]
    got = sorted(tuple(r) for r in out.collect())
    ref = sorted(_duck(rows).execute("""
        SELECT s, d, s + d AS total, (s + d) * 2 AS big FROM e
        WHERE p = 'w' AND (s + d) * 2 >= 20""").fetchall())
    assert got == ref and len(got) > 0


def test_bind_rebind_raises(spark):
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "w")])
    with pytest.raises(ValueError, match="reassign"):
        match_pattern(df, [("?a", "w", "?b")], bind={"a": "b + 1"})
    with pytest.raises(ValueError, match="reassign"):
        match_pattern(df, [("?a", "w", "?b")],
                      optional=[[("?b", "c", "?c")]], bind={"c": "1"})


def test_solution_modifiers_match_duckdb(spark):
    """SELECT projection + ORDER BY (asc / ``-`` desc) + OFFSET + LIMIT — the
    spec's modifier order (project → distinct → order → slice) vs the same
    clause stack in DuckDB; ties broken by a second sort key so the slice is
    deterministic on both engines."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(67)
    got = [tuple(r) for r in match_pattern(
        _edges_df(spark, rows), [("?a", "w", "?b"), ("?b", "?p", "?c")],
        select=["a", "b"], distinct=True,
        order_by=["-a", "b"], offset=2, limit=5).collect()]
    ref = _duck(rows).execute("""
        SELECT DISTINCT x.s, x.d FROM e x JOIN e y ON y.s = x.d
        WHERE x.p = 'w'
        ORDER BY x.s DESC, x.d ASC LIMIT 5 OFFSET 2""").fetchall()
    assert got == [tuple(r) for r in ref] and len(got) == 5


def test_solution_modifier_validation(spark):
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "w")])
    with pytest.raises(ValueError, match="select"):
        match_pattern(df, [("?a", "w", "?b")], select=["zz"])
    with pytest.raises(ValueError, match="select"):
        match_pattern(df, [("?a", "w", "?b")], select=[])
    with pytest.raises(ValueError, match="order_by"):
        match_pattern(df, [("?a", "w", "?b")], order_by=[])
    # select may project a BIND variable; order_by accepts a Column
    out = match_pattern(df, [("?a", "w", "?b")], bind={"s2": "a * 10"},
                        select=["s2"], order_by=[F.col("s2").desc()], limit=1)
    assert [tuple(r) for r in out.collect()] == [(10,)]


def test_exists_group_does_not_leak_variables(spark):
    """EXISTS / NOT EXISTS groups are filters: their variables never project
    into the output (unlike OPTIONAL), matching the spec."""
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "w"), (2, 3, "c")])
    out = match_pattern(df, [("?a", "w", "?b")],
                        exists=[[("?b", "c", "?extra")]])
    assert out.columns == ["a", "b"]


def test_nps_closure_cached_once_per_set(spark, monkeypatch):
    """Two ``!(...)+`` terms over the SAME negated set share one closure
    compile (the per-call cache keys on the hashable NPS spec)."""
    from lingvo_spark_kg.operators import graph as g

    calls = []
    real = g.transitive_closure

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(g, "transitive_closure", counting)
    df = _edges_df(spark, [(1, 2, "w"), (2, 3, "w"), (3, 4, "c")])
    out = g.match_pattern(df, [("?a", "!(c)+", "?b"),
                               ("?b", "!(c)+", "?c")])
    assert out.count() > 0
    assert len(calls) == 1


def test_pipeline_query_passes_new_algebra_through(spark, tmp_path):
    """KgPipeline.query forwards the full kwargs surface (bind / exists /
    modifiers) to match_pattern."""
    from lingvo_spark_kg.pipeline import KgPipeline

    p = KgPipeline(spark, str(tmp_path / "wd"), n_docs=40, seed=3)
    p.run()
    edges = p.table("edges")
    pred = edges.groupBy("pred").count() \
        .orderBy(F.desc("count"), F.asc("pred")).first()["pred"]
    out = p.query([("?s", f"!zzz_{pred}", "?o")],
                  bind={"pair": "concat(s, '|', o)"},
                  select=["pair"], order_by=["pair"], limit=5)
    assert out.columns == ["pair"]
    assert out.count() == min(5, edges.count())


def test_group_by_aggregates_match_duckdb(spark):
    """SPARQL aggregation: GROUP BY bound variables + COUNT/SUM/MAX + HAVING
    vs the same clause stack in DuckDB; aggregates are map-side-combinable
    hash aggregates, and the grouped output is keys-then-aggregate-names."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(71)
    out = match_pattern(
        _edges_df(spark, rows), [("?a", "?p", "?b")],
        group_by=["a"], agg={"n": "count(*)", "mx": "max(b)",
                             "tot": F.sum("b")},
        having="n >= 2")
    assert out.columns == ["a", "n", "mx", "tot"]
    got = sorted(tuple(r) for r in out.collect())
    ref = sorted(_duck(rows).execute("""
        SELECT s, COUNT(*) AS n, MAX(d) AS mx, SUM(d) AS tot
        FROM e GROUP BY s HAVING COUNT(*) >= 2""").fetchall())
    assert got == ref and len(got) > 0


def test_global_aggregate_implicit_group(spark):
    """agg without group_by = the spec's one implicit group: a single row."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(73)
    got = match_pattern(
        _edges_df(spark, rows), [("?a", "w", "?b")],
        agg={"n": "count(*)", "ndst": "count(distinct b)"}).collect()
    ref = _duck(rows).execute(
        "SELECT COUNT(*), COUNT(DISTINCT d) FROM e WHERE p = 'w'").fetchone()
    assert [tuple(r) for r in got] == [tuple(ref)]


def test_aggregation_composes_with_modifiers_and_bind(spark):
    """Aggregates see BIND output; select/order_by/limit operate on the
    grouped columns (the spec's projection-after-aggregation)."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(79)
    got = [tuple(r) for r in match_pattern(
        _edges_df(spark, rows), [("?a", "w", "?b")],
        bind={"dbl": "b * 2"},
        group_by=["a"], agg={"s2": "sum(dbl)"},
        select=["s2", "a"], order_by=["-s2", "a"], limit=3).collect()]
    ref = [tuple(r) for r in _duck(rows).execute("""
        SELECT SUM(d * 2) AS s2, s FROM e WHERE p = 'w'
        GROUP BY s ORDER BY s2 DESC, s LIMIT 3""").fetchall()]
    assert got == ref and len(got) == 3


def test_aggregation_validation(spark):
    from lingvo_spark_kg.operators.graph import match_pattern

    df = _edges_df(spark, [(1, 2, "w")])
    base = [("?a", "w", "?b")]
    with pytest.raises(ValueError, match="group_by needs agg"):
        match_pattern(df, base, group_by=["a"])
    with pytest.raises(ValueError, match="not bound"):
        match_pattern(df, base, group_by=["zz"], agg={"n": "count(*)"})
    with pytest.raises(ValueError, match="collide"):
        match_pattern(df, base, group_by=["a"], agg={"a": "count(*)"})
    with pytest.raises(ValueError, match="having needs agg"):
        match_pattern(df, base, having="a > 1")
    with pytest.raises(ValueError, match="select"):
        match_pattern(df, base, group_by=["a"], agg={"n": "count(*)"},
                      select=["b"])  # b is pre-group, not in grouped output


def test_sub_correlated_matches_duckdb(spark):
    """SPARQL 1.1 §12 subqueries via ``sub=``: an inner grouped solution
    frame joins the outer solutions on the shared projected variable —
    vs the identical nested-subquery join in DuckDB."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(83)
    df = _edges_df(spark, rows)
    inner = match_pattern(df, [("?a", "w", "?z")],
                          group_by=["a"], agg={"n": "count(*)"})
    got = sorted(tuple(r) for r in match_pattern(
        df, [("?a", "w", "?b")], sub=[inner]).collect())
    ref = sorted(_duck(rows).execute("""
        SELECT w.s, w.d, q.n FROM e w
        JOIN (SELECT s, COUNT(*) AS n FROM e WHERE p = 'w' GROUP BY s) q
          ON q.s = w.s
        WHERE w.p = 'w'""").fetchall())
    assert got == ref and len(got) > 0


def test_sub_uncorrelated_is_broadcast_product(spark):
    """A sub frame sharing no variable is the spec's disjoint-domain join —
    the one-row aggregate-subquery idiom: every solution carries the global
    total. Parity vs a CROSS JOIN of the scalar subquery, and the plan
    carries a broadcast (never a shuffle cartesian)."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(89)
    df = _edges_df(spark, rows)
    tot = match_pattern(df, [("?x", "w", "?y")], agg={"t": "count(*)"})
    out = match_pattern(df, [("?a", "p", "?b")], sub=[tot])
    got = sorted(tuple(r) for r in out.collect())
    ref = sorted(_duck(rows).execute("""
        SELECT s, d, t FROM e
        CROSS JOIN (SELECT COUNT(*) AS t FROM e WHERE p = 'w')
        WHERE p = 'p'""").fetchall())
    assert got == ref and len(got) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan and "CartesianProduct" not in plan


def test_sub_columns_feed_downstream_algebra(spark):
    """Sub-frame columns are real bound variables: visible to filter /
    bind / aggregation, projected after the pattern variables, and a later
    BIND reusing the name raises (the in-scope rule)."""
    from lingvo_spark_kg.operators.graph import match_pattern

    rows = _rand_rows(97)
    df = _edges_df(spark, rows)
    inner = match_pattern(df, [("?a", "w", "?z")],
                          group_by=["a"], agg={"n": "count(*)"})
    out = match_pattern(df, [("?a", "w", "?b")], sub=[inner],
                        filter="n > 1", bind={"n2": "n * 10"})
    assert out.columns == ["a", "b", "n", "n2"]
    got = sorted(tuple(r) for r in out.collect())
    ref = sorted(_duck(rows).execute("""
        SELECT w.s, w.d, q.n, q.n * 10 FROM e w
        JOIN (SELECT s, COUNT(*) AS n FROM e WHERE p = 'w' GROUP BY s) q
          ON q.s = w.s
        WHERE w.p = 'w' AND q.n > 1""").fetchall())
    assert got == ref and len(got) > 0
    with pytest.raises(ValueError, match="reassign"):
        match_pattern(df, [("?a", "w", "?b")], sub=[inner],
                      bind={"n": "b"})
    with pytest.raises(ValueError, match="solution DataFrames"):
        match_pattern(df, [("?a", "w", "?b")], sub=[[("?a", "w", "?z")]])
