"""N-Triples export/import: exact round-trips through hostile payloads, spec
escaping, and the pure-column (no Python UDF) guarantee."""
from __future__ import annotations

from pyspark.sql import functions as F

HOSTILE_PREDS = [
    "wrote", "напи сал", 'quote"inside', "back\\slash", "tab\there",
    "new\nline", "plus+sign", "percent%20", "u0000text", "\\u0000",
]
HOSTILE_LABELS = [
    "plain", "Москва", 'she said "hi"', "a\\nb", "line\nbreak", "cr\rhere",
    "tab\tstop", "trail\\", "\\\\n", "nul\x00char", "\\u0000", " lead/trail ",
]


def _node_id(i):
    # production canonical ids are strings (e:E000123); include a hostile one
    return "id with spa ce" if i == 5 else f"e:E{i:06d}"


def _tables(spark):
    edges = spark.createDataFrame(
        [(_node_id(i), HOSTILE_PREDS[i % len(HOSTILE_PREDS)],
          _node_id((i * 7) % 12), i + 1) for i in range(24)],
        "src_id string, pred string, dst_id string, n_occurrences long")
    nodes = spark.createDataFrame(
        [(_node_id(i), HOSTILE_LABELS[i % len(HOSTILE_LABELS)],
          "PER" if i % 2 else "t y/pe")
         for i in range(12)],
        "canonical_id string, label string, node_type string")
    return edges, nodes


def test_ntriples_roundtrip_edges_exact(spark):
    from lingvo_spark_kg.operators.rdf import from_ntriples, to_ntriples

    edges, nodes = _tables(spark)
    lines = to_ntriples(edges, nodes).withColumnRenamed("line", "value")
    back = from_ntriples(lines)
    want = {tuple(r) for r in edges.select("src_id", "pred", "dst_id").collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want and len(got) == 24


def test_ntriples_labels_roundtrip_and_spec_escapes(spark):
    from lingvo_spark_kg.operators.rdf import RDFS_LABEL, parse_ntriples, to_ntriples

    edges, nodes = _tables(spark)
    lines = to_ntriples(edges, nodes).withColumnRenamed("line", "value")
    parsed = parse_ntriples(lines)
    labels = {r["obj"] for r in
              parsed.where(F.col("pred") == RDFS_LABEL).collect()}
    assert labels == set(HOSTILE_LABELS)
    raw = [r["value"] for r in lines.collect()]
    # every emitted line is single-line (the format's contract)
    assert all("\n" not in l and "\r" not in l for l in raw)
    # spec escape spot-checks on the wire
    assert any('\\"hi\\"' in l for l in raw)
    assert any("\\n" in l for l in raw) and any("\\t" in l for l in raw)
    assert any("\\u0000" in l for l in raw)
    # IRI slots never contain raw spaces
    assert all(" " not in seg for l in raw
               for seg in l.split(" ")[:2] if seg.startswith("<"))


def test_ntriples_external_lines_and_garbage_filtered(spark):
    """parse_ntriples on a hand-written external dump: comments, blanks and
    malformed lines drop; IRI + literal objects both parse."""
    from lingvo_spark_kg.operators.rdf import parse_ntriples

    lines = spark.createDataFrame([
        ("# a comment",),
        ("",),
        ("   ",),
        ('<http://x/a> <http://x/p> <http://x/b> .',),
        ('<http://x/a> <http://x/q> "lit \\"v\\" \\n end" .',),
        ("not a triple at all",),
        ('<http://x/a> <http://x/p> <http://x/b>',),   # missing final dot
    ], "value string")
    got = {tuple(r) for r in parse_ntriples(lines).collect()}
    assert got == {
        ("http://x/a", "http://x/p", "http://x/b", False),
        ("http://x/a", "http://x/q", 'lit "v" \n end', True),
    }


def test_ntriples_text_sink_roundtrip(spark, tmp_path):
    """Write with the text sink, read with spark.read.text — the line-parallel
    production path — and recover the exact edge set."""
    from lingvo_spark_kg.operators.rdf import from_ntriples, to_ntriples

    edges, nodes = _tables(spark)
    path = str(tmp_path / "dump.nt")
    to_ntriples(edges, nodes).write.mode("overwrite").text(path)
    back = from_ntriples(spark.read.text(path))
    want = {tuple(r) for r in edges.select("src_id", "pred", "dst_id").collect()}
    assert {tuple(r) for r in back.collect()} == want


def test_ntriples_plan_is_pure_column(spark):
    """Neither direction plans a Python stage: export and import are
    whole-stage-codegen column expressions."""
    from lingvo_spark_kg.operators.rdf import from_ntriples, to_ntriples

    edges, nodes = _tables(spark)
    out = to_ntriples(edges, nodes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    back_plan = from_ntriples(out.withColumnRenamed("line", "value")) \
        ._jdf.queryExecution().executedPlan().toString()
    for p in (plan, back_plan):
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "MapInPandas" not in p and "PythonMapInArrow" not in p


def test_lit_escape_property_roundtrip(spark):
    """Hypothesis: arbitrary text survives escape→unescape bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lingvo_spark_kg.operators.rdf import _lit_escape, _lit_unescape

    # one Spark job over the whole sample set, not one per example
    samples = []

    @settings(max_examples=200, deadline=None)
    @given(st.text(
        alphabet=st.characters(codec="utf-8",
                               exclude_characters=["\ud800"]),
        max_size=40))
    def collect(s):
        samples.append(s)

    collect()
    uniq = sorted(set(samples) | {"\\n", "\\\\n", "a\x00b", "\\u0000x"})
    df = spark.createDataFrame([(s,) for s in uniq], "t string")
    out = df.select("t", _lit_unescape(_lit_escape(F.col("t"))).alias("rt"),
                    _lit_escape(F.col("t")).alias("esc")).collect()
    for r in out:
        assert r["rt"] == r["t"]
        assert "\n" not in r["esc"] and "\r" not in r["esc"]
        assert "\x00" not in r["esc"]


def test_pipeline_export_ntriples_roundtrip(spark, tmp_path):
    """KgPipeline.export_ntriples dumps the committed graph; reading the dump
    back recovers the exact edge id/pred set and one label line per node."""
    from lingvo_spark_kg.operators.rdf import RDFS_LABEL, from_ntriples, parse_ntriples
    from lingvo_spark_kg.pipeline import KgPipeline

    wd = str(tmp_path / "wd")
    p = KgPipeline(spark, wd, n_docs=40, seed=3)
    p.run(resume=True)
    out = str(tmp_path / "dump.nt")
    p.export_ntriples(out)

    lines = spark.read.text(out)
    back = {tuple(r) for r in from_ntriples(lines).collect()}
    want = {tuple(r) for r in
            p.table("edges").select("src_id", "pred", "dst_id").collect()}
    assert back == want and len(back) > 0
    n_labels = parse_ntriples(lines).where(
        F.col("pred") == RDFS_LABEL).count()
    assert n_labels == p.table("nodes").count()


def test_parse_ntriples_strict_raises_on_malformed(spark):
    """strict=True fails the job on a malformed non-comment line; comments and
    blanks stay exempt; lenient mode drops the same line silently."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from lingvo_spark_kg.operators.rdf import parse_ntriples

    good = spark.createDataFrame(
        [("# comment",), ("",), ('<http://a> <http://b> <http://c> .',)],
        "value string")
    assert parse_ntriples(good, strict=True).count() == 1
    bad = good.unionAll(spark.createDataFrame([("truncated <line",)],
                                              "value string"))
    assert parse_ntriples(bad).count() == 1          # lenient: dropped
    with pytest.raises(SparkRuntimeException, match="malformed N-Triples"):
        parse_ntriples(bad, strict=True).count()
