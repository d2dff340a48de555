"""Durable incremental ingest on the pipeline's stage tables
(KgPipeline.ingest_delta): per-batch corpus tables + generation-swapped graph
tables committed by ONE atomic ingest_log.json replace — the parquet stand-in for
an Iceberg snapshot commit. Equality contract: after any number of ingests, every
``table(stage)`` read is bit-identical to a fresh ``run()`` over the concatenated
corpus (edges in sketch mode on every column including the HLL n_docs estimate —
the operator-level exactness argument in operators/incremental.py)."""

import json
import os

import pytest

from lingvo_spark_kg.operators.docsgen import generate_docs
from lingvo_spark_kg.pipeline import KgPipeline

N_BASE, N_DELTA = 300, 80


def _rows(df, cols=None):
    if cols is not None:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


EDGE_COLS = ("src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
             "n_docs", "example_doc_id")


def _full_pipeline(spark, wd, n_docs, **kw):
    p = KgPipeline(spark, wd, n_docs=n_docs, edge_doc_sketch=True, **kw)
    p.run(resume=False)
    return p


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    """One base run + one committed delta ingest, reused by several tests."""
    wd = str(tmp_path_factory.mktemp("kg_ingest"))
    p = _full_pipeline(spark, wd, N_BASE)
    counts = p.ingest_delta(generate_docs(spark, N_DELTA, start=N_BASE))
    return p, counts


def test_ingest_equals_full_run(spark, ingested, tmp_path_factory):
    p, counts = ingested
    ref = _full_pipeline(
        spark, str(tmp_path_factory.mktemp("kg_ingest_ref")), N_BASE + N_DELTA)
    for stage, cols in (("edges", EDGE_COLS), ("nodes", None), ("links", None),
                        ("canonical_map", None), ("triples_raw", None),
                        ("docs", None), ("media_spans", None)):
        assert _rows(p.table(stage), cols) == _rows(ref.table(stage), cols), stage
    assert counts["delta_docs"] == N_DELTA


def test_second_batch_accumulates(spark, ingested, tmp_path_factory):
    p, _ = ingested
    wd2 = str(tmp_path_factory.mktemp("kg_ingest_twice"))
    p2 = _full_pipeline(spark, wd2, N_BASE)
    p2.ingest_delta(generate_docs(spark, N_DELTA // 2, start=N_BASE))
    p2.ingest_delta(generate_docs(spark, N_DELTA - N_DELTA // 2,
                                  start=N_BASE + N_DELTA // 2))
    log = json.load(open(os.path.join(wd2, "ingest_log.json")))
    assert log == {"batches": [1, 2], "graph_gen": 2}
    assert _rows(p2.table("edges"), EDGE_COLS) == _rows(p.table("edges"), EDGE_COLS)
    assert _rows(p2.table("triples_raw")) == _rows(p.table("triples_raw"))


def test_crash_before_commit_preserves_previous_state(spark, tmp_path_factory):
    """A failure anywhere before the ingest_log replace must leave the previous
    generation fully readable, and the same-batch retry must converge to the same
    result as an uninterrupted ingest."""
    wd = str(tmp_path_factory.mktemp("kg_ingest_crash"))
    p = _full_pipeline(spark, wd, N_BASE)
    edges_before = _rows(p.table("edges"), EDGE_COLS)

    real_write = p.writer.write
    def exploding_write(df, table, **kw):
        if table.startswith("edges__g"):
            raise RuntimeError("injected crash before commit")
        return real_write(df, table, **kw)

    p.writer.write = exploding_write
    with pytest.raises(RuntimeError, match="injected"):
        p.ingest_delta(generate_docs(spark, N_DELTA, start=N_BASE), batch_id=1)
    p.writer.write = real_write
    # nothing committed: pointer unchanged, reads serve the old generation
    assert p._ingest_log() == {"batches": [], "graph_gen": 0}
    assert _rows(p.table("edges"), EDGE_COLS) == edges_before

    p.ingest_delta(generate_docs(spark, N_DELTA, start=N_BASE), batch_id=1)
    ref = _full_pipeline(
        spark, str(tmp_path_factory.mktemp("kg_ingest_crash_ref")),
        N_BASE + N_DELTA)
    assert _rows(p.table("edges"), EDGE_COLS) == _rows(ref.table("edges"), EDGE_COLS)


def test_guards(spark, ingested, tmp_path_factory):
    p, _ = ingested
    # re-committing an applied batch id must raise (idempotence is retry-scoped)
    with pytest.raises(ValueError, match="already committed"):
        p.ingest_delta(generate_docs(spark, 10, start=9999), batch_id=1)
    # a plain resume over an ingested workdir must refuse
    with pytest.raises(ValueError, match="ingested delta batches"):
        KgPipeline(p.spark, p.workdir, n_docs=N_BASE,
                   edge_doc_sketch=True).run(resume=True)
    # sketchless edge tables are not mergeable
    wd = str(tmp_path_factory.mktemp("kg_ingest_nosketch"))
    pn = KgPipeline(spark, wd, n_docs=50)
    pn.run(resume=False)
    with pytest.raises(ValueError, match="edge_doc_sketch"):
        pn.ingest_delta(generate_docs(spark, 10, start=50))
    # a config drift between run() and ingest_delta must refuse
    pd = KgPipeline(spark, p.workdir, n_docs=N_BASE, edge_doc_sketch=True,
                    link_fuzzy=True)
    with pytest.raises(ValueError, match="config mismatch"):
        pd.ingest_delta(generate_docs(spark, 10, start=9999))


def test_streaming_kg_ingest(spark, ingested, tmp_path_factory):
    """stream_docs_to_kg: the file-source stream drives ingest_delta per
    micro-batch — the continuously-maintained graph converges to the same state
    as the batch-ingested (≡ fresh full run) pipeline, and a restart on the same
    checkpoint replays nothing."""
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.streaming import stream_docs_to_kg

    ref, _ = ingested
    base = tmp_path_factory.mktemp("kg_stream_ingest")
    in_dir, ckpt = str(base / "in"), str(base / "ckpt")
    wd = str(base / "wd")
    p = _full_pipeline(spark, wd, N_BASE)

    delta = generate_docs(spark, N_DELTA, start=N_BASE).cache()
    split = f"doc-{N_BASE + N_DELTA // 2:08d}"
    delta.where(F.col("doc_id") < split).coalesce(1) \
        .write.mode("overwrite").parquet(in_dir)
    delta.where(F.col("doc_id") >= split).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    q = stream_docs_to_kg(spark, in_dir, p, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    log = p._ingest_log()
    assert log["graph_gen"] == len(log["batches"]) >= 1
    assert _rows(p.table("edges"), EDGE_COLS) == _rows(ref.table("edges"), EDGE_COLS)
    assert _rows(p.table("docs")) == _rows(ref.table("docs"))

    # restart on the same checkpoint: no new files → no new generations
    q2 = stream_docs_to_kg(spark, in_dir, p, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(300)
    assert p._ingest_log() == log


def test_rebuild_from_scratch_clears_ingest_state(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("kg_ingest_rebuild"))
    p = _full_pipeline(spark, wd, 100)
    p.ingest_delta(generate_docs(spark, 30, start=100))
    p2 = _full_pipeline(spark, wd, 100)  # resume=False rebuild, same config
    assert p2._ingest_log() == {"batches": [], "graph_gen": 0}
    ref = _full_pipeline(spark, str(tmp_path_factory.mktemp("kg_rebuild_ref")), 100)
    assert _rows(p2.table("edges"), EDGE_COLS) == _rows(ref.table("edges"), EDGE_COLS)


def test_time_travel_generations_and_diff(spark, tmp_path_factory):
    """Superseded generations stay readable: table(generation=g) time-travels,
    generation 0 edges == the pre-ingest base edges, diff_generations reports
    exactly the edge rows the delta added/changed (DuckDB full-outer parity),
    and expire_generations reclaims old deltas but never the current one."""
    import duckdb

    wd = str(tmp_path_factory.mktemp("kg_tt"))
    p = _full_pipeline(spark, wd, 120)
    base_edges = _rows(p.table("edges"), EDGE_COLS)
    p.ingest_delta(generate_docs(spark, 40, start=120))
    p.ingest_delta(generate_docs(spark, 40, start=160))
    assert p.generations() == [0, 1, 2]

    # gen-0 read is bit-identical to the pre-ingest state; latest == default
    assert _rows(p.table("edges", generation=0), EDGE_COLS) == base_edges
    assert (_rows(p.table("edges", generation=2), EDGE_COLS)
            == _rows(p.table("edges"), EDGE_COLS))

    # diff vs DuckDB full-outer join on the triple key
    got = sorted(tuple(r) for r in p.diff_generations(0).collect())
    con = duckdb.connect()
    old = [(r[0], r[1], r[2], r[3]) for r in base_edges]
    new = [(r[0], r[1], r[2], r[3])
           for r in _rows(p.table("edges"), EDGE_COLS)]
    for name, rows in (("o", old), ("n", new)):
        con.execute(f"CREATE TABLE {name}(s VARCHAR, p VARCHAR, d VARCHAR, "
                    "occ BIGINT)")
        con.executemany(f"INSERT INTO {name} VALUES (?,?,?,?)", rows)
    ref = sorted(tuple(r) for r in con.execute("""
        SELECT COALESCE(o.s, n.s), COALESCE(o.p, n.p), COALESCE(o.d, n.d),
               CASE WHEN o.s IS NULL THEN 'added'
                    WHEN n.s IS NULL THEN 'removed'
                    WHEN o.occ <> n.occ THEN 'changed'
                    ELSE 'unchanged' END,
               o.occ, n.occ
        FROM o FULL OUTER JOIN n ON o.s = n.s AND o.p = n.p AND o.d = n.d
    """).fetchall() if r[3] != "unchanged")
    assert got == ref and len(got) > 0

    # errors: non-graph stage, expired/unknown generation
    with pytest.raises(ValueError, match="graph stages"):
        p.table("docs", generation=1)
    with pytest.raises(ValueError, match="not readable"):
        p.table("edges", generation=9)

    # retention: expire deltas except the newest; gen 0 and current survive
    assert p.expire_generations(keep=1) == [1]
    assert p.generations() == [0, 2]
    assert not os.path.isdir(os.path.join(wd, "edges__g1"))
    with pytest.raises(ValueError, match="not readable"):
        p.table("edges", generation=1)
    assert (_rows(p.table("edges"), EDGE_COLS)
            == _rows(p.table("edges", generation=2), EDGE_COLS))
