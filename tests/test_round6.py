"""Round-6 additions: pack_contexts auto-persist (derived input executes once),
conll oracle-tier guard, demo-cache fallback warning, manifest tmp naming."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F


def test_pack_contexts_autoshard_executes_derived_upstream_once(spark, tmp_path):
    """n_shards=None on a DERIVED frame (Python stage upstream): the count() that
    sizes the shards must not re-run the upstream for the window job — the operator
    auto-persists. Witness: a mapInArrow stage appends one line per partition
    invocation to a shared file; two executions would double the line count."""
    import pyarrow as pa

    from lingvo_spark_kg.operators.corpus_ops import pack_contexts

    marker = tmp_path / "invocations.log"
    marker_path = str(marker)

    def counting(batches):
        with open(marker_path, "a") as f:
            f.write("x\n")
        for b in batches:
            yield b

    base = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"))
    derived = base.repartition(2).mapInArrow(
        counting, "doc_id long, text string")
    out = pack_contexts(derived, budget=8, n_shards=None)
    assert out.count() == 40
    # one invocation per partition per execution; repartition(2) → exactly 2 lines
    n = len(marker.read_text().splitlines())
    assert n == 2, f"derived upstream ran {n / 2:g} times; expected once"


def test_pack_contexts_bare_scan_not_persisted(spark, tmp_path):
    """A bare parquet scan must NOT be persisted by the auto-shard path (the count
    is metadata-cheap; caching a 100 TB scan would be the bug)."""
    from lingvo_spark_kg.operators.corpus_ops import _is_cheap_scan, pack_contexts

    p = str(tmp_path / "docs.parquet")
    spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    assert _is_cheap_scan(docs)
    assert _is_cheap_scan(docs.select("doc_id", "text").where(F.col("doc_id") > 2))
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert pack_contexts(docs, budget=8, n_shards=None).count() == 10
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after == before, "bare scan was persisted"


def test_is_cheap_scan_rejects_derived_plans(spark):
    from lingvo_spark_kg.operators.corpus_ops import _is_cheap_scan

    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    assert not _is_cheap_scan(df.groupBy("doc_id").count())
    assert not _is_cheap_scan(df.repartition(4))
    assert not _is_cheap_scan(df.join(df.withColumnRenamed("doc_id", "d2"),
                                      F.col("doc_id") == F.col("d2")))


def test_neardup_survivors_keep_rule_and_singletons(spark):
    """min-doc_id keep rule: chained pairs (1-2, 2-3) form ONE cluster with 1
    canonical; below-threshold pairs are ignored; docs in no pair are singleton
    canonicals."""
    import pandas as pd

    from lingvo_spark_kg.operators.dedup import neardup_survivors

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3, 4, 5]}))
    pairs = spark.createDataFrame(pd.DataFrame({
        "doc_a": [1, 2, 4], "doc_b": [2, 3, 5],
        "jaccard": [0.9, 0.8, 0.2]}))  # 4-5 below threshold
    out = {r["doc_id"]: r for r in
           neardup_survivors(docs, pairs, threshold=0.7).collect()}
    assert {d: r["cluster_id"] for d, r in out.items()} == {
        1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    assert {d: r["is_canonical"] for d, r in out.items()} == {
        1: 1, 2: 0, 3: 0, 4: 1, 5: 1}


def test_dedup_survivors_plan_no_corpus_shuffle_explosion(spark):
    """The final docs←components join must never be a cartesian/nested-loop; the
    CC iterations run on the pair-bounded graph only (materialized upstream of
    the returned plan)."""
    import __spark_entry__ as e

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = e.q_dedup_survivors(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_conll_sentences_rejects_oracle_tier_mismatch(spark):
    import __spark_entry__ as e

    old = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = "/root/testdata/sf0.01"
    try:
        with pytest.raises(ValueError, match="different tiers"):
            e.q_conll_sentences(spark, "/root/testdata/sf0.001")
    finally:
        if old is None:
            del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]
        else:
            os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = old


def test_transformer_probs_bit_identical_through_s2s_roundtrip():
    """VERDICT r5 item 5: predict_probs composed with (a) the Transformer encoder
    and (b) the .s2s wire-format round-trip — jointly gated: the reloaded
    transformer's full sorted per-token [(class, prob)] lists and
    WordsInDictRatio must be BIT-identical to the in-memory pinned model's
    (write_s2s → load_tagger preserves every weight bit, and predict_probs is
    encoder-agnostic post-processing over the same logits)."""
    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.sources.s2s import from_tagger_model, load_tagger, write_s2s

    pos_m, _ner = pinned_tagger_models(encoder="transformer")
    fd, path = tempfile.mkstemp(suffix=".s2s")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(write_s2s(from_tagger_model(pos_m)))
        reloaded = load_tagger(path)
    finally:
        os.unlink(path)
    assert type(reloaded).__name__ == "TransformerTaggerModel"
    for sent in (["мама", "мыла", "раму"], ["Иванов", "работает", "в", "Москве"],
                 ["очень", "длинное", "предложение", "с", "числом", "<num>"]):
        probs_a, ratio_a = pos_m.predict_probs(sent)
        probs_b, ratio_b = reloaded.predict_probs(sent)
        assert ratio_a == ratio_b
        assert probs_a == probs_b  # exact float equality — bit parity, not approx


def test_transformer_distributed_training_improves_and_matches_kernel(spark):
    """The distributed loop accepts a Transformer model (EncoderType switch): a
    2-partition collect-reduce run must produce finite decreasing-or-equal NLL and
    the same weight keys as the kernel's gradient dict (no silently untrained
    tensors besides the fixed pos table)."""
    import pandas as pd

    from lingvo_spark_kg.golden import train_fixture_model
    from lingvo_spark_kg.operators.train_loop import train_tagger_distributed

    rows, m0 = train_fixture_model("/root/testdata/sf0.001", "transformer")
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [d for d, _, _ in rows],
        "tokens": [t for _, t, _ in rows],
        "labels": [l for _, _, l in rows]}))
    corpus = df.repartition(2).select("tokens", "labels")
    m1, hist = train_tagger_distributed(corpus, m0, epochs=2, lr=0.05,
                                        batch_size=32, reduce="collect")
    assert len(hist) == 2
    assert all(h["n_tokens"] > 0 for h in hist)
    assert hist[1]["nll_per_token"] <= hist[0]["nll_per_token"]
    # every trainable tensor updated at least once (pos stays the fixed table)
    import numpy as np
    changed = {k for k in m0.weights if not np.array_equal(m0.weights[k],
                                                           m1.weights[k])}
    assert "pos" not in changed
    assert "emb" in changed and "ff.W" in changed
    assert any(k.startswith("enc.0.attn.") for k in changed)
    assert any(k.startswith("enc.0.ffn.") for k in changed)


def test_manifest_tmp_name_is_per_target():
    """Two manifests in one directory must not share a tmp path (golden.py
    _write_manifest) — derive it from the target file name."""
    import json
    from pathlib import Path

    from lingvo_spark_kg.golden import _write_manifest

    with tempfile.TemporaryDirectory() as d:
        a = Path(d) / "manifest.json"
        b = Path(d) / "conll_manifest.json"
        _write_manifest(a, {"k": 1})
        _write_manifest(b, {"k": 2})
        assert json.loads(a.read_text()) == {"k": 1}
        assert json.loads(b.read_text()) == {"k": 2}
        # tmp names derived from each target → distinct even same-pid
        assert f".{a.name}.{os.getpid()}.tmp" != f".{b.name}.{os.getpid()}.tmp"


def test_pagerank_matches_dense_numpy_reference(spark):
    """graph.pagerank vs an independent dense NumPy power iteration on a small
    weighted digraph that includes a dangling node (7) and a weight-skewed hub.
    Same recurrence, different engine/layout — agreement to ~1e-12 is the
    correctness witness; exact order-of-summation equality is not required."""
    import numpy as np

    from lingvo_spark_kg.operators.graph import pagerank

    edges = [  # (src, dst, n_occurrences)
        (0, 1, 5), (0, 2, 1), (1, 2, 2), (2, 0, 1), (2, 3, 3),
        (3, 4, 1), (4, 0, 2), (5, 0, 1), (6, 5, 4), (6, 7, 1), (3, 7, 2),
    ]
    df = spark.createDataFrame(edges, "src_id long, dst_id long, n_occurrences long")
    got = {r["node_id"]: r["rank"]
           for r in pagerank(df, damping=0.85, n_iter=20).collect()}

    ids = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {nid: i for i, nid in enumerate(ids)}
    n = len(ids)
    w = np.zeros((n, n))
    for s, d, c in edges:
        w[idx[s], idx[d]] += float(c)
    out_w = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        contrib = np.zeros(n)
        for i in range(n):
            if out_w[i] > 0:
                contrib += r[i] * w[i] / out_w[i]
        dmass = r[out_w == 0].sum()
        r = (1 - 0.85) / n + 0.85 * (contrib + dmass / n)
    assert set(got) == set(ids)
    for nid in ids:
        assert abs(got[nid] - r[idx[nid]]) < 1e-12, (nid, got[nid], r[idx[nid]])
    # rank is a probability mass: sums to 1 (dangling redistribution keeps it)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty_edges(spark):
    from lingvo_spark_kg.operators.graph import pagerank

    df = spark.createDataFrame([], "src_id long, dst_id long, n_occurrences long")
    assert pagerank(df).count() == 0


def test_predicate_paths_exact_small_graph(spark):
    """graph.predicate_paths vs hand-enumerated paths on a small digraph:
    cycle exclusion, distinct-mid counting, weighted support, and the
    lexicographic-min example string."""
    from lingvo_spark_kg.operators.graph import predicate_paths

    edges = [  # (src, dst, pred, n_occurrences)
        (1, 2, "p", 3), (2, 3, "q", 2), (2, 4, "q", 5),
        (10, 2, "p", 1),           # second path into mid 2
        (5, 6, "p", 1), (6, 5, "q", 7),   # pure round-trip: excluded by default
        (3, 1, "r", 1),            # q∘r chain through mid 3
    ]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {(r["pred_1"], r["pred_2"]):
           (r["n_paths"], r["n_mid"], r["support_w"], r["example_path"])
           for r in predicate_paths(df).collect()}
    # p∘q through mid 2: (1,2,3) (1,2,4) (10,2,3) (10,2,4); p∘q via 5→6→5 is a cycle
    # q∘r through mid 3: (2,3,1); r∘p through mid 1: (3,1,2)
    # example is the LEXICOGRAPHIC min of "a|m|b": "10|2|3" < "1|2|3" ('0' < '|')
    assert got == {
        ("p", "q"): (4, 1, 3 * 2 + 3 * 5 + 1 * 2 + 1 * 5, "10|2|3"),
        ("q", "r"): (1, 1, 2 * 1, "2|3|1"),
        ("r", "p"): (1, 1, 1 * 3, "3|1|2"),
    }
    with_cycles = {(r["pred_1"], r["pred_2"]): r["n_paths"]
                   for r in predicate_paths(df, include_cycles=True).collect()}
    assert with_cycles[("p", "q")] == 5      # the 5→6→5 round-trip re-enters
    assert with_cycles[("q", "p")] == 1      # 6→5→6


def test_predicate_paths_hub_fanout_cut(spark):
    """max_mid_fanout drops hub mids BEFORE the join: result equals running the
    full operator on the edge set with the hub's edges removed as a mid."""
    from lingvo_spark_kg.operators.graph import predicate_paths

    # hub node 100: 3 in-edges × 4 out-edges = fanout 12; quiet mid 200: 1×1
    edges = [(s, 100, "into", 1) for s in (1, 2, 3)]
    edges += [(100, d, "outof", 1) for d in (11, 12, 13, 14)]
    edges += [(7, 200, "a", 2), (200, 8, "b", 3)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    full = {(r["pred_1"], r["pred_2"]): r["n_paths"]
            for r in predicate_paths(df).collect()}
    assert full == {("into", "outof"): 12, ("a", "b"): 1}
    cut = {(r["pred_1"], r["pred_2"]): r["n_paths"]
           for r in predicate_paths(df, max_mid_fanout=4).collect()}
    assert cut == {("a", "b"): 1}


def test_predicate_paths_plan_shape(spark):
    """One keyed self-join + partial-agg hash aggregate; never a cartesian."""
    from lingvo_spark_kg.operators.graph import predicate_paths

    df = spark.createDataFrame(
        [(1, 2, "p", 1), (2, 3, "q", 1)],
        "src_id long, dst_id long, pred string, n_occurrences long")
    plan = predicate_paths(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # string-min + countDistinct agg buffers compile to SortAggregate — still a
    # two-phase (partial → final) aggregate; the pin is "an aggregate, no window"
    assert "Aggregate(" in plan and "Window" not in plan


def test_triangle_counts_known_graphs(spark):
    """K4 has 4 triangles, every node in 3; a star hub has none; duplicate /
    reversed / self-loop edge rows collapse into the undirected simple graph."""
    from lingvo_spark_kg.operators.graph import triangle_counts

    k4 = [(a, b, "p", 1) for a in range(4) for b in range(4) if a != b]
    noise = [(0, 0, "p", 1), (1, 0, "p", 9), (2, 1, "p", 3)]  # loop + dups
    star = [(100, d, "p", 1) for d in range(101, 106)]
    df = spark.createDataFrame(
        k4 + noise + star, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {r["node_id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}   # star nodes absent (0 triangles)
    assert sum(got.values()) // 3 == 4


def test_triangle_counts_matches_duckdb_bruteforce(spark):
    """Degree-ordered wedge closing vs a brute-force ordered triple join in
    DuckDB on a deterministic pseudo-random graph (hash-derived edges — hub
    skew included by construction)."""
    import random

    import duckdb

    from lingvo_spark_kg.operators.graph import triangle_counts

    rng = random.Random(42)
    edges = [(rng.randrange(30), rng.randrange(30), "p", 1) for _ in range(250)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {r["node_id"]: r["n_triangles"] for r in triangle_counts(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d)"
                % ",".join(f"({s},{d})" for s, d, _, _ in edges))
    ref = con.execute("""
        WITH u AS (SELECT DISTINCT LEAST(s,d) AS u, GREATEST(s,d) AS v
                   FROM e WHERE s <> d),
        t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM u e1 JOIN u e2 ON e1.u = e2.u AND e1.v < e2.v
              JOIN u e3 ON e3.u = e1.v AND e3.v = e2.v)
        SELECT node_id, COUNT(*) AS n FROM (
            SELECT a AS node_id FROM t UNION ALL
            SELECT b FROM t UNION ALL SELECT c FROM t)
        GROUP BY node_id
    """).fetchall()
    assert got == {n: c for n, c in ref}
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_triangle_counts_plan_no_cartesian(spark):
    from lingvo_spark_kg.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [(1, 2, "p", 1), (2, 3, "p", 1), (3, 1, "p", 1)],
        "src_id long, dst_id long, pred string, n_occurrences long")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _walk_oracle_sql(n_walks: int, walk_len: int, seed: int,
                     weighted: bool = False, cap: int = 64) -> str:
    """graph.random_walks unrolled in plain SQL over a table e(s, d[, w]): per
    step, the argmin-of-md5 next hop over the weight-replica-expanded neighbor
    multiset as a ROW_NUMBER window (ties broken by nbr, like Spark's
    min-struct)."""
    def h(t):
        return (f"md5(CAST({seed} AS VARCHAR) || ':' || CAST(f.start_id AS VARCHAR)"
                f" || ':' || CAST(f.walk_idx AS VARCHAR) || ':' || CAST({t} AS VARCHAR)"
                " || ':' || CAST(n.nbr AS VARCHAR) || ':' || CAST(n.rep AS VARCHAR))")

    w_src = "w" if weighted else "1 AS w"
    per_pair = ("SELECT node, nbr, CAST(SUM(w) AS BIGINT) AS w FROM sym"
                " GROUP BY 1, 2" if weighted
                else "SELECT node, nbr, 1 AS w FROM (SELECT DISTINCT node, nbr FROM sym)")
    ctes = [
        f"und AS (SELECT s AS u, d AS v, {w_src} FROM e WHERE s <> d)",
        "sym AS (SELECT u AS node, v AS nbr, w FROM und"
        " UNION ALL SELECT v AS node, u AS nbr, w FROM und)",
        f"pp AS ({per_pair})",
        # unnest(range(...)) instead of lateral generate_series: this DuckDB
        # rejects column parameters on lateral table functions
        f"nbrs AS (SELECT node, nbr,"
        f" unnest(range(1, GREATEST(1, LEAST(w, {cap})) + 1)) AS rep FROM pp)",
        f"w AS (SELECT DISTINCT node AS start_id, gs.i AS walk_idx"
        f" FROM nbrs, generate_series(0, {n_walks - 1}) gs(i))",
        "f0 AS (SELECT start_id, walk_idx, start_id AS cur FROM w)",
    ]
    for t in range(1, walk_len + 1):
        ctes.append(
            f"f{t} AS (SELECT start_id, walk_idx, nbr AS cur FROM ("
            f"SELECT f.start_id, f.walk_idx, n.nbr, row_number() OVER ("
            f"PARTITION BY f.start_id, f.walk_idx ORDER BY {h(t)}, n.nbr) AS rn"
            f" FROM f{t - 1} f JOIN nbrs n ON n.node = f.cur) WHERE rn = 1)")
    selects = ["SELECT start_id, walk_idx, 0 AS step, start_id AS node_id FROM f0"]
    for t in range(1, walk_len + 1):
        selects.append(f"SELECT start_id, walk_idx, {t} AS step, cur AS node_id"
                       f" FROM f{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def test_random_walks_matches_duckdb(spark):
    """Deterministic argmin-of-md5 walks vs the same recurrence unrolled as
    ROW_NUMBER windows in DuckDB on a seeded random graph — cross-engine parity
    of every (start, walk, step, node) row."""
    import random

    import duckdb

    from lingvo_spark_kg.operators.graph import random_walks

    rng = random.Random(7)
    edges = [(rng.randrange(25), rng.randrange(25), "p", 1) for _ in range(120)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {tuple(r) for r in
           random_walks(df, n_walks=3, walk_len=5, seed=11).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d)"
                % ",".join(f"({s},{d})" for s, d, _, _ in edges))
    ref = {tuple(r) for r in
           con.execute(_walk_oracle_sql(n_walks=3, walk_len=5, seed=11)).fetchall()}
    assert got == ref and len(got) > 0


def test_random_walks_structure(spark):
    """Every walk runs full length, starts at its start node, and every
    consecutive (node, next) pair is an edge of the undirected simple graph;
    different walk_idx from the same start diverge somewhere on a connected
    graph (hash includes the walk index)."""
    import random

    from lingvo_spark_kg.operators.graph import random_walks

    rng = random.Random(3)
    edges = [(rng.randrange(12), rng.randrange(12), "p", 1) for _ in range(60)]
    und = {frozenset((s, d)) for s, d, _, _ in edges if s != d}
    nodes = {n for e in und for n in e}
    walks: dict[tuple, dict] = {}
    rows = random_walks(spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long"),
        n_walks=2, walk_len=4, seed=5).collect()
    for r in rows:
        walks.setdefault((r["start_id"], r["walk_idx"]), {})[r["step"]] = r["node_id"]
    assert len(walks) == 2 * len(nodes)
    diverged = 0
    for (start, _w), seq in walks.items():
        assert sorted(seq) == [0, 1, 2, 3, 4]    # full length, no gaps
        assert seq[0] == start
        for t in range(4):
            assert frozenset((seq[t], seq[t + 1])) in und
    for start in nodes:
        if any(walks[(start, 0)][t] != walks[(start, 1)][t] for t in range(5)):
            diverged += 1
    assert diverged > len(nodes) // 2   # walk_idx actually varies the hash


def test_random_walks_plan_no_cartesian(spark):
    from lingvo_spark_kg.operators.graph import random_walks

    df = spark.createDataFrame(
        [(1, 2, "p", 1), (2, 3, "p", 1)],
        "src_id long, dst_id long, pred string, n_occurrences long")
    plan = (random_walks(df, n_walks=1, walk_len=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skip_gram_pairs_matches_duckdb(spark):
    """Walks → windowed co-occurrence pairs vs the same self-join in DuckDB over
    the SAME walk rows (walks themselves already pinned cross-engine above)."""
    import random

    import duckdb

    from lingvo_spark_kg.operators.graph import random_walks, skip_gram_pairs

    rng = random.Random(9)
    edges = [(rng.randrange(20), rng.randrange(20), "p", 1) for _ in range(90)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    walks = random_walks(df, n_walks=2, walk_len=4, seed=1)
    rows = walks.collect()
    got = {(r["center_id"], r["context_id"]): r["n_pairs"]
           for r in skip_gram_pairs(walks, window=2).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE w AS SELECT * FROM (VALUES %s) t(s, wi, st, n)"
                % ",".join(f"({r['start_id']},{r['walk_idx']},{r['step']},{r['node_id']})"
                           for r in rows))
    ref = {(c, x): n for c, x, n in con.execute("""
        SELECT a.n AS center, b.n AS context, COUNT(*) AS n_pairs
        FROM w a JOIN w b ON a.s = b.s AND a.wi = b.wi
        WHERE abs(a.st - b.st) <= 2 AND a.st <> b.st
        GROUP BY 1, 2
    """).fetchall()}
    assert got == ref and len(got) > 0
    # symmetric by construction: (c, x) and (x, c) counts match
    assert all(got[(c, x)] == got[(x, c)] for (c, x) in got)


def test_skip_gram_pairs_plan_no_cartesian(spark):
    from lingvo_spark_kg.operators.graph import random_walks, skip_gram_pairs

    df = spark.createDataFrame(
        [(1, 2, "p", 1), (2, 3, "p", 1)],
        "src_id long, dst_id long, pred string, n_occurrences long")
    plan = (skip_gram_pairs(random_walks(df, n_walks=1, walk_len=2))
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sg_loss_gradcheck():
    """Numerical gradcheck of the skip-gram negative-sampling kernel — every
    element of both embedding matrices, central differences."""
    import numpy as np

    from lingvo_spark_kg.operators.node2vec import negative_ids, sg_loss_and_grads

    rng = np.random.RandomState(0)
    v, d, b, k = 6, 3, 5, 2
    w_in = rng.randn(v, d) * 0.3
    w_out = rng.randn(v, d) * 0.3
    c = rng.randint(0, v, size=b)
    x = rng.randint(0, v, size=b)
    w = rng.randint(1, 4, size=b).astype(np.float64)
    neg = negative_ids(c, x, k, v, seed=3, epoch=1)
    _, grads = sg_loss_and_grads(w_in, w_out, c, x, w, neg)

    eps = 1e-6
    for name, mat in (("w_in", w_in), ("w_out", w_out)):
        for i in range(v):
            for j in range(d):
                orig = mat[i, j]
                mat[i, j] = orig + eps
                lp, _ = sg_loss_and_grads(w_in, w_out, c, x, w, neg)
                mat[i, j] = orig - eps
                lm, _ = sg_loss_and_grads(w_in, w_out, c, x, w, neg)
                mat[i, j] = orig
                num = (lp - lm) / (2 * eps)
                assert abs(num - grads[name][i, j]) < 1e-5, (name, i, j)


def test_node2vec_end_to_end_cluster_structure(spark):
    """Full chain on a barbell graph (two K6 cliques + one bridge): walks →
    skip-gram pairs → trained embeddings must place intra-clique pairs closer
    (mean cosine) than cross-clique pairs, and loss must decrease."""
    import itertools

    import numpy as np

    from lingvo_spark_kg.operators.graph import random_walks, skip_gram_pairs
    from lingvo_spark_kg.operators.node2vec import train_node_embeddings

    clique_a = list(itertools.combinations(range(6), 2))
    clique_b = list(itertools.combinations(range(6, 12), 2))
    edges = [(a, b, "p", 1) for a, b in clique_a + clique_b] + [(5, 6, "p", 1)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    pairs = skip_gram_pairs(random_walks(df, n_walks=6, walk_len=6, seed=2),
                            window=2)
    emb_df, hist = train_node_embeddings(pairs, dim=8, epochs=40, lr=0.1,
                                         n_neg=4, seed=1, n_partitions=4)
    assert hist[-1]["loss_per_pair"] < hist[0]["loss_per_pair"]
    emb = {r["node_id"]: np.array(r["embedding"]) for r in emb_df.collect()}
    assert len(emb) == 12

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    intra = [cos(emb[a], emb[b]) for a, b in clique_a + clique_b]
    inter = [cos(emb[a], emb[b]) for a in range(6) for b in range(6, 12)]
    assert np.mean(intra) > np.mean(inter) + 0.2, (np.mean(intra), np.mean(inter))


def test_node2vec_bit_deterministic_across_runs(spark):
    """Same pairs, same n_partitions → bit-identical embeddings and history
    (hash-partitioned sorted corpus + balanced-tree fold + hash negatives)."""
    import random

    from lingvo_spark_kg.operators.graph import random_walks, skip_gram_pairs
    from lingvo_spark_kg.operators.node2vec import train_node_embeddings

    rng = random.Random(4)
    edges = [(rng.randrange(15), rng.randrange(15), "p", 1) for _ in range(70)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    pairs = skip_gram_pairs(random_walks(df, n_walks=2, walk_len=4), window=2)
    runs = []
    for _ in range(2):
        emb_df, hist = train_node_embeddings(pairs, dim=4, epochs=3, lr=0.05,
                                             n_neg=2, seed=7, n_partitions=3)
        runs.append(({r["node_id"]: tuple(r["embedding"])
                      for r in emb_df.collect()}, hist))
    assert runs[0][0] == runs[1][0]   # exact float equality — bit determinism
    assert runs[0][1] == runs[1][1]


def test_node_embeddings_feed_ann_operators(spark):
    """The trained embedding table plugs straight into the existing ANN surface:
    cosine_topk_brute finds each barbell node's nearest neighbors inside its own
    clique, and embedding_neardup over the same table runs without reshaping —
    the KG → walks → pairs → embeddings → similarity chain is schema-closed."""
    import itertools

    from lingvo_spark_kg.operators.ann import cosine_topk_brute, embedding_neardup
    from lingvo_spark_kg.operators.graph import random_walks, skip_gram_pairs
    from lingvo_spark_kg.operators.node2vec import train_node_embeddings

    clique_a = list(itertools.combinations(range(6), 2))
    clique_b = list(itertools.combinations(range(6, 12), 2))
    edges = [(a, b, "p", 1) for a, b in clique_a + clique_b] + [(5, 6, "p", 1)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    pairs = skip_gram_pairs(random_walks(df, n_walks=6, walk_len=6, seed=2),
                            window=2)
    emb_df, _ = train_node_embeddings(pairs, dim=8, epochs=40, lr=0.1,
                                      n_neg=4, seed=1, n_partitions=4)
    vecs = emb_df.select(F.col("node_id").alias("vec_id"), "embedding")
    queries = emb_df.select(F.col("node_id").alias("query_id"), "embedding")

    topk = cosine_topk_brute(vecs, queries, k=4).collect()
    same_side = 0
    total = 0
    for r in topk:
        if r["rank"] == 1:          # rank 1 is the node itself (cosine 1.0)
            continue
        total += 1
        if (r["query_id"] < 6) == (r["vec_id"] < 6):
            same_side += 1
    assert total == 12 * 3
    assert same_side >= total - 2   # neighbors live in the query's own clique

    # near-dup over the same table: runs and only ever pairs same-clique nodes
    nd = embedding_neardup(vecs, dim=8, threshold=0.9).collect()
    assert all((r["vec_a"] < 6) == (r["vec_b"] < 6) for r in nd)


def _brute_coreness(pairs):
    """Reference peel: repeatedly remove the minimum-degree vertex; a vertex's
    coreness is the max degree-at-removal seen so far (standard algorithm)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    k = 0
    while deg:
        v = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        for u in adj[v]:
            if u in deg and u != v:
                deg[u] -= 1
                adj[u].discard(v)
        del deg[v]
    return core


def test_coreness_matches_brute_force_peel(spark):
    """Iterated neighborhood h-index vs the sequential peel on a seeded random
    graph with a planted K6 (coreness 5 island) plus a pendant chain
    (coreness 1 tail)."""
    import itertools
    import random

    from lingvo_spark_kg.operators.graph import coreness

    rng = random.Random(13)
    edges = [(rng.randrange(18), rng.randrange(18), "p", 1) for _ in range(45)]
    edges += [(a, b, "p", 1) for a, b in itertools.combinations(range(100, 106), 2)]
    edges += [(200, 201, "p", 1), (201, 202, "p", 1), (202, 203, "p", 1)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {r["node_id"]: r["coreness"] for r in coreness(df).collect()}
    ref = _brute_coreness([(s, d) for s, d, _, _ in edges])
    assert got == ref
    assert all(got[n] == 5 for n in range(100, 106))   # planted clique shell
    assert got[200] == got[203] == 1                    # pendant chain shell


def test_coreness_plan_no_cartesian(spark):
    from lingvo_spark_kg.operators.graph import coreness

    df = spark.createDataFrame(
        [(1, 2, "p", 1), (2, 3, "p", 1), (3, 1, "p", 1)],
        "src_id long, dst_id long, pred string, n_occurrences long")
    out = coreness(df, max_iter=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert {r["coreness"] for r in out.collect()} == {2}   # a triangle is 2-core


def test_random_walks_weighted_matches_duckdb(spark):
    """Weight-proportional transitions (replica-expanded argmin) vs the same
    recurrence in DuckDB with lateral generate_series replicas — exact row
    parity including the summed-undirected-weight aggregation."""
    import random

    import duckdb

    from lingvo_spark_kg.operators.graph import random_walks

    rng = random.Random(21)
    edges = [(rng.randrange(15), rng.randrange(15), "p", rng.randrange(1, 9))
             for _ in range(60)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {tuple(r) for r in
           random_walks(df, n_walks=2, walk_len=4, seed=5, weighted=True,
                        weight_cap=16).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d, w)"
                % ",".join(f"({s},{d},{w})" for s, d, _, w in edges))
    ref = {tuple(r) for r in con.execute(
        _walk_oracle_sql(n_walks=2, walk_len=4, seed=5, weighted=True,
                         cap=16)).fetchall()}
    assert got == ref and len(got) > 0


def test_random_walks_weight_bias(spark):
    """A 31:1 edge-weight split from a 2-neighbor center must pull the first
    hop to the heavy neighbor in ~31/32 of walks (exact uniform draw over the
    replica multiset)."""
    from lingvo_spark_kg.operators.graph import random_walks

    edges = [(0, 1, "p", 1), (0, 2, "p", 31)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    rows = random_walks(df, n_walks=64, walk_len=1, seed=3, weighted=True,
                        weight_cap=64).collect()
    first_hops = [r["node_id"] for r in rows
                  if r["start_id"] == 0 and r["step"] == 1]
    assert len(first_hops) == 64
    heavy = sum(1 for n in first_hops if n == 2)
    assert heavy >= 52   # E[heavy] = 62; 52 is ~5 sigma below


def test_pipeline_analytics_stages_and_resume(spark, tmp_path):
    """KgPipeline.analytics() writes the fifteen analytics stage tables over the
    committed edges, chains walks → pairs → embeddings off the WRITTEN tables,
    and a resumed call recomputes nothing (timings untouched) while returning
    identical counts; embeddings cover every walked node at the requested dim."""
    from lingvo_spark_kg.pipeline import KgPipeline

    wd = str(tmp_path / "wd")
    p = KgPipeline(spark, wd, n_docs=60, seed=1)
    p.run(resume=True)
    counts = p.analytics(resume=True, pagerank_iters=5, embedding_epochs=2,
                         embedding_dim=4, embedding_partitions=2)
    assert set(counts) == {"an_pagerank", "an_coreness", "an_triangles",
                           "an_paths", "an_walks", "an_pairs", "an_embeddings",
                           "an_linkpred", "an_components", "an_nfunc",
                           "an_communities", "an_radius", "an_preds",
                           "an_centrality", "an_betweenness"}
    assert counts["an_components"] == counts["an_pagerank"]
    assert counts["an_communities"] == counts["an_coreness"]
    assert 0 < counts["an_radius"] <= counts["an_pagerank"]
    assert counts["an_preds"] > 0
    assert counts["an_centrality"] == counts["an_pagerank"]
    assert counts["an_betweenness"] == counts["an_pagerank"]
    assert counts["an_pagerank"] == counts["an_coreness"] > 0
    n_nodes_walked = counts["an_walks"] // (2 * (4 + 1))  # n_walks*(walk_len+1)
    assert counts["an_embeddings"] == n_nodes_walked > 0

    emb = p.table("an_embeddings").collect()
    assert all(len(r["embedding"]) == 4 for r in emb)

    p2 = KgPipeline(spark, wd, n_docs=60, seed=1)
    counts2 = p2.analytics(resume=True, pagerank_iters=5, embedding_epochs=2,
                           embedding_dim=4, embedding_partitions=2)
    assert counts2 == counts
    assert "an_embeddings" not in p2.timings  # resumed, not retrained


def _biased_walk_oracle_sql(n_walks: int, walk_len: int, seed: int,
                            rm: int, cm: int, em: int, cap: int = 16) -> str:
    """graph.biased_random_walks unrolled in plain SQL over e(s, d): per step,
    classify candidates against the previous node (return / common-neighbor /
    explore), expand to w×mult replicas, pick argmin-of-md5."""
    def h(t):
        return (f"md5(CAST({seed} AS VARCHAR) || ':' || CAST(q.start_id AS VARCHAR)"
                f" || ':' || CAST(q.walk_idx AS VARCHAR) || ':' || CAST({t} AS VARCHAR)"
                " || ':' || CAST(q.nbr AS VARCHAR) || ':' || CAST(q.rep AS VARCHAR))")

    ctes = [
        "und AS (SELECT s AS u, d AS v, 1 AS w FROM e WHERE s <> d)",
        "sym AS (SELECT u AS node, v AS nbr, w FROM und"
        " UNION ALL SELECT v AS node, u AS nbr, w FROM und)",
        f"pp AS (SELECT node, nbr, GREATEST(1, LEAST(MAX(w), {cap})) AS w"
        " FROM sym GROUP BY 1, 2)",
        f"wk AS (SELECT DISTINCT node AS start_id, gs.i AS walk_idx"
        f" FROM pp, generate_series(0, {n_walks - 1}) gs(i))",
        "f0 AS (SELECT start_id, walk_idx, start_id AS cur,"
        " CAST(NULL AS BIGINT) AS prev FROM wk)",
    ]
    for t in range(1, walk_len + 1):
        ctes.append(f"""c{t} AS (
            SELECT f.start_id, f.walk_idx, f.cur, f.prev, n.nbr,
                   n.w * (CASE WHEN n.nbr = f.prev THEN {rm}
                               WHEN p2.nbr IS NOT NULL THEN {cm}
                               ELSE {em} END) AS n_rep
            FROM f{t - 1} f JOIN pp n ON n.node = f.cur
            LEFT JOIN pp p2 ON p2.node = f.prev AND p2.nbr = n.nbr)""")
        ctes.append(f"""f{t} AS (
            SELECT start_id, walk_idx, nbr AS cur, cur AS prev FROM (
                SELECT q.*, row_number() OVER (
                    PARTITION BY q.start_id, q.walk_idx
                    ORDER BY {h(t)}, q.nbr) AS rn
                FROM (SELECT c.*, unnest(range(1, n_rep + 1)) AS rep
                      FROM c{t} c WHERE n_rep > 0) q) WHERE rn = 1)""")
    selects = ["SELECT start_id, walk_idx, 0 AS step, start_id AS node_id FROM f0"]
    for t in range(1, walk_len + 1):
        selects.append(f"SELECT start_id, walk_idx, {t} AS step, cur AS node_id"
                       f" FROM f{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def test_biased_walks_match_duckdb(spark):
    """Second-order biased walks vs the same recurrence in DuckDB (candidate
    classification left-join + replica unnest + argmin window) — exact row
    parity on a seeded random graph with asymmetric multipliers."""
    import random

    import duckdb

    from lingvo_spark_kg.operators.graph import biased_random_walks

    rng = random.Random(17)
    edges = [(rng.randrange(14), rng.randrange(14), "p", 1) for _ in range(50)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {tuple(r) for r in biased_random_walks(
        df, n_walks=2, walk_len=4, seed=9, return_mult=4, common_mult=2,
        explore_mult=1).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d)"
                % ",".join(f"({s},{d})" for s, d, _, _ in edges))
    ref = {tuple(r) for r in con.execute(_biased_walk_oracle_sql(
        n_walks=2, walk_len=4, seed=9, rm=4, cm=2, em=1)).fetchall()}
    assert got == ref and len(got) > 0


def test_biased_walks_unit_mults_reduce_to_first_order(spark):
    """With all three multipliers = 1 (node2vec p = q = 1) the second-order walk
    IS the first-order walk — and the hash scheme is shared, so the two
    operators must emit IDENTICAL rows."""
    import random

    from lingvo_spark_kg.operators.graph import biased_random_walks, random_walks

    rng = random.Random(23)
    edges = [(rng.randrange(12), rng.randrange(12), "p", 1) for _ in range(40)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    a = {tuple(r) for r in random_walks(df, n_walks=2, walk_len=3, seed=6).collect()}
    b = {tuple(r) for r in biased_random_walks(
        df, n_walks=2, walk_len=3, seed=6).collect()}
    assert a == b and len(a) > 0


def test_biased_walks_return_bias(spark):
    """A 64:1 return multiplier on a 10-leaf star: step 2 from the hub (prev =
    the starting leaf) should return to the start in ~64/73 of walks."""
    from lingvo_spark_kg.operators.graph import biased_random_walks

    edges = [(100, leaf, "p", 1) for leaf in range(10)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    rows = biased_random_walks(df, n_walks=16, walk_len=2, seed=2,
                               return_mult=64, explore_mult=1).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault((r["start_id"], r["walk_idx"]), {})[r["step"]] = r["node_id"]
    returns = total = 0
    for (start, _w), seq in by_walk.items():
        if start == 100:
            continue          # walks starting at the hub have no forced step-1
        assert seq[1] == 100  # leaf's only neighbor is the hub
        total += 1
        returns += int(seq[2] == start)
    assert total == 160
    assert returns >= 120     # E = 140.3 (64/73); 120 is far below any noise


def test_analytics_point_in_time_across_ingest(spark, tmp_path):
    """Analytics tables are point-in-time snapshots of the graph generation they
    were computed from: after ingest_delta commits a new generation, a resumed
    analytics() still returns the OLD tables, and analytics(resume=False)
    recomputes over the maintained graph — matching a fresh full-corpus run's
    analytics node set exactly (pagerank node ids)."""
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.pipeline import KgPipeline

    kw = dict(pagerank_iters=5, embedding_epochs=1, embedding_dim=4,
              embedding_partitions=2)
    wd = str(tmp_path / "wd")
    p = KgPipeline(spark, wd, n_docs=50, seed=1, edge_doc_sketch=True)
    p.run()
    before = p.analytics(resume=True, **kw)
    p.ingest_delta(generate_docs(spark, 20, start=50))

    stale = p.analytics(resume=True, **kw)
    assert stale == before                      # resumed = old generation

    fresh = p.analytics(resume=False, **kw)
    nodes_fresh = {r["node_id"] for r in p.table("an_pagerank").collect()}

    wd2 = str(tmp_path / "wd2")
    p2 = KgPipeline(spark, wd2, n_docs=70, seed=1, edge_doc_sketch=True)
    p2.run()
    p2.analytics(resume=True, **kw)
    nodes_full = {r["node_id"] for r in p2.table("an_pagerank").collect()}
    assert nodes_fresh == nodes_full            # maintained graph ≡ full graph
    assert fresh["an_pagerank"] == len(nodes_full)


def test_personalized_pagerank_matches_dense_numpy(spark):
    """pagerank(sources=...) vs an independent dense NumPy random-walk-with-
    restart on a seeded weighted digraph: same teleport-vector convention
    (restart mass 1/|S|, dangling mass restarts through the teleport vector,
    ranks init at the vector). Also pins: total mass 1, zero rank on a
    component unreachable from the sources, and source locality (restart mass
    keeps sources above the global-PageRank ordering of far nodes)."""
    import random

    import numpy as np

    from lingvo_spark_kg.operators.graph import pagerank

    rng = random.Random(31)
    edges = [(rng.randrange(10), rng.randrange(10), "p", rng.randrange(1, 5))
             for _ in range(35)]
    edges += [(20, 21, "p", 2), (21, 20, "p", 1)]   # island unreachable from S
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    d, n_iter, srcs = 0.85, 15, [2, 5]
    got = {r["node_id"]: r["rank"] for r in
           pagerank(df, damping=d, n_iter=n_iter, sources=srcs).collect()}

    nodes = sorted({n for s, dd, _, _ in edges for n in (s, dd)})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, dd, _, w in edges:
        W[idx[s], idx[dd]] += w   # self-loops kept — the operator keeps them too
    out = W.sum(axis=1)
    t = np.zeros(n)
    for s in srcs:
        t[idx[s]] = 1.0 / len(srcs)
    r = t.copy()
    P = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    for _ in range(n_iter):
        dmass = r[out == 0].sum()
        r = (1 - d) * t + d * (P.T @ r + dmass * t)
    for node, i in idx.items():
        assert abs(got[node] - r[i]) < 1e-12, node
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[20] == got[21] == 0.0            # unreachable island: zero mass
    assert all(got[s] > 0 for s in srcs)


def test_neighbor_similarity_matches_duckdb(spark):
    """Wedge-built common-neighbor / Jaccard pairs (with the hub cut) vs the
    same computation in plain SQL — exact integer parity on a seeded random
    graph with a planted hub that exceeds max_center_degree."""
    import random

    import duckdb

    from lingvo_spark_kg.operators.graph import neighbor_similarity

    rng = random.Random(41)
    edges = [(rng.randrange(16), rng.randrange(16), "p", 1) for _ in range(50)]
    edges += [(99, leaf, "p", 1) for leaf in range(12)]   # hub degree 12 > cut
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {tuple(r) for r in
           neighbor_similarity(df, min_common=1, max_center_degree=8).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES %s) t(s, d)"
                % ",".join(f"({s},{d})" for s, d, _, _ in edges))
    ref = {tuple(r) for r in con.execute("""
        WITH und AS (SELECT DISTINCT LEAST(s,d) AS u, GREATEST(s,d) AS v
                     FROM e WHERE s <> d),
        nbrs AS (SELECT u AS node, v AS nbr FROM und
                 UNION ALL SELECT v, u FROM und),
        deg AS (SELECT node, COUNT(*)::BIGINT AS degree FROM nbrs GROUP BY 1),
        ctr AS (SELECT n.* FROM nbrs n JOIN deg USING (node)
                WHERE deg.degree <= 8),
        pr AS (SELECT x.nbr AS a, y.nbr AS b, COUNT(*)::BIGINT AS n_common
               FROM ctr x JOIN ctr y ON x.node = y.node AND x.nbr < y.nbr
               GROUP BY 1, 2 HAVING COUNT(*) >= 1)
        SELECT pr.a AS node_a, pr.b AS node_b, pr.n_common,
               da.degree AS deg_a, db.degree AS deg_b,
               pr.n_common AS jaccard_num,
               da.degree + db.degree - pr.n_common AS jaccard_den,
               CASE WHEN und.u IS NOT NULL THEN 1 ELSE 0 END AS is_edge
        FROM pr JOIN deg da ON da.node = pr.a
        JOIN deg db ON db.node = pr.b
        LEFT JOIN und ON und.u = pr.a AND und.v = pr.b
    """).fetchall()}
    assert got == ref and len(got) > 0
    # the hub's wedges are cut: no pair owes its existence to center 99 alone
    # (hub leaves 10, 11 share only the hub → must be absent)
    assert not any(a == 10 and b == 11 for a, b, *_ in got)


def test_neighbor_similarity_known_values(spark):
    """Square 0-1-2-3-0 plus diagonal 0-2: the non-edge (1, 3) shares both 0
    and 2 → n_common 2, jaccard 2/(3+2-2)... degrees: 0,2 have 3; 1,3 have 2;
    (1,3): num 2, den 2+2-2=2 → jaccard 1.0, is_edge 0."""
    from lingvo_spark_kg.operators.graph import neighbor_similarity

    edges = [(0, 1, "p", 1), (1, 2, "p", 1), (2, 3, "p", 1), (3, 0, "p", 1),
             (0, 2, "p", 1)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    rows = {(r["node_a"], r["node_b"]): r
            for r in neighbor_similarity(df).collect()}
    r13 = rows[(1, 3)]
    assert (r13["n_common"], r13["jaccard_num"], r13["jaccard_den"],
            r13["is_edge"]) == (2, 2, 2, 0)
    r02 = rows[(0, 2)]
    assert r02["is_edge"] == 1 and r02["n_common"] == 2  # shares 1 and 3
    plan = neighbor_similarity(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_components_two_islands(spark):
    """graph.components over the edges adapter: two disjoint islands label by
    their min node id (string ids — the KG's canonical-id type)."""
    from lingvo_spark_kg.operators.graph import components

    edges = [("b", "a", "p", 1), ("b", "c", "p", 1), ("x", "y", "p", 1)]
    df = spark.createDataFrame(
        edges, "src_id string, dst_id string, pred string, n_occurrences long")
    got = {r["node_id"]: r["component"] for r in components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_neighborhood_function_matches_exact_bfs(spark):
    """HLL neighborhood function vs exact per-node BFS ball sizes on a seeded
    random graph: every hop's estimate within 5% (lg_config_k=14 → ~0.8%
    expected), hop sequence non-decreasing, saturates at n_reachable_pairs."""
    import random
    from collections import deque

    from lingvo_spark_kg.operators.graph import neighborhood_function

    rng = random.Random(47)
    edges = [(rng.randrange(40), rng.randrange(40), "p", 1) for _ in range(70)]
    df = spark.createDataFrame(
        edges, "src_id long, dst_id long, pred string, n_occurrences long")
    got = {r["hop"]: r["est_pairs"]
           for r in neighborhood_function(df, max_hops=10).collect()}

    adj = {}
    for s, d, _, _ in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    exact = {h: 0 for h in range(11)}
    for v in adj:
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for h in range(11):
            exact[h] += sum(1 for dd in dist.values() if dd <= h)

    hops = sorted(got)
    assert got[0] == len(adj)
    for h in hops:
        assert abs(got[h] - exact[h]) <= max(2, 0.05 * exact[h]), (h, got[h], exact[h])
    assert all(got[hops[i]] <= got[hops[i + 1]] for i in range(len(hops) - 1))
