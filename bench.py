"""Benchmark harness.

Default: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}.
``queries`` are per-query medians over ``$SPARK_GRAFT_BENCH_REPEATS`` (default 3)
full passes (raw runs included under "raw_runs") — single runs on this host swing
2-4× with ambient load; plus one DNN-regimen tagging throughput entry ("dnn").

One-shot sections next to the medians (each its own JSON key, excluded from
``value`` so the headline total stays comparable round-over-round): ``skew`` (plain
vs salted join wall clock on a 60%-hub-key fixture), ``ann`` (recall@10 per ANN
variant vs brute force + hof-vs-arrow bucket kernel at 100k vectors),
``graph_query`` (BGP / OPTIONAL / label-propagation / BFS / weighted shortest
paths / p+ forest closure / CONSTRUCT / N-Triples on the 2M-edge Zipf-hub
graph), ``pipelines`` (full 9-stage checkpointed runs at 10× the bench corpus —
lexicon, DNN-numpy and DNN-ONNX regimens; MEDIANS over
``$SPARK_GRAFT_BENCH_PIPELINE_REPS`` (default 2) full runs with raw totals
attached, per-stage medians included; the DNN pair is the TRAINED demo artifact,
model/demo.py). ``SPARK_GRAFT_BENCH_PIPELINE_DOCS=0`` skips the pipeline runs.

``python bench.py --scaling`` additionally runs the flagship docs→triples job at
two parallelism-level pairs on the SAME input — (2, 8) cores (PRIMARY: far from
this box's 32-core saturation knee) and (4, 16) (round-over-round
comparability); ``--saturated`` uses (8, 32), ``--legacy`` only (4, 16) — and
reports throughputs plus scaling efficiency per pair, the sandbox proxy for the
N→4N-executor criterion (BASELINE.json north_rule; see BASELINE.md "Target
protocol").
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _n_docs_for(sf: float) -> int:
    return max(int(sf * 1_000_000), 100)


def _get_spark(cpus: int):
    from lingvo_spark_kg.session import get_spark

    return get_spark(app_name=f"lingvo-kg-bench-{cpus}", cpus=cpus,
                     shuffle_partitions=max(cpus, 8))


def _time(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 3), n


def _median(vals: list) -> float:
    s = sorted(vals)
    m = len(s) // 2
    return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)


def run_dnn_tag(spark, n_docs: int, backend: str = "numpy") -> tuple[float, dict]:
    """DNN-regimen throughput (VERDICT r1 item 3): docs → tokenize → BiLSTM tag (POS +
    NER forward passes) → triple templates. Runs on n_docs of the same synthetic
    corpus; reports docs/s and tokens/s so the 100× story for the tagging-dominated
    regimen is a measured number, not a guess.

    ``backend``: 'numpy' (native forward) or 'onnx' — the PRODUCTION inference graph:
    real exported ONNX bundles (model/onnx_export.py) broadcast to executors and run
    through one graph-executor session per worker (numpy_session_factory in this
    sandbox; onnxruntime drops into the same seam on a production image). Both are
    measured per round (VERDICT r3 item 4) so the shipped graph is the benched one."""
    from pyspark.sql import functions as F

    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.tag import tag_sentences_bilstm
    from lingvo_spark_kg.operators.tokenize import tokenize_docs
    from lingvo_spark_kg.operators.triples import extract_triples_df

    pos_m, ner_m = pinned_tagger_models()
    if backend == "onnx":
        from lingvo_spark_kg.model.backend import onnx_backend
        from lingvo_spark_kg.model.onnx_export import to_onnx_bundle
        from lingvo_spark_kg.model.onnx_numpy import numpy_session_factory

        pos_bc = spark.sparkContext.broadcast(to_onnx_bundle(pos_m))
        ner_bc = spark.sparkContext.broadcast(to_onnx_bundle(ner_m))
        loader = onnx_backend(session_factory=numpy_session_factory)
    else:
        pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
        ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
        loader = None
    docs = generate_docs(spark, n_docs).persist()
    docs.count()
    sents = tokenize_docs(docs)
    # token count from the UN-tagged frame (identical tokens) — counting via `tagged`
    # would re-run both DNN forward passes just for the sum
    n_tokens = sents.select(F.sum(F.size("tokens"))).first()[0]
    tagged = tag_sentences_bilstm(sents, pos_bc, ner_bc, backend_loader=loader)
    job = extract_triples_df(tagged).select("doc_id")
    job.count()  # warm-up: python workers + model rehydration are fixed costs,
    # steady-state throughput is the number that scales
    sec1, _n = _time(job.count)
    sec2, _n = _time(job.count)
    sec = min(sec1, sec2)  # best-of-2 steady state (single runs swing 2× with load)
    docs.unpersist()
    return sec, {"backend": backend, "n_docs": n_docs, "n_tokens": int(n_tokens),
                 "docs_per_sec": round(n_docs / sec, 1),
                 "tokens_per_sec": round(n_tokens / sec, 1)}


def run_headline(spark, sf_dir: str, n_docs: int) -> dict[str, float]:
    import __spark_entry__ as e
    from lingvo_spark_kg.operators import canonicalize, linking
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.schemas import ALIASES_SCHEMA
    from lingvo_spark_kg.operators.triples import docs_to_triples_fused
    from lingvo_spark_kg.fixtures.corpus import make_aliases

    timings: dict[str, float] = {}
    meta: dict[str, int] = {}

    gaz_bc = e._gaz_bc(spark)
    docs = generate_docs(spark, n_docs).persist()
    timings["gen_docs"], meta["n_docs"] = _time(docs.count)

    triples = docs_to_triples_fused(docs, gaz_bc).persist()
    timings["kg_triples"], meta["n_triples"] = _time(triples.count)
    docs.unpersist()  # eager release: cached frames left around degrade later stages

    import pandas as _pd
    aliases = spark.createDataFrame(_pd.DataFrame(make_aliases(seed=42)), schema=ALIASES_SCHEMA)
    links = linking.link_mentions(linking.mentions_from_triples(triples), aliases).persist()
    timings["kg_links"], meta["n_links"] = _time(links.count)

    canon = canonicalize.canonical_map(links).persist()
    timings["kg_canonical"], meta["n_canon"] = _time(canon.count)

    # the single corpus-volume shuffle of the pipeline: edge aggregation.
    # `triples` stays persisted through this timing — unpersisting earlier would make
    # the measurement re-run the whole extraction instead of isolating the shuffle.
    from lingvo_spark_kg.operators import graph as graph_ops

    linked = linking.link_triples(triples, links)
    timings["kg_edges_agg"], meta["n_edges"] = _time(
        lambda: graph_ops.build_edges_table(linked, canon).count()
    )
    triples.unpersist()
    canon.unpersist()
    links.unpersist()
    spark.catalog.clearCache()

    # flat-table operators over the driver testdata
    timings["dedup_minhash"], _ = _time(
        lambda: e.q_minhash_bands(spark, sf_dir).count()
    )
    timings["neardup_pairs"], _ = _time(
        lambda: e.q_neardup_pairs(spark, sf_dir).count()
    )
    timings["dedup_survivors"], _ = _time(
        lambda: e.q_dedup_survivors(spark, sf_dir).count()
    )
    timings["simhash"], _ = _time(lambda: e.q_simhash(spark, sf_dir).count())
    timings["winnow_fp"], _ = _time(lambda: e.q_winnow_fp(spark, sf_dir).count())
    # the production hash swap next to the md5 oracle anchor (same winnowing
    # semantics — VERDICT r3 item 6; the delta is the md5-per-gram constant)
    from lingvo_spark_kg.operators.textstats import winnow_fingerprints

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timings["winnow_fp_xxh"], _ = _time(
        lambda: winnow_fingerprints(docs_tbl, k=7, window=4, hash="xxhash64").count()
    )
    timings["decontaminate"], _ = _time(
        lambda: e.q_decontaminate(spark, sf_dir).count()
    )
    timings["repetition"], _ = _time(lambda: e.q_repetition(spark, sf_dir).count())
    timings["textstats"], _ = _time(
        lambda: e.q_quality(spark, sf_dir).count() + e.q_lang_id(spark, sf_dir).count()
    )
    timings["ann_topk"], _ = _time(lambda: e.q_ann_topk(spark, sf_dir).count())

    # PII redaction over the documents table (URL/Email state machine + digit-run
    # masking per row — the heaviest pure-Python text kernel outside the DNN)
    from lingvo_spark_kg.operators.textstats import redact_pii
    from pyspark.sql import functions as F

    spans = docs_tbl.select(F.col("doc_id").cast("string").alias("doc_id"),
                            F.lit(0).cast("int").alias("span_idx"), "text")
    timings["redact_pii"], _ = _time(lambda: redact_pii(spans).count())

    # multimodal chain: payload synth → resize + feature-extract (Arrow-batched
    # binary columns; codecs at the stubbed seams, plumbing measured)
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.multimodal import (media_features,
                                                      media_payloads, resize_media)
    from lingvo_spark_kg.operators.tokenize import media_spans

    mp = media_payloads(media_spans(docs_from_documents_table(spark, sf_dir)))
    timings["media_pipeline"], _ = _time(
        lambda: resize_media(mp, width=32, height=32).count()
        + media_features(mp, dim=16).count()
    )

    timings["_meta_n_triples"] = meta["n_triples"]
    timings["_meta_n_docs"] = meta["n_docs"]
    return timings


def run_skew_join(spark) -> dict:
    """J2 measured evidence (VERDICT r4 item 6): the same Zipf-head dim join run as a
    plain shuffle join vs linking.salted_join, broadcast disabled — the salted
    variant splits the hub key's reduce task ×n_salt, so its wall clock drops by
    roughly the hub share. 16M fact rows, one key carrying 60% of them (the
    head-entity shape entity linking hits, SURVEY §4.2-3); interleaved best-of-2 per
    strategy so host drift hits both equally. Results are identical by construction
    (salted_join equivalence is pinned in tests/test_plans.py)."""
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.linking import dim_join

    n_facts = 16_000_000
    facts = spark.range(n_facts).select(
        F.when(F.pmod("id", 10) < 6, F.lit("hub"))
        .otherwise(F.concat(F.lit("k"), F.pmod("id", 100_000).cast("string")))
        .alias("k"),
        F.col("id").alias("payload")).persist()
    facts.count()
    dim = spark.range(100_001).select(
        F.when(F.col("id") == 100_000, F.lit("hub"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string"))).alias("k"),
        (F.col("id") * 7).alias("entity")).persist()
    dim.count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    best = {"auto": float("inf"), "salted": float("inf")}
    try:
        for strat in ("auto", "salted", "auto", "salted"):
            out = dim_join(facts, dim, ["k"], strategy=strat)
            sec, _ = _time(
                lambda o=out: o.agg({"entity": "sum"}).collect() and 0)
            best[strat] = min(best[strat], sec)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        facts.unpersist()
        dim.unpersist()
    return {"n_facts": n_facts, "hub_share": 0.6, "n_salt": 16,
            "plain_sec": best["auto"], "salted_sec": best["salted"],
            "speedup": round(best["auto"] / best["salted"], 2)}


def run_pagerank_bench(spark) -> dict:
    """Graph-analytics section: graph.pagerank's iterative keyed-join shape timed
    at a scale where iteration cost is visible (the KG's own node table is
    vocabulary-bounded and finishes in milliseconds). Synthetic Zipf-ish digraph:
    2M weighted edges over 200k nodes with a hub destination drawing ~20% of all
    in-edges — the head-entity shape a real mention graph has. 10 power
    iterations, checkpointed every 5 (the operator default discipline); the
    metric is edge-iterations/sec, comparable round-over-round."""
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.graph import pagerank

    n_edges, n_nodes, n_iter = 2_000_000, 200_000, 10
    edges = spark.range(n_edges).select(
        F.pmod(F.col("id") * 2654435761, F.lit(n_nodes)).alias("src_id"),
        F.when(F.pmod("id", 5) == 0, F.lit(0))  # hub dst: 20% of in-edges
        .otherwise(F.pmod(F.col("id") * 40503, F.lit(n_nodes))).alias("dst_id"),
        (F.pmod("id", 4) + 1).alias("n_occurrences")).persist()
    edges.count()
    try:
        pr = pagerank(edges, n_iter=n_iter)
        sec, _ = _time(lambda: pr.agg(F.sum("rank")).collect() and 0)
    finally:
        edges.unpersist()
    return {"n_edges": n_edges, "n_nodes": n_nodes, "n_iter": n_iter,
            "sec": sec,
            "edge_iters_per_sec": round(n_edges * n_iter / sec, 1)}


def run_triangles_bench(spark) -> dict:
    """Triangle-counting section: graph.triangle_counts' degree-ordered wedge
    closing on the SAME Zipf-hub shape the pagerank section uses — the hub is
    exactly where orientation pays: the highest-degree node takes every incident
    edge as its IN side, so its oriented out-degree is 0 and the wedge frame
    stays O(m^1.5)-bounded instead of C(hub_degree, 2). Metric is edges/sec
    through the full count, comparable round-over-round."""
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.graph import triangle_counts

    # hash-derived endpoints (a LINEAR map mod n makes dst a function of src —
    # out-degree 1, zero triangles); 2M edges / 50k nodes ≈ avg degree 80, so the
    # random part alone closes ~10^5 triangles and the count is a hard signal
    n_edges, n_nodes = 2_000_000, 50_000
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src_id"),
        F.when(F.pmod("id", 5) == 0, F.lit(0))  # hub dst: 20% of in-edges
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)))
        .alias("dst_id"),
        (F.pmod("id", 4) + 1).alias("n_occurrences")).persist()
    edges.count()
    try:
        sec, row = _time(lambda: triangle_counts(edges)
                         .agg(F.sum("n_triangles").alias("s")).collect()[0])
        n_tri = int(row["s"] or 0) // 3
    finally:
        edges.unpersist()
    return {"n_edges": n_edges, "n_nodes": n_nodes, "n_triangles": n_tri,
            "sec": sec, "edges_per_sec": round(n_edges / sec, 1)}


def run_incremental_bench(spark, n_base: int, n_delta: int) -> dict:
    """Incremental-maintenance section (operators/incremental.py): time a FULL
    graph recompute over base+delta docs vs applying only the delta to the
    materialized base state. The speedup is the point of incremental maintenance —
    the delta path pays delta-volume extraction plus vocabulary-bounded re-link/CC
    plus an edge-table re-aggregate, never base-corpus extraction. Both paths end
    on the same action (edge-table count); result equality is pinned in
    tests/test_incremental.py, so this section only measures."""
    import __spark_entry__ as e
    from lingvo_spark_kg.operators import incremental, linking
    from lingvo_spark_kg.operators.canonicalize import canonical_map
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.graph import build_edges_table
    from lingvo_spark_kg.operators.triples import docs_to_triples_fused

    gaz_bc = e._gaz_bc(spark)
    aliases = e._aliases_df(spark)

    def graph_state(triples):
        links = linking.link_mentions(
            linking.mentions_from_triples(triples), aliases).localCheckpoint()
        canon = canonical_map(links).localCheckpoint()
        edges = build_edges_table(linking.link_triples(triples, links), canon,
                                  doc_sketch=True)
        return links, canon, edges

    # base state: the already-materialized graph an ingest batch arrives against
    base_t = docs_to_triples_fused(
        generate_docs(spark, n_base), gaz_bc).localCheckpoint()
    base_links, base_canon, base_edges = graph_state(base_t)
    base_edges = base_edges.localCheckpoint()

    def full():
        all_t = docs_to_triples_fused(
            generate_docs(spark, n_base + n_delta), gaz_bc)
        return graph_state(all_t)[2].count()

    def incr():
        delta_t = docs_to_triples_fused(
            generate_docs(spark, n_delta, start=n_base), gaz_bc)
        return incremental.apply_delta(base_links, base_canon, base_edges,
                                       delta_t, aliases)["edges"].count()

    full_sec, n_edges_full = _time(full)
    incr_sec, n_edges_incr = _time(incr)
    assert n_edges_full == n_edges_incr, "incremental diverged from full recompute"
    return {"n_base": n_base, "n_delta": n_delta, "n_edges": n_edges_full,
            "full_recompute_sec": full_sec, "apply_delta_sec": incr_sec,
            "speedup": round(full_sec / incr_sec, 2)}


def run_ann_quality(spark, sf_dir: str) -> dict:
    """ANN section (VERDICT r4 item 7): recall@10 of each approximate variant vs the
    brute-force oracle at the bench tier, recorded per round (the ≥0.95 multi-table
    gate lives in tests; this records the actual numbers), plus the corpus-side
    bucket-kernel comparison (impl='hof' JVM higher-order funcs vs 'arrow' packed
    matmul) at 100k synthetic vectors — the scale where the kernel choice matters."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.ann import lsh_multitable_topk

    def topk_sets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    brute = topk_sets(e.q_ann_topk(spark, sf_dir))
    recall = {}
    for name, fn in (("lsh", e.q_ann_lsh), ("lsh_multi", e.q_ann_lsh_multi),
                     ("ivf", e.q_ann_ivf)):
        approx = topk_sets(fn(spark, sf_dir))
        recall[name] = round(
            sum(len(approx.get(q, set()) & s) / len(s) for q, s in brute.items())
            / len(brute), 4)

    emb = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(1000 + i) - 0.5 for i in range(64)]).alias("embedding"),
    ).persist()
    emb.count()
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"),
                                              "embedding")
    # production config (n_tables=16): at toy table counts the arrow kernel's
    # Python/Arrow round-trip dominates and hof wins — the comparison only means
    # something at the scale where the corpus-side bucket computation is the cost.
    # One pass per kernel (~2 min total; the 2-4× gap is far above host noise).
    secs = {}
    for impl in ("hof", "arrow"):
        job = lsh_multitable_topk(emb, q, dim=64, k=10, n_tables=16, impl=impl)
        secs[impl], _ = _time(job.count)
    emb.unpersist()
    return {"recall_at_10": recall,
            "bucket_kernel_100k": {"n_tables": 16, "hof_sec": secs["hof"],
                                   "arrow_sec": secs["arrow"],
                                   "arrow_speedup": round(secs["hof"] / secs["arrow"], 2)}}


def run_pipeline(spark, n_docs: int, tagger: str, dnn_backend: str = "numpy") -> dict:
    """Full 9-stage checkpointed pipeline (docs → … → nodes/edges/metrics), fresh
    workdir, one pass — the end-to-end number the per-operator timings above cannot
    give. The DNN regimens run the TRAINED demo models (model/demo.py), which
    reproduce the lexicon regimen on this corpus, so links/CC/graph stages carry the
    same non-trivial volume under every tagger."""
    import shutil
    import tempfile

    from lingvo_spark_kg.pipeline import KgPipeline

    wd = tempfile.mkdtemp(prefix=f"bench_pipe_{tagger}_{dnn_backend}_")
    try:
        p = KgPipeline(spark, wd, n_docs=n_docs, tagger=tagger,
                       dnn_backend=dnn_backend)
        t0 = time.time()
        counts = p.run(resume=False)
        total = round(time.time() - t0, 3)
        return {"n_docs": n_docs, "tagger": tagger, "dnn_backend": dnn_backend,
                "total_sec": total, "stages": dict(p.timings),
                "n_triples": counts.get("triples_raw"),
                "n_edges": counts.get("edges")}
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def run_scaling(sf_dir: str, n_docs: int, levels=(4, 16), repeats: int = 2) -> dict:
    """Same flagship job (docs→triples fused) at two parallelism levels (N and 4N
    cores — the sandbox proxy for N vs 4N executors).

    Identical input AND identical partitioning (128) at both levels — the partition
    count changes batch-local memoization, so varying it would change total work, not
    just parallelism. One warm-up pass per level spins up the Python workers (worker
    cold-start is a fixed cost, not steady-state throughput); best-of-``repeats``.

    Default levels are (4, 16): at (8, 32) the 4N level occupies EVERY core of this
    box, so the job contends with the Spark driver JVM and the OS for the same cores —
    a single-machine artifact a real 4N-executor cluster does not have (executors
    don't share cores with each other). A pure-multiprocessing baseline of the same
    per-doc work hits the same 32-core wall (see BASELINE.md)."""
    out = {}
    partitions = 128
    best_sec: dict[int, float] = {}
    n_triples = 0
    # interleave level visits (N, 4N, N, 4N): host-load drift between the two blocks
    # of a sequential run skews the ratio; interleaving samples both levels under
    # similar conditions and takes the per-level best
    visit_order = [levels[0], levels[1], levels[0], levels[1]]
    for cpus in visit_order:
        spark = _get_spark(cpus)
        import __spark_entry__ as e
        from lingvo_spark_kg.operators.docsgen import generate_docs
        from lingvo_spark_kg.operators.triples import docs_to_triples_fused

        gaz_bc = e._gaz_bc(spark)
        docs = generate_docs(spark, n_docs, partitions=partitions).persist()
        docs.count()  # materialize input before timing the job
        job = docs_to_triples_fused(docs, gaz_bc)
        n_triples = job.count()  # warm-up: python workers up, code paths JITed
        best = best_sec.get(cpus, float("inf"))
        for _ in range(repeats):
            t0 = time.time()
            job.count()
            best = min(best, time.time() - t0)
        best_sec[cpus] = best
        docs.unpersist()
        spark.stop()
    for cpus, best in best_sec.items():
        out[f"local[{cpus}]"] = {
            "sec": round(best, 3),
            "docs_per_sec": round(n_docs / best, 1),
            "triples_per_sec": round(n_triples / best, 1),
        }
    lo, hi = levels
    t_lo = out[f"local[{lo}]"]["sec"]
    t_hi = out[f"local[{hi}]"]["sec"]
    out["levels"] = [lo, hi]
    out["scaling_efficiency"] = round((t_lo / t_hi) / (hi / lo), 4)
    return out


def run_graph_query_bench(spark) -> dict:
    """Graph-QUERY section: the query layer timed on the Zipf-hub shape the
    pagerank section uses (2M edges / 200k nodes, hub drawing 20% of in-edges,
    3 predicates). Fourteen reads (round 7 added the four VERDICT-r6 item-7
    arms, the second-pass NPS/aggregation reads and the third-pass
    subquery/UPDATE/betweenness reads so regressions in them are visible
    round-over-round): a 2-hop BGP with
    constant predicates (match_pattern — one mid-keyed self-join), the same
    BGP with the second hop OPTIONAL (left join), 3 label-propagation
    iterations (edge-volume voting joins), a 4-hop multi-source BFS from the
    hub (frontier-bounded), weighted shortest paths from the hub
    (Bellman-Ford min-plus rounds), a p+ transitive closure over a 200k-node
    forest predicate unioned into the graph (log-round doubling; closing a
    hierarchy-shaped predicate, the shape the operator is FOR — a dense
    random predicate's closure is quadratic output by definition),
    CONSTRUCT-rule materialization over the 2-hop body, the N-Triples
    export expression (zero-shuffle codegen map; lines/sec is the
    interchange-throughput read; sum(length) forces the encode), plus the
    round-7 second-pass algebra: a negated-property-set scan (``!p0``, the
    complement read) and a GROUP BY aggregation with HAVING over the top
    predicate's solutions (one hash aggregate), a text-parsed SPARQL
    SUBQUERY (inner per-subject aggregate joined onto the outer scan), a
    SPARQL UPDATE predicate migration (anti-join + distinct-union over the
    whole store), a 2-pivot 4-hop sampled-Brandes betweenness (σ-BFS +
    dependency sweep) and a non-recursive 2-round semi-naive rule
    materialization."""
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.graph import (bfs_distances,
                                                 construct_edges,
                                                 label_propagation,
                                                 match_pattern,
                                                 shortest_paths)
    from lingvo_spark_kg.operators.rdf import to_ntriples

    n_edges, n_nodes = 2_000_000, 200_000
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src_id"),
        F.when(F.pmod("id", 5) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)))
        .alias("dst_id"),
        F.concat(F.lit("p"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(3)))
        .alias("pred"),
        (F.pmod("id", 4) + 1).alias("n_occurrences")).persist()
    edges.count()
    # the closure arm runs on a hierarchy-shaped predicate (a 200k-node binary
    # forest: child i → parent i/2) unioned into the graph — closing a DENSE
    # random predicate is quadratic output by definition (the operator's
    # docstring scale-honesty note); the forest closure is n·depth ≈ 3.4M
    # pairs, the shape p+ is FOR
    tree = spark.range(1, 200_000).select(
        F.concat(F.lit("t"), F.col("id")).alias("src_id"),
        F.concat(F.lit("t"), (F.col("id") / 2).cast("long")).alias("dst_id"),
        F.lit("up").alias("pred"), F.lit(1).alias("n_occurrences"))
    edges_t = edges.select(F.col("src_id").cast("string"),
                           F.col("dst_id").cast("string"),
                           "pred", "n_occurrences") \
        .unionByName(tree).persist()
    edges_t.count()
    try:
        bgp_sec, n_sol = _time(lambda: match_pattern(
            edges, [("?a", "p0", "?b"), ("?b", "p1", "?c")]).count())
        opt_sec, n_opt = _time(lambda: match_pattern(
            edges, [("?a", "p0", "?b")],
            optional=[[("?b", "p1", "?c")]]).count())
        lpa_sec, _ = _time(lambda: label_propagation(edges, max_iter=3).count())
        bfs_sec, n_reached = _time(
            lambda: bfs_distances(edges, [0], max_hops=4).count())
        sp_sec, n_sp = _time(lambda: shortest_paths(
            edges, [0], weight_col="n_occurrences").count())
        clo_sec, n_clo = _time(lambda: match_pattern(
            edges_t, [("?a", "up+", "t1")]).count())
        con_sec, n_con = _time(lambda: construct_edges(
            edges, [("?a", "p0", "?b"), ("?b", "p1", "?c")],
            ("?a", "linked", "?c")).count())
        nps_sec, n_nps = _time(lambda: match_pattern(
            edges, [("?a", "!p0", "?b")]).count())
        agg_sec, n_agg = _time(lambda: match_pattern(
            edges, [("?a", "p0", "?b")], group_by=["a"],
            agg={"n": "count(*)"}, having="n >= 2").count())
        # round-7 third pass: the SPARQL text front-end's subquery join
        # (inner per-subject aggregate joined onto the outer scan) and a
        # SPARQL UPDATE predicate migration (one anti-join + one
        # distinct-union over the whole store)
        from lingvo_spark_kg.operators.sparql import (sparql_query,
                                                      sparql_update)

        sub_sec, n_sub = _time(lambda: sparql_query(
            edges,
            "SELECT ?a ?b ?n WHERE { ?a <p0> ?b . "
            "{ SELECT ?a (COUNT(*) AS ?n) WHERE { ?a <p0> ?z } "
            "GROUP BY ?a } }").count())
        upd_sec, n_upd = _time(lambda: sparql_update(
            edges,
            "DELETE { ?s <p2> ?o } INSERT { ?s <p2_v2> ?o } "
            "WHERE { ?s <p2> ?o }").count())
        from lingvo_spark_kg.operators.graph import (betweenness_centrality,
                                                     materialize_rules)

        bet_sec, _ = _time(lambda: betweenness_centrality(
            edges, n_pivots=2, max_hops=4)
            .agg(F.sum("centrality")).collect() and 0)
        # the semi-naive machinery on a non-recursive composition rule
        # (converges in 2 rounds: derive, then empty delta) — times the
        # per-round delta evaluation + novelty anti-join, not a closure
        rul_sec, n_rul = _time(lambda: materialize_rules(
            edges, [([("?x", "p0", "?y"), ("?y", "p1", "?z")],
                     ("?x", "composed", "?z"))],
            include_base=False).count())
        # sum(length(line)) FORCES the encode: a bare count() lets Catalyst
        # prune the projection and times nothing but the cached row count
        nt = to_ntriples(edges)
        nt_sec, _bytes = _time(lambda: int(nt.agg(
            F.sum(F.length("line"))).collect()[0][0]))
        n_lines = n_edges
    finally:
        edges.unpersist()
        edges_t.unpersist()
    return {"n_edges": n_edges, "n_nodes": n_nodes,
            "bgp_2hop_sec": bgp_sec, "bgp_solutions": n_sol,
            "optional_sec": opt_sec, "optional_solutions": n_opt,
            "lpa_3iter_sec": lpa_sec,
            "bfs_4hop_sec": bfs_sec, "bfs_reached": n_reached,
            "sssp_sec": sp_sec, "sssp_reached": n_sp,
            "closure_tree200k_sec": clo_sec, "closure_ancestors_of_root": n_clo,
            "construct_sec": con_sec, "construct_edges": n_con,
            "nps_sec": nps_sec, "nps_solutions": n_nps,
            "groupagg_sec": agg_sec, "groupagg_groups": n_agg,
            "subquery_sec": sub_sec, "subquery_solutions": n_sub,
            "update_sec": upd_sec, "update_store_rows": n_upd,
            "betweenness_2pivot_sec": bet_sec,
            "rules_sec": rul_sec, "rules_inferred": n_rul,
            "ntriples_sec": nt_sec,
            "ntriples_lines_per_sec": round(n_lines / nt_sec, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_docs = _n_docs_for(sf)

    if "--scaling" in sys.argv:
        # Default runs TWO pairs (round 7, VERDICT r6 item 6): (2, 8) sits far
        # from this box's 32-core saturation knee — at (4, 16) the 4N level
        # shares cores with the driver JVM + OS, so ambient load lands almost
        # entirely on the measured job and final-code r6 ratios sat at the
        # 0.8 gate boundary. The (2, 8) ratio is the PRIMARY recorded signal;
        # (4, 16) is kept for round-over-round comparability, and each pair's
        # 4N-level docs/s is in the detail (the rock-stable absolute number).
        if "--saturated" in sys.argv:
            pairs = [(8, 32)]
        elif "--legacy" in sys.argv:
            pairs = [(4, 16)]
        else:
            pairs = [(2, 8), (4, 16)]
        # 3× the bench corpus so per-job fixed overheads (task scheduling, Arrow
        # setup — ~1-2 s regardless of size) do not bound the 4N level: the
        # north-rule criterion is throughput scaling on the LARGE slice
        detail = {}
        for lv in pairs:
            detail[f"{lv[0]}_to_{lv[1]}"] = run_scaling(sf_dir, n_docs * 3,
                                                        levels=lv)
        primary = detail[f"{pairs[0][0]}_to_{pairs[0][1]}"]
        print(json.dumps({
            "metric": f"scaling_efficiency_{pairs[0][0]}_to_{pairs[0][1]}",
            "value": primary["scaling_efficiency"], "unit": "ratio",
            "detail": detail, "sf": sf}))
        return

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = _get_spark(cpus)

    # per-query median-of-N (host noise on this box swings single runs 2-4×,
    # BASELINE.md "Noise"; medians make round-over-round comparison meaningful)
    runs: list[dict[str, float]] = []
    n_triples = n_docs_done = 0
    for _ in range(repeats):
        t = run_headline(spark, sf_dir, n_docs)
        n_triples = t.pop("_meta_n_triples")
        n_docs_done = t.pop("_meta_n_docs")
        runs.append(t)

    timings = {k: _median([r[k] for r in runs]) for k in runs[0]}

    dnn_sec, dnn_meta = run_dnn_tag(spark, max(n_docs // 10, 1000))
    timings["dnn_tag_bilstm"] = dnn_sec
    # the production inference graph, measured next to the native kernel (both run
    # the SAME operator; only the broadcast bytes + per-worker loader differ)
    onnx_sec, onnx_meta = run_dnn_tag(spark, max(n_docs // 10, 1000), backend="onnx")
    timings["dnn_tag_bilstm_onnx"] = onnx_sec

    # one-shot sections (not in the per-repeat medians, and kept OUT of "value" so
    # the headline total stays comparable round-over-round): measured skew-join win,
    # ANN recall + bucket-kernel comparison, and the full 9-stage pipeline runs
    skew = run_skew_join(spark)
    ann = run_ann_quality(spark, sf_dir)
    pr_bench = run_pagerank_bench(spark)
    tri_bench = run_triangles_bench(spark)
    gq_bench = run_graph_query_bench(spark)
    # incremental maintenance: 2x the bench corpus as base, 10% of it as the delta
    incr = run_incremental_bench(spark, n_base=n_docs * 2, n_delta=n_docs // 5)
    pipelines: dict[str, dict] = {}
    pipe_docs = int(os.environ.get("SPARK_GRAFT_BENCH_PIPELINE_DOCS",
                                   str(n_docs * 10)))
    # medians over ≥2 full runs per regimen (VERDICT r6 item 5): single-run
    # pipeline totals swung 2× with ambient load on the one NumPy-bound stage
    # (r6: onnx 111 s exclusive vs 198.8 s in the driver file); raw totals are
    # attached so the spread itself is recorded
    pipe_reps = int(os.environ.get("SPARK_GRAFT_BENCH_PIPELINE_REPS", "2"))

    def run_pipeline_median(tagger: str, backend: str = "numpy") -> dict:
        runs = [run_pipeline(spark, pipe_docs, tagger, backend)
                for _ in range(pipe_reps)]
        out = dict(runs[0])
        out["total_sec"] = _median([r["total_sec"] for r in runs])
        out["raw_total_secs"] = [r["total_sec"] for r in runs]
        out["stages"] = {k: _median([r["stages"][k] for r in runs])
                         for k in runs[0]["stages"]}
        return out

    if pipe_docs > 0:
        if pipe_docs % 1_000_000 == 0:
            label = f"{pipe_docs // 1_000_000}m"
        elif pipe_docs >= 1000 and pipe_docs % 1000 == 0:
            label = f"{pipe_docs // 1000}k"
        else:
            label = str(pipe_docs)
        pipelines[f"pipeline_lexicon_{label}"] = run_pipeline_median("lexicon")
        pipelines[f"pipeline_dnn_{label}"] = run_pipeline_median("dnn")
        pipelines[f"pipeline_dnn_onnx_{label}"] = run_pipeline_median(
            "dnn", "onnx")

    total = round(sum(timings.values()), 3)
    # full-detail record first: raw runs + per-stage pipeline breakdowns make this
    # line long, and the driver's tail capture has truncated its HEAD before
    # (BENCH_r05) — so everything a round-over-round comparison needs is REPEATED
    # on the final compact line below, which a tail capture always keeps intact
    print(json.dumps({
        "metric": "kg_pipeline_and_dataops_detail",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "raw_runs": runs,
        "repeats": repeats,
        "dnn": dnn_meta,
        "dnn_onnx": onnx_meta,
        "skew": skew,
        "ann": ann,
        "pagerank": pr_bench,
        "triangles": tri_bench,
        "graph_query": gq_bench,
        "incremental": incr,
        "pipelines": pipelines,
        "sf": sf,
        "n_docs": n_docs_done,
        "n_triples": n_triples,
    }))
    print(json.dumps({
        "metric": "kg_pipeline_and_dataops_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": repeats,
        "sf": sf,
        "n_docs": n_docs_done,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / timings["kg_triples"], 1),
        "docs_per_sec": round(n_docs_done / timings["kg_triples"], 1),
        "skew": {k: skew[k] for k in ("plain_sec", "salted_sec", "speedup")
                 if k in skew},
        "ann": ann,
        "pagerank": pr_bench,
        "triangles": tri_bench,
        "graph_query": gq_bench,
        "incremental": incr,
        "pipelines": {name: p.get("total_sec") for name, p in pipelines.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
