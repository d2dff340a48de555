"""Benchmark harness.

Default: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}.
``queries`` are per-query medians over ``$SPARK_GRAFT_BENCH_REPEATS`` (default 3)
full passes (raw runs included under "raw_runs") — single runs on this host swing
2-4× with ambient load; plus one DNN-regimen tagging throughput entry ("dnn").

``python bench.py --scaling`` additionally runs the flagship docs→triples job at two
parallelism levels (local[4] then local[16]; ``--saturated`` uses 8/32) on the SAME
input and reports throughputs plus scaling efficiency — the sandbox proxy for the
N→4N-executor criterion (BASELINE.json north_rule; see BASELINE.md "Target protocol").
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_docs = _n_docs_for(sf)

    if "--scaling" in sys.argv:
        levels = (8, 32) if "--saturated" in sys.argv else (4, 16)
        # 3× the bench corpus so per-job fixed overheads (task scheduling, Arrow
        # setup — ~1-2 s regardless of size) do not bound the 4N level: the
        # north-rule criterion is throughput scaling on the LARGE slice
        res = run_scaling(sf_dir, n_docs * 3, levels=levels)
        print(json.dumps({"metric": f"scaling_efficiency_{levels[0]}_to_{levels[1]}",
                          "value": res["scaling_efficiency"], "unit": "ratio",
                          "detail": res, "sf": sf}))
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

    def median(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)

    timings = {k: median([r[k] for r in runs]) for k in runs[0]}

    dnn_sec, dnn_meta = run_dnn_tag(spark, max(n_docs // 10, 1000))
    timings["dnn_tag_bilstm"] = dnn_sec
    # the production inference graph, measured next to the native kernel (both run
    # the SAME operator; only the broadcast bytes + per-worker loader differ)
    onnx_sec, onnx_meta = run_dnn_tag(spark, max(n_docs // 10, 1000), backend="onnx")
    timings["dnn_tag_bilstm_onnx"] = onnx_sec

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline_and_dataops_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "raw_runs": runs,
        "repeats": repeats,
        "dnn": dnn_meta,
        "dnn_onnx": onnx_meta,
        "sf": sf,
        "n_docs": n_docs_done,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / timings["kg_triples"], 1),
        "docs_per_sec": round(n_docs_done / timings["kg_triples"], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
