"""Extra benchmarks: noop-sink isolation + plan capture (guide §1.4/§1.5).

NOT part of the frozen driver bench (bench.py). This file exists so optimization
work can time ONE operator at a time (noop sink computes every column and
discards it) and capture ``explain("formatted")`` for the plan evidence in
plans/r08/.

Usage:
    python bench_extra.py headline            # per-query noop timings (sf dir)
    python bench_extra.py dedup               # dedup chain sub-step isolation
    python bench_extra.py graph               # 2M-edge graph one-shots
    python bench_extra.py ann                 # bucket-kernel hof vs arrow
    python bench_extra.py dnn                 # DNN tag throughput isolation
    python bench_extra.py plans               # write plans/r08/<q>_current.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (32),
     SPARK_GRAFT_BENCH_REPEATS (default 3 for headline sections here).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _best(fn, n=2) -> float:
    return min(fn() for _ in range(n))


def _get_spark(cpus: int):
    from lingvo_spark_kg.session import get_spark

    return get_spark(app_name=f"lingvo-kg-bench-extra-{cpus}", cpus=cpus,
                     shuffle_partitions=max(cpus, 8))


def _graph_edges(spark):
    from pyspark.sql import functions as F

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
    return edges


def _graph_tree(spark, edges):
    from pyspark.sql import functions as F

    tree = spark.range(1, 200_000).select(
        F.concat(F.lit("t"), F.col("id")).alias("src_id"),
        F.concat(F.lit("t"), (F.col("id") / 2).cast("long")).alias("dst_id"),
        F.lit("up").alias("pred"), F.lit(1).alias("n_occurrences"))
    edges_t = edges.select(F.col("src_id").cast("string"),
                           F.col("dst_id").cast("string"),
                           "pred", "n_occurrences").unionByName(tree).persist()
    edges_t.count()
    return edges_t


def run_headline(spark, sf_dir: str, reps: int) -> dict:
    import __spark_entry__ as e

    qs = {
        "kg_triples": e.q_kg_triples,
        "minhash_bands": e.q_minhash_bands,
        "neardup_pairs": e.q_neardup_pairs,
        "dedup_survivors": e.q_dedup_survivors,
        "simhash": e.q_simhash,
        "winnow_fp": e.q_winnow_fp,
        "decontaminate": e.q_decontaminate,
        "repetition": e.q_repetition,
        "redact_pii": e.q_redact_pii,
        "curated_docs": e.q_curated_docs,
    }
    out = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"extra:{name}")
        runs = [_noop(fn(spark, sf_dir)) for _ in range(reps)]
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name}: {out[name]}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    return out


def run_dedup(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {}
    sc = spark.sparkContext
    sc.setJobDescription("dedup: shingle scan")
    sh = dedup.shingle_df(d, 3)
    out["shingle_scan"] = _best(lambda: _noop(sh))
    sc.setJobDescription("dedup: wide minhash agg (8x md5 + min)")
    agg = dedup._minhash_wide_agg(sh, 8, "md5")
    out["wide_agg"] = _best(lambda: _noop(agg))
    sc.setJobDescription("dedup: bands")
    bands = dedup.minhash_bands(d, 8, 2)
    out["bands"] = _best(lambda: _noop(bands))
    sc.setJobDescription("dedup: candidates (band self-join)")
    cand = dedup.minhash_candidates(d, 8, 2)
    out["candidates"] = _best(lambda: _noop(cand))
    def timed(build):
        # construction INSIDE the timed region: operators that materialize
        # eagerly (localCheckpoint) must pay their computation here, exactly
        # like bench.py's _time(lambda: q(...).count())
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    sc.setJobDescription("dedup: full neardup_pairs")
    out["neardup_pairs"] = min(timed(lambda: dedup.neardup_pairs(d, 8, 2))
                               for _ in range(2))
    sc.setJobDescription("dedup: survivors (pairs + CC + join)")
    out["survivors"] = min(timed(lambda: dedup.neardup_survivors(
        d, dedup.neardup_pairs(d, 8, 2), threshold=0.7)) for _ in range(2))
    sc.setJobDescription(None)
    for k, v in out.items():
        print(f"{k}: {v}", file=sys.stderr)
    return out


def run_graph(spark) -> dict:
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.graph import (bfs_distances,
                                                 betweenness_centrality,
                                                 label_propagation,
                                                 match_pattern,
                                                 materialize_rules, pagerank,
                                                 shortest_paths,
                                                 triangle_counts)

    edges = _graph_edges(spark)
    edges_t = _graph_tree(spark, edges)
    out = {}
    sc = spark.sparkContext

    def one(name, fn):
        sc.setJobDescription(f"graph:{name}")
        t0 = time.time()
        n = fn()
        out[name] = {"sec": round(time.time() - t0, 3), "n": n}
        print(f"{name}: {out[name]}", file=sys.stderr)

    one("bgp_2hop", lambda: match_pattern(
        edges, [("?a", "p0", "?b"), ("?b", "p1", "?c")]).count())
    one("lpa_3iter", lambda: label_propagation(edges, max_iter=3).count())
    one("bfs_4hop", lambda: bfs_distances(edges, [0], max_hops=4).count())
    one("sssp", lambda: shortest_paths(
        edges, [0], weight_col="n_occurrences").count())
    one("closure_tree200k", lambda: match_pattern(
        edges_t, [("?a", "up+", "t1")]).count())
    one("pagerank10", lambda: pagerank(edges, n_iter=10)
        .agg(F.sum("rank")).collect() and 2_000_000)
    one("triangles", lambda: int(triangle_counts(edges)
                                 .agg(F.sum("n_triangles")).collect()[0][0]))
    one("betweenness_2pivot", lambda: betweenness_centrality(
        edges, n_pivots=2, max_hops=4).agg(F.sum("centrality")).collect()
        and 0)
    one("rules", lambda: materialize_rules(
        edges, [([("?x", "p0", "?y"), ("?y", "p1", "?z")],
                 ("?x", "composed", "?z"))], include_base=False).count())
    edges.unpersist()
    edges_t.unpersist()
    return out


def run_ann(spark) -> dict:
    from pyspark.sql import functions as F

    from lingvo_spark_kg.operators.ann import (_bucket_rows_arrow,
                                               lsh_multitable_topk)

    emb = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(1000 + i) - 0.5 for i in range(64)]).alias("embedding"),
    ).persist()
    emb.count()
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"),
                                              "embedding")
    out = {}
    sc = spark.sparkContext
    sc.setJobDescription("ann: arrow bucket rows only")
    out["bucket_rows_arrow"] = _best(
        lambda: _noop(_bucket_rows_arrow(emb, 64, 6, 16, 42)))
    for impl in ("hof", "arrow"):
        sc.setJobDescription(f"ann: multitable {impl}")
        t0 = time.time()
        lsh_multitable_topk(emb, q, dim=64, k=10, n_tables=16,
                            impl=impl).count()
        out[impl] = round(time.time() - t0, 3)
    emb.unpersist()
    sc.setJobDescription(None)
    for k, v in out.items():
        print(f"{k}: {v}", file=sys.stderr)
    return out


def run_dnn(spark, n_docs: int) -> dict:
    import bench

    out = {}
    for backend in ("numpy", "onnx"):
        sec, meta = bench.run_dnn_tag(spark, n_docs, backend=backend)
        out[backend] = {"sec": sec, **meta}
        print(f"{backend}: {sec}", file=sys.stderr)
    return out


def write_plans(spark, sf_dir: str, suffix: str, names=None) -> None:
    import __spark_entry__ as e

    os.makedirs("plans/r08", exist_ok=True)
    qs = {
        "kg_triples": e.q_kg_triples,
        "minhash_bands": e.q_minhash_bands,
        "neardup_pairs": e.q_neardup_pairs,
        "dedup_survivors": e.q_dedup_survivors,
        "simhash": e.q_simhash,
        "winnow_fp": e.q_winnow_fp,
        "decontaminate": e.q_decontaminate,
        "repetition": e.q_repetition,
        "curated_docs": e.q_curated_docs,
        "ann_topk": e.q_ann_topk,
    }
    for name, fn in qs.items():
        if names and name not in names:
            continue
        df = fn(spark, sf_dir)
        p = f"plans/r08/{name}_{suffix}.txt"
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"wrote {p}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    spark = _get_spark(cpus)
    out: dict = {"section": which}
    if which == "headline":
        out["headline"] = run_headline(spark, sf_dir, reps)
    elif which == "dedup":
        out["dedup"] = run_dedup(spark, sf_dir)
    elif which == "graph":
        out["graph"] = run_graph(spark)
    elif which == "ann":
        out["ann"] = run_ann(spark)
    elif which == "dnn":
        out["dnn"] = run_dnn(spark, 10_000)
    elif which == "plans":
        write_plans(spark, sf_dir, sys.argv[2] if len(sys.argv) > 2 else "current",
                    names=sys.argv[3:] or None)
    else:
        raise SystemExit(f"unknown section {which!r}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
