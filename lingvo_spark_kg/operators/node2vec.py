"""Node-embedding training: skip-gram with negative sampling over the random-walk
pair corpus (DeepWalk, Perozzi et al. 2014 / node2vec, Grover & Leskovec 2016) —
the last hop of the KG → embedding chain: `graph.random_walks` →
`graph.skip_gram_pairs` → THIS → node vectors the existing ANN / embedding-near-dup
operators consume (`operators/ann.py`).

Spark-first shape = the same synchronous data-parallel loop as the tagger trainer
(operators/train_loop.py, reference Train loop analog): per epoch, broadcast the two
embedding matrices → each partition computes summed loss + DENSE gradient matrices
over its (hash-partitioned, sorted) share of the aggregated pair corpus → partials
fold along the SAME balanced partition-index tree (`train_loop._pairwise_fold`, so
the summation grouping never depends on task scheduling — run-to-run bit-identical
at a fixed partitioning) → one reference-Adam step on the driver.

Determinism is end-to-end: the walk corpus is deterministic (random_walks argmin-of-
md5), pair aggregation is exact, NEGATIVE SAMPLES are drawn by a splitmix64 hash of
(seed, center, context, k, epoch) instead of an RNG stream — so a retried partition,
a re-run, or a different executor count at the same partition count produces
bit-identical embeddings. Vocabulary (the node set) is collected to the driver like
`vocab_build`'s top-k — node-vocabulary-bounded, NOT corpus-bounded; the dense
per-partition gradient matrices are model-sized, the same driver/partial budget the
tagger loop documents (docs/SCALE.md). For graphs whose node table outgrows a
broadcast, the documented production path is sharded parameter storage (the
embedding-matrix analog of the pack_contexts shard rule) — out of sandbox scope.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model.train import AdamOptimizer
from .train_loop import _pairwise_fold

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the deterministic 'RNG' behind negative
    sampling (public-domain constants, Steele et al.)."""
    x = (x + _U64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> _U64(31))


def negative_ids(centers: np.ndarray, contexts: np.ndarray, n_neg: int,
                 n_nodes: int, seed: int, epoch: int) -> np.ndarray:
    """(B, n_neg) deterministic negative node indices for each pair."""
    b = centers.shape[0]
    out = np.empty((b, n_neg), dtype=np.int64)
    # scalar mixing in Python ints (numpy warns on uint64 SCALAR overflow even
    # though wrapping is the intent; array ops below wrap silently by design)
    base = _U64((seed * 0x9E3779B97F4A7C15 + epoch * 0xC2B2AE3D27D4EB4F)
                & 0xFFFFFFFFFFFFFFFF)
    c64 = centers.astype(np.uint64)
    x64 = contexts.astype(np.uint64)
    for k in range(n_neg):
        h = _splitmix64((base + c64 * _U64(0x100000001B3)
                         + x64 * _U64(0x1B873593) + _U64(k)) & _MASK)
        out[:, k] = (h % _U64(n_nodes)).astype(np.int64)
    return out


def sg_loss_and_grads(w_in: np.ndarray, w_out: np.ndarray,
                      centers: np.ndarray, contexts: np.ndarray,
                      pair_w: np.ndarray, neg: np.ndarray
                      ) -> tuple[float, dict[str, np.ndarray]]:
    """Skip-gram negative-sampling loss + dense gradients for one pair batch.

    loss = -Σ w·[log σ(u_c·v_x) + Σ_k log σ(-u_c·v_g_k)]  (w = n_pairs weight)

    Stable log-sigmoid via logaddexp; scatter-adds via np.add.at (deterministic
    accumulation order). Gradcheck-gated in tests/test_round6.py."""
    u = w_in[centers]                      # (B, d)
    v = w_out[contexts]                    # (B, d)
    pos = np.sum(u * v, axis=1)
    loss = float(np.sum(pair_w * np.logaddexp(0.0, -pos)))
    g_in = np.zeros_like(w_in)
    g_out = np.zeros_like(w_out)
    coef = pair_w * (1.0 / (1.0 + np.exp(-pos)) - 1.0)   # σ(pos) - 1
    np.add.at(g_in, centers, coef[:, None] * v)
    np.add.at(g_out, contexts, coef[:, None] * u)
    for k in range(neg.shape[1]):
        gk = neg[:, k]
        vn = w_out[gk]
        sc = np.sum(u * vn, axis=1)
        loss += float(np.sum(pair_w * np.logaddexp(0.0, sc)))
        ck = pair_w * (1.0 / (1.0 + np.exp(-sc)))        # σ(sc)
        np.add.at(g_in, centers, ck[:, None] * vn)
        np.add.at(g_out, gk, ck[:, None] * u)
    return loss, {"w_in": g_in, "w_out": g_out}


def train_node_embeddings(pairs: DataFrame, dim: int = 16, epochs: int = 5,
                          lr: float = 0.05, n_neg: int = 3, seed: int = 42,
                          n_partitions: int = 8, grad_clip: float = 3.0
                          ) -> tuple[DataFrame, list[dict]]:
    """skip_gram_pairs output (center_id, context_id, n_pairs) → trained node
    embeddings as (node_id, embedding array<double>) + per-epoch history.

    Full-batch synchronous GD with reference-Adam steps (one per epoch — the
    rounds_per_epoch=1 cadence of the tagger loop, same broadcast/reduce
    barriers); the pair corpus is hash-repartitioned and sorted so partition
    contents and in-partition order are functions of the DATA, not of task
    scheduling, and the partial fold rides the balanced tree — run-to-run
    bit-identical at a fixed ``n_partitions``."""
    spark = pairs.sparkSession
    sc = spark.sparkContext

    nodes = sorted(r[0] for r in
                   pairs.select(F.col("center_id").alias("n")).union(
                       pairs.select("context_id")).distinct().collect())
    if not nodes:
        raise ValueError("empty pair corpus")
    n_nodes = len(nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    b_idx = sc.broadcast(idx)

    enc = (pairs.repartition(n_partitions, "center_id", "context_id")
           .sortWithinPartitions("center_id", "context_id")
           .rdd.map(lambda r: (b_idx.value[r["center_id"]],
                               b_idx.value[r["context_id"]],
                               float(r["n_pairs"])))
           .cache())

    rng = np.random.RandomState(seed)
    weights = {
        "w_in": (rng.rand(n_nodes, dim) - 0.5) / dim,   # word2vec init convention
        "w_out": np.zeros((n_nodes, dim), dtype=np.float64),
    }
    opt = AdamOptimizer(grad_clip=grad_clip)
    history: list[dict] = []
    try:
        for epoch in range(epochs):
            bc = sc.broadcast(weights)

            def part(i, it, _bc=bc, _epoch=epoch, _n=n_nodes, _k=n_neg, _s=seed):
                rows = list(it)
                if not rows:
                    yield (i, (0.0, 0, None))
                    return
                c = np.array([r[0] for r in rows], dtype=np.int64)
                x = np.array([r[1] for r in rows], dtype=np.int64)
                w = np.array([r[2] for r in rows], dtype=np.float64)
                neg = negative_ids(c, x, _k, _n, _s, _epoch)
                loss, g = sg_loss_and_grads(
                    _bc.value["w_in"], _bc.value["w_out"], c, x, w, neg)
                yield (i, (loss, int(np.sum(w)), g))

            parts = enc.mapPartitionsWithIndex(part).collect()
            loss, n_pairs, grads = _pairwise_fold(
                [r for _i, r in sorted(parts, key=lambda p: p[0])])
            bc.destroy()
            if grads is None or n_pairs == 0:
                raise ValueError("pair corpus produced no gradient")
            opt.step(weights, grads, batch_size=n_pairs, lr=lr)
            history.append({"epoch": epoch, "n_pairs": n_pairs,
                            "loss_per_pair": round(loss / n_pairs, 6)})
    finally:
        enc.unpersist()

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    schema = StructType([
        StructField("node_id", pairs.schema["center_id"].dataType),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    emb = spark.createDataFrame(
        [(n, weights["w_in"][i].tolist()) for n, i in idx.items()], schema)
    return emb, history
