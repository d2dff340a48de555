"""Distributed training loop (R2-R6): synchronous data-parallel SGD on Spark.

The reference trains on multiple devices with synchronized weights — every device
computes gradients on its slice, gradients are summed on the default device, one
optimizer step updates all copies (Network/BaseSeq2SeqFramework.cs Train loop;
MultiProcessorNetworkWrapper.cs:58-79 weight sync). The Spark-first shape keeps that
structure with partitions as devices:

  per round: broadcast current weights → each partition buckets its sentences into
  equal-length micro-batches and computes summed NLL + gradient SUMS (model/train.py,
  verified by numerical gradcheck) over its share of the round's batches →
  per-partition results come back small (one grads dict per partition) and are
  reduced → ONE Adam step on the driver (reference kernel semantics: /batchSize,
  ±clip, β=0.9/0.98) → repeat.

DELIBERATE DIVERGENCE from the reference's update cadence: the reference steps its
optimizer once per mini-batch (BaseSeq2SeqFramework Train loop), which is inherently
sequential; a synchronous data-parallel engine steps once per *round* of parallel
batches. ``rounds_per_epoch=1`` (default) is full-batch GD — one step per epoch,
maximally cheap in broadcast/reduce traffic and bit-deterministic; raise
``rounds_per_epoch`` to approach the reference's per-mini-batch dynamics (weights
re-broadcast every round, Adam's bias-correction counts steps = epochs×rounds).
Convergence per epoch improves with more rounds at the cost of rounds× more
broadcast+reduce barriers — the standard large-batch-training trade
(Goyal et al. 2017, arXiv:1706.02677).

R5 (OOM-adaptive batch splitting, BaseSeq2SeqFramework.cs:283-390 TryToSplitBatchFactor
:432-450): a micro-batch that raises MemoryError is recursively halved and retried —
the Spark analog of the reference doubling its batchSplitFactor on CUDA OOM.

R6 (external validator, ModelBuilding PipeIPC ExternalValidator/Program.cs:14-32): a
``validate_fn(model) -> score`` callback runs between epochs; the best-scoring weights
are kept and optionally saved as a reference-format ``.s2s`` file (S9 model sink,
sources/s2s.py) — the in-process seam replacing the reference's subprocess pipe.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..model.bilstm import BiLSTMTaggerModel
from ..model.train import (AdamOptimizer, add_grads, loss_and_grads,
                           transformer_loss_and_grads)
from ..model.transformer import TransformerTaggerModel
from ..model.vocab import UNK_ID


def _model_family(model):
    """(compute_fn, dims) for the model's encoder type — the Spark analog of the
    reference's single EncoderType switch (Applications/Options.cs; ModelBuilding
    ModelBuilder.cs builds either encoder behind one option)."""
    if isinstance(model, TransformerTaggerModel):
        return transformer_loss_and_grads, (model.emb_dim, model.n_heads, model.depth)
    return loss_and_grads, (model.emb_dim, model.hidden_dim, model.depth)


def _clone_with_weights(model, weights):
    """Same architecture + vocab + tags, fresh weight dict (validation candidates
    and the returned best model)."""
    if isinstance(model, TransformerTaggerModel):
        return TransformerTaggerModel(weights, model.src_vocab, model.tgt_tags,
                                      model.emb_dim, model.n_heads, model.depth,
                                      model.max_ending_length, model.max_len)
    return BiLSTMTaggerModel(weights, model.src_vocab, model.tgt_tags,
                             model.emb_dim, model.hidden_dim, model.depth,
                             model.max_ending_length)


def _bucketed_batches(rows: list[tuple[list[int], list[int]]], batch_size: int):
    """Equal-length micro-batches (same bucketing as inference — no pad tokens)."""
    by_len: dict[int, list] = {}
    for ids, tgt in rows:
        if ids:
            by_len.setdefault(len(ids), []).append((ids, tgt))
    for _length, group in sorted(by_len.items()):
        for off in range(0, len(group), batch_size):
            chunk = group[off : off + batch_size]
            yield (np.asarray([c[0] for c in chunk], dtype=np.int64),
                   np.asarray([c[1] for c in chunk], dtype=np.int64))


def _merge_parts(a: tuple, b: tuple) -> tuple:
    """PURE combiner for (cost, n_tok, grads|None) triples — builds a fresh grads
    dict instead of add_grads (which mutates its first argument): a fold must not
    corrupt its input partials (a caller re-folding, or holding a leaf reference,
    would read double-accumulated sums). Elementwise float ADDITION is
    IEEE-commutative, so a single merge is order-safe; it is the GROUPING of merges
    (associativity) that float addition lacks — which is why both reduce modes pin
    the grouping to the same balanced tree (_pairwise_fold) instead of trusting
    arrival order."""
    ga, gb = a[2], b[2]
    if ga is None:
        g = gb
    elif gb is None:
        g = ga
    else:
        g = dict(ga)  # fresh dict: same accumulate semantics as add_grads, no mutation
        for k, v in gb.items():
            g[k] = g.get(k, 0) + v
    return (a[0] + b[0], a[1] + b[1], g)


_TREE_BLOCK = 32  # power of two — aligned blocks keep the distributed fold's first
# log2(block) rounds block-local, bit-identical to the pure driver-side fold


def _pairwise_fold(items: list[tuple]) -> tuple:
    """THE gradient summation tree — a balanced adjacent-pair fold over partials in
    partition-index order (round 1 merges (0,1),(2,3),…; an odd last element carries).
    Both reduce modes use it, so 'collect' and 'tree' produce BIT-IDENTICAL sums:
    merged element j at round r always covers leaves [j·2^r, (j+1)·2^r), so an
    aligned power-of-two block can fold its leaves locally (on an executor) and the
    driver continues the same tree over the block roots — the grouping never depends
    on task scheduling (tests/test_training.py pins the bitwise equality)."""
    if not items:
        return (0.0, 0, None)
    while len(items) > 1:
        nxt = [_merge_parts(items[i], items[i + 1])
               for i in range(0, len(items) - 1, 2)]
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]


def _grads_with_oom_split(compute, weights, dims, ids, tgt):
    """R5: recursively halve a micro-batch that cannot be processed (MemoryError),
    mirroring the reference's batchSplitFactor doubling on OOM."""
    try:
        return compute(weights, *dims, ids, tgt)
    except MemoryError:
        if ids.shape[0] <= 1:
            raise  # a single sentence that OOMs cannot be split further
        half = ids.shape[0] // 2
        c1, g1, n1 = _grads_with_oom_split(compute, weights, dims, ids[:half], tgt[:half])
        c2, g2, n2 = _grads_with_oom_split(compute, weights, dims, ids[half:], tgt[half:])
        return c1 + c2, add_grads(g1, g2), n1 + n2


def train_bilstm_distributed(
    corpus: DataFrame,
    model: BiLSTMTaggerModel | TransformerTaggerModel,
    epochs: int = 3,
    lr: float = 0.01,
    batch_size: int = 64,
    grad_clip: float = 3.0,
    validate_fn=None,
    save_best_path: str | None = None,
    compute_fn=None,
    rounds_per_epoch: int = 1,
    reduce: str = "auto",
    tree_threshold: int = 64,
) -> tuple[BiLSTMTaggerModel, list[dict]]:
    """corpus: (tokens array<string>, labels array<string>) rows — the CoNLL shape
    (sources/conll.py). Returns (best-or-final model, per-epoch history). ``compute_fn``
    is the per-micro-batch loss/grad function (default model/train.loss_and_grads;
    injectable for the OOM-retry test and alternative backends).

    ``rounds_per_epoch``: optimizer steps per epoch (module docstring: 1 = full-batch
    GD; >1 re-broadcasts weights each round and steps Adam per round of parallel
    micro-batches, approaching the reference's per-mini-batch cadence).

    ``reduce``: 'collect' gathers one grads dict per partition to the driver (driver
    memory ~n_partitions × model size — the bound the reference hits too when its
    device count grows, MultiProcessorNetworkWrapper.cs:84-103 sums all device grads
    on the default device); 'tree' folds aligned 32-partition blocks executor-side
    first, so the driver holds only ~n_partitions/32 partials. Both modes sum along
    the SAME balanced partition-index tree (_pairwise_fold), so they are
    bit-identical — pinned in tests/test_training.py. 'auto' (default) picks 'tree'
    above ``tree_threshold`` partitions (docs/SCALE.md driver-memory budget) and
    'collect' below it."""
    from pyspark.sql import functions as F

    spark = corpus.sparkSession
    sc = spark.sparkContext
    family_compute, dims = _model_family(model)
    compute = compute_fn or family_compute
    tag2id = {t: i for i, t in enumerate(model.tgt_tags)}
    w2i = model.src_vocab.word2id

    # fail fast, driver-side, with the offending label named — not as a KeyError
    # buried in an executor traceback after an epoch of compute
    seen = {r[0] for r in corpus.select(F.explode("labels")).distinct().collect()}
    unknown = sorted(seen - set(tag2id))
    if unknown:
        raise ValueError(f"corpus labels not in model.tgt_tags: {unknown[:10]}")

    # encode once: ids via vocab (UNK for OOV — Vocab.cs:177-194)
    encoded = corpus.select("tokens", "labels").rdd.map(
        lambda r: ([w2i.get(t, UNK_ID) for t in r["tokens"]],
                   [tag2id[lb] for lb in r["labels"]])
    ).cache()

    if reduce == "auto":
        reduce = "tree" if encoded.getNumPartitions() > tree_threshold else "collect"
    if reduce not in ("collect", "tree"):
        raise ValueError(f"reduce must be 'auto', 'collect' or 'tree', got {reduce!r}")

    weights = {k: v.copy() for k, v in model.weights.items()}
    opt = AdamOptimizer(grad_clip=grad_clip)
    history: list[dict] = []
    best_score = None
    best_weights = None

    try:
        for epoch in range(epochs):
            cost_e = 0.0
            ntok_e = 0
            for rnd in range(rounds_per_epoch):
                bc = sc.broadcast(weights)

                def part_grads(it, _compute=compute, _dims=dims, _bs=batch_size,
                               _bc=bc, _rnd=rnd, _R=rounds_per_epoch):
                    # ONE float64 cast per partition; loss_and_grads skips re-casting
                    w = {k: np.asarray(v, dtype=np.float64) for k, v in _bc.value.items()}
                    total = None
                    cost = 0.0
                    n_tok = 0
                    for bi, (ids, tgt) in enumerate(_bucketed_batches(list(it), _bs)):
                        if bi % _R != _rnd:  # this round's share of the batches
                            continue
                        c, g, n = _grads_with_oom_split(_compute, w, _dims, ids, tgt)
                        cost += c
                        n_tok += n
                        total = add_grads(total, g)
                    yield (cost, n_tok, total)  # Spark pickles this once

                indexed = encoded.mapPartitionsWithIndex(
                    lambda i, it: ((i, r) for r in part_grads(it))
                )
                if reduce == "tree":
                    # executor-side fold of aligned 32-partition blocks (each block
                    # computes the corresponding SUBTREE of the balanced fold), then
                    # the driver continues the same tree over the ≤n/32 block roots —
                    # deterministic grouping, bit-identical to 'collect'
                    n_parts = encoded.getNumPartitions()
                    blocks = (
                        indexed.map(lambda kv: (kv[0] // _TREE_BLOCK, kv))
                        .groupByKey(numPartitions=max(1, n_parts // _TREE_BLOCK))
                        .mapValues(lambda vals: _pairwise_fold(
                            [r for _i, r in sorted(vals, key=lambda x: x[0])]))
                        .collect()
                    )
                    roots = [r for _b, r in sorted(blocks, key=lambda kv: kv[0])]
                    cost, n_tok, grads = _pairwise_fold(roots)
                else:
                    # driver-side fold of all partials along the same tree (driver
                    # holds n_partitions dicts at the collect — the documented bound)
                    parts = indexed.collect()
                    cost, n_tok, grads = _pairwise_fold(
                        [r for _i, r in sorted(parts, key=lambda p: p[0])])
                bc.destroy()
                if grads is not None:
                    # a round can be legitimately empty (fewer batches than rounds in
                    # every partition) — skip the step, don't advance Adam's counter
                    opt.step(weights, grads, batch_size=n_tok, lr=lr)
                cost_e += cost
                ntok_e += n_tok
            if ntok_e == 0:
                raise ValueError("training corpus is empty")
            cost, n_tok = cost_e, ntok_e

            entry = {"epoch": epoch, "nll_per_token": round(cost / max(n_tok, 1), 6),
                     "n_tokens": n_tok}
            if validate_fn is not None:
                cand = _clone_with_weights(
                    model, {k: v.copy() for k, v in weights.items()})
                score = float(validate_fn(cand))
                entry["val_score"] = score
                if best_score is None or score > best_score:
                    best_score = score
                    best_weights = {k: v.copy() for k, v in weights.items()}
            history.append(entry)
    finally:
        encoded.unpersist()  # also on error paths — a leaked cache pins executor memory

    final_weights = best_weights if best_weights is not None else weights
    out = _clone_with_weights(model, final_weights)
    if save_best_path is not None:
        from ..sources.s2s import from_tagger_model, write_s2s

        with open(save_best_path, "wb") as f:  # S9 model sink: reference .s2s format
            f.write(write_s2s(from_tagger_model(out)))
    return out, history


# the loop trains EITHER encoder type (the model's class selects the kernel —
# _model_family); the historical name predates Transformer training support
train_tagger_distributed = train_bilstm_distributed
