"""Training-corpus operators: shuffle, length filter, train/valid split (S4, R7).

The reference shuffles its corpus by Fisher-Yates over a byte-offset map and rewrites
temp files, dropping too-long sentences (Corpus.cs:195-319 ShuffleAll; cap
MaxTrainSentLength=220, Options.cs:31-32; token-length histogram during shuffle,
Corpus.cs:246-268). On Spark all three are declarative one-liners — the shuffle IS the
engine primitive — so this module exists mostly to give the reference operators their
explicit, tested Spark names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import WS_SPLIT


def shuffle_corpus(df: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic corpus shuffle (ShuffleAll analog): one range-sort shuffle by a
    seeded random key. (No post-shuffle repartition — round-robin repartitioning would
    discard the seeded order and pay a second shuffle.)"""
    return df.orderBy(F.rand(seed))


def filter_too_long(sentences: DataFrame, max_len: int = 220,
                    tokens_col: str = "tokens") -> DataFrame:
    """Drop sentences longer than the training cap (Corpus.cs:271-274)."""
    return sentences.where(F.size(tokens_col) <= max_len)


def hash_sample(df: DataFrame, rate: float, key: str = "doc_id",
                seed: int = 42) -> DataFrame:
    """Deterministic rate-based sample: keep rows whose md5(key:seed) prefix falls
    under the rate threshold — the corpus-mixing primitive (sampling each source at
    its mix weight). Unlike ``df.sample``, membership is a pure function of the key:
    stable under reruns, repartitioning and incremental appends (a doc keeps its
    fate when the corpus grows), and exactly mirrorable by any engine with md5
    (string comparison on the first 8 hex chars ≈ uniform in [0,1) at 2^-32
    granularity). Different seeds draw independent samples."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    h = F.substring(F.md5(F.concat(F.col(key).cast("string"),
                                   F.lit(f":{seed}"))), 1, 8)
    return (df.where(h < F.lit(hash_sample_threshold(rate)))
            if rate < 1.0 else df)


def hash_sample_threshold(rate: float) -> str:
    """The md5-prefix threshold string for a sampling rate — THE single copy of the
    formula (hash_sample / stratified_hash_sample / the DuckDB oracle generators in
    __spark_entry__ all delegate here, so the two engines cannot drift).

    rate 1.0 → a sentinel ABOVE every hex prefix ('g' > 'f'): the strict `<` must
    keep all rows, matching hash_sample's keep-everything fast path (clamping to
    'ffffffff' would drop the ~2^-32 keys hashing to exactly it)."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def stratified_hash_sample(df: DataFrame, rates: dict[str, float], group_col: str,
                           key: str = "doc_id", seed: int = 42,
                           default_rate: float = 0.0) -> DataFrame:
    """Per-group deterministic sampling — the corpus-MIXING primitive: each source /
    domain / language stratum sampled at its own mix weight in ONE scan. Membership
    is the same pure md5(key:seed) function as ``hash_sample`` (stable under reruns,
    repartitioning and incremental appends — a doc keeps its fate when the corpus
    grows), and the per-group threshold is a CASE column expression over the small
    ``rates`` dict — no join, no second scan, fully codegen'd. Groups absent from
    ``rates`` fall back to ``default_rate`` (0.0 = dropped — the allowlist shape a
    mixing config usually wants)."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for group {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")

    thresh = F.lit(hash_sample_threshold(default_rate))
    for g, r in sorted(rates.items()):
        thresh = F.when(F.col(group_col) == g,
                        F.lit(hash_sample_threshold(r))).otherwise(thresh)
    h = F.substring(F.md5(F.concat(F.col(key).cast("string"),
                                   F.lit(f":{seed}"))), 1, 8)
    # sentinel groups keep every row unconditionally — including NULL-keyed rows,
    # which hash to NULL and would otherwise fail the strict `<` exactly where
    # hash_sample's rate-1.0 fast path keeps them
    return df.where((thresh == "g") | (h < thresh))


def train_valid_split(df: DataFrame, valid_fraction: float = 0.1,
                      seed: int = 42, key: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Deterministic hash split on (key, seed) (CorpusCorrector's split analog,
    ModelBuilding/.../CorpusCorrector/Program.cs): stable under reruns/partitioning
    because it derives from the key, not from row order; different seeds give
    different folds."""
    bucket = F.pmod(F.hash(F.col(key), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    valid = df.where(bucket < valid_fraction)
    train = df.where(bucket >= valid_fraction)
    return train, valid


def _vocab_topk(docs: DataFrame, cap: int, text_col: str) -> DataFrame:
    """Top-``cap`` tokens by (freq desc, token asc): groupBy count (map-side combined)
    + orderBy().limit(), which Spark executes as TakeOrderedAndProject — per-partition
    top-K heaps merged on the driver. Deliberately NOT row_number over a global Window:
    a partition-less Window moves EVERY distinct token's count row onto one task (~10^8
    rows at the 10^12-doc target — the straggler/OOM pattern VERDICT r2 flagged), while
    TakeOrdered ships only cap rows per partition. Split out so the plan is testable
    (tests/test_plans.py pins TakeOrderedAndProject and the absence of Window)."""
    toks = docs.select(F.explode(F.split(F.trim(F.col(text_col)), WS_SPLIT)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("token")).limit(cap)


def build_vocab_df(docs: DataFrame, cap: int = 200, text_col: str = "text",
                   start_id: int = 3) -> DataFrame:
    """R1 vocab build (CorpusBatch.cs:98-221 freq-desc capped; ids from
    START_MEANING_INDEX=3, Vocab.cs:14-27) → (token, cnt, vocab_id). Rank assignment
    happens driver-side over the ≤cap collected rows (TakeOrderedAndProject returns
    them already sorted) — cap is small by contract (reference default 50k,
    Options.cs:72), so this is a bounded, deliberate driver step, not a hidden
    global sort."""
    import pandas as pd

    rows = _vocab_topk(docs, cap, text_col).collect()
    pdf = pd.DataFrame({
        "token": [r["token"] for r in rows],
        "cnt": [r["cnt"] for r in rows],
        "vocab_id": [start_id + i for i in range(len(rows))],
    })
    return docs.sparkSession.createDataFrame(
        pdf, schema="token string, cnt long, vocab_id long")


def length_histogram(sentences: DataFrame, bucket_size: int = 100,
                     tokens_col: str = "tokens") -> DataFrame:
    """Token-length distribution bucketed by //bucket_size (Corpus.cs:246-268)."""
    return (
        sentences.select((F.floor(F.size(tokens_col) / bucket_size)).cast("long").alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).alias("n_sentences"))
        .orderBy("len_bucket")
    )


ROWS_PER_PACK_SHARD = 10_000_000  # auto-shard sizing: one shard task sorts+cumsums
# this many (key, count) rows ≈ hundreds of MB — the documented "shards scale with
# the corpus" rule, enforced by code when n_shards=None


def _is_cheap_scan(df: DataFrame) -> bool:
    """True when every node of the analyzed logical plan is scan-shaped
    (Relation/Project/Filter/alias) — running the plan twice then costs one extra
    metadata-or-pruned read, not a recompute. Anything else (joins, aggregates,
    Python stages, repartitions) is treated as derived and worth persisting before
    a count()+window double execution."""
    cheap = ("Relation", "Project", "Filter", "SubqueryAlias", "View",
             "LogicalRDD", "LocalRelation")
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        node = line.lstrip(" :+-")
        if node and not node.startswith(cheap):
            return False
    return True


def pack_contexts(docs: DataFrame, budget: int = 2048, n_shards: int | None = 8,
                  key: str = "doc_id", n_tokens_col=None) -> DataFrame:
    """GPT-style context packing — the pretraining sequence-packing primitive:
    documents are concatenated in a deterministic order and cut into fixed
    ``budget``-token contexts; each doc row gets its context assignment →
    (key, shard, n_tokens, ctx_offset, ctx_id, ctx_end_id, straddles).

    Distribution shape: ``n_shards`` independent packing streams. For an integral
    ``key`` the shard is pmod(key, n_shards); for a string key (the 'doc-00000042'
    shape most operators use) it is the engine-portable md5-prefix hash
    pmod(conv(md5(key)[1:15], 16, 10), n_shards) — any other column type raises
    TypeError driver-side rather than Spark's silent cast-to-null. Each stream is
    ONE window partition — i.e. one task sorts and cumsums that shard — so n_shards
    must scale with the CORPUS, not the core count. ``n_shards=None`` enforces that
    rule by deriving it from a count() (derived inputs are auto-persisted first so
    the upstream plan runs once): ceil(corpus_rows / ROWS_PER_PACK_SHARD)
    (a shard row is just key+count, so 10^7 rows ≈ hundreds of MB per task) — at
    10^12 docs that is ~10^5 shards, far more parallelism than any cluster's cores,
    while the packing semantics are unaffected because shards are independent
    streams exactly like parallel pretraining data shards. Within a shard docs are
    ordered by key (deterministic under reruns/repartitioning).
    ``ctx_id`` = floor(offset/budget) of the doc's first
    token; ``ctx_end_id`` the context of its LAST token (= ctx_id for zero-token
    docs, which therefore never straddle); ``straddles`` marks docs cut by a context
    boundary (the concat-and-chunk regime: boundaries fall mid-document by design,
    no padding waste). ONE window shuffle; every expression is engine-portable (SQL
    oracle in __spark_entry__).

    ``key`` must be a UNIQUE row key (doc_id): the cumsum uses an explicit ROWS
    frame, so duplicate keys still yield consistent per-shard token accounting
    (offsets are a permutation of the stream), but their relative order — and hence
    which duplicate straddles a boundary — follows partition order. The default
    RANGE frame would be outright wrong under ties: every peer row would get the
    same cumsum, so contexts would overlap."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    key_type = docs.schema[key].dataType
    if not isinstance(key_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                                 T.StringType)):
        raise TypeError(
            f"pack_contexts key {key!r} must be an integral or string column, got "
            f"{key_type.simpleString()} (other types would shard via Spark's silent "
            "cast-to-null)")
    if n_shards is None:
        # count() executes the full upstream plan once (cheap only when docs is a
        # bare/pruned table scan, where it reduces to parquet row-count metadata)
        # and the window job below re-executes it — so a DERIVED frame is persisted
        # first: the count materializes the cache and the window job reads it
        # (caller unpersists when done; pass an explicit n_shards to opt out).
        if not _is_cheap_scan(docs):
            from pyspark import StorageLevel

            docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
        n_shards = max(1, -(-docs.count() // ROWS_PER_PACK_SHARD))
    if isinstance(key_type, T.StringType):
        # engine-portable 60-bit md5 prefix (DuckDB mirror: md5 + from-hex), NOT
        # F.hash/xxhash64 — those have no cross-engine twin for the oracle
        shard = F.pmod(F.conv(F.substring(F.md5(F.col(key)), 1, 15), 16, 10)
                       .cast("long"), F.lit(n_shards))
    else:
        shard = F.pmod(F.col(key), F.lit(n_shards))
    nt = n_tokens_col if n_tokens_col is not None else F.size(
        F.split(F.trim(F.col("text")), WS_SPLIT))
    d = docs.select(F.col(key), shard.alias("shard"),
                    nt.cast("long").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    last_tok = offset + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    d = d.select(
        key, "shard", "n_tokens",
        offset.alias("ctx_offset"),
        F.floor(offset / budget).cast("long").alias("ctx_id"),
        F.floor(last_tok / budget).cast("long").alias("ctx_end_id"),
    )
    return d.withColumn("straddles",
                        (F.col("ctx_id") != F.col("ctx_end_id")).cast("int"))
