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


def shuffle_corpus(df: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic corpus shuffle (ShuffleAll analog): one range-sort shuffle by a
    seeded random key. (No post-shuffle repartition — round-robin repartitioning would
    discard the seeded order and pay a second shuffle.)"""
    return df.orderBy(F.rand(seed))


def filter_too_long(sentences: DataFrame, max_len: int = 220,
                    tokens_col: str = "tokens") -> DataFrame:
    """Drop sentences longer than the training cap (Corpus.cs:271-274)."""
    return sentences.where(F.size(tokens_col) <= max_len)


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


def length_histogram(sentences: DataFrame, bucket_size: int = 100,
                     tokens_col: str = "tokens") -> DataFrame:
    """Token-length distribution bucketed by //bucket_size (Corpus.cs:246-268)."""
    return (
        sentences.select((F.floor(F.size(tokens_col) / bucket_size)).cast("long").alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).alias("n_sentences"))
        .orderBy("len_bucket")
    )
