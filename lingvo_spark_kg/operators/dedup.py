"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline dedup family. All variants are built from JVM-side column
expressions / higher-order functions (shingling via split+transform+filter, hashing via
md5 and bit arithmetic) — no Python UDFs — so they whole-stage-codegen, scale linearly,
and each has an exact DuckDB oracle (md5 is engine-portable; xxhash/murmur are not,
which is why md5 is the hash primitive throughout).

Scale shape:
 * exact: one hash-agg shuffle on the 32-char digest (combiner-friendly).
 * minhash-LSH: shingle explode → per-(doc, hashfn) min — map-side combinable agg —
   → band signature → self-join on band value. Join input is (docs × bands), never
   (docs × shingles); bands bound the candidate blow-up.
 * simhash: 64-bit signature from per-shingle md5 bits, weighted majority per bit —
   explode + conditional sums; near-dup = same signature prefix block + hamming ≤ k.
 * n-gram Jaccard: exact verify step over LSH candidates only (never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingles(col: str, n: int = 3):
    """Word n-gram shingles of lower(trim(text)) as an array<string> column, built with
    higher-order functions (no UDF): split → transform(i → words[i..i+n-1] joined)."""
    words = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup groups: md5(lower(trim(text))) → (fp, canonical doc_id, n_dups)."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def shingle_df(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select("doc_id", F.explode(F.array_distinct(_shingles("text", n))).alias("shingle"))


def minhash_signatures(docs: DataFrame, n_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """(doc_id, hash_idx, minhash) — minhash_i = min over shingles of
    md5(i || ':' || shingle). One explode + one map-side-combinable min-agg."""
    sh = shingle_df(docs, shingle_n)
    hashed = sh.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("hash_idx"),
        "shingle",
    ).select(
        "doc_id", "hash_idx",
        F.md5(F.concat(F.col("hash_idx").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "hash_idx").agg(F.min("h").alias("minhash"))


def minhash_bands(docs: DataFrame, n_hashes: int = 8, rows_per_band: int = 2,
                  shingle_n: int = 3) -> DataFrame:
    """(doc_id, band_idx, band_sig): band signature = md5 of the concatenated minhashes
    in the band (classic banding: same band_sig ⇒ LSH candidate pair)."""
    sig = minhash_signatures(docs, n_hashes, shingle_n)
    banded = sig.withColumn("band_idx", (F.col("hash_idx") / rows_per_band).cast("int"))
    return (
        banded.groupBy("doc_id", "band_idx")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash")))).alias("band_sig"))
    )


def minhash_candidates(docs: DataFrame, n_hashes: int = 8, rows_per_band: int = 2,
                       shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b, n_shared_bands) via self-join on band_sig."""
    bands = minhash_bands(docs, n_hashes, rows_per_band, shingle_n)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_sig")
    return (
        a.join(b, ["band_idx", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Exact Jaccard for candidate pairs: two hash joins on shingles + one agg."""
    sh = shingle_df(docs, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b_"), F.col("shingle").alias("shingle_b"))
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("doc_b_")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b", "n_inter",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4).alias("jaccard"),
        )
    )
    return out


def simhash(docs: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """64-bit SimHash per doc from shingle md5 bits: for each bit position, sign of
    (#shingles with bit set − #without); implemented as conditional sums over an
    explode of (shingle, bit) — pure expressions, md5-portable.

    Returns (doc_id, simhash (as 16-hex string), sim_block (prefix for blocking))."""
    sh = shingle_df(docs, 3)
    # 64 bits from the first 16 hex chars of md5(shingle)
    h = sh.select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("hex16"))
    bit_idx = F.explode(F.array(*[F.lit(i) for i in range(16)])).alias("nib_idx")
    nibbles = h.select("doc_id", "hex16", bit_idx).select(
        "doc_id", "nib_idx",
        F.conv(F.substring("hex16", F.col("nib_idx") + 1, 1).cast("string"), 16, 10)
        .cast("int").alias("nib"),
    )
    # per nibble: 4 bits → sum ±1 per bit
    bits = nibbles.select(
        "doc_id", "nib_idx",
        *[
            (F.when(F.shiftright(F.col("nib"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
            for b in range(4)
        ],
    )
    agg = bits.groupBy("doc_id", "nib_idx").agg(
        *[F.sum(f"b{b}").alias(f"s{b}") for b in range(4)]
    )
    nib_val = agg.select(
        "doc_id", "nib_idx",
        sum(
            (F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)))
            for b in range(4)
        ).alias("nib_out"),
    )
    hexed = nib_val.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("nib_idx", "nib_out"))),
                lambda s: F.lpad(F.conv(s["nib_out"].cast("string"), 10, 16), 1, "0"),
            ),
        ).alias("simhash")
    )
    return hexed.select(
        "doc_id", F.lower(F.col("simhash")).alias("simhash"),
        F.substring(F.lower(F.col("simhash")), 1, prefix_bits // 4).alias("sim_block"),
    )
