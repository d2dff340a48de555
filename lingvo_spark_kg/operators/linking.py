"""Entity linking: mention surfaces vs the alias dictionary.

[KG-new] operators J1/J2 (SURVEY.md §2.6):
 * ``link_mentions`` — broadcast hash join on the normalized surface (small dim side →
   ``F.broadcast``; zero shuffle on the fact side), score = type-match × prior, best
   candidate per mention via max_by aggregation (no window sort, single partial-agg);
 * ``salted_join`` — the skew-defused shuffle-join variant for alias tables too big to
   broadcast: alias rows explode ×N salt, mention rows get ``pmod(hash(...), N)``, the
   join key becomes (key, salt) so one hot key spreads over N reducers. AQE skew-join
   (spark.sql.adaptive.skewJoin.enabled) backstops residual skew.

Mentions are the distinct (norm, type) pairs from triple subjects/objects — dedup
before the join so the join input is bounded by vocabulary, not corpus size; links are
re-attached to triples by a second broadcast join on the (tiny) link table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    # SINGLE pass over triples: subj+obj via explode(array(...)), NOT a self-union —
    # a union would execute the whole upstream triples plan twice (measured 34 s → 12 s
    # for the links stage at sf0.1). Count per surface so linking scores can prefer
    # frequent readings and the graph stage can weight nodes; one map-side-combined
    # groupBy shuffle.
    pairs = triples.select(
        F.explode(
            F.array(
                F.struct(F.col("subj_norm").alias("mention_norm"),
                         F.col("subj_type").alias("mention_type")),
                F.struct(F.col("obj_norm").alias("mention_norm"),
                         F.col("obj_type").alias("mention_type")),
            )
        ).alias("m")
    ).select("m.mention_norm", "m.mention_type")
    return (
        pairs.groupBy("mention_norm", "mention_type")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def link_mentions(mentions: DataFrame, aliases: DataFrame,
                  strategy: str = "broadcast", n_salt: int = 16) -> DataFrame:
    """→ (mention_norm, mention_type, n_mentions, entity_id, entity_type, link_score);
    unlinked mentions kept with null entity_id (left join).

    strategy='broadcast' (default — the alias dictionary is a small dim) or 'salted'
    (J2): when the dictionary exceeds broadcast budget, the shuffle join is salted to
    spread Zipf-head mention keys over ``n_salt`` reducers."""
    if strategy == "salted":
        cand = salted_join(mentions, aliases, "mention_norm", "alias_norm",
                           n_salt=n_salt, how="left").select(
            "mention_norm", "mention_type", "n_mentions", "entity_id", "entity_type", "prior",
        )
    else:
        cand = mentions.join(
            F.broadcast(aliases), mentions.mention_norm == aliases.alias_norm, "left"
        ).select(
            "mention_norm", "mention_type", "n_mentions", "entity_id", "entity_type", "prior",
        )
    scored = cand.withColumn(
        "link_score",
        F.when(F.col("entity_id").isNull(), F.lit(None).cast("double")).otherwise(
            F.col("prior") * F.when(F.col("mention_type") == F.col("entity_type"), 1.0)
            .otherwise(0.25)
        ),
    )
    # deterministic best candidate: max (score, entity_id) pair per mention
    pick = F.max(F.struct("link_score", "entity_id", "entity_type")).alias("best")
    best = scored.groupBy("mention_norm", "mention_type", "n_mentions").agg(pick)
    return best.select(
        "mention_norm", "mention_type", "n_mentions",
        F.col("best.entity_id").alias("entity_id"),
        F.col("best.entity_type").alias("entity_type"),
        F.col("best.link_score").alias("link_score"),
    )


def _stem(col):
    """Crude Russian case-ending stem (shared with canonicalization blocking)."""
    last = F.element_at(F.split(col, " "), -1)
    stem = F.regexp_replace(last, "[аеиоуыэюяй]{1,3}$", "")
    return F.when(F.length(stem) >= 4, stem).otherwise(last)


def link_mentions_fuzzy(mentions: DataFrame, aliases: DataFrame,
                        min_sim: float = 0.72) -> DataFrame:
    """Two-pass linking: exact broadcast join first, then a stem-block fallback for
    mentions the exact pass left unlinked — catches case-inflected surfaces
    ("козлову" → alias "козлов") that exact keys miss. The fallback joins on
    (entity_type-compatible) stem blocks and scores candidates JVM-side with
    1 − levenshtein/len (no Python), keeping the best above ``min_sim``."""
    exact = link_mentions(mentions, aliases)
    unlinked = exact.where(F.col("entity_id").isNull()).select(
        "mention_norm", "mention_type", "n_mentions"
    )
    linked = exact.where(F.col("entity_id").isNotNull())

    cand = unlinked.withColumn("mstem", _stem(F.col("mention_norm"))).join(
        F.broadcast(aliases.withColumn("astem", _stem(F.col("alias_norm")))),
        F.col("mstem") == F.col("astem"),
        "left",
    )
    lev = F.levenshtein(F.col("mention_norm"), F.col("alias_norm"))
    maxlen = F.greatest(F.length("mention_norm"), F.length("alias_norm"))
    sim = F.lit(1.0) - lev / maxlen
    scored = cand.withColumn(
        "link_score",
        F.when(F.col("entity_id").isNull() | (sim < min_sim), F.lit(None).cast("double"))
        .otherwise(
            F.round(sim * F.col("prior")
                    * F.when(F.col("mention_type") == F.col("entity_type"), 1.0).otherwise(0.25), 6)
        ),
    )
    pick = F.max(F.struct("link_score", "entity_id", "entity_type")).alias("best")
    best = scored.groupBy("mention_norm", "mention_type", "n_mentions").agg(pick)
    fallback = best.select(
        "mention_norm", "mention_type", "n_mentions",
        F.when(F.col("best.link_score").isNotNull(), F.col("best.entity_id")).alias("entity_id"),
        F.when(F.col("best.link_score").isNotNull(), F.col("best.entity_type")).alias("entity_type"),
        F.col("best.link_score").alias("link_score"),
    )
    return linked.unionByName(fallback)


def salted_join(facts: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
                n_salt: int = 16, how: str = "left") -> DataFrame:
    """Shuffle join with key salting (J2): dim explodes ×n_salt, facts pick a
    deterministic pseudo-random salt, join on (key, salt). Use when the dim side
    exceeds broadcast budget and the fact keys are Zipf-skewed."""
    salted_dim = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.hash(F.col(fact_key), F.monotonically_increasing_id()), F.lit(n_salt))
    )
    out = salted_facts.join(
        salted_dim,
        (salted_facts[fact_key] == salted_dim[dim_key]) & (salted_facts["__salt"] == salted_dim["__salt"]),
        how,
    )
    return out.drop("__salt")


def link_triples(triples: DataFrame, links: DataFrame) -> DataFrame:
    """Attach canonical-entity candidates to triple subjects and objects via two
    broadcast joins on the small link table."""
    subj_l = links.select(
        F.col("mention_norm").alias("subj_norm"),
        F.col("mention_type").alias("subj_type"),
        F.col("entity_id").alias("subj_entity_id"),
    )
    obj_l = links.select(
        F.col("mention_norm").alias("obj_norm"),
        F.col("mention_type").alias("obj_type"),
        F.col("entity_id").alias("obj_entity_id"),
    )
    return (
        triples.join(F.broadcast(subj_l), ["subj_norm", "subj_type"], "left")
        .join(F.broadcast(obj_l), ["obj_norm", "obj_type"], "left")
    )
