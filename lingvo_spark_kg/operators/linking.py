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


def mention_pairs(triples: DataFrame) -> DataFrame:
    """One (mention_norm, mention_type) row per subject AND object occurrence, in a
    SINGLE pass over triples: explode(array(...)), NOT a self-union — a union would
    execute the whole upstream triples plan twice (measured 34 s → 12 s for the links
    stage at sf0.1). Shared by batch mention counting and the stateful streaming
    counter so the two can never diverge on what a 'mention' is."""
    return triples.select(
        F.explode(
            F.array(
                F.struct(F.col("subj_norm").alias("mention_norm"),
                         F.col("subj_type").alias("mention_type")),
                F.struct(F.col("obj_norm").alias("mention_norm"),
                         F.col("obj_type").alias("mention_type")),
            )
        ).alias("m")
    ).select("m.mention_norm", "m.mention_type")


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    # count per surface so linking scores can prefer frequent readings and the graph
    # stage can weight nodes; one map-side-combined groupBy shuffle
    return (
        mention_pairs(triples).groupBy("mention_norm", "mention_type")
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
    # the exact pass feeds TWO consumers (linked passthrough + unlinked retry);
    # materialize it once so the mention aggregation shuffle doesn't execute twice —
    # the table is vocabulary-sized (distinct surfaces), not corpus-sized
    exact = link_mentions(mentions, aliases).localCheckpoint()
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


def salted_join(facts: DataFrame, dim: DataFrame, fact_key: str | list[str],
                dim_key: str | list[str], n_salt: int = 16, how: str = "left") -> DataFrame:
    """Shuffle join with key salting (J2): dim explodes ×n_salt, facts pick a
    deterministic pseudo-random salt, join on (keys..., salt). Use when the dim side
    exceeds broadcast budget and the fact keys are Zipf-skewed. Same-named keys on
    both sides are supported: the dim-side duplicates are dropped after the join."""
    fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    dim_keys = [dim_key] if isinstance(dim_key, str) else list(dim_key)
    salted_dim = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    salted_facts = facts.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(k) for k in fact_keys], F.monotonically_increasing_id()),
               F.lit(n_salt)),
    )
    cond = salted_facts["__salt"] == salted_dim["__salt"]
    for fk, dk in zip(fact_keys, dim_keys):
        cond = cond & (salted_facts[fk] == salted_dim[dk])
    out = salted_facts.join(salted_dim, cond, how)
    for fk, dk in zip(fact_keys, dim_keys):
        if fk == dk:
            out = out.drop(salted_dim[dk])
    return out.drop(salted_facts["__salt"]).drop(salted_dim["__salt"])


def dim_join(facts: DataFrame, dim: DataFrame, keys: list[str],
             strategy: str = "auto", n_salt: int = 16) -> DataFrame:
    """Left join of a fact table against a dim keyed by same-named columns, with the
    join strategy as an explicit scale knob:

     * 'auto' (default) — NO join hint: AQE picks broadcast at runtime when the dim's
       actual size is under ``spark.sql.autoBroadcastJoinThreshold`` and falls back to
       a (skew-handled) shuffle join when it isn't. This is the 100 TB-safe default
       for dims that grow with distinct mention surfaces (~10^8 rows at the 10^12-doc
       target, docs/SCALE.md) — an unconditional broadcast of those OOMs executors.
     * 'broadcast' — force the hint (known-small dims only).
     * 'salted' — explicit salting for Zipf-skewed fact keys vs an over-budget dim.
    """
    if strategy == "broadcast":
        return facts.join(F.broadcast(dim), keys, "left")
    if strategy == "salted":
        return salted_join(facts, dim, keys, keys, n_salt=n_salt, how="left")
    return facts.join(dim, keys, "left")


def link_triples(triples: DataFrame, links: DataFrame,
                 strategy: str = "auto", n_salt: int = 16) -> DataFrame:
    """Attach canonical-entity candidates to triple subjects and objects by joining
    the link table twice. The link table scales with distinct mention surfaces, so the
    default strategy is 'auto' (AQE decides broadcast vs shuffle at runtime) — see
    ``dim_join``."""
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
    out = dim_join(triples, subj_l, ["subj_norm", "subj_type"], strategy, n_salt)
    return dim_join(out, obj_l, ["obj_norm", "obj_type"], strategy, n_salt)
