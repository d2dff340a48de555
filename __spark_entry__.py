"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG extraction (docs → triples) at sf0.001.
``queries`` exposes one entry per implemented operator family (SURVEY.md §2 + the
training-data-pipeline extensions); ``oracle_sql`` gives a DuckDB oracle for EVERY
query: relationally-expressible ones as equivalent SQL over the shared parquet views
(md5 is the hash primitive everywhere precisely because it is engine-portable), and
the tokenizer/tagger/KG queries (per-sentence state machines, NumPy decode, iterative
CC — not expressible as one SQL statement) as ``read_parquet`` over single-node
pure-Python golden tables materialized by lingvo_spark_kg/golden.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# engine-portable whitespace class (Java \s includes \x0B, RE2's does not) — same
# literal as lingvo_spark_kg.operators.textstats.WS_SPLIT, inlined here because this
# module keeps package imports inside functions (the driver may import it before the
# repo root is on sys.path); tests pin the two stay equal
WS_SPLIT = "[ \t\n\r\f\x0B]+"

SF_DEFAULT = "/root/testdata/sf0.001"


def _n_docs_for(sf_dir: str) -> int:
    """Deterministic synthetic-corpus size per scale factor: sf × 1M docs
    (sf0.001 → 1k, sf0.01 → 10k, sf0.1 → 100k) — matches TESTDATA's t1/t2/bench tiers.
    The interleaved-span `docs` table (BASELINE.json input_hint) does not exist in the
    driver testdata, so the KG queries synthesize it deterministically (seed=42), as the
    round spec directs; flat-table queries below use the driver parquet directly.
    Delegates to golden.n_docs_for — ONE sizing rule for Spark queries and mirrors
    (a drift would compare differently-sized corpora)."""
    from lingvo_spark_kg.golden import n_docs_for

    return n_docs_for(sf_dir)


_DOCS_CACHE: dict = {}
_TRIPLES_CACHE: dict = {}
_GAZ_CACHE: dict = {}
_ALIASES_CACHE: dict = {}


def _synthetic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.docsgen import generate_docs

    key = (spark.sparkContext.applicationId, _n_docs_for(sf_dir))
    df = _DOCS_CACHE.get(key)
    if df is None:
        df = generate_docs(spark, _n_docs_for(sf_dir), seed=42).persist()
        _DOCS_CACHE[key] = df
    return df


def _synthetic_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared, materialized triples frame: several queries consume the same
    deterministic corpus; without the cut each would re-run the whole extraction."""
    from lingvo_spark_kg.operators.triples import docs_to_triples_fused

    key = (spark.sparkContext.applicationId, _n_docs_for(sf_dir))
    df = _TRIPLES_CACHE.get(key)
    if df is None:
        df = docs_to_triples_fused(_synthetic_docs(spark, sf_dir), _gaz_bc(spark)).localCheckpoint()
        _TRIPLES_CACHE[key] = df
    return df


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _gaz_bc(spark: SparkSession):
    """One gazetteer broadcast per application (same (applicationId)-keyed pattern as
    _DOCS_CACHE): eight queries consume it — rebuilding the 5k-entity dictionary and
    shipping a fresh broadcast per call is repeated driver work and leaked broadcast
    files."""
    from lingvo_spark_kg.fixtures.corpus import gazetteer_from_aliases, make_aliases

    key = spark.sparkContext.applicationId
    bc = _GAZ_CACHE.get(key)
    if bc is None:
        bc = spark.sparkContext.broadcast(gazetteer_from_aliases(make_aliases(seed=42)))
        _GAZ_CACHE[key] = bc
    return bc


def _aliases_df(spark: SparkSession) -> DataFrame:
    import pandas as _pd

    from lingvo_spark_kg.fixtures.corpus import make_aliases
    from lingvo_spark_kg.operators.schemas import ALIASES_SCHEMA

    key = spark.sparkContext.applicationId
    df = _ALIASES_CACHE.get(key)
    if df is None:
        df = spark.createDataFrame(_pd.DataFrame(make_aliases(seed=42)),
                                   schema=ALIASES_SCHEMA)
        _ALIASES_CACHE[key] = df
    return df


# ---------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved docs → (subj, pred, obj) triples, fused single-pass."""
    from lingvo_spark_kg.operators.triples import docs_to_triples_fused

    docs = _synthetic_docs(spark, SF_DEFAULT)
    return docs_to_triples_fused(docs, _gaz_bc(spark))


# ---------------------------------------------------------------- queries
def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _synthetic_triples(spark, sf_dir)
    return t.select("doc_id", "span_idx", "sent_idx", "subj", "pred", "obj",
                    "subj_type", "obj_type", "confidence")


def q_kg_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    docs = docs_from_documents_table(spark, sf_dir)
    s = tokenize_docs(docs)
    return s.select(
        "doc_id", "span_idx", "sent_idx", "sent_start", "sent_len",
        F.size("tokens").cast("long").alias("n_tokens"),
    )


def q_kg_sentences_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 hard signal: the FULL rule-cascade sentence splitter (sentsplit_full.py —
    bracket/quote nesting, abbreviation n-grams, three-dots, list markers; reference
    SentSplitter.cs:254-528, IsEndOfSentTDQMEP :1240-1310) run distributed via
    tokenize_docs(sent_mode='full') over the SYNTHETIC corpus, whose pool carries the
    material the cascade branches on (10 of 40 pool sentences split differently from
    simple mode — golden._sentences_full_rows)."""
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    s = tokenize_docs(_synthetic_docs(spark, sf_dir), sent_mode="full")
    return s.select(
        "doc_id", "span_idx", "sent_idx", "sent_start", "sent_len",
        F.size("tokens").cast("long").alias("n_tokens"),
    )


def q_tag_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13 hard signal: BiLSTM tagging of ONLY the >220-token sentences of the
    synthetic corpus (fixtures.corpus.long_sentence seeds them at ~0.5% of text
    spans) — the reference chunking semantics (>220 → chunked decode, ≤10%-overflow
    truncated, SeqLabel.cs:259-311; threshold Options.cs:31) execute inside a
    driver-oracle row instead of only in boundary unit tests. The length filter is a
    JVM-side prune BEFORE the DNN operator, so the expensive decode runs on exactly
    the chunking rows."""
    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.operators.tag import tag_sentences_bilstm
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    pos_m, ner_m = pinned_tagger_models()
    pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
    sents = tokenize_docs(_synthetic_docs(spark, sf_dir))
    long_sents = sents.where(F.size("tokens") > 220)
    tagged = tag_sentences_bilstm(long_sents, pos_bc, ner_bc)
    return tagged.select(
        "doc_id", "span_idx", "sent_idx",
        F.posexplode(F.arrays_zip("pos_tags", "ner_tags")).alias("tok_idx", "tags"),
    ).select("doc_id", "span_idx", "sent_idx", "tok_idx",
             F.col("tags.pos_tags").alias("pos_tag"), F.col("tags.ner_tags").alias("ner_tag"))


def q_result_vm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/T11 hard signal: the reference web-service ResultVM output shape
    (WebService/Models/VM.cs:22-46) flattened to scalar rows — Word is the ORIGINAL
    surface (coalesce(orig, value): NUM placeholders and canonicalized punctuation
    recover their input text, GetOriginalValue Tokenizer.cs:1347-1354), Label the
    corrected POS tag."""
    from lingvo_spark_kg.operators.tag import as_result_vm, tag_sentences_lexicon
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    docs = _synthetic_docs(spark, sf_dir)
    tagged = tag_sentences_lexicon(tokenize_docs(docs), _gaz_bc(spark))
    vm = as_result_vm(tagged, tag_col="pos_tags")
    return vm.select(
        "doc_id", "span_idx", "sent_idx",
        F.posexplode("tuples").alias("tok_idx", "t"),
    ).select("doc_id", "span_idx", "sent_idx", "tok_idx",
             F.col("t.Word").alias("Word"), F.col("t.Label").alias("Label"))


def q_kg_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators import linking

    triples = _synthetic_triples(spark, sf_dir)
    return linking.link_mentions(linking.mentions_from_triples(triples), _aliases_df(spark))


def q_kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators import canonicalize, linking

    triples = _synthetic_triples(spark, sf_dir)
    links = linking.link_mentions(linking.mentions_from_triples(triples), _aliases_df(spark))
    return canonicalize.canonical_map(links)


def q_kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full graph materialization: triples → links → canonical map → aggregated,
    bucketed edges table (S11 + J5)."""
    from lingvo_spark_kg.operators import canonicalize, graph, linking

    triples = _synthetic_triples(spark, sf_dir)
    links = linking.link_mentions(linking.mentions_from_triples(triples),
                                  _aliases_df(spark))
    canon = canonicalize.canonical_map(links).localCheckpoint()
    linked = linking.link_triples(triples, links)
    # bucket is a storage-layout column (hash-partitioned writer detail), not query
    # semantics — excluded from the oracle comparison
    return graph.build_edges_table(linked, canon).select(
        "src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
        "n_docs", "example_doc_id",
    )


def q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 node table: canonical map → nodes(canonical_id, label, node_type,
    n_mentions, n_surfaces, entity_id) via graph.build_nodes — label/node_type from
    the max-(n_mentions, norm, type) struct (the dominant surface), entity_id the
    component min-anchor. Oracle = pure SQL aggregation over the kg_canonical
    golden (the bucket layout column is excluded, as in kg_edges)."""
    from lingvo_spark_kg.operators import canonicalize, graph, linking

    triples = _synthetic_triples(spark, sf_dir)
    links = linking.link_mentions(linking.mentions_from_triples(triples),
                                  _aliases_df(spark))
    canon = canonicalize.canonical_map(links)
    return graph.build_nodes(canon).select(
        "canonical_id", "label", "node_type",
        F.col("n_mentions").cast("long").alias("n_mentions"),
        F.col("n_surfaces").cast("long").alias("n_surfaces"), "entity_id")


def q_kg_edges_dnn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL graph materialization driven by the DNN regimen instead of the
    lexicon: tokenize → BiLSTM POS+NER (the TRAINED demo pair, model/demo.py —
    reproduces the lexicon regimen, held-out agreement 1.0) → triple templates →
    linking → CC → edge aggregation. Its oracle is the SAME golden kg_edges parquet
    the lexicon path is checked against, so a green row proves the DNN end-to-end
    path — model broadcast, chunked decode, output-type correction, every downstream
    join/agg — lands on bit-identical edges (the north-star regimen,
    pos_tagger_ru_settings.json:10-75)."""
    from lingvo_spark_kg.model.demo import demo_tagger_models
    from lingvo_spark_kg.operators import canonicalize, graph, linking
    from lingvo_spark_kg.operators.tag import tag_sentences_bilstm_dedup
    from lingvo_spark_kg.operators.tokenize import tokenize_docs
    from lingvo_spark_kg.operators.triples import extract_triples_df

    pos_m, ner_m = demo_tagger_models()
    pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
    # materialize sentences before the dedup decode: the distinct dim and the
    # instance side both read it, and an un-materialized frame would re-run the
    # tokenizer on each join side (the pipeline gets this for free from its
    # written sentences stage)
    sents = tokenize_docs(_synthetic_docs(spark, sf_dir)).localCheckpoint()
    # corpus-global dedup decode (result-identical to per-instance decode, pinned
    # in tests) — also exercises the production tagged-stage shape in the gate
    triples = extract_triples_df(
        tag_sentences_bilstm_dedup(sents, pos_bc, ner_bc)).localCheckpoint()
    links = linking.link_mentions(linking.mentions_from_triples(triples),
                                  _aliases_df(spark))
    canon = canonicalize.canonical_map(links).localCheckpoint()
    linked = linking.link_triples(triples, links)
    return graph.build_edges_table(linked, canon).select(
        "src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
        "n_docs", "example_doc_id",
    )


def q_kg_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph local-structure analytics over the materialized edges, two arms
    under one variant column (50-row driver cap):

    - ``bucket``: weighted node degree → log2-bucketed histogram
      (graph.degree_stats) — the power-law summary a KG curation pass reads
      before hub cuts. Oracle = the pure-Python golden mirror (unchanged).
    - ``triangle``: per-node triangle participation counts
      (graph.triangle_counts, degree-ordered wedge closing) — the local-density
      signal separating organically-connected neighborhoods from star-shaped
      extraction noise. Oracle = a brute-force ordered-triple self-join in plain
      SQL over the golden edges parquet (engine-vs-engine; any strict total
      order enumerates the same triangles, so collation cannot drift).

    The edges frame is lazily localCheckpoint-ed so the extraction pipeline
    runs once and both arms read the materialized RDD."""
    from lingvo_spark_kg.operators import graph

    edges = q_kg_edges(spark, sf_dir).localCheckpoint(eager=False)
    null_l = F.lit(None).cast("long")
    buckets = graph.degree_stats(edges).select(
        F.lit("bucket").alias("variant"), "degree_bucket", "n_nodes",
        "max_degree", F.lit(None).cast("string").alias("node_id"),
        null_l.alias("n_triangles"))
    tri = graph.triangle_counts(edges).select(
        F.lit("triangle").alias("variant"), null_l.alias("degree_bucket"),
        null_l.alias("n_nodes"), null_l.alias("max_degree"),
        "node_id", "n_triangles")
    return buckets.unionByName(tri)


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the materialized edges table (graph.pagerank: 20
    fixed power iterations, damping 0.85, dangling mass spread uniformly,
    localCheckpoint lineage truncation) — node-importance analytics next to
    degree_stats. Oracle = the SAME recurrence unrolled as a 20-stage CTE chain
    in DuckDB over the golden edges (engine-vs-engine on the iteration itself);
    rank is emitted in integer nano-units so the cross-engine hash compares the
    doubles exactly (accumulated sum-order drift ~1e-14 ≪ the 1e-9 grid)."""
    from lingvo_spark_kg.operators.graph import pagerank

    pr = pagerank(q_kg_edges(spark, sf_dir), damping=0.85, n_iter=20)
    return pr.select(
        "node_id",
        F.round(F.col("rank") * F.lit(1e9)).cast("long").alias("rank_e9"))


def q_kg_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop predicate-path mining over the materialized edges table
    (graph.predicate_paths): one self-equi-join keyed on the mid entity + one
    hash aggregate per predicate bigram, round-trip cycles excluded — the
    relation-template discovery pass next to pagerank/degree_stats. Oracle =
    the same self-join in plain SQL over the golden edges parquet."""
    from lingvo_spark_kg.operators.graph import predicate_paths

    return predicate_paths(q_kg_edges(spark, sf_dir), include_cycles=False)


def q_kg_graph_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph-QUERY layer (graph.match_pattern — SPARQL-style BGP matching
    with property paths incl. negated sets, OPTIONAL/UNION/MINUS, FILTER,
    EXISTS, BIND and the solution modifiers, plus the generation-diff audit
    read) as ONE driver row, twenty-three arms under a variant column (50-row
    cap), every arm checked against the same algebra lowered to
    plain/recursive SQL over the golden edges parquet:

    - ``bgp2``: 2-hop constant-pred BGP (two patterns, one mid-keyed join;
      compiled with ``stats=True`` so the selectivity-aware order runs in the
      gated path) vs a SQL self-join.
    - ``closure``/``star``: ``p+`` / ``p*`` property paths vs a recursive CTE
      (∪ the node identity for ``*`` — zero-or-more).
    - ``inverse``: ``^p`` vs the swapped scan.
    - ``optional``: an OPTIONAL group vs LEFT JOIN (NULL-on-unmatched).
    - ``alt``/``seq``: ``p|q`` bag union / ``p/p`` sequence vs IN-scan / join.
    - ``filter``: FILTER over bound variables vs WHERE.
    - ``union``: a UNION branch binding a DIFFERENT variable (NULL-padded bag
      merge) vs the same NULL-padded UNION ALL.
    - ``minus``: MINUS on the shared subject vs NOT EXISTS.
    - ``values``: SPARQL VALUES — the two smallest subjects of the top
      predicate (computed identically both sides) inlined as bindings vs the
      same IN-subquery.
    - ``nps``/``npsmix``: negated property sets — ``!p1`` (the complement
      scan) and ``!(p1|^p2)`` (forward complement ∪ swapped complement, the
      spec's NPS translation) vs ``<>`` / NOT-IN scans.
    - ``exists``: FILTER EXISTS — solutions whose object has an outgoing p2
      edge (left-semi on the shared variable) vs SQL EXISTS.
    - ``bindmod``: BIND + the solution modifiers — a computed ``a>b`` column
      over the deterministic ORDER BY (a, b) LIMIT 50 slice vs the same
      clause stack ((a, b) is unique per predicate, so the slice is stable
      on both engines).
    - ``groupagg``: SPARQL aggregation — GROUP BY subject with max-object +
      stringified count + a HAVING pass vs the same GROUP BY in SQL.
    - ``sparqltxt``: the SPARQL TEXT front-end end-to-end —
      operators.sparql.sparql_query parsing a SELECT string (IRI predicates,
      FILTER EXISTS, a computed projection, ORDER BY + LIMIT over the unique
      (a, b) key) vs the same clause stack in SQL.
    - ``subq``: a SPARQL 1.1 §12 SUBQUERY through the text front-end — the
      nested ``{ SELECT ?a (COUNT(*) AS ?n) ... GROUP BY ?a }`` computes the
      per-subject outdegree of the top predicate, joined onto the outer scan
      on the shared projected variable, ``?n`` stringified into the packed
      column — vs the same nested-subquery join in SQL.
    - ``gconcat``: the SPARQL-only aggregates — ``SAMPLE(?b)`` (→ min, a
      legal deterministic choice) and ``GROUP_CONCAT(?b; SEPARATOR=',')``
      (values SORTED then joined — deterministic where the spec leaves
      order open) — vs MIN + ordered string_agg in SQL.
    - ``ask``/``describe``: the other two SPARQL query forms through the
      text front-end — ASK over the 2-hop join (boolean, stringified) vs
      SQL EXISTS; DESCRIBE of the smallest node id (every edge row touching
      it, the induced star) vs the OR-filtered scan.
    - ``update``: SPARQL 1.1 UPDATE (operators.sparql.sparql_update) — a
      predicate migration ``DELETE { ?s p2 ?o } INSERT { ?s p2_v2 ?o }
      WHERE { ?s p2 ?o }`` applied to the golden edges; the resulting store
      (surviving rows keep their metadata, inserted rows carry
      n_occurrences=1) vs the same anti-join + distinct-union in SQL.
    - ``diff``: graph.edge_diff between a derived old generation (occurrence
      counts rewritten ``% 3 + 1``, single-occurrence edges dropped, one
      synthetic edge injected so every status occurs) and the current edges —
      all four statuses + both counts packed into one pipe-joined column —
      vs the same FULL OUTER JOIN in SQL.

    The two predicates are chosen from the data deterministically on BOTH
    sides (most frequent, then second; ties → min pred), so the arms never
    hardcode corpus-specific strings."""
    from lingvo_spark_kg.operators.graph import match_pattern

    edges = q_kg_edges(spark, sf_dir).localCheckpoint(eager=False)
    p1, p2 = [r["pred"] for r in edges.groupBy("pred").count()
              .orderBy(F.desc("count"), F.asc("pred")).limit(2).collect()]
    null_s = F.lit(None).cast("string")

    def arm(name: str, df: DataFrame) -> DataFrame:
        c = F.col("c") if "c" in df.columns else null_s
        return df.select(F.lit(name).alias("variant"), "a", "b", c.alias("c"))

    arms = [
        arm("bgp2", match_pattern(edges, [("?a", p1, "?b"), ("?b", p1, "?c")],
                                  stats=True)),
        arm("closure", match_pattern(edges, [("?a", p1 + "+", "?b")])),
        arm("star", match_pattern(edges, [("?a", p1 + "*", "?b")])),
        arm("inverse", match_pattern(edges, [("?a", "^" + p1, "?b")])),
        arm("optional", match_pattern(edges, [("?a", p1, "?b")],
                                      optional=[[("?b", p2, "?c")]])),
        arm("alt", match_pattern(edges, [("?a", f"{p1}|{p2}", "?b")])),
        arm("seq", match_pattern(edges, [("?a", f"{p1}/{p1}", "?b")])),
        arm("filter", match_pattern(edges, [("?a", p1, "?b")],
                                    filter="a < b")),
        arm("union", match_pattern(edges, [("?a", p1, "?b")],
                                   union=[[("?a", p2, "?c")]])),
        arm("minus", match_pattern(edges, [("?a", p1, "?b")],
                                   minus=[[("?a", p2, "?z")]])),
    ]
    seeds = [r["src_id"] for r in edges.where(F.col("pred") == p1)
             .select("src_id").distinct().orderBy("src_id").limit(2).collect()]
    arms.append(arm("values", match_pattern(
        edges, [("?a", p1, "?b")], values={"a": seeds})))
    arms += [
        arm("nps", match_pattern(edges, [("?a", f"!{p1}", "?b")])),
        arm("npsmix", match_pattern(edges, [("?a", f"!({p1}|^{p2})", "?b")])),
        arm("exists", match_pattern(edges, [("?a", p1, "?b")],
                                    exists=[[("?b", p2, "?z")]])),
        arm("bindmod", match_pattern(edges, [("?a", p1, "?b")],
                                     bind={"c": "concat(a, '>', b)"},
                                     order_by=["a", "b"], limit=50)),
        arm("groupagg", match_pattern(
            edges, [("?a", p1, "?b")], group_by=["a"],
            agg={"b": "max(b)", "c": "cast(count(*) as string)"},
            having="b is not null")),
    ]
    from lingvo_spark_kg.operators.sparql import sparql_query

    arms.append(arm("sparqltxt", sparql_query(
        edges,
        "SELECT ?a ?b (CONCAT(?a, '~', ?b) AS ?c) WHERE { "
        f"?a <{p1}> ?b . FILTER EXISTS {{ ?b <{p2}> ?z }} }} "
        "ORDER BY ?a ?b LIMIT 30")))
    arms.append(arm("subq", sparql_query(
        edges,
        "SELECT ?a ?b (CONCAT(?b, '#', STR(?n)) AS ?c) WHERE { "
        f"?a <{p1}> ?b . "
        f"{{ SELECT ?a (COUNT(*) AS ?n) WHERE {{ ?a <{p1}> ?z }} "
        "GROUP BY ?a } }")))
    arms.append(sparql_query(
        edges,
        "SELECT ?a (SAMPLE(?b) AS ?smp) "
        "(GROUP_CONCAT(?b; SEPARATOR=',') AS ?gc) "
        f"WHERE {{ ?a <{p1}> ?b }} GROUP BY ?a")
        .select(F.lit("gconcat").alias("variant"), F.col("a"),
                F.col("smp").alias("b"), F.col("gc").alias("c")))
    arms.append(sparql_query(
        edges,
        f"ASK {{ ?x <{p1}> ?y . ?y <{p2}> ?z }}")
        .select(F.lit("ask").alias("variant"),
                F.col("ask").cast("string").alias("a"),
                null_s.alias("b"), null_s.alias("c")))
    seed0 = edges.agg(F.least(F.min("src_id"), F.min("dst_id"))).first()[0]
    arms.append(sparql_query(edges, f"DESCRIBE <{seed0}>").select(
        F.lit("describe").alias("variant"),
        F.col("src_id").alias("a"), F.col("dst_id").alias("b"),
        F.concat_ws("|", "pred", F.col("n_occurrences").cast("string"))
        .alias("c")))
    from lingvo_spark_kg.operators.sparql import sparql_update

    arms.append(sparql_update(
        edges,
        f"DELETE {{ ?s <{p2}> ?o }} INSERT {{ ?s <{p2}_v2> ?o }} "
        f"WHERE {{ ?s <{p2}> ?o }}")
        .select(F.lit("update").alias("variant"),
                F.col("src_id").alias("a"), F.col("dst_id").alias("b"),
                F.concat_ws("|", "pred",
                            F.coalesce(F.col("n_occurrences").cast("string"),
                                       F.lit("-"))).alias("c")))
    from lingvo_spark_kg.operators.graph import edge_diff

    old = (edges.where(F.col("n_occurrences") > 1)
           .select("src_id", "pred", "dst_id",
                   (F.pmod(F.col("n_occurrences"), F.lit(3)) + F.lit(1))
                   .cast("long").alias("n_occurrences"))
           .unionByName(spark.createDataFrame(
               [("zz:x", "zz", "zz:y", 1)],
               "src_id string, pred string, dst_id string, "
               "n_occurrences long")))
    arms.append(edge_diff(old, edges).select(
        F.lit("diff").alias("variant"),
        F.col("src_id").alias("a"), F.col("dst_id").alias("b"),
        F.concat_ws(
            "|", "pred", "status",
            F.coalesce(F.col("n_occurrences_old").cast("string"), F.lit("-")),
            F.coalesce(F.col("n_occurrences_new").cast("string"), F.lit("-")))
        .alias("c")))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def q_kg_graph_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterative graph-ANALYTICS layer as ONE driver row, twelve arms
    under a variant column, each an exact-arithmetic recurrence checked
    engine-vs-engine against DuckDB running the SAME recurrence (unrolled
    materialized CTEs / recursive CTEs) over the golden edges parquet:

    - ``lpa``: graph.label_propagation, 8 iterations of deterministic integer
      voting (self-vote, max count, min-label ties) vs the 8-stage unrolled
      CTE chain. Early exit is a fixpoint, so a converged run and the fixed
      unroll agree by construction.
    - ``bfs``: graph.bfs_distances from the min node id (computed identically
      both sides) vs a recursive CTE with MIN(dist).
    - ``cc``: graph.components (min reachable id) vs recursive label spread.
    - ``sssp``: graph.shortest_paths (Bellman-Ford min-plus) over integer
      weights ``n_occurrences % 7 + 1`` (bounded so the SQL walk-state stays
      tiny at every tier) vs a cost-capped recursive CTE with MIN(cost).
    - ``coreness``: graph.coreness (iterated neighborhood h-index, Lü et al.
      2016) vs a 30-stage unrolled h-index chain (ROW_NUMBER desc window,
      max(least(rn, v))). BOTH sides run max 30 rounds: Spark early-exits at
      the fixpoint (extra SQL stages are then no-ops), and a graph that has
      not converged by 30 still compares the identical 30-round recurrence —
      never an oracle-depth artifact.
    - ``walks``: graph.random_walks (n_walks=2, walk_len=4 — the
      deterministic argmin-of-md5 DeepWalk kernel) vs the same md5 argmin as
      ROW_NUMBER windows; rows encoded (start, visited, walk_idx*16+step).
    - ``commstats``: graph.community_stats over the SAME LPA assignment —
      the exact integer modularity inputs (n_nodes, intra, boundary,
      degree_sum) packed into one base-100000 integer per community — vs the
      same classification in SQL over the l8 stage.
    - ``predstats``: graph.predicate_stats — per-predicate schema summary,
      the five exact integers pipe-joined into one string — vs GROUP BY.
    - ``ego``: graph.ego_subgraph, the 2-hop ball around the same min node —
      every induced edge as (src, pred|dst) — vs the bfs CTE's ≤2 ball
      semi-restricting the edge scan.
    - ``linkpred``: graph.neighbor_similarity — wedge-built common-neighbor /
      integer-Jaccard pairs (default hub cut), seven fields pipe-joined —
      vs the same wedge join + degree join + edge flag in SQL.
    - ``rules``: graph.materialize_rules (semi-naive Datalog forward
      chaining) saturating the two-rule mutually-feeding program
      {p1-transitivity; p2-extension through p1} from the top-2 predicates
      (chosen identically both sides), restricted to those predicates —
      vs the equivalent LINEAR recursive CTE (extend-by-base-p1), the
      textbook nonlinear≡linear closure equivalence checked
      engine-vs-engine on the golden edges.
    - ``brandes``: graph.shortest_path_counts (the tagged σ-BFS forward half
      of Brandes betweenness — per-source hop distance AND shortest-path
      COUNT, both exact integers) from the two smallest node ids (computed
      identically both sides), 8 levels BOTH engines, vs the same unrolled
      sum-over-frontier recurrence in SQL. The float dependency sweep on top
      is pinned separately against a dense Brandes reference in pytest.

    All integer/string outputs — no float drift surface anywhere."""
    from lingvo_spark_kg.operators.graph import (bfs_distances, components,
                                                 community_stats, coreness,
                                                 ego_subgraph,
                                                 label_propagation,
                                                 neighbor_similarity,
                                                 materialize_rules,
                                                 predicate_stats,
                                                 random_walks,
                                                 shortest_path_counts,
                                                 shortest_paths)

    edges = q_kg_edges(spark, sf_dir).localCheckpoint(eager=False)
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    src0 = edges.agg(F.least(F.min("src_id"), F.min("dst_id"))).first()[0]
    comm = label_propagation(edges, max_iter=8).localCheckpoint(eager=False)
    lpa = comm.select(
        F.lit("lpa").alias("variant"), "node_id",
        F.col("community").alias("val_s"), null_l.alias("val_l"))
    cs = community_stats(edges, comm).select(
        F.lit("commstats").alias("variant"),
        F.col("community").alias("node_id"), null_s.alias("val_s"),
        (((F.col("n_nodes") * F.lit(100000) + F.col("n_intra_edges"))
          * F.lit(100000) + F.col("n_boundary_edges")) * F.lit(100000)
         + F.col("degree_sum")).cast("long").alias("val_l"))
    bfs = bfs_distances(edges, [src0]).select(
        F.lit("bfs").alias("variant"), "node_id", null_s.alias("val_s"),
        F.col("distance").cast("long").alias("val_l"))
    cc = components(edges).select(
        F.lit("cc").alias("variant"), "node_id",
        F.col("component").alias("val_s"), null_l.alias("val_l"))
    e7 = edges.withColumn(
        "w7", (F.pmod(F.col("n_occurrences"), F.lit(7)) + F.lit(1)).cast("long"))
    sssp = shortest_paths(e7, [src0], weight_col="w7").select(
        F.lit("sssp").alias("variant"), "node_id", null_s.alias("val_s"),
        F.col("cost").cast("long").alias("val_l"))
    core = coreness(edges, max_iter=30).select(
        F.lit("coreness").alias("variant"), "node_id", null_s.alias("val_s"),
        F.col("coreness").cast("long").alias("val_l"))
    walks = random_walks(edges, n_walks=2, walk_len=4, seed=42).select(
        F.lit("walks").alias("variant"),
        F.col("start_id").alias("node_id"),
        F.col("node_id").alias("val_s"),
        (F.col("walk_idx") * F.lit(16) + F.col("step"))
        .cast("long").alias("val_l"))
    ps = predicate_stats(edges).select(
        F.lit("predstats").alias("variant"), F.col("pred").alias("node_id"),
        F.concat_ws("|", "n_edges", "n_src_nodes", "n_dst_nodes",
                    "sum_occurrences", "max_occurrences").alias("val_s"),
        null_l.alias("val_l"))
    ego = ego_subgraph(edges, [src0], k=2).select(
        F.lit("ego").alias("variant"), F.col("src_id").alias("node_id"),
        F.concat_ws("|", "pred", "dst_id").alias("val_s"),
        null_l.alias("val_l"))
    lp = neighbor_similarity(edges).select(
        F.lit("linkpred").alias("variant"), F.col("node_a").alias("node_id"),
        F.concat_ws("|", "node_b", "n_common", "deg_a", "deg_b",
                    "jaccard_num", "jaccard_den", "is_edge").alias("val_s"),
        null_l.alias("val_l"))
    rp1, rp2 = [r["pred"] for r in edges.groupBy("pred").count()
                .orderBy(F.desc("count"), F.asc("pred")).limit(2).collect()]
    sat = materialize_rules(edges, [
        ([("?x", rp1, "?y"), ("?y", rp1, "?z")], ("?x", rp1, "?z")),
        ([("?x", rp2, "?y"), ("?y", rp1, "?z")], ("?x", rp2, "?z"))])
    rules_arm = sat.where(F.col("pred").isin([rp1, rp2])).select(
        F.lit("rules").alias("variant"), F.col("src_id").alias("node_id"),
        F.concat_ws("|", "pred", "dst_id").alias("val_s"),
        null_l.alias("val_l"))
    ids2 = (edges.select(F.col("src_id").alias("n"))
            .unionByName(edges.select(F.col("dst_id").alias("n")))
            .distinct().orderBy("n").limit(2))
    brand = shortest_path_counts(edges, ids2, max_hops=8).select(
        F.lit("brandes").alias("variant"), "node_id",
        F.concat_ws("|", "src", F.col("distance").cast("long"))
        .alias("val_s"),
        F.col("n_paths").cast("long").alias("val_l"))
    return (lpa.unionByName(bfs).unionByName(cc).unionByName(sssp)
            .unionByName(core).unionByName(walks).unionByName(cs)
            .unionByName(ps).unionByName(ego).unionByName(lp)
            .unionByName(brand).unionByName(rules_arm))


def q_kg_edges_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance gate (operators/incremental.py): materialize the
    graph state over the FIRST 80% of the corpus, then apply the remaining 20% as
    a delta batch through ``apply_delta`` — merged mention re-link, vocab-bounded
    CC re-run, base-edge remap through the old→new canonical map, sketch-carrying
    merge aggregate. Incremental ≡ full recompute, so the oracle is the SAME
    golden kg_edges parquet as the batch path, minus ``n_docs`` (the HLL sketch
    estimate — merge-exact vs a sketch-mode full recompute, pinned bit-equal in
    tests/test_incremental.py, but not numerically the golden's exact
    countDistinct). Every compared column here is exact by construction."""
    from lingvo_spark_kg.operators import incremental, linking
    from lingvo_spark_kg.operators.canonicalize import canonical_map
    from lingvo_spark_kg.operators.docsgen import generate_docs
    from lingvo_spark_kg.operators.graph import build_edges_table
    from lingvo_spark_kg.operators.triples import docs_to_triples_fused

    n = _n_docs_for(sf_dir)
    k = max(1, (n * 4) // 5)
    gaz = _gaz_bc(spark)
    aliases = _aliases_df(spark)
    # base state: the already-materialized graph the delta batch arrives against
    base_t = docs_to_triples_fused(generate_docs(spark, k), gaz).localCheckpoint()
    base_links = linking.link_mentions(
        linking.mentions_from_triples(base_t), aliases).localCheckpoint()
    base_canon = canonical_map(base_links).localCheckpoint()
    base_edges = build_edges_table(
        linking.link_triples(base_t, base_links), base_canon,
        doc_sketch=True).localCheckpoint()
    # the delta: the rest of the SAME deterministic corpus (generate_docs is a
    # pure function of doc id, so base ∪ delta == the full-corpus scan bit-exactly)
    delta_t = docs_to_triples_fused(generate_docs(spark, n - k, start=k), gaz)
    out = incremental.apply_delta(base_links, base_canon, base_edges, delta_t,
                                  aliases)
    return out["edges"].select(
        "src_id", "pred", "dst_id", "n_occurrences", "avg_confidence",
        "example_doc_id")


def q_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget context packing (corpus_ops.pack_contexts): concat-and-chunk
    assignment of docs to 64-token pretraining contexts in 4 deterministic shards —
    one window shuffle, every expression engine-portable."""
    from lingvo_spark_kg.operators.corpus_ops import pack_contexts

    return pack_contexts(_documents(spark, sf_dir), budget=64, n_shards=4)


def q_kg_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row invariant gate (BASELINE.json input_hint) as a query: for every doc,
    the span sequence reconstructed from the pipeline's text/media projections must
    equal the input on (kind, text, media_ref, order). Returns one summary row —
    violations MUST be 0."""
    from lingvo_spark_kg.operators.tokenize import media_spans, text_spans

    docs = _synthetic_docs(spark, sf_dir)
    tx = text_spans(docs).select(
        "doc_id", "span_idx", F.lit(None).cast("string").alias("kind_m"),
        F.col("text"), F.lit(None).cast("string").alias("media_ref"),
    )
    md = media_spans(docs).select(
        "doc_id", "span_idx", F.col("kind").alias("kind_m"),
        F.lit(None).cast("string").alias("text"), "media_ref",
    )
    rebuilt = tx.unionByName(md).groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("span_idx", "kind_m", "text", "media_ref"))
                     ).alias("rebuilt"))
    orig = docs.select(
        "doc_id",
        F.sort_array(F.transform("spans", lambda sp: F.struct(
            sp["offset"].alias("span_idx"),
            F.when(sp["kind"] == "text", F.lit(None).cast("string")).otherwise(sp["kind"]).alias("kind_m"),
            sp["text"].alias("text"), sp["media_ref"].alias("media_ref"),
        ))).alias("orig"))
    j = rebuilt.join(orig, "doc_id")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("rebuilt") != F.col("orig"), 1).otherwise(0)).cast("long").alias("violations"),
    )


def q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All BIO entity spans (operators/mentions.py) — the superset of the
    triple-participating mentions; isolated mentions become degree-0 graph nodes."""
    from lingvo_spark_kg.operators.mentions import ner_mentions
    from lingvo_spark_kg.operators.tag import tag_sentences_lexicon
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    docs = _synthetic_docs(spark, sf_dir)
    tagged = tag_sentences_lexicon(tokenize_docs(docs), _gaz_bc(spark))
    return ner_mentions(tagged)


def _tag_exploded(spark: SparkSession, sf_dir: str, pos_m, ner_m,
                  encoder: str = "bilstm") -> DataFrame:
    """Broadcast the (pos, ner) model pair, tag the documents-table corpus, flatten
    to the per-token (doc_id, span_idx, sent_idx, tok_idx, pos_tag, ner_tag) oracle
    shape — the ONE copy shared by q_tag_bilstm / q_tag_transformer /
    q_tag_bilstm_s2s (which differ only in how the models were obtained): the three
    are compared against the same golden family, so their reshape must never drift."""
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.tag import tag_sentences_bilstm
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
    docs = docs_from_documents_table(spark, sf_dir)
    tagged = tag_sentences_bilstm(tokenize_docs(docs), pos_bc, ner_bc,
                                  encoder=encoder)
    return tagged.select(
        "doc_id", "span_idx", "sent_idx",
        F.posexplode(F.arrays_zip("pos_tags", "ner_tags")).alias("tok_idx", "tags"),
    ).select("doc_id", "span_idx", "sent_idx", "tok_idx",
             F.col("tags.pos_tags").alias("pos_tag"), F.col("tags.ner_tags").alias("ner_tag"))


def q_tag_bilstm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned DNN regimen over the corpus (rows-only check; parity gates in tests/)."""
    from lingvo_spark_kg.model.pinned import pinned_tagger_models

    pos_m, ner_m = pinned_tagger_models()
    return _tag_exploded(spark, sf_dir, pos_m, ner_m)


def q_tag_bilstm_crf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star decode shape: BiLSTM emissions + CRF transitions + Viterbi with BIO
    structural masks — NER sequences are well-formed by construction (rows-only)."""
    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.tag import tag_sentences_bilstm
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    pos_m, ner_m = pinned_tagger_models()
    ner_m = ner_m.with_crf(bio=True)
    pos_bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    ner_bc = spark.sparkContext.broadcast(ner_m.to_bytes())
    docs = docs_from_documents_table(spark, sf_dir)
    tagged = tag_sentences_bilstm(tokenize_docs(docs), pos_bc, ner_bc)
    return tagged.select(
        "doc_id", "span_idx", "sent_idx",
        F.posexplode("ner_tags").alias("tok_idx", "ner_tag"),
    )


def q_tag_bilstm_s2s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S9 hard signal: the reference ``.s2s`` model FILE FORMAT (protobuf-net
    wire format, Models/Model_4_ProtoBufSerializer.cs:16-56) round-trips INSIDE a
    driver row — the pinned pair is written as .s2s bytes, reloaded through the
    file source (sources/s2s.py write_s2s → load_tagger), and the reloaded models
    tag the corpus. Oracle = the SAME tag_bilstm golden, so any wire-format
    drift (field tags, varint widths, weight layout, vocab order) breaks the hash."""
    import os
    import tempfile

    from lingvo_spark_kg.model.pinned import pinned_tagger_models
    from lingvo_spark_kg.sources.s2s import from_tagger_model, load_tagger, write_s2s

    models = []
    for m in pinned_tagger_models():
        fd, path = tempfile.mkstemp(suffix=".s2s")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(write_s2s(from_tagger_model(m)))
            models.append(load_tagger(path))
        finally:
            os.unlink(path)
    return _tag_exploded(spark, sf_dir, *models)


def q_tag_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9/M11 hard signal: the reference's probability output shape — per token the
    FULL sorted [(class, prob)] list (softmax over the classifier head,
    SeqLabel.cs:175-218) + per-sentence WordsInDictRatio (SeqLabel.cs:194-216) from
    the pinned POS model, flattened to scalar rows. The operator's batch-1 kernel is
    shared with the golden mirror, so the floats are bit-identical by construction
    (golden._tag_probs_rows)."""
    from lingvo_spark_kg.model.pinned import pinned_tagger_models

    pos_m, _ner_m = pinned_tagger_models()
    bc = spark.sparkContext.broadcast(pos_m.to_bytes())
    return _probs_flattened(spark, sf_dir, bc, backend_loader=None)


def _probs_flattened(spark: SparkSession, sf_dir: str, model_bc,
                     backend_loader) -> DataFrame:
    """tokenize → tag_sentences_probs → scalar rows — shared by tag_probs (NumPy)
    and tag_probs_onnx (exported graph), which compare against the same golden."""
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.tag import tag_sentences_probs
    from lingvo_spark_kg.operators.tokenize import tokenize_docs

    docs = docs_from_documents_table(spark, sf_dir)
    pr = tag_sentences_probs(tokenize_docs(docs), model_bc,
                             backend_loader=backend_loader)
    tok = pr.select(
        "doc_id", "span_idx", "sent_idx", "words_in_dict_ratio",
        F.posexplode("probs").alias("tok_idx", "ranked"),
    )
    return tok.select(
        "doc_id", "span_idx", "sent_idx", "tok_idx",
        F.posexplode("ranked").alias("rank", "lp"), "words_in_dict_ratio",
    ).select("doc_id", "span_idx", "sent_idx", "tok_idx", "rank",
             F.col("lp.label").alias("label"), F.col("lp.prob").alias("prob"),
             "words_in_dict_ratio")


def q_tag_probs_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probability output through the PRODUCTION seam: real exported ONNX
    bundle broadcast to executors, per-worker graph-executor session, shared
    softmax post-processing (backend.probs_from_logits) — oracle = the SAME
    tag_probs golden, so the exported graph's probability output is gated
    bit-identical to the native kernel's."""
    from lingvo_spark_kg.model.backend import onnx_backend
    from lingvo_spark_kg.model.onnx_export import to_onnx_bundle
    from lingvo_spark_kg.model.onnx_numpy import numpy_session_factory
    from lingvo_spark_kg.model.pinned import pinned_tagger_models

    pos_m, _ner_m = pinned_tagger_models()
    bc = spark.sparkContext.broadcast(to_onnx_bundle(pos_m))
    loader = onnx_backend(session_factory=numpy_session_factory)
    return _probs_flattened(spark, sf_dir, bc, backend_loader=loader)


def q_kg_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/Email extraction over the interleaved corpus with the domain key
    domain-blocklist curation filters on (textstats.extract_urls, the reference's
    UrlDetector state machine — T1 applied as a data-ops stage)."""
    from lingvo_spark_kg.operators.textstats import extract_urls
    from lingvo_spark_kg.operators.tokenize import text_spans

    return extract_urls(text_spans(_synthetic_docs(spark, sf_dir)))


def q_tag_transformer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-norm Transformer encoder regimen (M4/M5/M7): same operator as
    q_tag_bilstm with encoder='transformer' — sinusoidal position embeddings, pad
    self-attention mask (batch-composition-independent padded decode), final
    LayerNorm (reference TransformerEncoder.cs:63-89, mask Encoder.cs:91). The
    golden mirror decodes batch-of-1; the pad mask bounds batch-composition float
    noise ~400× under the pinned model's minimum argmax margin (golden.py)."""
    from lingvo_spark_kg.model.pinned import pinned_tagger_models

    pos_m, ner_m = pinned_tagger_models(encoder="transformer")
    return _tag_exploded(spark, sf_dir, pos_m, ner_m, encoder="transformer")


def q_kg_links_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass entity linking: exact broadcast join + stem-block fuzzy fallback with
    JVM-side levenshtein scoring (linking.link_mentions_fuzzy) — links inflected
    surfaces ('с . козлову') the exact key misses."""
    from lingvo_spark_kg.operators import linking

    triples = _synthetic_triples(spark, sf_dir)
    return linking.link_mentions_fuzzy(
        linking.mentions_from_triples(triples), _aliases_df(spark))


def q_media_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize over opaque payloads (codec stubbed at the declared seam);
    the raw resized bytes stay out of the oracle row — resized_sha1 is the
    engine-portable witness of the byte grid."""
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.multimodal import media_payloads, resize_media
    from lingvo_spark_kg.operators.tokenize import media_spans

    docs = docs_from_documents_table(spark, sf_dir)
    r = resize_media(media_payloads(media_spans(docs)), width=32, height=32)
    return r.select("doc_id", "span_idx", "kind", "width", "height", "resized_sha1")


def q_media_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction → unit-norm embedding column (the ANN input
    shape), exploded to scalar (dim_idx, value) rows for the oracle comparison."""
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.multimodal import media_features, media_payloads
    from lingvo_spark_kg.operators.tokenize import media_spans

    docs = docs_from_documents_table(spark, sf_dir)
    f = media_features(media_payloads(media_spans(docs)), dim=16)
    return f.select("doc_id", "span_idx", "kind",
                    F.posexplode("embedding").alias("dim_idx", "value"))


def q_train_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2-R6 hard signal: a 2-epoch train_bilstm_distributed run on the deterministic
    train fixture with ONE partition (float reduce order is then deterministic —
    the documented reason distributed training has no oracle otherwise) emitting the
    per-epoch (epoch, nll_per_token, n_tokens, val_score, is_best) table. The R5/R6
    periodic-validation seam runs live: validate_fn is macro-F1 on the held-out
    fixture split (fixtures.corpus.validate_macro_f1; reference best-model tracking
    BaseSeq2SeqFramework.cs:404-408), is_best marks the best-scoring epoch. The
    golden mirror runs the identical kernels driver-side
    (golden._train_history_rows)."""
    return _train_history_df(spark, sf_dir, encoder="bilstm")


def q_train_history_transformer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R3 for EncoderType=Transformer (Options.cs; ModelBuilder.cs trains both
    encoders behind one option): the SAME distributed loop + Adam, with BPTT through
    the pre-norm Transformer (model/train.transformer_loss_and_grads — gradcheck-
    gated like the BiLSTM kernel). Oracle = the transformer golden mirror run with
    identical shared kernels driver-side."""
    return _train_history_df(spark, sf_dir, encoder="transformer")


def _train_history_df(spark: SparkSession, sf_dir: str, encoder: str) -> DataFrame:
    """Shared train-history runner: pinned fixture model (golden.train_fixture_model
    — ONE definition with the mirror), one partition (deterministic float reduce
    order), 2 epochs, per-epoch macro-F1 validation + is_best."""
    import pandas as pd

    from lingvo_spark_kg.fixtures.corpus import valid_fixture, validate_macro_f1
    from lingvo_spark_kg.golden import train_fixture_model
    from lingvo_spark_kg.operators.train_loop import train_tagger_distributed

    rows, m0 = train_fixture_model(sf_dir, encoder)
    valid = valid_fixture(sf_dir)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [d for d, _, _ in rows],
        "tokens": [t for _, t, _ in rows],
        "labels": [l for _, _, l in rows],
    }))
    corpus = (df.repartition(1).sortWithinPartitions("doc_id")
              .select("tokens", "labels"))
    _m, hist = train_tagger_distributed(
        corpus, m0, epochs=2, lr=0.05, batch_size=32,
        validate_fn=lambda cand: validate_macro_f1(cand, valid))
    best_epoch = max(range(len(hist)), key=lambda e: (hist[e]["val_score"], -e))
    for h in hist:
        h["is_best"] = int(h["epoch"] == best_epoch)
    return spark.createDataFrame(pd.DataFrame(hist)).select(
        F.col("epoch").cast("long").alias("epoch"),
        F.col("nll_per_token").cast("double").alias("nll_per_token"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("val_score").cast("double").alias("val_score"),
        F.col("is_best").cast("long").alias("is_best"))


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.multimodal import decode_media, media_payloads
    from lingvo_spark_kg.operators.tokenize import media_spans

    docs = docs_from_documents_table(spark, sf_dir)
    return decode_media(media_payloads(media_spans(docs))).orderBy("doc_id")


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/window sampling over time-based media spans of the synthetic corpus,
    both implementations under one ``variant`` column: 'fake' = the codec-free
    plumbing fingerprint per (sha1, t_ms); 'real' = actual WAV payloads decoded
    (codecs.py) and each PCM window [t, t+250ms) fingerprinted over its samples."""
    from lingvo_spark_kg.operators.multimodal import (decode_media, media_payloads,
                                                      sample_frames)
    from lingvo_spark_kg.operators.tokenize import media_spans

    docs = _synthetic_docs(spark, sf_dir)
    spans = media_spans(docs)
    decoded = decode_media(media_payloads(spans))
    fake = sample_frames(decoded, interval_ms=5000).withColumn(
        "variant", F.lit("fake"))
    real = sample_frames(media_payloads(spans, codec="real"), interval_ms=250,
                         impl="real").withColumn("variant", F.lit("real"))
    return fake.unionByName(real)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.dedup import exact_duplicates

    return exact_duplicates(_documents(spark, sf_dir)).select(
        "fp", "keep_doc_id", F.col("n_docs").cast("long").alias("n_docs")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.textstats import language_id

    return language_id(_documents(spark, sf_dir))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.textstats import token_count

    tc = token_count(_documents(spark, sf_dir))
    return tc.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                     "n_re_tokens", "n_chars", "n_bpe_est")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.textstats import quality_score

    qs = quality_score(_documents(spark, sf_dir))
    return qs.select("doc_id", "n_chars", F.col("n_tokens").cast("long").alias("n_tokens"),
                     "digit_ratio", "punct_ratio", "mean_token_len", "quality")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.textstats import fingerprint

    fp = fingerprint(_documents(spark, sf_dir))
    return fp.groupBy("fp_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_distinct"),
    )


def q_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (MOSS): per-doc k-gram min-hash selection,
    position-robust near-dup keys (textstats.winnow_fingerprints)."""
    from lingvo_spark_kg.operators.textstats import winnow_fingerprints

    return winnow_fingerprints(_documents(spark, sf_dir), k=7, window=4)


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition filters (textstats.repetition_stats): duplicate
    word/2-gram fractions + top-2-gram occupancy per doc."""
    from lingvo_spark_kg.operators.textstats import repetition_stats

    return repetition_stats(_documents(spark, sf_dir))


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sample at 20% (corpus_ops.hash_sample) — the corpus-mixing
    primitive: membership is a pure function of (doc_id, seed), so the sample is
    stable under reruns, repartitioning and corpus growth."""
    from lingvo_spark_kg.operators.corpus_ops import hash_sample

    d = _documents(spark, sf_dir).select("doc_id", F.length("text").alias("n_chars"))
    return hash_sample(d, rate=0.2, key="doc_id", seed=42)


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the interleaved corpus: URL/Email spans (reference
    UrlDetector state machine) → placeholder tokens, residual ≥4-digit runs → <NUM>
    (textstats.redact_pii; shared kernel urldetect.redact_text) — the pre-training
    redaction pass of a web-corpus pipeline."""
    from lingvo_spark_kg.operators.textstats import redact_pii
    from lingvo_spark_kg.operators.tokenize import text_spans

    return redact_pii(text_spans(_synthetic_docs(spark, sf_dir)))


# mixing config for the stratified-sample query — module-level so the Spark query
# and the DuckDB oracle are generated from the ONE dict
_MIX_RATES = {"ru": 0.5, "en": 0.3, "de": 0.2}
_MIX_DEFAULT = 0.05


def _mix_thresh(rate: float) -> str:
    """The oracle's threshold string — delegates to the ONE module-level formula the
    Spark operator uses (corpus_ops.hash_sample_threshold, including the rate-1.0 'g'
    sentinel that keeps every row, even NULL-keyed), so oracle and operator cannot
    silently drift. Package import stays function-local (module docstring)."""
    from lingvo_spark_kg.operators.corpus_ops import hash_sample_threshold

    return hash_sample_threshold(rate)


def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified deterministic sampling (corpus_ops.
    stratified_hash_sample) — each stratum at its own mix weight in one scan;
    membership is a pure function of (doc_id, seed) so the mix is stable under
    reruns and corpus growth."""
    from lingvo_spark_kg.operators.corpus_ops import stratified_hash_sample

    d = _documents(spark, sf_dir).select("doc_id", "lang",
                                         F.length("text").alias("n_chars"))
    return stratified_hash_sample(d, rates=_MIX_RATES, group_col="lang",
                                  key="doc_id", seed=42,
                                  default_rate=_MIX_DEFAULT)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination scan: corpus docs sharing ≥1 word 3-gram with the
    benchmark slice (every 97th doc plays the eval suite) and how many distinct
    shingles leak (operators/dedup.decontaminate)."""
    from lingvo_spark_kg.operators.dedup import decontaminate

    d = _documents(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench)


def q_winnow_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints with a document-frequency cut
    on boilerplate fingerprints (textstats.winnow_neardup_pairs) — the
    O(shared-content) alternative to the MinHash band path: a shared substring ≥
    k+window−1 chars ⇒ a shared fp, so plagiarism-style overlap surfaces even when
    full-document Jaccard is low."""
    from lingvo_spark_kg.operators.textstats import winnow_neardup_pairs

    return winnow_neardup_pairs(_documents(spark, sf_dir), k=7, window=4,
                                max_df=50, min_shared=10)


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.dedup import minhash_bands

    return minhash_bands(_documents(spark, sf_dir), n_hashes=8, rows_per_band=2)


def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.dedup import neardup_pairs

    d = _documents(spark, sf_dir)
    return neardup_pairs(d, n_hashes=8, rows_per_band=2).select(
        "doc_a", "doc_b", F.col("n_inter").cast("long").alias("n_inter"), "jaccard"
    )


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup SURVIVOR selection (dedup.neardup_survivors): MinHash near-dup
    pairs at jaccard ≥ 0.7 → connected components (the SAME checkpointed CC
    operator the KG canonicalization uses, on the pair-bounded graph) → per doc
    (doc_id, cluster_id, is_canonical) with the deterministic min-doc_id keep
    rule. The DuckDB oracle recomputes the pairs and clusters them with a
    recursive min-label CTE — engine-against-engine, no golden."""
    from lingvo_spark_kg.operators.dedup import neardup_pairs, neardup_survivors

    d = _documents(spark, sf_dir)
    pairs = neardup_pairs(d, n_hashes=8, rows_per_band=2)
    return neardup_survivors(d, pairs, threshold=0.7).select(
        "doc_id", "cluster_id", "is_canonical")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.dedup import simhash

    return simhash(_documents(spark, sf_dir))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.ann import cosine_topk_brute

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = (
        emb.where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    out = cosine_topk_brute(emb, queries, k=10, round_digits=4)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lingvo_spark_kg.operators.ann import lsh_bucketed_topk

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # dim pinned to the testdata's 64: the DuckDB oracle embeds hyperplanes for 64,
    # so a dynamic read would only hide a mismatch (and cost a driver job)
    queries = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_bucketed_topk(emb, queries, dim=64, k=10, round_digits=4)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (OR-amplified) LSH ANN with Hamming-1 multiprobe — the scale path
    whose recall stops being a single-table bucket lottery (recall@10 ≥ 0.95 vs the
    brute-force oracle is pinned in tests/test_spark_pipeline.py)."""
    from lingvo_spark_kg.operators.ann import lsh_multitable_topk

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_multitable_topk(emb, queries, dim=64, k=10, round_digits=4)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic hash-sampled coarse centroids, cell-keyed candidate
    join, n_probe=4 of 16 cells, exact cosine re-rank (operators/ann.py ivf_topk)."""
    from lingvo_spark_kg.operators.ann import ivf_topk

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4, round_digits=4)
    return out.select("query_id", "vec_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


_HYP_RULE = """
CASE WHEN token LIKE '%ть' THEN 'Verb'
     WHEN token LIKE '%ой' OR token LIKE '%ый' OR token LIKE '%ий' THEN 'Adjective'
     WHEN token LIKE '%о' THEN 'Adverb'
     ELSE 'Noun' END
"""
_REF_RULE = """
CASE WHEN token LIKE '%ть' OR token LIKE '%ет' THEN 'Verb'
     WHEN token LIKE '%ый' OR token LIKE '%ий' THEN 'Adjective'
     WHEN token LIKE '%о' THEN 'Adverb'
     ELSE 'Noun' END
"""


def q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH blocking (dedup family).
    max_bucket=None pins the unbounded join the DuckDB oracle mirrors — the library
    default (10k occupancy cut) would silently diverge from the oracle at an sf
    where a bucket exceeds the cap; the cut's behavior is pinned by property tests
    instead (tests/test_round4.py)."""
    from lingvo_spark_kg.operators.ann import embedding_neardup

    emb = _embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return embedding_neardup(emb, dim=64, threshold=0.3, max_bucket=None)


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 vocab build: frequency-descending capped token vocabulary with the
    reference's reserved-id layout (ids from START_MEANING_INDEX=3, Vocab.cs:14-27;
    build CorpusBatch.cs:98-221; cap Options.cs:72). TakeOrdered top-K — no global
    Window (operators/corpus_ops.build_vocab_df)."""
    from lingvo_spark_kg.operators.corpus_ops import build_vocab_df

    return build_vocab_df(_documents(spark, sf_dir), cap=200)


def _rule_taggings(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The (hyp, ref) rule-tagged token streams that BOTH metric queries compare —
    one definition so prf_metrics and macro_f1 can never tokenize differently."""
    d = _documents(spark, sf_dir)
    toks = d.select(
        "doc_id", F.lit(0).alias("sent_key"),
        F.posexplode(F.split(F.trim(F.col("text")), WS_SPLIT)).alias("tok_idx", "token"),
    )
    hyp = toks.select("doc_id", "sent_key", "tok_idx", F.expr(_HYP_RULE).alias("label"))
    ref = toks.select("doc_id", "sent_key", "tok_idx", F.expr(_REF_RULE).alias("label"))
    return hyp, ref


def q_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 Common-Score analog: macro P/R/F1 over the per-label table
    (MultiLabelsFscoreMetric.cs:40-153), same rule taggings as prf_metrics."""
    from lingvo_spark_kg.operators.metrics import macro_f1, per_label_prf

    hyp, ref = _rule_taggings(spark, sf_dir)
    m = macro_f1(per_label_prf(hyp, ref))
    return m.select("macro_precision", "macro_recall", "macro_f1",
                    F.col("n_labels").cast("long").alias("n_labels"))


def q_prf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 metric aggregation parity: per-label token P/R/F1 between two rule taggings
    of the same corpus (both rules SQL-expressible so DuckDB can mirror them)."""
    from lingvo_spark_kg.operators.metrics import per_label_prf

    hyp, ref = _rule_taggings(spark, sf_dir)
    return per_label_prf(hyp, ref).select(
        "label",
        F.col("n_hyp").cast("long").alias("n_hyp"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_both").cast("long").alias("n_both"),
        "precision", "recall", "f1",
    )


def q_len_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 analog: token-length histogram bucketed by //10 (the reference buckets
    sentence lengths by //100, Corpus.cs:246-268; //10 is the deliberate scale-down
    for the fixture's ~30-token docs — the oracle pins 10)."""
    d = _documents(spark, sf_dir)
    return (
        d.select((F.floor(F.size(F.split(F.trim(F.col("text")), WS_SPLIT)) / 10))
                 .cast("long").alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_words_in_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog: WordsInDictRatio per doc against the corpus top-500 vocabulary
    (SeqLabel.cs:194-216; vocab build R1, CorpusBatch.cs:98-221 freq-desc capped)."""
    d = _documents(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), WS_SPLIT)).alias("token"))
    vocab = (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token")).limit(500)
        .select("token", F.lit(1).alias("in_dict"))
    )
    j = toks.join(F.broadcast(vocab), "token", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum(F.coalesce(F.col("in_dict"), F.lit(0))) / F.count(F.lit(1)), 4)
        .alias("words_in_dict_ratio"),
    )


def _goldens_dir(sf_dir: str) -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".goldens",
        os.path.basename(os.path.normpath(sf_dir)),
    )


def q_conll_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 hard signal: the CoNLL corpus source + reshape (sources/conll.py read_conll
    → exploded_tokens; reference Corpus.cs:451-565 / ConvertTrainFile2SeqLabelFormat
    :528-553) over a deterministic fixture file. The DuckDB oracle reshapes the SAME
    raw line table in pure SQL (no golden mirror of the parse logic), so sentence
    segmentation, token/label split and per-sentence ordering are checked
    engine-against-engine."""
    import os

    from lingvo_spark_kg.golden import ensure_conll_fixture
    from lingvo_spark_kg.sources.conll import exploded_tokens, read_conll

    # the DuckDB oracle reads the lines parquet generated under the ORACLE sf_dir;
    # fixture sizing is tier-dependent (n_docs_for), so a tier mismatch would make
    # the two engines read DIFFERENT fixtures and fail confusingly — fail fast with
    # the actual cause instead (tools/check_oracles.py always sets the env var)
    oracle_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    if oracle_dir is not None and (
            os.path.basename(os.path.normpath(oracle_dir))
            != os.path.basename(os.path.normpath(sf_dir))):
        raise ValueError(
            f"conll_sentences: query sf_dir {sf_dir!r} and SPARK_GRAFT_ORACLE_SF_DIR "
            f"{oracle_dir!r} point at different tiers — the engines would compare "
            "differently-sized fixtures")
    conll_path, _lines = ensure_conll_fixture(sf_dir, _goldens_dir(sf_dir))
    t = exploded_tokens(read_conll(spark, conll_path))
    return t.select(F.col("sent_key").cast("long").alias("sent_id"),
                    F.col("tok_idx").cast("long").alias("tok_idx"),
                    "token", "label")


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window/sort operator demo over the events stream table: per-user ordered
    reassembly (the DataFrame form of the reference's ordered merge after parallel
    work, ConcurrentFactory.cs:190-211) + per-user running aggregates."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.row_number().over(w).cast("long").alias("seq"),
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


def q_curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation chain: language-ID + quality gate + exact-dedup
    keeper in ONE corpus scan + one window shuffle (textstats.curate_documents) —
    the filter a 100 TB corpus passes before tokenization."""
    from lingvo_spark_kg.operators.textstats import curate_documents

    return curate_documents(_documents(spark, sf_dir), min_quality=0.7)


def q_event_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation — the same watermarked operator the
    streaming path uses (operators/streaming.windowed_event_counts), run on the batch
    events table (identical plan modulo the watermark node)."""
    from lingvo_spark_kg.operators.streaming import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # window bounds as formatted strings: engines disagree on timestamp unit/tz
    # dtypes (ns vs us, naive vs tz) even when the instants are identical
    return windowed_event_counts(ev, window="5 minutes").select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.date_format("win_end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"), "sum_value",
    )


# ------------------------------------------------------- combined driver rows
# The driver's correctness check executes at most 50 queries() entries per round
# (CORRECTNESS_r05 ran exactly the first 50 of 56, silently dropping the tail —
# VERDICT r5 item 1). Same-family surfaces are therefore folded into combined rows
# (join on the shared key, or union with a variant discriminator): every operator
# keeps a hard oracle row, and the whole set fits the cap with slack. The single
# q_* functions stay — bench.py and the plan-pin tests time/inspect them directly.

def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang_id ⋈ quality on doc_id — the two single-scan document-feature surfaces
    (textstats.language_id / quality_score) in one row."""
    return q_lang_id(spark, sf_dir).join(q_quality(spark, sf_dir), "doc_id")


def q_token_rep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_count ⋈ repetition on doc_id (textstats.token_count /
    repetition_stats)."""
    return q_token_count(spark, sf_dir).join(q_repetition(spark, sf_dir), "doc_id")


def q_doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simhash ⋈ per-doc md5 fingerprint ⋈ its bucket stats — the three
    document-hash surfaces (dedup.simhash, textstats.fingerprint and the bucket
    aggregation formerly exposed as the 'fingerprint' row) in one row."""
    from lingvo_spark_kg.operators.textstats import fingerprint

    fp = fingerprint(_documents(spark, sf_dir))
    buckets = fp.groupBy("fp_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("bucket_n_docs"),
        F.countDistinct("fp").cast("long").alias("bucket_n_distinct"))
    return (q_simhash(spark, sf_dir)
            .join(fp.select("doc_id", "fp", "fp_bucket"), "doc_id")
            .join(F.broadcast(buckets), "fp_bucket"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """words_in_dict per-doc ratios + the //10 length histogram joined back on the
    doc's own bucket (A3 + A4 in one row; the histogram side is broadcast)."""
    wd = q_words_in_dict(spark, sf_dir).withColumn(
        "len_bucket", F.floor(F.col("n_tokens") / 10).cast("long"))
    ld = q_len_distribution(spark, sf_dir).withColumnRenamed(
        "n_docs", "n_docs_in_bucket")
    return wd.join(F.broadcast(ld), "len_bucket")


def q_doc_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain + stratified deterministic hash samples as one union with a variant
    discriminator (corpus_ops.hash_sample / stratified_hash_sample)."""
    a = q_doc_sample(spark, sf_dir).select(
        F.lit("plain").alias("variant"), "doc_id",
        F.lit(None).cast("string").alias("lang"), "n_chars")
    b = q_doc_sample_stratified(spark, sf_dir).select(
        F.lit("stratified").alias("variant"), "doc_id", "lang", "n_chars")
    return a.unionByName(b)


def q_event_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered window sequence (event_windows) + tumbling-window
    aggregation (the streaming operator on the batch table) normalized to one
    schema: part ('seq'|'win'), k1, k2, n, v, s."""
    seq = q_event_windows(spark, sf_dir).select(
        F.lit("seq").alias("part"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("event_id").cast("string").alias("k2"),
        F.col("seq").alias("n"), F.col("running_value").alias("v"),
        F.col("prev_type").alias("s"))
    win = q_event_windowed_agg(spark, sf_dir).select(
        F.lit("win").alias("part"), F.col("win_start").alias("k1"),
        F.col("event_type").alias("k2"), F.col("n_events").alias("n"),
        F.col("sum_value").alias("v"), F.col("win_end").alias("s"))
    return seq.unionByName(win)


def q_ann_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three ANN index families under one variant column (operators/ann.py):
    single-table LSH (the deliberately recall-poor baseline), multi-table
    multiprobe LSH (the production path), and IVF (coarse-centroid cells,
    n_probe=4 of 16) — one driver row per the 50-row cap, each arm checked
    against its own oracle (inline hyperplane SQL / golden / golden)."""
    a = q_ann_lsh(spark, sf_dir).select(
        F.lit("single").alias("variant"), "query_id", "vec_id", "cosine", "rank")
    b = q_ann_lsh_multi(spark, sf_dir).select(
        F.lit("multi").alias("variant"), "query_id", "vec_id", "cosine", "rank")
    c = q_ann_ivf(spark, sf_dir).select(
        F.lit("ivf").alias("variant"), "query_id", "vec_id", "cosine", "rank")
    return a.unionByName(b).unionByName(c)


def q_media_meta_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_media metadata ⋈ resize_media on (doc_id, span_idx, kind) — the
    resized dims/sha1 carried next to the decoded originals — PLUS the REAL-codec
    columns: the same spans with actual PNG payloads (codecs.py pure-stdlib
    encoder), dimensions parsed from the IHDR by decode_media(impl='real') and
    resize = decode → nearest-neighbor → re-encode by resize_media(impl='real').
    PLUS (round 7, 50-row cap) the frame/window-sampling arms previously on
    their own row: variant 'meta' carries the join above; 'frames_fake' /
    'frames_real' carry q_media_frames' per-(sha1, t_ms) fingerprints and the
    real PCM-window fingerprints (codecs.py WAVE decode). PLUS (round 7) the
    'meta_jpeg' arm: the SAME image spans carried as baseline JFIF
    (codecs.jpeg_encode, seed-varied 4:4:4/4:2:0 + restart layouts) through
    decode_media/resize_media(impl='real') — dimensions from SOF, resize =
    scan decode → NN → JPEG re-encode — so the in-sandbox JPEG codec executes
    through the distributed operators under the driver gate. One driver row
    gates the fake plumbing, the real PNG path, the real JPEG path, AND the
    frame sampler."""
    from lingvo_spark_kg.operators.docsgen import docs_from_documents_table
    from lingvo_spark_kg.operators.multimodal import (decode_media, media_payloads,
                                                      resize_media)
    from lingvo_spark_kg.operators.tokenize import media_spans

    r = q_media_resized(spark, sf_dir).select(
        "doc_id", "span_idx", "kind",
        F.col("width").alias("r_width"), F.col("height").alias("r_height"),
        "resized_sha1")
    fake = q_media_meta(spark, sf_dir).join(r, ["doc_id", "span_idx", "kind"])

    real_payloads = media_payloads(
        media_spans(docs_from_documents_table(spark, sf_dir)), codec="real")
    real_meta = decode_media(real_payloads, impl="real").select(
        "doc_id", "span_idx", "kind",
        F.col("n_bytes").alias("real_n_bytes"), F.col("sha1").alias("real_sha1"),
        F.col("width").alias("real_width"), F.col("height").alias("real_height"),
        F.col("duration_ms").alias("real_duration_ms"))
    real_rs = resize_media(real_payloads, width=32, height=32, impl="real").select(
        "doc_id", "span_idx", "kind",
        F.col("resized_sha1").alias("real_resized_sha1"))
    meta = (fake.join(real_meta, ["doc_id", "span_idx", "kind"])
                .join(real_rs, ["doc_id", "span_idx", "kind"])
            .select(F.lit("meta").alias("variant"), "*")
            .withColumn("frame_idx", F.lit(None).cast("int"))
            .withColumn("t_ms", F.lit(None).cast("int"))
            .withColumn("frame_sha1", F.lit(None).cast("string")))
    null_i = F.lit(None).cast("int")
    null_s = F.lit(None).cast("string")
    jpeg_payloads = media_payloads(
        media_spans(docs_from_documents_table(spark, sf_dir)),
        codec="real_jpeg")
    jm = decode_media(jpeg_payloads, impl="real").select(
        "doc_id", "span_idx", "kind",
        F.col("n_bytes").alias("real_n_bytes"), F.col("sha1").alias("real_sha1"),
        F.col("width").alias("real_width"), F.col("height").alias("real_height"),
        F.col("duration_ms").alias("real_duration_ms"))
    jr = resize_media(jpeg_payloads, width=32, height=32, impl="real").select(
        "doc_id", "span_idx", "kind",
        F.col("resized_sha1").alias("real_resized_sha1"))
    meta_jpeg = (jm.join(jr, ["doc_id", "span_idx", "kind"]).select(
        F.lit("meta_jpeg").alias("variant"), "doc_id", "span_idx", "kind",
        null_i.alias("n_bytes"), null_s.alias("sha1"), null_i.alias("width"),
        null_i.alias("height"), null_i.alias("duration_ms"),
        null_i.alias("r_width"), null_i.alias("r_height"),
        null_s.alias("resized_sha1"),
        "real_n_bytes", "real_sha1", "real_width", "real_height",
        "real_duration_ms", "real_resized_sha1",
        null_i.alias("frame_idx"), null_i.alias("t_ms"),
        null_s.alias("frame_sha1")))
    frames = q_media_frames(spark, sf_dir).select(
        F.concat(F.lit("frames_"), F.col("variant")).alias("variant"),
        "doc_id", "span_idx", null_s.alias("kind"),
        null_i.alias("n_bytes"), null_s.alias("sha1"), null_i.alias("width"),
        null_i.alias("height"), null_i.alias("duration_ms"),
        null_i.alias("r_width"), null_i.alias("r_height"),
        null_s.alias("resized_sha1"), null_i.alias("real_n_bytes"),
        null_s.alias("real_sha1"), null_i.alias("real_width"),
        null_i.alias("real_height"), null_i.alias("real_duration_ms"),
        null_s.alias("real_resized_sha1"),
        "frame_idx", "t_ms", "frame_sha1")
    return meta.unionByName(meta_jpeg).unionByName(frames)


def q_prf_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label P/R/F1 rows + a '__macro__' summary row (A1 + A2 in one row):
    the macro row carries the included-label count sums and the macro-averaged
    precision/recall/f1 from metrics.macro_f1."""
    from lingvo_spark_kg.operators.metrics import SPECIAL_LABELS, macro_f1, per_label_prf

    hyp, ref = _rule_taggings(spark, sf_dir)
    p = per_label_prf(hyp, ref)
    base = p.select(
        "label",
        F.col("n_hyp").cast("long").alias("n_hyp"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_both").cast("long").alias("n_both"),
        "precision", "recall", "f1")
    sums = base.where(~F.col("label").isin(*SPECIAL_LABELS)).agg(
        F.sum("n_hyp").cast("long").alias("n_hyp"),
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("n_both").cast("long").alias("n_both"))
    macro_row = sums.crossJoin(macro_f1(p)).select(
        F.lit("__macro__").alias("label"), "n_hyp", "n_ref", "n_both",
        F.col("macro_precision").alias("precision"),
        F.col("macro_recall").alias("recall"),
        F.col("macro_f1").alias("f1"))
    return base.unionByName(macro_row)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_triples": q_kg_triples,
        "kg_sentences": q_kg_sentences,
        "kg_sentences_full": q_kg_sentences_full,
        "tag_chunked": q_tag_chunked,
        "result_vm": q_result_vm,
        "kg_links": q_kg_links,
        "kg_canonical": q_kg_canonical,
        "kg_edges": q_kg_edges,
        "kg_edges_dnn": q_kg_edges_dnn,
        "kg_nodes": q_kg_nodes,
        "kg_degree": q_kg_degree,
        "kg_pagerank": q_kg_pagerank,
        "kg_paths": q_kg_paths,
        "kg_graph_query": q_kg_graph_query,
        "kg_graph_analytics": q_kg_graph_analytics,
        "kg_edges_incremental": q_kg_edges_incremental,
        "pack_contexts": q_pack_contexts,
        "kg_invariant": q_kg_invariant,
        "kg_mentions": q_kg_mentions,
        "kg_urls": q_kg_urls,
        "tag_bilstm_s2s": q_tag_bilstm_s2s,
        "tag_bilstm_crf": q_tag_bilstm_crf,
        # tag_probs (NumPy) FOLDED into tag_probs_onnx (round 7, 50-row cap):
        # the onnx row compares the exported graph against the SAME
        # independent pure-Python golden the NumPy row used — a superset gate
        # (wire format + executor in the loop); the NumPy path keeps its own
        # pytest golden compare (tests/test_round7.py)
        "tag_probs_onnx": q_tag_probs_onnx,
        "tag_transformer": q_tag_transformer,
        "kg_links_fuzzy": q_kg_links_fuzzy,
        # media_frames FOLDED into media_meta_resized (round 7, 50-row cap):
        # the frames arms ride the same row under variant frames_fake/frames_real
        "media_meta_resized": q_media_meta_resized,
        "media_embeddings": q_media_embeddings,
        "train_history": q_train_history,
        "train_history_transformer": q_train_history_transformer,
        "dedup_exact": q_dedup_exact,
        "doc_stats": q_doc_stats,
        "token_rep_stats": q_token_rep_stats,
        "doc_hashes": q_doc_hashes,
        "winnow_fp": q_winnow_fp,
        "winnow_neardup": q_winnow_neardup,
        "decontaminate": q_decontaminate,
        "doc_samples": q_doc_samples,
        "redact_pii": q_redact_pii,
        "minhash_bands": q_minhash_bands,
        "neardup_pairs": q_neardup_pairs,
        "dedup_survivors": q_dedup_survivors,
        "ann_topk": q_ann_topk,
        "ann_all": q_ann_all,
        "emb_neardup": q_emb_neardup,
        "prf_metrics": q_prf_all,
        "vocab_build": q_vocab_build,
        "corpus_stats": q_corpus_stats,
        "event_analytics": q_event_analytics,
        "curated_docs": q_curated_docs,
        "conll_sentences": q_conll_sentences,
    }


# ---------------------------------------------------------------- oracles

def _pagerank_oracle_sql(edges_path: str, damping: float = 0.85,
                         n_iter: int = 20) -> str:
    """graph.pagerank's recurrence unrolled as a DuckDB CTE chain over the golden
    edges parquet. Every float expression mirrors the Spark side's IEEE op order
    (CAST(... AS DOUBLE) everywhere — DuckDB would otherwise treat 0.85 as exact
    DECIMAL and diverge); per-group sum ORDER still differs between engines, so
    the comparison grid is integer nano-units (drift ~1e-14 ≪ 1e-9). Every CTE
    is AS MATERIALIZED: DuckDB otherwise inlines CTEs view-style, and r{i}
    referencing r{i-1} twice (via c{i} and d{i}) makes the inlined plan grow
    2^n_iter base scans — observed as fd exhaustion at n_iter=20."""
    d = "CAST(0.85 AS DOUBLE)"
    n = "(SELECT n FROM cnt)"
    assert damping == 0.85 and n_iter == 20, "oracle literals are pinned"
    parts = [
        "e AS MATERIALIZED (SELECT src_id, dst_id, CAST(n_occurrences AS DOUBLE) AS w "
        f"FROM read_parquet('{edges_path}'))",
        "nodes AS MATERIALIZED (SELECT DISTINCT node_id FROM ("
        "SELECT src_id AS node_id FROM e UNION ALL SELECT dst_id AS node_id FROM e))",
        "cnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outw AS MATERIALIZED (SELECT src_id, SUM(w) AS out_w FROM e GROUP BY src_id)",
        "share AS MATERIALIZED (SELECT src_id, dst_id, w / out_w AS share "
        "FROM e JOIN outw USING (src_id))",
        f"r0 AS MATERIALIZED (SELECT node_id, CAST(1 AS DOUBLE) / {n} AS rank FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT s.dst_id AS node_id, SUM(r.rank * s.share) AS contrib"
            f" FROM share s JOIN r{i-1} r ON s.src_id = r.node_id GROUP BY s.dst_id)")
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), CAST(0 AS DOUBLE)) AS dmass"
            f" FROM r{i-1} WHERE node_id NOT IN (SELECT src_id FROM outw))")
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT nd.node_id, (CAST(1 AS DOUBLE) - {d}) / {n}"
            f" + {d} * (COALESCE(c.contrib, CAST(0 AS DOUBLE)) + dmass / {n}) AS rank"
            f" FROM nodes nd LEFT JOIN c{i} c USING (node_id) CROSS JOIN d{i})")
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT node_id, CAST(round(rank * CAST(1000000000 AS DOUBLE)) "
            f"AS BIGINT) AS rank_e9 FROM r{n_iter}")

def _graph_query_oracle_sql(edges_path: str) -> str:
    """The twenty-three kg_graph_query arms lowered to plain/recursive SQL over the
    golden edges parquet (q_kg_graph_query's docstring maps arm → algebra).
    Predicates are derived in-query (top-2 by count, pred-asc ties), matching
    the Spark side's deterministic choice."""
    return f"""
        WITH RECURSIVE
        ge AS MATERIALIZED (SELECT src_id AS s, pred AS p, dst_id AS d
                            FROM read_parquet('{edges_path}')),
        t1 AS MATERIALIZED (SELECT p FROM ge GROUP BY p
                            ORDER BY COUNT(*) DESC, p LIMIT 1),
        t2 AS MATERIALIZED (SELECT p FROM ge GROUP BY p
                            ORDER BY COUNT(*) DESC, p LIMIT 1 OFFSET 1),
        clo(s, d) AS (
            SELECT s, d FROM ge WHERE p = (SELECT p FROM t1)
            UNION SELECT clo.s, ge.d FROM clo
            JOIN ge ON ge.s = clo.d AND ge.p = (SELECT p FROM t1)),
        nodes AS (SELECT s AS n FROM ge UNION SELECT d FROM ge),
        gocc AS MATERIALIZED (SELECT src_id AS s, pred AS p, dst_id AS d,
                              n_occurrences AS occ
                              FROM read_parquet('{edges_path}')),
        old_e AS MATERIALIZED (
            SELECT s, p, d, occ % 3 + 1 AS occ FROM gocc WHERE occ > 1
            UNION ALL SELECT 'zz:x', 'zz', 'zz:y', 1)
        SELECT 'bgp2' AS variant, x.s AS a, x.d AS b, y.d AS c
          FROM ge x JOIN ge y ON y.s = x.d
         WHERE x.p = (SELECT p FROM t1) AND y.p = (SELECT p FROM t1)
        UNION ALL SELECT 'closure', s, d, NULL FROM clo
        UNION ALL SELECT 'star', s, d, NULL
          FROM (SELECT s, d FROM clo UNION SELECT n, n FROM nodes)
        UNION ALL SELECT 'inverse', d, s, NULL FROM ge
          WHERE p = (SELECT p FROM t1)
        UNION ALL SELECT 'optional', w.s, w.d, t.d
          FROM ge w LEFT JOIN ge t ON t.s = w.d AND t.p = (SELECT p FROM t2)
         WHERE w.p = (SELECT p FROM t1)
        UNION ALL SELECT 'alt', s, d, NULL FROM ge
          WHERE p IN (SELECT p FROM t1 UNION ALL SELECT p FROM t2)
        UNION ALL SELECT 'seq', x.s, y.d, NULL FROM ge x JOIN ge y ON y.s = x.d
          WHERE x.p = (SELECT p FROM t1) AND y.p = (SELECT p FROM t1)
        UNION ALL SELECT 'filter', s, d, NULL FROM ge
          WHERE p = (SELECT p FROM t1) AND s < d
        UNION ALL SELECT 'union', s, d, NULL FROM ge
          WHERE p = (SELECT p FROM t1)
        UNION ALL SELECT 'union', s, NULL, d FROM ge
          WHERE p = (SELECT p FROM t2)
        UNION ALL SELECT 'minus', w.s, w.d, NULL FROM ge w
          WHERE w.p = (SELECT p FROM t1) AND NOT EXISTS (
            SELECT 1 FROM ge b WHERE b.p = (SELECT p FROM t2)
              AND b.s = w.s)
        UNION ALL SELECT 'values', s, d, NULL FROM ge
          WHERE p = (SELECT p FROM t1) AND s IN (
            SELECT DISTINCT s FROM ge WHERE p = (SELECT p FROM t1)
            ORDER BY s LIMIT 2)
        UNION ALL SELECT 'nps', s, d, NULL FROM ge
          WHERE p <> (SELECT p FROM t1)
        UNION ALL SELECT 'npsmix', s, d, NULL FROM ge
          WHERE p <> (SELECT p FROM t1)
        UNION ALL SELECT 'npsmix', d, s, NULL FROM ge
          WHERE p <> (SELECT p FROM t2)
        UNION ALL SELECT 'exists', w.s, w.d, NULL FROM ge w
          WHERE w.p = (SELECT p FROM t1) AND EXISTS (
            SELECT 1 FROM ge b WHERE b.p = (SELECT p FROM t2)
              AND b.s = w.d)
        UNION ALL SELECT 'bindmod', s, d, s || '>' || d
          FROM (SELECT s, d FROM ge WHERE p = (SELECT p FROM t1)
                ORDER BY s, d LIMIT 50) q
        UNION ALL SELECT 'groupagg', s, MAX(d), CAST(COUNT(*) AS VARCHAR)
          FROM ge WHERE p = (SELECT p FROM t1)
          GROUP BY s HAVING MAX(d) IS NOT NULL
        UNION ALL SELECT 'sparqltxt', s, d, s || '~' || d
          FROM (SELECT s, d FROM ge w WHERE p = (SELECT p FROM t1)
                  AND EXISTS (SELECT 1 FROM ge b
                              WHERE b.p = (SELECT p FROM t2) AND b.s = w.d)
                ORDER BY s, d LIMIT 30) q
        UNION ALL SELECT 'subq', w.s, w.d, w.d || '#' || CAST(q.n AS VARCHAR)
          FROM ge w JOIN (SELECT s, COUNT(*) AS n FROM ge
                          WHERE p = (SELECT p FROM t1) GROUP BY s) q
            ON q.s = w.s
         WHERE w.p = (SELECT p FROM t1)
        UNION ALL SELECT 'gconcat', s, MIN(d), string_agg(d, ',' ORDER BY d)
          FROM ge WHERE p = (SELECT p FROM t1) GROUP BY s
        UNION ALL SELECT 'ask',
               CASE WHEN EXISTS (SELECT 1 FROM ge x JOIN ge y ON y.s = x.d
                                 WHERE x.p = (SELECT p FROM t1)
                                   AND y.p = (SELECT p FROM t2))
                    THEN 'true' ELSE 'false' END, NULL, NULL
        UNION ALL SELECT 'describe', s, d, p || '|' || CAST(occ AS VARCHAR)
          FROM gocc WHERE s = (SELECT LEAST(MIN(s), MIN(d)) FROM ge)
                       OR d = (SELECT LEAST(MIN(s), MIN(d)) FROM ge)
        UNION ALL SELECT 'update', s, d, p || '|' || CAST(occ AS VARCHAR)
          FROM gocc WHERE p <> (SELECT p FROM t2)
        UNION ALL SELECT 'update', s, d,
               (SELECT p FROM t2) || '_v2' || '|1'
          FROM (SELECT DISTINCT s, d FROM gocc
                WHERE p = (SELECT p FROM t2)) q
        UNION ALL SELECT 'diff', COALESCE(o.s, n.s), COALESCE(o.d, n.d),
               COALESCE(o.p, n.p) || '|' ||
               CASE WHEN o.occ IS NULL THEN 'added'
                    WHEN n.occ IS NULL THEN 'removed'
                    WHEN o.occ <> n.occ THEN 'changed'
                    ELSE 'unchanged' END || '|' ||
               COALESCE(CAST(o.occ AS VARCHAR), '-') || '|' ||
               COALESCE(CAST(n.occ AS VARCHAR), '-')
          FROM old_e o FULL JOIN gocc n
            ON n.s = o.s AND n.p = o.p AND n.d = o.d
    """


def _graph_analytics_oracle_sql(edges_path: str, lpa_iters: int = 8) -> str:
    """The four kg_graph_analytics arms as the SAME recurrences in DuckDB over
    the golden edges: LPA unrolled ``lpa_iters`` materialized stages (integer
    voting, QUALIFY argmax with n DESC / label ASC — Spark's min-struct
    mirror), BFS / CC / Bellman-Ford as recursive CTEs with MIN aggregation.
    SSSP weights are n_occurrences % 7 + 1, so the (node, cost) walk state is
    bounded by 7·|nodes| at every tier; all arithmetic integer-exact. The
    coreness arm unrolls ``core_iters`` h-index stages (init = degree; the
    Spark side is capped at the SAME 30 rounds, so converged-or-not both
    engines compare the identical recurrence depth); the walks
    arm unrolls walk_len=4 argmin-of-md5 steps — Spark's min(struct(md5, nbr))
    is DuckDB's ROW_NUMBER over (md5 ASC, nbr ASC), comparing identical hex
    strings of identical concat_ws inputs."""
    parts = [
        "ge AS MATERIALIZED (SELECT src_id, pred, dst_id, n_occurrences "
        f"FROM read_parquet('{edges_path}'))",
        "u0 AS MATERIALIZED (SELECT DISTINCT LEAST(src_id, dst_id) AS u, "
        "GREATEST(src_id, dst_id) AS v FROM ge WHERE src_id <> dst_id)",
        "nb AS MATERIALIZED (SELECT u AS node, v AS nbr FROM u0 "
        "UNION ALL SELECT v, u FROM u0)",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM nb)",
    ]
    for i in range(1, lpa_iters + 1):
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT node, label, SUM(w) AS n FROM ("
            f"SELECT nb.node, l.label, 1 AS w FROM nb JOIN l{i-1} l "
            f"ON l.node = nb.nbr UNION ALL SELECT node, label, 1 FROM l{i-1}"
            ") GROUP BY node, label)")
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT node, label FROM v{i} QUALIFY "
            "ROW_NUMBER() OVER (PARTITION BY node "
            "ORDER BY n DESC, label ASC) = 1)")
    parts += [
        "allnodes AS MATERIALIZED (SELECT DISTINCT src_id AS n FROM ge "
        "UNION SELECT dst_id FROM ge)",
        "src0 AS MATERIALIZED (SELECT MIN(n) AS n FROM allnodes)",
        "bfs(node, dist) AS (SELECT n, 0 FROM src0 UNION "
        "SELECT nb.nbr, bfs.dist + 1 FROM bfs JOIN nb ON nb.node = bfs.node "
        "WHERE bfs.dist < 20)",
        "sym AS MATERIALIZED (SELECT DISTINCT src_id AS a, dst_id AS b FROM ge "
        "UNION SELECT dst_id, src_id FROM ge)",
        "reach(v, r) AS (SELECT n, n FROM allnodes UNION "
        "SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.v)",
        "arcs AS MATERIALIZED (SELECT node, nbr, CAST(MIN(w) AS BIGINT) AS w "
        "FROM (SELECT src_id AS node, dst_id AS nbr, n_occurrences % 7 + 1 AS w "
        "FROM ge UNION ALL SELECT dst_id, src_id, n_occurrences % 7 + 1 FROM ge) "
        "WHERE node <> nbr GROUP BY node, nbr)",
        "cap AS MATERIALIZED (SELECT 7 * COUNT(*) AS c FROM allnodes)",
        "sp(node, cost) AS (SELECT n, CAST(0 AS BIGINT) FROM src0 UNION "
        "SELECT arcs.nbr, sp.cost + arcs.w FROM sp JOIN arcs "
        "ON arcs.node = sp.node WHERE sp.cost + arcs.w < (SELECT c FROM cap))",
        # coreness: init = degree, then core_iters unrolled h-index stages
        "k0 AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM nb GROUP BY node)",
    ]
    core_iters = 30
    for i in range(1, core_iters + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT node, "
            "CAST(MAX(LEAST(rn, v)) AS BIGINT) AS c FROM ("
            "SELECT nb.node, p.c AS v, ROW_NUMBER() OVER ("
            "PARTITION BY nb.node ORDER BY p.c DESC, nb.nbr ASC) AS rn "
            f"FROM nb JOIN k{i-1} p ON p.node = nb.nbr) GROUP BY node)")
    # walks: frontier = every non-isolated node × walk 0/1; per step the next
    # hop is the md5-argmin neighbor (rep always '1' in unweighted mode)
    parts.append(
        "w0 AS MATERIALIZED (SELECT start_id, wi AS walk_idx, "
        "start_id AS cur FROM (SELECT DISTINCT node AS start_id FROM nb) s, "
        "(VALUES (0), (1)) t(wi))")
    for t in range(1, 5):
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT start_id, walk_idx, nbr AS cur "
            "FROM (SELECT w.start_id, w.walk_idx, nb.nbr, ROW_NUMBER() OVER ("
            "PARTITION BY w.start_id, w.walk_idx ORDER BY "
            f"md5(concat_ws(':', '42', w.start_id, w.walk_idx, '{t}', "
            "nb.nbr, '1')) ASC, nb.nbr ASC) AS rn "
            f"FROM w{t-1} w JOIN nb ON nb.node = w.cur) WHERE rn = 1)")
    walk_union = " UNION ALL ".join(
        f"SELECT 'walks', start_id, cur, CAST(walk_idx * 16 + {t} AS BIGINT) "
        f"FROM w{t}" for t in range(0, 5))
    # community_stats over the SAME l8 LPA assignment (induced == full here:
    # every u0 endpoint is l8-assigned)
    parts += [
        f"ctg AS MATERIALIZED (SELECT u0.u, u0.v, cu.label AS cu_l, "
        f"cv.label AS cv_l FROM u0 JOIN l{lpa_iters} cu ON cu.node = u0.u "
        f"JOIN l{lpa_iters} cv ON cv.node = u0.v)",
        "cintra AS MATERIALIZED (SELECT cu_l AS com, COUNT(*) AS n FROM ctg "
        "WHERE cu_l = cv_l GROUP BY 1)",
        "cbnd AS MATERIALIZED (SELECT com, COUNT(*) AS n FROM ("
        "SELECT cu_l AS com FROM ctg WHERE cu_l <> cv_l "
        "UNION ALL SELECT cv_l FROM ctg WHERE cu_l <> cv_l) GROUP BY 1)",
        "cdeg AS MATERIALIZED (SELECT node, COUNT(*) AS dg FROM ("
        "SELECT u AS node FROM ctg UNION ALL SELECT v FROM ctg) GROUP BY 1)",
        f"cmem AS MATERIALIZED (SELECT label AS com, COUNT(*) AS n_nodes, "
        f"COALESCE(SUM(dg), 0) AS degree_sum FROM l{lpa_iters} l "
        "LEFT JOIN cdeg ON cdeg.node = l.node GROUP BY 1)",
        # predicate_stats / 2-hop ego ball / link-prediction wedges
        "pstat AS MATERIALIZED (SELECT pred, COUNT(*) AS n_edges, "
        "COUNT(DISTINCT src_id) AS n_src, COUNT(DISTINCT dst_id) AS n_dst, "
        "SUM(n_occurrences) AS s_occ, MAX(n_occurrences) AS m_occ "
        "FROM ge GROUP BY pred)",
        "ball2 AS MATERIALIZED (SELECT node FROM bfs GROUP BY node "
        "HAVING MIN(dist) <= 2)",
        "ctr AS MATERIALIZED (SELECT nb.node, nb.nbr FROM nb "
        "JOIN k0 ON k0.node = nb.node WHERE k0.c <= 1000)",
        "lpr AS MATERIALIZED (SELECT x.nbr AS a, y.nbr AS b, "
        "COUNT(*) AS n_common FROM ctr x JOIN ctr y "
        "ON x.node = y.node AND x.nbr < y.nbr GROUP BY 1, 2 "
        "HAVING COUNT(*) >= 1)",
        # Brandes forward σ-BFS from the two smallest node ids: 8 unrolled
        # frontier stages (bp = new frontier with path-count sums, bc =
        # cumulative settled), matching Spark's shortest_path_counts exactly
        # DISTINCT is load-bearing: under WITH RECURSIVE, DuckDB treats the
        # allnodes `SELECT ... UNION SELECT ...` as a recursive definition
        # and materializes it with duplicates (harmless to the MIN/GROUP BY
        # consumers above, fatal to a LIMIT 2 pivot pick)
        "bsrc AS MATERIALIZED (SELECT DISTINCT n FROM allnodes "
        "ORDER BY n LIMIT 2)",
        # the rules arm: linear recursive closure equivalent of the two-rule
        # semi-naive program (p1-transitivity + p2-extension through p1)
        "rt1 AS MATERIALIZED (SELECT pred FROM ge GROUP BY pred "
        "ORDER BY COUNT(*) DESC, pred LIMIT 1)",
        "rt2 AS MATERIALIZED (SELECT pred FROM ge GROUP BY pred "
        "ORDER BY COUNT(*) DESC, pred LIMIT 1 OFFSET 1)",
        "rli(tag, s, d) AS (SELECT pred, src_id, dst_id FROM ge "
        "WHERE pred IN ((SELECT pred FROM rt1), (SELECT pred FROM rt2)) "
        "UNION SELECT i.tag, i.s, g.dst_id FROM rli i "
        "JOIN ge g ON g.src_id = i.d AND g.pred = (SELECT pred FROM rt1))",
        "bp0 AS MATERIALIZED (SELECT n AS src, n AS node, "
        "CAST(1 AS BIGINT) AS sigma FROM bsrc)",
        "bc0 AS MATERIALIZED (SELECT src, node, 0 AS dist, sigma FROM bp0)",
    ]
    for t in range(1, 9):
        parts.append(
            f"bp{t} AS MATERIALIZED (SELECT p.src, nb.nbr AS node, "
            f"SUM(p.sigma) AS sigma FROM bp{t-1} p JOIN nb ON nb.node = "
            f"p.node WHERE NOT EXISTS (SELECT 1 FROM bc{t-1} c "
            "WHERE c.src = p.src AND c.node = nb.nbr) GROUP BY p.src, nb.nbr)")
        parts.append(
            f"bc{t} AS MATERIALIZED (SELECT * FROM bc{t-1} UNION ALL "
            f"SELECT src, node, {t}, sigma FROM bp{t})")
    return ("WITH RECURSIVE " + ",\n".join(parts) + f"""
        SELECT 'lpa' AS variant, node AS node_id, label AS val_s,
               CAST(NULL AS BIGINT) AS val_l FROM l{lpa_iters}
        UNION ALL SELECT 'bfs', node, NULL, CAST(MIN(dist) AS BIGINT)
          FROM bfs GROUP BY node
        UNION ALL SELECT 'cc', v, MIN(r), NULL FROM reach GROUP BY v
        UNION ALL SELECT 'sssp', node, NULL, CAST(MIN(cost) AS BIGINT)
          FROM sp GROUP BY node
        UNION ALL SELECT 'coreness', node, NULL, c FROM k{core_iters}
        UNION ALL {walk_union}
        UNION ALL SELECT 'commstats', cmem.com, NULL,
               CAST(((cmem.n_nodes * 100000 + COALESCE(cintra.n, 0)) * 100000
                     + COALESCE(cbnd.n, 0)) * 100000 + cmem.degree_sum
                    AS BIGINT)
          FROM cmem LEFT JOIN cintra ON cintra.com = cmem.com
          LEFT JOIN cbnd ON cbnd.com = cmem.com
        UNION ALL SELECT 'predstats', pred,
               concat_ws('|', n_edges, n_src, n_dst, s_occ, m_occ), NULL
          FROM pstat
        UNION ALL SELECT 'ego', ge.src_id,
               concat_ws('|', ge.pred, ge.dst_id), NULL FROM ge
          WHERE ge.src_id IN (SELECT node FROM ball2)
            AND ge.dst_id IN (SELECT node FROM ball2)
        UNION ALL SELECT 'linkpred', lpr.a,
               concat_ws('|', lpr.b, lpr.n_common, da.c, db.c, lpr.n_common,
                         da.c + db.c - lpr.n_common,
                         CASE WHEN ux.u IS NOT NULL THEN 1 ELSE 0 END), NULL
          FROM lpr JOIN k0 da ON da.node = lpr.a
          JOIN k0 db ON db.node = lpr.b
          LEFT JOIN u0 ux ON ux.u = lpr.a AND ux.v = lpr.b
        UNION ALL SELECT 'brandes', node,
               src || '|' || CAST(dist AS VARCHAR), CAST(sigma AS BIGINT)
          FROM bc8
        UNION ALL SELECT 'rules', s, tag || '|' || d, NULL FROM rli
    """)


def _golden_oracles() -> dict[str, str]:
    """DuckDB oracles for the non-SQL-expressible queries: single-node pure-Python
    golden results materialized as parquet (lingvo_spark_kg/golden.py), compared via
    read_parquet — rows/schema/hash become a hard signal for the KG/tagger core.
    The driver compares at sf0.01; override with SPARK_GRAFT_ORACLE_SF_DIR when
    checking locally at another scale (tools/check_oracles.py does)."""
    import os

    from lingvo_spark_kg import golden

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out_dir = _goldens_dir(sf_dir)
    paths = golden.ensure_goldens(sf_dir, out_dir)
    out = {n: f"SELECT * FROM read_parquet('{p}')" for n, p in paths.items()}
    # media_meta + media_resized + the REAL-codec golden + BOTH frame-sampling
    # goldens are ONE combined driver row (50-row cap): variant 'meta' joins the
    # span-keyed goldens (resized dims/sha1 under r_-prefixed names, real PNG
    # metadata/resize under real_-prefixed names); variants 'frames_fake' /
    # 'frames_real' carry the frame fingerprints with the meta columns NULL
    del (out["media_meta"], out["media_resized"], out["media_real"],
         out["media_frames"], out["media_frames_real"],
         out["media_real_jpeg"])
    out["media_meta_resized"] = f"""
        SELECT 'meta' AS variant, m.*,
               r.width AS r_width, r.height AS r_height, r.resized_sha1,
               g.real_n_bytes, g.real_sha1, g.real_width, g.real_height,
               g.real_duration_ms, g.real_resized_sha1,
               CAST(NULL AS INTEGER) AS frame_idx, CAST(NULL AS INTEGER) AS t_ms,
               CAST(NULL AS VARCHAR) AS frame_sha1
        FROM read_parquet('{paths["media_meta"]}') m
        JOIN read_parquet('{paths["media_resized"]}') r
          USING (doc_id, span_idx, kind)
        JOIN read_parquet('{paths["media_real"]}') g
          USING (doc_id, span_idx, kind)
        UNION ALL
        SELECT 'meta_jpeg', doc_id, span_idx, kind, NULL, NULL, NULL, NULL,
               NULL, NULL, NULL, NULL, real_n_bytes, real_sha1, real_width,
               real_height, real_duration_ms, real_resized_sha1,
               NULL, NULL, NULL
        FROM read_parquet('{paths["media_real_jpeg"]}')
        UNION ALL
        SELECT 'frames_fake', doc_id, span_idx, NULL, NULL, NULL, NULL, NULL,
               NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
               frame_idx, t_ms, frame_sha1
        FROM read_parquet('{paths["media_frames"]}')
        UNION ALL
        SELECT 'frames_real', doc_id, span_idx, NULL, NULL, NULL, NULL, NULL,
               NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
               frame_idx, t_ms, frame_sha1
        FROM read_parquet('{paths["media_frames_real"]}')
    """
    # the three ANN index families under one variant column (the single-table SQL
    # oracle embeds the hyperplanes; the multi-table and IVF sides are goldens)
    del out["ann_lsh_multi"], out["ann_ivf"]
    out["ann_all"] = f"""
        SELECT 'single' AS variant, query_id, vec_id, cosine, rank
        FROM ({_ann_lsh_oracle()})
        UNION ALL
        SELECT 'multi' AS variant, query_id, vec_id, cosine, rank
        FROM read_parquet('{paths["ann_lsh_multi"]}')
        UNION ALL
        SELECT 'ivf' AS variant, query_id, vec_id, cosine, rank
        FROM read_parquet('{paths["ann_ivf"]}')
    """
    # the DNN-regimen edges query is checked against the SAME golden the lexicon
    # path uses — the trained demo models reproduce the lexicon regimen, so a green
    # row is cross-regimen end-to-end equality, not a second mirror
    out["kg_edges_dnn"] = out["kg_edges"]
    # S5: models round-tripped through the reference .s2s wire format must tag
    # identically to the in-memory pinned pair — same golden, zero-drift gate.
    # The plain tag_bilstm row is FOLDED into this one (50-row cap): s2s is a
    # strict superset gate — the identical M6 kernel + reshape, with the wire
    # format in the loop — checked against the identical golden parquet.
    out["tag_bilstm_s2s"] = out.pop("tag_bilstm")
    # incremental maintenance ≡ full recompute: same golden as the batch kg_edges
    # row, minus n_docs (sketch estimate vs the golden's exact countDistinct;
    # sketch-mode merge exactness is pinned in tests/test_incremental.py)
    out["kg_edges_incremental"] = f"""
        SELECT src_id, pred, dst_id, n_occurrences, avg_confidence, example_doc_id
        FROM read_parquet('{paths["kg_edges"]}')
    """
    # the exported-ONNX probability path must be bit-identical to the native
    # kernel's — same tag_probs golden (shared probs_from_logits post-processing
    # over bit-parity logits). The plain tag_probs row is FOLDED into this one
    # (round 7, 50-row cap): the golden is an independent pure-Python mirror,
    # so the onnx row is the strict-superset gate (wire format + executor in
    # the loop); the NumPy path keeps a pytest golden compare (test_round7.py)
    out["tag_probs_onnx"] = out.pop("tag_probs")
    # S11 nodes: build_nodes is a pure aggregation of the canonical map, so its
    # oracle is SQL over the kg_canonical golden (max-struct → rank-1 row; Spark
    # max(struct) = largest (n_mentions, mention_norm, mention_type) tuple)
    out["kg_nodes"] = f"""
        WITH c AS (SELECT * FROM read_parquet('{paths["kg_canonical"]}')),
        ranked AS (
          SELECT *, row_number() OVER (
                      PARTITION BY canonical_id
                      ORDER BY n_mentions DESC, mention_norm DESC,
                               mention_type DESC) AS rn
          FROM c),
        agg AS (
          SELECT canonical_id, sum(n_mentions)::BIGINT AS n_mentions,
                 count(*) AS n_surfaces, min(entity_id) AS entity_id
          FROM c GROUP BY 1)
        SELECT a.canonical_id, r.mention_norm AS label,
               r.mention_type AS node_type, a.n_mentions, a.n_surfaces, a.entity_id
        FROM agg a JOIN ranked r ON r.canonical_id = a.canonical_id AND r.rn = 1
    """
    # Graph local structure, two arms under one variant column: the degree
    # histogram arm reads the pure-Python golden mirror (unchanged signal); the
    # triangle arm is a brute-force ordered-triple self-join over the golden
    # edges — engine-vs-engine vs Spark's degree-ordered wedge closing. Ordered
    # enumeration counts each triangle once under ANY strict total order, so
    # the two engines' string collations cannot drift the counts.
    out["kg_degree"] = f"""
        WITH e AS (SELECT src_id, dst_id FROM read_parquet('{paths["kg_edges"]}')),
        und AS (SELECT DISTINCT LEAST(src_id, dst_id) AS u,
                       GREATEST(src_id, dst_id) AS v
                FROM e WHERE src_id <> dst_id),
        t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
              JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
        tri AS (SELECT node_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM (SELECT a AS node_id FROM t UNION ALL
                      SELECT b FROM t UNION ALL SELECT c FROM t)
                GROUP BY node_id)
        SELECT 'bucket' AS variant, degree_bucket, n_nodes, max_degree,
               CAST(NULL AS VARCHAR) AS node_id, CAST(NULL AS BIGINT) AS n_triangles
        FROM read_parquet('{paths["kg_degree"]}')
        UNION ALL
        SELECT 'triangle' AS variant, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT), node_id, n_triangles
        FROM tri
    """
    # PageRank: the same 20-iteration weighted recurrence the Spark operator runs
    # (graph.pagerank), unrolled as a CTE chain over the golden edges —
    # engine-vs-engine on the iteration itself, no golden mirror
    out["kg_pagerank"] = _pagerank_oracle_sql(paths["kg_edges"])
    # round 7: the graph-query and graph-analytics layers as variant-column
    # rows over the same golden edges — engine-vs-engine against DuckDB
    # running the identical algebra / recurrences (see the q_ docstrings)
    out["kg_graph_query"] = _graph_query_oracle_sql(paths["kg_edges"])
    out["kg_graph_analytics"] = _graph_analytics_oracle_sql(paths["kg_edges"])
    # 2-hop predicate paths: the same self-join in plain SQL over the golden edges
    # (cycles a→m→a excluded like the Spark side; SUM over BIGINT products is
    # HUGEINT in DuckDB → cast back; example_path compares byte-wise in both
    # engines — ASCII digit strings)
    out["kg_paths"] = f"""
        WITH e AS (SELECT src_id, pred, dst_id, n_occurrences
                   FROM read_parquet('{paths["kg_edges"]}'))
        SELECT e1.pred AS pred_1, e2.pred AS pred_2,
               COUNT(*) AS n_paths,
               COUNT(DISTINCT e1.dst_id) AS n_mid,
               CAST(SUM(e1.n_occurrences * e2.n_occurrences) AS BIGINT) AS support_w,
               MIN(CAST(e1.src_id AS VARCHAR) || '|' || CAST(e1.dst_id AS VARCHAR)
                   || '|' || CAST(e2.dst_id AS VARCHAR)) AS example_path
        FROM e e1 JOIN e e2 ON e1.dst_id = e2.src_id
        WHERE e1.src_id <> e2.dst_id
        GROUP BY e1.pred, e2.pred
    """
    # S2: not a golden mirror — a pure-SQL reshape of the shared raw CoNLL line
    # table (sentence segments from the running blank-line count, tab split,
    # per-segment token positions), checked engine-against-engine
    _conll, lines_pq = golden.ensure_conll_fixture(sf_dir, out_dir)
    out["conll_sentences"] = f"""
        WITH l AS (SELECT line_no, line FROM read_parquet('{lines_pq}')),
        seg AS (
          SELECT line_no, line,
                 coalesce(sum(CASE WHEN trim(line) = '' THEN 1 ELSE 0 END)
                   OVER (ORDER BY line_no
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS seg_id
          FROM l),
        tok AS (
          SELECT seg_id, line_no,
                 split_part(line, chr(9), 1) AS token,
                 split_part(line, chr(9), 2) AS label
          FROM seg WHERE trim(line) <> '')
        SELECT dense_rank() OVER (ORDER BY seg_id) - 1 AS sent_id,
               row_number() OVER (PARTITION BY seg_id ORDER BY line_no) - 1 AS tok_idx,
               token, label
        FROM tok
    """
    return out


# Shared document-feature CTE: the ONE copy of the ratio regexes and thresholds that
# lang_id, quality and curated_docs all build on (textstats.py is the Spark-side twin)
_DOC_FEATURES_CTE = r"""
f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) AS n_tokens,
         round(CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text)
           ELSE 0.0 END, 4) AS digit_ratio,
         round(CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[^.,!?;:()«»—-]', '', 'g')) * 1.0 / length(text)
           ELSE 0.0 END, 4) AS punct_ratio,
         round(CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[^а-яА-ЯёЁ]', '', 'g')) * 1.0 / length(text)
           ELSE 0.0 END, 4) AS cyr_ratio,
         round(CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
           ELSE 0.0 END, 4) AS lat_ratio
  FROM documents
)
"""

# single-surface SQL bodies reused as subqueries by the combined rows (the
# combined row IS the driver entry; these constants keep each surface's SQL in
# exactly one place)
_TOKEN_COUNT_SQL = r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) AS n_tokens,
           len(regexp_extract_all(text,
               '[a-zA-Zа-яА-ЯёЁ0-9]+|[^a-zA-Zа-яА-ЯёЁ0-9 \t\n\r\f\x0B]'))
             AS n_re_tokens,
           length(text) AS n_chars,
           CAST(floor(length(text) / 4) AS BIGINT) AS n_bpe_est
    FROM documents
"""

_REPETITION_SQL = r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS w
      FROM documents),
    b AS (
      SELECT doc_id, w,
             CASE WHEN len(w) >= 2 THEN
               [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
             ELSE [] END AS g
      FROM w),
    frac AS (
      SELECT doc_id, len(w) AS n_words,
             round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4)
               AS dup_word_frac,
             CASE WHEN len(g) > 0 THEN
               round(1.0 - len(list_distinct(g)) * 1.0 / len(g), 4)
             ELSE 0.0 END AS dup_2gram_frac
      FROM b),
    grams AS (SELECT doc_id, unnest(g) AS gram FROM b),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
    top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_g FROM gc GROUP BY 1)
    SELECT f.doc_id, f.n_words, f.dup_word_frac, f.dup_2gram_frac,
           coalesce(round(t.top_c * 1.0 / t.n_g, 4), 0.0) AS top_2gram_frac
    FROM frac f LEFT JOIN top t ON f.doc_id = t.doc_id
"""

_LEN_DIST_SQL = r"""
    SELECT CAST(floor(len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) / 10) AS BIGINT)
             AS len_bucket,
           count(*) AS n_docs
    FROM documents GROUP BY 1
"""

_WORDS_IN_DICT_SQL = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) AS token
      FROM documents),
    vocab AS (
      SELECT token, 1 AS in_dict FROM (
        SELECT token, count(*) AS cnt FROM toks GROUP BY 1
        ORDER BY cnt DESC, token ASC LIMIT 500))
    SELECT t.doc_id, count(*) AS n_tokens,
           round(sum(coalesce(v.in_dict, 0)) * 1.0 / count(*), 4)
             AS words_in_dict_ratio
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY 1
"""

_EVENT_WINDOWS_SQL = """
    SELECT user_id, event_id,
           row_number() OVER w AS seq,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 4) AS running_value,
           lag(event_type, 1) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

_EVENT_WINDOWED_AGG_SQL = """
    SELECT strftime(epoch_ms(CAST(floor(epoch(ts) / 300) * 300000 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           strftime(epoch_ms(CAST(floor(epoch(ts) / 300) * 300000 + 300000 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS win_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2, 3
"""


def _simhash_sql() -> str:
    return "WITH " + _SHINGLE_CTE + r""",
    h AS (SELECT doc_id, substr(md5(shingle), 1, 16) AS hex16 FROM sh),
    nib AS (
      SELECT doc_id, ni AS nib_idx,
             strpos('0123456789abcdef', substr(hex16, ni + 1, 1)) - 1 AS nib
      FROM h, (SELECT unnest(range(0, 16)) AS ni)),
    bits AS (
      SELECT doc_id, nib_idx,
             sum(CASE WHEN (nib // 1) % 2 = 1 THEN 1 ELSE -1 END) AS s0,
             sum(CASE WHEN (nib // 2) % 2 = 1 THEN 1 ELSE -1 END) AS s1,
             sum(CASE WHEN (nib // 4) % 2 = 1 THEN 1 ELSE -1 END) AS s2,
             sum(CASE WHEN (nib // 8) % 2 = 1 THEN 1 ELSE -1 END) AS s3
      FROM nib GROUP BY 1, 2),
    nv AS (
      SELECT doc_id, nib_idx,
             (CASE WHEN s0 > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN s1 > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN s2 > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN s3 > 0 THEN 8 ELSE 0 END) AS nib_out
      FROM bits),
    hx AS (
      SELECT doc_id,
             lower(string_agg(substr('0123456789abcdef', nib_out + 1, 1), ''
                              ORDER BY nib_idx)) AS simhash
      FROM nv GROUP BY 1)
    SELECT doc_id, simhash, substr(simhash, 1, 4) AS sim_block FROM hx
"""


def _doc_sample_strat_sql() -> str:
    case = " ".join(f"WHEN lang = '{g}' THEN '{_mix_thresh(r)}'"
                    for g, r in sorted(_MIX_RATES.items()))
    return f"""
        SELECT doc_id, lang, length(text) AS n_chars
        FROM documents
        WHERE CASE {case} ELSE '{_mix_thresh(_MIX_DEFAULT)}' END = 'g'
           OR substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) <
          CASE {case} ELSE '{_mix_thresh(_MIX_DEFAULT)}' END
    """


_QUALITY_EXPR = """
round((CASE WHEN n_chars >= 20 THEN 0.4 ELSE 0.0 END)
    + (CASE WHEN digit_ratio < 0.3 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN punct_ratio < 0.2 THEN 0.3 ELSE 0.0 END), 2)
"""

_LANG_EXPR = """
CASE WHEN cyr_ratio >= 0.3 THEN 'ru'
     WHEN lat_ratio >= 0.3 THEN 'en'
     ELSE 'other' END
"""

# winnowing fingerprints (k=7, window=4) — ONE definition for the winnow_fp and
# winnow_neardup oracles (textstats.winnow_fingerprints is the Spark-side twin)
_WINNOW_CTE = """
t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN length(s) >= 7 THEN
           [md5(substr(s, i, 7)) FOR i IN range(1, length(s) - 5)]
         ELSE [md5(s)] END AS grams
  FROM t),
w AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(grams) >= 4 THEN
           [list_min(grams[j:j+3]) FOR j IN range(1, len(grams) - 2)]
         ELSE [list_min(grams)] END) AS fps
  FROM g),
fp_rows AS (SELECT doc_id, unnest(fps) AS fp FROM w)
"""

_SHINGLE_CTE = r"""
words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS w FROM documents
),
sh0 AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words WHERE len(w) >= 3)
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS shingle FROM words WHERE len(w) < 3
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)
"""

_MINHASH_CTE = _SHINGLE_CTE + r""",
hashed AS (
  SELECT doc_id, hi AS hash_idx, md5(hi::VARCHAR || ':' || shingle) AS h
  FROM sh, (SELECT unnest(range(0, 8)) AS hi)
),
sig AS (SELECT doc_id, hash_idx, min(h) AS minhash FROM hashed GROUP BY 1, 2),
bands AS (
  SELECT doc_id, CAST(hash_idx // 2 AS INT) AS band_idx,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS band_sig
  FROM sig GROUP BY 1, 2
)
"""

# candidate pairs + exact-Jaccard verify on top of the MinHash bands — shared by
# the neardup_pairs row and the dedup_survivors CC that consumes its `np` output
_NEARDUP_CTES = _MINHASH_CTE + r""",
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2),
np AS (
  SELECT i.doc_a, i.doc_b, i.n_inter,
         round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 4) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
)
"""




def _ann_lsh_oracle() -> str:
    from lingvo_spark_kg.operators.ann import _hyperplanes

    planes = _hyperplanes(64, 6, 42)
    bit_exprs = []
    for p in planes:
        lit = "[" + ", ".join(repr(v) for v in p) + "]::DOUBLE[]"
        bit_exprs.append(
            f"(CASE WHEN list_dot_product(emb, {lit}) >= 0 THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(bit_exprs)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, {bucket} AS bucket
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, emb AS q_emb, bucket FROM e WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(e.emb, q.q_emb), 4) AS cosine
          FROM e JOIN q ON e.bucket = q.bucket),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 10
    """


def _emb_neardup_oracle() -> str:
    from lingvo_spark_kg.operators.ann import _hyperplanes

    planes = _hyperplanes(64, 6, 42)
    bit_exprs = []
    for p in planes:
        lit = "[" + ", ".join(repr(v) for v in p) + "]::DOUBLE[]"
        bit_exprs.append(
            f"(CASE WHEN list_dot_product(emb, {lit}) >= 0 THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(bit_exprs)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, {bucket} AS bucket
                   FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.emb, b.emb), 4) >= 0.3
    """


def oracle_sql() -> dict[str, str]:
    return {
        **_golden_oracles(),
        "dedup_exact": """
            SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_doc_id,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "doc_stats": f"""
            WITH {_DOC_FEATURES_CTE}
            SELECT doc_id, cyr_ratio, lat_ratio, {_LANG_EXPR} AS lang_pred,
                   n_chars, n_tokens, digit_ratio, punct_ratio,
                   round(CASE WHEN n_tokens > 0 THEN n_chars * 1.0 / n_tokens ELSE 0.0 END, 4)
                     AS mean_token_len,
                   {_QUALITY_EXPR} AS quality
            FROM f
        """,
        "token_rep_stats": f"""
            SELECT tc.*, rep.n_words, rep.dup_word_frac, rep.dup_2gram_frac,
                   rep.top_2gram_frac
            FROM ({_TOKEN_COUNT_SQL}) tc JOIN ({_REPETITION_SQL}) rep USING (doc_id)
        """,
        "doc_hashes": f"""
            WITH fp AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents),
            b AS (SELECT substr(fp, 1, 1) AS fp_bucket,
                         count(*) AS bucket_n_docs,
                         count(DISTINCT fp) AS bucket_n_distinct
                  FROM fp GROUP BY 1)
            SELECT substr(fp.fp, 1, 1) AS fp_bucket, s.doc_id, s.simhash,
                   s.sim_block, fp.fp, b.bucket_n_docs, b.bucket_n_distinct
            FROM ({_simhash_sql()}) s
            JOIN fp USING (doc_id)
            JOIN b ON b.fp_bucket = substr(fp.fp, 1, 1)
        """,
        "winnow_fp": "WITH " + _WINNOW_CTE + "SELECT doc_id, fp FROM fp_rows",
        "winnow_neardup": "WITH " + _WINNOW_CTE + """,
            rare AS (SELECT fp FROM fp_rows GROUP BY fp HAVING count(*) <= 50),
            kept AS (SELECT f.doc_id, f.fp FROM fp_rows f JOIN rare USING (fp))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 10
        """,
        "doc_samples": f"""
            SELECT 'plain' AS variant, doc_id, CAST(NULL AS VARCHAR) AS lang, n_chars
            FROM (SELECT doc_id, length(text) AS n_chars
                  FROM documents
                  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)
                        < '{_mix_thresh(0.2)}')
            UNION ALL
            SELECT 'stratified' AS variant, doc_id, lang, n_chars
            FROM ({_doc_sample_strat_sql()})
        """,
        "pack_contexts": r"""
            WITH d AS (
              SELECT doc_id, doc_id % 4 AS shard,
                     len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+'))::BIGINT AS n_tokens
              FROM documents),
            o AS (
              SELECT doc_id, shard, n_tokens,
                     -- ::BIGINT: DuckDB's window sum(BIGINT) is HUGEINT, which
                     -- pandas renders as float64 and the dtype-level compare rejects
                     (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING)
                      - n_tokens)::BIGINT AS ctx_offset
              FROM d)
            SELECT doc_id, shard, n_tokens, ctx_offset,
                   CAST(floor(ctx_offset / 64) AS BIGINT) AS ctx_id,
                   CAST(floor((ctx_offset + greatest(n_tokens - 1, 0)) / 64)
                        AS BIGINT) AS ctx_end_id,
                   CASE WHEN floor(ctx_offset / 64)
                             <> floor((ctx_offset + greatest(n_tokens - 1, 0)) / 64)
                        THEN 1 ELSE 0 END AS straddles
            FROM o
        """,
        "decontaminate": "WITH " + _SHINGLE_CTE + """,
            bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
            corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
            SELECT c.doc_id, count(*) AS n_benchmark_hits
            FROM corpus c JOIN bench b ON c.shingle = b.shingle
            GROUP BY 1
        """,
        "minhash_bands": "WITH " + _MINHASH_CTE + "SELECT doc_id, band_idx, band_sig FROM bands",
        "neardup_pairs": "WITH " + _NEARDUP_CTES
        + "SELECT doc_a, doc_b, n_inter, jaccard FROM np",
        "dedup_survivors": "WITH RECURSIVE " + _NEARDUP_CTES + r""",
            pe AS (SELECT doc_a, doc_b FROM np WHERE jaccard >= 0.7),
            edges AS (SELECT doc_a AS src, doc_b AS dst FROM pe
                      UNION SELECT doc_b, doc_a FROM pe),
            reach(v, r) AS (
              SELECT DISTINCT src AS v, src AS r FROM edges
              UNION
              SELECT e.src AS v, reach.r AS r
              FROM edges e JOIN reach ON reach.v = e.dst),
            comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS cluster_id,
                   CASE WHEN coalesce(c.cluster_id, d.doc_id) = d.doc_id
                        THEN 1 ELSE 0 END AS is_canonical
            FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
            q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(e.emb, q.q_emb), 4) AS cosine
              FROM e CROSS JOIN q),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id ASC) AS rank
              FROM scored)
            SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 10
        """,
        "corpus_stats": f"""
            SELECT wd.doc_id, wd.n_tokens, wd.words_in_dict_ratio,
                   CAST(floor(wd.n_tokens / 10) AS BIGINT) AS len_bucket,
                   ld.n_docs AS n_docs_in_bucket
            FROM ({_WORDS_IN_DICT_SQL}) wd
            JOIN ({_LEN_DIST_SQL}) ld
              ON ld.len_bucket = CAST(floor(wd.n_tokens / 10) AS BIGINT)
        """,
        "event_analytics": f"""
            SELECT 'seq' AS part, CAST(user_id AS VARCHAR) AS k1,
                   CAST(event_id AS VARCHAR) AS k2, seq AS n, running_value AS v,
                   prev_type AS s
            FROM ({_EVENT_WINDOWS_SQL})
            UNION ALL
            SELECT 'win' AS part, win_start AS k1, event_type AS k2, n_events AS n,
                   sum_value AS v, win_end AS s
            FROM ({_EVENT_WINDOWED_AGG_SQL})
        """,
        "curated_docs": f"""
            WITH {_DOC_FEATURES_CTE},
            q AS (
              SELECT doc_id, n_tokens,
                     {_QUALITY_EXPR} AS quality,
                     {_LANG_EXPR} AS lang_pred
              FROM f),
            keepers AS (
              SELECT min(doc_id) AS doc_id
              FROM documents GROUP BY md5(lower(trim(text))))
            SELECT q.doc_id, q.lang_pred, q.quality, q.n_tokens
            FROM q JOIN keepers ON q.doc_id = keepers.doc_id
            WHERE q.quality >= 0.7 AND q.lang_pred != 'other'
        """,
        "emb_neardup": _emb_neardup_oracle(),
        "vocab_build": r"""
            WITH toks AS (
              SELECT unnest(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) AS token
              FROM documents),
            counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
            ranked AS (
              SELECT token, cnt,
                     row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
              FROM counts)
            SELECT token, cnt, rank + 2 AS vocab_id FROM ranked WHERE rank <= 200
        """,
        "prf_metrics": f"""
            WITH prf AS ({_PRF_SQL})
            SELECT label, n_hyp, n_ref, n_both, precision, recall, f1 FROM prf
            UNION ALL
            SELECT '__macro__' AS label,
                   sum(n_hyp)::BIGINT AS n_hyp, sum(n_ref)::BIGINT AS n_ref,
                   sum(n_both)::BIGINT AS n_both,
                   round(avg(precision), 6) AS precision,
                   round(avg(recall), 6) AS recall,
                   round(avg(f1), 6) AS f1
            FROM prf WHERE label NOT IN ('O', '<s>', '</s>', '<unk>')
        """,
    }


_PRF_SQL = rf"""
            WITH toks AS (
              SELECT doc_id, 0 AS sent_key,
                     unnest(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) AS token,
                     generate_subscripts(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+'), 1) - 1 AS tok_idx
              FROM documents),
            hyp AS (SELECT doc_id, sent_key, tok_idx, {_HYP_RULE} AS label FROM toks),
            ref AS (SELECT doc_id, sent_key, tok_idx, {_REF_RULE} AS label FROM toks),
            j AS (
              SELECT h.label AS hyp_label, r.label AS ref_label
              FROM hyp h JOIN ref r
                ON h.doc_id = r.doc_id AND h.sent_key = r.sent_key AND h.tok_idx = r.tok_idx),
            hc AS (SELECT hyp_label AS label, count(*) AS n_hyp FROM j GROUP BY 1),
            rc AS (SELECT ref_label AS label, count(*) AS n_ref FROM j GROUP BY 1),
            bc AS (SELECT hyp_label AS label, count(*) AS n_both FROM j
                   WHERE hyp_label = ref_label GROUP BY 1),
            m AS (
              SELECT coalesce(hc.label, rc.label, bc.label) AS label,
                     coalesce(n_hyp, 0) AS n_hyp, coalesce(n_ref, 0) AS n_ref,
                     coalesce(n_both, 0) AS n_both
              FROM hc FULL JOIN rc ON hc.label = rc.label
                      FULL JOIN bc ON coalesce(hc.label, rc.label) = bc.label)
            SELECT label, n_hyp, n_ref, n_both,
              round(CASE WHEN n_hyp > 0 THEN n_both * 1.0 / n_hyp ELSE 0.0 END, 6) AS precision,
              round(CASE WHEN n_ref > 0 THEN n_both * 1.0 / n_ref ELSE 0.0 END, 6) AS recall,
              round(CASE WHEN n_hyp > 0 AND n_ref > 0 AND n_both > 0 THEN
                  2.0 * (n_both * 1.0 / n_hyp) * (n_both * 1.0 / n_ref)
                      / ((n_both * 1.0 / n_hyp) + (n_both * 1.0 / n_ref))
                  ELSE 0.0 END, 6) AS f1
            FROM m
        """
