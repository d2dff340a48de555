"""Shared DataFrame schemas for the KG pipeline stages.

The `docs` input schema matches BASELINE.json input_hint exactly:
(doc_id:string, spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
])

TOKEN_STRUCT = T.StructType([
    T.StructField("tok_idx", T.IntegerType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("length", T.IntegerType()),
    T.StructField("value", T.StringType()),
    T.StructField("orig", T.StringType()),  # original surface when != value (NUM placeholder, canonicalized punct) — GetOriginalValue analog (Tokenizer.cs:1347-1354)
    T.StructField("input_type", T.StringType()),
    T.StructField("extra", T.IntegerType()),
    T.StructField("ending_pos", T.StringType()),   # ToPosTaggerToken(value, 4)   — POS feature
    T.StructField("ending_ner", T.StringType()),   # ToPosTaggerToken(value, big) — NER feature / norm
])

SENTENCES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("sent_start", T.IntegerType()),
    T.StructField("sent_len", T.IntegerType()),
    T.StructField("tokens", T.ArrayType(TOKEN_STRUCT)),
])

TAGGED_SCHEMA = T.StructType(
    SENTENCES_SCHEMA.fields
    + [
        T.StructField("pos_tags", T.ArrayType(T.StringType())),
        T.StructField("ner_tags", T.ArrayType(T.StringType())),
    ]
)

TRIPLES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("subj_type", T.StringType()),
    T.StructField("obj_type", T.StringType()),
    T.StructField("subj_norm", T.StringType()),
    T.StructField("obj_norm", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
])

ALIASES_SCHEMA = T.StructType([
    T.StructField("alias_norm", T.StringType()),
    T.StructField("entity_id", T.StringType()),
    T.StructField("entity_type", T.StringType()),
    T.StructField("prior", T.DoubleType()),
])
