"""RDF N-Triples export / import for the KG node + edge tables.

[KG-new] The interchange deliverable of a KG build: once the graph
materializes (operators/graph.py), downstream consumers — triple stores,
SPARQL endpoints, other teams' loaders — expect W3C N-Triples
(https://www.w3.org/TR/n-triples/), one UTF-8 line per triple, the format
explicitly designed for line-parallel processing. That property is exactly
what makes it the right Spark sink AND source: a 100-TB dump splits on line
boundaries, so both directions are embarrassingly parallel with zero shuffle.

Everything here is pure column expressions (JVM-side, whole-stage codegen):
IRI percent-encoding rides ``F.url_encode`` with the post-hoc ``+`` → ``%20``
swap (a literal ``+`` encodes as ``%2B`` first, so the swap is exact
percent-encoding), literal escaping is the N-Triples table (backslash first,
then quote / LF / CR / TAB), and parsing is one anchored ``regexp_extract``
per term. No Python runs per row in either direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DEFAULT_BASE = "http://kg.local/"


def _iri_encode(col):
    """Percent-encode a string column for use inside an IRI: url_encode, then
    '+' (its form-encoding for space; real '+' already became %2B) → %20."""
    return F.replace(F.url_encode(col), F.lit("+"), F.lit("%20"))


def _iri_decode(col):
    return F.url_decode(col)


def _lit_escape(col):
    """N-Triples string-literal escaping: \\ first, then \" LF CR TAB, and NUL
    as \\u0000 (no single-char escape exists for it; escaping it keeps the
    round trip total and frees NUL for the unescape sentinel below)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return F.replace(out, F.lit("\x00"), F.lit("\\u0000"))


def _lit_unescape(col):
    """Inverse of _lit_escape. A naive replace chain would mis-parse
    ``\\\\n`` (escaped backslash, then a real n) as a newline, and a restored
    backslash followed by payload ``u0000`` would later read as a NUL escape —
    so both multi-char forms are tokenized behind NUL-prefixed sentinels first
    (escaped text provably contains no NUL: _lit_escape encodes it away), the
    single-char escapes are mapped, and the sentinels resolve last — backslash
    before NUL, so no sentinel pattern can be re-formed by payload bytes.
    Caveat (external input only): a dump whose literals carry RAW NUL bytes
    (never produced by _lit_escape, and which most serializers escape) would
    collide with the sentinel space — see parse_ntriples' escape-coverage
    note."""
    sent_bs, sent_nul = "\x00A", "\x00B"
    out = F.replace(col, F.lit("\\\\"), F.lit(sent_bs))
    out = F.replace(out, F.lit("\\u0000"), F.lit(sent_nul))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit("\\t"), F.lit("\t"))
    out = F.replace(out, F.lit(sent_bs), F.lit("\\"))
    return F.replace(out, F.lit(sent_nul), F.lit("\x00"))


def to_ntriples(edges: DataFrame, nodes: DataFrame | None = None,
                base: str = DEFAULT_BASE) -> DataFrame:
    """edges(+nodes) → one ``line: string`` column of N-Triples.

    Per edge row: ``<{base}node/{src_id}> <{base}pred/{enc(pred)}>
    <{base}node/{dst_id}> .``  With ``nodes`` given, each node additionally
    emits an ``rdfs:label`` literal triple and an ``rdf:type`` triple against
    ``<{base}type/{enc(node_type)}>`` — the minimal self-describing dump.
    Output is a plain DataFrame; write with ``df.write.text(path)`` (splits
    line-parallel on read, the format's design point)."""
    node_iri = lambda c: F.concat(F.lit(f"<{base}node/"),
                                  _iri_encode(F.col(c).cast("string")),
                                  F.lit(">"))
    edge_lines = edges.select(F.concat(
        node_iri("src_id"), F.lit(" "),
        F.lit(f"<{base}pred/"), _iri_encode(F.col("pred")), F.lit("> "),
        node_iri("dst_id"), F.lit(" .")).alias("line"))
    if nodes is None:
        return edge_lines
    label_lines = nodes.select(F.concat(
        node_iri("canonical_id"), F.lit(f" <{RDFS_LABEL}> \""),
        _lit_escape(F.col("label")), F.lit('" .')).alias("line"))
    type_lines = nodes.select(F.concat(
        node_iri("canonical_id"), F.lit(f" <{RDF_TYPE}> <{base}type/"),
        _iri_encode(F.col("node_type")), F.lit("> .")).alias("line"))
    return edge_lines.unionAll(label_lines).unionAll(type_lines)


# one anchored pattern for the two N-Triples shapes we emit/accept:
# subject IRI, predicate IRI, then either an object IRI or a quoted literal.
_NT_RE = (r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
          r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)")\s*\.\s*$')


def parse_ntriples(lines: DataFrame, column: str = "value",
                   strict: bool = False) -> DataFrame:
    """N-Triples lines → (subj, pred, obj, is_literal): the generic reader for
    an external dump (``spark.read.text`` upstream — line-splittable, so the
    scan parallelizes like any text source). IRIs are returned verbatim
    (un-percent-decoded — they are opaque identifiers at this layer); literal
    objects are unescaped.

    Malformed handling: comment lines (``#``), blank lines, and lines that do
    not parse are DROPPED by default — the lenient bulk-load mode. Pass
    ``strict=True`` to FAIL the job on the first non-comment line that does
    not parse (``raise_error`` inside the plan, so the check is distributed
    and costs one extra predicate): corruption surfaces instead of shrinking
    the result silently.

    Escape coverage: this reader unescapes exactly what :func:`to_ntriples`
    emits — ``\\\\ \\" \\n \\r \\t`` and ``\\u0000`` (NUL). Other ``\\uXXXX`` /
    ``\\UXXXXXXXX`` escapes an external serializer may produce pass through
    as raw text rather than decoding (a variable-substitution regexp cannot be
    expressed as a pure column expression); pre-normalize such dumps if the
    distinction matters."""
    c = F.col(column)
    dropped = F.trim(c).startswith("#") | (F.length(F.trim(c)) == 0)
    parsed = lines.select(
        F.regexp_extract(c, _NT_RE, 1).alias("subj"),
        F.regexp_extract(c, _NT_RE, 2).alias("pred"),
        F.regexp_extract(c, _NT_RE, 3).alias("obj_iri"),
        F.regexp_extract(c, _NT_RE, 4).alias("obj_lit"),
        c.rlike(_NT_RE).alias("ok"),
        dropped.alias("skip"),
        c.alias("_raw"))
    if strict:
        parsed = parsed.withColumn(
            "ok", F.when(F.col("ok") | F.col("skip"), F.col("ok"))
            .otherwise(F.raise_error(F.concat(
                F.lit("malformed N-Triples line: "), F.col("_raw")))))
    return (parsed.where(F.col("ok") & ~F.col("skip"))
            .select("subj", "pred",
                    F.when(F.col("obj_iri") != "", F.col("obj_iri"))
                    .otherwise(_lit_unescape(F.col("obj_lit"))).alias("obj"),
                    (F.col("obj_iri") == "").alias("is_literal")))


def from_ntriples(lines: DataFrame, base: str = DEFAULT_BASE,
                  column: str = "value") -> DataFrame:
    """Inverse of ``to_ntriples`` for the edge triples: lines under ``base`` →
    (src_id string, pred string, dst_id string) — ids come back as the strings
    they were serialized from (the pipeline's canonical ids ARE strings, e.g.
    ``e:E000123``; a numeric caller casts). Label/type/foreign triples are
    ignored (only ``<base>node/ → <base>pred/ → <base>node/`` rows are edge
    rows). Ids and preds round-trip exactly through the %-encoding."""
    t = parse_ntriples(lines, column)
    node_p, pred_p = f"{base}node/", f"{base}pred/"
    tail = lambda c, p: _iri_decode(F.substring(F.col(c), len(p) + 1, 1 << 20))
    return (t.where((~F.col("is_literal"))
                    & F.col("subj").startswith(node_p)
                    & F.col("pred").startswith(pred_p)
                    & F.col("obj").startswith(node_p))
            .select(tail("subj", node_p).alias("src_id"),
                    tail("pred", pred_p).alias("pred"),
                    tail("obj", node_p).alias("dst_id")))
