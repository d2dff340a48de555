"""SPARQL text front-end: parse a (well-defined subset of a) SPARQL 1.1 query
STRING and run it through the existing algebra — :func:`graph.match_pattern`
for SELECT/ASK, :func:`graph.construct_edges` for CONSTRUCT. The reference
repo has no query language at all (north-star scope); the lowering target is
the kwargs surface match_pattern already oracles against DuckDB, so the parser
adds NO new execution semantics — only syntax. Everything still compiles to
filtered scans + equi-joins that Catalyst plans.

Supported grammar (documented subset — anything outside raises ``ValueError``
with the reason, never a silent wrong answer):

- ``PREFIX ns: <iri>`` declarations; prefixed names expand in term position.
- ``SELECT [DISTINCT] (* | ?var... | (expr AS ?name)...) WHERE { ... }``
  — a non-aggregate ``(expr AS ?name)`` lowers to BIND; ``COUNT/SUM/MIN/
  MAX/AVG(...)`` items lower to the aggregation kwargs, plus the
  SPARQL-only spellings ``GROUP_CONCAT([DISTINCT] ?v [; SEPARATOR='s'])``
  (values sorted, then joined — deterministic where the spec leaves order
  open) and ``SAMPLE(?v)`` (→ ``min``, a legal deterministic choice).
- SUBQUERIES (§12): ``{ SELECT ... WHERE { ... } [GROUP BY ...] ... }``
  nested as an element of the WHERE group — evaluated innermost-first and
  joined with the sibling solutions on the shared projected variables
  (none shared → the spec's product, lowered as a broadcast cross join —
  the one-row aggregate-subquery idiom). Subqueries nest; the outer group
  still needs ≥1 triple pattern of its own, and subqueries inside
  OPTIONAL/MINUS/EXISTS/UNION branches are rejected, not mis-lowered.
- Triple blocks with ``;`` predicate-object lists and ``,`` object lists;
  terms: ``?var``, ``<iri>``, ``'str'``/``"str"``, numbers, ``true/false``,
  prefixed or bare names; the predicate slot additionally takes the full
  property-path grammar (``^ + * ? | / !``) over bare/prefixed names, and
  the keyword ``a`` expands to ``rdf:type`` (SPARQL shorthand).
- ``OPTIONAL { ... }``, ``MINUS { ... }``, ``FILTER (expr)``,
  ``FILTER [NOT] EXISTS { ... }``, ``BIND (expr AS ?v)``,
  ``VALUES ?v { lits }`` / ``VALUES (?a ?b) { (l l) ... }``, and
  ``{ A } UNION { B }`` when the union IS the group's pattern (a union
  mixed with sibling triples in the same group is rejected — compose two
  queries instead; nested groups inside branches hold triples only).
- ``GROUP BY ?var...``, ``HAVING (expr)``, ``ORDER BY [ASC|DESC](?v) ...``,
  ``LIMIT n``, ``OFFSET n``.
- ``ASK { ... }`` → one-row boolean frame; ``CONSTRUCT { s p o . ... }
  WHERE { ... }`` (a multi-triple template — the body matches once,
  shared across heads; endpoints are body variables or constants, the
  predicate a plain constant) → inferred edges with support counts;
- SPARQL 1.1 UPDATE (:func:`parse_sparql_update` / :func:`sparql_update`):
  ``INSERT DATA`` / ``DELETE DATA`` (ground triples), ``DELETE WHERE``,
  ``DELETE { } INSERT { } WHERE { }``, ``LOAD <path>`` (N-Triples dump →
  inserts) and ``CLEAR ALL|DEFAULT`` — one operation per call, applied to
  the edges frame; ``KgPipeline.sparql_update`` commits each as a graph
  generation.
  ``DESCRIBE <node>...`` / ``DESCRIBE ?x [?y...] WHERE { ... }`` → every
  edge row touching the described nodes (the concise-bounded description a
  graph store returns, here the induced star: all columns kept).

Filter/bind/having expressions translate to Spark SQL: ``?var`` → column,
``&&``/``||``/``!`` → ``AND``/``OR``/``NOT``, and the common builtins
``REGEX``→``rlike``, ``STRLEN``→``length``, ``UCASE``/``LCASE``→``upper``/
``lower``, ``STRSTARTS``/``STRENDS``→``startswith``/``endswith``,
``STR``→``CAST(... AS STRING)``; everything else passes through to
``F.expr`` (Spark SQL is the expression dialect — documented, not hidden).
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_VAR_RE = re.compile(r"\?([A-Za-z_]\w*)")
_WORD_END = set(" \t\r\n{}();,")
_PATH_ONLY = set("+*?|/^!()")
_AGG_RE = re.compile(
    r"^\s*(count|sum|min|max|avg|group_concat|sample)\s*\(", re.I)
_GC_RE = re.compile(r"^\s*group_concat\s*\((.*)\)\s*$", re.I | re.S)
_SAMPLE_RE = re.compile(r"^\s*sample\s*\((.*)\)\s*$", re.I | re.S)
_SEP_RE = re.compile(
    r";\s*separator\s*=\s*('((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\")\s*$",
    re.I)
_FN_MAP = {"regex": "rlike", "strlen": "length", "ucase": "upper",
           "lcase": "lower", "strstarts": "startswith",
           "strends": "endswith", "contains": "contains"}


class _Cursor:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def skip(self):
        t, n = self.t, len(self.t)
        while self.i < n:
            c = t[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif c == "#":                       # comment to end of line
                while self.i < n and t[self.i] != "\n":
                    self.i += 1
            else:
                break

    def eof(self) -> bool:
        self.skip()
        return self.i >= len(self.t)

    def peek(self) -> str:
        self.skip()
        return self.t[self.i] if self.i < len(self.t) else ""

    def error(self, msg: str):
        around = self.t[max(0, self.i - 20):self.i + 20].replace("\n", " ")
        raise ValueError(f"SPARQL parse error: {msg} near ...{around!r}...")

    def keyword(self, *kws) -> str | None:
        """Consume one of the case-insensitive keywords (longest first), only
        at a word boundary. Returns the canonical keyword or None."""
        self.skip()
        rest = self.t[self.i:]
        for kw in sorted(kws, key=len, reverse=True):
            if rest[:len(kw)].upper() == kw.upper():
                after = rest[len(kw):len(kw) + 1]
                if not after or not (after.isalnum() or after == "_"):
                    self.i += len(kw)
                    return kw.upper()
        return None

    def expect(self, ch: str):
        if self.peek() != ch:
            self.error(f"expected {ch!r}")
        self.i += 1

    def read_parens(self) -> str:
        """Read a balanced ``( ... )`` group (quote-aware), return the inside."""
        self.expect("(")
        t, n, depth, out = self.t, len(self.t), 1, []
        while self.i < n:
            c = t[self.i]
            if c in "'\"":
                j = self.i + 1
                while j < n and t[j] != c:
                    j += 2 if t[j] == "\\" else 1
                if j >= n:
                    self.error("unterminated string")
                out.append(t[self.i:j + 1])
                self.i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    self.i += 1
                    return "".join(out)
            out.append(c)
            self.i += 1
        self.error("unbalanced '('")

    def read_word(self) -> str:
        self.skip()
        j = self.i
        t, n = self.t, len(self.t)
        while j < n and t[j] not in _WORD_END:
            j += 1
        w = t[self.i:j]
        if not w:
            self.error("expected a term")
        self.i = j
        return w

    def read_path_token(self) -> str:
        """Predicate-slot token: path syntax chars INCLUDING parentheses (for
        ``!(...)``) run to whitespace / ``{};,.`` — but a '.' inside digits
        stays (decimal numbers never appear in the pred slot, so '.' always
        terminates here)."""
        self.skip()
        t, n = self.t, len(self.t)
        j = self.i
        stop = set(" \t\r\n{};,.")
        while j < n and t[j] not in stop:
            j += 1
        w = t[self.i:j]
        if not w:
            self.error("expected a predicate")
        self.i = j
        return w


def _unescape(s: str) -> str:
    return (s.replace("\\\\", "\x00").replace("\\n", "\n")
            .replace("\\t", "\t").replace("\\'", "'").replace('\\"', '"')
            .replace("\x00", "\\"))


def _expand(word: str, prefixes: dict):
    if ":" in word:
        ns, local = word.split(":", 1)
        if ns in prefixes:
            return prefixes[ns] + local
    return word


def _read_term(cur: _Cursor, prefixes: dict):
    c = cur.peek()
    if c == "?":
        cur.i += 1
        w = cur.read_word()
        return "?" + w
    if c == "<":
        j = cur.t.find(">", cur.i)
        if j < 0:
            cur.error("unterminated <iri>")
        iri = cur.t[cur.i + 1:j]
        cur.i = j + 1
        return iri
    if c in "'\"":
        cur.i += 1
        j = cur.i
        t, n = cur.t, len(cur.t)
        while j < n and t[j] != c:
            j += 2 if t[j] == "\\" else 1
        if j >= n:
            cur.error("unterminated string")
        s = _unescape(t[cur.i:j])
        cur.i = j + 1
        return s
    w = cur.read_word()
    # a word-final '.' is the triple terminator unless it makes a decimal
    if w.endswith(".") and not re.fullmatch(r"-?\d*\.\d+", w):
        cur.i -= 1
        w = w[:-1]
        if not w:
            cur.error("expected a term before '.'")
    low = w.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if re.fullmatch(r"-?\d+", w):
        return int(w)
    if re.fullmatch(r"-?\d*\.\d+", w):
        return float(w)
    return _expand(w, prefixes)


def _read_predicate(cur: _Cursor, prefixes: dict):
    c = cur.peek()
    if c == "?":
        cur.i += 1
        return "?" + cur.read_word()
    if c == "<":
        return _read_term(cur, prefixes)     # IRI: never path syntax
    w = cur.read_path_token()
    # strip parens that wrap the WHOLE path — `(p|q)` is `p|q` (precedence
    # already makes | lowest); a partial wrap like `(p|q)/r` or `(p)+` needs
    # grouping the algebra cannot close over and falls through to the path
    # parser's malformed-step error
    while w.startswith("(") and w.endswith(")"):
        depth, full = 0, True
        for i, ch in enumerate(w):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(w) - 1:
                    full = False
                    break
        if not full:
            break
        w = w[1:-1]
    if w == "a":
        return "rdf:type"                    # SPARQL shorthand
    if any(ch in _PATH_ONLY for ch in w):
        # property path: steps stay bare names. PREFIX expansion and the
        # 'a' shorthand are NOT applied inside path syntax — silently querying
        # the literal strings 'ex:p' / 'a' would match a different (usually
        # empty) relation, so the limitation is loud instead
        if ":" in w:
            raise ValueError(
                f"prefixed names inside property paths are not supported "
                f"({w!r}) — use full bare predicate names in path steps")
        if re.search(r"(?<![A-Za-z0-9_])a(?![A-Za-z0-9_])", w):
            raise ValueError(
                f"the 'a' (rdf:type) shorthand inside property paths is not "
                f"supported ({w!r}) — spell out rdf:type's predicate name")
        return w
    return _expand(w, prefixes)


_STR_LIT_RE = re.compile(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"")


def _translate_expr(expr: str) -> str:
    """SPARQL expression → Spark SQL: ``?v``→``v``, logical ops, builtins.

    Quoted string literals are masked out before any substitution pass and
    restored afterwards — otherwise ``!``/``&&``/``?x``/builtin-name rewrites
    fire INSIDE literals (``REGEX(?x, 'a!b')`` would lower to
    ``rlike(x, 'a NOT b')`` — a silently wrong result)."""
    lits: list[str] = []

    def _mask(m: "re.Match[str]") -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    e = _STR_LIT_RE.sub(_mask, expr)
    e = _VAR_RE.sub(r"\1", e)
    e = e.replace("&&", " AND ").replace("||", " OR ")
    e = re.sub(r"!(?![=])", " NOT ", e)
    for sp, sql in _FN_MAP.items():
        e = re.sub(rf"\b{sp}\s*\(", sql + "(", e, flags=re.I)
    e = re.sub(r"\bstr\s*\(", "CAST(", e, flags=re.I)
    if re.search(r"\bCAST\(", e) and "AS STRING" not in e.upper():
        e = re.sub(r"\bCAST\(([^()]*)\)", r"CAST(\1 AS STRING)", e)
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], e)


def _lower_agg(expr: str) -> str:
    """SELECT-item aggregate → Spark SQL. ``COUNT/SUM/MIN/MAX/AVG`` pass
    through :func:`_translate_expr` (Spark spells them the same, incl.
    ``count(distinct v)``); the two SPARQL-only spellings lower here:

    - ``GROUP_CONCAT([DISTINCT] ?v [; SEPARATOR='s'])`` → values SORTED then
      joined (``sort_array(collect_list|collect_set)``). SPARQL leaves the
      concatenation order implementation-defined; sorting makes the output
      deterministic across partitionings and engines (DuckDB parity:
      ``string_agg(... ORDER BY ...)``). Default separator is a single
      space, the spec's.
    - ``SAMPLE(?v)`` → ``min(v)``: the spec allows ANY value from the group,
      so the deterministic choice is legal and reproducible.

    Both take a single ``?var`` here — BIND a computed expression first."""
    m = _GC_RE.match(expr)
    if m:
        inner = m.group(1).strip()
        sep = " "
        sm = _SEP_RE.search(inner)
        if sm:
            sep = _unescape(sm.group(2) if sm.group(2) is not None
                            else sm.group(3))
            inner = inner[:sm.start()].strip()
        dm = re.match(r"^distinct\s+", inner, re.I)
        coll = "collect_set" if dm else "collect_list"
        if dm:
            inner = inner[dm.end():].strip()
        vm = _VAR_RE.fullmatch(inner)
        if not vm:
            raise ValueError("GROUP_CONCAT takes a single ?var here "
                             f"(got {inner!r}) — BIND the expression first")
        sep_sql = sep.replace("\\", "\\\\").replace("'", "\\'")
        return (f"array_join(transform(sort_array({coll}({vm.group(1)})), "
                f"x -> cast(x as string)), '{sep_sql}')")
    m = _SAMPLE_RE.match(expr)
    if m:
        inner = re.sub(r"^distinct\s+", "", m.group(1).strip(), flags=re.I)
        vm = _VAR_RE.fullmatch(inner)
        if not vm:
            raise ValueError(f"SAMPLE takes a single ?var here "
                             f"(got {inner!r})")
        return f"min({vm.group(1)})"
    return _translate_expr(expr)


def _parse_triples_only(cur: _Cursor, prefixes: dict) -> list:
    """A nested group body: triples only (OPTIONAL/FILTER inside a nested
    group would need general sub-group algebra — rejected explicitly)."""
    g = _parse_group(cur, prefixes)
    extras = [k for k in ("optional", "minus", "exists", "not_exists")
              if g[k]] + (["filter"] if g["filters"] else []) \
        + (["bind"] if g["binds"] else []) \
        + (["values"] if g["values"] is not None else []) \
        + (["union"] if g["union"] else []) \
        + (["subquery"] if g["subs"] else [])
    if extras:
        raise ValueError(
            f"nested groups hold triple patterns only here; found {extras} — "
            "compose multiple queries for deeper algebra")
    return g["triples"]


def _parse_group(cur: _Cursor, prefixes: dict) -> dict:
    """Parse ``{ ... }`` → the group's algebra pieces."""
    cur.expect("{")
    out = {"triples": [], "optional": [], "minus": [], "exists": [],
           "not_exists": [], "filters": [], "binds": {}, "values": None,
           "union": [], "subs": []}
    while True:
        if cur.eof():
            cur.error("unterminated '{'")
        if cur.peek() == "}":
            cur.i += 1
            return out
        kw = cur.keyword("OPTIONAL", "MINUS", "FILTER", "BIND", "VALUES",
                         "UNION")
        if kw == "OPTIONAL":
            out["optional"].append(_parse_triples_only(cur, prefixes))
        elif kw == "MINUS":
            out["minus"].append(_parse_triples_only(cur, prefixes))
        elif kw == "FILTER":
            sub = cur.keyword("EXISTS", "NOT")
            if sub == "NOT":
                if not cur.keyword("EXISTS"):
                    cur.error("FILTER NOT needs EXISTS")
                out["not_exists"].append(_parse_triples_only(cur, prefixes))
            elif sub == "EXISTS":
                out["exists"].append(_parse_triples_only(cur, prefixes))
            else:
                out["filters"].append(_translate_expr(cur.read_parens()))
        elif kw == "BIND":
            inner = cur.read_parens()
            m = re.search(r"\s+AS\s+\?([A-Za-z_]\w*)\s*$", inner,
                          flags=re.I)
            if not m:
                cur.error("BIND needs (expr AS ?var)")
            out["binds"][m.group(1)] = _translate_expr(inner[:m.start()])
        elif kw == "VALUES":
            out["values"] = _parse_values(cur, prefixes, out["values"])
        elif kw == "UNION":
            if not out["union"]:
                cur.error("UNION without a preceding { } branch")
            out["union"].append(_parse_triples_only(cur, prefixes))
        elif cur.peek() == "{":
            save = cur.i
            cur.expect("{")
            if cur.keyword("SELECT"):
                # SPARQL 1.1 §12 subquery: evaluated first, joined with the
                # group's other solutions on the shared projected variables
                out["subs"].append(_parse_subselect(cur, prefixes))
                continue
            cur.i = save
            if out["union"] or out["triples"]:
                raise ValueError(
                    "a { } UNION { } chain must be the group's whole "
                    "pattern — triples next to a union (or two chains) are "
                    "not lowered; compose two queries instead")
            out["union"].append(_parse_triples_only(cur, prefixes))
            if cur.keyword("UNION") is None:
                cur.error("bare { } group: only { } UNION { } is supported")
            out["union"].append(_parse_triples_only(cur, prefixes))
            while cur.keyword("UNION"):
                out["union"].append(_parse_triples_only(cur, prefixes))
        else:
            _parse_triple_lines(cur, prefixes, out["triples"])


def _parse_triple_lines(cur: _Cursor, prefixes: dict, into: list):
    subj = _read_term(cur, prefixes)
    while True:
        pred = _read_predicate(cur, prefixes)
        while True:
            obj = _read_term(cur, prefixes)
            into.append((subj, pred, obj))
            if cur.peek() == ",":
                cur.i += 1
                continue
            break
        if cur.peek() == ";":
            cur.i += 1
            if cur.peek() in "}.":               # dangling ';' is legal
                break
            continue
        break
    if cur.peek() == ".":
        cur.i += 1


def _parse_values(cur: _Cursor, prefixes: dict, prev):
    if prev is not None:
        raise ValueError("one VALUES clause per query here — merge the rows")
    if cur.peek() == "(":                        # (vars) { (row) ... }
        inner = _Cursor(cur.read_parens())
        vars_ = []
        while not inner.eof():
            t = _read_term(inner, prefixes)
            if not (isinstance(t, str) and t.startswith("?")):
                cur.error("VALUES (...) takes ?vars")
            vars_.append(t[1:])
        cur.expect("{")
        rows = []
        while cur.peek() != "}":
            if cur.eof():
                cur.error("unterminated VALUES block")
            row = _Cursor(cur.read_parens())
            vals = []
            while not row.eof():
                v = _read_term(row, prefixes)
                if isinstance(v, str) and v.upper() == "UNDEF":
                    v = None
                vals.append(v)
            rows.append(tuple(vals))
        cur.i += 1
        return (tuple(vars_), rows)
    t = _read_term(cur, prefixes)
    if not (isinstance(t, str) and t.startswith("?")):
        cur.error("VALUES takes ?var { ... } or (?vars) { ... }")
    cur.expect("{")
    lits = []
    while cur.peek() != "}":
        if cur.eof():
            cur.error("unterminated VALUES block")
        lits.append(_read_term(cur, prefixes))
    cur.i += 1
    return {t[1:]: lits}


def _parse_select_items(cur: _Cursor):
    """SELECT item list → (star, [plain vars], {name: agg_sql},
    {name: bind_sql}, order of output names)."""
    star, plain, aggs, binds, order = False, [], {}, {}, []
    while True:
        c = cur.peek()
        if c == "*":
            cur.i += 1
            star = True
        elif c == "?":
            cur.i += 1
            v = cur.read_word()
            plain.append(v)
            order.append(v)
        elif c == "(":
            inner = cur.read_parens()
            m = re.search(r"\s+AS\s+\?([A-Za-z_]\w*)\s*$", inner, flags=re.I)
            if not m:
                cur.error("SELECT (expr AS ?name) needs the AS alias")
            name, expr = m.group(1), inner[:m.start()]
            expr = re.sub(r"\bDISTINCT\s+", "distinct ", expr, flags=re.I)
            if _AGG_RE.match(expr):
                aggs[name] = _lower_agg(expr)
            else:
                binds[name] = _translate_expr(expr)
            order.append(name)
        else:
            break
    if not star and not order:
        cur.error("empty SELECT list")
    return star, plain, aggs, binds, order


def _group_to_kwargs(g: dict) -> dict:
    """A parsed WHERE group → the match_pattern pattern/group kwargs. Binds
    are left to the caller (SELECT-expression binds merge in on top); a
    nested-subquery list rides under the ``"subs"`` key for the compiler."""
    kwargs: dict = {}
    if g["union"]:
        if g["triples"] or g["subs"]:
            raise ValueError(
                "a { } UNION { } chain must be the group's whole pattern — "
                "triples or subqueries next to a union are not lowered; "
                "compose two queries instead")
        kwargs["patterns"] = g["union"][0]
        kwargs["union"] = g["union"][1:]
    else:
        kwargs["patterns"] = g["triples"]
    if not kwargs["patterns"]:
        raise ValueError("the WHERE group has no triple patterns")
    for k in ("optional", "minus", "exists", "not_exists"):
        if g[k]:
            kwargs[k] = g[k]
    if g["filters"]:
        kwargs["filter"] = g["filters"]
    if g["values"] is not None:
        kwargs["values"] = g["values"]
    if g["subs"]:
        kwargs["subs"] = g["subs"]
    return kwargs


def _parse_select_tail(cur: _Cursor, kwargs: dict, plain: list,
                       sel_aggs: dict):
    """GROUP BY / HAVING / ORDER BY / LIMIT / OFFSET after a WHERE group —
    parsing stops at the first token that is none of them ('}' for a
    subquery, EOF for a top-level query)."""
    group_keys = None
    if cur.keyword("GROUP"):
        if not cur.keyword("BY"):
            cur.error("GROUP needs BY")
        group_keys = []
        while cur.peek() == "?":
            cur.i += 1
            group_keys.append(cur.read_word())
        if not group_keys:
            cur.error("GROUP BY needs ?vars")
    if sel_aggs or group_keys is not None:
        if not sel_aggs:
            raise ValueError("GROUP BY needs at least one aggregate in "
                             "SELECT — use SELECT DISTINCT for plain keys")
        kwargs["group_by"] = group_keys or []
        kwargs["agg"] = sel_aggs
        bad = [v for v in plain if v not in (group_keys or [])]
        if bad:
            raise ValueError(f"SELECT vars {bad} are not GROUP BY keys "
                             "(SPARQL requires grouped-or-aggregated)")
    if cur.keyword("HAVING"):
        if cur.peek() != "(":
            cur.error("HAVING needs (expr)")
        kwargs["having"] = _translate_expr(cur.read_parens())
    if cur.keyword("ORDER"):
        if not cur.keyword("BY"):
            cur.error("ORDER needs BY")
        order_by = []
        while True:
            kw = cur.keyword("ASC", "DESC")
            if kw:
                inner = cur.read_parens().strip()
                m = _VAR_RE.fullmatch(inner)
                if not m:
                    cur.error("ORDER BY ASC/DESC(?var)")
                order_by.append(("-" if kw == "DESC" else "") + m.group(1))
            elif cur.peek() == "?":
                cur.i += 1
                order_by.append(cur.read_word())
            else:
                break
        if not order_by:
            cur.error("ORDER BY needs keys")
        kwargs["order_by"] = order_by
    while True:
        kw = cur.keyword("LIMIT", "OFFSET")
        if not kw:
            break
        num = cur.read_word()
        if not num.isdigit():
            cur.error(f"{kw} needs an integer")
        kwargs["limit" if kw == "LIMIT" else "offset"] = int(num)


def _finish_select(kwargs: dict, star: bool, sel_order: list,
                   distinct: bool):
    if distinct:
        kwargs["distinct"] = True
    if not star:
        kwargs["select"] = sel_order


def _parse_subselect(cur: _Cursor, prefixes: dict) -> dict:
    """The body of a nested ``{ SELECT ... }`` (SPARQL 1.1 §12; cursor just
    past the SELECT keyword) → match_pattern kwargs; the closing ``}`` is
    consumed here. Subqueries nest (the inner WHERE group may itself hold
    ``{ SELECT ... }``), inherit the outer PREFIXes (static scoping), and
    project ONLY their selected variables — the compatibility join with the
    outer solutions runs on the shared projected names."""
    distinct = cur.keyword("DISTINCT", "REDUCED") is not None
    star, plain, sel_aggs, sel_binds, sel_order = _parse_select_items(cur)
    cur.keyword("WHERE")
    g = _parse_group(cur, prefixes)
    kwargs = _group_to_kwargs(g)
    binds = dict(g["binds"])
    binds.update(sel_binds)
    if binds:
        kwargs["bind"] = binds
    _parse_select_tail(cur, kwargs, plain, sel_aggs)
    _finish_select(kwargs, star, sel_order, distinct)
    cur.expect("}")
    return kwargs


def _parse_prefixes(cur: _Cursor) -> dict:
    prefixes: dict = {}
    while cur.keyword("PREFIX"):
        ns = cur.read_word()
        if not ns.endswith(":"):
            cur.error("PREFIX needs 'ns:'")
        if cur.peek() != "<":
            cur.error("PREFIX needs a <iri>")
        prefixes[ns[:-1]] = _read_term(cur, prefixes)
    return prefixes


def parse_sparql(query: str) -> dict:
    """Parse a SPARQL string → ``{"form": "select" | "ask" | "construct",
    "kwargs": match_pattern kwargs, "head": construct head or None}``.
    Raises ``ValueError`` on anything outside the documented subset."""
    cur = _Cursor(query)
    prefixes = _parse_prefixes(cur)
    form = cur.keyword("SELECT", "ASK", "CONSTRUCT", "DESCRIBE")
    if form is None:
        cur.error("expected SELECT / ASK / CONSTRUCT / DESCRIBE")

    head = None
    if form == "DESCRIBE":
        described: list = []
        while not cur.eof() and cur.keyword("WHERE") is None \
                and cur.peek() != "{":
            described.append(_read_term(cur, prefixes))
        if not described:
            cur.error("DESCRIBE needs terms")
        desc_vars = [t[1:] for t in described
                     if isinstance(t, str) and t.startswith("?")]
        desc_consts = [t for t in described
                       if not (isinstance(t, str) and t.startswith("?"))]
        kwargs: dict = {}
        if cur.peek() == "{":
            g = _parse_group(cur, prefixes)
            if g["union"] or g["binds"] or g["values"] is not None \
                    or g["subs"]:
                raise ValueError("DESCRIBE ... WHERE supports triples + "
                                 "OPTIONAL/MINUS/EXISTS/FILTER only")
            kwargs["patterns"] = g["triples"]
            if not kwargs["patterns"]:
                raise ValueError("the WHERE group has no triple patterns")
            for k in ("optional", "minus", "exists", "not_exists"):
                if g[k]:
                    kwargs[k] = g[k]
            if g["filters"]:
                kwargs["filter"] = g["filters"]
        elif desc_vars:
            raise ValueError("DESCRIBE ?vars needs a WHERE group binding "
                             "them")
        if not cur.eof():
            cur.error("trailing content after the query")
        return {"form": "describe", "kwargs": kwargs, "head": None,
                "describe": {"vars": desc_vars, "consts": desc_consts}}
    star, plain, sel_aggs, sel_binds, sel_order = True, [], {}, {}, []
    distinct = False
    if form == "SELECT":
        distinct = cur.keyword("DISTINCT", "REDUCED") is not None
        star, plain, sel_aggs, sel_binds, sel_order = _parse_select_items(cur)
        cur.keyword("WHERE")
    elif form == "CONSTRUCT":
        heads: list = []
        if cur.peek() != "{":
            cur.error("CONSTRUCT needs a { head } template")
        cur.expect("{")
        while cur.peek() != "}":
            if cur.eof():
                cur.error("unterminated CONSTRUCT template")
            _parse_triple_lines(cur, prefixes, heads)
        cur.i += 1
        if not heads:
            raise ValueError("CONSTRUCT needs at least one head triple")
        for h in heads:
            if isinstance(h[1], str) and not h[1].startswith("?") \
                    and any(c in _PATH_ONLY for c in h[1]):
                raise ValueError("a CONSTRUCT head predicate must be a plain "
                                 f"constant, not a path ({h[1]!r})")
        head = heads
        cur.keyword("WHERE")
    else:
        cur.keyword("WHERE")

    g = _parse_group(cur, prefixes)

    kwargs = _group_to_kwargs(g)
    binds = dict(g["binds"])
    binds.update(sel_binds)
    if binds:
        kwargs["bind"] = binds

    _parse_select_tail(cur, kwargs, plain, sel_aggs)
    if not cur.eof():
        cur.error("trailing content after the query")

    if form == "SELECT":
        _finish_select(kwargs, star, sel_order, distinct)
        return {"form": "select", "kwargs": kwargs, "head": None}
    if form == "CONSTRUCT":
        unsupported = [k for k in ("union", "minus", "exists", "not_exists",
                                   "values", "bind", "group_by", "order_by",
                                   "limit", "offset", "subs") if k in kwargs]
        if unsupported:
            raise ValueError(f"CONSTRUCT supports triples + OPTIONAL + "
                             f"FILTER only (got {unsupported})")
        return {"form": "construct", "kwargs": kwargs, "head": head}
    return {"form": "ask", "kwargs": kwargs, "head": None}


def _compile_select(edges: DataFrame, kwargs: dict, stats) -> DataFrame:
    """Lower parsed query kwargs → a solution frame, compiling any nested
    subqueries FIRST (the spec's innermost-out evaluation) into ``sub=``
    frames for :func:`graph.match_pattern`."""
    from .graph import match_pattern

    kw = dict(kwargs)
    subs = kw.pop("subs", None)
    if subs:
        kw["sub"] = [_compile_select(edges, s, stats) for s in subs]
    return match_pattern(edges, kw.pop("patterns"), stats=stats, **kw)


def sparql_query(edges: DataFrame, query: str, stats=None) -> DataFrame:
    """Run a SPARQL string against the edges table. SELECT → the solution
    frame (one column per projected variable), ASK → a one-row
    ``(ask boolean)`` frame, CONSTRUCT → the inferred-edges frame of
    :func:`construct_edges`, DESCRIBE → the distinct edge rows touching the
    described nodes (two semi-joins against the node set — neighborhood-
    sized output, the scan prunes on the bucketed layout). ``stats=`` passes
    through to the selectivity-aware join ordering. Pure lowering — the
    plan is exactly the one the kwargs API would build."""
    from .graph import construct_edges, match_pattern

    q = parse_sparql(query)
    kw = dict(q["kwargs"])
    if q["form"] == "describe":
        spark, d = edges.sparkSession, q["describe"]
        id_type = dict(edges.dtypes)["src_id"]
        nodes = None
        if d["consts"]:
            nodes = spark.createDataFrame([(c,) for c in d["consts"]],
                                          f"n {id_type}")
        if d["vars"]:
            sol = _compile_select(edges, kw, stats)
            for v in d["vars"]:
                if v not in sol.columns:
                    raise ValueError(f"DESCRIBE variable ?{v} is not bound "
                                     f"by the WHERE group ({sol.columns})")
                col = sol.select(F.col(v).alias("n")).where(
                    F.col("n").isNotNull())
                nodes = col if nodes is None else nodes.unionByName(col)
        nodes = nodes.distinct().localCheckpoint(eager=False)
        touching = (edges.join(nodes.withColumnRenamed("n", "src_id"),
                               "src_id", "left_semi")
                    .unionByName(
                        edges.join(nodes.withColumnRenamed("n", "dst_id"),
                                   "dst_id", "left_semi")
                        .select(*edges.columns))
                    .select(*edges.columns))
        return touching.distinct()
    if q["form"] == "construct":
        return construct_edges(edges, kw.pop("patterns"), q["head"],
                               optional=kw.pop("optional", None),
                               filter=kw.pop("filter", None), stats=stats)
    if q["form"] == "ask":
        def has_var(p):
            return any(isinstance(t, str) and t.startswith("?") for t in p)

        pats = kw.pop("patterns")
        const_pats = [p for p in pats if not has_var(p)]
        var_pats = [p for p in pats if has_var(p)]
        if const_pats and not var_pats and kw:
            raise ValueError("ASK over constant-only triples cannot take "
                             f"further algebra (got {sorted(kw)})")
        hit = True
        # constant-only triples probe one at a time (a fresh pinned variable
        # turns each into a legal one-row existence check; limit-1 bounded)
        for s, p, o in const_pats:
            probe = match_pattern(edges, [("?ask_probe", p, o)],
                                  values={"ask_probe": [s]})
            if probe.limit(1).count() == 0:
                hit = False
                break
        if hit and var_pats:
            sol = _compile_select(edges, {**kw, "patterns": var_pats}, stats)
            hit = sol.limit(1).count() > 0
        return edges.sparkSession.createDataFrame([(hit,)], "ask boolean")
    return _compile_select(edges, kw, stats)


def _parse_template(cur: _Cursor, prefixes: dict, allow_vars: bool,
                    what: str) -> list:
    """An update ``{ triples }`` block (a template / quad pattern — triples
    only, no keywords). Property paths never appear here (a path is not a
    deletable/insertable triple); ``allow_vars=False`` is the DATA forms'
    ground-triples rule."""
    cur.expect("{")
    triples: list = []
    while cur.peek() != "}":
        if cur.eof():
            cur.error(f"unterminated {what} block")
        _parse_triple_lines(cur, prefixes, triples)
    cur.i += 1
    if not triples:
        raise ValueError(f"{what} needs at least one triple")
    for s, p, o in triples:
        if isinstance(p, str) and not p.startswith("?") \
                and any(c in _PATH_ONLY for c in p):
            raise ValueError(f"{what} predicates must be plain constants or "
                             f"variables, not property paths ({p!r})")
        if not allow_vars and any(isinstance(t, str) and t.startswith("?")
                                  for t in (s, p, o)):
            raise ValueError(f"{what} takes ground triples only (got a "
                             "variable) — use the WHERE forms for patterns")
    return triples


def parse_sparql_update(update: str) -> dict:
    """Parse ONE SPARQL 1.1 Update operation (§3.1) →
    ``{"delete_data", "insert_data", "delete_tpl", "insert_tpl", "where"}``
    (unused slots None). Supported forms:

    - ``INSERT DATA { triples }`` / ``DELETE DATA { triples }`` — ground
      triples only (the spec's rule).
    - ``DELETE WHERE { patterns }`` — the pattern doubles as the delete
      template (the spec's shortcut form; triples only, each with ≥1
      variable — a ground triple in this form would make deletion of
      EVERYTHING conditional on its presence, which is almost certainly a
      bug: use DELETE DATA).
    - ``DELETE { template } [INSERT { template }] WHERE { group }`` /
      ``INSERT { template } WHERE { group }`` — the full form; the WHERE
      group takes the SELECT-query group algebra (OPTIONAL / MINUS /
      FILTER / BIND / VALUES / subqueries / { } UNION { }).

    - ``LOAD <path>`` — graph management: read an N-Triples dump (the
      ``export_ntriples`` format) from the path/URI and insert its edge
      triples (ids come back as the strings they were serialized from).
    - ``CLEAR ALL`` / ``CLEAR DEFAULT`` — empty the store (schema kept).

    One operation per call — ``;``-sequences raise (run them one at a
    time; each returns the store the next one reads)."""
    cur = _Cursor(update)
    prefixes = _parse_prefixes(cur)
    out = {"delete_data": None, "insert_data": None,
           "delete_tpl": None, "insert_tpl": None, "where": None,
           "load": None, "clear": False}
    kw = cur.keyword("INSERT", "DELETE", "LOAD", "CLEAR")
    if kw is None:
        cur.error("expected INSERT / DELETE / LOAD / CLEAR")
    if kw == "LOAD":
        if cur.peek() != "<":
            cur.error("LOAD needs an <path-or-uri>")
        out["load"] = _read_term(cur, prefixes)
        if not cur.eof():
            cur.error("one update operation per call — trailing content")
        return out
    if kw == "CLEAR":
        if cur.keyword("ALL", "DEFAULT") is None:
            cur.error("CLEAR takes ALL or DEFAULT (no named graphs here)")
        out["clear"] = True
        if not cur.eof():
            cur.error("one update operation per call — trailing content")
        return out

    def where_kwargs():
        g = _parse_group(cur, prefixes)
        kwargs = _group_to_kwargs(g)
        if g["binds"]:
            kwargs["bind"] = g["binds"]
        return kwargs

    if kw == "INSERT":
        if cur.keyword("DATA"):
            out["insert_data"] = _parse_template(cur, prefixes, False,
                                                 "INSERT DATA")
        else:
            out["insert_tpl"] = _parse_template(cur, prefixes, True,
                                                "INSERT template")
            if not cur.keyword("WHERE"):
                cur.error("INSERT { template } needs WHERE { group }")
            out["where"] = where_kwargs()
    else:
        if cur.keyword("DATA"):
            out["delete_data"] = _parse_template(cur, prefixes, False,
                                                 "DELETE DATA")
        elif cur.keyword("WHERE"):
            tpl = _parse_template(cur, prefixes, True, "DELETE WHERE")
            ground = [t for t in tpl
                      if not any(isinstance(x, str) and x.startswith("?")
                                 for x in t)]
            if ground:
                raise ValueError(
                    "DELETE WHERE triples need ≥1 variable each (ground "
                    f"triple {ground[0]!r} would gate the whole delete on "
                    "its own presence) — use DELETE DATA for constants")
            out["delete_tpl"] = tpl
            out["where"] = {"patterns": tpl}
        else:
            out["delete_tpl"] = _parse_template(cur, prefixes, True,
                                                "DELETE template")
            if cur.keyword("INSERT"):
                out["insert_tpl"] = _parse_template(cur, prefixes, True,
                                                    "INSERT template")
            if not cur.keyword("WHERE"):
                cur.error("DELETE { template } needs WHERE { group }")
            out["where"] = where_kwargs()
    if not cur.eof():
        cur.error("one update operation per call — trailing content")
    return out


def sparql_update(edges: DataFrame, update: str, stats=None) -> DataFrame:
    """Apply ONE SPARQL 1.1 Update operation to the edges table and return
    the NEW edges frame (same columns — the caller owns persistence;
    ``KgPipeline.sparql_update`` commits it as a graph generation).

    Semantics (the spec's, §3.1): both templates instantiate against the
    ORIGINAL store's solutions, deletes apply before inserts. The store is
    a SET of triples keyed on (src_id, pred, dst_id): deleting removes the
    matching rows wholesale (metadata and all); inserting a triple that
    survives deletion is a no-op — the existing row KEEPS its provenance
    metadata; a genuinely new triple carries ``n_occurrences = 1`` (one
    assertion) and NULL for every other metadata column (an asserted edge
    has no document provenance — downstream reads already treat those
    columns as nullable). A template slot instantiated to NULL (an unbound
    OPTIONAL variable) produces no triple, per the spec.

    Scale shape: the WHERE group compiles through :func:`graph.
    match_pattern` (filtered scans + equi-joins); the delete is ONE
    key-equi anti-join, the insert ONE anti-join + union — solution-volume
    work, never a store rescan beyond the single anti-join pass. When every
    template predicate is CONSTANT (all DATA forms, and most templated
    updates — e.g. a predicate migration), the anti-joins are PRED-PRUNED:
    only the matching relation's slice joins, the rest of the store passes
    through as a filter the parquet scan absorbs — at 100 TB a migration
    shuffles one predicate's volume, not the store's."""
    u = parse_sparql_update(update)
    key = ["src_id", "pred", "dst_id"]
    spark = edges.sparkSession
    types = dict(edges.dtypes)
    schema3 = (f"src_id {types['src_id']}, pred {types['pred']}, "
               f"dst_id {types['dst_id']}")

    def lit_frame(triples):
        return spark.createDataFrame(
            [tuple(t) for t in sorted(set(map(tuple, triples)), key=repr)],
            schema3)

    if u["clear"]:
        # CLEAR: the empty store, schema kept (the caller's generation
        # machinery still commits/diffs it like any other update)
        return edges.where(F.lit(False))
    if u["load"] is not None:
        from .rdf import from_ntriples

        tri = from_ntriples(spark.read.text(u["load"]))
        ins_df = tri.select(*[F.col(k).cast(types[k]).alias(k)
                              for k in key])
        del_df = None
    elif u["where"] is None:
        del_df = lit_frame(u["delete_data"]) if u["delete_data"] else None
        ins_df = lit_frame(u["insert_data"]) if u["insert_data"] else None
    else:
        sol = _compile_select(edges, u["where"], stats)
        if u["delete_tpl"] and u["insert_tpl"]:
            # both templates read the same solutions — cut the shared lineage
            sol = sol.localCheckpoint(eager=False)

        def inst(tpls):
            frames = []
            for s, p, o in tpls:
                cols = []
                for slot, term in (("src_id", s), ("pred", p),
                                   ("dst_id", o)):
                    t = types[slot]
                    if isinstance(term, str) and term.startswith("?"):
                        v = term[1:]
                        if v not in sol.columns:
                            raise ValueError(
                                f"template variable {term} is not bound by "
                                f"the WHERE group ({sol.columns})")
                        cols.append(F.col(v).cast(t).alias(slot))
                    else:
                        cols.append(F.lit(term).cast(t).alias(slot))
                frames.append(sol.select(*cols))
            out = frames[0]
            for fr in frames[1:]:
                out = out.unionByName(fr)
            cond = None
            for k in key:
                c = F.col(k).isNotNull()
                cond = c if cond is None else (cond & c)
            return out.where(cond)

        del_df = inst(u["delete_tpl"]) if u["delete_tpl"] else None
        ins_df = inst(u["insert_tpl"]) if u["insert_tpl"] else None

    def const_preds(triples):
        """The template's predicate set, or None when any predicate is a
        variable (pruning impossible)."""
        if not triples:
            return None
        preds = set()
        for _, p, _ in triples:
            if isinstance(p, str) and p.startswith("?"):
                return None
            preds.add(p)
        return sorted(preds, key=repr)

    out = edges
    if del_df is not None:
        dpreds = const_preds(u["delete_data"] or u["delete_tpl"])
        if dpreds is not None:
            # constant-predicate delete: only the matching pred slice can
            # lose rows — anti-join THAT slice and pass the rest through
            # untouched. The pred filter reaches the (bucketed, pred-stable)
            # parquet scan, so at store scale the delete shuffles one
            # relation's volume, never the whole store.
            miss = F.col("pred").isNull() | ~F.col("pred").isin(dpreds)
            out = (out.where(miss).unionByName(
                out.where(F.col("pred").isin(dpreds))
                .join(del_df.distinct(), key, "left_anti")))
        else:
            out = out.join(del_df.distinct(), key, "left_anti")
    if ins_df is not None:
        fill = [(F.lit(1) if c == "n_occurrences" else F.lit(None))
                .cast(t).alias(c)
                for c, t in edges.dtypes if c not in key]
        existing = out.select(*key)
        ipreds = const_preds(u["insert_data"] or u["insert_tpl"])
        if ipreds is not None:
            # same pruning on the no-op probe: a store row whose predicate
            # is not in the insert templates can never collide with an
            # inserted key, so the anti-join's right side is one slice
            existing = existing.where(F.col("pred").isin(ipreds))
        new_rows = (ins_df.distinct()
                    .join(existing, key, "left_anti")
                    .select(*key, *fill))
        out = out.unionByName(new_rows).select(*edges.columns)
    return out
