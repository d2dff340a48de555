"""Single-node golden results for the non-SQL-expressible queries.

The KG/tagger queries (tokenizer state machine, NumPy DNN decode, iterative CC) cannot
be written as one DuckDB SQL statement, so their driver-side correctness oracle is a
*materialized golden table*: this module recomputes each query's result with plain
Python loops over the same deterministic inputs — no Spark, no DataFrames, no
distribution — and writes it as parquet. ``oracle_sql()`` then points DuckDB at the
golden file (``SELECT * FROM read_parquet(...)``), which turns the driver's rows/
schema/hash comparison into a hard check of the distributed plumbing (partitioning,
Arrow round-trips, join/groupBy semantics, ordering-invariance).

The golden shares the *pure per-sentence functions* with the Spark operators
(tokenizer, lexicon tagger, triple templates — one definition, as the reference shares
its Tokenizer between console/webservice hosts, ConsoleDemo/Program.cs:254-256) but
none of the distributed machinery: iteration here is a flat driver loop, joins are
dicts, connected components is a BFS, aggregation is a Counter. Everything is a pure
function of (seed, input parquet), so the files regenerate bit-identically.

Float determinism: the only aggregated float is ``avg_confidence``; the Spark operator
sums integer micro-units (order-independent) and divides once, and this module mirrors
those exact IEEE ops — see graph.build_edges_table.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from collections import Counter, defaultdict
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

# bump when any EXISTING golden's semantics change so stale files regenerate
# (adding a NEW query does not need a bump — ensure_goldens fills in missing files
# incrementally; the bump invalidates every file, which is only right when shared
# kernels or mirrors changed)
GOLDEN_VERSION = 11

GOLDEN_QUERIES = (
    "kg_triples", "kg_sentences", "kg_links", "kg_canonical", "kg_edges",
    "kg_invariant", "kg_mentions", "tag_bilstm", "tag_bilstm_crf", "media_meta",
    "media_frames", "ann_lsh_multi", "ann_ivf",
    # round 3: Transformer encoder, fuzzy linking, media resize/features, training,
    # URL/domain extraction
    "tag_transformer", "kg_links_fuzzy", "media_resized", "media_embeddings",
    "train_history", "kg_urls",
    # round 4: full-cascade sentence splitter, >220-token chunked tagging, ResultVM
    # output shape (original-surface recovery), PII redaction
    "kg_sentences_full", "tag_chunked", "result_vm", "redact_pii", "kg_degree",
    # round 5: per-class probability output (M9/M11 — the last model output shape
    # without a hard driver row)
    "tag_probs",
    # round 6: Transformer training parity (EncoderType=Transformer through the
    # same distributed loop + Adam — Options.cs EncoderType, ModelBuilder.cs)
    "train_history_transformer",
    # round 6: REAL media codecs (pure-stdlib PNG/WAV/CSV, codecs.py) — the
    # impl='real' seam executed for every media kind of the corpus
    "media_real", "media_frames_real",
    # round 7: baseline JPEG/JFIF codec (codecs.jpeg_encode/decode) — the same
    # image spans carried as JFIF (seed-varied 4:4:4/4:2:0 + restart layouts),
    # dimensions from SOF, resize = decode → NN → re-encode JPEG
    "media_real_jpeg",
)


def _round_like_spark(x: float, digits: int) -> float:
    """Spark's Round on DOUBLE = BigDecimal(Double.toString(x)).setScale(d, HALF_UP):
    shortest round-trip repr (Python repr matches), then half-away-from-zero."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-digits), ROUND_HALF_UP))


def n_docs_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.001
    return max(int(sf * 1_000_000), 100)


# ------------------------------------------------------------------ corpus stages

def _synthetic_docs(n_docs: int, seed: int = 42):
    from .fixtures.corpus import make_doc

    for idx in range(n_docs):
        yield make_doc(idx, seed)


def _triples_rows(n_docs: int) -> list[tuple]:
    """Mirror of docs_to_triples_fused (operators/triples.py) as a driver loop:
    (doc_id, span_idx, sent_idx, subj, pred, obj, subj_type, obj_type,
    subj_norm, obj_norm, confidence)."""
    from .fixtures.corpus import gazetteer_from_aliases, make_aliases
    from .model.lexicon import LexiconNer, tag_sentence
    from .model.triples import extract_triples
    from .tokenizer import run_simple_sents_allocate

    ner = LexiconNer(gazetteer_from_aliases(make_aliases(seed=42)))
    memo: dict[str, list] = {}
    rows: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            per_text = memo.get(text)
            if per_text is None:
                per_text = []
                for sent_idx, (_sent, words) in enumerate(
                    run_simple_sents_allocate(text, True)
                ):
                    pos, nert = tag_sentence(words, ner)
                    triples = extract_triples(words, pos, nert)
                    if triples:
                        per_text.append((sent_idx, triples))
                memo[text] = per_text
            for sent_idx, triples in per_text:
                for tr in triples:
                    rows.append((doc_id, s["offset"], sent_idx, tr.subj, tr.pred,
                                 tr.obj, tr.subj_type, tr.obj_type, tr.subj_norm,
                                 tr.obj_norm, tr.confidence))
    return rows


def _mentions_rows(n_docs: int) -> list[tuple]:
    """Mirror of tokenize_docs → tag_sentences_lexicon → ner_mentions (all BIO entity
    spans, operators/mentions.py): (doc_id, span_idx, sent_idx, start_tok, end_tok,
    surface, mention_norm, mention_type)."""
    from .fixtures.corpus import gazetteer_from_aliases, make_aliases
    from .model.lexicon import LexiconNer
    from .model.triples import merge_bio_spans
    from .tokenizer import run_simple_sents_allocate

    ner = LexiconNer(gazetteer_from_aliases(make_aliases(seed=42)))
    memo: dict[str, list] = {}
    rows: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            per_text = memo.get(text)
            if per_text is None:
                per_text = []
                for sent_idx, (_sent, words) in enumerate(
                    run_simple_sents_allocate(text, True)
                ):
                    spans_out = merge_bio_spans(words, ner.tag(words))
                    if spans_out:
                        per_text.append((sent_idx, spans_out))
                memo[text] = per_text
            for sent_idx, ments in per_text:
                for mt in ments:
                    rows.append((doc_id, s["offset"], sent_idx, mt.start_tok,
                                 mt.end_tok, mt.surface, mt.norm, mt.etype))
    return rows


def _links_rows(triples_rows: list[tuple]) -> list[tuple]:
    """Mirror of linking.mentions_from_triples + link_mentions:
    (mention_norm, mention_type, n_mentions, entity_id, entity_type, link_score)."""
    from .fixtures.corpus import make_aliases

    mentions: Counter = Counter()
    for r in triples_rows:
        mentions[(r[8], r[6])] += 1  # (subj_norm, subj_type)
        mentions[(r[9], r[7])] += 1  # (obj_norm, obj_type)

    by_alias: dict[str, list] = defaultdict(list)
    for a in make_aliases(seed=42):
        by_alias[a["alias_norm"]].append((a["entity_id"], a["entity_type"], a["prior"]))

    out: list[tuple] = []
    for (norm, mtype), n in mentions.items():
        cands = by_alias.get(norm)
        if not cands:
            out.append((norm, mtype, n, None, None, None))
            continue
        # same ordering as F.max(struct(link_score, entity_id, entity_type)):
        # score first, then entity_id / entity_type lexicographically
        best = max(
            (prior * (1.0 if mtype == etype else 0.25), eid, etype)
            for eid, etype, prior in cands
        )
        out.append((norm, mtype, n, best[1], best[2], best[0]))
    return out


def _stem_py(norm: str) -> str:
    """linking._stem in plain Python (same Java-regex semantics: greedy {1,3})."""
    last = norm.split(" ")[-1]
    stem = re.sub(r"[аеиоуыэюяй]{1,3}$", "", last)
    return stem if len(stem) >= 4 else last


def _levenshtein_py(a: str, b: str) -> int:
    """Unit-cost edit distance by codepoint — Spark's F.levenshtein semantics."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def _links_fuzzy_rows(links_rows: list[tuple], min_sim: float = 0.72) -> list[tuple]:
    """Mirror of linking.link_mentions_fuzzy: exact-pass rows kept; each unlinked
    mention retried against the stem block (same _stem semantics), scored
    1−lev/maxlen, best candidate by the same (link_score, entity_id, entity_type)
    struct ordering (nulls smallest). Covers the inflected-surface case the exact
    pass misses ('с . козлову' → the 'козлов' alias stem block)."""
    from .fixtures.corpus import make_aliases

    by_stem: dict[str, list] = defaultdict(list)
    for a in make_aliases(seed=42):
        by_stem[_stem_py(a["alias_norm"])].append(a)

    out: list[tuple] = []
    for norm, mtype, n, eid, etype, score in links_rows:
        if eid is not None:
            out.append((norm, mtype, n, eid, etype, score))
            continue
        best_key = None
        best = (None, None, None)
        for a in by_stem.get(_stem_py(norm), ()):
            lev = _levenshtein_py(norm, a["alias_norm"])
            maxlen = max(len(norm), len(a["alias_norm"]))
            sim = 1.0 - lev / maxlen
            s = None
            if sim >= min_sim:  # Spark: null when sim < min_sim
                s = _round_like_spark(
                    sim * a["prior"]
                    * (1.0 if mtype == a["entity_type"] else 0.25), 6)
            key = (s is not None, s if s is not None else 0.0,
                   a["entity_id"], a["entity_type"])
            if best_key is None or key > best_key:
                best_key = key
                best = (s, a["entity_id"], a["entity_type"])
        s, beid, betype = best
        if s is None:  # below threshold or no stem match: stays unlinked
            out.append((norm, mtype, n, None, None, None))
        else:
            out.append((norm, mtype, n, beid, betype, s))
    return out


def _canonical_rows(links_rows: list[tuple]) -> list[tuple]:
    """Mirror of canonicalize.canonical_map: vertices, link+block edges, connected
    components by BFS with min-vertex labels:
    (mention_norm, mention_type, n_mentions, entity_id, canonical_id)."""
    verts = [(f"m:{mtype}:{norm}", norm, mtype, n, eid)
             for norm, mtype, n, eid, _et, _s in links_rows]

    adj: dict[str, set] = defaultdict(set)

    def add_edge(a: str, b: str) -> None:
        adj[a].add(b)
        adj[b].add(a)

    for v, _norm, _mtype, _n, eid in verts:
        if eid is not None:
            add_edge(v, f"e:{eid}")
    blocks: dict[tuple, list] = defaultdict(list)
    for v, norm, mtype, _n, _eid in verts:
        blocks[(mtype, _stem_py(norm))].append(v)
    for members in blocks.values():
        if len(members) > 1:
            hub = min(members)
            for v in members:
                if v != hub:
                    add_edge(v, hub)

    label: dict[str, str] = {}
    for v0 in sorted(adj):
        if v0 in label:
            continue
        comp, stack = [v0], [v0]
        seen = {v0}
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    comp.append(w)
                    stack.append(w)
        lo = min(comp)
        for u in comp:
            label[u] = lo

    return [(norm, mtype, n, eid, label.get(v, v))
            for v, norm, mtype, n, eid in verts]


def _edges_rows(triples_rows: list[tuple], canonical_rows: list[tuple]) -> list[tuple]:
    """Mirror of graph.build_edges_table (minus the bucket layout column):
    (src_id, pred, dst_id, n_occurrences, avg_confidence, n_docs, example_doc_id)."""
    canon = {(norm, mtype): cid for norm, mtype, _n, _eid, cid in canonical_rows}
    groups: dict[tuple, list] = defaultdict(list)
    for r in triples_rows:
        doc_id, _si, _se, _subj, pred, _obj, st, ot, sn, on, conf = r
        src = canon.get((sn, st)) or f"m:{st}:{sn}"
        dst = canon.get((on, ot)) or f"m:{ot}:{on}"
        groups[(src, pred, dst)].append((doc_id, conf))
    out = []
    for (src, pred, dst), items in groups.items():
        micros = sum(int(round(c * 1e6)) for _d, c in items)
        n = len(items)
        # same IEEE op order as the Spark expression: (sum_micros / n) / 1e6
        avg = (float(micros) / n) / 1e6
        docs = {d for d, _c in items}
        out.append((src, pred, dst, n, avg, len(docs), min(docs)))
    return out


def _url_rows(n_docs: int) -> list[tuple]:
    """Mirror of text_spans → textstats.extract_urls: the same pure detector
    (urldetect.allocate_urls) and domain key (url_domain) over a flat driver loop."""
    from .urldetect import allocate_urls, url_domain

    memo: dict[str, list] = {}
    rows: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            urls = memo.get(text)
            if urls is None:
                urls = [(u.type, u.value(text), url_domain(u.value(text), u.type))
                        for u in allocate_urls(text)]
                memo[text] = urls
            for i, (utype, uval, dom) in enumerate(urls):
                rows.append((doc_id, s["offset"], i, utype, uval, dom))
    return rows


def _degree_rows(edges_rows: list[tuple]) -> list[tuple]:
    """Mirror of graph.degree_stats over the edges mirror: weighted node degree →
    log2 histogram. Bucket = degree.bit_length()-1, and the Spark side computes the
    same quantity from the binary representation (length(bin(degree))-1), so both are
    integer-exact for every positive BIGINT degree — no double-log2 rounding edge:
    (degree_bucket, n_nodes, max_degree)."""
    deg: Counter = Counter()
    for src, _pred, dst, n_occ, _avg, _nd, _ex in edges_rows:
        deg[src] += n_occ
        deg[dst] += n_occ
    buckets: dict[int, list[int]] = defaultdict(list)
    for _node, d in deg.items():
        buckets[d.bit_length() - 1].append(d)
    return [(b, len(ds), max(ds)) for b, ds in buckets.items()]


def _redact_rows(n_docs: int, min_digits: int = 4) -> list[tuple]:
    """Mirror of text_spans → textstats.redact_pii: the same pure kernel
    (urldetect.redact_text) over a flat driver loop."""
    from .urldetect import redact_text

    memo: dict[str, tuple] = {}
    rows: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            red = memo.get(text)
            if red is None:
                red = redact_text(text, min_digits)
                memo[text] = red
            rows.append((doc_id, s["offset"], red[0], red[1], red[2], red[3]))
    return rows


def _invariant_rows(n_docs: int) -> list[tuple]:
    """Mirror of q_kg_invariant: reconstruct each doc's span sequence from the text/
    media projections and compare against the input."""
    violations = 0
    n = 0
    for _doc_id, spans in _synthetic_docs(n_docs):
        # the two pipeline projections (text_spans / media_spans), re-interleaved —
        # mirrors the rebuilt side of q_kg_invariant
        rebuilt = sorted(
            [(s["offset"], None, s["text"], None)
             for s in spans if s["kind"] == "text"]
            + [(s["offset"], s["kind"], None, s["media_ref"])
               for s in spans if s["kind"] != "text"]
        )
        orig = sorted(
            (s["offset"], None if s["kind"] == "text" else s["kind"],
             s["text"], s["media_ref"])
            for s in spans
        )
        if spans:
            n += 1
            if rebuilt != orig:
                violations += 1
    return [(n, violations)]


# ------------------------------------------------------------------ documents-table stages

def _documents(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _sentences_rows(sf_dir: str) -> list[tuple]:
    """Mirror of docs_from_documents_table → tokenize_docs for the sentence query:
    (doc_id, span_idx, sent_idx, sent_start, sent_len, n_tokens)."""
    from .operators.tokenize import _tokenize_text

    out = []
    memo: dict[str, list] = {}
    for did, text in _documents(sf_dir):
        if text is None:
            continue
        sents = memo.get(text)
        if sents is None:
            sents = _tokenize_text(text, True)
            memo[text] = sents
        doc_id = f"doc-{did:08d}"
        for sent_idx, start, length, toks in sents:
            out.append((doc_id, 0, sent_idx, start, length, len(toks)))
    return out


def _sentences_full_rows(n_docs: int) -> list[tuple]:
    """Mirror of tokenize_docs(sent_mode='full') over the SYNTHETIC corpus — the
    full rule-cascade splitter (sentsplit_full.py; reference SentSplitter.cs:254-528,
    IsEndOfSentTDQMEP :1240-1310). The synthetic pool carries the material the
    cascade branches on (abbreviation n-grams '2010г.'/'млн руб.', initials
    'э.л. джеймс', statute refs 'п.\"в\" ч.3 ст.286', three-dots, quotes): 10 of the
    40 pool sentences split differently from the simple mode, so this row fails if
    either splitter's semantics drift."""
    from .operators.tokenize import _tokenize_text

    out = []
    memo: dict[str, list] = {}
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            sents = memo.get(text)
            if sents is None:
                sents = _tokenize_text(text, True, "full")
                memo[text] = sents
            for sent_idx, start, length, toks in sents:
                out.append((doc_id, s["offset"], sent_idx, start, length, len(toks)))
    return out


def _result_vm_rows(n_docs: int) -> list[tuple]:
    """Mirror of tokenize_docs → tag_sentences_lexicon → as_result_vm flattened to
    scalar rows (operators/tag.py:122; reference ResultVM WebService/Models/VM.cs:22-46):
    (doc_id, span_idx, sent_idx, tok_idx, Word, Label). Word is the ORIGINAL surface
    (coalesce(orig, value) — GetOriginalValue analog, T11), Label the corrected POS."""
    from .operators.tag import _correct_output_types, _words_from_tokens
    from .operators.tokenize import _tokenize_text
    from .model.lexicon import pos_tag_word

    memo: dict[str, list] = {}
    rows: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            per_text = memo.get(text)
            if per_text is None:
                per_text = []
                for sent_idx, _start, _length, toks in _tokenize_text(text, True):
                    words = _words_from_tokens(toks)
                    pos = _correct_output_types(toks, [pos_tag_word(w) for w in words])
                    per_text.append((sent_idx, [
                        (t["orig"] if t["orig"] is not None else t["value"], p)
                        for t, p in zip(toks, pos)
                    ]))
                memo[text] = per_text
            for sent_idx, tuples in per_text:
                for tok_idx, (word, label) in enumerate(tuples):
                    rows.append((doc_id, s["offset"], sent_idx, tok_idx, word, label))
    return rows


def _tag_chunked_rows(n_docs: int) -> list[tuple]:
    """Mirror of q_tag_chunked: BiLSTM tagging restricted to >220-token sentences of
    the synthetic corpus — the rows where the reference chunking semantics (M13,
    SeqLabel.cs:259-311: >220 tokens → chunked decode, ≤10%-overflow truncated) fire
    inside a driver-oracle row. Predicts are memoized per feature sequence (the long
    sentences repeat across docs at equal lengths); decode is batch-of-1, which the
    operator's equal-length bucketing makes exactly batch-invariant."""
    from .model.pinned import pinned_tagger_models
    from .operators.tag import _correct_output_types
    from .operators.tokenize import _tokenize_text

    pos_m, ner_m = pinned_tagger_models()
    sent_memo: dict[str, list] = {}
    pos_memo: dict[tuple, list] = {}
    ner_memo: dict[tuple, list] = {}
    rows: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "text" or s["text"] is None:
                continue
            text = s["text"]
            tagged = sent_memo.get(text)
            if tagged is None:
                tagged = []
                for sent_idx, _start, _length, toks in _tokenize_text(text, True):
                    if len(toks) <= 220:
                        continue
                    pk = tuple(t["ending_pos"] for t in toks)
                    nk = tuple(t["ending_ner"] for t in toks)
                    pos_raw = pos_memo.get(pk)
                    if pos_raw is None:
                        pos_raw = pos_m.predict_tags([list(pk)])[0]
                        pos_memo[pk] = pos_raw
                    ner_raw = ner_memo.get(nk)
                    if ner_raw is None:
                        ner_raw = ner_m.predict_tags([list(nk)])[0]
                        ner_memo[nk] = ner_raw
                    tagged.append((sent_idx, _correct_output_types(toks, pos_raw),
                                   ner_raw))
                sent_memo[text] = tagged
            for sent_idx, pos, nert in tagged:
                for tok_idx, (p, nr) in enumerate(zip(pos, nert)):
                    rows.append((doc_id, s["offset"], sent_idx, tok_idx, p, nr))
    return rows


def _tagged_token_rows(sf_dir: str, crf: bool, encoder: str = "bilstm") -> list[tuple]:
    """Mirror of q_tag_bilstm / q_tag_bilstm_crf / q_tag_transformer: per-token
    (doc_id, span_idx, sent_idx, tok_idx, pos_tag, ner_tag) with batch-of-1 predicts.
    The BiLSTM operator's equal-length bucketing makes its decode exactly
    batch-invariant (tests/test_model.py); the Transformer's pad mask makes its padded
    batches mathematically batch-invariant with float noise ~8e-7 in the logits —
    400× under the pinned model's minimum argmax margin (3.3e-4 over every distinct
    corpus sentence), and the oracle comparison at the two fixed sf dirs verifies the
    tag-level match exhaustively."""
    from .model.pinned import pinned_tagger_models
    from .operators.tag import _correct_output_types
    from .operators.tokenize import _tokenize_text

    pos_m, ner_m = pinned_tagger_models(encoder=encoder)
    if crf:
        ner_m = ner_m.with_crf(bio=True)

    out = []
    memo: dict[str, list] = {}
    for did, text in _documents(sf_dir):
        if text is None:
            continue
        tagged = memo.get(text)
        if tagged is None:
            tagged = []
            for sent_idx, _start, _length, toks in _tokenize_text(text, True):
                pos_raw = pos_m.predict_tags([[t["ending_pos"] for t in toks]])[0]
                ner_raw = ner_m.predict_tags([[t["ending_ner"] for t in toks]])[0]
                pos = _correct_output_types(toks, pos_raw)
                tagged.append((sent_idx, pos, ner_raw))
            memo[text] = tagged
        doc_id = f"doc-{did:08d}"
        for sent_idx, pos, nert in tagged:
            for tok_idx, (p, nr) in enumerate(zip(pos, nert)):
                out.append((doc_id, 0, sent_idx, tok_idx, p, nr))
    return out


def _tag_probs_rows(sf_dir: str) -> list[tuple]:
    """Mirror of tokenize_docs → tag_sentences_probs flattened to scalar rows
    (operators/tag.py; reference SeqLabel.cs:175-218): per token the full sorted
    [(class, prob)] list from the pinned POS model's batch-1 predict_probs, plus the
    per-sentence WordsInDictRatio (SeqLabel.cs:194-216). The operator calls the SAME
    kernel batch-1, so the floats are bit-identical by construction:
    (doc_id, span_idx, sent_idx, tok_idx, rank, label, prob, words_in_dict_ratio)."""
    from .model.pinned import pinned_tagger_models
    from .operators.tokenize import _tokenize_text

    pos_m, _ner_m = pinned_tagger_models()
    text_memo: dict[str, list] = {}
    feat_memo: dict[tuple, tuple] = {}
    rows: list[tuple] = []
    for did, text in _documents(sf_dir):
        if text is None:
            continue
        per = text_memo.get(text)
        if per is None:
            per = []
            for sent_idx, _start, _length, toks in _tokenize_text(text, True):
                key = tuple(t["ending_pos"] for t in toks)
                res = feat_memo.get(key)
                if res is None:
                    res = pos_m.predict_probs(list(key))
                    feat_memo[key] = res
                per.append((sent_idx, res))
            text_memo[text] = per
        doc_id = f"doc-{did:08d}"
        for sent_idx, (per_tok, ratio) in per:
            for tok_idx, ranked in enumerate(per_tok):
                for rank, (label, prob) in enumerate(ranked):
                    rows.append((doc_id, 0, sent_idx, tok_idx, rank, label, prob,
                                 ratio))
    return rows


def _media_frames_rows(n_docs: int, interval_ms: int = 5000) -> list[tuple]:
    """Mirror of media_spans → media_payloads → decode_media(fake) → sample_frames
    over the synthetic corpus: (doc_id, span_idx, frame_idx, t_ms, frame_sha1)."""
    out: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] == "text":
                continue
            payload = bytes.fromhex(
                hashlib.sha1(s["media_ref"].encode()).hexdigest()[:32] * 4)
            sha = hashlib.sha1(payload).hexdigest()
            if s["kind"] == "audio":
                duration = 1000 + ((payload[0] << 8) | payload[1])
            else:
                duration = 0
            for i, t in enumerate(range(0, duration, interval_ms)):
                out.append((doc_id, s["offset"], i, t,
                            hashlib.sha1(f"{sha}:{t}".encode()).hexdigest()))
    return out


def _media_meta_rows(sf_dir: str) -> list[tuple]:
    """Mirror of docs_from_documents_table media spans → media_payloads →
    decode_media(impl='fake'): (doc_id, span_idx, kind, n_bytes, sha1, width, height,
    duration_ms). Payload derivation shared with the resized/embeddings mirrors
    (_doc_media_payloads) so the three can never desync."""
    return [
        (doc_id, span_idx, kind, len(payload), hashlib.sha1(payload).hexdigest(),
         64 + payload[0], 64 + payload[1], 0)
        for doc_id, span_idx, kind, payload in _doc_media_payloads(sf_dir)
    ]


def _doc_media_payloads(sf_dir: str):
    """(doc_id, span_idx, kind, payload) for the documents-table media spans — the
    shared head of the media_meta / media_resized / media_embeddings mirrors
    (docs_from_documents_table synthesizes one image span per did%8==0 doc;
    media_payloads derives payload = unhex(repeat(substr(sha1(media_ref),1,32),4)))."""
    for did, _text in _documents(sf_dir):
        if did % 8 != 0:
            continue
        media_ref = "media://" + hashlib.sha1(str(did).encode()).hexdigest()
        payload = bytes.fromhex(hashlib.sha1(media_ref.encode()).hexdigest()[:32] * 4)
        yield f"doc-{did:08d}", 1, "image", payload


def _media_real_rows(sf_dir: str, width: int = 32, height: int = 32) -> list[tuple]:
    """Mirror of media_payloads(codec='real') → decode_media(impl='real') +
    resize_media(impl='real') over the documents-table image spans: REAL PNG bytes
    synthesized per media_ref, dimensions read from the IHDR, resize =
    decode → nearest-neighbor → re-encode (codecs.py — the same single-source
    pure functions the Spark operators call, so a green row gates the distributed
    plumbing; the codecs themselves are gated by round-trip/filter/known-answer
    tests in tests/test_codecs.py)."""
    from . import codecs as C

    out = []
    for did, _text in _documents(sf_dir):
        if did % 8 != 0:
            continue
        media_ref = "media://" + hashlib.sha1(str(did).encode()).hexdigest()
        payload = C.synth_payload("image", media_ref)
        w, h = C.png_dimensions(payload)
        resized = C.png_encode(C.resize_nearest(C.png_decode(payload), width, height))
        out.append((f"doc-{did:08d}", 1, "image", len(payload),
                    hashlib.sha1(payload).hexdigest(), w, h, 0,
                    hashlib.sha1(resized).hexdigest()))
    return out


def _media_real_jpeg_rows(sf_dir: str, width: int = 32,
                          height: int = 32) -> list[tuple]:
    """Mirror of media_payloads(codec='real_jpeg') → decode_media(impl='real')
    + resize_media(impl='real') over the documents-table image spans: the SAME
    pixel grids as _media_real_rows but carried as baseline JFIF (seed-varied
    4:4:4 / 4:2:0 and restart-marker layouts — codecs.synth_image_jpeg), so a
    green row executes the JPEG encoder AND decoder end-to-end through the
    distributed operators: dimensions from the SOF header, resize = full scan
    decode → nearest-neighbor → JPEG re-encode."""
    from . import codecs as C

    out = []
    for did, _text in _documents(sf_dir):
        if did % 8 != 0:
            continue
        media_ref = "media://" + hashlib.sha1(str(did).encode()).hexdigest()
        payload = C.synth_payload("image", media_ref, image_format="jpeg")
        w, h = C.jpeg_dimensions(payload)
        resized = C.jpeg_encode(
            C.resize_nearest(C.jpeg_decode(payload), width, height),
            quality=90)
        out.append((f"doc-{did:08d}", 1, "image", len(payload),
                    hashlib.sha1(payload).hexdigest(), w, h, 0,
                    hashlib.sha1(resized).hexdigest()))
    return out


def _media_frames_real_rows(n_docs: int, interval_ms: int = 250) -> list[tuple]:
    """Mirror of media_payloads(codec='real') → sample_frames(impl='real') over the
    synthetic corpus's audio spans: REAL WAV payloads, one fingerprint per PCM
    window [t, t+interval) — sha1 over the actual samples, not a pseudo-hash."""
    from . import codecs as C

    out: list[tuple] = []
    for doc_id, spans in _synthetic_docs(n_docs):
        for s in spans:
            if s["kind"] != "audio":
                continue
            samples, rate = C.wav_decode(C.synth_payload("audio", s["media_ref"]))
            dur = samples.shape[0] * 1000 // rate
            for i, t in enumerate(range(0, dur, interval_ms)):
                lo = t * rate // 1000
                hi = min((t + interval_ms) * rate // 1000, samples.shape[0])
                out.append((doc_id, s["offset"], i, t,
                            hashlib.sha1(samples[lo:hi].tobytes()).hexdigest()))
    return out


def _media_resized_rows(sf_dir: str, width: int = 32, height: int = 32) -> list[tuple]:
    """Mirror of resize_media(impl='fake'): deterministic width×height byte grid from
    the payload digest, reported by sha1 (the raw bytes stay out of the oracle row —
    the digest is the engine-portable witness)."""
    out = []
    for doc_id, span_idx, kind, payload in _doc_media_payloads(sf_dir):
        seed = hashlib.sha1(payload + f":{width}x{height}".encode()).digest()
        n = width * height
        resized = (seed * (n // len(seed) + 1))[:n]
        out.append((doc_id, span_idx, kind, width, height,
                    hashlib.sha1(resized).hexdigest()))
    return out


def _media_embeddings_rows(sf_dir: str, dim: int = 16) -> list[tuple]:
    """Mirror of media_features(impl='fake') exploded to (…, dim_idx, value): the
    operator computes the unit-norm vector in pure Python floats, so the mirror's
    identical expressions reproduce it bit-for-bit."""
    import math

    out = []
    for doc_id, span_idx, kind, payload in _doc_media_payloads(sf_dir):
        raw: list[float] = []
        d = payload
        while len(raw) < dim:
            d = hashlib.sha1(d).digest()
            raw.extend(x / 255.0 - 0.5 for x in d)
        vec = raw[:dim]
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        for i, x in enumerate(vec):
            out.append((doc_id, span_idx, kind, i, x / norm))
    return out


def train_fixture_model(sf_dir: str, encoder: str = "bilstm"):
    """THE pinned model the train_history oracle pair trains — one definition shared
    by the golden mirror and q_train_history/q_train_history_transformer (a drift
    would train different networks on the two sides)."""
    from .fixtures.corpus import TRAIN_FIXTURE_TAGS, train_fixture
    from .model.vocab import Vocab

    rows = train_fixture(sf_dir)
    vocab = Vocab.build([t for _d, t, _l in rows], cap=2000)
    if encoder == "transformer":
        from .model.transformer import TransformerTaggerModel

        return rows, TransformerTaggerModel.create_pinned(
            vocab, list(TRAIN_FIXTURE_TAGS), emb_dim=8, n_heads=2, depth=1, seed=5)
    from .model.bilstm import BiLSTMTaggerModel

    return rows, BiLSTMTaggerModel.create_pinned(
        vocab, list(TRAIN_FIXTURE_TAGS), emb_dim=8, hidden_dim=8, seed=5)


def _train_history_rows(sf_dir: str, epochs: int = 2, lr: float = 0.05,
                        batch_size: int = 32, encoder: str = "bilstm") -> list[tuple]:
    """Mirror of q_train_history: the SAME per-epoch math train_bilstm_distributed
    runs with one partition and the deterministic collect reduce — shared pure kernels
    (_bucketed_batches, loss_and_grads / transformer_loss_and_grads per ``encoder``,
    AdamOptimizer), shared corpus derivation (fixtures.corpus.train_fixture), flat
    driver loop instead of broadcast → mapPartitions → reduce. A green oracle row is
    therefore a hard check of the distributed training plumbing (R2-R5) — for BOTH
    encoder types (Options.cs EncoderType)."""
    import numpy as np

    from .fixtures.corpus import valid_fixture, validate_macro_f1
    from .model.train import AdamOptimizer, add_grads
    from .model.vocab import UNK_ID
    from .operators.train_loop import (_bucketed_batches, _clone_with_weights,
                                       _model_family)

    rows, m = train_fixture_model(sf_dir, encoder)
    valid = valid_fixture(sf_dir)
    compute, dims = _model_family(m)
    tag2id = {t: i for i, t in enumerate(m.tgt_tags)}
    w2i = m.src_vocab.word2id
    enc = [([w2i.get(t, UNK_ID) for t in toks], [tag2id[x] for x in labs])
           for _d, toks, labs in rows]
    weights = {k: v.copy() for k, v in m.weights.items()}
    opt = AdamOptimizer(grad_clip=3.0)
    out: list[tuple] = []
    scores: list[float] = []
    for epoch in range(epochs):
        # same cast point as train_loop.part_grads: float64 once per round
        w64 = {k: np.asarray(v, dtype=np.float64) for k, v in weights.items()}
        grads = None
        cost = 0.0
        n_tok = 0
        for ids, tgt in _bucketed_batches(enc, batch_size):
            c, g, n = compute(w64, *dims, ids, tgt)
            cost += c
            n_tok += n
            grads = add_grads(grads, g)
        opt.step(weights, grads, batch_size=n_tok, lr=lr)
        # R5/R6 mirror: validate post-step weights exactly as train_loop does
        # (validate_fn(cand) with copied weights, train_loop.py:200-210)
        cand = _clone_with_weights(m, {k: v.copy() for k, v in weights.items()})
        scores.append(validate_macro_f1(cand, valid))
        out.append((epoch, round(cost / max(n_tok, 1), 6), n_tok))
    best_epoch = max(range(epochs), key=lambda e: (scores[e], -e))
    return [(epoch, nll, n, scores[epoch], int(epoch == best_epoch))
            for epoch, nll, n in out]


def _ann_lsh_multi_rows(sf_dir: str, k: int = 10, n_planes: int = 6, n_tables: int = 16,
                        seed: int = 42, round_digits: int = 4) -> list[tuple]:
    """Mirror of ann.lsh_multitable_topk with sequential-fold float arithmetic (Spark's
    F.aggregate is a left-to-right double fold, so plain Python loops — NOT np.dot,
    whose pairwise summation differs in the last ulp — reproduce it bit-exactly)."""
    import math

    from .operators.ann import _hyperplanes

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = [[float(x) for x in e] for e in t.column("embedding").to_pylist()]

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a: list[float]) -> float:
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    queries = [(vid, e) for vid, e in zip(ids, embs) if vid < 5]
    cand: dict[int, set] = {qid: set() for qid, _ in queries}
    for tbl in range(n_tables):
        planes = _hyperplanes(len(embs[0]), n_planes, seed, table=tbl)
        buckets: dict[str, list] = defaultdict(list)
        bits_of: dict[int, str] = {}
        for vid, e in zip(ids, embs):
            bits = "".join("1" if fold_dot(e, p) >= 0 else "0" for p in planes)
            buckets[bits].append(vid)
            bits_of[vid] = bits
        for qid, _e in queries:
            qb = bits_of[qid]
            probes = {qb}
            for j in range(n_planes):
                probes.add(qb[:j] + ("0" if qb[j] == "1" else "1") + qb[j + 1 :])
            for p in probes:
                cand[qid].update(buckets.get(p, ()))

    emb_by_id = dict(zip(ids, embs))
    out: list[tuple] = []
    for qid, qe in queries:
        scored = []
        for vid in cand[qid]:
            e = emb_by_id[vid]
            cos = _round_like_spark(fold_dot(e, qe) / (norm(e) * norm(qe)), round_digits)
            scored.append((vid, cos))
        scored.sort(key=lambda vc: (-vc[1], vc[0]))
        for rank, (vid, cos) in enumerate(scored[:k], start=1):
            out.append((qid, vid, cos, rank))
    return out


def _ann_ivf_rows(sf_dir: str, k: int = 10, n_centroids: int = 16, n_probe: int = 4,
                  round_digits: int = 4) -> list[tuple]:
    """Mirror of ann.ivf_topk (same sequential-fold arithmetic as the LSH mirror)."""
    import math

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = [[float(x) for x in e] for e in t.column("embedding").to_pylist()]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    emb_by_id = dict(zip(ids, embs))
    # centroid pick: n smallest md5(str(vec_id)) — mirrors pick_ivf_centroids
    ranked_ids = sorted(ids, key=lambda v: hashlib.md5(str(v).encode()).hexdigest())
    centroids = [(vid, emb_by_id[vid]) for vid in sorted(ranked_ids[:n_centroids])]

    def cell_scores(e):
        return [(fold_dot(e, cvec) / (norm(e) * norm(cvec)), cid) for cid, cvec in centroids]

    cells: dict[int, list] = defaultdict(list)
    for vid, e in zip(ids, embs):
        cells[max(cell_scores(e))[1]].append(vid)

    out: list[tuple] = []
    for qid, qe in [(v, e) for v, e in zip(ids, embs) if v < 5]:
        probes = [cid for _cos, cid in sorted(cell_scores(qe), reverse=True)[:n_probe]]
        cand = {vid for cid in probes for vid in cells[cid]}
        scored = []
        for vid in cand:
            e = emb_by_id[vid]
            cos = _round_like_spark(fold_dot(e, qe) / (norm(e) * norm(qe)), round_digits)
            scored.append((vid, cos))
        scored.sort(key=lambda vc: (-vc[1], vc[0]))
        for rank, (vid, cos) in enumerate(scored[:k], start=1):
            out.append((qid, vid, cos, rank))
    return out


# ------------------------------------------------------------------ materialization

_S, _I32, _I64, _F64 = pa.string(), pa.int32(), pa.int64(), pa.float64()

_SCHEMAS: dict[str, list[tuple[str, pa.DataType]]] = {
    "kg_triples": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                   ("subj", _S), ("pred", _S), ("obj", _S), ("subj_type", _S),
                   ("obj_type", _S), ("confidence", _F64)],
    "kg_sentences": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                     ("sent_start", _I32), ("sent_len", _I32), ("n_tokens", _I64)],
    "kg_links": [("mention_norm", _S), ("mention_type", _S), ("n_mentions", _I64),
                 ("entity_id", _S), ("entity_type", _S), ("link_score", _F64)],
    "kg_canonical": [("mention_norm", _S), ("mention_type", _S), ("n_mentions", _I64),
                     ("entity_id", _S), ("canonical_id", _S)],
    "kg_edges": [("src_id", _S), ("pred", _S), ("dst_id", _S), ("n_occurrences", _I64),
                 ("avg_confidence", _F64), ("n_docs", _I64), ("example_doc_id", _S)],
    "kg_invariant": [("n_docs", _I64), ("violations", _I64)],
    "kg_mentions": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                    ("start_tok", _I32), ("end_tok", _I32), ("surface", _S),
                    ("mention_norm", _S), ("mention_type", _S)],
    "tag_bilstm": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                   ("tok_idx", _I32), ("pos_tag", _S), ("ner_tag", _S)],
    "tag_bilstm_crf": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                       ("tok_idx", _I32), ("ner_tag", _S)],
    "media_meta": [("doc_id", _S), ("span_idx", _I32), ("kind", _S), ("n_bytes", _I32),
                   ("sha1", _S), ("width", _I32), ("height", _I32),
                   ("duration_ms", _I32)],
    "media_frames": [("doc_id", _S), ("span_idx", _I32), ("frame_idx", _I32),
                     ("t_ms", _I32), ("frame_sha1", _S)],
    "ann_lsh_multi": [("query_id", _I64), ("vec_id", _I64), ("cosine", _F64),
                      ("rank", _I64)],
    "ann_ivf": [("query_id", _I64), ("vec_id", _I64), ("cosine", _F64),
                ("rank", _I64)],
    "tag_transformer": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                        ("tok_idx", _I32), ("pos_tag", _S), ("ner_tag", _S)],
    "kg_links_fuzzy": [("mention_norm", _S), ("mention_type", _S),
                       ("n_mentions", _I64), ("entity_id", _S), ("entity_type", _S),
                       ("link_score", _F64)],
    "media_resized": [("doc_id", _S), ("span_idx", _I32), ("kind", _S),
                      ("width", _I32), ("height", _I32), ("resized_sha1", _S)],
    "media_embeddings": [("doc_id", _S), ("span_idx", _I32), ("kind", _S),
                         ("dim_idx", _I32), ("value", _F64)],
    "train_history": [("epoch", _I64), ("nll_per_token", _F64), ("n_tokens", _I64),
                      ("val_score", _F64), ("is_best", _I64)],
    "train_history_transformer": [("epoch", _I64), ("nll_per_token", _F64),
                                  ("n_tokens", _I64), ("val_score", _F64),
                                  ("is_best", _I64)],
    "kg_urls": [("doc_id", _S), ("span_idx", _I32), ("url_idx", _I32),
                ("url_type", _S), ("url_value", _S), ("domain", _S)],
    "kg_sentences_full": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                          ("sent_start", _I32), ("sent_len", _I32),
                          ("n_tokens", _I64)],
    "tag_chunked": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                    ("tok_idx", _I32), ("pos_tag", _S), ("ner_tag", _S)],
    "result_vm": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                  ("tok_idx", _I32), ("Word", _S), ("Label", _S)],
    "redact_pii": [("doc_id", _S), ("span_idx", _I32), ("text_redacted", _S),
                   ("n_urls", _I32), ("n_emails", _I32), ("n_digit_runs", _I32)],
    "kg_degree": [("degree_bucket", _I64), ("n_nodes", _I64), ("max_degree", _I64)],
    "tag_probs": [("doc_id", _S), ("span_idx", _I32), ("sent_idx", _I32),
                  ("tok_idx", _I32), ("rank", _I32), ("label", _S), ("prob", _F64),
                  ("words_in_dict_ratio", _F64)],
    "media_real": [("doc_id", _S), ("span_idx", _I32), ("kind", _S),
                   ("real_n_bytes", _I32), ("real_sha1", _S), ("real_width", _I32),
                   ("real_height", _I32), ("real_duration_ms", _I32),
                   ("real_resized_sha1", _S)],
    "media_frames_real": [("doc_id", _S), ("span_idx", _I32), ("frame_idx", _I32),
                          ("t_ms", _I32), ("frame_sha1", _S)],
    "media_real_jpeg": [("doc_id", _S), ("span_idx", _I32), ("kind", _S),
                        ("real_n_bytes", _I32), ("real_sha1", _S),
                        ("real_width", _I32), ("real_height", _I32),
                        ("real_duration_ms", _I32), ("real_resized_sha1", _S)],
}


def compute(name: str, sf_dir: str, _cache: dict | None = None) -> pa.Table:
    cache = _cache if _cache is not None else {}

    def triples():
        if "triples" not in cache:
            cache["triples"] = _triples_rows(n_docs_for(sf_dir))
        return cache["triples"]

    def links():
        if "links" not in cache:
            cache["links"] = _links_rows(triples())
        return cache["links"]

    def canon():
        if "canon" not in cache:
            cache["canon"] = _canonical_rows(links())
        return cache["canon"]

    def edges():
        if "edges" not in cache:
            cache["edges"] = _edges_rows(triples(), canon())
        return cache["edges"]

    if name == "kg_triples":
        rows = [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[10])
                for r in triples()]
    elif name == "kg_sentences":
        rows = _sentences_rows(sf_dir)
    elif name == "kg_sentences_full":
        rows = _sentences_full_rows(n_docs_for(sf_dir))
    elif name == "tag_chunked":
        rows = _tag_chunked_rows(n_docs_for(sf_dir))
    elif name == "result_vm":
        rows = _result_vm_rows(n_docs_for(sf_dir))
    elif name == "redact_pii":
        rows = _redact_rows(n_docs_for(sf_dir))
    elif name == "tag_probs":
        rows = _tag_probs_rows(sf_dir)
    elif name == "kg_links":
        rows = links()
    elif name == "kg_canonical":
        rows = canon()
    elif name == "kg_edges":
        rows = edges()
    elif name == "kg_degree":
        rows = _degree_rows(edges())
    elif name == "kg_invariant":
        rows = _invariant_rows(n_docs_for(sf_dir))
    elif name == "kg_mentions":
        rows = _mentions_rows(n_docs_for(sf_dir))
    elif name == "tag_bilstm":
        rows = _tagged_token_rows(sf_dir, crf=False)
    elif name == "tag_bilstm_crf":
        rows = [(r[0], r[1], r[2], r[3], r[5]) for r in _tagged_token_rows(sf_dir, crf=True)]
    elif name == "tag_transformer":
        rows = _tagged_token_rows(sf_dir, crf=False, encoder="transformer")
    elif name == "kg_links_fuzzy":
        rows = _links_fuzzy_rows(links())
    elif name == "media_resized":
        rows = _media_resized_rows(sf_dir)
    elif name == "media_embeddings":
        rows = _media_embeddings_rows(sf_dir)
    elif name == "train_history":
        rows = _train_history_rows(sf_dir)
    elif name == "train_history_transformer":
        rows = _train_history_rows(sf_dir, encoder="transformer")
    elif name == "kg_urls":
        rows = _url_rows(n_docs_for(sf_dir))
    elif name == "media_meta":
        rows = _media_meta_rows(sf_dir)
    elif name == "media_frames":
        rows = _media_frames_rows(n_docs_for(sf_dir))
    elif name == "media_real":
        rows = _media_real_rows(sf_dir)
    elif name == "media_real_jpeg":
        rows = _media_real_jpeg_rows(sf_dir)
    elif name == "media_frames_real":
        rows = _media_frames_real_rows(n_docs_for(sf_dir))
    elif name == "ann_lsh_multi":
        rows = _ann_lsh_multi_rows(sf_dir)
    elif name == "ann_ivf":
        rows = _ann_ivf_rows(sf_dir)
    else:
        raise KeyError(name)

    fields = _SCHEMAS[name]
    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    arrays = [pa.array(list(c), type=t) for c, (_n, t) in zip(cols, fields)]
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def ensure_goldens(sf_dir: str, out_dir: str | os.PathLike,
                   names: tuple[str, ...] = GOLDEN_QUERIES, force: bool = False) -> dict[str, str]:
    """Materialize golden parquet files (idempotent: a manifest pins version + inputs).
    A version or sf_dir mismatch (or ``force``) recomputes EVERYTHING — shared
    kernels may have changed; otherwise only files missing on disk are computed
    (adding a new golden query costs only that query, not a full regeneration —
    the tag mirrors dominate the full pass). Returns {query: absolute parquet path}."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.json"
    want = {"version": GOLDEN_VERSION, "sf_dir": os.path.abspath(sf_dir),
            "names": sorted(names)}
    paths = {n: str((out / f"{n}.parquet").resolve()) for n in names}
    have = None
    if not force and manifest_path.exists():
        try:
            have = json.loads(manifest_path.read_text())
        except (ValueError, OSError):
            have = None
        if not isinstance(have, dict):  # valid JSON but not a manifest → stale
            have = None
    # the manifest's "names" are the queries KNOWN-CURRENT at its version; a file on
    # disk that is not listed there may predate the version and must be recomputed
    # (a subset call after a version bump must not bless the other files)
    if (have is None or have.get("version") != want["version"]
            or have.get("sf_dir") != want["sf_dir"]):
        known: set = set()
    else:
        known = set(have.get("names", []))
    stale = [n for n in names if n not in known or not Path(paths[n]).exists()]
    want["names"] = sorted(known | set(names))
    if not stale:
        if have != want:
            _write_manifest(manifest_path, want)
        return paths
    cache: dict = {}
    for n in stale:
        tbl = compute(n, sf_dir, _cache=cache)
        # pid-suffixed tmp: two concurrent regenerations (driver gate + local check)
        # must not interleave writes into one tmp file — each renames its own
        # complete file into place atomically
        tmp = out / f".{n}.parquet.{os.getpid()}.tmp"
        pq.write_table(tbl, tmp)
        tmp.replace(out / f"{n}.parquet")
    _write_manifest(manifest_path, want)
    return paths


# bump when conll_fixture_lines' generation (pool, seed, labels, tier sizing)
# changes, so committed fixture files regenerate instead of staying silently stale
# (the existence-only check would keep old content green forever — both engines
# read the same file, so the drift would never surface in the oracle)
CONLL_FIXTURE_VERSION = 1


def ensure_conll_fixture(sf_dir: str, out_dir: str | os.PathLike) -> tuple[str, str]:
    """Deterministic CoNLL corpus fixture for the S2 driver oracle: writes BOTH the
    .conll file (the Spark query's read_conll input) and its raw line table as
    parquet (the DuckDB oracle reshapes it in pure SQL — no golden mirror of the
    parse logic). One generated line list feeds both artifacts, so the two engines
    can never read different content. Sized with the corpus tier
    (max(200, n_docs/50) sentences). Returns (conll_path, lines_parquet_path)."""
    from .sources.conll import conll_fixture_lines

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    conll = out / "conll_fixture.conll"
    lines_pq = out / "conll_lines.parquet"
    ver_path = out / "conll_manifest.json"
    want = {"version": CONLL_FIXTURE_VERSION,
            "n_sentences": max(200, n_docs_for(sf_dir) // 50)}
    have = None
    if ver_path.exists():
        try:
            have = json.loads(ver_path.read_text())
        except (ValueError, OSError):
            have = None
    if have != want or not (conll.exists() and lines_pq.exists()):
        lines = conll_fixture_lines(n_sentences=want["n_sentences"], seed=42)
        tmp = out / f".conll_fixture.{os.getpid()}.tmp"
        tmp.write_text("\n".join(lines) + "\n", encoding="utf-8")
        tmp.replace(conll)
        tbl = pa.Table.from_arrays(
            [pa.array(range(len(lines)), type=pa.int64()),
             pa.array(lines, type=pa.string())],
            names=["line_no", "line"])
        tmp2 = out / f".conll_lines.parquet.{os.getpid()}.tmp"
        pq.write_table(tbl, tmp2)
        tmp2.replace(lines_pq)
        _write_manifest(ver_path, want)
    return str(conll.resolve()), str(lines_pq.resolve())


def _write_manifest(manifest_path: Path, want: dict) -> None:
    """Same pid-suffixed tmp + atomic rename as the parquet files: an in-place
    write_text can expose a torn manifest to a concurrent reader, and two concurrent
    regenerations can interleave so the last writer drops 'names' entries the other
    just computed (self-healing, but wasted recompute)."""
    tmp = manifest_path.with_name(f".{manifest_path.name}.{os.getpid()}.tmp")
    tmp.write_text(json.dumps(want, indent=1))
    tmp.replace(manifest_path)
