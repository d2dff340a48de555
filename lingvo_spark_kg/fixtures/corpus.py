"""Deterministic synthetic corpus of interleaved text+media documents (seed=42).

Matches the input hint exactly: docs(doc_id:string, spans:array<struct<kind:string,
text:string, media_ref:string, offset:int>>). Text content draws from the reference's
own test sentences ([resources]/input-text/input_pos_tagger_ru.txt;
Lingvo.PosTagger.ConsoleDemo/Program.cs:170-219) so tokenizer/tagger behavior is
directly comparable; no external data.

Content is a pure function of (seed, doc index): each document's RNG is
``np.random.default_rng([seed, idx])``, so generation distributes over Spark
partitions with bitwise-identical output at any parallelism/partitioning — the property
the resumability and two-parallelism-level scaling runs rely on.

Skew: sentence selection is Zipf(1.2) over the pool and span counts are heavy-tailed,
so head entities (РФ, Москва, Козлов…) dominate mentions — real skew for the salted
join tests (FIXTURES.md §1).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

# ~40-sentence pool: reference demo text + edge-case sentences (abbrev+digits, quoted
# names, initials, statute refs, urls/emails, number runs, homonym traps, accents).
SENTENCE_POOL: list[str] = [
    "Эти типы стали есть в цехе.",
    "Вася, маша руками и коля дрова, морочил голову.",
    "Вася, Маша и Коля пошли гулять.",
    "Маша руками мыла посуду.",
    "Маша руками Вася звал на помощь.",
    "Реки стали красными.",
    "Реки стали красными потоками текли.",
    "Гло́кая ку́здра ште́ко будлану́ла бо́кра и курдя́чит бокрёнка.",
    "Варкалось. Хливкие шорьки пырялись по наве, и хрюкотали зелюки, как мюмзики в мове.",
    "В Петербурге перед судом предстанет высокопоставленный офицер Генерального штаба ВС РФ.",
    "СКР завершил расследование уголовного дела против главы военно-топографического "
    "управления Генштаба контр-адмирала Сергея Козлова, обвиняемого в превышении "
    "должностных полномочий и мошенничестве.",
    "Следствием собрана достаточная доказательственная база, подтверждающая виновность "
    "контр-адмирала Козлова в инкриминируемых преступлениях.",
    "Кроме того, по инициативе следствия представителем Минобороны России к С.Козлову "
    "заявлен гражданский иск о возмещении причиненного государству ущерба на сумму "
    "свыше 27 млн руб.",
    "По данным следователей, в июле 2010г. военный чиновник отдал подчиненному "
    "\"заведомо преступный приказ\" о заключении лицензионных договоров с компаниями "
    "\"Чарт-Пилот\" и \"Транзас\".",
    "Им необоснованно были переданы права на использование в коммерческих целях "
    "навигационных морских карт, являвшихся интеллектуальной собственностью РФ.",
    "В результате ущерб составил более 9,5 млн руб.",
    "Контр-адмирал также умолчал о наличии у него в собственности квартиры в городе "
    "Истра Московской области.",
    "В результате в 2006г. центральной жилищной комиссии Минобороны и Управления делами "
    "президента РФ С.Козлов был признан нуждающимся в жилье.",
    "В 2008г. получил от государства квартиру в Москве площадью 72 кв. м и стоимостью "
    "18,5 млн руб.",
    "Квартиру позднее приватизировала его падчерица.",
    "Против С. Козлова возбуждено дело по п.\"в\" ч.3 ст.286 и ч.4 ст.159 УК РФ.",
    "пятьдесят оттенков серого э.л. джеймс.",
    "По данным следователей, в июле 2010 г. военный чиновник отдал приказ.",
    "По данным следователей, в июле 2010 г . военный чиновник молчал.",
    "123-3453-3456-3456 коровы паслись на лугу.",
    "123 4567 890 коровы шли домой.",
    "zxczxcv https://localhost:7701/ xzxzxzzxzx.",
    "Пишите на info@example.ru или заходите на www.example.ru за подробностями.",
    "Сергей Козлов возглавлял управление Генштаба в Москве.",
    "Минобороны направило иск против компании Транзас в суд Петербурга.",
    "Компания Чарт-Пилот заключила договор с Минобороны России.",
    "Генштаб подтвердил передачу карт компании Транзас.",
    "Суд Москвы рассмотрел дело Козлова о квартире в Истре.",
    "Президент РФ посетил Петербург и Москву за одну неделю.",
    "Управление делами президента РФ выделило квартиру в Москве.",
    "Эксперт оценил ущерб государству в 27 млн руб. и передал отчет в СКР.",
    "Офицер ВС РФ отдал приказ о заключении договоров!",
    "Кто приватизировал квартиру в Истре?",
    "Судьи совещались три часа… Решение огласили позже.",
    "Шла Саша по шоссе и сосала сушку.",
]

MEDIA_KINDS = ("image", "audio", "table")

# Entity inventory grounding the alias dictionary: surfaces that occur in the pool.
POOL_ENTITIES: list[tuple[str, str, list[str]]] = [
    # (entity_id-ish name, type, alias surfaces as they appear)
    ("sergey_kozlov", "PER", ["Сергей Козлов", "Козлов", "С.Козлов", "С. Козлова", "Козлова", "Сергея Козлова"]),
    ("vasya", "PER", ["Вася"]),
    ("masha", "PER", ["Маша"]),
    ("kolya", "PER", ["Коля"]),
    ("sasha", "PER", ["Саша"]),
    ("el_james", "PER", ["э.л. джеймс"]),
    ("minoborony", "ORG", ["Минобороны", "Минобороны России"]),
    ("genshtab", "ORG", ["Генштаб", "Генштаба", "Генерального штаба"]),
    ("skr", "ORG", ["СКР"]),
    ("vs_rf", "ORG", ["ВС РФ"]),
    ("chart_pilot", "ORG", ["Чарт-Пилот"]),
    ("tranzas", "ORG", ["Транзас"]),
    ("upravlenie_delami", "ORG", ["Управления делами президента РФ", "Управление делами президента РФ"]),
    ("rf", "LOC", ["РФ", "Россия", "России"]),
    ("moscow", "LOC", ["Москва", "Москве", "Москвы"]),
    ("petersburg", "LOC", ["Петербург", "Петербурге", "Петербурга"]),
    ("istra", "LOC", ["Истра", "Истре"]),
    ("moscow_region", "LOC", ["Московской области"]),
]


@functools.lru_cache(maxsize=512)
def long_sentence(n_tokens: int) -> str:
    """Deterministic >220-token sentence exercising the chunking path
    (SeqLabel.cs:259-311). Cached per length (pure function; make_doc draws
    the same few hundred lengths over and over)."""
    base = "слово номер {} из длинного предложения".split()
    toks = []
    i = 0
    while len(toks) < n_tokens - 1:
        toks.append(f"слово{i}")
        i += 1
    return " ".join(toks) + " конец."


def _media_ref(rng: np.random.Generator) -> str:
    raw = rng.integers(0, 2**62).item()
    return "media://" + hashlib.sha1(str(raw).encode()).hexdigest()


_ZIPF_A = 1.2


def _zipf_index(rng: np.random.Generator, n: int) -> int:
    """Zipf(1.2)-distributed index in [0, n)."""
    while True:
        z = rng.zipf(_ZIPF_A)
        if z <= n:
            return int(z) - 1


def make_doc(idx: int, seed: int = 42) -> tuple[str, list[dict]]:
    """One document: doc_id plus interleaved spans (pure function of (seed, idx))."""
    rng = np.random.default_rng([seed, idx])
    doc_id = f"doc-{idx:08d}"
    n_spans = int(rng.integers(1, 9))
    spans: list[dict] = []
    for off in range(n_spans):
        if rng.random() < 0.7:
            # text span: 1-3 pooled sentences; ~0.5% long-sentence chunking case
            if rng.random() < 0.005:
                text = long_sentence(int(rng.integers(221, 500)))
            else:
                k = int(rng.integers(1, 4))
                text = " ".join(SENTENCE_POOL[_zipf_index(rng, len(SENTENCE_POOL))]
                                for _ in range(k))
            spans.append({"kind": "text", "text": text, "media_ref": None, "offset": off})
        else:
            kind = MEDIA_KINDS[int(rng.integers(0, len(MEDIA_KINDS)))]
            spans.append({"kind": kind, "text": None, "media_ref": _media_ref(rng),
                          "offset": off})
    return doc_id, spans


def make_docs(n_docs: int, seed: int = 42, start: int = 0):
    """Iterator of (doc_id, spans) rows."""
    for idx in range(start, start + n_docs):
        yield make_doc(idx, seed)


def make_aliases(n_synthetic_entities: int = 5000, seed: int = 42) -> list[dict]:
    """Alias dictionary rows: (alias_norm, entity_id, entity_type, prior).

    Pool entities get Zipfian priors (head skew); synthetic entities pad the dictionary
    to realistic broadcast size and add ambiguous aliases (same alias_norm → multiple
    entity_id) to exercise candidate scoring (FIXTURES.md §2).
    """
    from .. import tokenizer as tok
    from ..model.lexicon import normalize_surface

    def surface_key(s: str) -> str:
        # tokenize the alias surface exactly like the pipeline (simple mode) so
        # multi-token keys align with pipeline token sequences (hyphens split:
        # "Чарт-Пилот" → 3 tokens; dots unstick: "С.Козлов" → "с . козлов")
        toks = [w.value for _, words in tok.run_simple_sents_allocate(s, replace_nums=False)
                for w in words]
        return " ".join(normalize_surface(t) for t in toks)

    rng = np.random.default_rng([seed, 10**9])
    rows: list[dict] = []
    for rank, (name, etype, surfaces) in enumerate(POOL_ENTITIES):
        entity_id = f"E{rank:06d}"
        prior = 1.0 / (rank + 1) ** 0.7
        for s in surfaces:
            rows.append({
                "alias_norm": surface_key(s),
                "entity_id": entity_id,
                "entity_type": etype,
                "prior": round(prior, 6),
            })
    base = len(POOL_ENTITIES)
    types = ("PER", "ORG", "LOC")
    for k in range(n_synthetic_entities):
        entity_id = f"E{base + k:06d}"
        etype = types[k % 3]
        prior = 1.0 / (base + k + 1) ** 0.7
        n_alias = 1 + int(rng.integers(0, 3))
        for a in range(n_alias):
            rows.append({
                "alias_norm": f"синтетик{k}" + ("" if a == 0 else f"-{a}"),
                "entity_id": entity_id,
                "entity_type": etype,
                "prior": round(prior, 6),
            })
    # ambiguity: a handful of alias keys mapping to two entities
    for k in range(50):
        rows.append({
            "alias_norm": f"синтетик{k}",
            "entity_id": f"E{base + ((k + 7) % n_synthetic_entities):06d}",
            "entity_type": types[(k + 1) % 3],
            "prior": 0.001,
        })
    return rows


TRAIN_FIXTURE_TAGS = ("Adjective", "Adverb", "Noun", "Verb")


def _suffix_label(token: str) -> str:
    """Deterministic suffix rule over BOTH scripts: the driver documents table is
    Latin-script, so Russian-only suffixes would collapse every label to Noun and
    make the training fixture single-class (no usable validation signal). The added
    Latin suffixes split the documents vocabulary into all four classes."""
    if token.endswith(("ть", "an", "in")):
        return "Verb"
    if token.endswith(("ой", "ый", "ий", "st", "ll")):
        return "Adjective"
    if token.endswith(("о", "ow")):
        return "Adverb"
    return "Noun"


def train_fixture(sf_dir: str, n_docs: int = 200, max_tokens: int = 30,
                  start: int = 0) -> list[tuple[int, list[str], list[str]]]:
    """Deterministic supervised corpus for the train_history query: documents
    [start, start+n_docs) of the sf dir, whitespace-tokenized (capped) with
    suffix-rule labels. ONE definition shared by the Spark query
    (__spark_entry__.q_train_history), its golden mirror
    (golden._train_history_rows) and the validation split (``valid_fixture``) so
    none can drift; rows come back sorted by doc_id — the row order both sides
    train in."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for did, text in sorted(zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist())):
        if did < start or did >= start + n_docs or text is None:
            continue
        toks = text.strip().lower().split()[:max_tokens]
        if not toks:
            continue
        rows.append((int(did), toks, [_suffix_label(x) for x in toks]))
    return rows


def valid_fixture(sf_dir: str, n_docs: int = 40, start: int = 200,
                  max_tokens: int = 30) -> list[tuple[int, list[str], list[str]]]:
    """Deterministic held-out split for the training validator (R5/R6): documents
    [start, start+n_docs) — disjoint from train_fixture's default [0, 200) — with
    the same selection/labeling code (delegates to ``train_fixture`` so the two
    can never drift)."""
    return train_fixture(sf_dir, n_docs=n_docs, max_tokens=max_tokens, start=start)


def validate_macro_f1(model, valid_rows: list[tuple[int, list[str], list[str]]]) -> float:
    """R6 external-validator callback body (reference ExternalValidator/Program.cs:14-32
    scoring via MultiLabelsFscoreMetric.cs:40-153): token-level macro P/R/F1 of the
    model's greedy decode against the suffix-rule labels, averaged over
    TRAIN_FIXTURE_TAGS. Deterministic (batch-of-1 predicts, pure float ops) so the
    single-partition training oracle stays float-exact."""
    n_hyp: dict[str, int] = {}
    n_ref: dict[str, int] = {}
    n_both: dict[str, int] = {}
    for _did, toks, labs in valid_rows:
        pred = model.predict_tags([toks])[0]
        for p, r in zip(pred, labs):
            n_hyp[p] = n_hyp.get(p, 0) + 1
            n_ref[r] = n_ref.get(r, 0) + 1
            if p == r:
                n_both[p] = n_both.get(p, 0) + 1
    f1s = []
    for tag in TRAIN_FIXTURE_TAGS:
        h, r, b = n_hyp.get(tag, 0), n_ref.get(tag, 0), n_both.get(tag, 0)
        prec = b / h if h else 0.0
        rec = b / r if r else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0)
    return round(sum(f1s) / len(f1s), 6)


def gazetteer_from_aliases(alias_rows: list[dict]) -> dict[str, str]:
    """normalized surface → entity type, highest-prior wins on conflicts."""
    best: dict[str, tuple[float, str]] = {}
    for r in alias_rows:
        cur = best.get(r["alias_norm"])
        if cur is None or r["prior"] > cur[0]:
            best[r["alias_norm"]] = (r["prior"], r["entity_type"])
    return {k: v[1] for k, v in best.items()}
