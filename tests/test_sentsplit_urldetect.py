"""Sentence-splitter (simple mode) and URL-detector behavior tests
(SentSplitter.cs:532-819; UrlDetector.cs:234-687)."""

from lingvo_spark_kg.sentsplit import split_sentences_simple
from lingvo_spark_kg.urldetect import allocate_urls


def sent_values(text):
    return [s.value(text) for s in split_sentences_simple(text)]


def test_dot_mid_line_does_not_split():
    t = "Первое предложение. Второе предложение."
    assert sent_values(t) == [t]


def test_dot_at_eol_splits():
    t = "Первое предложение.\nВторое предложение."
    assert sent_values(t) == ["Первое предложение.", "\nВторое предложение."]


def test_dot_at_eof_with_trailing_space():
    t = "Предложение.  "
    assert sent_values(t) == ["Предложение.  "]


def test_exclamation_question_split():
    assert sent_values("Реки стали! Потоками текли? Да…") == [
        "Реки стали!", " Потоками текли?", " Да…",
    ]


def test_qm_inside_bracket_with_comma_does_not_split():
    # '?' followed by a bracket then ',' → not end (SentSplitter.cs:1287-1316,
    # AfterBracketAllowedPunctuation4QMEP)
    t = "Вопрос (или нет?), сказал он"
    assert sent_values(t) == [t]
    # but '?' followed by plain text IS an end
    t2 = "Вопрос (или нет)?, сказал он"
    assert sent_values(t2) == ["Вопрос (или нет)?,", " сказал он"]


def test_three_dots_then_lower_no_split():
    t = "Судьи совещались… потом решили"
    assert sent_values(t) == [t]
    t2 = "Судьи совещались… Решение огласили"
    assert sent_values(t2) == ["Судьи совещались…", " Решение огласили"]


def test_punct_only_sentence_dropped():
    assert sent_values("?!") == []


def test_street_ends_not_sentence_end():
    t = "Eduard-Künneke-Str.\n4 в Берлине"
    assert sent_values(t) == [t]


def test_urls_attached_to_sentence():
    t = "Сайт https://example.ru/page работает! Отлично."
    sents = split_sentences_simple(t)
    assert len(sents) == 2
    assert sents[0].urls and sents[0].urls[0].value(t) == "https://example.ru/page"


# --- URL detector ---

def test_url_by_scheme():
    t = "смотри https://localhost:7701/ тут"
    us = allocate_urls(t)
    assert [(u.value(t), u.type) for u in us] == [("https://localhost:7701/", "Url")]


def test_url_by_www():
    t = "заходите на www.example.ru за подробностями"
    us = allocate_urls(t)
    assert [(u.value(t), u.type) for u in us] == [("www.example.ru", "Url")]


def test_url_by_tld():
    t = "сайт example.ru работает"
    us = allocate_urls(t)
    assert [(u.value(t), u.type) for u in us] == [("example.ru", "Url")]


def test_email_detection():
    t = "пишите info@example.ru сюда"
    us = allocate_urls(t)
    assert [(u.value(t), u.type) for u in us] == [("info@example.ru", "Email")]


def test_email_obfuscated_at():
    t = "пишите info(at)example.ru сюда"
    us = allocate_urls(t)
    assert [(u.value(t), u.type) for u in us] == [("info(at)example.ru", "Email")]


def test_non_tld_dot_no_url():
    assert allocate_urls("конец. Начало") == []
    assert allocate_urls("9,5 млн руб. ущерба") == []


def test_trailing_punct_not_in_url():
    t = "сайт example.ru."
    us = allocate_urls(t)
    assert [u.value(t) for u in us] == ["example.ru"]


def test_multiline_domains():
    t = "a.ru b.com c.орг"
    us = allocate_urls(t)
    assert [u.value(t) for u in us] == ["a.ru", "b.com", "c.орг"]
