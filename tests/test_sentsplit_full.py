"""Full-mode sentence splitter tests (AllocateSents rule cascade,
SentSplitter.cs:254-528 — dead code in the reference's live paths, implemented for
inventory completeness)."""

from lingvo_spark_kg.sentsplit_full import split_sentences_full
from lingvo_spark_kg.tokenizer import run_full_sents_allocate


def sents(text):
    return [s.value(text) for s in split_sentences_full(text)]


def test_plain_dot_splits_in_full_mode():
    assert sents("Первое предложение. Второе предложение.") == [
        "Первое предложение.", " Второе предложение.",
    ]


def test_before_proper_abbreviation_not_end():
    # "Dr." is in before-proper-or-number (latin table) → not an end
    assert sents("Точка после Dr. Smith не конец. А тут конец.") == [
        "Точка после Dr. Smith не конец.", " А тут конец.",
    ]


def test_before_no_proper_followed_by_upper_is_end():
    # "etc." in before-no-proper; next word capitalized → end (SentSplitter.cs:2061-2070)
    assert sents("И так далее etc. Новое предложение.") == [
        "И так далее etc.", " Новое предложение.",
    ]
    # next word lowercase → not an end
    assert sents("И так далее etc. и прочее.") == ["И так далее etc. и прочее."]


def test_initials_not_split():
    out = sents("Кроме того, к С.Козлову заявлен иск. Дело в суде.")
    assert out == ["Кроме того, к С.Козлову заявлен иск.", " Дело в суде."]


def test_file_extension_not_end():
    assert sents("Файл readme.txt лежит тут. Второе.") == [
        "Файл readme.txt лежит тут.", " Второе.",
    ]


def test_street_ends_not_end():
    assert sents("Он жил на Eduard-Künneke-Str. 4 в Берлине. Дом был старым.") == [
        "Он жил на Eduard-Künneke-Str. 4 в Берлине.", " Дом был старым.",
    ]


def test_digit_dot_digit_not_end():
    assert sents("Версия 2.456.542 стабильна. Теперь да.") == [
        "Версия 2.456.542 стабильна.", " Теперь да.",
    ]


def test_roman_numeral_before_capital_is_end():
    # single-upper-char rule 1/3: Roman/upper letter + dot before a capitalized word
    # of the other alphabet → sentence end (SentSplitter.cs:2121-2184)
    assert sents("IX. Глава о войне. X. Глава о мире.") == [
        "IX.", " Глава о войне.", " X.", " Глава о мире.",
    ]


def test_before_no_proper_with_inner_dots_matches():
    # "i.e." is stored as ["i.","e."] (GetWordsArray splits on dots,
    # Extensions.cs:104-147); lowercase continuation → not an end
    assert sents("Use this tool, i.e. the best one. Next sentence.") == [
        "Use this tool, i.e. the best one.", " Next sentence.",
    ]


def test_list_item_attaches():
    assert sents("1. Первый пункт списка.")[0] == "1. Первый пункт списка."


def test_newline_unconditional():
    assert sents("первая строка\nвторая строка") == ["первая строка\n", "вторая строка"]


def test_qm_gated_by_open_bracket():
    # full mode counts brackets: '?' inside an unclosed bracket is NOT an end
    assert sents("Вопрос (или нет? или да) продолжается тут") == [
        "Вопрос (или нет? или да) продолжается тут",
    ]
    # balanced bracket before → counter at 0 → splits
    assert sents("Вопрос (да)? Новый.") == ["Вопрос (да)?", " Новый."]


def test_full_pipeline_tokens():
    text = "Точка после Dr. Smith не конец. А тут конец."
    out = run_full_sents_allocate(text)
    assert len(out) == 2
    assert [w.value for w in out[0][1]][:4] == ["Точка", "после", "Dr.", "Smith"]


def test_urls_skipped():
    t = "Сайт www.example.ru работает. Второе предложение."
    out = split_sentences_full(t)
    assert len(out) == 2
    assert out[0].urls and out[0].urls[0].value(t) == "www.example.ru"
