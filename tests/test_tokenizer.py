"""Golden tokenizer tests on the reference's own demo sentences
(ConsoleDemo/Program.cs:170-219; [resources]/input-text/input_pos_tagger_ru.txt)."""

from lingvo_spark_kg.tokenizer import (
    EWT_HAS_UMLAUTES,
    EWT_INTEGER_NUMBER,
    EWT_PUNCTUATION,
    ending_token,
    get_input_type,
    normalize_umlautes_upper,
    run_no_sents_allocate,
    run_simple_sents_allocate,
)


def toks_full(text, replace_nums=True):
    return [w.value for w in run_no_sents_allocate(text, replace_nums)]


def toks_simple(text, replace_nums=True):
    return [w.value for _, ws in run_simple_sents_allocate(text, replace_nums) for w in ws]


def test_num_spec_ends_full_mode():
    # "2010г." glues in full mode; spec-end "г." → NUM placeholder (Tokenizer.cs:211-219)
    assert toks_full("в июле 2010г. военный") == ["в", "июле", "[%NUM%]", "военный"]
    # detached "г." is NOT part of the number (no digits → spec-ends check never fires,
    # Tokenizer.cs:1193-1211), it stays its own token
    assert toks_full("в июле 2010 г. военный") == ["в", "июле", "[%NUM%]", "г.", "военный"]


def test_num_collapse_consecutive():
    # consecutive number tokens collapse into ONE placeholder (Tokenizer.cs:903-936)
    ws = run_no_sents_allocate("123 4567 890 коровы.")
    assert [w.value for w in ws] == ["[%NUM%]", "коровы", "."]
    assert ws[0].start == 0 and ws[0].length == 12  # covers "123 4567 890"


def test_num_hyphen_runs_split():
    assert toks_full("123-3453-3456 коровы.") == [
        "[%NUM%]", "-", "[%NUM%]", "-", "[%NUM%]", "коровы", ".",
    ]


def test_replace_nums_off():
    assert toks_full("в июле 2010г. военный", replace_nums=False) == [
        "в", "июле", "2010г.", "военный",
    ]


def test_initials_full_vs_simple():
    # full mode: dot+Upper flushes with dot attached (Tokenizer.cs:491-497)
    assert toks_full("к С.Козлову заявлен") == ["к", "С.", "Козлову", "заявлен"]
    # simple mode: dot always unsticks (Tokenizer.cs:662,731-744)
    assert toks_simple("к С.Козлову заявлен") == ["к", "С", ".", "Козлову", "заявлен"]


def test_lowercase_abbrev_dots_glue_in_full_mode():
    assert toks_full("серого э.л. джеймс.") == ["серого", "э.л.", "джеймс", "."]


def test_url_kept_as_single_token():
    ws = run_no_sents_allocate("zxczxcv https://localhost:7701/ xz.")
    assert [w.value for w in ws] == ["zxczxcv", "https://localhost:7701/", "xz", "."]
    assert ws[1].input_type == "Url"


def test_email_token():
    ws = run_no_sents_allocate("Пишите на info@example.ru сегодня.")
    vals = {w.value: w.input_type for w in ws}
    assert vals.get("info@example.ru") == "Email"


def test_decimal_comma_number():
    assert toks_full("более 9,5 млн руб.") == ["более", "[%NUM%]", "млн", "руб", "."]


def test_statute_refs():
    assert toks_full("по ч.4 ст.159 УК РФ.") == ["по", "ч.4", "ст.159", "УК", "РФ", "."]


def test_punct_canonicalization():
    # ,, → ,  -- → -  '' → "  (Clear_valueOriginal, Tokenizer.cs:1213-1278)
    assert toks_full("слово,, слово") == ["слово", ",", "слово"]
    assert toks_full("слово-- слово") == ["слово", "-", "слово"]
    # exotic hyphen → '-'
    ws = run_no_sents_allocate("слово — слово")
    assert [w.value for w in ws] == ["слово", "-", "слово"]


def test_merge_punctuation_across_space():
    ws = run_no_sents_allocate("что? ? да")
    vals = [w.value for w in ws]
    assert vals == ["что", "? ?", "да"]


def test_quotes_tokenized_separately():
    assert toks_full('компаниями "Чарт-Пилот" и "Транзас".') == [
        "компаниями", '"', "Чарт", "-", "Пилот", '"', "и", '"', "Транзас", '"', ".",
    ]


def test_input_types():
    assert get_input_type("NATO")[0] == "AllCapital"
    assert get_input_type("U.N.")[0] == "AllCapitalWithDot"
    assert get_input_type("XXI")[0] == "LatinCapital"
    assert get_input_type("F")[0] == "OneCapital"
    assert get_input_type("F.")[0] == "OneCapitalWithDot"
    assert get_input_type("Thatcher")[0] == "LatinFirstCapital"
    assert get_input_type("G8")[0] == "NumCapital"
    assert get_input_type("iPod")[0] == "FirstLowerWithUpper"
    assert get_input_type("МИГ-21")[0] == "NumCapital"
    assert get_input_type("СевКавГПУ")[0] == "MixCapital"
    assert get_input_type('"')[0] == "Quote"
    it, extra = get_input_type("10000")
    assert it == "Num" and extra & EWT_INTEGER_NUMBER
    it, extra = get_input_type("8:45")
    assert it == "Num" and not (extra & EWT_INTEGER_NUMBER)
    it, extra = get_input_type(",")
    assert it == "Other" and extra & EWT_PUNCTUATION


def test_umlautes():
    it, extra = get_input_type("Müller")
    assert extra & EWT_HAS_UMLAUTES
    assert normalize_umlautes_upper("MÜLLER") == "MUELLER"
    assert normalize_umlautes_upper("straße") == "straSSe"


def test_ending_token():
    # maxEndingLength=4 → '_' + last 4 lowered chars (Tokenizer.cs:1282-1334)
    assert ending_token("следователей", 4) == "_елей"
    assert ending_token("Вася", 4) == "вася"
    assert ending_token("июле", 4) == "июле"
    assert ending_token("Ёлка", 4) == "елка"
    # combining-mark strip (accented fixture "Гло́кая")
    assert ending_token("Гло́кая", 100) == "глокая"
    assert ending_token("[%NUM%]", 4) == "[%NUM%]"


def test_accented_tokens_keep_offsets():
    text = "Гло́кая ку́здра ште́ко будлану́ла бо́кра."
    ws = run_no_sents_allocate(text)
    for w in ws:
        assert text[w.start : w.start + w.length] == w.value or w.input_type == "Num"


def test_uppercase_projection():
    ws = run_no_sents_allocate("ёлка")
    assert ws[0].value_upper == "ЕЛКА"  # ё→Е via UPPER_INVARIANT_MAP (xlat.cs:161-187)


def test_trailing_single_upper_keeps_dot():
    # SkipNonLetterAndNonDigitToTheEnd exception (Tokenizer.cs:992-1005): a trailing
    # single uppercase letter keeps its dot ("Пушкин А." → "А." OneCapitalWithDot)
    ws = run_no_sents_allocate("Пушкин А.")
    assert [w.value for w in ws] == ["Пушкин", "А."]
    assert ws[1].input_type == "OneCapitalWithDot"


def test_interprete_as_whitespace_chars():
    # ¤¦§¶ split like whitespace (Tokenizer.cs:47,165-168)
    assert toks_full("слово¤слово §другое") == ["слово", "слово", "другое"]


def test_between_digit_colon():
    # ':' glues digits ("8:45" one Num token) but splits letters
    ws = run_no_sents_allocate("в 8:45 утра")
    assert [w.value for w in ws] == ["в", "[%NUM%]", "утра"]
    assert toks_full("ключ:значение") == ["ключ", ":", "значение"]


def test_ampersand_between_letters_glues():
    assert toks_full("AT&T работает") == ["AT&T", "работает"]
    assert toks_full("x & y") == ["x", "&", "y"]


def test_underscore_between_letters_glues():
    assert toks_full("имя_файла тут") == ["имя_файла", "тут"]
