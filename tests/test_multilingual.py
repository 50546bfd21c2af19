from graphrag_rs_ray.functions.multilingual import (
    detect_language_full,
    normalize_text,
    process_text,
    tokenize_lang,
)


def test_script_heuristics():
    assert detect_language_full("这是一个中文句子测试内容").language == "zh"
    assert detect_language_full("これはテストです").language == "ja"
    assert detect_language_full("이것은 한국어 테스트입니다").language == "ko"
    assert detect_language_full("هذا اختبار للغة العربية").language == "ar"
    assert detect_language_full("это тест русского языка").language == "ru"
    assert detect_language_full("").language == "unknown"


def test_ngram_models():
    # The reference's trigram models are trained on two tiny pangrams per
    # language with near-flat smoothing (multilingual.rs:159-229), so they
    # barely discriminate — a faithful port can only promise a
    # deterministic pick from the model set plus ranked alternatives.
    # (Real detection lives in the script heuristics above and the accent
    # detector in functions/textstats.py.)
    for text in ("the brown fox is over the dog",
                 "el zorro salta sobre el perro",
                 "ceci est un test de la langue française",
                 "dies ist ein test der deutschen sprache"):
        r = detect_language_full(text)
        assert r.language in ("en", "es", "fr", "de", "pt")
        assert len(r.alternatives) == 3
        assert r == detect_language_full(text)
    assert detect_language_full("el zorro salta sobre el perro").language == "es"


def test_normalize():
    assert normalize_text("a   b\t c", "en") == "a b c"
    # CJK full-width ASCII → half-width
    assert normalize_text("ＡＢＣ！", "zh") == "ABC!"
    # Arabic diacritic strip (U+064B fathatan)
    assert normalize_text("بًا", "ar") == "با"


def test_tokenize():
    assert tokenize_lang("hello world", "en") == ["hello", "world"]
    assert tokenize_lang("中文 分词", "zh") == ["中", "文", "分", "词"]


def test_process_deterministic():
    a = process_text("the quick brown fox ran home")
    b = process_text("the quick brown fox ran home")
    assert a == b
    assert a["language"] == "en"
    assert a["tokens"][0] == "the"
