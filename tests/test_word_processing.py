"""VietnameseTextProcessor — full parity surface of
`Backend/word_processing.py:8-75` (language detect, translate, casing,
stopwords, accents both ways, segmentation, normalization, topic
classification, sentiment), all zero-egress."""

import pytest

from evr_tpu.query.word_processing import VietnameseTextProcessor


@pytest.fixture(scope="module")
def proc():
    return VietnameseTextProcessor()


def test_detect_language(proc):
    assert proc.detect_language("đánh nhau trên đường phố") == "vi"
    assert proc.detect_language("a man walking a dog") == "en"
    # unaccented Vietnamese: caught by dictionary coverage
    assert proc.detect_language("danh nhau tren duong pho") == "vi"


def test_translate_to_english(proc):
    assert proc.translate_to_english("đánh nhau trên đường") == "fighting on the road"
    # English passes through untouched (reference line 24-27 contract)
    assert proc.translate_to_english("two people fighting") == "two people fighting"


def test_casing(proc):
    assert proc.lowercasing("Xin Chào") == "xin chào"
    assert proc.uppercasing("xin chào") == "XIN CHÀO"


def test_remove_stopwords(proc):
    out = proc.remove_stopwords("một người và con chó của tôi")
    assert "và" not in out.split() and "của" not in out.split()
    assert "chó" in out.split()
    # reference strips ViTokenizer underscores afterwards (line 41)
    assert "_" not in proc.remove_stopwords("hạnh_phúc là điều tốt")


def test_accents_roundtrip(proc):
    assert proc.remove_accents("đánh nhau") == "danh nhau"
    # restoration from the bundled vocabulary (unambiguous forms)
    assert proc.add_accents("danh nhau tren duong pho") == "đánh nhau trên đường phố"
    # unknown words pass through unchanged
    assert proc.add_accents("zzz danh nhau") == "zzz đánh nhau"
    # capitalisation preserved
    assert proc.add_accents("Sung").startswith("S")


def test_sentence_segment(proc):
    parts = proc.sentence_segment("Trời đẹp. Tôi đi chơi! Bạn thì sao?")
    assert len(parts) == 3


def test_text_normalization_tone_placement(proc):
    # modern orthography: glide carries no tone mark (underthesea behavior)
    assert proc.text_normalization("hoà bình") == "hòa bình"
    assert proc.text_normalization("thuỷ  điện") == "thủy điện"
    assert proc.text_normalization("  a   b  ") == "a b"


def test_text_classification(proc):
    assert proc.text_classification("trận đấu bóng đá có bàn thắng đẹp") == ["The thao"]
    assert proc.text_classification("cảnh sát bắt giữ kẻ phạm tội") == ["Phap luat"]
    assert proc.text_classification("the doctor treated the disease at the hospital") == [
        "Suc khoe"
    ]
    assert proc.text_classification("xyzzy qwerty") == []


def test_sentiment_analysis(proc):
    assert proc.sentiment_analysis("bộ phim rất hay và tuyệt vời") == "positive"
    assert proc.sentiment_analysis("dịch vụ quá tệ, tôi thất vọng") == "negative"
    # negation flips polarity
    assert proc.sentiment_analysis("món ăn không ngon") == "negative"
    assert proc.sentiment_analysis("not bad") == "positive"
    # English lexicon works too
    assert proc.sentiment_analysis("this is a terrible horrible product") == "negative"
    assert proc.sentiment_analysis("cái bàn gỗ") is None  # no polarity signal


def test_preprocess_and_translate_pipeline(proc):
    # lowercase → stopwords → normalize → translate (reference lines 68-75)
    out = proc.preprocess_and_translate("Một túi đánh nhau TRÊN đường")
    assert "fighting" in out
    assert out == out.lower()


def test_stopwords_file_loading(tmp_path):
    sw = tmp_path / "stop.txt"
    sw.write_text("foo\nbar\n", encoding="utf-8")
    p = VietnameseTextProcessor(stopwords_path=sw)
    assert p.remove_stopwords("foo keeps bar this") == "keeps this"


def test_injectable_translator():
    calls = []

    def fake(text):
        calls.append(text)
        return "TRANSLATED"

    p = VietnameseTextProcessor(translator=fake)
    assert p.translate_to_english("đánh nhau") == "TRANSLATED"
    assert calls == ["đánh nhau"]
    # a crashing translator degrades to the untranslated text

    def boom(text):
        raise RuntimeError("network down")

    p2 = VietnameseTextProcessor(translator=boom)
    assert p2.translate_to_english("đánh nhau") == "đánh nhau"
