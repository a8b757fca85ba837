"""Offline vi→en dictionary translator (local default for the reference's
GoogleTranslator hot-path call, word_processing.py:22-27)."""

import pytest

from evr_tpu.query import DictionaryTranslator, VietnamesePreprocessor


@pytest.fixture(scope="module")
def tr():
    return DictionaryTranslator()


def test_longest_phrase_first(tr):
    # "đánh nhau" must win over "đánh"; the walk then consumes
    # [trên đường] before [đường phố] can match, leaving "phố" untouched
    assert tr("đánh nhau trên đường phố") == "fighting on the road phố"
    # and with the 2-word place phrase alone, it matches whole
    assert tr("đánh nhau đường phố") == "fighting street"


def test_domain_phrases(tr):
    assert tr("bạo lực") == "violence"
    assert tr("hai người đánh nhau trong phòng") == "two people fighting in a room"


def test_unknown_words_pass_through(tr):
    out = tr("xyzzy đánh nhau")
    assert "xyzzy" in out and "fighting" in out


def test_accent_folded_keys_accepted(tr):
    # un-accented "bao luc" should still hit via the folded table when
    # unambiguous
    assert tr("bao luc") == "violence"


def test_marker_words_dropped(tr):
    assert tr("những người đang chạy") == "person running"


def test_preprocessor_integration():
    pp = VietnamesePreprocessor(translator=DictionaryTranslator())
    # Vietnamese (diacritics) → translated
    assert pp("Đánh nhau trên đường") == "fighting on the road"
    # UN-ACCENTED Vietnamese still translates (coverage vote ≥ 0.5)
    assert pp("danh nhau tren duong") == "fighting on the road"
    # plain English skips the translator (diacritic gate + low coverage)
    assert pp("A man running") == "a man running"
    assert pp("an old man in the park") == "an old man in the park"
    # cached second call returns identically
    assert pp("Đánh nhau trên đường") == "fighting on the road"


def test_coverage_metric(tr):
    assert tr.coverage("bạo lực") == 1.0
    assert tr.coverage("qqq www") == 0.0
