from .metadata import MetadataStore
from .diversify import mmr_order, mmr_select
from .events import format_event_for_frontend
from .strategies import QueryEngine, SEARCH_METHODS
from .translate import DictionaryTranslator, VI_EN_PHRASES
from .word_processing import VietnameseTextProcessor
from .text import (
    DEFAULT_EN_STOPWORDS,
    QueryPreprocessor,
    VietnamesePreprocessor,
    fold_accents,
    load_stopwords,
    segment_sentences,
)

__all__ = [
    "MetadataStore",
    "format_event_for_frontend",
    "QueryEngine",
    "SEARCH_METHODS",
    "mmr_order",
    "mmr_select",
    "fold_accents",
    "QueryPreprocessor",
    "VietnamesePreprocessor",
    "DictionaryTranslator",
    "VietnameseTextProcessor",
    "VI_EN_PHRASES",
    "DEFAULT_EN_STOPWORDS",
    "load_stopwords",
    "segment_sentences",
]
