from .metadata import MetadataStore
from .events import format_event_for_frontend
from .strategies import QueryEngine, SEARCH_METHODS
from .text import fold_accents, QueryPreprocessor, VietnamesePreprocessor

__all__ = [
    "MetadataStore",
    "format_event_for_frontend",
    "QueryEngine",
    "SEARCH_METHODS",
    "fold_accents",
    "QueryPreprocessor",
    "VietnamesePreprocessor",
]
