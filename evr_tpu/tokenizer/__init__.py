from .bpe import ClipTokenizer, tokenize, get_default_tokenizer
from .fallbacks import SiglipFallbackTokenizer, WhisperFallbackTokenizer

__all__ = [
    "ClipTokenizer",
    "tokenize",
    "get_default_tokenizer",
    "SiglipFallbackTokenizer",
    "WhisperFallbackTokenizer",
]
