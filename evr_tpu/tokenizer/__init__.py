from .bpe import ClipTokenizer, tokenize, get_default_tokenizer

__all__ = ["ClipTokenizer", "tokenize", "get_default_tokenizer"]
