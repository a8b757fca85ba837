"""Caption augmentation with protected-keyword preservation.

Reference counterpart: `content/Augment_Text_Input/Agument_NLP.py` — T5
paraphrase, EN→DE→EN back-translation, BERT masked substitution, with an
NSFW keyword-protection list (`:21-24`) preventing domain-critical words
from being rewritten.

Heavy model-based augmenters are pluggable callables (wire up HF pipelines
where available); always-available local strategies — synonym substitution
from a user dictionary, word dropout/shuffle — keep the pipeline functional
in hermetic environments. Protected keywords are never altered by any
strategy.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

DEFAULT_SYNONYMS = {
    "man": ["person", "guy"],
    "woman": ["person", "lady"],
    "fighting": ["brawling", "struggling"],
    "street": ["road", "avenue"],
    "hitting": ["striking", "beating"],
    "holding": ["carrying", "gripping"],
}


@dataclass
class AugmentConfig:
    protected_keywords: tuple[str, ...] = ()
    synonyms: dict = field(default_factory=lambda: dict(DEFAULT_SYNONYMS))
    synonym_prob: float = 0.3
    dropout_prob: float = 0.1
    seed: int = 42
    # optional heavy augmenters: callable(text) -> text
    paraphraser: Callable[[str], str] | None = None
    back_translator: Callable[[str], str] | None = None
    masked_substituter: Callable[[str], str] | None = None


def _tokenize_words(text: str) -> list[str]:
    return re.findall(r"\w+|\W+", text)


def augment_caption(
    caption: str, cfg: AugmentConfig | None = None, rng=None, strategy: str = "synonym"
) -> str:
    """Return an augmented caption; protected keywords are preserved
    verbatim by every strategy."""
    cfg = cfg or AugmentConfig()
    rng = rng or np.random.default_rng(cfg.seed)
    protected = {k.lower() for k in cfg.protected_keywords}

    if strategy == "paraphrase" and cfg.paraphraser is not None:
        out = cfg.paraphraser(caption)
    elif strategy == "backtranslate" and cfg.back_translator is not None:
        out = cfg.back_translator(caption)
    elif strategy == "masked" and cfg.masked_substituter is not None:
        out = cfg.masked_substituter(caption)
    elif strategy == "dropout":
        words = _tokenize_words(caption)
        kept = []
        for w in words:
            if w.strip() and w.lower() not in protected and rng.random() < cfg.dropout_prob:
                continue
            kept.append(w)
        out = "".join(kept)
    else:  # synonym substitution (default, always available)
        words = _tokenize_words(caption)
        for i, w in enumerate(words):
            lw = w.lower()
            if lw in protected or lw not in cfg.synonyms:
                continue
            if rng.random() < cfg.synonym_prob:
                words[i] = rng.choice(cfg.synonyms[lw])
        out = "".join(words)

    # keyword-protection guarantee: if an external augmenter dropped a
    # protected keyword, fall back to the original caption (Agument_NLP.py
    # protects by never feeding those words to the models).
    lower_out = out.lower()
    if any(k not in lower_out for k in protected if k in caption.lower()):
        return caption
    return " ".join(out.split())
