from .preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_batch,
    preprocess_for_model,
    load_image_host,
)
from .topk import cosine_topk

__all__ = [
    "CLIP_MEAN",
    "CLIP_STD",
    "preprocess_batch",
    "preprocess_for_model",
    "load_image_host",
    "cosine_topk",
]
