from .preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_batch,
    preprocess_for_model,
    load_image_host,
)
from .topk import cosine_topk, merge_topk
from .attention import flash_attention
from .layernorm import fused_layer_norm

__all__ = [
    "CLIP_MEAN",
    "CLIP_STD",
    "preprocess_batch",
    "preprocess_for_model",
    "load_image_host",
    "cosine_topk",
    "merge_topk",
    "flash_attention",
    "fused_layer_norm",
]
