from .clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    init_clip_params,
    encode_image,
    encode_text,
    clip_forward,
)
from .variants import MODEL_REGISTRY, get_model_config
from .classifier import ClassifierConfig, init_classifier_params, classifier_forward
from .captioner import CaptionerConfig, init_captioner_params

__all__ = [
    "CaptionerConfig",
    "init_captioner_params",
    "CLIPConfig",
    "TextConfig",
    "VisionConfig",
    "init_clip_params",
    "encode_image",
    "encode_text",
    "clip_forward",
    "MODEL_REGISTRY",
    "get_model_config",
    "ClassifierConfig",
    "init_classifier_params",
    "classifier_forward",
]
