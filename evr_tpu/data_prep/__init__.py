from .splits import split_caption_json, merge_caption_jsons, build_mixed_testset
from .token_audit import audit_token_limits
from .clipscore import clipscore_captions
from .augment import augment_caption, AugmentConfig
from .captioning import Captioner, TemplateCaptioner, caption_folder
from .translate_testset import translate_testset_csv

__all__ = [
    "translate_testset_csv",
    "split_caption_json",
    "merge_caption_jsons",
    "build_mixed_testset",
    "audit_token_limits",
    "clipscore_captions",
    "augment_caption",
    "AugmentConfig",
    "Captioner",
    "TemplateCaptioner",
    "caption_folder",
]
