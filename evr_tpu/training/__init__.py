from .finetune import TrainConfig, Trainer, TrainState, make_optimizer, make_train_step
from .sharded_ckpt import restore_sharded, save_sharded
from .losses import combined_clip_loss
from .partition import freeze_paths, param_group_labels
from .data import CaptionDataset
from .scst import ScstConfig, ScstTrainer, clip_text_reward, encode_captions

__all__ = [
    "TrainConfig",
    "Trainer",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "combined_clip_loss",
    "freeze_paths",
    "param_group_labels",
    "CaptionDataset",
    "ScstConfig",
    "ScstTrainer",
    "clip_text_reward",
    "encode_captions",
]
