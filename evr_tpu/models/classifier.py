"""Classification head over CLIP image features.

Parity target: ``CLIPWithClassifier`` (`Backend/clip_finetune_correct.py:
118-185` / `Backend/services/embedding_service.py:16-67`): a
512 → 512 → ReLU → Dropout(0.1) → num_classes MLP over the image embedding,
trained jointly with the contrastive loss (weights 1.0 / 0.2) for the
Violence / Sensitive / NonViolence domain.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import Params, init_linear, linear


@dataclass(frozen=True)
class ClassifierConfig:
    embed_dim: int = 512
    hidden_dim: int = 512
    num_classes: int = 3
    dropout: float = 0.1


def init_classifier_params(rng: jax.Array, cfg: ClassifierConfig) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": init_linear(k1, cfg.embed_dim, cfg.hidden_dim),
        "fc2": init_linear(k2, cfg.hidden_dim, cfg.num_classes),
    }


def classifier_forward(
    params: Params,
    cfg: ClassifierConfig,
    features: jax.Array,
    *,
    deterministic: bool = True,
    rng: jax.Array | None = None,
) -> jax.Array:
    h = jax.nn.relu(linear(features, params["fc1"]))
    if not deterministic and cfg.dropout > 0.0:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    return linear(h, params["fc2"])
