"""Projection and fusion heads over the CLIP towers.

Reference counterparts:

- 512→P projection pair with Xavier init / zero bias + learnable
  logit_scale (`content/source_training/training_CLIP_multimodal.py:104-160`,
  also the T4 contrastive trainer);
- fusion model: concat(img, txt) → Linear(2D, 512) → ReLU → Dropout(0.1) →
  classifier, plus per-modality auxiliary classifiers
  (`content/CLIP_finetune_HEAD/training_CLIP.py:64-127`, and the v3
  progressive trainer's head).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import Params, linear


def _xavier(rng, d_in, d_out):
    bound = math.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(rng, (d_in, d_out), jnp.float32, -bound, bound)


# -- projection pair (T3/T4) ----------------------------------------------


@dataclass(frozen=True)
class ProjectionConfig:
    embed_dim: int = 512  # CLIP output dim
    proj_dim: int = 256  # 0 → identity (no projection)


def init_projection_params(rng: jax.Array, cfg: ProjectionConfig) -> Params:
    if cfg.proj_dim <= 0:
        return {"logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32)}
    k1, k2 = jax.random.split(rng)
    return {
        "image_projection": {
            "kernel": _xavier(k1, cfg.embed_dim, cfg.proj_dim),
            "bias": jnp.zeros((cfg.proj_dim,), jnp.float32),
        },
        "text_projection": {
            "kernel": _xavier(k2, cfg.embed_dim, cfg.proj_dim),
            "bias": jnp.zeros((cfg.proj_dim,), jnp.float32),
        },
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


def project_features(
    params: Params, image_features: jax.Array | None, text_features: jax.Array | None
) -> tuple[jax.Array | None, jax.Array | None]:
    """Apply the projection pair + L2 normalise (the trainers always
    normalise after projecting)."""

    def proj(x, name):
        if x is None:
            return None
        if name in params:
            x = linear(x, params[name])
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    return proj(image_features, "image_projection"), proj(text_features, "text_projection")


# -- fusion head (T5 / T2) ------------------------------------------------


@dataclass(frozen=True)
class FusionConfig:
    embed_dim: int = 512
    hidden_dim: int = 512
    num_classes: int = 2
    dropout: float = 0.1


def init_fusion_params(rng: jax.Array, cfg: FusionConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "fusion": {
            "kernel": _xavier(k1, cfg.embed_dim * 2, cfg.hidden_dim),
            "bias": jnp.zeros((cfg.hidden_dim,), jnp.float32),
        },
        "classifier": {
            "kernel": _xavier(k2, cfg.hidden_dim, cfg.num_classes),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
        "image_classifier": {
            "kernel": _xavier(k3, cfg.embed_dim, cfg.num_classes),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
        "text_classifier": {
            "kernel": _xavier(k4, cfg.embed_dim, cfg.num_classes),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }


def fusion_forward(
    params: Params,
    cfg: FusionConfig,
    image_features: jax.Array,  # [B, D] L2-normalised
    text_features: jax.Array,  # [B, D] L2-normalised
    deterministic: bool = True,
    rng: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Returns the T5 output dict: fused/image/text logits + the features."""
    image_logits = linear(image_features, params["image_classifier"])
    text_logits = linear(text_features, params["text_classifier"])
    combined = jnp.concatenate([image_features, text_features], axis=-1)
    h = jax.nn.relu(linear(combined, params["fusion"]))
    if not deterministic and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        h = jnp.where(jax.random.bernoulli(rng, keep, h.shape), h / keep, 0.0)
    fused_logits = linear(h, params["classifier"])
    return {
        "fused_logits": fused_logits,
        "image_logits": image_logits,
        "text_logits": text_logits,
        "image_features": image_features,
        "text_features": text_features,
    }
