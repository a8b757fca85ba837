"""Training losses.

Reference semantics (`Backend/clip_finetune_correct.py:459-469`):
``total = contrastive_weight * (CE_i2t + CE_t2i)/2 + classification_weight *
CE_cls`` with diagonal contrastive targets; classifier input is the
L2-normalised image features (`:174-180`). Variants add label smoothing
(`content/CLIP_finetune_HEAD/train_CLIP_v3.py:235-298`), supported here via
``label_smoothing``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from evr_tpu.parallel.contrastive import (
    global_infonce_loss,
    global_siglip_loss,
    infonce_loss_single,
    siglip_loss_single,
)


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Per-example CE with optional label smoothing; fp32 internally."""
    logits = logits.astype(jnp.float32)
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / n
    return -(onehot * logp).sum(-1)


def combined_clip_loss(
    image_features: jax.Array,  # [b, D] L2-normalised
    text_features: jax.Array,  # [b, D] L2-normalised
    logit_scale: jax.Array,
    class_logits: jax.Array | None = None,
    class_labels: jax.Array | None = None,
    contrastive_weight: float = 1.0,
    classification_weight: float = 0.2,
    label_smoothing: float = 0.0,
    axis: str | None = None,
    contrastive_impl: str = "infonce",
    logit_bias: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Joint contrastive + classification loss.

    With ``axis`` set (inside shard_map/pjit over a named axis) the
    contrastive term uses the *global* batch via feature all-gather; the
    classification term is a local mean pmean-ed across devices.

    ``contrastive_impl``: 'infonce' (reference parity) or 'siglip'
    (pairwise sigmoid, arxiv 2303.15343 — no global softmax; pass the
    learnable ``logit_bias``).
    """
    if contrastive_impl == "siglip":
        bias = jnp.float32(-10.0) if logit_bias is None else logit_bias
        if axis is None:
            contrastive = siglip_loss_single(
                image_features, text_features, logit_scale, bias
            )
        else:
            contrastive = global_siglip_loss(
                image_features, text_features, logit_scale, bias, axis
            )
    elif axis is None:
        contrastive = infonce_loss_single(image_features, text_features, logit_scale)
    else:
        contrastive = global_infonce_loss(
            image_features, text_features, logit_scale, axis
        )

    metrics = {"contrastive_loss": contrastive}
    total = contrastive_weight * contrastive

    if class_logits is not None and class_labels is not None:
        cls = softmax_cross_entropy(class_logits, class_labels, label_smoothing).mean()
        if axis is not None:
            cls = jax.lax.pmean(cls, axis)
        acc = (class_logits.argmax(-1) == class_labels).mean()
        if axis is not None:
            acc = jax.lax.pmean(acc, axis)
        metrics["classification_loss"] = cls
        metrics["classification_accuracy"] = acc
        total = total + classification_weight * cls

    metrics["total_loss"] = total
    return total, metrics
