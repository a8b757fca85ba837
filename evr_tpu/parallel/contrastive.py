"""Global-batch contrastive (InfoNCE) loss across the device mesh.

The reference's in-batch symmetric InfoNCE (`Backend/clip_finetune_correct.py:
459-469`: CE over logit_scale·img@textᵀ with diagonal targets, averaged over
both directions) generalises to multi-chip data parallelism by gathering
*features* (cheap: B×D) rather than logits (B×B), then computing each
device's rows of the global logit matrix locally with per-shard label
offsets. At equal global batch the loss is identical to the single-device
computation — tested in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def infonce_loss_single(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
) -> jax.Array:
    """Single-device reference: symmetric CE with diagonal targets."""
    scale = jnp.exp(logit_scale)
    logits = scale * image_features @ text_features.T
    labels = jnp.arange(logits.shape[0])
    return 0.5 * (
        _cross_entropy(logits, labels).mean()
        + _cross_entropy(logits.T, labels).mean()
    )


def global_infonce_loss(
    image_features: jax.Array,  # [b_local, D], L2-normalised
    text_features: jax.Array,  # [b_local, D], L2-normalised
    logit_scale: jax.Array,
    axis: str = "data",
) -> jax.Array:
    """InfoNCE over the *global* batch, callable inside shard_map/pjit.

    Gathers features along ``axis`` so every device scores its local rows
    against all global columns; labels are offset by the shard's position.
    Returns the global mean loss (identical on every device via pmean).
    """
    all_txt = jax.lax.all_gather(text_features, axis, tiled=True)  # [B, D]
    all_img = jax.lax.all_gather(image_features, axis, tiled=True)
    b = image_features.shape[0]
    shard = jax.lax.axis_index(axis)
    labels = shard * b + jnp.arange(b)

    scale = jnp.exp(logit_scale)
    logits_i = scale * image_features @ all_txt.T  # [b, B]
    logits_t = scale * text_features @ all_img.T
    local = 0.5 * (
        _cross_entropy(logits_i, labels).mean()
        + _cross_entropy(logits_t, labels).mean()
    )
    return jax.lax.pmean(local, axis)


def siglip_loss_single(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
) -> jax.Array:
    """SigLIP pairwise sigmoid loss (arxiv 2303.15343), single device.

    L = -1/|B| Σ_i Σ_j log σ(z_ij · (t·x_i·y_j + b)), z=+1 on the diagonal.
    Unlike InfoNCE there is no softmax over the global batch, so the loss
    decomposes over pairs — the TPU-friendly property that lets the global
    version below stay exact with only a feature all-gather.
    """
    logits = jnp.exp(logit_scale) * image_features @ text_features.T + logit_bias
    n = logits.shape[0]
    z = 2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0
    return -jnp.mean(
        jnp.sum(jax.nn.log_sigmoid(z * logits.astype(jnp.float32)), axis=-1)
    )


def global_siglip_loss(
    image_features: jax.Array,  # [b_local, D], L2-normalised
    text_features: jax.Array,  # [b_local, D], L2-normalised
    logit_scale: jax.Array,
    logit_bias: jax.Array,
    axis: str = "data",
) -> jax.Array:
    """SigLIP loss over the global batch inside shard_map/pjit.

    Every (i, j) pair appears exactly once in the image-rows × all-texts
    matrix, so gathering text features and pmean-ing the local row means
    reproduces the single-device loss bit-for-bit at equal global batch.
    """
    all_txt = jax.lax.all_gather(text_features, axis, tiled=True)  # [B, D]
    b = image_features.shape[0]
    shard = jax.lax.axis_index(axis)
    logits = jnp.exp(logit_scale) * image_features @ all_txt.T + logit_bias
    pos = jnp.arange(all_txt.shape[0])[None, :] == (shard * b + jnp.arange(b))[:, None]
    z = jnp.where(pos, 1.0, -1.0)
    local = -jnp.mean(
        jnp.sum(jax.nn.log_sigmoid(z * logits.astype(jnp.float32)), axis=-1)
    )
    return jax.lax.pmean(local, axis)


def make_sharded_infonce(mesh: Mesh, axis: str = "data"):
    """Wrap global_infonce_loss as a top-level sharded function (for tests
    and for serving-time loss evaluation; training uses it inline inside its
    own shard_map'd train step)."""

    def fn(img, txt, logit_scale):
        return global_infonce_loss(img, txt, logit_scale, axis)

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=P(),
        check_rep=False,
    )
