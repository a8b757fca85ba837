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
