"""Fused device-side image preprocessing.

The reference preprocesses every frame on the host with torchvision-style
transforms — bicubic Resize(shortest side), CenterCrop, Normalize with the
CLIP mean/std (`Backend/content/Test_compare_model/compare_models.py:36-40`) —
one PIL image at a time inside the batch-32 embed loop
(`Backend/services/embedding_service.py:461-505`).

TPU-native layout instead:

- host does JPEG decode only (cheapest possible CPU work; see
  ``evr_tpu.native`` for the C++ decode pipeline), producing uint8 HWC
  batches at a canonical staging resolution;
- a single jitted function does uint8→float, bicubic resize (antialiased,
  PIL-equivalent semantics), center crop and mean/std normalisation on
  device, fused by XLA into the encoder's first conv;
- everything is batched: one host→device transfer per batch, not per image.

An exact-host path (`load_image_host`) with PIL bicubic semantics is kept for
golden-parity evaluation against the reference preprocessing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalisation constants (compare_models.py:36-40).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("image_size",))
def preprocess_batch(images: jax.Array, image_size: int = 224) -> jax.Array:
    """uint8/float [B, H, W, 3] → normalised float32 [B, S, S, 3].

    Resize so the shortest side equals ``image_size`` (bicubic, antialiased —
    PIL-equivalent downscale), then center-crop to ``image_size``², then
    normalise with CLIP mean/std. H and W are static per-batch, so XLA
    compiles one program per staging resolution.
    """
    x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images.astype(jnp.float32)
    B, H, W, C = x.shape

    scale = image_size / min(H, W)
    # round() matches PIL's size computation for Resize(shortest_side)
    new_h, new_w = int(round(H * scale)), int(round(W * scale))
    x = jax.image.resize(
        x, (B, new_h, new_w, C), method="bicubic", antialias=True
    )

    top = (new_h - image_size) // 2
    left = (new_w - image_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (B, image_size, image_size, C)
    )

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def preprocess_for_model(images: np.ndarray, image_size: int = 224) -> jax.Array:
    """Host-side convenience: numpy uint8 batch → device-normalised batch."""
    return preprocess_batch(jnp.asarray(images), image_size=image_size)


def load_image_host(path, image_size: int = 224) -> np.ndarray:
    """Exact reference-parity host path: PIL bicubic resize + center crop.

    Used by golden-vector tests and anywhere bit-closeness to the reference's
    torchvision pipeline matters more than throughput.
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize(
        (int(round(w * scale)), int(round(h * scale))), Image.BICUBIC
    )
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    x = np.asarray(img, dtype=np.float32) / 255.0
    return (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
