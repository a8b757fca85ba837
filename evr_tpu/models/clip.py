"""CLIP dual-encoder in pure JAX.

The reference serves and fine-tunes OpenAI CLIP ViT-B/32 through the pip
``clip`` package (`Backend/services/embedding_service.py:70-120`,
`Backend/clip_finetune_correct.py:340-345`). This module is a TPU-first
re-implementation of that architecture:

- Vision tower: patch-embed conv (bias-free), class token, learned positional
  embeddings, pre-LN transformer with quickGELU, ln_post + linear projection
  of the class token.
- Text tower: token + positional embeddings (77 ctx), causal transformer,
  ln_final, projection of the embedding at the EOT position (argmax token id).
- Shared learned ``logit_scale`` (init log(1/0.07), the temperature the
  reference trains with at `clip_finetune_correct.py:347-349`).

Everything is a function of a params pytree, so jit/pjit/grad/remat compose
directly; compute dtype is a call-site argument (bf16 default on TPU, fp32
parity mode for golden-vector tests against HuggingFace CLIP).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    block_apply,
    final_block_cls,
    final_block_eot,
    init_block,
    init_layer_norm,
    layer_norm,
)


@dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


@dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    vision: VisionConfig = VisionConfig()
    text: TextConfig = TextConfig()
    # "xla" | "flash" | "auto" — which attention implementation the towers
    # use. "auto" picks the Pallas fused kernel on TPU at T ≥ 256 (where it
    # measures faster — up to −32% at T=577, PERF.md) and the XLA einsum
    # path otherwise;
    # the kernel carries a custom VJP (XLA-recompute backward) so training
    # composes with it.
    attn_impl: str = "auto"
    # "quick_gelu" (OpenAI CLIP) | "gelu" (OpenCLIP laion towers)
    activation: str = "quick_gelu"
    # rematerialise each transformer block (memory ↔ FLOPs trade for training)
    remat: bool = False


# -- init -----------------------------------------------------------------


def init_clip_params(rng: jax.Array, cfg: CLIPConfig) -> Params:
    kv, kt = jax.random.split(rng)
    return {
        "visual": _init_vision(kv, cfg.vision, cfg.embed_dim),
        "text": _init_text(kt, cfg.text, cfg.embed_dim),
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }


def _init_vision(rng: jax.Array, v: VisionConfig, embed_dim: int) -> Params:
    keys = jax.random.split(rng, v.layers + 4)
    scale = v.width**-0.5
    return {
        "patch_embed": {
            # HWIO conv kernel; stride = patch size, no bias (CLIP).
            "kernel": jax.random.normal(
                keys[0], (v.patch_size, v.patch_size, 3, v.width), jnp.float32
            )
            * scale
        },
        "class_embedding": jax.random.normal(keys[1], (v.width,), jnp.float32) * scale,
        "pos_embedding": jax.random.normal(keys[2], (v.seq_len, v.width), jnp.float32)
        * scale,
        "ln_pre": init_layer_norm(v.width),
        "blocks": [init_block(keys[4 + i], v.width, v.layers) for i in range(v.layers)],
        "ln_post": init_layer_norm(v.width),
        "proj": jax.random.normal(keys[3], (v.width, embed_dim), jnp.float32) * scale,
    }


def _init_text(rng: jax.Array, t: TextConfig, embed_dim: int) -> Params:
    keys = jax.random.split(rng, t.layers + 3)
    return {
        "token_embedding": jax.random.normal(
            keys[0], (t.vocab_size, t.width), jnp.float32
        )
        * 0.02,
        "pos_embedding": jax.random.normal(
            keys[1], (t.context_length, t.width), jnp.float32
        )
        * 0.01,
        "blocks": [init_block(keys[3 + i], t.width, t.layers) for i in range(t.layers)],
        "ln_final": init_layer_norm(t.width),
        "text_projection": jax.random.normal(
            keys[2], (t.width, embed_dim), jnp.float32
        )
        * t.width**-0.5,
    }


# -- positional-embedding interpolation (ViT-L/14@336 and friends) --------


def interpolate_pos_embedding(pos: jax.Array, new_grid: int) -> jax.Array:
    """Bicubically resample the patch-position grid to a new resolution.

    Enables loading 224px checkpoints into higher-resolution towers
    (the @336 variant the reference benchmarks against OpenCLIP ViT-H-14,
    `compare_models.py` model zoo).
    """
    cls_tok, grid_tok = pos[:1], pos[1:]
    old_grid = int(math.sqrt(grid_tok.shape[0]))
    grid_tok = grid_tok.reshape(old_grid, old_grid, -1)
    resized = jax.image.resize(
        grid_tok, (new_grid, new_grid, grid_tok.shape[-1]), method="cubic"
    )
    return jnp.concatenate([cls_tok, resized.reshape(new_grid * new_grid, -1)], axis=0)


# -- forward --------------------------------------------------------------


def _run_blocks(x, blocks, heads, causal, cfg: CLIPConfig):
    apply = block_apply
    if cfg.remat:
        apply = jax.checkpoint(
            block_apply, static_argnums=(2, 3, 4, 5), policy=None
        )
    for bp in blocks:
        x = apply(x, bp, heads, causal, cfg.attn_impl, cfg.activation)
    return x


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    pixels: jax.Array,
    dtype: jnp.dtype = jnp.float32,
    patch_keep: jax.Array | None = None,
) -> jax.Array:
    """pixels [B, H, W, 3] (already preprocessed, NHWC) → [B, embed_dim].

    Output is the *unnormalised* embedding, matching ``model.encode_image``
    in the reference stack; retrieval normalises separately (as
    `embedding_service.py:176-179` does).

    ``patch_keep`` [B, K] int32: indices of the patch tokens to KEEP
    (FLIP-style random masking, "Scaling Language-Image Pre-training via
    Masking" — training-time speedup: the transformer runs on K+1 tokens
    instead of grid²+1; the class token is always kept). K is static, so
    one compiled program per keep-count. None = full sequence (inference).
    """
    v = cfg.vision
    p = params["visual"]
    x = pixels.astype(dtype)

    # Patch embedding: stride-P conv == unfold-into-patches matmul; XLA maps
    # this onto the MXU directly. (An explicit unfold+GEMM wins standalone —
    # 1.2 vs 1.6 ms at B=128 — but measures ~0.3 ms SLOWER inside the full
    # encode, where XLA fuses the cast/concat/pos-add into the conv; the
    # conv stays by end-to-end measurement. The uint8 serving path takes
    # ``encode_staged_u8`` below instead, which IS an unfold+GEMM — there
    # the win comes from doing the unfold in uint8 and folding the CLIP
    # normalisation into the GEMM.)
    x = jax.lax.conv_general_dilated(
        x,
        p["patch_embed"]["kernel"].astype(dtype),
        window_strides=(v.patch_size, v.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, v.grid * v.grid, v.width)
    return _vision_transform(p, cfg, x, dtype, patch_keep)


def _vision_prefix(p, cfg: CLIPConfig, x, dtype, patch_keep=None) -> jax.Array:
    """cls concat + pos add (+ optional FLIP patch subset) + ln_pre:
    [B, grid², width] patch tokens → [B, T, width] block-input tokens."""
    v = cfg.vision
    B = x.shape[0]
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype), (B, 1, v.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embedding"].astype(dtype)

    if patch_keep is not None:
        # gather the kept patch tokens (after positional add, so every token
        # keeps its original position information), class token first
        kept = jnp.take_along_axis(x[:, 1:], patch_keep[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1], kept], axis=1)

    return layer_norm(x, p["ln_pre"])


def vision_pool(params: Params, cfg: CLIPConfig, x, dtype=jnp.float32) -> jax.Array:
    """Block-stack output [B, T, width] → pooled [B, embed_dim]
    (CLS row → ln_post → projection). Public so stage-decomposed runners
    (parallel.pp pipeline stages) can apply the tail separately."""
    p = params["visual"]
    pooled = layer_norm(x[:, 0], p["ln_post"])
    return (pooled @ p["proj"].astype(dtype)).astype(jnp.float32)


def _vision_transform(
    p, cfg: CLIPConfig, x, dtype, patch_keep=None, cls_fast_final=False
) -> jax.Array:
    """Shared vision trunk after the patch stem: cls/pos/ln_pre → blocks →
    pooled projection. ``x`` is [B, grid², width] patch tokens.

    ``cls_fast_final``: run the LAST block CLS-row-only
    (`layers.final_block_cls`) — valid because the pooling below reads only
    ``x[:, 0]``; numerically the same contractions, ~6% fewer encode FLOPs
    at ViT-B/32. Inference-only (no remat interaction)."""
    v = cfg.vision
    x = _vision_prefix(p, cfg, x, dtype, patch_keep)
    if cls_fast_final and not cfg.remat:
        x = _run_blocks(x, p["blocks"][:-1], v.heads, False, cfg)
        pooled = final_block_cls(x, p["blocks"][-1], v.heads, cfg.activation)
    else:
        x = _run_blocks(x, p["blocks"], v.heads, False, cfg)
        pooled = x[:, 0]
    x = layer_norm(pooled, p["ln_post"])
    return (x @ p["proj"].astype(dtype)).astype(jnp.float32)


def vision_tokens(
    params: Params,
    cfg: CLIPConfig,
    pixels: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Vision stem only: pixels [B, H, W, 3] → [B, T, width] tokens ready
    for the block stack (patch conv + cls/pos/ln_pre). With
    ``vision_pool`` this decomposes ``encode_image`` as
    stem → blocks → pool, the split `parallel.pp` pipelines over stages."""
    v = cfg.vision
    p = params["visual"]
    x = pixels.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x,
        p["patch_embed"]["kernel"].astype(dtype),
        window_strides=(v.patch_size, v.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, v.grid * v.grid, v.width)
    return _vision_prefix(p, cfg, x, dtype)


def encode_staged_u8(
    params: Params,
    cfg: CLIPConfig,
    staged_u8: jax.Array,
    dtype: jnp.dtype = jnp.float32,
    mean=None,
    std=None,
    cls_fast_final: bool = True,
) -> jax.Array:
    """uint8 staged frames [B, S, S, 3] → [B, embed_dim], normalisation
    folded into the patch GEMM (the serving/ingest hot path).

    Numerically equivalent to ``(x/255 - mean)/std`` → ``encode_image`` but
    with far less HBM traffic: the patch unfold runs on UINT8 bytes (¼ the
    fp32 traffic), and the per-channel normalisation becomes a per-input
    rescale of the patch kernel plus a constant bias —
    ``(x/255 − m)/s · K = x · K/(255 s) − Σ (m/s) K`` — so no separate
    normalise pass ever materialises. Measured −2.6 ms on the B=512 stem
    (the 0-block intercept of `bench_kernels roofline`), whose XLA conv
    stem ran at 12% MFU while the 12 transformer blocks run at 77%.
    """
    from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

    v = cfg.vision
    p = params["visual"]
    B, S = staged_u8.shape[0], staged_u8.shape[1]
    if S != v.image_size or staged_u8.shape[2] != v.image_size:
        raise ValueError(
            f"staged batch is {staged_u8.shape[1]}x{staged_u8.shape[2]}, "
            f"model wants {v.image_size}^2"
        )
    g, P = v.grid, v.patch_size
    mean = jnp.asarray(CLIP_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(CLIP_STD if std is None else std, jnp.float32)

    # unfold in uint8: [B,S,S,3] → [B,g,P,g,P,3] → [B,g,g,P,P,3] → [B,g²,P²·3]
    patches = staged_u8.reshape(B, g, P, g, P, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, P * P * 3)
    patches = patches.astype(dtype)  # 0..255 integers are exact in bf16

    # fold (x/255 - mean)/std into the kernel (scan/loop-invariant: XLA
    # hoists this out of any surrounding scan)
    k = p["patch_embed"]["kernel"].astype(jnp.float32)  # [P, P, 3, W]
    scale = (1.0 / (255.0 * std))[None, None, :, None]
    k_scaled = (k * scale).reshape(P * P * 3, v.width).astype(dtype)
    bias = -jnp.einsum("hwco,c->o", k, mean / std).astype(dtype)

    x = patches @ k_scaled + bias
    return _vision_transform(p, cfg, x, dtype, cls_fast_final=cls_fast_final)


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
    eot_fast_final: bool = False,
) -> jax.Array:
    """tokens [B, 77] int32 → [B, embed_dim] (unnormalised).

    Pools the transformer output at the EOT position = argmax token id
    (EOT has the largest id in the CLIP vocab — see evr_tpu.tokenizer.bpe).

    ``eot_fast_final``: run the LAST block EOT-row-only
    (`layers.final_block_eot`) — valid because pooling reads one row per
    sequence; same contractions for that row, dead rows dropped.
    Inference-only (serving path); defaults off so training/parity
    surfaces keep the full final block.
    """
    t = cfg.text
    p = params["text"]
    eot_pos = jnp.argmax(tokens, axis=-1)
    x = text_tokens(params, cfg, tokens, dtype)
    if eot_fast_final and not cfg.remat:
        x = _run_blocks(x, p["blocks"][:-1], t.heads, True, cfg)
        pooled = final_block_eot(x, p["blocks"][-1], t.heads, eot_pos, cfg.activation)
    else:
        x = _run_blocks(x, p["blocks"], t.heads, True, cfg)
        pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]
    pooled = layer_norm(pooled, p["ln_final"])
    return (pooled @ p["text_projection"].astype(dtype)).astype(jnp.float32)


def text_tokens(
    params: Params,
    cfg: CLIPConfig,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Text stem only: tokens [B, 77] → [B, 77, width] block-input
    embeddings (token + positional). Pairs with ``text_pool`` to decompose
    ``encode_text`` as stem → causal blocks → pool for `parallel.pp`."""
    p = params["text"]
    x = p["token_embedding"].astype(dtype)[tokens]
    return x + p["pos_embedding"].astype(dtype)


def text_pool(
    params: Params,
    cfg: CLIPConfig,
    x: jax.Array,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Block-stack output [B, 77, width] → pooled [B, embed_dim]
    (argmax-EOT row → ln_final → projection)."""
    p = params["text"]
    eot_pos = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]
    pooled = layer_norm(pooled, p["ln_final"])
    return (pooled @ p["text_projection"].astype(dtype)).astype(jnp.float32)


def clip_forward(
    params: Params,
    cfg: CLIPConfig,
    pixels: jax.Array,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """Joint forward: normalised features + scaled similarity logits.

    Mirrors ``CLIPWithClassifier.forward``'s contrastive half
    (`clip_finetune_correct.py:155-185`): L2-normalise both towers, scale by
    exp(logit_scale), return both logit directions.
    """
    img = encode_image(params, cfg, pixels, dtype)
    txt = encode_text(params, cfg, tokens, dtype)
    img_n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img_n @ txt_n.T
    return {
        "image_features": img_n,
        "text_features": txt_n,
        "logits_per_image": logits_per_image,
        "logits_per_text": logits_per_image.T,
    }
