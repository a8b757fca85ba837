"""Transformer building blocks for the CLIP towers.

Functional (params-pytree in, array out) so every transform — jit, grad,
pjit sharding, remat — composes without framework machinery. Numerics follow
OpenAI CLIP (the model the reference serves and fine-tunes through the pip
``clip`` package — see `Backend/services/embedding_service.py:70-120`):
pre-LN residual blocks, quickGELU activations, LayerNorm eps 1e-5.

LayerNorm statistics are always computed in fp32 regardless of the compute
dtype (bf16 on TPU), matching how fp16 CLIP keeps LN in fp32.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

LN_EPS = 1e-5


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x: jax.Array, p: Params, eps: float = LN_EPS) -> jax.Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def linear(x: jax.Array, p: Params) -> jax.Array:
    if "kernel_q" in p:  # int8-quantized weights (models.quant)
        from evr_tpu.models.quant import quantized_linear

        return quantized_linear(x, p)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def init_linear(rng, d_in: int, d_out: int, std: float | None = None) -> Params:
    std = std if std is not None else d_in**-0.5
    k_key, _ = jax.random.split(rng)
    return {
        "kernel": jax.random.normal(k_key, (d_in, d_out), jnp.float32) * std,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# -- attention ------------------------------------------------------------


def init_attention(rng, width: int) -> Params:
    k1, k2 = jax.random.split(rng)
    attn_std = width**-0.5
    return {
        # Fused QKV projection: (width, 3*width), matching torch's in_proj.
        "qkv": init_linear(k1, width, 3 * width, std=attn_std),
        "out": init_linear(k2, width, width, std=attn_std),
    }


def attention(
    x: jax.Array,
    p: Params,
    n_heads: int,
    causal: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """Multi-head self-attention over [B, T, W].

    ``impl``: "xla" (einsum softmax path, XLA-fused), "flash" (Pallas
    fused-attention kernel, TPU only — see evr_tpu.ops.attention), or
    "auto" (flash on TPU when T ≥ 256, where the whole-sequence kernel
    measures faster than the XLA path — PERF.md; XLA otherwise: at short
    lengths the 128-wide tile underfill makes the kernel lose even with
    sequence packing).
    """
    B, T, W = x.shape
    head_dim = W // n_heads

    qkv = linear(x, p["qkv"])  # [B, T, 3W]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(t):
        return t.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)

    if impl == "auto":
        impl = "flash" if (T >= 256 and jax.default_backend() == "tpu") else "xla"

    if impl == "flash":
        from evr_tpu.ops.attention import flash_attention

        o = flash_attention(q, k, v, causal=causal)
    else:
        scale = 1.0 / math.sqrt(head_dim)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        if causal:
            mask = jnp.tril(jnp.ones((T, T), jnp.bool_))
            logits = jnp.where(mask, logits, jnp.float32(-1e9))
        weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", weights, v)

    o = o.transpose(0, 2, 1, 3).reshape(B, T, W)
    return linear(o, p["out"])


# -- residual block -------------------------------------------------------


def init_block(rng, width: int, n_layers: int) -> Params:
    """One pre-LN residual attention block.

    Init scales follow CLIP: proj layers scaled by (2*n_layers)^-0.5 to keep
    the residual stream variance flat at depth.
    """
    k_attn, k_fc, k_proj = jax.random.split(rng, 3)
    proj_std = (width**-0.5) * ((2 * n_layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    attn_p = init_attention(k_attn, width)
    attn_p["out"]["kernel"] = (
        jax.random.normal(k_proj, (width, width), jnp.float32) * proj_std
    )
    return {
        "ln_1": init_layer_norm(width),
        "attn": attn_p,
        "ln_2": init_layer_norm(width),
        "mlp": {
            "fc": init_linear(k_fc, width, 4 * width, std=fc_std),
            "proj": init_linear(k_proj, 4 * width, width, std=proj_std),
        },
    }


ACTIVATIONS = {
    "quick_gelu": quick_gelu,
    # exact (erf) GELU — OpenCLIP's laion-trained towers (e.g. ViT-H-14)
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def final_block_cls(
    x: jax.Array,
    p: Params,
    n_heads: int,
    activation: str = "quick_gelu",
) -> jax.Array:
    """Final vision-block forward specialized to the CLS row → [B, W].

    CLIP pools the vision tower as ``ln_post(x[:, 0]) @ proj`` — every row
    but the CLS token of the LAST block's output is discarded (reference:
    the pip ``clip`` VisionTransformer pooling behind
    `Backend/services/embedding_service.py:186-217`). So the final block
    only needs K/V over all tokens; Q, the attention output, the out-proj
    and the whole MLP half run on the single CLS row. That drops
    ~(1 − 1/T) of the block's Q-projection, score, out-proj and MLP FLOPs
    — ~6% of a ViT-B/32 encode (1 of 12 blocks ≈ 8.3% of block time, K/V
    still paid) — with the *same contractions* for the CLS row: LN stats,
    fp32 softmax and GEMM reductions are unchanged, only dead rows vanish.

    Used by the serving/ingest encode path (``encode_staged_u8``); the
    ``encode_image`` parity surface keeps the full final block.
    """
    return _final_block_row(x, p, n_heads, None, activation)


def final_block_eot(
    x: jax.Array,
    p: Params,
    n_heads: int,
    eot_pos: jax.Array,
    activation: str = "quick_gelu",
) -> jax.Array:
    """Final causal text-block forward specialized to the EOT row → [B, W].

    Text pooling reads ``ln_final(x)[b, eot_pos[b]] @ proj`` — one row per
    sequence of the last block's output (the pip ``clip``
    ``encode_text`` argmax-EOT pooling behind
    `Backend/services/embedding_service.py:151-184`). The causal mask
    means the EOT row attends to positions ≤ eot_pos only, so the final
    block needs K/V over all T rows but runs Q (gathered per-sequence),
    the scores, out-proj and the MLP on the single EOT row. Mask value
    −1e9 matches the XLA attention path (`ops.attention._xla_attention`).

    Used by the serving text-encode path (``encode_text`` with
    ``eot_fast_final=True``); the training/parity surface keeps the full
    final block.
    """
    return _final_block_row(x, p, n_heads, eot_pos, activation)


def _final_block_row(
    x: jax.Array,
    p: Params,
    n_heads: int,
    row_idx: jax.Array | None,
    activation: str,
) -> jax.Array:
    """Shared pooled-row block: K/V over all T tokens, everything else on
    one row per sequence. ``row_idx`` None → the (static) CLS row 0, no
    mask; a [B] index → that row with keys masked to positions ≤ row_idx
    (the causal window of the selected row — exactly what the full causal
    block computes for it). Mask value −1e9 matches
    `ops.attention._xla_attention`."""
    B, T, W = x.shape
    d = W // n_heads
    ap = p["attn"]
    y = layer_norm(x, p["ln_1"])

    def pick(a):
        if row_idx is None:
            return a[:, 0]
        return jnp.take_along_axis(a, row_idx[:, None, None], axis=1)[:, 0]

    if "kernel_q" in ap["qkv"]:
        # int8 weights: slicing per-output-channel quantized columns would
        # need a second quant codepath; full QKV then slice (still skips
        # the scores/out-proj/MLP on dead rows).
        qkv = linear(y, ap["qkv"])
        q = pick(qkv[:, :, :W])
        k, v = qkv[:, :, W : 2 * W], qkv[:, :, 2 * W :]
    else:
        kern = ap["qkv"]["kernel"].astype(y.dtype)
        bias = ap["qkv"]["bias"].astype(y.dtype)
        kv = y @ kern[:, W:] + bias[W:]
        k, v = kv[:, :, :W], kv[:, :, W:]
        q = pick(y) @ kern[:, :W] + bias[:W]
    q = q.reshape(B, n_heads, d)
    k = k.reshape(B, T, n_heads, d)
    v = v.reshape(B, T, n_heads, d)
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhd,bthd->bht", q, k).astype(jnp.float32) * scale
    if row_idx is not None:
        valid = jnp.arange(T)[None, :] <= row_idx[:, None]
        logits = jnp.where(valid[:, None, :], logits, jnp.float32(-1e9))
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bht,bthd->bhd", w, v).reshape(B, W)
    xc = pick(x) + linear(o, ap["out"])
    h = linear(layer_norm(xc, p["ln_2"]), p["mlp"]["fc"])
    h = ACTIVATIONS[activation](h)
    return xc + linear(h, p["mlp"]["proj"])


def block_apply_cached(
    x_new: jax.Array,
    p: Params,
    n_heads: int,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array | int,
    activation: str = "quick_gelu",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Incremental causal residual block with a KV cache.

    ``x_new``: [B, S, W] activations for absolute positions
    ``pos .. pos+S-1`` (``pos`` may be a traced scalar — scan-friendly).
    ``k_cache``/``v_cache``: [B, T_max, heads, head_dim] rolling caches;
    rows ``pos .. pos+S-1`` are overwritten, later rows are masked out of
    the attention (so stale/zero rows are inert). Row-for-row it computes
    exactly what ``block_apply(causal=True)`` computes for those rows
    (same fp32 score/softmax math, same −1e9 mask), but touches only the
    new rows' Q/out-proj/MLP — the autoregressive decode path
    (models.captioner.generate) runs O(T) total block work instead of the
    O(T²) full re-run per emitted token.

    Returns ``(y_new, k_cache, v_cache)`` with the updated caches.
    """
    B, S, W = x_new.shape
    d = W // n_heads
    ap = p["attn"]
    T_max = k_cache.shape[1]

    y = layer_norm(x_new, p["ln_1"])
    qkv = linear(y, ap["qkv"])  # [B, S, 3W]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, n_heads, d)
    k = k.reshape(B, S, n_heads, d).astype(k_cache.dtype)
    v = v.reshape(B, S, n_heads, d).astype(v_cache.dtype)
    start = (0, jnp.asarray(pos, jnp.int32), 0, 0)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k, start)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, start)

    scale = 1.0 / math.sqrt(d)
    logits = (
        jnp.einsum("bshd,bthd->bhst", q, k_cache).astype(jnp.float32) * scale
    )
    # key t is visible to new row s iff t <= pos + s (causal window)
    valid = jnp.arange(T_max)[None, :] <= (
        jnp.asarray(pos, jnp.int32) + jnp.arange(S)[:, None]
    )
    logits = jnp.where(valid[None, None, :, :], logits, jnp.float32(-1e9))
    w = jax.nn.softmax(logits, axis=-1).astype(x_new.dtype)
    o = jnp.einsum("bhst,bthd->bshd", w, v_cache.astype(x_new.dtype))
    xc = x_new + linear(o.reshape(B, S, W), ap["out"])
    h = linear(layer_norm(xc, p["ln_2"]), p["mlp"]["fc"])
    h = ACTIVATIONS[activation](h)
    return xc + linear(h, p["mlp"]["proj"]), k_cache, v_cache


def block_apply(
    x: jax.Array,
    p: Params,
    n_heads: int,
    causal: bool = False,
    attn_impl: str = "xla",
    activation: str = "quick_gelu",
) -> jax.Array:
    # "auto" on TPU routes blocks through the fully fused Pallas block (two
    # kernels: LN1+QKV+attention+proj+res and LN2+MLP+res, weights
    # VMEM-resident) — measured −22% per block vs the XLA composition at
    # ViT-B/32 (T=50, W=768) and ViT-L/14@336 (T=577, W=1024) shapes, −13%
    # at ViT-H-14 (T=257, W=1280, exact GELU), −12% at text-tower shapes
    # (PERF.md). Gated to W ≤ 1280 (the widest tower measured; wider would
    # need re-measuring VMEM residency of the MLP weights). Unrouted
    # shapes take the flash-attention kernel via attention() below at
    # T ≥ 256 and plain XLA otherwise. int8 (quantized linears) routes to
    # the fused quantized block kernels on TPU (resident int8 weights,
    # in-kernel per-token activation quant). Grad-safe: the fused block
    # carries a custom VJP backed by the fused flash-style Pallas backward
    # kernels (ops.block_fused fused_*_block_bwd).
    if attn_impl == "auto_grad":
        # Training resolution: fused kernels only where fused fwd+bwd beats
        # XLA's stored-activation fwd+bwd — measured: XLA wins at T ≤ 257
        # (1.84 vs 2.47 ms/block at B=64/T=50; 5.7 vs 7.2 at T=257), the
        # fused flash-style backward wins at T=577 (14.3 vs 16.3 ms,
        # PERF.md) where XLA's [T,T] probability round-trips dominate.
        attn_impl = "auto" if x.shape[1] >= 512 else "xla"

    if (
        attn_impl == "auto"
        and x.shape[2] <= 1280
        and jax.default_backend() == "tpu"
    ):
        if "kernel_q" in p["attn"]["qkv"]:
            # int8 weights (models.quant, inference-only): fused variant
            # with resident int8 weights + in-kernel per-token quant.
            from evr_tpu.ops.block_fused import fused_quant_block_apply

            return fused_quant_block_apply(x, p, n_heads, activation, causal)
        from evr_tpu.ops.block_fused import fused_block_apply

        return fused_block_apply(x, p, n_heads, activation, causal)

    x = x + attention(layer_norm(x, p["ln_1"]), p["attn"], n_heads, causal, attn_impl)
    h = linear(layer_norm(x, p["ln_2"]), p["mlp"]["fc"])
    h = ACTIVATIONS[activation](h)
    x = x + linear(h, p["mlp"]["proj"])
    return x
