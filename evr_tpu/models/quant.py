"""Int8 quantized inference for the CLIP towers.

The reference has no quantization story at all — its serving model is fp16
torch CLIP (`Backend/services/embedding_service.py:70-120`). On TPU v5e the
MXU's int8 path doubles peak throughput over bf16 (≈394 TOPS vs ≈197
TFLOP/s), so an int8 *encode* path is a genuinely TPU-native capability:
quantize the transformer-block linear weights to int8 with per-output-channel
scales, quantize activations dynamically per token (symmetric absmax), and
run the GEMMs as int8×int8→int32 `dot_general` so XLA lowers them onto the
MXU's int8 systolic path.

What gets quantized: every residual-block linear (attn qkv/out, mlp fc/proj)
in both towers — ≥95% of encode FLOPs. What stays in the compute dtype:
LayerNorm (fp32 stats, as everywhere in this package), attention
score/softmax/attend (tiny at CLIP sequence lengths), patch-embed conv,
embedding gathers, and the final projections (all a few % of FLOPs, and the
quality-sensitive endpoints).

Quantized params are inference-only (training stays bf16/fp32; the int8
index storage for retrieval is separate — see evr_tpu.index.store).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def quantize_linear_params(p: Params) -> Params:
    """fp linear params {kernel[, bias]} → int8 {kernel_q, kernel_scale[, bias]}.

    Symmetric per-output-channel quantization: scale[j] = max_i |W[i,j]| / 127.
    """
    kernel = jnp.asarray(p["kernel"], jnp.float32)
    scale = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    kernel_q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    out: Params = {"kernel_q": kernel_q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantized_linear(x: jax.Array, p: Params) -> jax.Array:
    """y = x @ W + b with W int8 and x quantized per token on the fly.

    The int8×int8 contraction accumulates in int32 on the MXU; the two
    symmetric scales (per-token activation, per-channel weight) multiply back
    afterwards. Output dtype matches the input compute dtype.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax / 127.0, 1e-12)
    x_q = jnp.round(x32 / x_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * p["kernel_scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def is_quantized_linear(p: Params) -> bool:
    return isinstance(p, dict) and "kernel_q" in p


def _quantize_block(block: Params) -> Params:
    if is_quantized_linear(block["attn"]["qkv"]):  # idempotent
        return block
    out = dict(block)
    out["attn"] = {
        "qkv": quantize_linear_params(block["attn"]["qkv"]),
        "out": quantize_linear_params(block["attn"]["out"]),
    }
    out["mlp"] = {
        "fc": quantize_linear_params(block["mlp"]["fc"]),
        "proj": quantize_linear_params(block["mlp"]["proj"]),
    }
    return out


def quantize_clip_params(params: Params) -> Params:
    """Quantize every transformer-block linear of both towers to int8.

    Everything outside the blocks (patch embed, positional/token embeddings,
    LayerNorms, output projections, logit_scale) is left untouched.
    """
    out = dict(params)
    for tower in ("visual", "text"):
        if tower in params:
            tp = dict(params[tower])
            tp["blocks"] = [_quantize_block(b) for b in tp["blocks"]]
            out[tower] = tp
    return out


# SigLIP towers share the block parameter structure ({attn:{qkv,out},
# mlp:{fc,proj}} under visual/text.blocks), so the same quantizer applies;
# the MAP pooling head and output projections stay fp like CLIP's
# embeddings/projections (models/siglip.py routes block linears through
# layers.linear, which dispatches on the quantized structure).
quantize_siglip_params = quantize_clip_params
