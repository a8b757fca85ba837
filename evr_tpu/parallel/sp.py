"""Sequence parallelism (sp) for the CLIP towers: token-axis sharding.

The workload's naturally long axis is the frame count (sharded in
`index`/`parallel.sharded_search` — SURVEY §5.7); this module covers the
*other* long axis, transformer sequence length, for towers like
ViT-L/14@336 (T=577) and beyond where per-device activation memory for
the [T, T] score matrix is the limit. The reference has no counterpart
(single-GPU torch — `/root/reference/Backend/services/__init__.py:35`).

Design — token-parallel blocks with all-gathered K/V (the standard
long-context decomposition; exact, not approximate):

- Activations live sharded ``[B, T/S, W]`` over a ``seq`` mesh axis.
  LayerNorm, QKV/out projections and the whole MLP are per-token → purely
  local, no communication; weights are replicated (they're small next to
  activations at long T — the memory pressure sp relieves).
- Attention all-gathers K and V (``lax.all_gather`` tiled over the token
  axis → [B, T, h, d] per device) but keeps only the local Q rows, so the
  quadratic score tensor is sharded to ``[B, h, T/S, T]`` — an S× cut of
  the dominant activation. Softmax stays fp32, mask value −1e9, matching
  `ops.attention._xla_attention` numerics exactly.
- T that doesn't divide S is right-padded; padded KEY columns are masked
  out of every softmax (so they never affect real rows) and padded query
  rows are dropped after the gather. Causal masking uses global row ids
  (shard offset + local index), so the text tower is exact too.

Composes with the ``data`` axis (dp×sp). All collectives ride ICI via
XLA's all_gather; there is no hand-rolled communication.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from evr_tpu.models.clip import (
    CLIPConfig,
    text_pool,
    text_tokens,
    vision_pool,
    vision_tokens,
)
from evr_tpu.models.layers import ACTIVATIONS, layer_norm, linear

Params = Any


def _sp_attention(
    y: jax.Array,
    ap: Params,
    n_heads: int,
    causal: bool,
    T_total: int,
    axis: str,
) -> jax.Array:
    """Token-sharded attention: local Q rows, all-gathered K/V.

    ``y`` [B, t, W] is this device's LN'd token shard; returns the local
    rows of the attention output (post out-proj)."""
    B, t, W = y.shape
    d = W // n_heads
    qkv = linear(y, ap["qkv"])
    q, k, v = qkv[..., :W], qkv[..., W : 2 * W], qkv[..., 2 * W :]
    q = q.reshape(B, t, n_heads, d)
    k = k.reshape(B, t, n_heads, d)
    v = v.reshape(B, t, n_heads, d)
    # [B, T_pad, h, d] on every device; the gather is the only collective.
    k_full = lax.all_gather(k, axis, axis=1, tiled=True)
    v_full = lax.all_gather(v, axis, axis=1, tiled=True)
    T_pad = k_full.shape[1]

    scale = 1.0 / math.sqrt(d)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k_full).astype(jnp.float32) * scale
    )
    col = jnp.arange(T_pad)
    valid = col < T_total  # padded key columns never win softmax mass
    if causal:
        row_global = lax.axis_index(axis) * t + jnp.arange(t)
        valid = valid[None, :] & (col[None, :] <= row_global[:, None])
        mask = valid[None, None, :, :]
    else:
        mask = valid[None, None, None, :]
    logits = jnp.where(mask, logits, jnp.float32(-1e9))
    w = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v_full).reshape(B, t, W)
    return linear(o, ap["out"])


def sp_block_apply(
    x: jax.Array,
    p: Params,
    n_heads: int,
    causal: bool,
    T_total: int,
    activation: str = "quick_gelu",
    axis: str = "seq",
) -> jax.Array:
    """One pre-LN residual block on a token shard [B, t, W] (exact: same
    contractions as `models.layers.block_apply` with attn_impl='xla',
    token rows merely distributed)."""
    x = x + _sp_attention(
        layer_norm(x, p["ln_1"]), p["attn"], n_heads, causal, T_total, axis
    )
    h = linear(layer_norm(x, p["ln_2"]), p["mlp"]["fc"])
    h = ACTIVATIONS[activation](h)
    return x + linear(h, p["mlp"]["proj"])


def _pad_tokens(x: jax.Array, n_shards: int) -> jax.Array:
    T = x.shape[1]
    T_pad = -(-T // n_shards) * n_shards
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    return x


def _run_sp_blocks(x, blocks, heads, causal, T_total, activation, axis):
    for bp in blocks:
        x = sp_block_apply(x, bp, heads, causal, T_total, activation, axis)
    return x


def make_sp_image_encode(
    mesh: Mesh,
    cfg: CLIPConfig,
    dtype=jnp.float32,
    seq_axis: str = "seq",
    data_axis: str | None = None,
):
    """Jitted ``(params, pixels) -> [B, embed_dim]`` with the vision block
    stack token-sharded over ``seq_axis`` (batch optionally over
    ``data_axis``). Exact vs `encode_image`."""
    S = mesh.shape[seq_axis]
    dspec = P(data_axis) if data_axis else P()
    T_total = cfg.vision.grid * cfg.vision.grid + 1  # static: CLS + patches

    def fn(params, x_local):
        v = cfg.vision
        y = _run_sp_blocks(
            x_local, params["visual"]["blocks"], v.heads, False,
            T_total, cfg.activation, seq_axis,
        )
        y_full = lax.all_gather(y, seq_axis, axis=1, tiled=True)
        return vision_pool(params, cfg, y_full[:, :T_total], dtype)

    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(data_axis, seq_axis) if data_axis else P(None, seq_axis),
        ),
        out_specs=dspec,
        check_rep=False,
    )

    @jax.jit
    def encode(params, pixels):
        x = vision_tokens(params, cfg, pixels, dtype)
        x = _pad_tokens(x, S)
        return mapped(params, x)

    return encode


def make_sp_text_encode(
    mesh: Mesh,
    cfg: CLIPConfig,
    dtype=jnp.float32,
    seq_axis: str = "seq",
    data_axis: str | None = None,
):
    """Jitted ``(params, tokens) -> [B, embed_dim]`` with the causal text
    block stack token-sharded over ``seq_axis``. Exact vs `encode_text`."""
    S = mesh.shape[seq_axis]
    dspec = P(data_axis) if data_axis else P()

    def fn(params, x_local, tokens):
        t = cfg.text
        T_total = cfg.text.context_length
        y = _run_sp_blocks(
            x_local, params["text"]["blocks"], t.heads, True,
            T_total, cfg.activation, seq_axis,
        )
        y_full = lax.all_gather(y, seq_axis, axis=1, tiled=True)
        return text_pool(params, cfg, y_full[:, :T_total], tokens, dtype)

    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, seq_axis) if not data_axis else P(data_axis, seq_axis),
            dspec,
        ),
        out_specs=dspec,
        check_rep=False,
    )

    @jax.jit
    def encode(params, tokens):
        x = text_tokens(params, cfg, tokens, dtype)
        x = _pad_tokens(x, S)
        return mapped(params, x, tokens)

    return encode
