"""Fused multi-head attention as a Pallas TPU kernel.

For CLIP's sequence lengths (vision: 50 / 197 / 577 tokens, text: 77) the
whole K/V block of one head fits comfortably in VMEM, so the kernel is a
single-pass fused attention: per (batch·head, q-block) grid cell it loads a
q tile plus the head's full K and V, computes the score tile in fp32 on the
MXU, applies causal/padding masks, softmaxes in fp32, and multiplies by V —
no [T, T] intermediate ever touches HBM. (A streaming online-softmax variant
only pays off when T·d exceeds VMEM, i.e. ~8k+ tokens — not this workload.)

Used by the towers when ``CLIPConfig.attn_impl == "flash"``; numerics are
validated against the XLA einsum path in tests/test_pallas.py (interpret
mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, t_real, block_q):
    j = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # [BQ, d]
    k = k_ref[0].astype(jnp.float32)  # [Tp, d]
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, Tp]
    s = s * scale

    bq, tp = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, tp), 1)
    mask = col < t_real
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, tp), 0) + j * block_q
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def flash_attention(
    q: jax.Array,  # [B, H, T, d]
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused attention over [B, H, T, d]. Returns same shape/dtype as q."""
    B, H, T, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / math.sqrt(d)

    t_pad = _round_up(T, 128)
    block_q = min(128, t_pad)
    d_pad = _round_up(d, 128)

    def prep(x):
        x = x.reshape(B * H, T, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, d_pad - d)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    grid = (B * H, t_pad // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attention_kernel,
            scale=scale,
            causal=causal,
            t_real=T,
            block_q=block_q,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    return out[:, :T, :d].reshape(B, H, T, d)
