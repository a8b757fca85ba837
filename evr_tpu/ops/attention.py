"""Fused multi-head attention as a Pallas TPU kernel.

For CLIP's sequence lengths (vision: 50 / 197 / 577 tokens, text: 77) the
whole K/V block of one head fits comfortably in VMEM, so the kernel is a
single-pass fused attention: per (batch·head, q-block) grid cell it loads a
q tile plus the head's full K and V, computes the score tile on the MXU
(inputs stay in the model dtype — bf16 in, fp32 accumulate; an fp32 upcast
before the dot would put the MXU on its ~4-8× slower fp32 path), applies
the padding/causal mask, softmaxes in fp32, and multiplies by V — no [T, T]
intermediate ever touches HBM. (A streaming online-softmax variant only
pays off when T·d exceeds VMEM, i.e. ~8k+ tokens — not this workload.)

Kernel-economy choices, each measured on a v5e chip (PERF.md):
- head_dim stays 64 (no host-side pad to 128): Mosaic lane-pads internally,
  so padding in HBM would only double the q/k/v/o DMA traffic.
- padding mask is a precomputed additive bias row ([1, Tp], 0 or -1e30) —
  one VPU add — instead of iota+compare+select (three passes) per cell.
- the softmax denominator divides the [BQ, d] output after the p@V GEMM,
  not the [BQ, Tp] probability matrix before it.
- probabilities are cast back to the model dtype for the p@V GEMM
  (standard flash-attention practice; accumulation is still fp32).

Used by the towers when ``CLIPConfig.attn_impl`` resolves to "flash"
(via "auto" for W > 1280 towers at T ≥ 256, or explicitly); numerics are
validated against the XLA einsum path in tests/test_pallas.py (interpret
mode on CPU, compiled on TPU).

Reference behavior being reproduced: the multi-head attention inside the
pip ``clip`` towers the reference serves and fine-tunes
(`Backend/services/embedding_service.py:70-120`,
`Backend/clip_finetune_correct.py:155-185`).
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


def _attention_kernel_full(q_ref, k_ref, v_ref, o_ref, *, t_seq):
    """Whole-sequence block, non-causal: no padding; G sequences per tile.

    The block spans [G·T, d] — G whole (batch, head) sequences packed into
    one score tile (the host-side [B, H, T, d] → [B·H/G, G·T, d] regroup is
    a free contiguous reshape). At CLIP's short vision lengths (T=50) a
    single sequence fills only 50 rows/lanes of the MXU's 128-wide tiles;
    packing restores utilisation, and a block-diagonal mask (row and column
    in the same T-group) keeps the sequences independent. G=1 degenerates
    to the unmasked whole-sequence kernel. Mosaic guarantees op semantics
    on logical shapes, so nothing is host-padded — the pad/slice copies
    (3 × B·H·T·d bytes per layer) never touch HBM.
    """
    q = q_ref[0]  # [G*T, d] — model dtype; MXU accumulates fp32
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [G*T, G*T] fp32 (q pre-scaled by 1/sqrt(d))
    n = s.shape[0]
    if n != t_seq:  # G > 1: mask cross-sequence blocks
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // t_seq
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // t_seq
        s = jnp.where(row == col, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, causal, block_q):
    j = pl.program_id(1)
    q = q_ref[0]  # [BQ, d] — model dtype; MXU accumulates fp32
    k = k_ref[0]  # [Tp, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, Tp] fp32 (q was pre-scaled by 1/sqrt(d) outside the kernel)
    s = s + bias_ref[0]  # 0 on valid columns, -1e30 on T-padding

    bq, tp = s.shape
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, tp), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, tp), 0) + j * block_q
        s = jnp.where(col <= row, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, d]
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _xla_attention(q, k, v, causal):
    """Reference einsum path — also the backward for the fused kernel."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        T = q.shape[2]
        mask = jnp.tril(jnp.ones((T, T), jnp.bool_))
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,  # [B, H, T, d]
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    interpret: bool | None = None,
    block_q: int | None = None,
) -> jax.Array:
    """Fused attention over [B, H, T, d]. Returns same shape/dtype as q.

    Differentiable: the backward pass recomputes attention through the XLA
    einsum path and differentiates that (flash forward + standard backward
    — training is never slower than the pure-XLA path, and the [T, T]
    matrix still never hits HBM in the forward).
    """
    return _flash_forward_impl(q, k, v, causal, interpret, block_q)


def _flash_fwd(q, k, v, causal, interpret, block_q):
    return _flash_forward_impl(q, k, v, causal, interpret, block_q), (q, k, v)


def _flash_bwd(causal, interpret, block_q, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "interpret", "block_q"))
def _flash_forward_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    interpret: bool | None = None,
    block_q: int | None = None,
) -> jax.Array:
    B, H, T, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if not causal and block_q is None and T * T * 4 <= 4 * 1024 * 1024:
        # Whole-sequence single-block path: zero host-side padding. Pack G
        # sequences per score tile so short sequences still fill the MXU's
        # 128-wide tiles (G chosen so G·T lands in the 128–512 sweet spot
        # measured on chip; the regroup reshape below is contiguous/free).
        # Pack only when one sequence badly underfills a 128-wide tile; at
        # T ≥ 128 packing measured slower (cross-block mask + wasted MACs).
        # Cap T·G at 256 — the same packing rule measured for the fused
        # block kernels (PERF.md): beyond 256 packed rows the cross-sequence
        # mask work outweighs the tile-fill win. (This branch only runs when
        # impl='flash' is forced at short T; 'auto' routes short T to the
        # fused block kernels, which share this rule.)
        group = 1
        if T < 128:
            for g in (4, 2):
                if T * g <= 256 and (B * H) % g == 0:
                    group = g
                    break
        q = q * jnp.asarray(1.0 / math.sqrt(d), q.dtype)
        shape3 = (B * H // group, group * T, d)
        out = pl.pallas_call(
            functools.partial(_attention_kernel_full, t_seq=T),
            grid=(shape3[0],),
            in_specs=[
                pl.BlockSpec((1, group * T, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec(
                (1, group * T, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(shape3, q.dtype),
            interpret=interpret,
        )(q.reshape(shape3), k.reshape(shape3), v.reshape(shape3))
        return out.reshape(B, H, T, d)

    t_pad = _round_up(T, 128)
    if block_q is None:
        # Full-T q blocks won the on-chip sweep at every CLIP length
        # (fewer grid cells, K/V loaded once); cap at 1024 rows so the
        # fp32 score tile stays ≲5 MB of VMEM.
        block_q = t_pad if t_pad <= 1024 else 128
    block_q = min(block_q, t_pad)

    # Fold the 1/sqrt(d) scale into q once, outside the kernel (XLA fuses it
    # into the preceding reshape); keeps one VPU pass off the [BQ, Tp] tile.
    q = q * jnp.asarray(1.0 / math.sqrt(d), q.dtype)

    def prep(x):
        x = x.reshape(B * H, T, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    bias = jnp.where(
        jnp.arange(t_pad) < T, jnp.float32(0), jnp.float32(-1e30)
    ).reshape(1, 1, t_pad)
    grid = (B * H, t_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_attention_kernel, causal=causal, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias)

    return out[:, :T, :].reshape(B, H, T, d)
