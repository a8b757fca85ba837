"""In-VMEM ADC (PQ table lookup) as a Pallas TPU kernel.

The XLA formulation of the packed IVF-PQ probe (`index/ivfpq.py::
_probe_adc_search_packed`) already reformulates the per-element table
lookup as a one-hot × table contraction so the arithmetic rides the MXU
instead of the scalar unit (PERF.md §ADC: 10–12× over `jnp.take`). Its
remaining cost is *where the one-hot lives*: XLA materialises the
[C, S, K] bf16 one-hot through HBM — 54.5 MB per (query, probed list) at
the 10M-row geometry (C=1664, S=64, K=256), ~3.5 GB of pure HBM traffic
per batch(8)×nprobe(8) dispatch for an operand whose information content
is the 106 KB uint8 code block it was expanded from.

This kernel builds the one-hot **in VMEM, chunk by chunk**, so HBM only
ever sees the uint8 codes in and the [C] float scores out:

  per grid step (one probed list for one query):
    codes  [C, S]  uint8   HBM→VMEM   (106 KB)
    table  [S, K]  float32 HBM→VMEM   (64 KB, one per *query* — the
                                       index map re-reads the same block
                                       for all of a query's probes)
    for each 128-row chunk:
      oh    [128, S, K] f32  lives only in VMEM/registers
      out  += contract(oh, table)     (VPU multiply-reduce or MXU matvec)

The lookup stays EXACT: one-hot entries are exactly 0.0/1.0, tables stay
fp32, accumulation fp32 — identical values to the XLA path up to
summation order (each (c, s) term is a single exact table read).

`fused=False` (default) contracts with a VPU multiply-reduce;
`fused=True` reshapes the chunk one-hot to [128, S·K] and issues an MXU
matvec. This kernel is OPT-IN (`adc_impl="pallas"`): until an on-chip
measurement of the real Mosaic lowering is recorded in PERF.md
(§ADC-pallas), `adc_impl="auto"` stays on the XLA one-hot path —
interpret-mode CPU tests prove values, not the TPU compile.

No reference counterpart: the reference brute-forces fp32 numpy
(`Backend/services/embedding_service.py`); ANN tiers are new capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _adc_list_kernel(blocks_ref, table_ref, out_ref, *, chunk, fused):
    """One grid step: ADC-score one [C_pad, S] uint8 code block against one
    [S, K] query table → [C_pad/chunk, chunk] fp32 residual scores (the
    output rides a [n_chunks, chunk] layout so its block's trailing two
    dims cover the full array — Mosaic's tiling rule for non-(8,128)
    blocks)."""
    table = table_ref[0]  # [S, K] fp32
    _, c_pad, s = blocks_ref.shape
    k = table.shape[1]
    n_chunks = c_pad // chunk

    def body(i, _):
        rows = blocks_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.int32)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (chunk, s, k), 2)
        oh = (rows[:, :, None] == kidx).astype(jnp.float32)  # VMEM only
        if fused:
            sco = jax.lax.dot_general(
                oh.reshape(chunk, s * k),
                table.reshape(s * k, 1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, 0]
        else:
            # reduce lane axis (K) first, then sublane (S) — Mosaic
            # lowers the two 1-axis reductions where the fused (1, 2)
            # reduce SIGABRTs the TPU compiler at this shape
            sco = jnp.sum(jnp.sum(oh * table[None], axis=2), axis=1)
        out_ref[0, i, :] = sco
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(
    jax.jit, static_argnames=("nprobe", "chunk", "fused", "interpret")
)
def adc_list_scores(
    blocks: jax.Array,  # [P, C, S] uint8, P = B * nprobe probed code blocks
    tables: jax.Array,  # [B, S, K] fp32 per-query flat ADC tables
    nprobe: int,
    chunk: int = 128,
    fused: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Residual ADC scores [P, C] fp32 for each probed block against its
    owning query's table (block i belongs to query i // nprobe).

    ``interpret`` should be passed explicitly by the caller (who knows
    which backend it chose — `ivfpq.search` does); the ``None`` fallback
    re-probes the default backend at trace time, which can disagree with
    the executing backend inside an outer jit targeting a non-default
    platform."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, c, s = blocks.shape
    b, s2, k = tables.shape
    if s2 != s:
        raise ValueError(f"subspace mismatch: blocks S={s}, tables S={s2}")
    if p != b * nprobe:
        raise ValueError(f"P={p} != B={b} * nprobe={nprobe}")
    c_pad = _round_up(c, chunk)
    if c_pad != c:
        blocks = jnp.pad(blocks, ((0, 0), (0, c_pad - c), (0, 0)))

    n_chunks = c_pad // chunk
    grid_spec = pl.GridSpec(
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s, k),
                lambda i: (i // nprobe, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_chunks, chunk),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_adc_list_kernel, chunk=chunk, fused=fused),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, n_chunks, chunk), jnp.float32),
        interpret=interpret,
    )(blocks, tables.astype(jnp.float32))
    return out.reshape(p, c_pad)[:, :c]
