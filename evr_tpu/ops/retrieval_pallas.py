"""Fused score+top-k retrieval as a Pallas TPU kernel (large-index path).

The XLA retrieval path (`ops/topk.py`) computes the full [Q, N] score
matrix, writes it to HBM, and reads it back for `lax.top_k`. At serving
index sizes that round trip is significant extra HBM traffic: for Q=32
over a 4M-row int8 index the index read is 2 GB but the score matrix adds
0.5 GB write + 0.5 GB read (+50%). This kernel streams the index through
VMEM in row tiles, computes the score tile on the MXU, and reduces it to
k candidates per tile *in VMEM* — only [n_tiles, Q, k] candidates (a few
MB) ever reach HBM. A tiny XLA `lax.top_k` over the concatenated
candidates then yields the exact global top-k: every true top-k row is by
definition in its own tile's top-k, so the two-stage reduction is exact,
not approximate.

Per-tile top-k uses k rounds of max-extraction (max → first-argmax via
iota/min → mask out), accumulated through a one-hot select so no dynamic
lane-indexed stores are needed — pure VPU reduce/select ops, no sort
network at k ≈ 10.

Dequantisation scales factor out of the dot product exactly as in the XLA
path: int8 tiles are converted to bf16 in VMEM (the HBM read stays int8 —
that is the entire bandwidth win) and scores are multiplied by the per-row
scale after the GEMM.

Validated against `cosine_topk` in interpret mode (CPU) and compiled on
TPU; wired into `FrameIndex` behind ``search_impl="pallas"`` (default
stays XLA — see PERF.md for the measured crossover).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _topk_tile_kernel(
    start_ref,
    end_ref,
    q_ref,
    idx_ref,
    scales_ref,
    vals_ref,
    rows_ref,
    *,
    k,
    tile_n,
    compute_dtype,
):
    """One grid step: score a [tile_n, D] index tile against all queries and
    emit the tile's top-k (values + global row ids)."""
    j = pl.program_id(0)
    tile = idx_ref[:].astype(compute_dtype)  # HBM read stays int8/bf16/fp32
    q = q_ref[:].astype(compute_dtype)
    scores = jax.lax.dot_general(
        q, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Q, tile_n]
    scores = scores * scales_ref[0].astype(jnp.float32)[None, :]

    qn, tn = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, tn), 1)
    grow = col + j * tile_n  # global row id of each column
    valid = (grow >= start_ref[0]) & (grow < end_ref[0])
    scores = jnp.where(valid, scores, jnp.float32(-jnp.inf))

    kcol = jax.lax.broadcasted_iota(jnp.int32, (qn, k), 1)

    def extract(i, carry):
        s, vals, rows = carry
        m = jnp.max(s, axis=-1, keepdims=True)  # [Q, 1]
        # first argmax: smallest column index attaining the max
        arg = jnp.min(jnp.where(s == m, col, jnp.int32(tn)), axis=-1)  # [Q]
        slot = kcol == i  # one-hot over the k axis — no dynamic lane store
        vals = jnp.where(slot, m, vals)
        rows = jnp.where(slot, (arg + j * tile_n)[:, None], rows)
        s = jnp.where(col == arg[:, None], jnp.float32(-jnp.inf), s)
        return s, vals, rows

    init = (
        scores,
        jnp.full((qn, k), -jnp.inf, jnp.float32),
        jnp.zeros((qn, k), jnp.int32),
    )
    _, vals, rows = jax.lax.fori_loop(0, k, extract, init)
    vals_ref[0] = vals
    rows_ref[0] = rows


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def fused_topk(
    index: jax.Array,  # [N_padded, D] fp32/bf16/int8, L2-normalised rows
    queries: jax.Array,  # [Q, D] fp32 (normalised here, like cosine_topk)
    start: jax.Array,  # scalar int32
    end: jax.Array,  # scalar int32
    k: int,
    row_scales: jax.Array | None = None,  # [N_padded] fp32 (int8 dequant)
    tile_n: int = 4096,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over [start, end): (scores [Q, k], rows [Q, k])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = index.shape
    if n % tile_n:
        raise ValueError(f"padded index rows {n} not a multiple of tile_n {tile_n}")
    n_tiles = n // tile_n
    if row_scales is None:
        row_scales = jnp.ones((n,), jnp.float32)
    # int8/bf16 indexes score in bf16 (identical operands to the XLA path,
    # fp32 accumulation); fp32 indexes stay fp32 for exact parity
    compute_dtype = jnp.float32 if index.dtype == jnp.float32 else jnp.bfloat16

    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    qn_real = q.shape[0]
    qn = _round_up(qn_real, 8)  # fp32 sublane multiple
    if qn != qn_real:
        q = jnp.pad(q, ((0, qn - qn_real), (0, 0)))

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start
            pl.BlockSpec(memory_space=pltpu.SMEM),  # end
            pl.BlockSpec((qn, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qn, k), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qn, k), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    vals, rows = pl.pallas_call(
        functools.partial(
            _topk_tile_kernel, k=k, tile_n=tile_n, compute_dtype=compute_dtype
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, qn, k), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, qn, k), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([start], jnp.int32),
        jnp.asarray([end], jnp.int32),
        q,
        index,
        row_scales.reshape(1, n),
    )

    # exact merge: every global top-k row is in its tile's local top-k
    cand_vals = vals.transpose(1, 0, 2).reshape(qn, n_tiles * k)
    cand_rows = rows.transpose(1, 0, 2).reshape(qn, n_tiles * k)
    top_vals, pos = jax.lax.top_k(cand_vals, k)
    top_rows = jnp.take_along_axis(cand_rows, pos, axis=1)
    return top_vals[:qn_real], top_rows[:qn_real]
