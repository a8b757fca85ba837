"""Distributed cosine top-k over a row-sharded frame index.

The idiomatic TPU answer to the reference's "long axis" (the frame count N,
SURVEY.md §5.7): shard the (N, D) index across the ``data`` mesh axis, run
the GEMM + local top-k on every device's shard in parallel, then all-gather
only the tiny (k) candidate lists and merge. Communication is O(Q·k·devices),
independent of N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from evr_tpu.ops.topk import merge_topk


def sharded_cosine_topk(
    mesh: Mesh,
    index: jax.Array,  # [N_padded, D] — N_padded divisible by mesh 'data' size
    queries: jax.Array,  # [Q, D]
    start: jax.Array,  # scalar int32 — first valid global row
    end: jax.Array,  # scalar int32 — one past last valid global row
    k: int,
    axis: str = "data",
    row_scales: jax.Array | None = None,  # [N_padded] dequant scales (int8)
    impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Exact global top-k over rows [start, end) of the sharded index.

    With an int8 index, ``row_scales`` shards along the same axis and the
    per-row dequantisation applies after each shard's local GEMM — identical
    math to the single-device int8 path, sharded.

    ``impl='pallas'`` runs the fused tile-streaming kernel
    (`ops/retrieval_pallas.py`) on each shard instead of GEMM+top_k — the
    same per-chip HBM-traffic win as the single-device kernel, with the
    identical O(Q·k·devices) all-gather merge on top. Falls back to XLA
    when the per-shard row count doesn't tile."""
    n_shards = mesh.shape[axis]
    n_padded = index.shape[0]
    rows_per_shard = n_padded // n_shards

    if impl == "pallas":
        tile_n = next(
            (c for c in (8192, 4096, 2048, 1024, 512, 256) if rows_per_shard % c == 0),
            0,
        )
        if tile_n:
            from evr_tpu.ops.retrieval_pallas import fused_topk

            def local_fused(idx_shard, scales_shard, q, start_, end_):
                shard_id = jax.lax.axis_index(axis)
                row0 = shard_id * rows_per_shard
                # global [start, end) clipped into this shard's local rows
                lo = jnp.clip(start_ - row0, 0, rows_per_shard)
                hi = jnp.clip(end_ - row0, 0, rows_per_shard)
                scores, local_rows = fused_topk(
                    idx_shard, q, lo, hi, k,
                    row_scales=scales_shard, tile_n=tile_n,
                )
                all_scores = jax.lax.all_gather(scores, axis)
                all_idx = jax.lax.all_gather(local_rows + row0, axis)
                return merge_topk(all_scores, all_idx, k)

            scales = (
                row_scales
                if row_scales is not None
                else jnp.ones((n_padded,), jnp.float32)
            )
            fn = shard_map(
                local_fused,
                mesh=mesh,
                in_specs=(P(axis, None), P(axis), P(), P(), P()),
                out_specs=(P(), P()),
                check_rep=False,
            )
            return fn(index, scales, queries, start, end)
        # fall through to the XLA path when shards don't tile

    def local_topk(sims, row0):
        scores, local_idx = jax.lax.top_k(sims, k)  # [Q, k]
        global_idx = local_idx + row0
        all_scores = jax.lax.all_gather(scores, axis)
        all_idx = jax.lax.all_gather(global_idx, axis)
        return merge_topk(all_scores, all_idx, k)

    def prep(idx_shard, q, start_, end_):
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * rows_per_shard
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        local_rows = row0 + jnp.arange(rows_per_shard)
        valid = (local_rows[None, :] >= start_) & (local_rows[None, :] < end_)
        return row0, qn, valid

    if row_scales is None:

        def local_search(idx_shard, q, start_, end_):
            row0, qn, valid = prep(idx_shard, q, start_, end_)
            sims = jnp.dot(
                qn.astype(idx_shard.dtype), idx_shard.T,
                preferred_element_type=jnp.float32,
            )
            return local_topk(jnp.where(valid, sims, -jnp.inf), row0)

        fn = shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return fn(index, queries, start, end)

    def local_search_q(idx_shard, scales_shard, q, start_, end_):
        row0, qn, valid = prep(idx_shard, q, start_, end_)
        sims = jnp.dot(
            qn.astype(jnp.bfloat16),
            idx_shard.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        sims = sims * scales_shard[None, :]
        return local_topk(jnp.where(valid, sims, -jnp.inf), row0)

    fn = shard_map(
        local_search_q,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(index, row_scales, queries, start, end)
