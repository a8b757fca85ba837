"""Mesh-sharded IVF — the ANN tier scaled across the data axis.

`parallel/sharded_search.py` shards the EXACT GEMM top-k; this module
gives the approximate inverted-file tier (`index/ivf.py`) the same
scale-out story, because the 100M+-row corpora the ANN tiers exist for are
precisely the ones that outgrow one chip's HBM:

* **Row-sharded sub-indexes.** The corpus splits into contiguous
  row ranges, one per device; each shard trains its OWN k-means and
  inverted lists over its rows (no cross-device traffic during build —
  list placement is embarrassingly parallel, and per-shard centroids adapt
  to per-shard data). Every row still lives in exactly one (list | pool)
  slot of exactly one shard, so nothing is ever dropped: ``nprobe =
  n_clusters`` reproduces the exact global top-k bit-for-bit (tested).
* **One shard_map probe.** All shards' operands stack on a leading
  device axis (lists/overflows padded to the max shard with −1 ids, which
  the probe masks to −inf). A query batch broadcasts to every device; each
  runs the standard probe (centroid GEMM → `lax.top_k` probe pick →
  candidate gather → scoring GEMM) on ITS shard, then the tiny [B, k]
  per-shard winners `all_gather` and merge (`ops/topk.merge_topk`) — the
  same O(B·k·devices) communication bound as the sharded exact path,
  independent of N and of nprobe.

Reference counterpart: none — the reference imports faiss and never calls
it (`Backend/app.py:21`), serving dense numpy on one host. Sharded ANN is
new TPU-native capability (SURVEY.md §2.5, §5.7).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evr_tpu.index.ivf import IVFIndex
from evr_tpu.ops.topk import merge_topk


def _local_probe(q, emb, cents, list_rows, overflow, top_k: int, nprobe: int):
    """One shard's probe (same semantics as `IVFIndex._probe_search`) with
    −1-padded overflow masked — padding exists only in the stacked sharded
    layout. Returns ([B, top_k] scores, [B, top_k] LOCAL rows, −1 = none)."""
    b = q.shape[0]
    cscores = q @ cents.T                               # [B, k]
    _, cids = jax.lax.top_k(cscores, nprobe)            # [B, nprobe]
    cand = list_rows[cids].reshape(b, -1)               # [B, nprobe*C]
    valid = cand >= 0
    gathered = emb[jnp.where(valid, cand, 0)]           # [B, M, D]
    scores = jnp.einsum(
        "bd,bmd->bm", q.astype(emb.dtype), gathered,
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(valid, scores, -jnp.inf)
    if overflow.shape[0]:
        ovf_valid = overflow >= 0
        ovf_scores = jnp.einsum(
            "bd,od->bo", q.astype(emb.dtype),
            emb[jnp.where(ovf_valid, overflow, 0)],
            preferred_element_type=jnp.float32,
        )
        ovf_scores = jnp.where(ovf_valid[None, :], ovf_scores, -jnp.inf)
        scores = jnp.concatenate([scores, ovf_scores], axis=1)
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(overflow, (b, overflow.shape[0]))],
            axis=1,
        )
    top_scores, top_pos = jax.lax.top_k(scores, top_k)
    return top_scores, jnp.take_along_axis(cand, top_pos, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "top_k", "nprobe", "rows_per_shard"),
)
def _sharded_probe(
    q, emb_s, cents_s, lists_s, overflow_s,
    mesh: Mesh, axis: str, top_k: int, nprobe: int, rows_per_shard: int,
):
    def local(qb, emb, cents, lists, overflow):
        shard_id = jax.lax.axis_index(axis)
        scores, rows = _local_probe(
            qb, emb[0], cents[0], lists[0], overflow[0], top_k, nprobe
        )
        rows = jnp.where(rows >= 0, rows + shard_id * rows_per_shard, -1)
        all_scores = jax.lax.all_gather(scores, axis)   # [S, B, k]
        all_rows = jax.lax.all_gather(rows, axis)
        return merge_topk(all_scores, all_rows, top_k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(axis, None, None), P(axis, None, None),
            P(axis, None, None), P(axis, None),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(q, emb_s, cents_s, lists_s, overflow_s)


class ShardedIVFIndex:
    """Row-sharded IVF over a mesh's ``axis`` — `IVFIndex`'s search surface
    (``search(q, top_k, nprobe)``), built shard-by-shard, probed in one
    shard_map dispatch."""

    def __init__(self, mesh: Mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.emb_s = None  # [S, R, D]
        self.cents_s = None  # [S, k, D]
        self.lists_s = None  # [S, k, C]
        self.overflow_s = None  # [S, O]
        self._n_rows = 0
        self._rows_per_shard = 0
        self._n_clusters = 0

    @property
    def n_rows(self) -> int:
        return self._n_rows

    @property
    def n_clusters(self) -> int:
        return self._n_clusters

    def build(
        self,
        emb: np.ndarray,
        n_clusters: int,
        capacity_factor: float = 1.5,
        iters: int = 10,
        seed: int = 0,
        dtype: str = "float32",
        spill_choices: int = 4,
    ) -> "ShardedIVFIndex":
        emb = np.asarray(emb, np.float32)
        n, d = emb.shape
        s = self.n_shards
        r = math.ceil(n / s)
        if n_clusters > min(r, n - (s - 1) * r if n > (s - 1) * r else r):
            raise ValueError(
                f"n_clusters={n_clusters} exceeds the smallest shard's "
                f"row count (N={n} over {s} shards)"
            )
        subs = [
            IVFIndex().build(
                emb[i * r : min((i + 1) * r, n)],
                n_clusters,
                capacity_factor=capacity_factor,
                iters=iters,
                seed=seed + i,  # independent k-means per shard
                dtype=dtype,
                spill_choices=spill_choices,
            )
            for i in range(s)
        ]
        cap = max(int(sub.list_rows.shape[1]) for sub in subs)
        ovf = max((int(sub.overflow.shape[0]) for sub in subs), default=0)
        emb_s = np.zeros((s, r, d), np.float32)
        lists_s = np.full((s, n_clusters, cap), -1, np.int32)
        overflow_s = np.full((s, max(ovf, 1)), -1, np.int32)
        cents_s = np.zeros((s, n_clusters, d), np.float32)
        for i, sub in enumerate(subs):
            rows = np.asarray(sub.emb, np.float32)
            emb_s[i, : rows.shape[0]] = rows
            cents_s[i] = np.asarray(sub.centroids)
            li = np.asarray(sub.list_rows)
            lists_s[i, :, : li.shape[1]] = li
            ov = np.asarray(sub.overflow)
            overflow_s[i, : ov.shape[0]] = ov

        # device placement: each shard's operands live on its device
        put = lambda a, spec: jax.device_put(  # noqa: E731
            a, NamedSharding(self.mesh, spec)
        )
        store_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.emb_s = put(emb_s.astype(store_dtype), P(self.axis, None, None))
        self.cents_s = put(cents_s, P(self.axis, None, None))
        self.lists_s = put(lists_s, P(self.axis, None, None))
        self.overflow_s = put(overflow_s, P(self.axis, None))
        self._n_rows = n
        self._rows_per_shard = r
        self._n_clusters = n_clusters
        return self

    def search(
        self, queries: np.ndarray, top_k: int, nprobe: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], GLOBAL row ids [B, k]); −1 rows are unreachable
        slots (scores −inf)."""
        if self.emb_s is None:
            raise ValueError("ShardedIVFIndex.search before build()")
        nprobe = max(1, min(nprobe, self._n_clusters))
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        cap_total = (
            self.lists_s.shape[2] * nprobe + self.overflow_s.shape[1]
        )
        top_k = max(1, min(top_k, cap_total, self._n_rows))
        scores, rows = _sharded_probe(
            q, self.emb_s, self.cents_s, self.lists_s, self.overflow_s,
            self.mesh, self.axis, top_k, nprobe, self._rows_per_shard,
        )
        scores = np.asarray(scores)
        rows = np.where(np.isfinite(scores), np.asarray(rows), -1)
        return scores, rows
