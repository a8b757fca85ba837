"""Mesh-sharded IVF and IVF-PQ — the ANN tiers scaled across the data axis.

`parallel/sharded_search.py` shards the EXACT GEMM top-k; this module
gives the approximate inverted-file tier (`index/ivf.py`) and the
compressed memory tier (`index/ivfpq.py`, `ShardedIVFPQIndex` below) the
same scale-out story, because the 100M+-row corpora the ANN tiers exist
for are precisely the ones that outgrow one chip's HBM:

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


def _balanced_ranges(n: int, s: int) -> list[tuple[int, int]]:
    """Contiguous [start, end) row ranges, sizes differing by at most 1 and
    never empty (requires n >= s) — uneven corpora must not leave a shard
    with zero rows, and global ids come from per-shard OFFSETS rather than
    a uniform stride."""
    if n < s:
        raise ValueError(f"N={n} rows cannot shard over {s} devices")
    base, extra = divmod(n, s)
    out, start = [], 0
    for i in range(s):
        end = start + base + (1 if i < extra else 0)
        out.append((start, end))
        start = end
    return out


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
    static_argnames=("mesh", "axis", "top_k", "nprobe"),
)
def _sharded_probe(
    q, emb_s, cents_s, lists_s, overflow_s, offs_s,
    mesh: Mesh, axis: str, top_k: int, nprobe: int,
):
    def local(qb, emb, cents, lists, overflow, offs):
        scores, rows = _local_probe(
            qb, emb[0], cents[0], lists[0], overflow[0], top_k, nprobe
        )
        rows = jnp.where(rows >= 0, rows + offs[0], -1)
        all_scores = jax.lax.all_gather(scores, axis)   # [S, B, k]
        all_rows = jax.lax.all_gather(rows, axis)
        return merge_topk(all_scores, all_rows, top_k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(axis, None, None), P(axis, None, None),
            P(axis, None, None), P(axis, None), P(axis),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(q, emb_s, cents_s, lists_s, overflow_s, offs_s)


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
        self.offs_s = None  # [S] int32 global row offset per shard
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
        ranges = _balanced_ranges(n, s)
        r = max(e - b for b, e in ranges)
        if n_clusters > min(e - b for b, e in ranges):
            raise ValueError(
                f"n_clusters={n_clusters} exceeds the smallest shard's "
                f"row count (N={n} over {s} shards)"
            )
        subs = [
            IVFIndex().build(
                emb[b:e],
                n_clusters,
                capacity_factor=capacity_factor,
                iters=iters,
                seed=seed + i,  # independent k-means per shard
                dtype=dtype,
                spill_choices=spill_choices,
            )
            for i, (b, e) in enumerate(ranges)
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
        self.offs_s = put(
            np.asarray([b for b, _ in ranges], np.int32), P(self.axis)
        )
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
            self.offs_s, self.mesh, self.axis, top_k, nprobe,
        )
        scores = np.asarray(scores)
        rows = np.where(np.isfinite(scores), np.asarray(rows), -1)
        return scores, rows


# ---------------------------------------------------------------------------
# Mesh-sharded IVF-PQ — the MEMORY tier scaled across the data axis.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "top_k", "nprobe", "capacity", "merge_k",
                     "adc_impl"),
)
def _sharded_adc_probe(
    q, rot_s, cents_s, books_s, codes_s, ids_s, pool_recon_s, pool_ids_s,
    offs_s, mesh: Mesh, axis: str, top_k: int, nprobe: int, capacity: int,
    merge_k: int | None = None, adc_impl: str = "xla",
):
    """One shard_map dispatch over the stacked IVF-PQ operands: each device
    runs the standard packed probe+ADC (`IVFPQIndex._probe_adc_search_packed`,
    adc_impl="xla") on ITS shard — per-shard OPQ rotation applied to the
    query locally, since every shard trains its own quantizers — then the
    tiny [B, k] winners `all_gather` and merge. Communication is
    O(B·k·devices), independent of N, nprobe and S.

    ``top_k`` is the PER-SHARD fetch; ``merge_k`` (≤ S·top_k, defaults to
    top_k) is the merged output width — separating them lets a rerank
    depth deeper than one shard's rows draw candidates from every shard
    instead of being silently clamped to ``rows_per_shard``."""
    from evr_tpu.index.ivfpq import IVFPQIndex

    merge_k = top_k if merge_k is None else merge_k

    def local(qb, rot, cents, books, codes, ids, pre, pid, offs):
        q_adc = qb @ rot[0]
        scores, rows = IVFPQIndex._probe_adc_search_packed(
            qb, q_adc, cents[0], books[0], codes[0], ids[0], pre[0], pid[0],
            top_k, nprobe, capacity, adc_impl,
            interpret=jax.default_backend() != "tpu", paired=False,
        )
        rows = jnp.where(rows >= 0, rows + offs[0], -1)
        all_scores = jax.lax.all_gather(scores, axis)       # [S, B, k]
        all_rows = jax.lax.all_gather(rows, axis)
        return merge_topk(all_scores, all_rows, merge_k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(axis, None, None), P(axis, None, None),
            P(axis, None, None, None), P(axis, None, None), P(axis, None),
            P(axis, None, None), P(axis, None), P(axis),
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(q, rot_s, cents_s, books_s, codes_s, ids_s, pool_recon_s,
              pool_ids_s, offs_s)


class ShardedIVFPQIndex:
    """Row-sharded IVF-PQ over a mesh's ``axis`` — `index/ivfpq.IVFPQIndex`'s
    search surface (``search(q, top_k, nprobe, rerank=)``), built
    shard-by-shard, probed in one shard_map dispatch.

    The corpus splits into contiguous row ranges, one per device; each
    shard trains its OWN coarse k-means, residual PQ codebooks and
    (optional) OPQ rotation over its rows (build is embarrassingly
    parallel), stores packed uint8 codes, and is probed locally; the
    merged candidates carry GLOBAL row ids. ADC scores are approximate by
    construction, so exactness gates compose probing with the host re-rank:
    ``nprobe = n_clusters`` + ``rerank`` ≥ candidate depth reproduces the
    exact global top-k (tested). Rerank sources exact rows either from the
    fp32 originals kept at build (serving-tier default, mirroring
    `IVFPQIndex.build(keep_originals=True)`) or from an
    ``attach_host_store`` int8 row store (the 100M-tier two-tier shape).

    Reference counterpart: none — the reference imports faiss and never
    calls it (`Backend/app.py:21`). Sharded ANN is new TPU-native
    capability (SURVEY.md §2.5, §5.7)."""

    def __init__(self, mesh: Mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.rot_s = None       # [S, D, D] fp32 (identity when no OPQ)
        self.cents_s = None     # [S, k, D] fp32
        self.books_s = None     # [S, sub, K, d] fp32
        self.codes_s = None     # [S, k*C, sub] uint8
        self.ids_s = None       # [S, k*C] int32 LOCAL rows, −1 padded
        self.pool_recon_s = None  # [S, O, D] fp32, zero-padded
        self.pool_ids_s = None    # [S, O] int32 LOCAL rows, −1 padded
        self.offs_s = None        # [S] int32 global row offset per shard
        self._originals = None    # [N, D] HOST fp32 (rerank source)
        self._originals_int8 = None
        self._originals_int8_scales = None
        self._n_rows = 0
        self._rows_per_shard = 0
        self._n_clusters = 0
        self._capacity = 0

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
        n_subspaces: int = 64,
        n_centroids: int = 256,
        capacity_factor: float = 1.5,
        coarse_iters: int = 6,
        pq_iters: int = 6,
        opq_iters: int = 0,
        seed: int = 0,
        keep_originals: bool = True,
        spill_choices: int = 4,
    ) -> "ShardedIVFPQIndex":
        from evr_tpu.index.ivfpq import IVFPQIndex

        emb = np.asarray(emb, np.float32)
        n, d = emb.shape
        s = self.n_shards
        ranges = _balanced_ranges(n, s)
        r = max(e - b for b, e in ranges)
        smallest = min(e - b for b, e in ranges)
        if n_clusters > smallest:
            raise ValueError(
                f"n_clusters={n_clusters} exceeds the smallest shard's "
                f"row count (N={n} over {s} shards)"
            )
        sub = next(
            ss for ss in (n_subspaces, 64, 32, 16, 8, 4, 2, 1)
            if d % ss == 0
        )
        subs = [
            IVFPQIndex().build_device(
                jnp.asarray(emb[b:e]),
                n_clusters,
                n_subspaces=sub,
                n_centroids=min(n_centroids, smallest),
                capacity_factor=capacity_factor,
                coarse_iters=coarse_iters,
                pq_iters=pq_iters,
                seed=seed + i,  # independent quantizers per shard
                spill_choices=spill_choices,
                opq_iters=opq_iters,
            )
            for i, (b, e) in enumerate(ranges)
        ]
        cap = max(x._capacity for x in subs)
        omax = max(max(int(x.overflow.shape[0]) for x in subs), 1)
        kk = int(np.asarray(subs[0].codebooks).shape[1])
        ds = d // sub
        rot_s = np.zeros((s, d, d), np.float32)
        cents_s = np.zeros((s, n_clusters, d), np.float32)
        books_s = np.zeros((s, sub, kk, ds), np.float32)
        codes_s = np.zeros((s, n_clusters * cap, sub), np.uint8)
        ids_s = np.full((s, n_clusters * cap), -1, np.int32)
        pool_recon_s = np.zeros((s, omax, d), np.float32)
        pool_ids_s = np.full((s, omax), -1, np.int32)
        for i, x in enumerate(subs):
            rot_s[i] = (
                np.eye(d, dtype=np.float32)
                if x.rotation is None
                else np.asarray(x.rotation, np.float32)
            )
            cents_s[i] = np.asarray(x.centroids)
            books_s[i] = np.asarray(x.codebooks)
            # packed [k*C_i, S] (paired variants share row-major bytes)
            ci = x._capacity
            codes = np.asarray(x.codes_lists).reshape(-1, sub)
            ids = np.asarray(x.id_lists)
            codes_s[i].reshape(n_clusters, cap, sub)[:, :ci] = codes.reshape(
                n_clusters, ci, sub
            )
            ids_s[i].reshape(n_clusters, cap)[:, :ci] = ids.reshape(
                n_clusters, ci
            )
            o = int(x.overflow.shape[0])
            if o:
                pool_recon_s[i, :o] = np.asarray(
                    x._pool_recon(), np.float32
                )
                pool_ids_s[i, :o] = np.asarray(x.overflow)

        put = lambda a, spec: jax.device_put(  # noqa: E731
            a, NamedSharding(self.mesh, spec)
        )
        self.rot_s = put(rot_s, P(self.axis, None, None))
        self.cents_s = put(cents_s, P(self.axis, None, None))
        self.books_s = put(books_s, P(self.axis, None, None, None))
        self.codes_s = put(codes_s, P(self.axis, None, None))
        self.ids_s = put(ids_s, P(self.axis, None))
        self.pool_recon_s = put(pool_recon_s, P(self.axis, None, None))
        self.pool_ids_s = put(pool_ids_s, P(self.axis, None))
        self.offs_s = put(
            np.asarray([b for b, _ in ranges], np.int32), P(self.axis)
        )
        self._originals = emb if keep_originals else None
        self._n_rows = n
        self._rows_per_shard = r
        self._n_clusters = n_clusters
        self._capacity = cap
        return self

    def attach_host_store(self, rows_int8, scales) -> None:
        """Two-tier serving shape at scale: int8 rows + per-row scales in
        host DRAM replace the fp32 originals as the exact re-rank source."""
        rows_int8 = np.asarray(rows_int8, np.int8)
        scales = np.asarray(scales, np.float32)
        if rows_int8.shape[0] != self._n_rows:
            raise ValueError(
                f"host store rows {rows_int8.shape[0]} != corpus "
                f"{self._n_rows}"
            )
        self._originals_int8 = rows_int8
        self._originals_int8_scales = scales

    _pallas_broken = False  # per-instance demotion on Mosaic failure

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        nprobe: int,
        rerank: int | None = None,
        adc_impl: str = "auto",
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], GLOBAL row ids [B, k]); −1 rows are unreachable
        slots (scores −inf). Without ``rerank`` scores are the per-shard
        ADC approximation; with it, candidates are re-scored from the
        rerank source: exact cosines when the fp32 originals were kept at
        build, int8-dequantized approximations (near-tie tolerant) when the
        source is an ``attach_host_store`` store. The per-shard fetch is
        clamped to one shard's rows, but the merged candidate pool spans
        all shards — a ``rerank`` depth up to ``n_shards × rows_per_shard``
        (i.e. the whole corpus under a full probe) is honoured, so
        ``nprobe = n_clusters`` + deep rerank reproduces the exact global
        top-k."""
        if self.codes_s is None:
            raise ValueError("ShardedIVFPQIndex.search before build()")
        if rerank is not None and (
            self._originals is None and self._originals_int8 is None
        ):
            raise ValueError(
                "rerank requires keep_originals=True at build or an "
                "attach_host_store() int8 row store"
            )
        nprobe = max(1, min(nprobe, self._n_clusters))
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        width = self._capacity * nprobe + self.pool_ids_s.shape[1]
        requested = top_k if rerank is None else max(top_k, rerank)
        fetch = max(1, min(requested, width, self._rows_per_shard))
        # merged width: candidates come from EVERY shard's fetch, so a
        # requested depth deeper than one shard's rows is still honoured
        # (ADVICE r4: clamping the merge to rows_per_shard silently
        # truncated deep reranks and broke the exactness contract).
        merge_k = max(1, min(requested, self.n_shards * fetch, self._n_rows))
        if adc_impl == "auto":
            # same policy as IVFPQIndex.search: xla by real-index
            # measurement (PERF.md §ADC round-5 decision record); pallas
            # stays opt-in with the per-instance Mosaic-failure demotion
            adc_impl = "xla"
        probe_args = (
            q, self.rot_s, self.cents_s, self.books_s, self.codes_s,
            self.ids_s, self.pool_recon_s, self.pool_ids_s, self.offs_s,
            self.mesh, self.axis, fetch, nprobe, self._capacity,
        )
        try:
            scores, rows = _sharded_adc_probe(
                *probe_args, merge_k=merge_k, adc_impl=adc_impl
            )
        except Exception:
            if adc_impl != "pallas":
                raise
            self._pallas_broken = True
            from evr_tpu.utils import get_logger

            get_logger("evr_tpu.parallel").warning(
                "sharded adc_impl=pallas failed to compile; falling back "
                "to xla for this index"
            )
            scores, rows = _sharded_adc_probe(
                *probe_args, merge_k=merge_k, adc_impl="xla"
            )
        scores, rows = np.asarray(scores), np.asarray(rows)
        rows = np.where(np.isfinite(scores), rows, -1)
        if rerank is None:
            k = min(top_k, scores.shape[1])
            return scores[:, :k], rows[:, :k]
        qn = np.asarray(q)
        safe = np.where(rows >= 0, rows, 0)
        if self._originals is not None:
            cand = self._originals[safe]                     # [B, R, D]
        else:
            cand = self._originals_int8[safe].astype(np.float32)
            cand *= self._originals_int8_scales[safe][:, :, None]
        exact = np.einsum("bd,brd->br", qn, cand).astype(np.float32)
        exact = np.where(rows >= 0, exact, -np.inf)
        k = min(top_k, exact.shape[1])
        order = np.argsort(-exact, axis=1)[:, :k]
        out_rows = np.take_along_axis(rows, order, axis=1)
        out_scores = np.take_along_axis(exact, order, axis=1)
        return out_scores, np.where(np.isfinite(out_scores), out_rows, -1)
