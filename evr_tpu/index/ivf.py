"""IVF approximate-NN index — the 10M+-frame scaling tier.

The exact path (`FrameIndex.search_raw` / `index/fused_search.py`) is one
[B,D]×[D,N] GEMM over every row; at ~2 ms per 1M rows it is the right
default for the corpus sizes the reference serves
(`Backend/services/embedding_service.py` brute-forces numpy the same way).
Past ~10M rows the GEMM term dominates, so this module adds the classic
inverted-file two-stage search, designed TPU-first:

- **Static shapes everywhere.** Inverted lists are stored as a dense
  [n_clusters, capacity] row-id matrix (−1 padding); rows that overflow a
  full list go to a small *overflow pool* that every query searches
  exactly. Every row lives in exactly one place, so nprobe = n_clusters
  reproduces brute force bit-for-bit (tested) and recall degrades
  gracefully, never silently dropping rows.
- **One jitted dispatch per query batch**: centroid GEMM → `lax.top_k`
  probe selection → fancy-index gather of candidate rows → candidate GEMM
  (+ overflow GEMM) → merged top-k. No host round trips between stages.
- **Device k-means** (`kmeans`): Lloyd's iterations under `lax.scan` —
  assignment is an argmax GEMM (MXU), the update is one `segment_sum`;
  empty clusters keep their previous centroid. Spherical variant:
  centroids are re-normalised each step, matching the cosine metric the
  CLIP embeddings use.

Compute saved at N=10M, k=4096, capacity≈1.5·N/k, nprobe=64: the candidate
set is ~2% of the corpus → ~40× less GEMM work per query, at the recall
the nprobe knob buys (see tests/test_ivf.py for the measured curve on
clustered data).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def fill_inverted_lists(
    assign: np.ndarray,
    lists: np.ndarray,
    overflow: list,
    start_row: int = 0,
) -> None:
    """Place rows into their assigned list's next free slot, spilling
    beyond-capacity rows to the overflow pool — the single implementation
    of the list-placement contract (corpus-order fill, -1 padding as a
    prefix-free suffix) shared by IVF/IVF-PQ build AND append. Mutates
    ``lists`` and ``overflow`` in place."""
    assign = np.asarray(assign, np.int64).reshape(-1, 1)
    fill_inverted_lists_multi(assign, lists, overflow, start_row=start_row)


def fill_inverted_lists_multi(
    assign_topm: np.ndarray,
    lists: np.ndarray,
    overflow: list,
    start_row: int = 0,
) -> np.ndarray:
    """Multi-choice list placement: round m places each still-unplaced row
    into its m-th-nearest centroid's list if a slot is free; only rows
    whose EVERY ranked choice is full reach the overflow pool. Measured at
    N=10M, k=8192, cf=1.5 the single-choice fill left 1,488,661 rows
    (14.9%) in the pool — every query then paid a [B,D]×[D,1.49M] GEMM and
    a ~1.5M-column top-k that dwarfed the probed lists; 4 choices collapse
    the pool to ~0 and the every-row-lives-exactly-once invariant (hence
    the nprobe=k ≡ brute-force ceiling) is untouched. IVF scoring is
    placement-independent (lists hold row ids, scores are q·x); IVF-PQ
    encodes residuals against the STORED list's centroid so the
    q·c + q·r̃ decomposition stays coherent for spilled rows.

    Vectorised per round (stable cluster sort + within-group rank), so the
    10M-row build does ~M numpy argsorts instead of a 10M-step Python loop.
    Corpus-order priority within each round matches the legacy loop.
    Mutates ``lists``/``overflow``; returns placement [N] int64 — the list
    each row landed in, −1 for overflow."""
    assign_topm = np.asarray(assign_topm, np.int64)
    n, _m = assign_topm.shape
    capacity = lists.shape[1]
    fill = (lists >= 0).sum(axis=1).astype(np.int64)
    placement = np.full(n, -1, np.int64)
    unplaced = np.arange(n, dtype=np.int64)
    for m in range(_m):
        if unplaced.size == 0:
            break
        choice = assign_topm[unplaced, m]
        order = np.argsort(choice, kind="stable")
        sc = choice[order]
        new_grp = np.empty(sc.size, bool)
        new_grp[0] = True
        new_grp[1:] = sc[1:] != sc[:-1]
        starts = np.flatnonzero(new_grp)
        rank = np.arange(sc.size) - starts[np.cumsum(new_grp) - 1]
        slot = fill[sc] + rank
        ok = slot < capacity
        rows_global = unplaced[order]
        lists[sc[ok], slot[ok]] = (start_row + rows_global[ok]).astype(
            lists.dtype
        )
        placement[rows_global[ok]] = sc[ok]
        np.add.at(fill, sc[ok], 1)
        unplaced = np.sort(rows_global[~ok])
    overflow.extend((start_row + unplaced).tolist())
    return placement


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans(key, x, n_clusters: int, iters: int = 10):
    """Spherical k-means on device. ``x`` [N, D] should be L2-normalised.

    Returns (centroids [k, D] L2-normalised, assignments [N] int32).
    """
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    init = x[init_idx]

    def step(cents, _):
        assign = jnp.argmax(x @ cents.T, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), x.dtype), assign, num_segments=n_clusters
        )
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        fresh = sums / jnp.maximum(norms, 1e-12)
        # empty cluster → keep previous centroid
        cents = jnp.where(counts[:, None] > 0, fresh, cents)
        return cents, None

    cents, _ = jax.lax.scan(step, init, None, length=iters)
    assign = jnp.argmax(x @ cents.T, axis=1).astype(jnp.int32)
    return cents, assign


class IVFIndex:
    """Inverted-file cosine top-k over a fixed embedding matrix.

    ``build`` once over L2-normalised embeddings; ``search`` is a single
    jitted dispatch. The index holds: the original [N, D] matrix (candidate
    gathers index into it — lists store row ids, not copies), [k, D]
    centroids, the dense [k, C] list matrix, and the overflow row pool.
    """

    def __init__(self):
        self.emb = None           # [N, D] device (fp32 / bf16 / int8)
        self.row_scales = None    # [N] fp32 device — int8 storage only
        self.centroids = None     # [k, D] device
        self.list_rows = None     # [k, C] int32 device, -1 padded
        self.overflow = None      # [O] int32 device (may be size 0)
        # packed layout (build_device default — see _pack_device): list i's
        # rows live CONTIGUOUSLY at flat rows [i*C, (i+1)*C)
        self.emb_lists = None     # [k*C, D] device
        self.scale_lists = None   # [k*C] fp32 — int8 storage only
        self.id_lists = None      # [k*C] int32 corpus row ids, -1 padded
        self.overflow_emb = None  # [O, D] device
        self.overflow_scales = None  # [O] fp32 — int8 storage only
        self._n_rows = 0

    @property
    def packed(self) -> bool:
        return self.emb_lists is not None

    @property
    def n_rows(self) -> int:
        if self.packed:
            return self._n_rows
        return 0 if self.emb is None else int(self.emb.shape[0])

    @property
    def n_clusters(self) -> int:
        return 0 if self.centroids is None else int(self.centroids.shape[0])

    @property
    def _capacity(self) -> int:
        if self.packed:
            return int(self.emb_lists.shape[0]) // self.n_clusters
        return int(self.list_rows.shape[1])

    @property
    def _overflow_size(self) -> int:
        return 0 if self.overflow is None else int(self.overflow.shape[0])

    def build(
        self,
        emb: np.ndarray,
        n_clusters: int,
        capacity_factor: float = 1.5,
        iters: int = 10,
        seed: int = 0,
        dtype: str = "float32",
        spill_choices: int = 4,
    ) -> "IVFIndex":
        """``dtype``: storage dtype for the resident [N, D] matrix —
        'float32' (exact) or 'bfloat16' (2× less HBM; candidate scores
        still accumulate fp32). k-means always runs fp32.
        ``spill_choices``: rows whose list is full try their next-nearest
        centroids before the overflow pool (see
        `fill_inverted_lists_multi`); 1 reproduces single-choice fill."""
        if dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported IVF storage dtype {dtype!r}")
        emb = np.asarray(emb, np.float32)
        n, _ = emb.shape
        if n_clusters < 1 or n_clusters > n:
            raise ValueError(f"n_clusters={n_clusters} must be in [1, {n}]")
        x = jnp.asarray(emb)
        cents, assign = kmeans(
            jax.random.PRNGKey(seed), x, n_clusters, iters=iters
        )
        m = max(1, min(spill_choices, n_clusters))
        if m > 1:
            _, topm = jax.lax.top_k(x @ cents.T, m)
            topm = np.asarray(topm)
        else:
            topm = np.asarray(assign).reshape(-1, 1)

        capacity = max(1, int(np.ceil(n / n_clusters * capacity_factor)))
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        # rows fill in corpus order; full-list rows try their next-ranked
        # centroids, then the always-searched overflow pool — nothing is
        # ever dropped
        fill_inverted_lists_multi(topm, lists, overflow)

        self.emb = x.astype(jnp.bfloat16) if dtype == "bfloat16" else x
        self.centroids = cents
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        return self

    def build_device(
        self,
        x_dev,
        n_clusters: int,
        capacity_factor: float = 1.5,
        iters: int = 10,
        seed: int = 0,
        train_rows: int = 524_288,
        slab_rows: int = 1_000_000,
        dtype: str = "bfloat16",
        row_scales=None,
        packed: bool = True,
        spill_choices: int = 4,
    ) -> "IVFIndex":
        """The 10M+-row build path: the corpus is ALREADY resident on
        device (any float dtype) and is never round-tripped to the host —
        essential on relayed transports where 10 GB of H2D costs minutes.

        * k-means trains fp32 on a strided device sample of ``train_rows``
          (the faiss practice — training on the full corpus buys nothing);
        * assignment streams device slabs through one jitted argmax GEMM
          (only the [N] int32 assignment crosses to the host, for the
          list fill);
        * ``dtype`` picks the resident storage: 'float32'/'bfloat16'
          re-cast in place, or 'int8' — per-row symmetric scales
          (`FrameIndex`'s scheme), 4× less HBM (5.1 GB at N=10M, D=512),
          dequantised exactly at score time via the gathered row scales.
        * ``packed`` (default) stores each list's rows CONTIGUOUSLY as an
          [k, C, D] block array: probing then reads nprobe contiguous
          ~C·D-byte chunks (DMA-friendly) instead of gathering tens of
          thousands of scattered rows. Measured at N=10M, D=512 on-chip:
          the row-id gather runs at ~22 GB/s effective (8.9 ms/query at
          nprobe=8) — the packed block read is the TPU-shaped layout.
          Costs capacity_factor× the minimal storage (pad slots).
        """
        import jax.numpy as jnp

        if dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported IVF storage dtype {dtype!r}")
        n, d = x_dev.shape
        if n_clusters < 1 or n_clusters > n:
            raise ValueError(f"n_clusters={n_clusters} must be in [1, {n}]")
        pre_quantized = x_dev.dtype == jnp.int8
        if pre_quantized:
            # corpus arrives already int8-quantized with its per-row scales
            # (the HBM-bound 10M+ recipe: nothing larger than the int8
            # matrix ever exists). Spherical assignment is row-scale
            # invariant (argmax_c s·x·c == argmax_c x·c for s > 0), so
            # k-means and assignment run on the unscaled int8 rows.
            if row_scales is None or dtype != "int8":
                raise ValueError(
                    "int8 x_dev requires row_scales and dtype='int8'"
                )
        stride = max(1, n // min(train_rows, n))
        sample = jnp.asarray(x_dev[::stride][: min(train_rows, n)], jnp.float32)
        cents, _ = kmeans(jax.random.PRNGKey(seed), sample, n_clusters, iters=iters)
        m = max(1, min(spill_choices, n_clusters))

        @functools.partial(jax.jit, static_argnames=("mm",))
        def assign_slab(slab, c, mm):
            sco = slab.astype(jnp.float32) @ c.T
            if mm == 1:
                return jnp.argmax(sco, axis=1).astype(jnp.int32)[:, None]
            return jax.lax.top_k(sco, mm)[1].astype(jnp.int32)

        # m == 1 fuses the GEMM into the argmax reduce (no score matrix
        # ever materialises); top_k is a TopK custom-call that BREAKS that
        # fusion — the full [rows, k] fp32 scores land in HBM plus 32×
        # lane-padded output temps (measured OOM at 500k×8192 next to a
        # 5.16 GB corpus). Bound the materialised scores to ~1 GB.
        a_rows = slab_rows if m == 1 else min(
            slab_rows, max(8192, (1 << 30) // (4 * n_clusters))
        )
        topm = np.concatenate(
            [
                np.asarray(assign_slab(x_dev[i : i + a_rows], cents, m))
                for i in range(0, n, a_rows)
            ]
        )
        capacity = max(1, int(np.ceil(n / n_clusters * capacity_factor)))
        if packed:
            # tile-align the per-list block: a [C, D] dynamic_slice at an
            # 8-aligned row offset is copy-free under the TPU's (8, 128)
            # tiling — unaligned C made XLA relayout the ENTIRE operand
            # (measured: a 6.2 GB copy per dispatch at N=10M)
            capacity = (capacity + 7) // 8 * 8
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        fill_inverted_lists_multi(topm, lists, overflow)
        self.centroids = cents

        if packed:
            self._pack_device(
                x_dev,
                jnp.asarray(row_scales, jnp.float32) if pre_quantized else None,
                lists,
                np.asarray(overflow, np.int32),
                dtype,
            )
            return self

        if pre_quantized:
            self.emb = x_dev
            self.row_scales = jnp.asarray(row_scales, jnp.float32)
        elif dtype == "int8":

            @jax.jit
            def quant_slab(slab):
                s32 = slab.astype(jnp.float32)
                scale = jnp.maximum(
                    jnp.max(jnp.abs(s32), axis=1) / 127.0, 1e-12
                )
                q = jnp.round(s32 / scale[:, None]).astype(jnp.int8)
                return q, scale

            qs, scs = [], []
            for i in range(0, n, slab_rows):
                qa, sa = quant_slab(x_dev[i : i + slab_rows])
                qs.append(qa)
                scs.append(sa)
            self.emb = jnp.concatenate(qs) if len(qs) > 1 else qs[0]
            self.row_scales = jnp.concatenate(scs) if len(scs) > 1 else scs[0]
        else:
            target = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
            self.emb = (
                x_dev if x_dev.dtype == target else x_dev.astype(target)
            )
            self.row_scales = None
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        return self

    def _pack_device(self, x_dev, src_scales, lists, overflow, dtype) -> None:
        """Materialise the packed flat layout on device: list i's rows land
        contiguously at flat rows [i·C, (i+1)·C) (chunked writes bound the
        transient; the scattered row-gather happens ONCE here instead of on
        every query), quantizing per row when ``dtype='int8'``. Pad slots
        hold row 0's bytes and are masked via ``id_lists < 0`` at search
        time."""
        k, capacity = lists.shape
        n, d = x_dev.shape
        int8 = dtype == "int8"
        store = (
            jnp.int8 if int8
            else (jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
        )
        ids_flat = jnp.asarray(lists.reshape(-1))
        self.id_lists = ids_flat
        self._n_rows = n

        out = jnp.zeros((k * capacity, d), store)
        scl = jnp.zeros((k * capacity,), jnp.float32) if int8 else None
        # chunk (in lists) so the gathered fp32 transient stays ≲256 MB
        chunk = max(1, (64 << 20) // max(1, capacity * d))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def write_pre_q(buf, sbuf, x, sc, idc, start):
            safe = jnp.where(idc >= 0, idc, 0)
            rows = x[safe]
            buf = jax.lax.dynamic_update_slice(buf, rows, (start, 0))
            sbuf = jax.lax.dynamic_update_slice(sbuf, sc[safe], (start,))
            return buf, sbuf

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def write_quant(buf, sbuf, x, idc, start):
            safe = jnp.where(idc >= 0, idc, 0)
            r32 = x[safe].astype(jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(r32), axis=-1) / 127.0, 1e-12)
            q = jnp.round(r32 / scale[..., None]).astype(jnp.int8)
            buf = jax.lax.dynamic_update_slice(buf, q, (start, 0))
            sbuf = jax.lax.dynamic_update_slice(sbuf, scale, (start,))
            return buf, sbuf

        @functools.partial(jax.jit, donate_argnums=(0,))
        def write_cast(buf, x, idc, start):
            safe = jnp.where(idc >= 0, idc, 0)
            return jax.lax.dynamic_update_slice(
                buf, x[safe].astype(store), (start, 0)
            )

        pre_q = src_scales is not None
        for i in range(0, k, chunk):
            idc = ids_flat[i * capacity : (i + chunk) * capacity]
            start = jnp.int32(i * capacity)
            if pre_q:
                out, scl = write_pre_q(out, scl, x_dev, src_scales, idc, start)
            elif int8:
                out, scl = write_quant(out, scl, x_dev, idc, start)
            else:
                out = write_cast(out, x_dev, idc, start)
        self.emb_lists = out
        self.scale_lists = scl

        self.overflow = jnp.asarray(overflow)
        if len(overflow):
            ovf = jnp.asarray(overflow)
            if pre_q:
                self.overflow_emb = x_dev[ovf]
                self.overflow_scales = src_scales[ovf]
            elif int8:
                r32 = x_dev[ovf].astype(jnp.float32)
                scale = jnp.maximum(jnp.max(jnp.abs(r32), axis=1) / 127.0, 1e-12)
                self.overflow_emb = jnp.round(r32 / scale[:, None]).astype(jnp.int8)
                self.overflow_scales = scale
            else:
                self.overflow_emb = x_dev[ovf].astype(store)
                self.overflow_scales = None
        else:
            self.overflow_emb = jnp.zeros((0, d), store)
            self.overflow_scales = (
                jnp.zeros((0,), jnp.float32) if int8 else None
            )

    def append(self, emb_new: np.ndarray) -> np.ndarray:
        """Incremental add WITHOUT re-running k-means: assign new rows to
        their nearest existing centroid (one GEMM), fill free list slots,
        spill the rest to the overflow pool. Returns the new rows' ids.

        The every-row-lives-exactly-once invariant (and with it the
        nprobe=k exactness ceiling) is preserved. Centroids do NOT move —
        after appending a large multiple of the build-time corpus, rebuild
        for list balance (`FrameIndex` handles this policy for serving).
        Device cost: one [M, D] assign GEMM + an emb re-concat; the list
        matrix is patched host-side and re-uploaded (k·C int32, small next
        to emb). Packed indexes scatter the new rows into their list
        slots in one dispatch instead (`_append_packed`)."""
        if self.emb is None and not self.packed:
            raise ValueError("IVFIndex.append before build()")
        d = self.emb_lists.shape[1] if self.packed else self.emb.shape[1]
        emb_new = np.asarray(emb_new, np.float32)
        if emb_new.ndim != 2 or emb_new.shape[1] != d:
            raise ValueError(
                f"append rows must be (M, {d}), got {emb_new.shape}"
            )
        if self.packed:
            return self._append_packed(emb_new)
        start = self.n_rows
        x = jnp.asarray(emb_new)  # ONE host->device upload, reused below
        assign = np.asarray(jnp.argmax(x @ self.centroids.T, axis=1))
        lists = np.array(self.list_rows)  # writable host copy
        overflow = list(np.asarray(self.overflow))
        fill_inverted_lists(assign, lists, overflow, start_row=start)
        if self.row_scales is not None:  # int8 storage: quantize new rows
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1) / 127.0, 1e-12)
            xq = jnp.round(x / scale[:, None]).astype(jnp.int8)
            self.emb = jnp.concatenate([self.emb, xq], axis=0)
            self.row_scales = jnp.concatenate([self.row_scales, scale])
        else:
            self.emb = jnp.concatenate(
                [self.emb, x.astype(self.emb.dtype)], axis=0
            )
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        return np.arange(start, start + len(emb_new))

    def _append_packed(self, emb_new: np.ndarray) -> np.ndarray:
        """Packed-layout append: assign → split into free-slot placements
        (scattered into [k, C, D] in ONE `.at[]` dispatch) and overflow
        spill (concatenated to the pool). The every-row-lives-exactly-once
        invariant and the nprobe=k exactness ceiling are preserved."""
        start = self.n_rows
        capacity = self._capacity
        int8 = self.scale_lists is not None
        x = jnp.asarray(emb_new)
        assign = np.asarray(jnp.argmax(x @ self.centroids.T, axis=1))
        fill = (
            (np.asarray(self.id_lists).reshape(-1, capacity) >= 0)
            .sum(axis=1)
        )

        li, si, ri, ovf_ri = [], [], [], []
        for i, c in enumerate(assign):
            if fill[c] < capacity:
                li.append(int(c))
                si.append(int(fill[c]))
                ri.append(i)
                fill[c] += 1
            else:
                ovf_ri.append(i)

        if int8:
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1) / 127.0, 1e-12)
            xq = jnp.round(x / scale[:, None]).astype(jnp.int8)
        else:
            xq, scale = x.astype(self.emb_lists.dtype), None

        if li:
            flat = jnp.asarray(
                np.asarray(li, np.int64) * capacity + np.asarray(si, np.int64)
            )
            ri_a = jnp.asarray(ri)
            self.emb_lists = self.emb_lists.at[flat].set(xq[ri_a])
            self.id_lists = self.id_lists.at[flat].set(
                (start + np.asarray(ri)).astype(np.int32)
            )
            if int8:
                self.scale_lists = self.scale_lists.at[flat].set(scale[ri_a])
        if ovf_ri:
            ovf_a = jnp.asarray(ovf_ri)
            self.overflow_emb = jnp.concatenate(
                [self.overflow_emb, xq[ovf_a]], axis=0
            )
            if int8:
                self.overflow_scales = jnp.concatenate(
                    [self.overflow_scales, scale[ovf_a]]
                )
            self.overflow = jnp.concatenate(
                [
                    self.overflow,
                    jnp.asarray(
                        (start + np.asarray(ovf_ri)).astype(np.int32)
                    ),
                ]
            )
        self._n_rows = start + len(emb_new)
        return np.arange(start, start + len(emb_new))

    # Large arrays are ARGUMENTS, not closures: closed-over device arrays
    # become jaxpr constants and wedge this environment's remote compiler
    # (CLAUDE.md).
    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k", "nprobe"))
    def _probe_search(q, emb, cents, list_rows, overflow, top_k: int, nprobe: int):
        """The overflow pool is scored as ONE shared [B,D]×[D,O] GEMM (read
        once) rather than broadcast into every query's candidate gather —
        the per-query [B,O,D] materialisation OOMs at 10M-row scale."""
        b = q.shape[0]
        cscores = q @ cents.T                              # [B, k]
        _, cids = jax.lax.top_k(cscores, nprobe)           # [B, nprobe]
        cand = list_rows[cids].reshape(b, -1)              # [B, nprobe*C]
        valid = cand >= 0
        gathered = emb[jnp.where(valid, cand, 0)]          # [B, M, D]
        scores = jnp.einsum(
            "bd,bmd->bm",
            q.astype(emb.dtype),
            gathered,
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(valid, scores, -jnp.inf)
        if overflow.shape[0]:
            ovf_scores = jnp.einsum(
                "bd,od->bo",
                q.astype(emb.dtype),
                emb[overflow],
                preferred_element_type=jnp.float32,
            )
            scores = jnp.concatenate([scores, ovf_scores], axis=1)
            cand = jnp.concatenate(
                [cand, jnp.broadcast_to(overflow, (b, overflow.shape[0]))],
                axis=1,
            )
        top_scores, top_pos = jax.lax.top_k(scores, top_k)
        top_rows = jnp.take_along_axis(cand, top_pos, axis=1)
        return top_scores, top_rows

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k", "nprobe"))
    def _probe_search_int8(
        q, emb_q, row_scales, cents, list_rows, overflow, top_k: int, nprobe: int
    ):
        """int8-storage variant: candidate rows gather as int8 (¼ the HBM
        read), the GEMM runs bf16 with fp32 accumulation, and the exact
        per-row scale multiplies back afterwards — the same symmetric
        scheme FrameIndex's int8 tier uses.

        The overflow pool is scored as ONE shared [B, D] × [D, O] GEMM
        instead of being replicated into every query's candidate gather:
        at 10M-row scale the pool can hold 10⁵⁺ rows, and a per-query
        [B, O, D] gather of it is a multi-GB materialisation (the measured
        OOM this fixes) where the shared GEMM reads the rows once."""
        b = q.shape[0]
        cscores = q @ cents.T
        _, cids = jax.lax.top_k(cscores, nprobe)
        cand = list_rows[cids].reshape(b, -1)              # [B, nprobe*C]
        valid = cand >= 0
        safe = jnp.where(valid, cand, 0)
        gathered = emb_q[safe]                             # [B, M, D] int8
        scores = jnp.einsum(
            "bd,bmd->bm",
            q.astype(jnp.bfloat16),
            gathered.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        scores = scores * row_scales[safe]
        scores = jnp.where(valid, scores, -jnp.inf)
        if overflow.shape[0]:
            ovf_rows = emb_q[overflow]                     # [O, D] int8, once
            ovf_scores = jnp.einsum(
                "bd,od->bo",
                q.astype(jnp.bfloat16),
                ovf_rows.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * row_scales[overflow]
            scores = jnp.concatenate([scores, ovf_scores], axis=1)
            cand = jnp.concatenate(
                [cand, jnp.broadcast_to(overflow, (b, overflow.shape[0]))],
                axis=1,
            )
        top_scores, top_pos = jax.lax.top_k(scores, top_k)
        top_rows = jnp.take_along_axis(cand, top_pos, axis=1)
        return top_scores, top_rows

    @staticmethod
    @functools.partial(
        jax.jit, static_argnames=("top_k", "nprobe", "capacity")
    )
    def _probe_search_packed(
        q, emb_lists, scale_lists, id_lists, cents,
        overflow_emb, overflow_scales, overflow_ids,
        top_k: int, nprobe: int, capacity: int,
    ):
        """Packed-layout probe: list i's rows live contiguously at flat
        rows [i·C, (i+1)·C), so each probed list is ONE copy-free
        `dynamic_slice` (C is 8-aligned → tile-aligned under the TPU's
        (8, 128) tiling). The measured 10M-row alternatives both lose:
        per-row gathers run at ~22 GB/s effective (scattered 512-byte
        reads), and a [k, C, D] block gather makes XLA relayout the entire
        6 GB operand per dispatch. Probes run under `lax.scan` (vmapped
        over the query batch inside each step) so peak temp stays at
        B·C·D bytes for ANY nprobe — compiler-verified ~0 HLO temp at the
        N=10M geometry. int8 storage (scale_lists not None) scores bf16
        with fp32 accumulation and exact per-row dequant; the overflow
        pool rides one shared [B,D]×[D,O] GEMM."""
        b = q.shape[0]
        int8 = scale_lists is not None
        comp = jnp.bfloat16 if int8 else emb_lists.dtype
        qh = q.astype(comp)
        d = emb_lists.shape[1]
        cscores = q @ cents.T                               # [B, k]
        _, cids = jax.lax.top_k(cscores, nprobe)            # [B, nprobe]
        starts = (cids * capacity).T                        # [nprobe, B]

        def step(carry, st):                                # st: [B]
            def one(s, qb):
                rows = jax.lax.dynamic_slice(emb_lists, (s, 0), (capacity, d))
                ids = jax.lax.dynamic_slice(id_lists, (s,), (capacity,))
                sco = (rows.astype(comp) @ qb).astype(jnp.float32)
                if int8:
                    sc = jax.lax.dynamic_slice(scale_lists, (s,), (capacity,))
                    sco = sco * sc
                return jnp.where(ids >= 0, sco, -jnp.inf), ids

            sco, ids = jax.vmap(one)(st, qh)                # [B, C] each
            return carry, (sco, ids)

        _, (sco, ids) = jax.lax.scan(step, 0, starts)       # [np, B, C]
        scores = sco.transpose(1, 0, 2).reshape(b, -1)
        ids = ids.transpose(1, 0, 2).reshape(b, -1)
        if overflow_emb.shape[0]:
            ovf_scores = jnp.einsum(
                "bd,od->bo",
                qh,
                overflow_emb.astype(comp),
                preferred_element_type=jnp.float32,
            )
            if int8:
                ovf_scores = ovf_scores * overflow_scales
            scores = jnp.concatenate([scores, ovf_scores], axis=1)
            ids = jnp.concatenate(
                [ids, jnp.broadcast_to(overflow_ids, (b, overflow_ids.shape[0]))],
                axis=1,
            )
        top_scores, top_pos = jax.lax.top_k(scores, top_k)
        return top_scores, jnp.take_along_axis(ids, top_pos, axis=1)

    def _packed_ops(self) -> tuple:
        """The packed probe's index operands, in `_probe_search_packed`
        argument order — shared by `search` and the kernel benches."""
        return (
            self.emb_lists, self.scale_lists, self.id_lists,
            self.centroids, self.overflow_emb, self.overflow_scales,
            self.overflow,
        )

    def search(
        self, queries: np.ndarray, top_k: int, nprobe: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], row ids [B, k]); rows scoring −inf (fewer than
        top_k reachable candidates) carry row id −1."""
        if self.emb is None and not self.packed:
            raise ValueError("IVFIndex.search before build()")
        nprobe = max(1, min(nprobe, self.n_clusters))
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        cap = self._capacity * nprobe + self._overflow_size
        top_k = max(1, min(top_k, cap, self.n_rows))
        if self.packed:
            scores, rows = self._probe_search_packed(
                q, *self._packed_ops(), top_k, nprobe, self._capacity,
            )
        elif self.row_scales is not None:
            scores, rows = self._probe_search_int8(
                q, self.emb, self.row_scales, self.centroids,
                self.list_rows, self.overflow, top_k, nprobe,
            )
        else:
            scores, rows = self._probe_search(
                q, self.emb, self.centroids, self.list_rows, self.overflow,
                top_k, nprobe,
            )
        scores = np.asarray(scores)
        rows = np.where(np.isfinite(scores), np.asarray(rows), -1)
        return scores, rows

    # -- persistence --------------------------------------------------------
    def save(self, path) -> None:
        if self.packed:
            payload = dict(
                emb_lists=np.asarray(self.emb_lists),
                id_lists=np.asarray(self.id_lists),
                centroids=np.asarray(self.centroids),
                overflow=np.asarray(self.overflow),
                overflow_emb=np.asarray(self.overflow_emb),
                n_rows=np.int64(self._n_rows),
            )
            if self.scale_lists is not None:
                payload["scale_lists"] = np.asarray(self.scale_lists)
                payload["overflow_scales"] = np.asarray(self.overflow_scales)
            np.savez(path, **payload)
            return
        payload = dict(
            emb=np.asarray(self.emb),
            centroids=np.asarray(self.centroids),
            list_rows=np.asarray(self.list_rows),
            overflow=np.asarray(self.overflow),
        )
        if self.row_scales is not None:
            payload["row_scales"] = np.asarray(self.row_scales)
        np.savez(path, **payload)

    @classmethod
    def load(cls, path) -> "IVFIndex":
        z = np.load(path)
        idx = cls()
        idx.centroids = jnp.asarray(z["centroids"])
        idx.overflow = jnp.asarray(z["overflow"].astype(np.int32))
        if "emb_lists" in z:
            idx.emb_lists = jnp.asarray(z["emb_lists"])
            idx.id_lists = jnp.asarray(z["id_lists"])
            idx.overflow_emb = jnp.asarray(z["overflow_emb"])
            idx._n_rows = int(z["n_rows"])
            if "scale_lists" in z:
                idx.scale_lists = jnp.asarray(z["scale_lists"])
                idx.overflow_scales = jnp.asarray(z["overflow_scales"])
            return idx
        idx.emb = jnp.asarray(z["emb"])
        idx.list_rows = jnp.asarray(z["list_rows"])
        if "row_scales" in z:
            idx.row_scales = jnp.asarray(z["row_scales"])
        return idx
