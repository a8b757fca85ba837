"""IVF-PQ: list probing × code compression — the 100M+-row architecture.

`index/ivf.py` cuts the rows *read* per query (probe nprobe of k inverted
lists); `index/pq.py` cuts the bytes *per row* (uint8 ADC codes). This
module composes them the classic way (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — public method, reimplemented
TPU-first):

- **Coarse quantizer**: spherical k-means centroids + static [k, capacity]
  inverted lists with an always-searched overflow pool (reused verbatim
  from `ivf.IVFIndex` semantics: every row lives in exactly one place).
- **Residual PQ**: the fine quantizer encodes ``x − c(x)`` (the residual
  from the row's coarse centroid), not the raw vector — residuals occupy a
  far smaller ball than the corpus, so the same 256 centroids/subspace
  quantize much finer. Codebooks train with the vmapped Euclidean k-means
  from `pq.kmeans_l2`.
- **Search** (one jitted dispatch): centroid GEMM → top-nprobe lists →
  ADC over each probed list's codes. The score decomposes exactly as
  ``q·x ≈ q·c_stored + q·residual``: the first term is the centroid score
  already in hand, the second comes from the per-query [S·K] flat table
  (64 KB fp32 — VMEM-resident). The packed layout (`build_device`
  default) stores list i's codes contiguously at flat rows
  [i·C, (i+1)·C) so each probe is one copy-free [C, S] `dynamic_slice` +
  C·S table lookups; the legacy host-build layout scans subspaces with
  [B, M] gathers through the [S, N] code matrix (fine at ≤1M rows, the
  measured 10M cost was 94 ms/query). Full-list rows spill to their
  next-nearest centroid's list (residual re-encoded against the stored
  list's centroid — the decomposition stays coherent), so the overflow
  pool that every query must ADC stays ~empty.
- **Re-rank** (optional): exact host re-score of the top-R candidates
  against originals retained in HOST memory.

Memory at N=100M, D=512, S=64, k=65536: codes 6.4 GB + row-ids 0.4 GB in
HBM (vs 205 GB fp32 / 51 GB int8 exact); queries read ~nprobe/k of it.
No reference counterpart (`Backend/services/embedding_service.py`
brute-forces fp32 numpy).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.index.ivf import kmeans
from evr_tpu.index.pq import kmeans_l2


def _train_residual_quantizers(
    resid, n_subspaces: int, n_centroids: int, pq_iters: int,
    opq_iters: int, seed: int,
):
    """(codebooks [S, K, ds], rotation [D, D] | None) from a residual
    training sample [m, D] (device fp32). ``opq_iters > 0`` runs the OPQ
    alternation (Ge et al., CVPR 2013): train books on rotated residuals,
    Procrustes-update R from the [D, D] host SVD of residᵀ·recon; the
    [m, D] matmuls stay on device. R=I reproduces plain residual PQ."""
    m, d = resid.shape
    ds = d // n_subspaces
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_subspaces)

    def train_books(r_rot, iters_):
        rs_ = r_rot.reshape(m, n_subspaces, ds).transpose(1, 0, 2)
        return jax.vmap(
            lambda k_, xs: kmeans_l2(k_, xs, n_centroids, iters=iters_)
        )(keys, rs_)

    rot = None
    if opq_iters > 0:
        rot = jnp.eye(d, dtype=jnp.float32)
        inner = max(2, pq_iters // 2)
        for _ in range(opq_iters):
            books_i, assign_i = train_books(resid @ rot, inner)
            recon = jnp.take_along_axis(
                books_i, assign_i[:, :, None].astype(jnp.int32), axis=1
            ).transpose(1, 0, 2).reshape(m, d)            # [m, D] rotated
            u, _, vt = np.linalg.svd(
                np.asarray(resid.T @ recon), full_matrices=False
            )
            rot = jnp.asarray((u @ vt).astype(np.float32))
        resid = resid @ rot
    books, _ = train_books(resid, pq_iters)
    return books, rot



class IVFPQIndex:
    """Probed, compressed cosine top-k. ``build`` once over L2-normalised
    embeddings; ``search(queries, top_k, nprobe, rerank=)`` is one jitted
    dispatch (+ optional host re-rank)."""

    # instance-level demotion flag when the Pallas ADC kernel fails to
    # lower on the executing backend (class default keeps old pickles /
    # subclasses working)
    _pallas_broken = False

    def __init__(self):
        self.centroids = None   # [k, D] fp32
        self.list_rows = None   # [k, C] int32, -1 padded
        self.overflow = None    # [O] int32
        self.codebooks = None   # [S, K, d] fp32 (residual quantizer)
        self.codes = None       # [N, S] uint8
        self._coarse_assign = None  # [N] int32 (overflow scoring)
        self._originals = None  # [N, D] HOST fp32 (only if kept)
        self._codes_t = None    # [S, N] uint8 scan operand (lazy)
        # packed layout (build_device default — mirrors ivf.IVFIndex):
        # list i's CODES live contiguously at flat rows [i·C, (i+1)·C)
        self.codes_lists = None     # [k*C, S] uint8 — or PAIRED
        # [k*C/2, 2S] (identical row-major bytes, 128-lane minor dim —
        # zero (8,128)-tile padding; build_device_streamed default)
        self._paired = False
        self.id_lists = None        # [k*C] int32 corpus row ids, -1 padded
        self.overflow_codes = None  # [O, S] uint8
        self._overflow_assign = None  # [O] int32 coarse centroid per row
        self._overflow_recon = None  # [O, D] cache (pool GEMM operand)
        self._pool_dtype = None      # None/f32; streamed builds set bf16
        self._n_rows = 0
        # host-DRAM exact-rerank store (attach_host_store)
        self._originals_int8 = None
        self._originals_int8_scales = None
        # OPQ rotation (Ge et al., CVPR 2013): residuals are encoded as
        # r @ R, so the ADC side of a search uses q @ R while the coarse
        # q·c term stays unrotated (R orthogonal ⇒ q·r = (qR)·(rR)).
        self.rotation = None    # [D, D] fp32 or None

    @property
    def packed(self) -> bool:
        return self.codes_lists is not None

    @property
    def n_rows(self) -> int:
        if self.packed:
            return self._n_rows
        return 0 if self.codes is None else int(self.codes.shape[0])

    @property
    def n_clusters(self) -> int:
        return 0 if self.centroids is None else int(self.centroids.shape[0])

    @property
    def _capacity(self) -> int:
        if self.packed:
            rows = int(self.codes_lists.shape[0])
            if self._paired:
                rows *= 2
            return rows // self.n_clusters
        return int(self.list_rows.shape[1])

    @property
    def code_bytes(self) -> int:
        if self.packed:
            s = int(self.codes_lists.shape[1])
            return self._n_rows * (s // 2 if self._paired else s)
        return 0 if self.codes is None else int(np.prod(self.codes.shape))

    def build(
        self,
        emb: np.ndarray,
        n_clusters: int,
        n_subspaces: int = 64,
        n_centroids: int = 256,
        capacity_factor: float = 1.5,
        coarse_iters: int = 10,
        pq_iters: int = 10,
        seed: int = 0,
        keep_originals: bool = True,
        spill_choices: int = 4,
    ) -> "IVFPQIndex":
        emb = np.asarray(emb, np.float32)
        n, d = emb.shape
        if n_clusters < 1 or n_clusters > n:
            raise ValueError(f"n_clusters={n_clusters} must be in [1, {n}]")
        if d % n_subspaces:
            raise ValueError(
                f"embed dim {d} not divisible by n_subspaces={n_subspaces}"
            )
        if not 1 <= n_centroids <= 256:
            raise ValueError("n_centroids must be in [1, 256] (uint8 codes)")
        if n_centroids > n:
            raise ValueError(f"n_centroids={n_centroids} > n_rows={n}")

        # a rebuild replaces centroids/codebooks/overflow: drop the pool
        # reconstruction cache now (shape-equality alone can alias a stale
        # cache when the new pool happens to match the old row count)
        self._overflow_recon = None
        x = jnp.asarray(emb)
        cents, assign = kmeans(
            jax.random.PRNGKey(seed), x, n_clusters, iters=coarse_iters
        )
        assign_np = np.asarray(assign)

        # inverted lists: identical placement semantics to ivf.IVFIndex —
        # corpus-order fill, full-list rows try their next-nearest
        # centroids (spill_choices), the rest reach the overflow pool
        from evr_tpu.index.ivf import fill_inverted_lists_multi

        m = max(1, min(spill_choices, n_clusters))
        if m > 1:
            _, topm = jax.lax.top_k(x @ cents.T, m)
            topm = np.asarray(topm)
        else:
            topm = assign_np.reshape(-1, 1)
        capacity = max(1, int(np.ceil(n / n_clusters * capacity_factor)))
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        placement = fill_inverted_lists_multi(topm, lists, overflow)

        # residuals from each row's STORED centroid (its list's centroid;
        # overflow rows use their nearest) — the fine quantizer's input.
        # Keeping encoding and placement coherent preserves the
        # q·x ≈ q·c_stored + q·r̃ decomposition for spilled rows.
        enc_cent = np.where(placement >= 0, placement, assign_np).astype(
            np.int32
        )
        enc_cent_j = jnp.asarray(enc_cent)
        resid = x - cents[enc_cent_j]
        ds = d // n_subspaces
        keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_subspaces)
        if n <= 131_072:
            # small corpora: exact one-shot training + encoding (unchanged
            # numerics for every existing fixture/test)
            rs = resid.reshape(n, n_subspaces, ds).transpose(1, 0, 2)
            books, codes = jax.vmap(
                lambda k_, xs: kmeans_l2(k_, xs, n_centroids, iters=pq_iters)
            )(keys, rs)
        else:
            # large corpora on-device: the vmapped [S, N, K] distance
            # transients of one-shot training OOM (measured: 1M rows blew
            # 16 GB HBM in bench_sharded). Standard PQ recipe instead —
            # train codebooks on a strided sample (≤65,536 rows ≈ 256
            # rows/centroid, the faiss default ballpark), then encode ALL
            # rows in bounded chunks.
            stride = -(-n // 65_536)
            rs_sample = (
                resid[::stride]
                .reshape(-1, n_subspaces, ds)
                .transpose(1, 0, 2)
            )  # [S, n_sample, ds]
            books, _ = jax.vmap(
                lambda k_, xs: kmeans_l2(k_, xs, n_centroids, iters=pq_iters)
            )(keys, rs_sample)

            @jax.jit
            def _encode_chunk(resid_chunk, books_):
                rc = resid_chunk.reshape(-1, n_subspaces, ds)
                d2 = jnp.sum(
                    (rc[:, :, None, :] - books_[None]) ** 2, axis=-1
                )  # [m, S, K]
                return jnp.argmin(d2, axis=-1).astype(jnp.uint8)  # [m, S]

            chunk = 16_384
            parts = [
                np.asarray(_encode_chunk(resid[lo : lo + chunk], books))
                for lo in range(0, n, chunk)
            ]
            codes = jnp.asarray(np.concatenate(parts, axis=0)).T  # [S, N]

        self.centroids = cents
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        self.codebooks = books
        self.codes = codes.T.astype(jnp.uint8)       # [N, S]
        self._coarse_assign = enc_cent_j              # [N] (overflow scoring)
        self._originals = emb if keep_originals else None
        self._codes_t = None
        return self

    def build_device(
        self,
        x_dev,
        n_clusters: int,
        n_subspaces: int = 64,
        n_centroids: int = 256,
        capacity_factor: float = 1.5,
        coarse_iters: int = 10,
        pq_iters: int = 10,
        seed: int = 0,
        train_rows: int = 524_288,
        pq_train_rows: int = 65_536,
        slab_rows: int = 1_000_000,
        row_scales=None,
        packed: bool = True,
        spill_choices: int = 4,
        opq_iters: int = 0,
    ) -> "IVFPQIndex":
        """10M+-row build from a device-resident corpus, mirroring
        ``IVFIndex.build_device``: coarse k-means AND the residual PQ
        codebooks train fp32 on a strided sample; assignment + residual
        encoding then stream device slabs. Only the [N, M] choice ranking
        crosses to the host (for the list fill); the uint8 codes
        (S bytes/row — 640 MB at N=10M, S=64) stay resident. Originals are
        NOT retained (no host re-rank at this tier).

        ``packed`` (default) stores each list's CODES contiguously at flat
        rows [i·C, (i+1)·C) — probing then dynamic-slices nprobe [C, S]
        blocks instead of gathering candidate codes row-by-row through the
        [S, N] matrix (the measured 10M-row cost of that path: 94 ms/query
        at nprobe=8, the 64-step scan of [B, 1.5M] gathers). Residuals are
        encoded against each row's STORED list centroid, so spilled rows
        (``spill_choices``) keep the q·c + q·r̃ decomposition coherent.
        ``packed=False`` keeps the legacy row-gather layout and forces
        single-choice placement (its search scores every candidate against
        the probed list's centroid, which is only coherent for top-1
        placement).

        ``row_scales``: pass when ``x_dev`` is an int8-quantized corpus
        (per-row symmetric scales) — rows are dequantised slab-wise before
        residual encoding so the PQ codebooks see true magnitudes."""
        import jax.numpy as jnp

        # rebuild replaces centroids/codebooks/overflow: drop the pool
        # reconstruction cache (shape check alone can alias stale rows)
        self._overflow_recon = None
        n, d = x_dev.shape
        if d % n_subspaces:
            raise ValueError(
                f"embed dim {d} not divisible by n_subspaces={n_subspaces}"
            )
        if (x_dev.dtype == jnp.int8) != (row_scales is not None):
            raise ValueError("int8 x_dev and row_scales go together")
        if row_scales is not None:
            row_scales = jnp.asarray(row_scales, jnp.float32)
        stride = max(1, n // min(train_rows, n))
        take = min(train_rows, n)
        sample = jnp.asarray(x_dev[::stride][:take], jnp.float32)
        if row_scales is not None:
            sample = sample * row_scales[::stride][:take][:, None]
        cents, s_assign = kmeans(
            jax.random.PRNGKey(seed), sample, n_clusters, iters=coarse_iters
        )
        # PQ codebooks train on a SUB-sample of the coarse sample's
        # residuals: 256 centroids per tiny subspace saturate well under
        # 100k rows, and the vmapped [S, M, ds] k-means working set pads
        # ds up to the (8,128) lane tile — at M=524k that padding alone is
        # 16 GB, at M=65k it is 2 GB (the measured OOM this bounds).
        pq_take = min(pq_train_rows, sample.shape[0])
        pq_stride = max(1, sample.shape[0] // pq_take)
        resid = (sample - cents[s_assign])[::pq_stride][:pq_take]
        ds = d // n_subspaces
        books, rot = _train_residual_quantizers(
            resid, n_subspaces, n_centroids, pq_iters, opq_iters, seed
        )
        self.rotation = rot

        from evr_tpu.index.ivf import fill_inverted_lists_multi

        mc = max(1, min(spill_choices, n_clusters)) if packed else 1

        @functools.partial(jax.jit, static_argnames=("mm",))
        def assign_slab(slab, scales, c, mm):
            sco = (slab.astype(jnp.float32) * scales[:, None]) @ c.T
            if mm == 1:
                return jnp.argmax(sco, axis=1).astype(jnp.int32)[:, None]
            return jax.lax.top_k(sco, mm)[1].astype(jnp.int32)

        def slab_scales(i, mrows):
            if row_scales is not None:
                return row_scales[i : i + mrows]
            return jnp.ones((mrows,), jnp.float32)

        # m == 1 fuses GEMM→argmax; top_k is a fusion-breaking custom-call
        # that materialises the [rows, k] scores — bound them to ~1 GB
        # (see ivf.IVFIndex.build_device, same measured OOM)
        a_rows = slab_rows if mc == 1 else min(
            slab_rows, max(8192, (1 << 30) // (4 * n_clusters))
        )
        topm = np.concatenate(
            [
                np.asarray(
                    assign_slab(
                        x_dev[i : i + a_rows],
                        slab_scales(i, min(a_rows, n - i)),
                        cents,
                        mc,
                    )
                )
                for i in range(0, n, a_rows)
            ]
        )
        capacity = max(1, int(np.ceil(n / n_clusters * capacity_factor)))
        if packed:
            # 8-aligned [C, S] blocks slice copy-free under (8, 128) tiling
            capacity = (capacity + 7) // 8 * 8
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        placement = fill_inverted_lists_multi(topm, lists, overflow)
        enc_cent = np.where(placement >= 0, placement, topm[:, 0]).astype(
            np.int32
        )

        self.centroids = cents
        self.codebooks = books
        self._originals = None
        self._codes_t = None
        c_sq = jnp.sum(jnp.square(books), axis=2)            # [S, K]

        def encode_resid(rows, cent_ids):
            r = rows - cents[cent_ids]
            if rot is not None:
                r = r @ rot
            mm = r.shape[0]
            rss = r.reshape(mm, n_subspaces, ds).transpose(1, 0, 2)
            dots = jnp.einsum(
                "smd,skd->smk", rss, books,
                preferred_element_type=jnp.float32,
            )
            return jnp.argmin(
                c_sq[:, None, :] - 2.0 * dots, axis=2
            ).T.astype(jnp.uint8)                             # [mm, S]

        if packed:
            ones = (
                row_scales
                if row_scales is not None
                else jnp.ones((n,), jnp.float32)
            )
            ids_flat = jnp.asarray(lists.reshape(-1))
            k = n_clusters
            buf = jnp.zeros((k * capacity, n_subspaces), jnp.uint8)
            # chunk (in lists) bounds the gathered fp32 transient ≲256 MB
            chunk = max(1, (64 << 20) // max(1, capacity * d))

            @functools.partial(jax.jit, donate_argnums=(0,))
            def pack_chunk(b, x, sc, idc, cent_ids, start):
                safe = jnp.where(idc >= 0, idc, 0)
                rows = x[safe].astype(jnp.float32) * sc[safe][:, None]
                codes = encode_resid(rows, cent_ids)
                return jax.lax.dynamic_update_slice(b, codes, (start, 0))

            cent_of_slot = np.repeat(
                np.arange(k, dtype=np.int32), capacity
            )
            for i in range(0, k, chunk):
                lo, hi = i * capacity, min(k, i + chunk) * capacity
                buf = pack_chunk(
                    buf, x_dev, ones,
                    ids_flat[lo:hi],
                    jnp.asarray(cent_of_slot[lo:hi]),
                    jnp.int32(lo),
                )
            self.codes_lists = buf
            self.id_lists = ids_flat
            self._n_rows = n
            self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
            if len(overflow):
                ovf = np.asarray(overflow, np.int64)
                oa = jnp.asarray(enc_cent[ovf])

                @jax.jit
                def encode_overflow(x, sc, rows_idx, cent_ids):
                    rows = (
                        x[rows_idx].astype(jnp.float32)
                        * sc[rows_idx][:, None]
                    )
                    return encode_resid(rows, cent_ids)

                self.overflow_codes = encode_overflow(
                    x_dev, ones, jnp.asarray(ovf), oa
                )
                self._overflow_assign = oa
            else:
                self.overflow_codes = jnp.zeros(
                    (0, n_subspaces), jnp.uint8
                )
                self._overflow_assign = jnp.zeros((0,), jnp.int32)
            self.codes = None
            self.list_rows = None
            self._coarse_assign = None
            return self

        # legacy unpacked layout: [N, S] codes in corpus order, residuals
        # vs each row's nearest centroid (placement is single-choice here)
        @jax.jit
        def encode_slab_codes(slab, scales, cent_ids):
            x = slab.astype(jnp.float32) * scales[:, None]
            return encode_resid(x, cent_ids)

        enc_j = jnp.asarray(enc_cent)
        code_slabs = [
            encode_slab_codes(
                x_dev[i : i + slab_rows],
                slab_scales(i, min(slab_rows, n - i)),
                enc_j[i : i + slab_rows],
            )
            for i in range(0, n, slab_rows)
        ]
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        self.codes = (
            jnp.concatenate(code_slabs) if len(code_slabs) > 1 else code_slabs[0]
        )
        self._coarse_assign = enc_j
        return self


    def build_device_streamed(
        self,
        slab_fn,
        n_rows: int,
        d: int,
        n_clusters: int,
        n_subspaces: int = 64,
        n_centroids: int = 256,
        capacity_factor: float = 1.1,
        coarse_iters: int = 6,
        pq_iters: int = 6,
        opq_iters: int = 0,
        seed: int = 0,
        train_rows: int = 524_288,
        pq_train_rows: int = 65_536,
        slab_rows: int = 500_000,
        spill_choices: int = 4,
        assign_sub_rows: int = 25_000,
        progress=None,
    ) -> "IVFPQIndex":
        """100M-row build where the corpus NEVER exists in HBM — the
        regime `build_device` cannot reach (a resident [100M, 512] int8
        corpus is 51 GB against a 16 GB v5e). ``slab_fn(start, m)`` must
        return the fp32 device rows [m, d] for corpus positions
        [start, start+m), deterministically (it is called up to three
        times per slab: sampling, assignment, encoding); rows the caller
        considers canonical-int8 should be returned already dequantised.

        Three streamed passes, none of which retains a slab:

        1. **Sample** — a per-slab strided subsample trains the coarse
           k-means and the residual PQ/OPQ quantizers (the same
           `_train_residual_quantizers` the resident build uses).
        2. **Assign** — each slab scores against the centroids in
           ``assign_sub_rows`` sub-chunks under one jitted `lax.map`
           (bounding the [rows, k] score transient), and only the tiny
           [m, spill_choices] choice ranking crosses to the host, where
           `fill_inverted_lists_multi` places every row exactly once
           (spill keeps the always-scanned pool ~empty).
        3. **Encode+scatter** — each slab re-generates, residual-encodes
           against its rows' STORED list centroids (OPQ-rotated), and the
           uint8 codes scatter straight into the packed [k·C, S] block
           layout (placed rows) or the overflow code table (pool rows).
           HBM holds codes + ids only: ~N·(S·cf + 4·cf) bytes.

        Search-side everything matches `build_device(packed=True)` —
        ``nprobe = n_clusters`` reads every row. HBM at N=100M, S=64,
        cf=1.1: 7.0 GB codes + 0.44 GB ids. Reference counterpart: none
        (the reference's faiss import is unused, `Backend/app.py:21`)."""
        if d % n_subspaces:
            raise ValueError(
                f"embed dim {d} not divisible by n_subspaces={n_subspaces}"
            )
        if n_rows < n_clusters:
            raise ValueError(f"n_rows={n_rows} < n_clusters={n_clusters}")
        self._overflow_recon = None
        log = progress or (lambda msg: None)
        n_slabs = (n_rows + slab_rows - 1) // slab_rows

        # -- pass 1: strided sample -> coarse + PQ/OPQ training ----------
        per_slab = max(1, (min(train_rows, n_rows) + n_slabs - 1) // n_slabs)
        parts = []
        for i in range(n_slabs):
            start = i * slab_rows
            m_i = min(slab_rows, n_rows - start)
            stride = max(1, m_i // per_slab)
            parts.append(slab_fn(start, m_i)[::stride][:per_slab])
        sample = jnp.concatenate(parts, axis=0)
        del parts
        log(f"sample {sample.shape[0]:,} rows; coarse k-means k={n_clusters}")
        cents, s_assign = kmeans(
            jax.random.PRNGKey(seed), sample, n_clusters, iters=coarse_iters
        )
        pq_take = min(pq_train_rows, sample.shape[0])
        pq_stride = max(1, sample.shape[0] // pq_take)
        resid = (sample - cents[s_assign])[::pq_stride][:pq_take]
        del sample, s_assign
        books, rot = _train_residual_quantizers(
            resid, n_subspaces, n_centroids, pq_iters, opq_iters, seed
        )
        del resid
        self.rotation = rot
        ds = d // n_subspaces

        # -- pass 2: streamed assignment, host list fill -----------------
        mc = max(1, min(spill_choices, n_clusters))

        @functools.partial(jax.jit, static_argnames=("mm", "sub"))
        def slab_topm(slab, c, mm, sub):
            padded_rows = (slab.shape[0] + sub - 1) // sub * sub
            pad = padded_rows - slab.shape[0]
            x = jnp.pad(slab, ((0, pad), (0, 0)))
            x = x.reshape(padded_rows // sub, sub, d)

            def one(chunk):
                sco = chunk @ c.T
                if mm == 1:
                    return jnp.argmax(sco, axis=1).astype(jnp.int32)[:, None]
                return jax.lax.top_k(sco, mm)[1].astype(jnp.int32)

            return jax.lax.map(one, x).reshape(padded_rows, mm)[
                : slab.shape[0]
            ]

        from evr_tpu.index.ivf import fill_inverted_lists_multi

        topm = np.empty((n_rows, mc), np.int32)
        for i in range(n_slabs):
            start = i * slab_rows
            m_i = min(slab_rows, n_rows - start)
            topm[start : start + m_i] = np.asarray(
                slab_topm(slab_fn(start, m_i), cents, mc, assign_sub_rows)
            )
            if i % 25 == 0:
                log(f"assign slab {i + 1}/{n_slabs}")
        capacity = max(
            1, int(np.ceil(n_rows / n_clusters * capacity_factor))
        )
        capacity = (capacity + 7) // 8 * 8
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        placement = fill_inverted_lists_multi(topm, lists, overflow)
        enc_cent = np.where(placement >= 0, placement, topm[:, 0]).astype(
            np.int32
        )
        del placement, topm
        ovf = np.asarray(overflow, np.int64)
        o = len(ovf)
        log(
            f"lists filled: capacity={capacity}, overflow pool {o:,} rows "
            f"({o / n_rows:.2%})"
        )

        # destination slot per row: packed flat slot for placed rows,
        # k*C + pool-index for overflow rows
        flat_ids = lists.reshape(-1)
        valid = flat_ids >= 0
        dest = np.full(n_rows, -1, np.int64)
        dest[flat_ids[valid]] = np.flatnonzero(valid)
        kc = n_clusters * capacity
        dest[ovf] = kc + np.arange(o)
        assert (dest >= 0).all(), "every row must have exactly one slot"

        # -- pass 3: streamed residual encode, HOST pack, one upload -----
        # Two 100M-scale lessons are baked in here (the first streamed
        # build OOMed on both): (a) a u8[k*C, 64] buffer pays 2x HBM under
        # the TPU's (8, 128) byte tiling (13.1 GB at 100M) and a device
        # scatter into it materialises a COPY on top — so codes are packed
        # on the HOST (vectorised fancy assignment) and uploaded once;
        # (b) they are stored PAIRED, [k*C/2, 2S] — the same row-major
        # bytes, a 128-lane minor dim, zero padding — and search reshapes
        # each sliced block back to [C, S].
        rot_j = rot if rot is not None else jnp.zeros((0, 0), jnp.float32)

        @jax.jit
        def encode_slab(slab, c, bks, r_, ec):
            rr = slab - c[ec]
            if r_.shape[0]:
                rr = rr @ r_
            mm = rr.shape[0]
            rss = rr.reshape(mm, n_subspaces, ds).transpose(1, 0, 2)
            c_sq = jnp.sum(jnp.square(bks), axis=2)
            dots = jnp.einsum(
                "smd,skd->smk", rss, bks,
                preferred_element_type=jnp.float32,
            )
            return jnp.argmin(
                c_sq[:, None, :] - 2.0 * dots, axis=2
            ).T.astype(jnp.uint8)                          # [mm, S]

        packed_np = np.zeros((kc, n_subspaces), np.uint8)
        pool_np = np.zeros((max(o, 1), n_subspaces), np.uint8)
        for i in range(n_slabs):
            start = i * slab_rows
            m_i = min(slab_rows, n_rows - start)
            codes_np = np.asarray(encode_slab(
                slab_fn(start, m_i), cents, books, rot_j,
                jnp.asarray(enc_cent[start : start + m_i]),
            ))
            d = dest[start : start + m_i]
            in_main = d < kc
            packed_np[d[in_main]] = codes_np[in_main]
            pool_np[d[~in_main] - kc] = codes_np[~in_main]
            if i % 25 == 0:
                log(f"encode slab {i + 1}/{n_slabs}")

        self.centroids = cents
        self.codebooks = books
        # the always-scanned pool's reconstruction in bf16: at 100M even a
        # ~1% pool is 1M rows, whose fp32 [O, D] GEMM operand (2 GB+)
        # wastes HBM the codes need; bf16 halves it and only affects
        # CANDIDATE selection (rerank= restores exact scores)
        self._pool_dtype = jnp.bfloat16
        # paired upload: [k*C/2, 2S] (row-major identical bytes)
        self.codes_lists = jnp.asarray(
            packed_np.reshape(kc // 2, 2 * n_subspaces)
        )
        self._paired = True
        self.id_lists = jnp.asarray(flat_ids)
        self.overflow = jnp.asarray(ovf.astype(np.int32))
        self.overflow_codes = jnp.asarray(pool_np[:o])
        self._overflow_assign = jnp.asarray(enc_cent[ovf])
        self._n_rows = n_rows
        self.codes = None
        self.list_rows = None
        self._coarse_assign = None
        self._originals = None
        self._codes_t = None
        return self

    def attach_host_store(self, rows_int8, scales) -> None:
        """Attach a HOST-memory full-fidelity row store for exact re-rank
        at scales where the rows cannot live in HBM (the two-tier
        DiskANN/SCaNN-style serving shape: uint8 PQ codes resident on
        device generate candidates; the host DRAM store of int8 rows +
        per-row scales re-scores the top-R exactly). ``search(...,
        rerank=R)`` then gathers R candidate rows per query from host
        memory — a few hundred KB — instead of needing 51 GB of HBM at
        N=100M, D=512."""
        rows_int8 = np.asarray(rows_int8)
        scales = np.asarray(scales, np.float32)
        if rows_int8.dtype != np.int8:
            raise ValueError("host store rows must be int8")
        if rows_int8.shape[0] != scales.shape[0]:
            raise ValueError("rows/scales length mismatch")
        self._originals_int8 = rows_int8
        self._originals_int8_scales = scales

    def append(self, emb_new: np.ndarray) -> np.ndarray:
        """Incremental add WITHOUT retraining: assign new rows to their
        nearest existing coarse centroid, encode their residuals with the
        EXISTING codebooks (one [S, M, K] distance einsum), fill free list
        slots, spill the rest to the overflow pool. Returns new row ids.

        Neither centroids nor codebooks move — rebuild once the corpus
        outgrows the build-time training (FrameIndex applies a 1.5× bound
        for serving). Every-row-lives-exactly-once is preserved.
        """
        if self.codes is None and not self.packed:
            raise ValueError("IVFPQIndex.append before build()")
        emb_new = np.asarray(emb_new, np.float32)
        d = int(self.centroids.shape[1])
        if emb_new.ndim != 2 or emb_new.shape[1] != d:
            raise ValueError(
                f"append rows must be (M, {d}), got {emb_new.shape}"
            )
        if self.packed:
            return self._append_packed(emb_new)
        start = self.n_rows
        m = len(emb_new)
        x = jnp.asarray(emb_new)
        assign = jnp.argmax(x @ self.centroids.T, axis=1)
        resid = x - self.centroids[assign]
        if self.rotation is not None:
            resid = resid @ self.rotation
        s, k, ds = self.codebooks.shape
        rs = resid.reshape(m, s, ds).transpose(1, 0, 2)        # [S, M, d]
        # argmin ||r - c||² = argmin(|c|² - 2 r·c), batched over subspaces
        c_sq = jnp.sum(jnp.square(self.codebooks), axis=2)     # [S, K]
        dots = jnp.einsum(
            "smd,skd->smk", rs, self.codebooks,
            preferred_element_type=jnp.float32,
        )
        codes_new = jnp.argmin(c_sq[:, None, :] - 2.0 * dots, axis=2)

        from evr_tpu.index.ivf import fill_inverted_lists

        lists = np.array(self.list_rows)  # writable host copy
        overflow = list(np.asarray(self.overflow))
        fill_inverted_lists(np.asarray(assign), lists, overflow, start_row=start)

        self.codes = jnp.concatenate(
            [self.codes, codes_new.T.astype(jnp.uint8)], axis=0
        )
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        self._coarse_assign = jnp.concatenate(
            [self._coarse_assign, assign.astype(jnp.int32)]
        )
        if self._originals is not None:
            self._originals = np.concatenate([self._originals, emb_new], axis=0)
        self._codes_t = None
        return np.arange(start, start + m)

    def _append_packed(self, emb_new: np.ndarray) -> np.ndarray:
        if self._paired:
            raise NotImplementedError(
                "append on a paired-layout streamed index is unsupported — "
                "the 100M tier rebuilds (FrameIndex applies its 1.5x "
                "rebuild bound long before this scale)"
            )
        """Packed-layout append, mirroring `IVFIndex._append_packed`:
        assign each new row its nearest centroid, residual-encode against
        it with the FROZEN codebooks, scatter free-slot placements into
        the [k·C, S] code blocks in one `.at[]` dispatch, spill the rest
        (codes + coarse assignment) to the overflow pool."""
        start = self.n_rows
        capacity = self._capacity
        m = len(emb_new)
        x = jnp.asarray(emb_new)
        s, k, ds = self.codebooks.shape
        assign = jnp.argmax(x @ self.centroids.T, axis=1)
        resid = x - self.centroids[assign]
        if self.rotation is not None:
            resid = resid @ self.rotation
        rs = resid.reshape(m, s, ds).transpose(1, 0, 2)
        c_sq = jnp.sum(jnp.square(self.codebooks), axis=2)
        dots = jnp.einsum(
            "smd,skd->smk", rs, self.codebooks,
            preferred_element_type=jnp.float32,
        )
        codes_new = jnp.argmin(
            c_sq[:, None, :] - 2.0 * dots, axis=2
        ).T.astype(jnp.uint8)                                  # [M, S]

        assign_np = np.asarray(assign)
        fill = (
            (np.asarray(self.id_lists).reshape(-1, capacity) >= 0)
            .sum(axis=1)
        )
        li, si, ri, ovf_ri = [], [], [], []
        for i, c in enumerate(assign_np):
            if fill[c] < capacity:
                li.append(int(c))
                si.append(int(fill[c]))
                ri.append(i)
                fill[c] += 1
            else:
                ovf_ri.append(i)
        if li:
            flat = jnp.asarray(
                np.asarray(li, np.int64) * capacity + np.asarray(si, np.int64)
            )
            ri_a = jnp.asarray(ri)
            self.codes_lists = self.codes_lists.at[flat].set(codes_new[ri_a])
            self.id_lists = self.id_lists.at[flat].set(
                (start + np.asarray(ri)).astype(np.int32)
            )
        if ovf_ri:
            ovf_a = jnp.asarray(ovf_ri)
            self.overflow_codes = jnp.concatenate(
                [self.overflow_codes, codes_new[ovf_a]], axis=0
            )
            self._overflow_assign = jnp.concatenate(
                [
                    self._overflow_assign,
                    jnp.asarray(assign_np[ovf_ri].astype(np.int32)),
                ]
            )
            self.overflow = jnp.concatenate(
                [
                    self.overflow,
                    jnp.asarray(
                        (start + np.asarray(ovf_ri)).astype(np.int32)
                    ),
                ]
            )
        self._n_rows += m
        return np.arange(start, start + m)

    def _pool_recon(self):
        """PQ-reconstructed overflow rows ``c(x) + r̃(x)`` as a [O, D] fp32
        device array (lazily cached, invalidated by append growth).

        The pool is searched by EVERY query, and its ADC one-hot is shared
        across the batch — but at the 10M geometry that shared one-hot is
        still a ~1.9 GB [O, S, K] HBM materialisation per dispatch. Since
        the pool's ADC score ``q·c + Σ_s q_s·book_s[code_s]`` equals
        ``q·(c + r̃)`` exactly (up to fp summation order), storing the
        reconstruction once (O ≲ 0.6% of the corpus under spill placement
        — 117 MB fp32 at N=10M vs 640 MB codes) turns every pool scoring
        into one plain [B, D]×[D, O] MXU GEMM with no one-hot at all."""
        o = int(self.overflow.shape[0])
        if self._overflow_recon is not None and (
            int(self._overflow_recon.shape[0]) == o
        ):
            return self._overflow_recon
        dtype = getattr(self, "_pool_dtype", None) or jnp.float32
        books = np.asarray(self.codebooks)  # [S, K, ds]
        s, _, ds = books.shape
        if o == 0:
            self._overflow_recon = jnp.zeros((0, s * ds), dtype)
            return self._overflow_recon
        codes = np.asarray(self.overflow_codes).astype(np.int64)  # [O, S]
        resid = books[np.arange(s)[None, :], codes, :]  # [O, S, ds]
        resid = resid.reshape(o, s * ds)
        if self.rotation is not None:
            # codes live in rotated space: r = r_rot @ Rᵀ (R orthogonal)
            resid = resid @ np.asarray(self.rotation).T
        recon = (
            np.asarray(self.centroids)[np.asarray(self._overflow_assign)]
            + resid
        ).astype(np.float32)
        self._overflow_recon = jnp.asarray(recon, dtype)
        return self._overflow_recon

    # Large arrays are ARGUMENTS, not closures: closed-over device arrays
    # become jaxpr constants and wedge this environment's remote compiler
    # (CLAUDE.md). The per-candidate codes are gathered PER SUBSPACE inside
    # the scan ([B, M] per step from the [S, N] uint8 operand) — an
    # up-front [B, M, S] gather would materialize GBs at the 100M-row
    # geometry this tier targets.
    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k", "nprobe"))
    def _probe_adc_search(
        q, q_adc, cents, list_rows, overflow, coarse_assign, books, codes_t,
        top_k: int, nprobe: int,
    ):
        b = q.shape[0]
        s, k, ds = books.shape
        # ADC tables use the OPQ-rotated query (q_adc == q without OPQ);
        # the coarse q·c term below stays unrotated
        qs = q_adc.reshape(b, s, ds).transpose(1, 0, 2)    # [S, B, d]
        tables = jnp.einsum(
            "sbd,skd->sbk", qs, books,
            preferred_element_type=jnp.float32,
        )                                                   # [S, B, K]

        cscores = q @ cents.T                               # [B, k]
        _, cids = jax.lax.top_k(cscores, nprobe)            # [B, nprobe]
        cand = list_rows[cids].reshape(b, -1)               # [B, n*C]
        # coarse term: the probed list's centroid score, broadcast to
        # its rows (q·c of the row's OWN centroid — identical for every
        # row in a list by construction)
        coarse = jnp.repeat(
            jnp.take_along_axis(cscores, cids, axis=1),
            list_rows.shape[1],
            axis=1,
        )                                                   # [B, n*C]
        if overflow.shape[0]:
            cand = jnp.concatenate(
                [cand, jnp.broadcast_to(overflow, (b, overflow.shape[0]))],
                axis=1,
            )
            # overflow rows probe their own assigned centroid
            over_c = coarse_assign[overflow]                # [O]
            coarse = jnp.concatenate(
                [coarse, cscores[:, over_c]], axis=1
            )
        valid = cand >= 0
        safe = jnp.where(valid, cand, 0)                    # [B, M] int32

        # residual term: scan over subspaces, [B, M] working set
        def body(acc, inputs):
            table_s, col_s = inputs                         # [B,K], [N]u8
            code_s = col_s[safe]                            # [B, M]
            return acc + jnp.take_along_axis(
                table_s, code_s.astype(jnp.int32), axis=1
            ), None

        resid_score, _ = jax.lax.scan(
            body,
            jnp.zeros(cand.shape, jnp.float32),
            (tables, codes_t),
        )
        scores = jnp.where(valid, coarse + resid_score, -jnp.inf)
        top_scores, top_pos = jax.lax.top_k(scores, top_k)
        return top_scores, jnp.take_along_axis(cand, top_pos, axis=1)

    @staticmethod
    @functools.partial(
        jax.jit,
        static_argnames=(
            "top_k", "nprobe", "capacity", "adc_impl", "interpret",
            "paired",
        ),
    )
    def _probe_adc_search_packed(
        q, q_adc, cents, books, codes_lists, id_lists,
        overflow_recon, overflow_ids,
        top_k: int, nprobe: int, capacity: int, adc_impl: str = "xla",
        interpret: bool = False, paired: bool = False,
    ):
        """Packed-layout ADC: list i's codes live contiguously at flat
        rows [i·C, (i+1)·C), so each probed list is ONE copy-free
        [C, S] `dynamic_slice`. The table lookup itself is formulated as a
        **one-hot × table contraction on the MXU**, not a `jnp.take`:
        per-element gathers run on the TPU's scalar unit and measured
        ~6.5 ms per probed list per batch at C=1664, S=64 — the one-hot
        GEMM (bf16 one-hot entries are exact 0/1, tables stay fp32, fp32
        accumulation, so the looked-up values are EXACT) measures 7×
        faster end-to-end (PERF.md §ADC). ``adc_impl="xla"`` materialises
        that one-hot through HBM under a `lax.scan` over probes;
        ``adc_impl="pallas"`` scans the probes the same way but routes
        each [B, C, S] probe step through `ops/adc_pallas.py`, which
        builds the one-hot chunk-wise in VMEM so HBM only ever sees uint8
        codes in / fp32 scores out (``interpret`` is resolved by the
        caller — `search` — so trace-time backend probing never disagrees
        with the executing backend). The coarse term q·c_list is added
        outside either path: every row in a list was residual-encoded
        against THAT list's centroid (spill-aware build), so
        q·c_list + q·r̃ is coherent. The overflow pool is scored as ONE
        [B, D]×[D, O] GEMM against its PQ-reconstructed rows
        (``_pool_recon``: q·(c + r̃) ≡ the pool's ADC score) — no pool
        one-hot exists in either impl."""
        b = q.shape[0]
        s, kk, ds = books.shape
        # ADC tables from the OPQ-rotated query; coarse q·c and the pool
        # GEMM (un-rotated reconstructions) from the raw query
        qs = q_adc.reshape(b, s, ds).transpose(1, 0, 2)      # [S, B, d]
        tables = jnp.einsum(
            "sbd,skd->bsk", qs, books,
            preferred_element_type=jnp.float32,
        )                                                     # [B, S, K]

        cscores = q @ cents.T                                 # [B, k]
        cvals, cids = jax.lax.top_k(cscores, nprobe)          # [B, nprobe]

        if adc_impl == "pallas":
            from evr_tpu.ops.adc_pallas import adc_list_scores

            # scan over probes, [B, C, S] working set per step — the HBM
            # envelope matches the xla path's scan bound instead of
            # materialising all [B*nprobe, C, S] probed blocks at once
            starts = (cids * capacity).T                      # [nprobe, B]
            coarse = cvals.T                                  # [nprobe, B]

            def step(carry, inp):
                st, co = inp                                  # [B], [B]

                def slice_one(s0):
                    if paired:
                        # [C/2, 2S] physical rows -> logical [C, S]
                        blk = jax.lax.dynamic_slice(
                            codes_lists, (s0 // 2, 0), (capacity // 2, 2 * s)
                        ).reshape(capacity, s)
                    else:
                        blk = jax.lax.dynamic_slice(
                            codes_lists, (s0, 0), (capacity, s)
                        )
                    ids1 = jax.lax.dynamic_slice(
                        id_lists, (s0,), (capacity,)
                    )
                    return blk, ids1

                blocks, ids1 = jax.vmap(slice_one)(st)        # [B, C, S]
                resid = adc_list_scores(
                    blocks, tables, nprobe=1, interpret=interpret
                )                                             # [B, C]
                sco1 = resid + co[:, None]
                return carry, (jnp.where(ids1 >= 0, sco1, -jnp.inf), ids1)

            _, (sco, ids) = jax.lax.scan(step, 0, (starts, coarse))
            scores = sco.transpose(1, 0, 2).reshape(b, -1)
            ids = ids.transpose(1, 0, 2).reshape(b, -1)
        else:
            starts = (cids * capacity).T                      # [nprobe, B]
            coarse = cvals.T                                  # [nprobe, B]

            def step(carry, inp):
                st, co = inp                                  # [B], [B]

                def one(s0, tb, c0):
                    if paired:
                        # [C/2, 2S] physical rows -> logical [C, S]; s0 is
                        # cids*capacity with capacity 8-aligned, so s0//2
                        # is exact
                        blk = jax.lax.dynamic_slice(
                            codes_lists, (s0 // 2, 0), (capacity // 2, 2 * s)
                        ).reshape(capacity, s)
                    else:
                        blk = jax.lax.dynamic_slice(
                            codes_lists, (s0, 0), (capacity, s)
                        )                                     # [C, S] u8
                    ids1 = jax.lax.dynamic_slice(
                        id_lists, (s0,), (capacity,)
                    )
                    oh = jax.nn.one_hot(
                        blk.astype(jnp.int32), kk, dtype=jnp.bfloat16
                    )                                         # [C, S, K]
                    sco1 = c0 + jnp.einsum(
                        "csk,sk->c", oh, tb,
                        preferred_element_type=jnp.float32,
                    )
                    return jnp.where(ids1 >= 0, sco1, -jnp.inf), ids1

                sco1, ids1 = jax.vmap(one)(st, tables, co)    # [B, C] each
                return carry, (sco1, ids1)

            _, (sco, ids) = jax.lax.scan(step, 0, (starts, coarse))
            scores = sco.transpose(1, 0, 2).reshape(b, -1)
            ids = ids.transpose(1, 0, 2).reshape(b, -1)
        if overflow_ids.shape[0]:
            o = overflow_ids.shape[0]
            # q·(c + r̃) of the reconstructed pool rows — one MXU GEMM,
            # identical values to the pool's ADC decomposition
            ovf = jax.lax.dot_general(
                q.astype(overflow_recon.dtype), overflow_recon,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # [B, O]
            # −1 pool ids exist only in the stacked mesh-sharded layout
            # (shards pad to the largest pool); mask them like list padding
            ovf = jnp.where(overflow_ids[None, :] >= 0, ovf, -jnp.inf)
            scores = jnp.concatenate([scores, ovf], axis=1)
            ids = jnp.concatenate(
                [ids, jnp.broadcast_to(overflow_ids, (b, o))], axis=1
            )
        top_scores, top_pos = jax.lax.top_k(scores, top_k)
        return top_scores, jnp.take_along_axis(ids, top_pos, axis=1)

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        nprobe: int,
        rerank: int | None = None,
        adc_impl: str = "auto",
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], row ids [B, k]); unreachable slots carry
        (-inf, -1). Without ``rerank`` scores are the ADC approximation
        q·c + q̃·r̃; with it, exact cosines of the re-scored candidates.
        ``adc_impl``: "xla" (HBM one-hot GEMM — the default), "pallas"
        (in-VMEM one-hot, `ops/adc_pallas.py`, opt-in), or "auto"
        (= xla). The round-5 decision record (PERF.md §ADC): synthetic
        shoot-outs favoured pallas (up to 2.5× at 100M list capacity),
        but on REAL indexes xla wins at every nprobe — 10M build_device
        4.41 vs 5.58 ms at nprobe=8, 100M paired streamed 79.5 vs 92.4
        at nprobe=32 — so the serving default follows the real-tier
        measurement. Opting in to pallas carries a per-instance fallback:
        a Mosaic compile failure demotes this instance to "xla"
        permanently (logged once); the ``fused=True`` MXU-matvec kernel
        variant does NOT lower on v5e Mosaic (unsupported shape cast)."""
        if self.codes is None and not self.packed:
            raise ValueError("IVFPQIndex.search before build()")
        if (
            rerank is not None
            and self._originals is None
            and self._originals_int8 is None
        ):
            raise ValueError(
                "rerank requires keep_originals=True at build or an "
                "attach_host_store() int8 row store"
            )
        if adc_impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown adc_impl {adc_impl!r}")
        if adc_impl == "auto":
            # "auto" stays on xla — decided by REAL-INDEX measurement
            # (round 5, PERF.md §ADC): on synthetic codes the in-VMEM
            # pallas one-hot measured −25%..2.5×, but on the real 10M
            # build_device index xla wins at every nprobe (4.41 vs 5.58
            # ms at nprobe=8, 69.7 vs 88.7 at 128) and on the real paired
            # 100M streamed index likewise (79.5 vs 92.4 at nprobe=32).
            # The serving default follows the served path, not the
            # microbenchmark; pallas stays opt-in (with the per-instance
            # Mosaic-failure demotion below for callers who opt in).
            adc_impl = "xla"
        nprobe = max(1, min(nprobe, self.n_clusters))
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        q_adc = q if self.rotation is None else q @ self.rotation
        cap = self._capacity * nprobe + int(self.overflow.shape[0])
        fetch = max(1, min(top_k if rerank is None else max(top_k, rerank),
                           cap, self.n_rows))
        if self.packed:
            try:
                scores, rows = self._probe_adc_search_packed(
                    q, q_adc, self.centroids, self.codebooks,
                    self.codes_lists, self.id_lists,
                    self._pool_recon(), self.overflow,
                    fetch, nprobe, self._capacity, adc_impl,
                    interpret=jax.default_backend() != "tpu",
                    paired=self._paired,
                )
            except Exception:
                if adc_impl != "pallas":
                    raise
                # Mosaic lowering failed on this backend: demote this
                # instance to the XLA one-hot path and remember it
                self._pallas_broken = True
                from evr_tpu.utils import get_logger

                get_logger("evr_tpu.index").warning(
                    "adc_impl=pallas failed to compile on %s; falling "
                    "back to xla for this index",
                    jax.default_backend(),
                )
                scores, rows = self._probe_adc_search_packed(
                    q, q_adc, self.centroids, self.codebooks,
                    self.codes_lists, self.id_lists,
                    self._pool_recon(), self.overflow,
                    fetch, nprobe, self._capacity, "xla",
                    interpret=jax.default_backend() != "tpu",
                    paired=self._paired,
                )
        else:
            if self._codes_t is None:
                self._codes_t = self.codes.T  # [S, N] uint8 scan operand
            scores, rows = self._probe_adc_search(
                q, q_adc, self.centroids, self.list_rows, self.overflow,
                self._coarse_assign, self.codebooks, self._codes_t,
                fetch, nprobe,
            )
        scores, rows = np.asarray(scores), np.asarray(rows)
        rows = np.where(np.isfinite(scores), rows, -1)
        if rerank is None:
            k = min(top_k, fetch)
            return scores[:, :k], rows[:, :k]
        qn = np.asarray(q)
        safe_rows = np.where(rows >= 0, rows, 0)
        if self._originals is not None:
            cand = self._originals[safe_rows]                  # [B, R, D]
            exact = np.einsum("bd,brd->br", qn, cand).astype(np.float32)
        else:
            cand = self._originals_int8[safe_rows].astype(np.float32)
            cand *= self._originals_int8_scales[safe_rows][:, :, None]
            exact = np.einsum("bd,brd->br", qn, cand).astype(np.float32)
        exact = np.where(rows >= 0, exact, -np.inf)
        k = min(top_k, exact.shape[1])
        order = np.argsort(-exact, axis=1)[:, :k]
        out_rows = np.take_along_axis(rows, order, axis=1)
        out_scores = np.take_along_axis(exact, order, axis=1)
        return out_scores, np.where(np.isfinite(out_scores), out_rows, -1)

    # -- persistence --------------------------------------------------------
    def save(self, path) -> None:
        if self.packed:
            arrs_p = dict(
                centroids=np.asarray(self.centroids),
                codebooks=np.asarray(self.codebooks),
                codes_lists=np.asarray(self.codes_lists),
                id_lists=np.asarray(self.id_lists),
                overflow=np.asarray(self.overflow),
                overflow_codes=np.asarray(self.overflow_codes),
                overflow_assign=np.asarray(self._overflow_assign),
                n_rows=np.int64(self._n_rows),
            )
            if self.rotation is not None:
                arrs_p["rotation"] = np.asarray(self.rotation)
            if self._paired:
                arrs_p["paired"] = np.bool_(True)
            if getattr(self, "_pool_dtype", None) == jnp.bfloat16:
                arrs_p["pool_bf16"] = np.bool_(True)
            np.savez(path, **arrs_p)
            return
        arrs = {
            "centroids": np.asarray(self.centroids),
            "list_rows": np.asarray(self.list_rows),
            "overflow": np.asarray(self.overflow),
            "codebooks": np.asarray(self.codebooks),
            "codes": np.asarray(self.codes),
            "coarse_assign": np.asarray(self._coarse_assign),
        }
        if self._originals is not None:
            arrs["originals"] = self._originals
        np.savez(path, **arrs)

    @classmethod
    def load(cls, path) -> "IVFPQIndex":
        z = np.load(path)
        idx = cls()
        idx.centroids = jnp.asarray(z["centroids"])
        idx.codebooks = jnp.asarray(z["codebooks"])
        idx.overflow = jnp.asarray(z["overflow"].astype(np.int32))
        if "rotation" in z.files:
            idx.rotation = jnp.asarray(z["rotation"])
        if "codes_lists" in z.files:
            idx.codes_lists = jnp.asarray(z["codes_lists"])
            idx._paired = bool(z["paired"]) if "paired" in z.files else False
            if "pool_bf16" in z.files and bool(z["pool_bf16"]):
                idx._pool_dtype = jnp.bfloat16
            idx.id_lists = jnp.asarray(z["id_lists"])
            idx.overflow_codes = jnp.asarray(z["overflow_codes"])
            idx._overflow_assign = jnp.asarray(
                z["overflow_assign"].astype(np.int32)
            )
            idx._n_rows = int(z["n_rows"])
            return idx
        idx.list_rows = jnp.asarray(z["list_rows"])
        idx.codes = jnp.asarray(z["codes"])
        idx._coarse_assign = jnp.asarray(z["coarse_assign"])
        idx._originals = z["originals"] if "originals" in z.files else None
        return idx
