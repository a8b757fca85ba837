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
  gather candidate row-ids and their [M, S] codes → ADC. The score
  decomposes exactly as ``q·x ≈ q·c + q·residual``: the first term is the
  already-computed centroid score broadcast over the list, the second is a
  per-query [S, K] table accumulated over subspaces with a `lax.scan` of
  [B, M] gathers (working set [B, M], never [B, M, S]).
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


class IVFPQIndex:
    """Probed, compressed cosine top-k. ``build`` once over L2-normalised
    embeddings; ``search(queries, top_k, nprobe, rerank=)`` is one jitted
    dispatch (+ optional host re-rank)."""

    def __init__(self):
        self.centroids = None   # [k, D] fp32
        self.list_rows = None   # [k, C] int32, -1 padded
        self.overflow = None    # [O] int32
        self.codebooks = None   # [S, K, d] fp32 (residual quantizer)
        self.codes = None       # [N, S] uint8
        self._coarse_assign = None  # [N] int32 (overflow scoring)
        self._originals = None  # [N, D] HOST fp32 (only if kept)
        self._codes_t = None    # [S, N] uint8 scan operand (lazy)

    @property
    def n_rows(self) -> int:
        return 0 if self.codes is None else int(self.codes.shape[0])

    @property
    def n_clusters(self) -> int:
        return 0 if self.centroids is None else int(self.centroids.shape[0])

    @property
    def code_bytes(self) -> int:
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

        x = jnp.asarray(emb)
        cents, assign = kmeans(
            jax.random.PRNGKey(seed), x, n_clusters, iters=coarse_iters
        )
        assign_np = np.asarray(assign)

        # residuals from the coarse centroid — the fine quantizer's input
        resid = x - cents[assign]
        ds = d // n_subspaces
        rs = resid.reshape(n, n_subspaces, ds).transpose(1, 0, 2)  # [S,N,d]
        keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_subspaces)
        books, codes = jax.vmap(
            lambda k_, xs: kmeans_l2(k_, xs, n_centroids, iters=pq_iters)
        )(keys, rs)

        # inverted lists: identical semantics to ivf.IVFIndex.build —
        # corpus-order fill, beyond-capacity rows spill to the overflow pool
        from evr_tpu.index.ivf import fill_inverted_lists

        capacity = max(1, int(np.ceil(n / n_clusters * capacity_factor)))
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        fill_inverted_lists(assign_np, lists, overflow)

        self.centroids = cents
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        self.codebooks = books
        self.codes = codes.T.astype(jnp.uint8)       # [N, S]
        self._coarse_assign = jnp.asarray(assign_np)  # [N] (overflow scoring)
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
    ) -> "IVFPQIndex":
        """10M+-row build from a device-resident corpus, mirroring
        ``IVFIndex.build_device``: coarse k-means AND the residual PQ
        codebooks train fp32 on a strided sample; assignment + residual
        encoding then stream device slabs (one jitted program per slab —
        argmax GEMM, residual subtract, per-subspace L2 code argmin).
        Only the [N] assignment crosses to the host; the uint8 codes
        (S bytes/row — 640 MB at N=10M, S=64) stay resident. Originals are
        NOT retained (no host re-rank at this tier).

        ``row_scales``: pass when ``x_dev`` is an int8-quantized corpus
        (per-row symmetric scales) — rows are dequantised slab-wise before
        residual encoding so the PQ codebooks see true magnitudes."""
        import jax.numpy as jnp

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
        m = resid.shape[0]
        ds = d // n_subspaces
        rs = resid.reshape(m, n_subspaces, ds).transpose(1, 0, 2)
        keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_subspaces)
        books, _ = jax.vmap(
            lambda k_, xs: kmeans_l2(k_, xs, n_centroids, iters=pq_iters)
        )(keys, rs)

        @jax.jit
        def encode_slab(slab, scales, c, bks):
            x = slab.astype(jnp.float32) * scales[:, None]
            assign = jnp.argmax(x @ c.T, axis=1)
            r = x - c[assign]
            mm = r.shape[0]
            rss = r.reshape(mm, n_subspaces, ds).transpose(1, 0, 2)
            c_sq = jnp.sum(jnp.square(bks), axis=2)          # [S, K]
            dots = jnp.einsum(
                "smd,skd->smk", rss, bks, preferred_element_type=jnp.float32
            )
            codes = jnp.argmin(c_sq[:, None, :] - 2.0 * dots, axis=2)
            return assign.astype(jnp.int32), codes.T.astype(jnp.uint8)

        assigns, code_slabs = [], []
        for i in range(0, n, slab_rows):
            slab = x_dev[i : i + slab_rows]
            scales = (
                row_scales[i : i + slab_rows]
                if row_scales is not None
                else jnp.ones((slab.shape[0],), jnp.float32)
            )
            a, cd = encode_slab(slab, scales, cents, books)
            assigns.append(np.asarray(a))
            code_slabs.append(cd)
        assign_np = np.concatenate(assigns)

        from evr_tpu.index.ivf import fill_inverted_lists

        capacity = max(1, int(np.ceil(n / n_clusters * capacity_factor)))
        lists = np.full((n_clusters, capacity), -1, np.int32)
        overflow: list = []
        fill_inverted_lists(assign_np, lists, overflow)

        self.centroids = cents
        self.list_rows = jnp.asarray(lists)
        self.overflow = jnp.asarray(np.asarray(overflow, np.int32))
        self.codebooks = books
        self.codes = (
            jnp.concatenate(code_slabs) if len(code_slabs) > 1 else code_slabs[0]
        )
        self._coarse_assign = jnp.asarray(assign_np)
        self._originals = None
        self._codes_t = None
        return self

    def append(self, emb_new: np.ndarray) -> np.ndarray:
        """Incremental add WITHOUT retraining: assign new rows to their
        nearest existing coarse centroid, encode their residuals with the
        EXISTING codebooks (one [S, M, K] distance einsum), fill free list
        slots, spill the rest to the overflow pool. Returns new row ids.

        Neither centroids nor codebooks move — rebuild once the corpus
        outgrows the build-time training (FrameIndex applies a 1.5× bound
        for serving). Every-row-lives-exactly-once is preserved.
        """
        if self.codes is None:
            raise ValueError("IVFPQIndex.append before build()")
        emb_new = np.asarray(emb_new, np.float32)
        d = int(self.centroids.shape[1])
        if emb_new.ndim != 2 or emb_new.shape[1] != d:
            raise ValueError(
                f"append rows must be (M, {d}), got {emb_new.shape}"
            )
        start = self.n_rows
        m = len(emb_new)
        x = jnp.asarray(emb_new)
        assign = jnp.argmax(x @ self.centroids.T, axis=1)
        resid = x - self.centroids[assign]
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

    # Large arrays are ARGUMENTS, not closures: closed-over device arrays
    # become jaxpr constants and wedge this environment's remote compiler
    # (CLAUDE.md). The per-candidate codes are gathered PER SUBSPACE inside
    # the scan ([B, M] per step from the [S, N] uint8 operand) — an
    # up-front [B, M, S] gather would materialize GBs at the 100M-row
    # geometry this tier targets.
    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k", "nprobe"))
    def _probe_adc_search(
        q, cents, list_rows, overflow, coarse_assign, books, codes_t,
        top_k: int, nprobe: int,
    ):
        b = q.shape[0]
        s, k, ds = books.shape
        qs = q.reshape(b, s, ds).transpose(1, 0, 2)        # [S, B, d]
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

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        nprobe: int,
        rerank: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], row ids [B, k]); unreachable slots carry
        (-inf, -1). Without ``rerank`` scores are the ADC approximation
        q·c + q̃·r̃; with it, exact cosines of the re-scored candidates."""
        if self.codes is None:
            raise ValueError("IVFPQIndex.search before build()")
        if rerank is not None and self._originals is None:
            raise ValueError("rerank requires keep_originals=True at build")
        nprobe = max(1, min(nprobe, self.n_clusters))
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        cap = self.list_rows.shape[1] * nprobe + int(self.overflow.shape[0])
        fetch = max(1, min(top_k if rerank is None else max(top_k, rerank),
                           cap, self.n_rows))
        if self._codes_t is None:
            self._codes_t = self.codes.T  # [S, N] uint8 scan operand
        scores, rows = self._probe_adc_search(
            q, self.centroids, self.list_rows, self.overflow,
            self._coarse_assign, self.codebooks, self._codes_t,
            fetch, nprobe,
        )
        scores, rows = np.asarray(scores), np.asarray(rows)
        rows = np.where(np.isfinite(scores), rows, -1)
        if rerank is None:
            k = min(top_k, fetch)
            return scores[:, :k], rows[:, :k]
        qn = np.asarray(q)
        cand = self._originals[np.where(rows >= 0, rows, 0)]   # [B, R, D]
        exact = np.einsum("bd,brd->br", qn, cand).astype(np.float32)
        exact = np.where(rows >= 0, exact, -np.inf)
        k = min(top_k, exact.shape[1])
        order = np.argsort(-exact, axis=1)[:, :k]
        out_rows = np.take_along_axis(rows, order, axis=1)
        out_scores = np.take_along_axis(exact, order, axis=1)
        return out_scores, np.where(np.isfinite(out_scores), out_rows, -1)

    # -- persistence --------------------------------------------------------
    def save(self, path) -> None:
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
        idx.list_rows = jnp.asarray(z["list_rows"])
        idx.overflow = jnp.asarray(z["overflow"].astype(np.int32))
        idx.codebooks = jnp.asarray(z["codebooks"])
        idx.codes = jnp.asarray(z["codes"])
        idx._coarse_assign = jnp.asarray(z["coarse_assign"])
        idx._originals = z["originals"] if "originals" in z.files else None
        return idx
