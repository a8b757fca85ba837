"""Product-quantized (PQ) cosine retrieval — the memory tier.

The exact index stores fp32/bf16/int8 rows (4/2/1 bytes per dim); past
~100M frames even int8 outgrows HBM (100M x 512 = 51 GB). PQ stores each
row as S uint8 centroid codes (S bytes per ROW — 512-d fp32 → 64 bytes at
S=64, a 32x compression), and scores queries against codes without ever
reconstructing the vectors:

- **Train** (`pq_train`): split D into S subspaces of D/S dims; run plain
  Euclidean k-means (Lloyd's under `lax.scan`) independently per subspace,
  vmapped over the subspace axis so all S quantizers train as one batched
  MXU program. K <= 256 centroids per subspace → one uint8 code each.
- **Encode** (`pq_encode`): per-subspace nearest centroid, argmin over one
  [N, K] distance GEMM per subspace (vmapped).
- **Search** (asymmetric distance computation, ADC): per query build the
  [S, K] inner-product table in fp32 (one tiny einsum — the query is NOT
  quantized, hence "asymmetric"), then accumulate scores over subspaces
  with a `lax.scan` of [B, N] table-gathers (bounded memory: the [B, N]
  accumulator, never [B, N, S]) and finish with `lax.top_k`. Because rows
  are L2-normalised before encoding, the summed inner product approximates
  the cosine the exact tiers compute.
- **Re-rank** (optional): when the original rows are retained on HOST
  memory (not HBM — keeping them on device would defeat the tier), the
  top-R ADC candidates are re-scored exactly with one small numpy GEMM,
  recovering most of the quantization recall at negligible cost.

The reference brute-forces numpy fp32 (`Backend/services/embedding_service
.py:505-533`) and has no compressed tier; this module has no reference
counterpart. See `index/ivf.py` for the list-probing tier (cuts rows
*read*); PQ cuts bytes *per row*. `bench_kernels pq` prints the measured
speed/recall/memory table.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_centroids", "iters"))
def kmeans_l2(key, x, n_centroids: int, iters: int = 10):
    """Plain Euclidean k-means on device (contrast `ivf.kmeans`, which is
    spherical). ``x`` [N, d]. Returns (centroids [K, d], assignments [N]).

    Assignment is argmin ||x - c||² = argmin(|c|² - 2 x·c) — one GEMM;
    update is a `segment_sum` mean; empty clusters keep their previous
    centroid.
    """
    n = x.shape[0]
    init = x[jax.random.choice(key, n, (n_centroids,), replace=False)]

    def assign_to(cents):
        d = jnp.sum(jnp.square(cents), axis=1)[None, :] - 2.0 * (x @ cents.T)
        return jnp.argmin(d, axis=1)

    def step(cents, _):
        a = assign_to(cents)
        sums = jax.ops.segment_sum(x, a, num_segments=n_centroids)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), x.dtype), a, num_segments=n_centroids
        )
        fresh = sums / jnp.maximum(counts[:, None], 1.0)
        cents = jnp.where(counts[:, None] > 0, fresh, cents)
        return cents, None

    cents, _ = jax.lax.scan(step, init, None, length=iters)
    return cents, assign_to(cents).astype(jnp.int32)


class PQIndex:
    """ADC cosine top-k over uint8 PQ codes.

    ``build`` over L2-normalised [N, D] embeddings; ``search`` is a single
    jitted dispatch (+ an optional host re-rank). Resident state: codebooks
    [S, K, D/S] fp32 (tiny) and codes [N, S] uint8.
    """

    def __init__(self):
        self.codebooks = None   # [S, K, d] device fp32
        self.codes = None       # [N, S] device uint8
        self.rotation = None    # [D, D] device fp32 (OPQ only)
        self._originals = None  # [N, D] HOST np.float32 (only if kept)
        self._codes_t = None    # [S, N] uint8 scan operand (lazy)

    @property
    def n_rows(self) -> int:
        return 0 if self.codes is None else int(self.codes.shape[0])

    @property
    def code_bytes(self) -> int:
        """HBM bytes for the code matrix (the compression headline)."""
        return 0 if self.codes is None else int(np.prod(self.codes.shape))

    def build(
        self,
        emb: np.ndarray,
        n_subspaces: int = 64,
        n_centroids: int = 256,
        iters: int = 10,
        seed: int = 0,
        keep_originals: bool = True,
        opq_iters: int = 0,
    ) -> "PQIndex":
        """``opq_iters > 0`` enables OPQ (Ge et al., CVPR 2013 — public
        method): alternate (a) train PQ on the rotated data, (b) update an
        orthogonal rotation R by Procrustes (SVD of XᵀX̂, a [D, D] host
        SVD) so the rotation spreads correlated variance across subspaces.
        Same bytes, strictly more degrees of freedom — R=I reproduces
        plain PQ. Queries are rotated once per search (a [B, D]·[D, D]
        matvec, noise next to the ADC scan)."""
        emb = np.asarray(emb, np.float32)
        n, d = emb.shape
        if d % n_subspaces:
            raise ValueError(
                f"embed dim {d} not divisible by n_subspaces={n_subspaces}"
            )
        if not 1 <= n_centroids <= 256:
            raise ValueError("n_centroids must be in [1, 256] (uint8 codes)")
        if n_centroids > n:
            raise ValueError(f"n_centroids={n_centroids} > n_rows={n}")
        ds = d // n_subspaces

        def train(x_np, kmeans_iters):
            xs = jnp.asarray(x_np).reshape(n, n_subspaces, ds).transpose(1, 0, 2)
            keys = jax.random.split(jax.random.PRNGKey(seed), n_subspaces)
            return jax.vmap(
                lambda k, x: kmeans_l2(k, x, n_centroids, iters=kmeans_iters)
            )(keys, xs)

        rot = None
        x = emb
        if opq_iters > 0:
            rot = np.eye(d, dtype=np.float32)
            inner = max(2, iters // 2)  # cheap inner trainings, full at end
            for _ in range(opq_iters):
                xr = emb @ rot
                cents, assign = train(xr, inner)
                recon = _decode_np(np.asarray(cents), np.asarray(assign).T)
                # Procrustes: argmin_R ||emb @ R - recon||_F over orthogonal
                # R has the closed form U Vᵀ from SVD(embᵀ recon)
                u, _, vt = np.linalg.svd(emb.T @ recon)
                rot = (u @ vt).astype(np.float32)
            x = emb @ rot

        cents, assign = train(x, iters)
        self.codebooks = cents                       # [S, K, d]
        self.codes = assign.T.astype(jnp.uint8)      # [N, S]
        self.rotation = jnp.asarray(rot) if rot is not None else None
        self._originals = emb if keep_originals else None
        self._codes_t = None
        return self

    # Large arrays are ARGUMENTS, not closures: closed-over device arrays
    # become jaxpr constants and wedge this environment's remote compiler
    # (CLAUDE.md). Codes stay uint8 end-to-end — an int32 copy would 4x
    # the very footprint this tier exists to shrink.
    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k",))
    def _adc_search(q, books, codes_t, top_k: int):
        s, k, ds = books.shape
        b = q.shape[0]
        qs = q.reshape(b, s, ds).transpose(1, 0, 2)         # [S, B, d]
        tables = jnp.einsum(
            "sbd,skd->sbk", qs, books,
            preferred_element_type=jnp.float32,
        )                                                    # [S, B, K]

        # accumulate over subspaces: [B, N] working set, never [B,N,S]
        def body(acc, inputs):
            table_s, code_s = inputs                        # [B,K], [N]u8
            return acc + table_s[:, code_s], None

        scores, _ = jax.lax.scan(
            body,
            jnp.zeros((b, codes_t.shape[1]), jnp.float32),
            (tables, codes_t),
        )
        return jax.lax.top_k(scores, top_k)

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        rerank: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [B, k], row ids [B, k]).

        ``rerank``: fetch this many ADC candidates and re-score them
        exactly against the retained originals (requires
        ``keep_originals=True`` at build). Scores are then exact cosines;
        without re-rank they are the ADC approximation.
        """
        if self.codes is None:
            raise ValueError("PQIndex.search before build()")
        q = np.atleast_2d(np.asarray(queries, np.float32))
        top_k = max(1, min(top_k, self.n_rows))
        if rerank is not None and self._originals is None:
            raise ValueError("rerank requires keep_originals=True at build")
        fetch = top_k if rerank is None else max(top_k, min(rerank, self.n_rows))
        if self._codes_t is None:
            self._codes_t = self.codes.T  # [S, N] uint8, the scan operand
        q_dev = jnp.asarray(q)
        if self.rotation is not None:
            # OPQ: codes live in the rotated basis; q·x = (qR)·(xR)
            q_dev = q_dev @ self.rotation
        scores, rows = self._adc_search(
            q_dev, self.codebooks, self._codes_t, fetch
        )
        scores, rows = np.asarray(scores), np.asarray(rows)
        if rerank is None:
            return scores[:, :top_k], rows[:, :top_k]
        # exact host re-rank of the candidate set: [B, R, D] gather + GEMM
        cand = self._originals[rows]                          # [B, R, D]
        exact = np.einsum("bd,brd->br", q, cand).astype(np.float32)
        order = np.argsort(-exact, axis=1)[:, :top_k]
        return (
            np.take_along_axis(exact, order, axis=1),
            np.take_along_axis(rows, order, axis=1),
        )

    def reconstruct(self, rows: np.ndarray) -> np.ndarray:
        """Decode rows back to approximate vectors (debug/QA surface); OPQ
        codes decode in the rotated basis and are rotated back."""
        out = _decode_np(
            np.asarray(self.codebooks), np.asarray(self.codes)[np.asarray(rows)]
        )
        if self.rotation is not None:
            out = out @ np.asarray(self.rotation).T
        return out

    # -- persistence --------------------------------------------------------
    def save(self, path) -> None:
        arrs = {
            "codebooks": np.asarray(self.codebooks),
            "codes": np.asarray(self.codes),
        }
        if self.rotation is not None:
            arrs["rotation"] = np.asarray(self.rotation)
        if self._originals is not None:
            arrs["originals"] = self._originals
        np.savez(path, **arrs)

    @classmethod
    def load(cls, path) -> "PQIndex":
        z = np.load(path)
        idx = cls()
        idx.codebooks = jnp.asarray(z["codebooks"])
        idx.codes = jnp.asarray(z["codes"])
        idx.rotation = (
            jnp.asarray(z["rotation"]) if "rotation" in z.files else None
        )
        idx._originals = z["originals"] if "originals" in z.files else None
        return idx


def _decode_np(books: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """[S, K, d] codebooks + [..., S] codes → [..., S*d] reconstruction."""
    parts = books[np.arange(books.shape[0]), codes]           # [..., S, d]
    return parts.reshape(*codes.shape[:-1], -1)
