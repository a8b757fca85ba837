"""In-VMEM Pallas ADC kernel (`ops/adc_pallas.py`) and the reconstructed
overflow-pool GEMM (`index/ivfpq.py::_pool_recon`) — exactness against a
numpy lookup oracle, parity between the xla and pallas search impls, and
pool-scoring equivalence. Runs in interpret mode on the CPU mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from evr_tpu.index.ivfpq import IVFPQIndex
from evr_tpu.ops.adc_pallas import adc_list_scores


def _normed(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _clustered(rng, n, centers, d=64, noise=0.05):
    c = _normed(rng.standard_normal((centers, d)).astype(np.float32))
    x = c[rng.integers(0, centers, n)] + noise * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return _normed(x).astype(np.float32)


def test_kernel_matches_numpy_lookup_oracle():
    """score[p, c] must equal sum_s tables[p // nprobe, s, codes[p,c,s]]
    exactly up to fp32 summation order (every term is an exact table
    read — the one-hot picks exactly one fp32 value per subspace)."""
    rng = np.random.default_rng(0)
    b, nprobe, c, s, k = 3, 2, 40, 8, 16
    blocks = rng.integers(0, k, (b * nprobe, c, s)).astype(np.uint8)
    tables = rng.standard_normal((b, s, k)).astype(np.float32)
    out = np.asarray(
        adc_list_scores(
            jnp.asarray(blocks), jnp.asarray(tables), nprobe=nprobe,
            chunk=16, interpret=True,
        )
    )
    want = np.zeros((b * nprobe, c), np.float32)
    for p in range(b * nprobe):
        for ci in range(c):
            want[p, ci] = tables[p // nprobe, np.arange(s),
                                 blocks[p, ci]].sum()
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_kernel_fused_variant_matches():
    rng = np.random.default_rng(1)
    blocks = rng.integers(0, 16, (4, 32, 8)).astype(np.uint8)
    tables = rng.standard_normal((2, 8, 16)).astype(np.float32)
    a = adc_list_scores(
        jnp.asarray(blocks), jnp.asarray(tables), nprobe=2, chunk=16,
        fused=False, interpret=True,
    )
    f = adc_list_scores(
        jnp.asarray(blocks), jnp.asarray(tables), nprobe=2, chunk=16,
        fused=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(f),
                               rtol=1e-5, atol=1e-6)


def test_kernel_pads_ragged_capacity():
    """capacity not a multiple of the chunk → the wrapper pads and strips;
    scores for real rows are unaffected by the zero-code padding."""
    rng = np.random.default_rng(2)
    blocks = rng.integers(0, 16, (2, 24, 8)).astype(np.uint8)  # C=24 < 32
    tables = rng.standard_normal((1, 8, 16)).astype(np.float32)
    out = np.asarray(
        adc_list_scores(
            jnp.asarray(blocks), jnp.asarray(tables), nprobe=2,
            chunk=32, interpret=True,
        )
    )
    assert out.shape == (2, 24)
    want = tables[0, np.arange(8), blocks[1, 5]].sum()
    np.testing.assert_allclose(out[1, 5], want, rtol=1e-6)


def test_kernel_rejects_shape_mismatches():
    blocks = jnp.zeros((4, 16, 8), jnp.uint8)
    with pytest.raises(ValueError, match="P=4"):
        adc_list_scores(
            blocks, jnp.zeros((3, 8, 16), jnp.float32), nprobe=2,
            interpret=True,
        )
    with pytest.raises(ValueError, match="subspace"):
        adc_list_scores(
            blocks, jnp.zeros((2, 4, 16), jnp.float32), nprobe=2,
            interpret=True,
        )


@pytest.fixture(scope="module")
def packed_index():
    rng = np.random.default_rng(3)
    emb = _clustered(rng, n=3000, centers=32)
    q = _normed(rng.standard_normal((8, emb.shape[1])).astype(np.float32))
    idx = IVFPQIndex().build_device(
        jnp.asarray(emb), n_clusters=32, n_subspaces=16,
        coarse_iters=5, pq_iters=5, train_rows=len(emb),
        slab_rows=len(emb), capacity_factor=1.1,
    )
    assert int(idx.overflow.shape[0]) > 0  # tight capacity → real pool
    return emb, q, idx


def test_search_pallas_matches_xla_impl(packed_index):
    """The two ADC impls are the same lookup with different one-hot
    residency — returned rows must be identical, scores fp-close."""
    _, q, idx = packed_index
    for nprobe in (1, 4, 16, 32):
        sx, rx = idx.search(q, 10, nprobe=nprobe, adc_impl="xla")
        sp, rp = idx.search(q, 10, nprobe=nprobe, adc_impl="pallas")
        assert np.array_equal(rx, rp), f"row mismatch at nprobe={nprobe}"
        np.testing.assert_allclose(sx, sp, rtol=1e-4, atol=1e-5)


def test_auto_resolves_xla_and_pallas_failure_demotes(packed_index, monkeypatch):
    """Round-5 decision record: "auto" = xla (real-index measurement,
    PERF.md §ADC); an opted-in pallas whose kernel fails to compile must
    demote THAT instance to xla permanently and still return results."""
    _, q, idx = packed_index
    # auto == xla results, bit-identical
    sa, ra = idx.search(q, 5, nprobe=4, adc_impl="auto")
    sx, rx = idx.search(q, 5, nprobe=4, adc_impl="xla")
    assert np.array_equal(ra, rx)
    np.testing.assert_array_equal(sa, sx)

    # simulate a Mosaic failure: the packed probe raises only for pallas
    real = IVFPQIndex._probe_adc_search_packed  # jitted staticmethod

    def flaky(*args, **kw):
        if "pallas" in [a for a in args if isinstance(a, str)] or (
            kw.get("adc_impl") == "pallas"
        ):
            raise RuntimeError("Mosaic failed to compile TPU kernel")
        return real(*args, **kw)

    monkeypatch.setattr(
        IVFPQIndex, "_probe_adc_search_packed", staticmethod(flaky)
    )
    assert not idx._pallas_broken
    sf, rf = idx.search(q, 5, nprobe=4, adc_impl="pallas")  # falls back
    assert idx._pallas_broken
    assert np.array_equal(rf, rx)
    # and once demoted, even auto on a hypothetical pallas-default build
    # stays on xla without touching the broken kernel again
    s2, r2 = idx.search(q, 5, nprobe=4, adc_impl="auto")
    assert np.array_equal(r2, rx)


def test_pool_recon_equals_pool_adc(packed_index):
    """q·recon for an overflow row must equal its ADC decomposition
    q·c_assign + Σ_s q_s·book_s[code_s]."""
    _, q, idx = packed_index
    recon = np.asarray(idx._pool_recon())
    assert recon.shape == (int(idx.overflow.shape[0]),
                           int(idx.centroids.shape[1]))
    books = np.asarray(idx.codebooks)
    s, _, ds = books.shape
    codes = np.asarray(idx.overflow_codes).astype(np.int64)
    cents = np.asarray(idx.centroids)
    assign = np.asarray(idx._overflow_assign)
    gemm = q @ recon.T  # [B, O]
    tables = np.einsum(
        "bsd,skd->bsk", q.reshape(len(q), s, ds), books
    )
    adc = (q @ cents[assign].T) + np.stack(
        [tables[:, si, codes[:, si]] for si in range(s)]
    ).sum(axis=0)
    np.testing.assert_allclose(gemm, adc, rtol=1e-4, atol=1e-5)


def test_pool_recon_cache_invalidated_by_append(packed_index):
    emb, q, _ = packed_index
    rng = np.random.default_rng(4)
    idx = IVFPQIndex().build_device(
        jnp.asarray(emb), n_clusters=32, n_subspaces=16,
        coarse_iters=5, pq_iters=5, train_rows=len(emb),
        slab_rows=len(emb), capacity_factor=1.05,
    )
    o0 = int(idx.overflow.shape[0])
    assert o0 > 0
    r0 = idx._pool_recon()
    assert int(r0.shape[0]) == o0
    # append enough near-duplicates to force new pool rows
    new = _normed(
        emb[:256] + 0.01 * rng.standard_normal((256, emb.shape[1]))
    ).astype(np.float32)
    idx.append(new)
    o1 = int(idx.overflow.shape[0])
    assert o1 > o0
    r1 = idx._pool_recon()
    assert int(r1.shape[0]) == o1
    # appended pool rows are reachable through search after the append
    s, rows = idx.search(q, 10, nprobe=32)
    assert rows.shape == (len(q), 10)


def test_empty_pool_recon_shape():
    rng = np.random.default_rng(5)
    emb = _clustered(rng, n=512, centers=8)
    idx = IVFPQIndex().build_device(
        jnp.asarray(emb), n_clusters=8, n_subspaces=16,
        coarse_iters=4, pq_iters=4, train_rows=len(emb),
        slab_rows=len(emb), capacity_factor=3.0,
    )
    if int(idx.overflow.shape[0]) == 0:
        assert idx._pool_recon().shape == (0, emb.shape[1])
    q = _normed(rng.standard_normal((4, emb.shape[1])).astype(np.float32))
    s, rows = idx.search(q, 5, nprobe=8, adc_impl="pallas")
    assert rows.shape == (4, 5)
