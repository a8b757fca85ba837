"""Mesh-sharded IVF (`parallel/sharded_ann.py`, VERDICT r3 item #3): the
ANN tier row-sharded over the 8-device CPU mesh — exactness at
nprobe = n_clusters vs single-device brute force, recall monotonicity,
and the FrameIndex serving integration (`search_impl="ivf"` + mesh).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from evr_tpu.index import FrameIndex
from evr_tpu.parallel.sharded_ann import ShardedIVFIndex


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("data",))


def _corpus(n=4003, d=64, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, n, 6)] + 0.02 * rng.normal(size=(6, d)).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, q.astype(np.float32)


def test_full_probe_matches_brute_force(mesh):
    emb, q = _corpus()
    idx = ShardedIVFIndex(mesh).build(emb, n_clusters=16, seed=0)
    scores, rows = idx.search(q, 10, nprobe=16)
    exact = q @ emb.T
    er = np.argsort(-exact, axis=1)[:, :10]
    np.testing.assert_array_equal(rows, er)
    np.testing.assert_allclose(
        scores, np.take_along_axis(exact, er, axis=1), atol=1e-5
    )


def test_every_row_reachable_and_recall_monotone(mesh):
    emb, q = _corpus(n=2000)
    idx = ShardedIVFIndex(mesh).build(emb, n_clusters=10, seed=1)
    # self-queries at full probe: every row must find itself
    sq = emb[::97]
    _, rows = idx.search(sq, 1, nprobe=10)
    np.testing.assert_array_equal(rows[:, 0], np.arange(0, 2000, 97))
    # recall grows with nprobe
    exact = np.argsort(-(q @ emb.T), axis=1)[:, :10]
    recalls = []
    for nprobe in (1, 4, 10):
        _, rows = idx.search(q, 10, nprobe=nprobe)
        recalls.append(
            np.mean([len(set(a) & set(b)) / 10 for a, b in zip(rows, exact)])
        )
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_bfloat16_shards_rank_sanely(mesh):
    emb, q = _corpus(n=1500)
    idx = ShardedIVFIndex(mesh).build(
        emb, n_clusters=12, seed=2, dtype="bfloat16"
    )
    _, rows = idx.search(q, 5, nprobe=12)
    exact = np.argsort(-(q @ emb.T), axis=1)[:, :5]
    # bf16 scoring may flip near-ties below the bf16 step; top-1 must hold
    np.testing.assert_array_equal(rows[:, 0], exact[:, 0])


def test_build_validates_cluster_count(mesh):
    emb, _ = _corpus(n=64)
    with pytest.raises(ValueError, match="smallest shard"):
        ShardedIVFIndex(mesh).build(emb, n_clusters=32)


def test_frame_index_mesh_ivf_serving_tier(mesh):
    emb, q = _corpus(n=2048, d=32, seed=3)
    fi = FrameIndex(
        embed_dim=32, mesh=mesh, search_impl="ivf",
        ivf_nprobe=16, ivf_clusters=16,
    )
    fi.add_video("a", emb[:1200])
    fi.add_video("b", emb[1200:])
    exact = FrameIndex(embed_dim=32)
    exact.add_video("a", emb[:1200])
    exact.add_video("b", emb[1200:])
    s, r = fi.search_raw(q, 10)
    es, er = exact.search_raw(q, 10)
    np.testing.assert_array_equal(r, er)
    np.testing.assert_allclose(s, es, atol=1e-5)
    # video-scoped searches stay exact (never probe)
    hits = fi.search(q[:1], top_k=3, video_name="b")[0]
    ehits = exact.search(q[:1], top_k=3, video_name="b")[0]
    assert [h.row for h in hits] == [h.row for h in ehits]
    # tiny corpora fall back to the single-device tier under a mesh
    tiny = FrameIndex(
        embed_dim=32, mesh=mesh, search_impl="ivf", ivf_clusters=2,
        ivf_nprobe=2,
    )
    tiny.add_video("t", emb[:8])
    s2, r2 = tiny.search_raw(q[:2], 3)
    es2, er2 = exact.search_raw(q[:2], 3)  # different corpus; just sanity
    assert r2.shape == (2, 3) and np.isfinite(s2).all()


# ---------------------------------------------------------------------------
# Mesh-sharded IVF-PQ (`ShardedIVFPQIndex`) — ADC is lossy by design, so the
# exactness gate composes full probing with the exact host re-rank.
# ---------------------------------------------------------------------------

from evr_tpu.parallel.sharded_ann import ShardedIVFPQIndex


def test_ivfpq_full_probe_rerank_matches_brute_force(mesh):
    emb, q = _corpus()
    idx = ShardedIVFPQIndex(mesh).build(
        emb, n_clusters=16, n_subspaces=16, seed=0
    )
    exact = q @ emb.T
    er = np.argsort(-exact, axis=1)[:, :10]
    scores, rows = idx.search(q, 10, nprobe=16, rerank=400)
    np.testing.assert_array_equal(rows, er)
    np.testing.assert_allclose(
        scores, np.take_along_axis(exact, er, axis=1), atol=1e-5
    )


def test_ivfpq_adc_recall_monotone_and_global_ids(mesh):
    emb, q = _corpus(n=2000)
    idx = ShardedIVFPQIndex(mesh).build(
        emb, n_clusters=10, n_subspaces=16, seed=1
    )
    exact = np.argsort(-(q @ emb.T), axis=1)[:, :10]
    recalls = []
    for nprobe in (1, 4, 10):
        _, rows = idx.search(q, 10, nprobe=nprobe)
        assert rows.max() < 2000 and len(np.unique(rows[rows >= 0])) > 0
        # no duplicate global ids within a query's result row
        for rr in rows:
            rv = rr[rr >= 0]
            assert len(rv) == len(set(rv.tolist()))
        recalls.append(
            np.mean([len(set(a) & set(b)) / 10 for a, b in zip(rows, exact)])
        )
    assert recalls == sorted(recalls)


def test_ivfpq_host_store_rerank_source(mesh):
    emb, q = _corpus(n=1600)
    idx = ShardedIVFPQIndex(mesh).build(
        emb, n_clusters=8, n_subspaces=16, seed=2, keep_originals=False
    )
    with pytest.raises(ValueError, match="rerank requires"):
        idx.search(q, 5, nprobe=8, rerank=100)
    # int8 host store: rank agreement with exact at full probe + deep rerank
    scales = np.maximum(np.abs(emb).max(axis=1) / 127.0, 1e-12).astype(
        np.float32
    )
    rows8 = np.clip(np.round(emb / scales[:, None]), -127, 127).astype(np.int8)
    idx.attach_host_store(rows8, scales)
    _, rows = idx.search(q, 5, nprobe=8, rerank=400)
    er = np.argsort(-(q @ emb.T), axis=1)[:, :5]
    # int8 quantisation can flip near-ties; top-1 must hold
    np.testing.assert_array_equal(rows[:, 0], er[:, 0])


def test_ivfpq_rerank_deeper_than_one_shard(mesh):
    """ADVICE r4: a rerank depth deeper than one shard's rows must draw
    candidates from EVERY shard (merge width = S × per-shard fetch), not be
    silently clamped to rows_per_shard. Full probe + rerank = N is the
    whole-corpus exactness gate."""
    emb, q = _corpus(n=1000)  # 125 rows/shard on the 8-device mesh
    idx = ShardedIVFPQIndex(mesh).build(
        emb, n_clusters=8, n_subspaces=16, seed=3
    )
    exact = q @ emb.T
    er = np.argsort(-exact, axis=1)[:, :10]
    # rerank=1000 ≫ rows_per_shard=125: exact global top-k must reproduce
    scores, rows = idx.search(q, 10, nprobe=8, rerank=1000)
    np.testing.assert_array_equal(rows, er)
    np.testing.assert_allclose(
        scores, np.take_along_axis(exact, er, axis=1), atol=1e-5
    )
    # ADC-only path: top_k wider than one shard still returns that many
    # finite candidates under a full probe
    s2, r2 = idx.search(q, 200, nprobe=8)
    assert r2.shape == (q.shape[0], 200)
    assert np.isfinite(s2).all()


def test_ivfpq_build_validates_cluster_count(mesh):
    emb, _ = _corpus(n=64)
    with pytest.raises(ValueError, match="smallest shard"):
        ShardedIVFPQIndex(mesh).build(emb, n_clusters=32, n_subspaces=16)


def test_frame_index_mesh_ivfpq_serving_tier(mesh):
    emb, q = _corpus(n=2048, d=32, seed=5)
    fi = FrameIndex(
        embed_dim=32, mesh=mesh, search_impl="ivfpq",
        ivf_nprobe=16, ivf_clusters=16,
    )
    fi.add_video("a", emb[:1200])
    fi.add_video("b", emb[1200:])
    from evr_tpu.parallel.sharded_ann import ShardedIVFPQIndex as S

    exact = FrameIndex(embed_dim=32)
    exact.add_video("a", emb[:1200])
    exact.add_video("b", emb[1200:])
    s, r = fi.search_raw(q, 10)
    assert isinstance(fi._ivf, S)
    es, er = exact.search_raw(q, 10)
    # serving path reranks 4×k exactly: top-1 identical, strong overlap
    np.testing.assert_array_equal(r[:, 0], er[:, 0])
    overlap = np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(r, er)]
    )
    assert overlap >= 0.8
    # video-scoped searches stay exact (never probe)
    hits = fi.search(q[:1], top_k=3, video_name="b")[0]
    ehits = exact.search(q[:1], top_k=3, video_name="b")[0]
    assert [h.row for h in hits] == [h.row for h in ehits]


def test_balanced_ranges_never_empty():
    from evr_tpu.parallel.sharded_ann import _balanced_ranges

    for n in (8, 9, 15, 16, 17, 100, 1001):
        rngs = _balanced_ranges(n, 8)
        sizes = [e - b for b, e in rngs]
        assert min(sizes) >= 1 and max(sizes) - min(sizes) <= 1
        assert rngs[0][0] == 0 and rngs[-1][1] == n
        assert all(rngs[i][1] == rngs[i + 1][0] for i in range(7))
    with pytest.raises(ValueError, match="cannot shard"):
        _balanced_ranges(7, 8)
