"""FrameIndex + top-k correctness: exact vs numpy brute force, per-video
ranges, sharded-mesh equivalence, persistence, registry behaviour."""

import json

import numpy as np
import pytest

from evr_tpu.index import FrameIndex, VideoRegistry
from evr_tpu.parallel import get_mesh


def _random_index(rng, videos=(("a", 100), ("b", 37), ("c", 201)), dim=64):
    idx = FrameIndex(embed_dim=dim, pad_multiple=128)
    truth = {}
    for name, n in videos:
        emb = rng.normal(size=(n, dim)).astype(np.float32)
        idx.add_video(name, emb, [f"{i}.jpg" for i in range(n)])
        truth[name] = emb
    return idx, truth


def _brute_force(truth, order, query, k, video=None):
    mats, names = [], []
    for name in order:
        if video is not None and name != video:
            continue
        emb = truth[name]
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        mats.append(emb)
        names += [(name, i) for i in range(len(emb))]
    full = np.concatenate(mats, axis=0)
    q = query / np.linalg.norm(query)
    sims = full @ q
    top = np.argsort(-sims)[:k]
    return [(names[i], sims[i]) for i in top]


def test_topk_matches_bruteforce(rng):
    idx, truth = _random_index(rng)
    query = rng.normal(size=64).astype(np.float32)
    hits = idx.search(query, top_k=10)[0]
    expected = _brute_force(truth, idx.videos, query, 10)
    assert len(hits) == 10
    for hit, ((video, fidx), score) in zip(hits, expected):
        assert (hit.video, hit.frame_index) == (video, fidx)
        np.testing.assert_allclose(hit.score, score, rtol=1e-5)


def test_per_video_range_search(rng):
    idx, truth = _random_index(rng)
    query = rng.normal(size=64).astype(np.float32)
    hits = idx.search(query, top_k=5, video_name="b")[0]
    assert all(h.video == "b" for h in hits)
    expected = _brute_force(truth, idx.videos, query, 5, video="b")
    for hit, ((_, fidx), score) in zip(hits, expected):
        assert hit.frame_index == fidx
        np.testing.assert_allclose(hit.score, score, rtol=1e-5)


def test_k_clamped_to_video_size(rng):
    idx, _ = _random_index(rng, videos=(("tiny", 3),))
    hits = idx.search(rng.normal(size=64).astype(np.float32), top_k=50)[0]
    assert len(hits) == 3


def test_sharded_search_matches_single_device(rng):
    import jax

    mesh = get_mesh(len(jax.devices()))
    videos = (("a", 500), ("b", 300))
    plain, truth = _random_index(rng, videos=videos)
    sharded = FrameIndex(embed_dim=64, pad_multiple=128, mesh=mesh)
    for name, _ in videos:
        sharded.add_video(name, truth[name], plain.frame_names(name))

    queries = rng.normal(size=(3, 64)).astype(np.float32)
    s1, r1 = plain.search_raw(queries, 8)
    s2, r2 = sharded.search_raw(queries, 8)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(r1, r2)


def test_bf16_index_rank_agreement(rng):
    videos = (("a", 300),)
    f32, truth = _random_index(rng, videos=videos)
    bf16 = FrameIndex(embed_dim=64, pad_multiple=128, device_dtype="bfloat16")
    bf16.add_video("a", truth["a"])
    q = rng.normal(size=(4, 64)).astype(np.float32)
    s1, r1 = f32.search_raw(q, 5)
    s2, r2 = bf16.search_raw(q, 5)
    # top-1 must agree; scores within bf16 tolerance
    np.testing.assert_array_equal(r1[:, 0], r2[:, 0])
    np.testing.assert_allclose(s1, s2, atol=5e-3)


def test_int8_index_rank_agreement(rng):
    videos = (("a", 300),)
    f32, truth = _random_index(rng, videos=videos)
    i8 = FrameIndex(embed_dim=64, pad_multiple=128, device_dtype="int8")
    i8.add_video("a", truth["a"])
    q = rng.normal(size=(4, 64)).astype(np.float32)
    s1, r1 = f32.search_raw(q, 5)
    s2, r2 = i8.search_raw(q, 5)
    np.testing.assert_array_equal(r1[:, 0], r2[:, 0])  # top-1 preserved
    np.testing.assert_allclose(s1, s2, atol=2e-2)  # int8 quantisation band


def test_sharded_int8_matches_single_device(rng):
    import jax

    from evr_tpu.parallel import get_mesh

    mesh = get_mesh(len(jax.devices()))
    emb = rng.normal(size=(512, 64)).astype(np.float32)
    single = FrameIndex(embed_dim=64, pad_multiple=128, device_dtype="int8")
    single.add_video("a", emb)
    sharded = FrameIndex(embed_dim=64, pad_multiple=128, mesh=mesh, device_dtype="int8")
    sharded.add_video("a", emb)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    s1, r1 = single.search_raw(q, 8)
    s2, r2 = sharded.search_raw(q, 8)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)


def test_incremental_add_remove(rng):
    idx, truth = _random_index(rng)
    q = rng.normal(size=64).astype(np.float32)
    idx.search(q, 5)  # build
    idx.remove_video("a")
    hits = idx.search(q, 5)[0]
    assert all(h.video != "a" for h in hits)
    emb = rng.normal(size=(10, 64)).astype(np.float32)
    idx.add_video("d", emb)
    assert idx.total_frames == 37 + 201 + 10


def test_incremental_append_matches_rebuild(rng):
    """A new video appended in place must search identically to a fresh
    rebuild with the same contents."""
    base = {name: rng.normal(size=(n, 64)).astype(np.float32) for name, n in
            (("a", 100), ("b", 60))}
    extra = rng.normal(size=(30, 64)).astype(np.float32)

    inc = FrameIndex(embed_dim=64, pad_multiple=128)
    for name, emb in base.items():
        inc.add_video(name, emb)
    inc.build()
    v_before = inc.version
    inc.add_video("c", extra)  # should append in place (headroom)
    assert inc.version == v_before + 1
    assert not inc._dirty  # no rebuild happened

    rebuilt = FrameIndex(embed_dim=64, pad_multiple=128)
    for name, emb in base.items():
        rebuilt.add_video(name, emb)
    rebuilt.add_video("c", extra)

    q = rng.normal(size=(3, 64)).astype(np.float32)
    s1, r1 = inc.search_raw(q, 8)
    s2, r2 = rebuilt.search_raw(q, 8)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    # row numbering may differ only if layouts differ; resolve and compare
    hits1 = [[inc.resolve_row(int(r))[:2] for r in row] for row in r1]
    hits2 = [[rebuilt.resolve_row(int(r))[:2] for r in row] for row in r2]
    assert hits1 == hits2
    # replacement of an existing video falls back to rebuild
    inc.add_video("c", rng.normal(size=(10, 64)).astype(np.float32))
    assert inc._dirty


def test_save_load_roundtrip(rng, tmp_path):
    idx, truth = _random_index(rng)
    idx.save(tmp_path)
    loaded = FrameIndex.load(tmp_path, embed_dim=64)
    assert sorted(loaded.videos) == sorted(idx.videos)
    q = rng.normal(size=64).astype(np.float32)
    h1, h2 = idx.search(q, 5)[0], loaded.search(q, 5)[0]
    assert [(a.video, a.frame_index) for a in h1] == [(b.video, b.frame_index) for b in h2]


def test_registry_schema_and_prune(tmp_path):
    reg = VideoRegistry(tmp_path / "video_mapping.json")
    video = tmp_path / "v1.mp4"
    video.write_bytes(b"x")
    reg.add(
        "v1",
        metadata_file="metadata/v1_metadata.json",
        embeddings_file="embedding/v1_embeddings.npy",
        video_path=str(video),
        frames_dir="frames/v1",
    )
    reg.add("ghost", video_path=str(tmp_path / "missing.mp4"))
    reloaded = VideoRegistry(tmp_path / "video_mapping.json")
    assert set(reloaded.names()) == {"v1", "ghost"}
    dropped = reloaded.prune_missing()
    assert dropped == ["ghost"]
    assert reloaded.names() == ["v1"]
    with pytest.raises(KeyError):
        reg.add("bad", nonsense="x")


def test_reference_fixture_embeddings(reference_fixtures):
    """Load the reference's real .npy embedding fixtures into the index and
    verify search self-consistency (row i's own embedding retrieves row i)."""
    emb_dir = reference_fixtures / "embedding"
    mats = {
        p.name[: -len("_embeddings.npy")]: np.load(p)
        for p in sorted(emb_dir.glob("*_embeddings.npy"))
    }
    idx = FrameIndex(embed_dim=512, pad_multiple=256)
    for name, emb in mats.items():
        idx.add_video(name, emb.astype(np.float32))
    assert idx.total_frames == sum(len(m) for m in mats.values())
    some = next(iter(mats))
    probe = mats[some][7]
    hit = idx.search(probe, top_k=1)[0][0]
    assert (hit.video, hit.frame_index) == (some, 7)
    assert hit.score > 0.999
