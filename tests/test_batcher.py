"""Dynamic micro-batching (serving/batcher.py + TextSearcher batching).

Concurrent single-query searches must coalesce into fewer device dispatches
while returning exactly the results the unbatched path returns.
"""

import threading
import time

import numpy as np
import pytest

from evr_tpu.serving.batcher import MicroBatcher


def test_microbatcher_coalesces_concurrent_submits():
    calls = []

    def batch_fn(key, items):
        calls.append(list(items))
        return [x * 10 for x in items]

    mb = MicroBatcher(batch_fn, max_batch=8, window_s=0.05)
    results = {}

    def worker(i):
        results[i] = mb.submit("k", i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: i * 10 for i in range(6)}
    # all 6 submissions landed in far fewer flushes than 6 (same key, one
    # window) — typically 1, allow 2 for scheduling jitter
    assert len(calls) <= 2, calls
    assert sorted(sum(calls, [])) == list(range(6))


def test_microbatcher_flushes_early_when_full():
    calls = []

    def batch_fn(key, items):
        calls.append(list(items))
        return items

    mb = MicroBatcher(batch_fn, max_batch=2, window_s=5.0)  # long window
    t0 = time.perf_counter()
    results = {}

    def worker(i):
        results[i] = mb.submit("k", i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # a full group must not wait out the 5 s window
    assert time.perf_counter() - t0 < 2.0
    assert results == {0: 0, 1: 1}


def test_microbatcher_separate_keys_do_not_mix():
    def batch_fn(key, items):
        return [(key, x) for x in items]

    mb = MicroBatcher(batch_fn, max_batch=4, window_s=0.01)
    out = {}
    threads = [
        threading.Thread(target=lambda i=i: out.setdefault(i, mb.submit(i % 2, i)))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        assert out[i] == (i % 2, i)


def test_microbatcher_propagates_errors_to_all_waiters():
    def batch_fn(key, items):
        raise ValueError("boom")

    mb = MicroBatcher(batch_fn, max_batch=4, window_s=0.01)
    errs = []

    def worker(i):
        try:
            mb.submit("k", i)
        except ValueError as e:
            errs.append(str(e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == ["boom"] * 3


def test_bucket_size_never_exceeds_cap():
    from evr_tpu.serving.batcher import bucket_size

    assert bucket_size(1, 16) == 1
    assert bucket_size(3, 16) == 4
    assert bucket_size(5, 6) == 6  # next pow2 (8) would exceed the cap
    assert bucket_size(12, 12) == 12
    assert bucket_size(8, 8) == 8
    for n in range(1, 13):
        assert n <= bucket_size(n, 12) <= 12


def test_microbatcher_leader_abort_unblocks_followers():
    """A leader that dies without producing results must still wake every
    follower with an error instead of wedging the key forever."""
    import evr_tpu.serving.batcher as B

    def bad_batch_fn(key, items):
        raise SystemExit("async-style abort")  # BaseException, not Exception

    mb = B.MicroBatcher(bad_batch_fn, max_batch=4, window_s=0.01)
    errs = []

    def worker(i):
        try:
            mb.submit("k", i)
        except BaseException as e:
            errs.append(type(e).__name__)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in threads)
    assert len(errs) == 3
    # the group must be unregistered so the key is reusable
    mb.batch_fn = lambda key, items: items
    assert mb.submit("k", 42) == 42


def test_microbatcher_sequential_submits_still_work():
    def batch_fn(key, items):
        return [x + 1 for x in items]

    mb = MicroBatcher(batch_fn, max_batch=4, window_s=0.001)
    assert [mb.submit("k", i) for i in range(5)] == [1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def small_engine_index():
    import jax

    from evr_tpu.index import EmbeddingEngine, FrameIndex
    from evr_tpu.models import clip as jclip

    cfg = jclip.CLIPConfig(
        embed_dim=32,
        vision=jclip.VisionConfig(image_size=32, patch_size=8, width=32, layers=1, heads=2),
        text=jclip.TextConfig(context_length=16, vocab_size=49408, width=32, layers=1, heads=2),
    )
    engine = EmbeddingEngine(cfg=cfg, batch_size=4)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(40, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    index = FrameIndex(embed_dim=32, pad_multiple=64)
    index.add_video("v", emb)
    return engine, index


def test_text_searcher_batched_matches_unbatched(small_engine_index):
    from evr_tpu.index.fused_search import TextSearcher

    engine, index = small_engine_index
    plain = TextSearcher(engine, index)
    batched = TextSearcher(engine, index, batch_window_ms=20.0, max_batch=8)

    queries = [f"query number {i}" for i in range(6)]
    expected = {q: plain.search(q, 5) for q in queries}

    dispatches = []
    orig = batched._dispatch

    def counting_dispatch(qs, k, *args, **kwargs):
        dispatches.append(len(qs))
        return orig(qs, k, *args, **kwargs)

    batched._dispatch = counting_dispatch

    got = {}
    lock = threading.Lock()

    def worker(q):
        r = batched.search(q, 5)
        with lock:
            got[q] = r

    threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for q in queries:
        np.testing.assert_array_equal(got[q][1], expected[q][1])
        np.testing.assert_allclose(got[q][0], expected[q][0], rtol=1e-5, atol=1e-6)
    # 6 concurrent queries must not cost 6 dispatches
    assert len(dispatches) < 6, dispatches
    # padded group sizes are power-of-two buckets (bounded compile cache)
    assert all(d in (1, 2, 4, 8) for d in dispatches), dispatches


def test_image_searcher_batched_matches_unbatched(small_engine_index):
    from evr_tpu.index.fused_image_search import ImageSearcher

    engine, index = small_engine_index
    plain = ImageSearcher(engine, index)
    batched = ImageSearcher(engine, index, batch_window_ms=20.0, max_batch=8)
    rng = np.random.default_rng(3)
    images = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(5)]
    expected = [plain.search(img[None], 4) for img in images]

    got = [None] * len(images)

    def worker(i):
        got[i] = batched.search(images[i][None], 4)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(images))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for (es, er), (gs, gr) in zip(expected, got):
        np.testing.assert_array_equal(er, gr)
        np.testing.assert_allclose(es, gs, rtol=1e-5, atol=1e-6)


def test_text_searcher_batched_single_caller_unharmed(small_engine_index):
    from evr_tpu.index.fused_search import TextSearcher

    engine, index = small_engine_index
    plain = TextSearcher(engine, index)
    batched = TextSearcher(engine, index, batch_window_ms=1.0)
    s0, r0 = plain.search("a lone query", 4)
    s1, r1 = batched.search("a lone query", 4)
    np.testing.assert_array_equal(r0, r1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-6)


def test_batched_result_cached_under_flush_version(small_engine_index):
    """Batched results are cached under the FLUSH-time index version — the
    snapshot they actually reflect — never the submit-time version (ADVICE
    r1: fused_search). Hot repeats then hit the cache without a second
    window wait or dispatch."""
    from evr_tpu.index.fused_search import TextSearcher

    engine, index = small_engine_index
    batched = TextSearcher(engine, index, batch_window_ms=5.0, max_batch=4)

    s1, r1 = batched.search("stale window query", 3)
    _, _, _, _, version_now = index.snapshot(None)
    key = (engine.active_model, version_now, ("stale window query",), 3, None)
    assert key in batched._result_cache
    # hot repeat: served from the cache, zero new dispatches
    dispatches = []
    orig = batched._dispatch
    batched._dispatch = lambda *a, **kw: (dispatches.append(1), orig(*a, **kw))[1]
    s1b, r1b = batched.search("stale window query", 3)
    assert dispatches == []
    np.testing.assert_array_equal(r1, r1b)
    # and the cached row matches a fresh unbatched searcher
    plain = TextSearcher(engine, index)
    s2, r2 = plain.search("stale window query", 3)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_query_engine_ann_tier_micro_batches(monkeypatch):
    """VERDICT r3 #4: the ANN serving tier (search_impl='ivf'/'ivfpq')
    keeps `batch_window_ms` coalescing even though the fused TextSearcher
    is disabled there — concurrent global queries share ONE probe
    dispatch, results identical to the unbatched engine, scoped searches
    bypass the batcher."""
    from evr_tpu.index import FrameIndex
    from evr_tpu.query import MetadataStore, QueryEngine

    from tests.test_query import FakeEngine

    rng = np.random.default_rng(7)
    dim = 16
    emb = rng.normal(size=(400, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    def build(window):
        idx = FrameIndex(
            embed_dim=dim, pad_multiple=32, search_impl="ivf",
            ivf_clusters=8, ivf_nprobe=8,
        )
        idx.add_video("v", emb, [f"{i}.jpg" for i in range(len(emb))])
        eng = FakeEngine(dim=dim)
        for i in range(8):
            eng.register(f"q{i}", i)
        store = MetadataStore()
        store.add_video(
            "v",
            [
                {
                    "frameidx": i, "frameid": f"{i}.jpg",
                    "video": "videos/v.mp4", "filepath": f"frames/{i}.jpg",
                    "tags": [], "metadata": {},
                    "text_detections": {"detections": []},
                    "object_detections": {"detections": []},
                }
                for i in range(len(emb))
            ],
            fps=25.0,
        )
        return QueryEngine(eng, idx, store, batch_window_ms=window)

    plain = build(None)
    assert plain._ann_batcher is None
    batched = build(25.0)
    assert batched._ann_batcher is not None and batched._searcher is None

    queries = [f"q{i}" for i in range(6)]
    expected = {
        q: [(h.row, round(h.score, 5)) for h in plain._candidates_n(q, 5, None)]
        for q in queries
    }

    calls = []
    orig = batched.index.search_raw

    def counting(qmat, k, video_name=None):
        calls.append(np.atleast_2d(np.asarray(qmat)).shape[0])
        return orig(qmat, k, video_name)

    monkeypatch.setattr(batched.index, "search_raw", counting)

    got = {}
    lock = threading.Lock()

    def worker(q):
        hits = batched._candidates_n(q, 5, None)
        with lock:
            got[q] = [(h.row, round(h.score, 5)) for h in hits]

    threads = [threading.Thread(target=worker, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert got == expected
    assert len(calls) < 6, calls           # coalesced, not one-per-query
    assert all(c in (1, 2, 4, 8) for c in calls), calls  # bucketed shapes

    # scoped searches bypass the batcher (exact path, no coalescing key)
    calls.clear()
    hits = batched._candidates_n("q1", 5, "v")
    assert hits and calls == []
