"""Failure containment + concurrency: non-finite update skipping, cache
thread-safety, streaming pipeline equivalence."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from evr_tpu.serving.cache import TTLCache
from evr_tpu.training import TrainConfig, make_optimizer


def test_nonfinite_gradients_skip_update():
    params = {"clip": {"logit_scale": jnp.asarray(1.0)}, "classifier": None}
    # minimal tree exercising the apply_if_finite wrapper through our stack
    tc = TrainConfig(freeze_layers=0)
    simple = {"w": jnp.ones((4,))}
    opt = optax.apply_if_finite(optax.sgd(0.1), 3)
    state = opt.init(simple)
    good = {"w": jnp.ones((4,))}
    bad = {"w": jnp.asarray([1.0, np.nan, 1.0, 1.0])}

    upd, state = opt.update(bad, state, simple)
    after_bad = optax.apply_updates(simple, upd)
    np.testing.assert_array_equal(np.asarray(after_bad["w"]), np.ones(4))  # skipped

    upd, state = opt.update(good, state, simple)
    after_good = optax.apply_updates(simple, upd)
    assert np.asarray(after_good["w"]).max() < 1.0  # applied


def test_trainer_optimizer_has_finite_guard():
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params

    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(32, 8, 32, 1, 2),
        text=TextConfig(16, 100, 32, 1, 2),
    )
    params = {"clip": init_clip_params(jax.random.PRNGKey(0), cfg)}
    tc = TrainConfig(freeze_layers=0, skip_nonfinite_updates=True)
    opt = make_optimizer(tc, params)
    state = opt.init(params)
    grads = jax.tree.map(lambda a: jnp.full_like(a, jnp.nan), params)
    before = np.asarray(params["clip"]["logit_scale"])
    upd, state = opt.update(grads, state, params)
    after = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(before, np.asarray(after["clip"]["logit_scale"]))


def test_ttl_cache_thread_safety():
    cache = TTLCache(default_ttl=60, max_entries=128)
    errors = []

    def hammer(tid):
        try:
            for i in range(300):
                cache.set((tid, i % 50), i)
                cache.get((tid, (i * 7) % 50))
                if i % 97 == 0:
                    cache.invalidate(lambda k: k[0] == tid and k[1] % 2 == 0)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(cache) <= 128


def test_streaming_embed_matches_sync(tmp_path):
    from PIL import Image

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.index.stream import embed_folder_streaming
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(7):
        arr = np.zeros((48, 64, 3), np.uint8)
        arr[:, :, i % 3] = 40 + i * 25
        Image.fromarray(arr).save(frames / f"{i}.jpg")
    (frames / "broken.jpg").write_bytes(b"nope")

    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=3)
    sync_emb, sync_names = engine.embed_folder(frames)
    stream_emb, stream_names = embed_folder_streaming(engine, frames, batch_size=3)
    assert stream_names == sync_names
    np.testing.assert_allclose(stream_emb, sync_emb, rtol=1e-5, atol=1e-6)


def test_pipelined_folder_embed_matches_oneshot(tmp_path):
    """`_embed_folder_pipelined` (chunked, double-buffered C++ staging) must
    return exactly what a one-shot stage→encode of the same folder returns —
    multiple chunks, a partial tail chunk, and an unreadable frame skipped
    by the same contract."""
    from PIL import Image

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig
    from evr_tpu.native import native_available

    if not native_available():
        pytest.skip("native staging library unavailable")

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(11):
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(frames / f"{i:03d}.jpg")
    (frames / "broken.jpg").write_bytes(b"nope")

    small = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4),
        text=TextConfig(width=64, layers=2, heads=4),
    )
    engine = EmbeddingEngine(cfg=small, batch_size=2)
    candidates = sorted(p.name for p in frames.iterdir())

    # one-shot reference: stage everything, then encode
    staged, ok = engine._ensure_native_stager().stage_batch(
        [frames / n for n in candidates]
    )
    ref_names = [candidates[i] for i in ok]
    ref = engine.encode_staged_images(staged[ok], normalise=True)

    seen = []
    emb, names = engine._embed_folder_pipelined(
        frames, candidates, normalise=True,
        progress=lambda done, total: seen.append((done, total)),
        chunk_frames=4,  # 3 chunks over 12 candidates, tail included
    )
    assert names == ref_names and "broken.jpg" not in names
    np.testing.assert_allclose(emb, ref, rtol=1e-5, atol=1e-6)
    assert seen[-1] == (12, 12)

    # and embed_folder's fast path routes through the pipelined version
    emb2, names2 = engine.embed_folder(frames)
    assert names2 == ref_names
    np.testing.assert_allclose(emb2, ref, rtol=1e-5, atol=1e-6)
