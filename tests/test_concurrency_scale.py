"""Concurrent ingest + search on the index, grad accumulation semantics,
and a larger sharded-scale cross-check."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.index import FrameIndex
from evr_tpu.parallel import get_mesh


def test_concurrent_ingest_and_search(rng):
    idx = FrameIndex(embed_dim=32, pad_multiple=64)
    idx.add_video("base", rng.normal(size=(50, 32)).astype(np.float32))
    errors = []
    stop = threading.Event()

    def searcher():
        try:
            # per-thread generator: numpy Generators are not thread-safe
            q = np.random.default_rng(1).normal(size=32).astype(np.float32)
            while not stop.is_set():
                hits = idx.search(q, 5)[0]
                assert hits, "search returned empty during concurrent ingest"
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def ingester():
        try:
            ing_rng = np.random.default_rng(2)
            for i in range(20):
                idx.add_video(f"v{i}", ing_rng.normal(size=(20, 32)).astype(np.float32))
                if i % 3 == 0:
                    idx.remove_video(f"v{i}")
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    ing = threading.Thread(target=ingester)
    for t in threads:
        t.start()
    ing.start()
    ing.join()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    # final state consistent
    assert idx.total_frames == 50 + (20 - 7) * 20


def test_grad_accumulation_equivalence(rng):
    """N accumulation micro-steps ≈ one step on the concatenated batch (for
    identical micro-batch losses the SGD-level update matches; with AdamW
    we assert the params only move every N-th call)."""
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
    from evr_tpu.models import ClassifierConfig, init_classifier_params
    from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
    from evr_tpu.training.finetune import TrainState

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(32, 8, 64, 2, 4),
        text=TextConfig(16, 600, 64, 2, 4),
    )
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)),
    }
    tc = TrainConfig(freeze_layers=0, lr=1e-3, compute_dtype="float32",
                     grad_accumulation_steps=2)
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
    state = TrainState(params=fresh, opt_state=opt.init(fresh), step=jnp.zeros((), jnp.int32))

    tokens = np.zeros((4, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 599
    batch = {
        "images": jnp.asarray((rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)),
        "tokens": jnp.asarray(tokens),
        "labels": jnp.asarray(rng.integers(0, 3, size=4).astype(np.int32)),
    }
    p0 = np.asarray(state.params["clip"]["logit_scale"])
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    p1 = np.asarray(state.params["clip"]["logit_scale"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: accumulate only
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    p2 = np.asarray(state.params["clip"]["logit_scale"])
    assert p2 != p1  # second micro-step applies the update


def test_sharded_scale_crosscheck(rng):
    """20k-row index, 8-way sharded vs single-device — exact agreement."""
    n_dev = len(jax.devices())
    mesh = get_mesh(n_dev)
    emb = rng.normal(size=(20_000, 64)).astype(np.float32)
    plain = FrameIndex(embed_dim=64, pad_multiple=256)
    plain.add_video("big", emb)
    sharded = FrameIndex(embed_dim=64, pad_multiple=256, mesh=mesh)
    sharded.add_video("big", emb)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    s1, r1 = plain.search_raw(q, 20)
    s2, r2 = sharded.search_raw(q, 20)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
