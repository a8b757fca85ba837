"""GradCache chunked contrastive step (arXiv 2101.06983) — exactness vs the
direct step, generic-helper correctness, mesh composition, guards.

GradCache is a memory schedule: Σ_chunks VJP(encode, ∂L/∂emb) + ∂L/∂θ_head
must equal jax.grad of the monolithic composition to fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
from evr_tpu.training.finetune import TrainState
from evr_tpu.training.gradcache import chunk_batch, gradcache_value_and_grad


def tiny_cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )


def tiny_batch(rng, n):
    tokens = np.zeros((n, 16), np.int32)
    for i in range(n):
        ln = int(rng.integers(3, 10))
        tokens[i, :ln] = rng.integers(1, 500, size=ln)
        tokens[i, ln] = 599
    return {
        "images": (rng.random((n, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=n).astype(np.int32),
    }


def test_generic_helper_matches_direct_grad():
    """Toy encoder + InfoNCE-shaped head: gradcache == jax.grad exactly."""
    key = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(key, (8, 4)),
        "scale": jnp.float32(1.5),
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 8))

    def encode_fn(p, cb):
        return jnp.tanh(cb["x"] @ p["w"])

    def head_fn(p, emb, aux):
        logits = p["scale"] * emb @ emb.T
        loss = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(12), jnp.arange(12)])
        return loss, {"loss": loss}

    def direct(p):
        return head_fn(p, encode_fn(p, {"x": x}), None)

    (loss_d, _), g_d = jax.value_and_grad(direct, has_aux=True)(params)
    gc = gradcache_value_and_grad(encode_fn, head_fn, 3)
    (loss_c, _), g_c = gc(params, {"x": x}, None)
    assert abs(float(loss_d) - float(loss_c)) < 1e-6
    for k in params:
        np.testing.assert_allclose(g_c[k], g_d[k], rtol=1e-5, atol=1e-6)


def test_chunk_batch_shapes_and_divisibility():
    b = {"a": np.zeros((8, 3)), "t": np.zeros((8,))}
    c = chunk_batch(b, 4)
    assert c["a"].shape == (4, 2, 3) and c["t"].shape == (4, 2)
    with pytest.raises(ValueError, match="not divisible"):
        chunk_batch(b, 3)


def _run_steps(tc, rng_np, n_steps=2):
    cfg = tiny_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(0), cfg)
    cls = init_classifier_params(
        jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32, num_classes=3)
    )
    params = {"clip": clip_params, "classifier": cls}
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(embed_dim=32), tc, opt)
    state = TrainState(
        params=jax.tree.map(jnp.asarray, params),
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    metrics = None
    for i in range(n_steps):
        batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng_np, 8).items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    return state, metrics


def test_gradcache_step_matches_direct_step():
    """Two full optimizer steps: chunked == direct to fp32 tolerance,
    including the classifier head and its dropout rng."""
    direct_state, direct_m = _run_steps(
        TrainConfig(batch_size=8, epochs=2), np.random.default_rng(0)
    )
    gc_state, gc_m = _run_steps(
        TrainConfig(batch_size=8, epochs=2, gradcache_chunks=4),
        np.random.default_rng(0),
    )
    assert abs(float(direct_m["total_loss"]) - float(gc_m["total_loss"])) < 1e-4
    flat_d, _ = jax.tree_util.tree_flatten(direct_state.params)
    flat_c, _ = jax.tree_util.tree_flatten(gc_state.params)
    for a, b in zip(flat_d, flat_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_gradcache_siglip_matches_direct():
    direct_state, direct_m = _run_steps(
        TrainConfig(batch_size=8, epochs=2, contrastive_loss="siglip"),
        np.random.default_rng(1),
        n_steps=1,
    )
    gc_state, gc_m = _run_steps(
        TrainConfig(batch_size=8, epochs=2, contrastive_loss="siglip",
                    gradcache_chunks=2),
        np.random.default_rng(1),
        n_steps=1,
    )
    assert abs(float(direct_m["total_loss"]) - float(gc_m["total_loss"])) < 1e-4
    flat_d, _ = jax.tree_util.tree_flatten(direct_state.params)
    flat_c, _ = jax.tree_util.tree_flatten(gc_state.params)
    for a, b in zip(flat_d, flat_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_gradcache_on_mesh_matches_single_device():
    """dp mesh + gradcache: the sharded chunked step equals the unsharded
    chunked step (same batch) — layout only, no math change."""
    from evr_tpu.parallel import get_mesh

    rng = np.random.default_rng(2)
    batch_np = tiny_batch(rng, 8)

    def run(mesh):
        cfg = tiny_cfg()
        params = {
            "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
            "classifier": init_classifier_params(
                jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32, num_classes=3)
            ),
        }
        # fp32 pins the comparison: under bf16 the mesh layout reorders
        # reductions enough to move the loss ~0.2% (same convention as
        # test_tp.py's exactness checks)
        tc = TrainConfig(
            batch_size=8, epochs=2, gradcache_chunks=2, compute_dtype="float32"
        )
        opt = make_optimizer(tc, params)
        step, _ = make_train_step(
            cfg, ClassifierConfig(embed_dim=32), tc, opt, mesh=mesh
        )
        state = TrainState(
            params=jax.tree.map(jnp.asarray, params),
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        return state, metrics

    mesh_state, mesh_m = run(get_mesh(8))
    single_state, single_m = run(None)
    assert abs(float(mesh_m["total_loss"]) - float(single_m["total_loss"])) < 1e-4
    flat_s, _ = jax.tree_util.tree_flatten(single_state.params)
    flat_m, _ = jax.tree_util.tree_flatten(mesh_state.params)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_gradcache_rejects_unsupported_compositions():
    cfg = tiny_cfg()
    params = {"clip": init_clip_params(jax.random.PRNGKey(0), cfg)}
    for bad in (
        TrainConfig(gradcache_chunks=2, patch_drop=0.5),
        TrainConfig(gradcache_chunks=2, lora_rank=4),
    ):
        opt = make_optimizer(bad, params)
        with pytest.raises(ValueError, match="gradcache"):
            make_train_step(cfg, None, bad, opt)
