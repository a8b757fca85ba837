"""FSDP (ZeRO-3-style) training: sharding rule, exactness vs single device,
and the memory claim — each device holds ~1/n of the large state leaves.

The reference has no distributed training at all (SURVEY.md §2.5);
`parallel/fsdp.py` is new TPU-native capability, so the test pins its own
contract: fsdp is a LAYOUT change only — step math identical to dp and to
single-device on the same global batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.parallel import get_mesh
from evr_tpu.parallel.fsdp import (
    fsdp_spec,
    fsdp_shardings,
    fsdp_state_shardings,
    shard_tree,
    sharded_bytes_per_device,
)
from evr_tpu.training.finetune import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
)


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


def test_fsdp_spec_rule():
    n = 8
    # large 2-D weight: shard the largest divisible dim
    assert fsdp_spec((512, 128), "data", n, min_size=256) == P("data", None)
    # tie on equal dims -> trailing dim
    assert fsdp_spec((256, 256), "data", n, min_size=256) == P(None, "data")
    # nothing divisible -> replicate
    assert fsdp_spec((17, 65), "data", n, min_size=2) == P()
    # small leaf -> replicate even if divisible
    assert fsdp_spec((8,), "data", n, min_size=256) == P()
    # scalar -> replicate
    assert fsdp_spec((), "data", n) == P()


def test_fsdp_state_shards_on_devices():
    n_dev = len(jax.devices())
    mesh = get_mesh(n_dev)
    cfg = tiny_cfg()
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
    }
    tc = TrainConfig(freeze_layers=0, batch_size=16, compute_dtype="float32")
    opt = make_optimizer(tc, params)
    shardings = fsdp_state_shardings(params, opt, mesh, min_size=256)
    state = TrainState(
        params=shard_tree(params, shardings.params),
        opt_state=shard_tree(opt.init(params), shardings.opt_state),
        step=jnp.zeros((), jnp.int32),
    )
    # token_embedding (600, 64): 600 % 8 == 0 -> row-sharded 75/device
    emb = state.params["clip"]["text"]["token_embedding"]
    assert emb.sharding.spec == P("data", None)
    assert emb.addressable_shards[0].data.shape == (600 // n_dev, 64)

    # the memory claim: device 0 holds well under the full state
    total = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves((state.params, state.opt_state))
        if hasattr(leaf, "size")
    )
    per_dev = sharded_bytes_per_device((state.params, state.opt_state))
    assert per_dev < 0.45 * total, (per_dev, total)


@pytest.mark.parametrize("freeze_layers", [0, 8])
def test_fsdp_step_matches_single_device(rng, freeze_layers):
    """One fsdp step on the 8-device mesh == the single-device step on the
    same global batch (layout only, no math change), including the frozen
    param groups (multi_transform opt-state shards per group)."""
    n_dev = len(jax.devices())
    cfg = tiny_cfg()
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
    }
    tc = TrainConfig(
        freeze_layers=freeze_layers, lr=1e-4, batch_size=16, compute_dtype="float32"
    )
    batch_np = tiny_batch(rng, 16)

    results = []
    for use_fsdp in (False, True):
        opt = make_optimizer(tc, params)
        fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), params)
        if use_fsdp:
            mesh = get_mesh(n_dev)
            shardings = fsdp_state_shardings(params, opt, mesh, min_size=256)
            state = TrainState(
                params=shard_tree(fresh, shardings.params),
                opt_state=shard_tree(opt.init(fresh), shardings.opt_state),
                step=jnp.zeros((), jnp.int32),
            )
            step, eval_step = make_train_step(
                cfg, ClassifierConfig(embed_dim=32), tc, opt,
                mesh=mesh, state_shardings=shardings,
            )
        else:
            state = TrainState(
                params=fresh, opt_state=opt.init(fresh),
                step=jnp.zeros((), jnp.int32),
            )
            step, eval_step = make_train_step(
                cfg, ClassifierConfig(embed_dim=32), tc, opt
            )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        ev = eval_step(state, batch)
        results.append(
            (
                float(metrics["contrastive_loss"]),
                float(ev["contrastive_loss"]),
                np.asarray(state.params["clip"]["text"]["token_embedding"]),
                np.asarray(state.params["clip"]["visual"]["blocks"][0]["mlp"]["fc"]["kernel"]),
            )
        )

    (l1, e1, p1, w1), (l2, e2, p2, w2) = results
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(e1, e2, rtol=1e-5)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(w1, w2, rtol=1e-4, atol=1e-6)


def test_fsdp_shardings_on_shape_structs():
    """Planning works from eval_shape output (no allocation needed)."""
    mesh = get_mesh(len(jax.devices()))
    shapes = {
        "w": jax.ShapeDtypeStruct((1024, 64), jnp.float32),
        "b": jax.ShapeDtypeStruct((64,), jnp.float32),
    }
    sh = fsdp_shardings(shapes, mesh, min_size=256)
    assert sh["w"].spec == P("data", None)
    assert sh["b"].spec == P()


def test_trainer_fsdp_fit(tmp_path, rng):
    """Driver-level integration: Trainer(mesh, fsdp=True) shards the live
    state and completes a fit with finite losses + a working checkpoint."""
    from evr_tpu.training.finetune import Trainer

    n_dev = len(jax.devices())
    mesh = get_mesh(n_dev)
    cfg = tiny_cfg()
    tc = TrainConfig(
        freeze_layers=0, lr=1e-4, batch_size=16, epochs=1,
        compute_dtype="float32", save_dir=str(tmp_path / "ckpt"),
    )
    tr = Trainer(
        cfg,
        init_clip_params(jax.random.PRNGKey(0), cfg),
        tc,
        classifier_params=init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32)
        ),
        mesh=mesh,
        fsdp=True,
    )
    emb = tr.state.params["clip"]["text"]["token_embedding"]
    assert emb.sharding.spec == P("data", None)  # live state is sharded
    assert emb.addressable_shards[0].data.shape[0] == 600 // n_dev

    batches = [tiny_batch(rng, 16) for _ in range(2)]
    out = tr.fit(lambda e: iter(batches))
    assert np.isfinite(out["history"][-1]["train_total_loss"])
    assert (tmp_path / "ckpt" / "final_checkpoint").exists()
