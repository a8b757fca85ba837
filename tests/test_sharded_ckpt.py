"""Sharding-aware checkpointing (`training.sharded_ckpt`): save sharded
device trees without host gathering, restore straight into a target
sharding — including a DIFFERENT topology than the one saved from
(elastic restore). Virtual 8-device CPU mesh via tests/conftest.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.parallel.mesh import get_mesh
from evr_tpu.parallel import pp
from evr_tpu.parallel.tp import clip_param_shardings
from evr_tpu.training.sharded_ckpt import restore_sharded, save_sharded


@pytest.fixture(scope="module")
def small_params():
    cfg = CLIPConfig(
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=4, heads=4),
        text=TextConfig(context_length=16, vocab_size=128, width=32, layers=4, heads=2),
        embed_dim=16,
    )
    return cfg, init_clip_params(jax.random.PRNGKey(0), cfg)


def _assert_trees_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a,
        b,
    )


def test_tp_sharded_roundtrip(small_params, tmp_path):
    _, params = small_params
    mesh = get_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    shardings = clip_param_shardings(mesh, params)
    sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
    save_sharded(tmp_path / "ckpt", sharded)

    restored = restore_sharded(tmp_path / "ckpt", shardings)
    _assert_trees_equal(restored, params)
    # placement preserved: a column-parallel kernel stays model-sharded
    leaf = restored["visual"]["blocks"][0]["attn"]["qkv"]["kernel"]
    assert leaf.sharding.spec == P(None, "model")
    local = leaf.sharding.shard_shape(leaf.shape)
    assert local[1] == leaf.shape[1] // 2


def test_cross_topology_restore(small_params, tmp_path):
    """Save from tp=2, restore replicated AND restore onto tp-over-4 —
    the elastic-restore story: the checkpoint is topology-free."""
    _, params = small_params
    mesh2 = get_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, clip_param_shardings(mesh2, params)
    )
    save_sharded(tmp_path / "ckpt", sharded)

    mesh_rep = get_mesh(8, axis_names=("data",))
    rep = NamedSharding(mesh_rep, P())
    restored_rep = restore_sharded(
        tmp_path / "ckpt", jax.tree_util.tree_map(lambda _: rep, params)
    )
    _assert_trees_equal(restored_rep, params)

    mesh4 = get_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    restored_4 = restore_sharded(
        tmp_path / "ckpt", clip_param_shardings(mesh4, params)
    )
    _assert_trees_equal(restored_4, params)
    leaf = restored_4["visual"]["blocks"][0]["mlp"]["fc"]["kernel"]
    assert leaf.sharding.shard_shape(leaf.shape)[1] == leaf.shape[1] // 4


def test_pp_stage_sharded_roundtrip(small_params, tmp_path):
    """Stage-stacked block params save/restore with their stage placement."""
    _, params = small_params
    mesh = get_mesh(4, axis_names=("stage",))
    rest, v_stacked, t_stacked = pp.stage_params(mesh, params)
    save_sharded(tmp_path / "v", v_stacked)
    sh = pp.stage_shardings(mesh, v_stacked)
    restored = restore_sharded(tmp_path / "v", sh)
    _assert_trees_equal(restored, pp.stack_blocks(params["visual"]["blocks"]))
    leaf = jax.tree_util.tree_leaves(restored)[0]
    assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 4


def test_train_state_roundtrip(small_params, tmp_path):
    """params + optimizer moments + step via the TrainState helpers;
    moments inherit their params' shardings under adamw."""
    import optax

    from evr_tpu.training.sharded_ckpt import (
        restore_train_state_sharded,
        save_train_state_sharded,
    )

    _, params = small_params
    mesh = get_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    shardings = clip_param_shardings(mesh, params)
    sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
    opt = optax.adamw(1e-4)
    opt_state = jax.jit(opt.init)(sharded)
    save_train_state_sharded(tmp_path / "st", sharded, opt_state, 7)

    opt_target = jax.tree_util.tree_map(lambda a: a, opt_state)
    p2, o2, step = restore_train_state_sharded(
        tmp_path / "st", shardings, opt_target
    )
    _assert_trees_equal(p2, params)
    _assert_trees_equal(o2, opt_state)
    assert int(step) == 7


def test_overwrite_is_crash_safe(small_params, tmp_path):
    """Overwriting save: the old checkpoint survives until the new one is
    fully written; a leftover .tmp from a swap-window crash restores."""
    _, params = small_params
    mesh = get_mesh(8, axis_names=("data",))
    rep = NamedSharding(mesh, P())
    tree1 = {"w": jax.device_put(jnp.ones((4, 4)), rep)}
    tree2 = {"w": jax.device_put(jnp.full((4, 4), 2.0), rep)}
    save_sharded(tmp_path / "c", tree1)
    save_sharded(tmp_path / "c", tree2)  # overwrite path exercised
    got = restore_sharded(tmp_path / "c", {"w": rep})
    np.testing.assert_array_equal(np.asarray(got["w"]), np.full((4, 4), 2.0))
    assert not (tmp_path / "c.tmp").exists()

    # simulate a crash in the swap window: final dir gone, tmp complete
    (tmp_path / "c").rename(tmp_path / "c.tmp")
    got = restore_sharded(tmp_path / "c", {"w": rep})
    np.testing.assert_array_equal(np.asarray(got["w"]), np.full((4, 4), 2.0))


def test_template_array_target(small_params, tmp_path):
    """A template tree of live arrays works as the restore target."""
    _, params = small_params
    mesh = get_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, clip_param_shardings(mesh, params)
    )
    save_sharded(tmp_path / "ckpt", sharded)
    restored = restore_sharded(tmp_path / "ckpt", sharded)
    _assert_trees_equal(restored, params)
    assert (
        restored["text"]["blocks"][0]["attn"]["qkv"]["kernel"].sharding
        == sharded["text"]["blocks"][0]["attn"]["qkv"]["kernel"].sharding
    )
