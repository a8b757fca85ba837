"""Multi-chip semantics on the virtual CPU mesh: global-batch InfoNCE must
equal the single-device loss at the same global batch; merge_topk is exact."""

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.ops.topk import merge_topk
from evr_tpu.parallel import get_mesh
from evr_tpu.parallel.contrastive import infonce_loss_single, make_sharded_infonce


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_global_infonce_matches_single_device(rng):
    n_dev = len(jax.devices())
    B, D = 4 * n_dev, 32
    img = _norm(rng.normal(size=(B, D))).astype(np.float32)
    txt = _norm(rng.normal(size=(B, D))).astype(np.float32)
    scale = jnp.asarray(np.log(1 / 0.07), jnp.float32)

    single = infonce_loss_single(jnp.asarray(img), jnp.asarray(txt), scale)

    mesh = get_mesh(n_dev)
    sharded_fn = make_sharded_infonce(mesh)
    sharded = sharded_fn(jnp.asarray(img), jnp.asarray(txt), scale)

    np.testing.assert_allclose(float(single), float(sharded), rtol=1e-5)


def test_merge_topk_exact(rng):
    S, Q, k, N = 4, 3, 5, 40
    # build S shards of scores over disjoint global index ranges
    full = rng.normal(size=(Q, S * N)).astype(np.float32)
    shard_scores, shard_idx = [], []
    for s in range(S):
        block = full[:, s * N : (s + 1) * N]
        top = np.argsort(-block, axis=1)[:, :k]
        shard_scores.append(np.take_along_axis(block, top, axis=1))
        shard_idx.append(top + s * N)
    scores, idx = merge_topk(
        jnp.asarray(np.stack(shard_scores)), jnp.asarray(np.stack(shard_idx)), k
    )
    expected_idx = np.argsort(-full, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), expected_idx)
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(full, expected_idx, axis=1), rtol=1e-6
    )


def test_mesh_shapes():
    n = len(jax.devices())
    mesh = get_mesh(n)
    assert mesh.shape["data"] == n
    mesh2 = get_mesh(n, axis_names=("data", "model"), shape=(n // 2, 2))
    assert mesh2.shape["data"] == n // 2 and mesh2.shape["model"] == 2
