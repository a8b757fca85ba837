"""Fully sharded data parallelism (ZeRO-3 style) for the fine-tune stack.

Reference parity: none — the reference trains on a single GPU with fully
replicated optimizer state (`Backend/clip_finetune_correct.py:336` picks one
``cuda`` device; SURVEY.md §2.5 finds no distributed training of any kind).
This module is new TPU-native capability: at ViT-L/H scale the AdamW state
(2 fp32 moments + fp32 master params) dominates HBM, and the idiomatic JAX
answer is to *annotate* parameter and optimizer-state shardings over the
``data`` mesh axis and let XLA's SPMD partitioner insert the per-layer
all-gathers (forward/backward) and reduce-scatters (gradients) that
hand-written ZeRO implementations do manually.

Design:

- :func:`fsdp_shardings` — the sharding rule: each array leaf is sharded
  along its largest mesh-divisible dimension; leaves smaller than
  ``min_size`` elements stay replicated (gather latency would dominate).
- :func:`fsdp_state_shardings` — applies the rule to a full
  ``TrainState`` (params + optimizer state via ``jax.eval_shape`` on
  ``optimizer.init``, so AdamW moments/accumulators shard exactly like
  their parameters; scalar counts replicate).
- ``training.finetune.make_train_step(..., state_shardings=...)`` consumes
  the result: the SAME jitted step used for pure dp runs fully sharded —
  no separate FSDP training loop exists, which is the point.

Exactness: fsdp changes only layout, never math — one step under fsdp
equals the single-device step on the same global batch
(`tests/test_fsdp.py`).
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this many elements stay replicated: a [3] bias or a
# scalar logit_scale costs more in collective latency than it saves in HBM.
DEFAULT_MIN_SIZE = 2**14


def fsdp_spec(shape: tuple[int, ...], axis: str, n_shards: int, min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec for one array: ``axis`` on the largest divisible
    dimension (ties: the trailing one — output/vocab dims, the conventional
    fsdp choice); small or indivisible leaves replicate."""
    if not shape or math.prod(shape) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % n_shards == 0 and d > 1 and (best is None or d >= shape[best]):
            best = i
    if best is None:
        return P()
    return P(*(axis if i == best else None for i in range(len(shape))))


def fsdp_shardings(
    tree: Any, mesh: Mesh, axis: str = "data", min_size: int = DEFAULT_MIN_SIZE
) -> Any:
    """Map every array leaf (arrays or ShapeDtypeStructs) to its fsdp
    :class:`NamedSharding` under ``mesh``."""
    n = mesh.shape[axis]

    def to_sharding(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        return NamedSharding(mesh, fsdp_spec(shape, axis, n, min_size))

    return jax.tree_util.tree_map(to_sharding, tree)


def fsdp_state_shardings(
    params: Any,
    optimizer,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = DEFAULT_MIN_SIZE,
    ema: bool = False,
):
    """Sharding pytree for a full ``TrainState`` (params, opt_state, step).

    Optimizer-state leaf shapes come from ``jax.eval_shape(optimizer.init,
    params)`` — no optimizer memory is allocated to plan the layout, so this
    is safe to call before the (possibly too-big-replicated) state exists.
    """
    from evr_tpu.training.finetune import TrainState

    param_sh = fsdp_shardings(params, mesh, axis, min_size)
    opt_shapes = jax.eval_shape(lambda p: optimizer.init(p), params)
    opt_sh = fsdp_shardings(opt_shapes, mesh, axis, min_size)
    return TrainState(
        params=param_sh,
        opt_state=opt_sh,
        step=NamedSharding(mesh, P()),
        # the EMA tree is params-shaped, so it shards exactly like them
        ema_params=param_sh if ema else None,
    )


def shard_tree(tree: Any, shardings: Any) -> Any:
    """Place ``tree`` on devices with the given shardings (host → sharded
    device buffers; each device receives only its 1/n slice of large leaves)."""
    return jax.device_put(tree, shardings)


def sharded_bytes_per_device(tree: Any) -> int:
    """Bytes of ``tree`` addressable on device 0 — the number fsdp shrinks."""
    dev0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for shard in leaf.addressable_shards:
            if shard.device == dev0:
                total += shard.data.size * shard.data.dtype.itemsize
    return total
