"""Sharding-aware checkpointing for multi-chip params.

`finetune.Trainer.save_checkpoint` snapshots through host numpy — correct
and simple for data-parallel training (params replicated, snapshot cheap).
For tensor-/pipeline-parallel trees (`parallel.tp.clip_param_shardings`,
`parallel.pp.stage_params`) that round trip all-gathers every shard to one
host and drops the placement; at real model scale it is exactly what
checkpointing must not do. The reference has no distributed checkpointing
at all (single-GPU `torch.save` dicts, `clip_finetune_correct.py:216-224`).

This module keeps device arrays as `jax.Array`s end to end:

- `save_sharded` hands orbax the sharded tree directly — each host writes
  only the shards it owns (OCDBT), no gather.
- `restore_sharded` restores **straight into a target sharding**: pass a
  pytree of NamedShardings (or a template tree of sharded arrays) and each
  device reads only its shard. The target may differ from the saved
  topology — restoring a tp=2 checkpoint onto a dp-replicated or tp=4 mesh
  just changes the slice each device pulls (orbax reshards on read), which
  is the standard elastic-restore story on TPU pods.
"""

from __future__ import annotations

import pathlib
import shutil
from typing import Any

import jax
import jax.numpy as jnp


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded(path: str | pathlib.Path, tree: Any) -> None:
    """Write a (possibly sharded) jax.Array pytree without host gathering.

    Crash-safe overwrite: the tree is fully written to ``<path>.tmp``
    first, the old checkpoint is then removed and the tmp dir renamed into
    place. A crash mid-save leaves the previous checkpoint intact; a crash
    in the (tiny) swap window leaves the complete ``.tmp``, which
    `restore_sharded` falls back to."""
    path = pathlib.Path(path).absolute()
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    ckptr.save(tmp, tree)
    ckptr.wait_until_finished()
    if path.exists():
        shutil.rmtree(path)
    tmp.rename(path)


def restore_sharded(path: str | pathlib.Path, target: Any) -> Any:
    """Restore into ``target``'s shardings.

    ``target`` may be a pytree of `jax.sharding.Sharding`s matched to the
    saved tree's structure, or a template pytree of arrays/ShapeDtypeStructs
    (shardings read from the leaves). Returns device arrays laid out
    accordingly; a leaf without a sharding restores as host-replicated.
    """
    from jax.sharding import Sharding

    path = pathlib.Path(path).absolute()
    if not path.exists():
        # crashed in save_sharded's swap window: the fully-written tmp is
        # the newest complete checkpoint
        tmp = path.with_name(path.name + ".tmp")
        if tmp.exists():
            path = tmp
    ckptr = _checkpointer()
    leaves = jax.tree_util.tree_leaves(target)
    if any(isinstance(l, Sharding) for l in leaves):
        # shardings carry no shape/dtype — take those from the saved
        # metadata (same tree structure as the saved params tree)
        meta = ckptr.metadata(path).item_metadata.tree

        def from_meta(meta_leaf, tgt):
            shape, dtype = tuple(meta_leaf.shape), meta_leaf.dtype
            if isinstance(tgt, Sharding):
                return jax.ShapeDtypeStruct(shape, dtype, sharding=tgt)
            sharding = getattr(tgt, "sharding", None)
            if sharding is not None:
                return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)
            return jax.ShapeDtypeStruct(shape, dtype)

        abstract = jax.tree_util.tree_map(from_meta, meta, target)
    else:
        # template tree of arrays/ShapeDtypeStructs: self-describing (and
        # robust to container types orbax metadata flattens away, e.g.
        # optax EmptyState nodes)
        def from_leaf(tgt):
            sds = jax.ShapeDtypeStruct(jnp.shape(tgt), jnp.asarray(tgt).dtype if not hasattr(tgt, "dtype") else tgt.dtype)
            sharding = getattr(tgt, "sharding", None)
            if sharding is not None:
                sds = jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=sharding)
            return sds

        abstract = jax.tree_util.tree_map(from_leaf, target)
    return ckptr.restore(path, abstract)


def save_train_state_sharded(
    path: str | pathlib.Path, params: Any, opt_state: Any, step
) -> None:
    """Sharded save of a full TrainState (params + optimizer moments +
    step): moments carry the same shardings as their params under every
    optax transform used here, so they stream shard-wise too."""
    save_sharded(pathlib.Path(path) / "params", params)
    save_sharded(pathlib.Path(path) / "opt", opt_state)
    save_sharded(
        pathlib.Path(path) / "step", {"step": jnp.asarray(step, jnp.int32)}
    )


def restore_train_state_sharded(
    path: str | pathlib.Path, params_target: Any, opt_target: Any
) -> tuple[Any, Any, Any]:
    params = restore_sharded(pathlib.Path(path) / "params", params_target)
    opt_state = restore_sharded(pathlib.Path(path) / "opt", opt_target)
    step = restore_sharded(
        pathlib.Path(path) / "step", {"step": jax.ShapeDtypeStruct((), jnp.int32)}
    )["step"]
    return params, opt_state, step
