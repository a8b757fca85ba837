"""Expert-parallel (ep) sharding rules for MoE-CLIP towers.

Companion to `models.moe`, same philosophy as `parallel.tp`: expert
parallelism is *a mesh-axis change, not a rewrite*. Each MoE layer stores
its experts as stacked tensors with a leading expert dim
(``fc.kernel [E, W, 4W]``, ``proj.kernel [E, 4W, W]`` — `models.moe`),
so sharding dim 0 over a mesh axis places E/n experts per device. Under
jit, GSPMD then partitions the batched per-expert GEMMs and inserts the
token all-to-alls around the dispatch/combine einsums (tokens live on the
data axis, experts on the expert axis — the GShard §3.3 layout, riding
ICI). Routers and every dense leaf stay replicated (or take their own
dp/fsdp/tp rules — ep composes: the axes are independent).
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evr_tpu.training.partition import _map_with_paths


def moe_param_shardings(mesh: Mesh, params, expert_axis: str = "expert"):
    """PyTree of NamedShardings: expert-stacked leaves sharded on dim 0
    over ``expert_axis``; everything else (routers, dense blocks,
    embeddings, projections) replicated.

    An MoE leaf is any array under a ``"moe"`` node in a ``fc``/``proj``
    subtree — exactly the tensors `models.moe.init_moe_mlp` stacks with a
    leading expert dim. Router kernels are deliberately replicated: every
    token needs every expert's score before dispatch.
    """

    def spec_for(path, leaf) -> P:
        if "moe" in path and len(path) >= 2 and path[-2] in ("fc", "proj"):
            return P(expert_axis, *(None,) * (leaf.ndim - 1))
        return P()

    return _map_with_paths(
        params, lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf))
    )


def shard_moe_params(mesh: Mesh, params, expert_axis: str = "expert"):
    """Place a params tree on the mesh under the ep layout."""
    import jax

    shardings = moe_param_shardings(mesh, params, expert_axis)
    return jax.tree.map(jax.device_put, params, shardings)


def ep_state_shardings(
    params, optimizer, mesh: Mesh, expert_axis: str = "expert", ema: bool = False
):
    """Sharding pytree for a full ``TrainState`` under expert parallelism:
    expert-stacked leaves (params AND their AdamW moments) sharded on dim 0
    over ``expert_axis``, everything else replicated — the training analog
    of :func:`moe_param_shardings`, consumable by
    ``training.finetune.make_train_step(state_shardings=...)``.

    Optimizer-state leaf shapes come from ``jax.eval_shape(optimizer.init,
    params)`` (no memory allocated to plan the layout); the moments live in
    params-shaped subtrees so the same path rule applies — each device holds
    only its experts' moments, the ZeRO-for-experts layout GShard uses.
    """
    import jax

    from evr_tpu.training.finetune import TrainState

    param_sh = moe_param_shardings(mesh, params, expert_axis)
    opt_shapes = jax.eval_shape(lambda p: optimizer.init(p), params)

    def spec_for_leaf(path, leaf):
        if "moe" in path and len(path) >= 2 and path[-2] in ("fc", "proj"):
            ndim = len(getattr(leaf, "shape", ()) or ())
            if ndim >= 1:
                return NamedSharding(mesh, P(expert_axis, *(None,) * (ndim - 1)))
        return NamedSharding(mesh, P())

    # optax states are namedtuples _map_with_paths cannot descend (it only
    # knows dicts/lists) — walk with jax's own path API instead.
    def path_keys(jax_path):
        keys = []
        for entry in jax_path:
            if hasattr(entry, "key"):
                keys.append(str(entry.key))
            elif hasattr(entry, "name"):
                keys.append(str(entry.name))
            elif hasattr(entry, "idx"):
                keys.append(str(entry.idx))
        return tuple(keys)

    opt_sh = jax.tree_util.tree_map_with_path(
        lambda p, leaf: spec_for_leaf(path_keys(p), leaf), opt_shapes
    )
    return TrainState(
        params=param_sh,
        opt_state=opt_sh,
        step=NamedSharding(mesh, P()),
        # the EMA tree is params-shaped, so it shards exactly like them
        ema_params=param_sh if ema else None,
    )
