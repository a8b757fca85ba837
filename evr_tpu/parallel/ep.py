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
