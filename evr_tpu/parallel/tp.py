"""Tensor-parallel sharding rules for the CLIP towers.

At ViT-B/32…L/14 scale pure data parallelism is optimal (SURVEY.md §2.5),
but the params are laid out so TP is *a mesh-axis change, not a rewrite*:
Megatron-style column-parallel first matmuls (attention QKV, MLP fc) and
row-parallel second matmuls (attention out, MLP proj) over a ``model`` axis.
Under jit these NamedShardings make GSPMD partition the tower matmuls and
insert the all-reduces after each row-parallel projection — no hand-written
collectives.
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evr_tpu.training.partition import _map_with_paths


def clip_param_shardings(
    mesh: Mesh, params, model_axis: str = "model"
):
    """PyTree of NamedShardings for a params tree ({'clip':…, …})."""

    def spec_for(path, leaf) -> P:
        if leaf.ndim == 0:
            return P()
        joined = "/".join(path)
        # column-parallel: output dim sharded
        if joined.endswith(("attn/qkv/kernel", "mlp/fc/kernel")):
            return P(None, model_axis)
        if joined.endswith(("attn/qkv/bias", "mlp/fc/bias")):
            return P(model_axis)
        # row-parallel: input dim sharded, all-reduce after
        if joined.endswith(("attn/out/kernel", "mlp/proj/kernel")):
            return P(model_axis, None)
        return P()

    return _map_with_paths(
        params, lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf))
    )
