"""GPipe-style pipeline parallelism for the CLIP towers.

The reference has no distributed substrate at all (every device decision is
a single ``"cuda" if available else "cpu"`` string,
`/root/reference/Backend/services/__init__.py:35`); this module is part of
the TPU-native scale story (SURVEY.md §2.5): the transformer block stack is
split into S contiguous *stages* laid out over a ``stage`` mesh axis, and
microbatches stream through the stages with activations hopping one ICI
neighbour per step via ``jax.lax.ppermute``.

Design (the standard JAX/TPU pipeline shape — scan over time steps inside
``shard_map``, one block-group application per device per step):

- Block params are **stacked** along a leading layer axis
  (`stack_blocks`) and sharded ``P('stage', ...)`` — each device
  materialises only its ``L/S`` blocks, which is the memory point of
  pipeline parallelism. Stem/pool params are tiny and stay replicated.
- Inside ``shard_map`` every device runs the same scan of
  ``M + S - 1`` steps (M microbatches): stage 0 ingests microbatch ``t``,
  stage ``i`` applies its block group to whatever activation arrived last
  step, and ``ppermute`` shifts activations to stage ``i+1``. The bubble
  is the usual ``(S-1)/(M+S-1)`` — pick ``M >= 4·S`` to amortise.
- The last stage's outputs are zero-masked elsewhere and ``psum``-restored
  so the (cheap) pooling tail runs replicated — no host gather.
- Everything is differentiable (``ppermute``/``psum``/``scan`` all have
  transposes), so the same runner serves pipelined *training*: grads of
  stage-sharded params stay stage-sharded.

``ep`` (expert parallelism) intentionally has no counterpart here: CLIP's
towers are dense — there are no experts to shard (documented scope, not a
gap).

Composes with the ``data`` axis (dp×pp): shard the batch over ``data``,
the block stack over ``stage`` — see ``tests/test_pp.py`` and
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evr_tpu.models.clip import (
    CLIPConfig,
    text_pool,
    text_tokens,
    vision_pool,
    vision_tokens,
)
from evr_tpu.models.layers import block_apply

Params = Any


def stack_blocks(blocks: list[Params]) -> Params:
    """List of per-block param pytrees → one pytree with a leading [L] axis.

    All CLIP blocks are shape-identical (`models.layers.init_block`), so the
    stack is exact; the leading axis is what gets sharded over ``stage``.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_blocks(stacked: Params) -> list[Params]:
    """Inverse of `stack_blocks` (host-side convenience)."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]


def stage_shardings(mesh: Mesh, stacked: Params, stage_axis: str = "stage"):
    """NamedShardings placing each stage's block group on its stage device
    (leading layer axis split over ``stage_axis``)."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(stage_axis)), stacked
    )


def _apply_block_group(x, stacked_local, heads, causal, attn_impl, activation):
    """Apply this device's [L/S, ...] block group sequentially (scan over
    the layer axis → one traced block regardless of depth)."""

    def body(h, bp):
        return block_apply(h, bp, heads, causal, attn_impl, activation), None

    out, _ = lax.scan(body, x, stacked_local)
    return out


def pipeline_blocks(
    x_mb: jax.Array,
    stacked_local: Params,
    heads: int,
    causal: bool = False,
    attn_impl: str = "xla",
    activation: str = "quick_gelu",
    axis: str = "stage",
) -> jax.Array:
    """Run microbatches [M, mb, T, W] through the staged block stack.

    MUST be called inside ``shard_map`` with ``axis`` a mesh axis of size S;
    ``stacked_local`` is the local [L/S, ...] stage slice. Returns the
    block-stack output for every microbatch, replicated across stages
    (zero-masked + psum — the tail is cheap, run it everywhere).
    """
    S = lax.psum(1, axis)
    idx = lax.axis_index(axis)
    M = x_mb.shape[0]
    steps = M + S - 1

    perm = [(i, (i + 1) % S) for i in range(S)]
    state = jnp.zeros_like(x_mb[0])
    out = jnp.zeros_like(x_mb)

    def body(carry, t):
        state, out = carry
        mb_in = lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
        )
        inp = jnp.where(idx == 0, mb_in, state)
        y = _apply_block_group(
            inp, stacked_local, heads, causal, attn_impl, activation
        )
        slot = t - (S - 1)
        slot_c = jnp.clip(slot, 0, M - 1)
        write = (idx == S - 1) & (slot >= 0)
        cur = lax.dynamic_index_in_dim(out, slot_c, axis=0, keepdims=False)
        out = lax.dynamic_update_index_in_dim(
            out, jnp.where(write, y, cur), slot_c, axis=0
        )
        state = lax.ppermute(y, axis, perm)
        return (state, out), None

    (state, out), _ = lax.scan(body, (state, out), jnp.arange(steps))
    # Only the last stage holds real outputs; everyone else holds zeros.
    out = jnp.where(idx == S - 1, out, jnp.zeros_like(out))
    return lax.psum(out, axis)


def _microbatch(x: jax.Array, n_micro: int) -> jax.Array:
    B = x.shape[0]
    if B % n_micro != 0:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    return x.reshape(n_micro, B // n_micro, *x.shape[1:])


def _check_stages(n_layers: int, n_stages: int) -> None:
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} blocks do not split evenly over {n_stages} stages"
        )


def make_pipelined_image_encode(
    mesh: Mesh,
    cfg: CLIPConfig,
    n_micro: int,
    dtype=jnp.float32,
    stage_axis: str = "stage",
    data_axis: str | None = None,
    presplit: bool = False,
):
    """Pipelined vision encode over ``stage_axis`` (batch optionally
    sharded over ``data_axis``).

    ``presplit=False`` (default): returns jitted ``(params, pixels) ->
    [B, embed_dim]`` taking the normal CLIP pytree — the block stack is
    (re)stacked and stage-sharded inside the jit on every call, which is
    fine for tests/one-shots but does per-call device work proportional to
    the block params.

    ``presplit=True``: returns jitted ``(rest, stacked, pixels) -> ...``
    taking the output of `split_vision_params` / `stage_params` directly,
    so the staged stack stays device-resident across calls (the serving
    shape).
    """
    S = mesh.shape[stage_axis]
    _check_stages(cfg.vision.layers, S)
    dspec = P(data_axis) if data_axis else P()

    def fn(rest, stacked_local, pixels):
        x = vision_tokens(rest, cfg, pixels, dtype)
        x_mb = _microbatch(x, n_micro)
        y = pipeline_blocks(
            x_mb,
            stacked_local,
            cfg.vision.heads,
            causal=False,
            attn_impl=cfg.attn_impl,
            activation=cfg.activation,
            axis=stage_axis,
        )
        y = y.reshape(x.shape)
        return vision_pool(rest, cfg, y, dtype)

    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(stage_axis), dspec),
        out_specs=dspec,
        check_rep=False,
    )

    if presplit:
        return jax.jit(mapped)

    @jax.jit
    def encode(params, pixels):
        rest, stacked = split_vision_params(params)
        return mapped(rest, stacked, pixels)

    return encode


def make_pipelined_text_encode(
    mesh: Mesh,
    cfg: CLIPConfig,
    n_micro: int,
    dtype=jnp.float32,
    stage_axis: str = "stage",
    data_axis: str | None = None,
    presplit: bool = False,
):
    """Pipelined causal text encode over ``stage_axis``. Returns jitted
    ``(params, tokens) -> [B, embed_dim]``, or with ``presplit=True``
    ``(rest, stacked, tokens) -> ...`` taking `split_text_params` /
    `stage_params` output (device-resident stack — see
    `make_pipelined_image_encode`)."""
    S = mesh.shape[stage_axis]
    _check_stages(cfg.text.layers, S)
    dspec = P(data_axis) if data_axis else P()

    def fn(rest, stacked_local, tokens):
        x = text_tokens(rest, cfg, tokens, dtype)
        x_mb = _microbatch(x, n_micro)
        y = pipeline_blocks(
            x_mb,
            stacked_local,
            cfg.text.heads,
            causal=True,
            attn_impl=cfg.attn_impl,
            activation=cfg.activation,
            axis=stage_axis,
        )
        y = y.reshape(x.shape)
        return text_pool(rest, cfg, y, tokens, dtype)

    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(stage_axis), dspec),
        out_specs=dspec,
        check_rep=False,
    )

    if presplit:
        return jax.jit(mapped)

    @jax.jit
    def encode(params, tokens):
        rest, stacked = split_text_params(params)
        return mapped(rest, stacked, tokens)

    return encode


def split_vision_params(params: Params) -> tuple[Params, Params]:
    """(params-without-vision-blocks, stacked vision blocks).

    The 'rest' tree keeps the original structure with ``blocks`` emptied so
    stem/pool helpers index it unchanged."""
    rest = dict(params)
    visual = dict(params["visual"])
    stacked = stack_blocks(visual["blocks"])
    visual["blocks"] = ()
    rest["visual"] = visual
    return rest, stacked


def split_text_params(params: Params) -> tuple[Params, Params]:
    rest = dict(params)
    text = dict(params["text"])
    stacked = stack_blocks(text["blocks"])
    text["blocks"] = ()
    rest["text"] = text
    return rest, stacked


def stage_params(mesh: Mesh, params: Params, stage_axis: str = "stage"):
    """Device-place a CLIP params tree for pipelined execution: both towers'
    blocks stacked + stage-sharded, everything else replicated. Returns
    (rest, vision_stacked, text_stacked) ready to pass to the ``fn``s above
    (use when you want placement up front rather than per-call)."""
    rest, v_stacked = split_vision_params(params)
    rest, t_stacked = split_text_params(rest)
    rep = NamedSharding(mesh, P())
    rest = jax.device_put(rest, rep)
    v_stacked = jax.device_put(v_stacked, stage_shardings(mesh, v_stacked, stage_axis))
    t_stacked = jax.device_put(t_stacked, stage_shardings(mesh, t_stacked, stage_axis))
    return rest, v_stacked, t_stacked
