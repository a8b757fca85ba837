"""LoRA parameter-efficient fine-tuning (arXiv 2106.09685), TPU-native.

No reference analog — the reference's trainers either fine-tune full towers
(T1, `Backend/clip_finetune_correct.py`) or freeze CLIP entirely and train
projection heads (T3, `content/source_training/training_CLIP_multimodal.py`).
LoRA fills the gap between those extremes: rank-r adapters on the block
linears train <1% of the parameters (and allocate optimizer moments only for
those), while the *merged* model is architecturally identical to the base.

TPU-first design — adapters merge INSIDE the jitted step, the forward never
changes:

- The adapters are a separate small pytree mirroring the tower block
  structure; each adapted linear holds ``{"a": [d_in, r], "b": [r, d_out]}``
  with ``b`` zero-initialised, so the adapted model equals the base model
  exactly at step 0 (standard LoRA init).
- :func:`merge_lora` computes ``W' = W + (alpha / r) * a @ b`` for every
  adapted kernel. The train step calls it on the fly and differentiates
  through the merge: the forward pass runs on ordinary dense weights — every
  existing attention implementation and fused Pallas block kernel applies
  untouched, FLIP patch masking / remat / dp / fsdp compose unchanged — and
  XLA's backward contracts the dense kernel cotangent onto the rank-r
  factors (``dA = dW @ bᵀ``, ``dB = aᵀ @ dW``), which is exactly LoRA's
  gradient. The merge itself is a handful of rank-r GEMMs per block,
  negligible next to the fwd+bwd it wraps.
- Serving/export needs no adapter support at all: merge once, get a plain
  CLIP params pytree (`merge_lora`), and every downstream surface — engine,
  AOT bundles, torch export, int8 quantisation — consumes it as-is.

Base weights stay bit-identical during training (they are labelled
``frozen`` in the optimizer, `training.partition.param_group_labels`);
``logit_scale`` (and SigLIP's ``logit_bias``) remain trainable, matching
how the reference always trains the temperature
(`clip_finetune_correct.py:347-349`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# Block linears that receive adapters, as paths inside one residual block.
# Default = all four (attention QKV/out + MLP fc/proj); the LoRA paper's
# attention-only variant is ("attn.qkv", "attn.out").
DEFAULT_TARGETS: tuple[str, ...] = ("attn.qkv", "attn.out", "mlp.fc", "mlp.proj")


def _target_path(target: str) -> tuple[str, ...]:
    return tuple(target.split("."))


def _block_linear(block: Params, target: str) -> Params:
    node: Any = block
    for k in _target_path(target):
        node = node[k]
    return node


def init_lora(
    rng: jax.Array,
    clip_params: Params,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    towers: Sequence[str] = ("visual", "text"),
) -> Params:
    """Zero-effect adapters for every targeted linear in every block.

    ``a`` ~ N(0, 1/r) (the paper's Kaiming-style init), ``b`` = 0 — so
    ``merge_lora(params, init_lora(...))`` equals ``params`` exactly.
    Returns ``{"visual": {"blocks": [...]}, "text": {"blocks": [...]}}``
    with one ``{"a", "b"}`` dict per (block, target).
    """
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    lora: Params = {}
    for tower in towers:
        blocks = clip_params[tower]["blocks"]
        tower_blocks = []
        for block in blocks:
            entry: Params = {}
            for target in targets:
                kernel = _block_linear(block, target)["kernel"]
                d_in, d_out = kernel.shape
                rng, sub = jax.random.split(rng)
                node = entry
                path = _target_path(target)
                for k in path[:-1]:
                    node = node.setdefault(k, {})
                node[path[-1]] = {
                    "a": jax.random.normal(sub, (d_in, rank), jnp.float32)
                    * (rank**-0.5),
                    "b": jnp.zeros((rank, d_out), jnp.float32),
                }
            tower_blocks.append(entry)
        lora[tower] = {"blocks": tower_blocks}
    return lora


def merge_lora(clip_params: Params, lora: Params, alpha: float = 16.0) -> Params:
    """Fold adapters into dense kernels: ``W + (alpha / r) * a @ b``.

    Pure function of both pytrees (differentiable w.r.t. either), returning
    a full CLIP params tree that shares every un-adapted leaf with the
    input (no copies). Use it inside a jitted loss for training, or once at
    export time to produce an ordinary checkpoint."""

    def merge_block(block: Params, adapters: Params) -> Params:
        out = dict(block)
        for key, sub in adapters.items():
            if isinstance(sub, dict) and "a" in sub and "b" in sub:
                a, b = sub["a"], sub["b"]
                scale = alpha / a.shape[1]
                lin = dict(out[key])
                lin["kernel"] = lin["kernel"] + scale * (a @ b)
                out[key] = lin
            else:
                out[key] = merge_block(block[key], sub)
        return out

    merged = dict(clip_params)
    for tower, tower_lora in lora.items():
        t = dict(merged[tower])
        t["blocks"] = [
            merge_block(block, adapters)
            for block, adapters in zip(t["blocks"], tower_lora["blocks"])
        ]
        merged[tower] = t
    return merged


def lora_param_fraction(clip_params: Params, lora: Params) -> float:
    """Trainable-adapter parameter count as a fraction of the base model."""

    def count(tree) -> int:
        return sum(int(x.size) for x in jax.tree.leaves(tree))

    return count(lora) / count(clip_params)
