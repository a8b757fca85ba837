"""Muon optimizer — momentum orthogonalized by Newton–Schulz iteration.

Public method (Jordan et al. 2024, "Muon: MomentUm Orthogonalized by
Newton-schulz", github.com/KellerJordan/Muon); no reference counterpart
(the reference trains AdamW only, `Backend/clip_finetune_correct.py`).
Reimplemented TPU-first:

- The whole per-parameter update is five Newton–Schulz steps = ~15 small
  [m,n]×[n,m] GEMMs in bf16 — pure MXU work, no data-dependent control
  flow, trivially fused by XLA under the jitted train step.
- Muon applies to HIDDEN 2-D weight matrices only (the regime the method
  was derived for); embeddings, positional tables, projections out of the
  embedding space, gains/biases and every non-2-D leaf fall back to AdamW
  exactly as the authors prescribe. :func:`muon_param_labels` encodes that
  routing for this package's CLIP/MoE parameter trees.
- Orthogonalized updates are scaled by ``sqrt(max(1, m/n))`` (the
  shape-aware scale from the reference implementation) so learning rates
  transfer across rectangular layers.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

# Quintic Newton–Schulz coefficients from the reference implementation —
# tuned for fastest convergence of the singular values towards 1 (they
# oscillate in ~[0.7, 1.2] rather than converging tightly; Muon only needs
# the spectrum flattened, not exact orthogonality).
_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz_orthogonalize(
    g: jax.Array, steps: int = 5, eps: float = 1e-7
) -> jax.Array:
    """Approximately project a 2-D matrix onto the nearest (semi-)orthogonal
    matrix (U·Vᵀ of its SVD) with ``steps`` quintic Newton–Schulz
    iterations. bf16 compute (the method is stable in bf16 by design —
    that is the point for MXU throughput), fp32 in/out."""
    if g.ndim != 2:
        raise ValueError(f"newton_schulz_orthogonalize needs 2-D, got {g.shape}")
    a, b, c = _NS_COEFFS
    x = g.astype(jnp.bfloat16)
    x = x / (jnp.linalg.norm(x.astype(jnp.float32)) + eps).astype(jnp.bfloat16)
    transposed = g.shape[0] > g.shape[1]
    if transposed:
        x = x.T

    def body(x, _):
        xxt = x @ x.T
        bx = b * xxt + c * (xxt @ xxt)
        return a * x + bx @ x, None

    x, _ = jax.lax.scan(body, x, None, length=steps)
    if transposed:
        x = x.T
    return x.astype(jnp.float32)


class MuonState(NamedTuple):
    momentum: Any  # pytree matching params


def muon(
    learning_rate: optax.ScalarOrSchedule,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
) -> optax.GradientTransformation:
    """Optax transformation implementing the Muon update for 2-D leaves.

    Every leaf this transform sees MUST be 2-D — route non-2-D leaves to
    AdamW with :func:`muon_param_labels` + ``optax.multi_transform``.
    Update: ``buf = μ·buf + g``;  ``u = g + μ·buf`` (nesterov) or ``buf``;
    ``Δ = -lr · NS₅(u) · sqrt(max(1, m/n))``. Accepts a schedule.
    """
    return optax.chain(
        _muon_direction(momentum=momentum, nesterov=nesterov, ns_steps=ns_steps),
        optax.scale_by_learning_rate(learning_rate),
    )


def _muon_direction(
    momentum: float = 0.95, nesterov: bool = True, ns_steps: int = 5
) -> optax.GradientTransformation:
    """The Muon direction (orthogonalized momentum, shape-scaled), WITHOUT
    the learning rate — compose with ``optax.scale_by_learning_rate``."""

    def init(params):
        return MuonState(
            momentum=jax.tree.map(lambda p: jnp.zeros_like(p), params)
        )

    def update(updates, state, params=None):
        del params
        buf = jax.tree.map(
            lambda m, g: momentum * m + g, state.momentum, updates
        )
        use = (
            jax.tree.map(lambda g, m: g + momentum * m, updates, buf)
            if nesterov
            else buf
        )

        def transform(u):
            o = newton_schulz_orthogonalize(u, steps=ns_steps)
            return o * (max(1.0, u.shape[0] / u.shape[1]) ** 0.5)

        return jax.tree.map(transform, use), MuonState(momentum=buf)

    return optax.GradientTransformation(init, update)


def muon_param_labels(params: Any) -> Any:
    """Per-leaf routing pytree for ``optax.multi_transform``: "muon" for
    hidden 2-D weight matrices, "adamw" for everything else.

    "Hidden" is positional, not name-based: Muon applies only to 2-D
    leaves living inside a transformer block stack (``blocks`` in the
    path). Everything outside the blocks — token/positional/class
    embeddings, the contrastive-space projections (CLIP names the visual
    one just ``proj``, so a name marker would miss it), classifier heads,
    logit scale/bias — and every non-2-D leaf stays on AdamW, per the
    method's prescription."""

    def label(path, leaf) -> str:
        names = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        ).lower()
        if getattr(leaf, "ndim", 0) != 2:
            return "adamw"
        if "blocks" not in names:
            return "adamw"
        if "embedding" in names:  # belt: embeddings nested oddly
            return "adamw"
        return "muon"

    return jax.tree_util.tree_map_with_path(label, params)
