"""SigLIP contrastive fine-tuning — trains the second model family.

The CLIP ``Trainer`` is deliberately CLIP-shaped (freeze-prefix groups,
classifier head, EOT pooling, logit-scale-only temperature); SigLIP needs
none of that machinery, so its trainer is the minimal TPU-idiomatic step:
one jitted, donated, optionally mesh-sharded function that

    stages uint8 → [-1, 1] → both towers → L2 normalize →
    pairwise sigmoid loss (the training objective SigLIP was derived
    with, `parallel/contrastive.py::siglip_loss_single`) → AdamW.

Under a data mesh the batch is annotated with `NamedSharding(P("data"))`
and params replicate; the sigmoid loss has no global softmax, so XLA's
inserted collectives reproduce single-device math exactly at equal global
batch (asserted in `tests/test_siglip_train.py`, the same bar every CLIP
training path meets).

No reference counterpart (the reference fine-tunes CLIP only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from evr_tpu.models import siglip as sig
from evr_tpu.parallel.contrastive import siglip_loss_single


@dataclass
class SiglipTrainConfig:
    lr: float = 1e-5
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-6
    grad_clip: float = 1.0
    compute_dtype: str = "float32"


class SiglipTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_siglip_optimizer(tc: SiglipTrainConfig) -> optax.GradientTransformation:
    opt = optax.adamw(
        learning_rate=tc.lr,
        b1=tc.betas[0],
        b2=tc.betas[1],
        eps=tc.eps,
        weight_decay=tc.weight_decay,
    )
    if tc.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_clip), opt)
    return opt


def make_siglip_train_step(
    cfg: sig.SiglipConfig,
    tc: SiglipTrainConfig,
    opt: optax.GradientTransformation,
    mesh=None,
):
    """Returns ``step(state, batch) -> (state, metrics)``.

    ``batch``: {"images": [B, S, S, 3] uint8 staged pixels,
    "tokens": [B, ctx] int32}. B must divide the mesh's data axis when
    sharded.
    """
    dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch):
        pixels = batch["images"].astype(dtype) * (2.0 / 255.0) - 1.0
        img = sig.encode_image(params, cfg, pixels, dtype)
        txt = sig.encode_text(params, cfg, batch["tokens"], dtype)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return siglip_loss_single(
            img, txt, params["logit_scale"], params["logit_bias"]
        )

    def step(state: SiglipTrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            SiglipTrainState(params, opt_state, state.step + 1),
            {"loss": loss},
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    # dp: batch sharded over the data axis, state replicated (committed by
    # fit_siglip's device_puts; jit propagates those shardings — the
    # sigmoid loss's pairwise GEMM lowers to the exact global math)
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(None, {"images": data, "tokens": data}),
    )


def fit_siglip(
    params,
    cfg: sig.SiglipConfig,
    batches,
    tc: SiglipTrainConfig | None = None,
    mesh=None,
    steps: int | None = None,
) -> tuple[Any, list[float]]:
    """Convenience loop: iterate ``batches`` (dicts of numpy arrays) for up
    to ``steps`` updates; returns (trained params, per-step losses)."""
    tc = tc or SiglipTrainConfig()
    opt = make_siglip_optimizer(tc)
    step = make_siglip_train_step(cfg, tc, opt, mesh=mesh)
    fresh = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fresh = jax.device_put(fresh, NamedSharding(mesh, P()))
    state = SiglipTrainState(
        params=fresh,
        opt_state=opt.init(fresh),
        step=jnp.zeros((), jnp.int32),
    )
    losses = []
    for i, batch in enumerate(batches):
        if steps is not None and i >= steps:
            break
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch = {
                k: jax.device_put(
                    jnp.asarray(v), NamedSharding(mesh, P("data"))
                )
                for k, v in batch.items()
            }
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return state.params, losses
