"""Fused LayerNorm (+ optional quickGELU) Pallas kernels.

XLA already fuses most elementwise chains into adjacent matmuls; these
kernels exist for the residual cases where the fusion boundary falls badly
(LN between two matmuls inside the transformer block) and to guarantee fp32
statistics with a single HBM round-trip regardless of surrounding dtypes.
Wired into the towers via ``evr_tpu.models.layers.set_layer_norm_impl`` /
``CLIPConfig`` when profiling shows a win; numerics tested against the jnp
path in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps, activation):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if activation == "quick_gelu":
        y = y * jax.nn.sigmoid(1.702 * y)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "interpret"))
def fused_layer_norm(
    x: jax.Array,  # [..., D]
    scale: jax.Array,  # [D]
    bias: jax.Array,  # [D]
    activation: str = "none",
    interpret: bool | None = None,
) -> jax.Array:
    """Row LayerNorm in fp32 with optional fused quickGELU tail."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import math as _math

    orig_shape = x.shape
    d = orig_shape[-1]
    rows = _math.prod(orig_shape[:-1]) if len(orig_shape) > 1 else 1
    x2 = x.reshape(rows, d)

    block_rows = min(256, rows) if rows > 0 else 1
    pad_rows = ((rows + block_rows - 1) // block_rows) * block_rows if rows else block_rows
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=LN_EPS, activation=activation),
        grid=(pad_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_rows, d), x.dtype),
        interpret=interpret,
    )(x2, scale, bias)

    return out[:rows].reshape(orig_shape)
