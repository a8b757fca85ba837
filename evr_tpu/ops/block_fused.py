"""Fully fused pre-LN transformer blocks as Pallas TPU kernels.

Each residual block runs as TWO kernels with the block's weights
VMEM-resident across the whole grid (constant index maps → Mosaic loads
them once):

- attention half: LN1 + fused-QKV GEMM + softmax attention + out-proj +
  residual, with G whole sequences packed per score tile (the
  [B,H,T,d] → [B·H/G, G·T, d] regroup is a free contiguous reshape; a
  block-diagonal mask keeps sequences independent, composed with a
  per-sequence causal mask for the text tower);
- MLP half: LN2 + fc + quickGELU/exact-GELU + proj + residual, row-blocked.

Variants in this module: bf16/fp32 forward (`fused_attn_block`,
`fused_mlp_block`, composed by `fused_block_apply`), flash-style backward
kernels (`fused_attn_block_bwd`, `fused_mlp_block_bwd` — recompute the
half's internals in VMEM, emit dx + parameter grads, weight grads
accumulated across the row grid), and an int8 forward
(`fused_quant_block_apply` — resident int8 weights, in-kernel per-token
absmax quant, MXU double-rate int8 GEMMs, models.quant numerics).

All intermediates (qkv, score tiles, MLP hidden) live and die in VMEM;
LN statistics, softmax, and every GEMM accumulation stay fp32. Exact-GELU
computes erf in-kernel (Abramowitz–Stegun 7.1.26) since Mosaic has no
erf lowering. Dispatched by `models.layers.block_apply` under
``attn_impl="auto"`` for W ≤ 1280 towers on TPU — measured −13..−22% per
block vs the XLA composition at every registry tower (PERF.md); gradient
steps still pin XLA (stored-activation backward measured faster than the
recompute-style one at training shapes). Numerics and grads are tested
against the XLA composition in tests/test_pallas.py.

Reference behavior being reproduced: the residual blocks of CLIP's towers
(`Backend/clip_finetune_correct.py:155-185` forward through the pip
``clip`` package).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (|err| ≤ 1.5e-7) — Mosaic has no
    erf/erfc lowering, so the exact-GELU (OpenCLIP towers) activation
    implements it from exp, which is supported."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p_c = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p_c * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_block_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, fc_k_ref, fc_b_ref, pr_k_ref, pr_b_ref, o_ref,
    *, activation,
):
    x = x_ref[:]  # [R, W] model dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)

    h = jax.lax.dot_general(
        y, fc_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + fc_b_ref[:].astype(jnp.float32)
    if activation == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:  # exact gelu (in-kernel erf — Mosaic has no erf primitive)
        h = _gelu_exact(h)
    h = h.astype(x.dtype)

    o = jax.lax.dot_general(
        h, pr_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + pr_b_ref[:].astype(jnp.float32)
    o_ref[:] = x32.astype(jnp.float32).astype(o_ref.dtype) + o.astype(o_ref.dtype)


def _attn_block_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, qkv_k_ref, qkv_b_ref, out_k_ref, out_b_ref, o_ref,
    *, n_heads, t_seq, group, causal,
):
    """LN1 + fused-QKV + (packed) softmax attention + out-proj + residual.

    The row block holds ``group`` whole sequences ([G·T, W]); heads are an
    unrolled static loop (static column slices keep Mosaic happy), each
    head's score tile carries the block-diagonal sequence mask when G > 1
    and the per-sequence causal mask (text tower) when ``causal``.
    """
    x = x_ref[0]  # [G*T, W]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)

    qkv = jax.lax.dot_general(
        y, qkv_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + qkv_b_ref[:].astype(jnp.float32)  # [G*T, 3W]
    qkv = qkv.astype(x.dtype)

    n = x.shape[0]
    w = x.shape[1]
    d = w // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = None
    if group > 1 or causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        if group > 1:
            mask = (row // t_seq) == (col // t_seq)
            if causal:
                mask = jnp.logical_and(mask, (col % t_seq) <= (row % t_seq))
        else:
            mask = col <= row
    heads_out = []
    for h in range(n_heads):
        q = qkv[:, h * d:(h + 1) * d] * jnp.asarray(scale, x.dtype)
        k = qkv[:, w + h * d:w + (h + 1) * d]
        v = qkv[:, 2 * w + h * d:2 * w + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask is not None:
            s = jnp.where(mask, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        heads_out.append((o_h / denom).astype(x.dtype))
    o = jnp.concatenate(heads_out, axis=-1)  # [G*T, W]

    proj = jax.lax.dot_general(
        o, out_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + out_b_ref[:].astype(jnp.float32)
    o_ref[0] = (x32 + proj).astype(o_ref.dtype)


def _merged_block_kernel(
    x_ref, ls1_ref, lb1_ref, qkv_k_ref, qkv_b_ref, out_k_ref, out_b_ref,
    ls2_ref, lb2_ref, fc_k_ref, fc_b_ref, pr_k_ref, pr_b_ref, o_ref,
    *, n_heads, t_seq, group, causal, activation,
):
    """Whole residual block (attn half + MLP half) in ONE kernel.

    Same math as `_attn_block_kernel` → `_mlp_block_kernel`, but the
    mid-block residual stream xc never round-trips HBM — it is cast to the
    model dtype in VMEM (mimicking the two-kernel HBM store/load exactly,
    so numerics are bit-identical) and fed straight into the MLP half.

    MEASURED SLOWER than the two-kernel split and therefore NOT routed by
    `models.layers.block_apply`: 3.61 vs 3.48 ms/block at ViT-B/32's
    headline shape (B=512/T=50/W=768 bf16, standalone chained), 10.99 vs
    10.40 at ViT-L/14@336's (B=64/T=577/W=1024). The split wins because
    the halves want different row tiles — attention packs G·T ≤ 256 rows
    per score tile while the MLP amortises best at 512-row blocks — and
    separate grids let Mosaic pipeline each half's DMA against the other
    rows' compute. Kept as the measured design-space record (the xc HBM
    round trip is NOT the binding term; see PERF.md roofline residue).
    """
    x = x_ref[0]  # [G*T, W]
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * ls1_ref[:].astype(jnp.float32) + lb1_ref[:].astype(jnp.float32)
    y = y.astype(dt)

    qkv = jax.lax.dot_general(
        y, qkv_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + qkv_b_ref[:].astype(jnp.float32)
    qkv = qkv.astype(dt)

    n = x.shape[0]
    w = x.shape[1]
    d = w // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = None
    if group > 1 or causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        if group > 1:
            mask = (row // t_seq) == (col // t_seq)
            if causal:
                mask = jnp.logical_and(mask, (col % t_seq) <= (row % t_seq))
        else:
            mask = col <= row
    heads_out = []
    for h in range(n_heads):
        q = qkv[:, h * d:(h + 1) * d] * jnp.asarray(scale, dt)
        k = qkv[:, w + h * d:w + (h + 1) * d]
        v = qkv[:, 2 * w + h * d:2 * w + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask is not None:
            s = jnp.where(mask, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            p.astype(dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        heads_out.append((o_h / denom).astype(dt))
    o = jnp.concatenate(heads_out, axis=-1)

    proj = jax.lax.dot_general(
        o, out_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + out_b_ref[:].astype(jnp.float32)
    # the two-kernel path stores xc to HBM in model dtype and reloads it;
    # reproduce that rounding so merged == two-kernel bit-for-bit
    xc = (x32 + proj).astype(dt)

    xc32 = xc.astype(jnp.float32)
    mean2 = jnp.mean(xc32, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(xc32 - mean2), axis=-1, keepdims=True)
    y2 = (xc32 - mean2) * jax.lax.rsqrt(var2 + LN_EPS)
    y2 = y2 * ls2_ref[:].astype(jnp.float32) + lb2_ref[:].astype(jnp.float32)
    y2 = y2.astype(dt)

    hdn = jax.lax.dot_general(
        y2, fc_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + fc_b_ref[:].astype(jnp.float32)
    if activation == "quick_gelu":
        hdn = hdn * jax.nn.sigmoid(1.702 * hdn)
    else:
        hdn = _gelu_exact(hdn)
    hdn = hdn.astype(dt)

    proj2 = jax.lax.dot_general(
        hdn, pr_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + pr_b_ref[:].astype(jnp.float32)
    # match _mlp_block_kernel's residual rounding exactly: it adds the two
    # terms AFTER casting each to the output dtype (a bf16-precision add),
    # so do the same here — an fp32 add + single round differs by 1 ulp
    o_ref[0] = xc32.astype(o_ref.dtype) + proj2.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "activation", "interpret", "group", "causal"))
def fused_block_merged(
    x: jax.Array,  # [B, T, W]
    p: dict,  # one residual block's params (layers.init_block layout)
    n_heads: int,
    activation: str = "quick_gelu",
    causal: bool = False,
    interpret: bool | None = None,
    group: int | None = None,
) -> jax.Array:
    """One whole residual block in ONE pallas dispatch (forward only)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    if group is None:
        group = 1
        if T < 128:
            for g in (8, 4, 2):
                if T * g <= 256 and B % g == 0:
                    group = g
                    break

    dt = x.dtype
    x2 = x.reshape(B // group, group * T, W)
    vec = lambda a: pl.BlockSpec(a.shape, (lambda i: (0,) * a.ndim), memory_space=pltpu.VMEM)
    args = (
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
        p["attn"]["out"]["kernel"], p["attn"]["out"]["bias"],
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc"]["kernel"], p["mlp"]["fc"]["bias"],
        p["mlp"]["proj"]["kernel"], p["mlp"]["proj"]["bias"],
    )
    args = tuple(a.astype(dt) for a in args)
    out = pl.pallas_call(
        functools.partial(
            _merged_block_kernel,
            n_heads=n_heads, t_seq=T, group=group, causal=causal,
            activation=activation,
        ),
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((1, group * T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *(vec(a) for a in args),
        ],
        out_specs=pl.BlockSpec((1, group * T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, *args)
    return out.reshape(B, T, W)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret", "group", "causal"))
def fused_attn_block(
    x: jax.Array,  # [B, T, W]
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_kernel: jax.Array,  # [W, 3W]
    qkv_bias: jax.Array,
    out_kernel: jax.Array,  # [W, W]
    out_bias: jax.Array,
    n_heads: int,
    interpret: bool | None = None,
    group: int | None = None,
    causal: bool = False,
) -> jax.Array:
    """x + out(attention(LN(x))) in one dispatch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    if group is None:
        group = 1
        if T < 128:
            for g in (8, 4, 2):
                if T * g <= 256 and B % g == 0:
                    group = g
                    break

    dt = x.dtype
    x2 = x.reshape(B // group, group * T, W)
    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, n_heads=n_heads, t_seq=T, group=group, causal=causal
        ),
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((1, group * T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((W,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(qkv_kernel.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(qkv_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(out_kernel.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group * T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x2,
        ln_scale.astype(dt),
        ln_bias.astype(dt),
        qkv_kernel.astype(dt),
        qkv_bias.astype(dt),
        out_kernel.astype(dt),
        out_bias.astype(dt),
    )
    return out.reshape(B, T, W)


# -- fused backward kernels ----------------------------------------------
#
# Flash-style backward: each half-block's backward is ONE kernel that
# recomputes the forward internals in VMEM (cheap — they never hit HBM)
# and produces dx plus the parameter grads. Weight/bias grads accumulate
# across the row-block grid into outputs with constant index maps (Mosaic
# keeps a revisited output block resident between consecutive grid steps),
# initialised at cell 0. All accumulation is fp32.


def _acc(ref, val, first):
    @pl.when(first)
    def _():
        ref[:] = val.astype(ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        ref[:] = ref[:] + val.astype(ref.dtype)


def _mlp_block_bwd_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, fc_k_ref, fc_b_ref, pr_k_ref, pr_b_ref,
    g_ref,
    dx_ref, dls_ref, dlb_ref, dfck_ref, dfcb_ref, dprk_ref, dprb_ref,
    *, activation,
):
    first = pl.program_id(0) == 0
    x = x_ref[:]
    g32 = g_ref[:].astype(jnp.float32)
    x32 = x.astype(jnp.float32)

    # --- recompute forward internals (never left VMEM in the fwd) ---
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * inv
    y32 = xhat * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    y = y32.astype(x.dtype)
    h_pre = jax.lax.dot_general(
        y, fc_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + fc_b_ref[:].astype(jnp.float32)
    if activation == "quick_gelu":
        sig = jax.nn.sigmoid(1.702 * h_pre)
        h_act = h_pre * sig
        dact = sig * (1.0 + 1.702 * h_pre * (1.0 - sig))
    else:
        erf_v = _erf(h_pre * 0.7071067811865476)
        h_act = 0.5 * h_pre * (1.0 + erf_v)
        # d/dx [x Φ(x)] = Φ(x) + x φ(x); Φ = 0.5(1+erf(x/√2))
        pdf = 0.3989422804014327 * jnp.exp(-0.5 * h_pre * h_pre)
        dact = 0.5 * (1.0 + erf_v) + h_pre * pdf
    h = h_act.astype(x.dtype)

    # --- backward ---
    # out = x + proj(h): dL/dh = g @ proj_kᵀ · act'; dproj_k = hᵀ g
    dprk = jax.lax.dot_general(
        h, g32.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [4W, W]
    _acc(dprk_ref, dprk, first)
    _acc(dprb_ref, jnp.sum(g32, axis=0), first)
    dh = jax.lax.dot_general(
        g32.astype(x.dtype), pr_k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, 4W]
    dh_pre = dh * dact
    dhp = dh_pre.astype(x.dtype)
    dfck = jax.lax.dot_general(
        y, dhp, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [W, 4W]
    _acc(dfck_ref, dfck, first)
    _acc(dfcb_ref, jnp.sum(dh_pre, axis=0), first)
    dy = jax.lax.dot_general(
        dhp, fc_k_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, W]

    # LN backward
    s32 = ln_scale_ref[:].astype(jnp.float32)
    _acc(dls_ref, jnp.sum(dy * xhat, axis=0), first)
    _acc(dlb_ref, jnp.sum(dy, axis=0), first)
    dxhat = dy * s32
    dx_ln = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx_ref[:] = (g32 + dx_ln).astype(dx_ref.dtype)


def _attn_block_bwd_kernel(
    x_ref, ln_scale_ref, ln_bias_ref, qkv_k_ref, qkv_b_ref, out_k_ref, out_b_ref,
    g_ref,
    dx_ref, dls_ref, dlb_ref, dqkvk_ref, dqkvb_ref, doutk_ref, doutb_ref,
    *, n_heads, t_seq, group, causal,
):
    first = pl.program_id(0) == 0
    x = x_ref[0]
    g32 = g_ref[0].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    dt = x.dtype

    # --- recompute forward internals ---
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = xc * inv
    y32 = xhat * ln_scale_ref[:].astype(jnp.float32) + ln_bias_ref[:].astype(jnp.float32)
    y = y32.astype(dt)
    qkv = (
        jax.lax.dot_general(
            y, qkv_k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + qkv_b_ref[:].astype(jnp.float32)
    ).astype(dt)

    n, w = x.shape
    d = w // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = None
    if group > 1 or causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        if group > 1:
            mask = (row // t_seq) == (col // t_seq)
            if causal:
                mask = jnp.logical_and(mask, (col % t_seq) <= (row % t_seq))
        else:
            mask = col <= row

    # dL/do (pre out-proj) and the out-proj grads need o — rebuild per head
    do = jax.lax.dot_general(
        g32.astype(dt), out_k_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, W]
    heads_o = []
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(n_heads):
        q = qkv[:, h * d:(h + 1) * d] * jnp.asarray(scale, dt)
        k = qkv[:, w + h * d:w + (h + 1) * d]
        v = qkv[:, 2 * w + h * d:2 * w + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask is not None:
            s = jnp.where(mask, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        pn = e / jnp.sum(e, axis=-1, keepdims=True)  # [n, n] fp32
        pn_dt = pn.astype(dt)
        o_h = jax.lax.dot_general(
            pn_dt, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        heads_o.append(o_h.astype(dt))

        do_h = do[:, h * d:(h + 1) * d].astype(dt)
        dv_h = jax.lax.dot_general(
            pn_dt, do_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [n, d]
        dpn = jax.lax.dot_general(
            do_h, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [n, n]
        ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
        ds_dt = ds.astype(dt)
        dq_h = jax.lax.dot_general(
            ds_dt, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # grad wrt the UNscaled qkv q-slice
        dk_h = jax.lax.dot_general(
            ds_dt, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # q already carries the scale
        dq_parts.append(dq_h)
        dk_parts.append(dk_h)
        dv_parts.append(dv_h)

    o = jnp.concatenate(heads_o, axis=-1)  # [n, W]
    doutk = jax.lax.dot_general(
        o, g32.astype(dt), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    _acc(doutk_ref, doutk, first)
    _acc(doutb_ref, jnp.sum(g32, axis=0), first)

    dqkv = jnp.concatenate(
        [jnp.concatenate(parts, axis=-1) for parts in (dq_parts, dk_parts, dv_parts)],
        axis=-1,
    )  # [n, 3W] fp32
    dqkv_dt = dqkv.astype(dt)
    dqkvk = jax.lax.dot_general(
        y, dqkv_dt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [W, 3W]
    _acc(dqkvk_ref, dqkvk, first)
    _acc(dqkvb_ref, jnp.sum(dqkv, axis=0), first)
    dy = jax.lax.dot_general(
        dqkv_dt, qkv_k_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [n, W]

    s32 = ln_scale_ref[:].astype(jnp.float32)
    _acc(dls_ref, jnp.sum(dy * xhat, axis=0), first)
    _acc(dlb_ref, jnp.sum(dy, axis=0), first)
    dxhat = dy * s32
    dx_ln = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx_ref[0] = (g32 + dx_ln).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret", "group", "causal"))
def fused_attn_block_bwd(
    x: jax.Array,  # [B, T, W] forward input
    g: jax.Array,  # [B, T, W] output cotangent
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: jax.Array,
    out_kernel: jax.Array,
    out_bias: jax.Array,
    n_heads: int,
    interpret: bool | None = None,
    group: int | None = None,
    causal: bool = False,
):
    """Backward of ``x + out(attention(LN(x)))`` in one dispatch.

    Returns (dx, dln_scale, dln_bias, dqkv_kernel, dqkv_bias, dout_kernel,
    dout_bias).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    if group is None:
        group = 1
        if T < 128:
            for gr in (8, 4, 2):
                if T * gr <= 256 and B % gr == 0:
                    group = gr
                    break
    dt = x.dtype
    f32 = jnp.float32
    n = group * T
    x2 = x.reshape(B // group, n, W)
    g2 = g.reshape(B // group, n, W)
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def const_spec(shape):
        return pl.BlockSpec(shape, (lambda i, m=len(shape): (0,) * m), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _attn_block_bwd_kernel,
            n_heads=n_heads, t_seq=T, group=group, causal=causal,
        ),
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((1, n, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec((W,)), const_spec((W,)),
            const_spec((W, 3 * W)), const_spec((3 * W,)),
            const_spec((W, W)), const_spec((W,)),
            pl.BlockSpec((1, n, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec((W,)), const_spec((W,)),
            const_spec((W, 3 * W)), const_spec((3 * W,)),
            const_spec((W, W)), const_spec((W,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, dt),
            jax.ShapeDtypeStruct((W,), f32), jax.ShapeDtypeStruct((W,), f32),
            jax.ShapeDtypeStruct((W, 3 * W), f32), jax.ShapeDtypeStruct((3 * W,), f32),
            jax.ShapeDtypeStruct((W, W), f32), jax.ShapeDtypeStruct((W,), f32),
        ],
        compiler_params=vmem,
        interpret=interpret,
    )(
        x2,
        ln_scale.astype(dt), ln_bias.astype(dt),
        qkv_kernel.astype(dt), qkv_bias.astype(dt),
        out_kernel.astype(dt), out_bias.astype(dt),
        g2,
    )
    dx = out[0].reshape(B, T, W)
    return (dx,) + tuple(out[1:])


@functools.partial(jax.jit, static_argnames=("activation", "interpret", "block_rows"))
def fused_mlp_block_bwd(
    x: jax.Array,  # [..., W] forward input (residual stream)
    g: jax.Array,  # [..., W] output cotangent
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc_kernel: jax.Array,
    fc_bias: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: jax.Array,
    activation: str = "quick_gelu",
    interpret: bool | None = None,
    block_rows: int = 512,
):
    """Backward of ``x + proj(act(fc(LN(x))))`` in one dispatch.

    Returns (dx, dln_scale, dln_bias, dfc_kernel, dfc_bias, dproj_kernel,
    dproj_bias) — grads in fp32 except dx (x's dtype).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    w = orig_shape[-1]
    hid = fc_kernel.shape[1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, w)
    g2 = g.reshape(rows, w)
    block_rows = min(block_rows, rows)
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))

    dt = x.dtype
    f32 = jnp.float32
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def const_spec(shape):
        return pl.BlockSpec(shape, (lambda i, n=len(shape): (0,) * n), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mlp_block_bwd_kernel, activation=activation),
        grid=((rows + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec((w,)), const_spec((w,)),
            const_spec((w, hid)), const_spec((hid,)),
            const_spec((hid, w)), const_spec((w,)),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec((w,)), const_spec((w,)),
            const_spec((w, hid)), const_spec((hid,)),
            const_spec((hid, w)), const_spec((w,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows + pad, w), dt),
            jax.ShapeDtypeStruct((w,), f32), jax.ShapeDtypeStruct((w,), f32),
            jax.ShapeDtypeStruct((w, hid), f32), jax.ShapeDtypeStruct((hid,), f32),
            jax.ShapeDtypeStruct((hid, w), f32), jax.ShapeDtypeStruct((w,), f32),
        ],
        compiler_params=vmem,
        interpret=interpret,
    )(
        x2,
        ln_scale.astype(dt), ln_bias.astype(dt),
        fc_kernel.astype(dt), fc_bias.astype(dt),
        proj_kernel.astype(dt), proj_bias.astype(dt),
        g2,
    )
    dx = out[0][:rows].reshape(orig_shape)
    return (dx,) + tuple(out[1:])


# -- int8 variant ---------------------------------------------------------
#
# Same two-kernel structure with the models.quant scheme fused in: int8
# weights (per-output-channel scales) stay VMEM-resident at half the bf16
# footprint, activations quantize per token (symmetric absmax) in-kernel,
# GEMMs run int8×int8→int32 on the MXU's double-rate int8 path, and the
# dequant epilogue (x_scale ⊗ kernel_scale, + bias) never leaves VMEM.
# Inference-only, like the quantized params themselves.


def _quant_rows(y32):
    """fp32 [R, C] → (int8 [R, C], fp32 [R, 1] scale): symmetric absmax."""
    amax = jnp.max(jnp.abs(y32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    return jnp.round(y32 / scale).astype(jnp.int8), scale


def _quant_dot(y32, kq_ref, ks_ref, b_ref):
    """fp32 activations × resident int8 weights → fp32, all in VMEM."""
    x_q, x_scale = _quant_rows(y32)
    acc = jax.lax.dot_general(
        x_q, kq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * x_scale * ks_ref[:]
    if b_ref is not None:
        y = y + b_ref[:].astype(jnp.float32)
    return y


def _ln32(x32, scale_ref, bias_ref):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)


def _attn_block_kernel_q(
    x_ref, ln_scale_ref, ln_bias_ref,
    qkv_kq_ref, qkv_ks_ref, qkv_b_ref,
    out_kq_ref, out_ks_ref, out_b_ref,
    o_ref, *, n_heads, t_seq, group, causal,
):
    x = x_ref[0]
    x32 = x.astype(jnp.float32)
    y = _ln32(x32, ln_scale_ref, ln_bias_ref)
    qkv = _quant_dot(y, qkv_kq_ref, qkv_ks_ref, qkv_b_ref).astype(x.dtype)

    n, w = x.shape
    d = w // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = None
    if group > 1 or causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        if group > 1:
            mask = (row // t_seq) == (col // t_seq)
            if causal:
                mask = jnp.logical_and(mask, (col % t_seq) <= (row % t_seq))
        else:
            mask = col <= row
    heads_out = []
    for h in range(n_heads):
        q = qkv[:, h * d:(h + 1) * d] * jnp.asarray(scale, x.dtype)
        k = qkv[:, w + h * d:w + (h + 1) * d]
        v = qkv[:, 2 * w + h * d:2 * w + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask is not None:
            s = jnp.where(mask, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        heads_out.append((o_h / denom).astype(x.dtype))
    o = jnp.concatenate(heads_out, axis=-1).astype(jnp.float32)

    proj = _quant_dot(o, out_kq_ref, out_ks_ref, out_b_ref)
    o_ref[0] = (x32 + proj).astype(o_ref.dtype)


def _mlp_block_kernel_q(
    x_ref, ln_scale_ref, ln_bias_ref,
    fc_kq_ref, fc_ks_ref, fc_b_ref,
    pr_kq_ref, pr_ks_ref, pr_b_ref,
    o_ref, *, activation,
):
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    y = _ln32(x32, ln_scale_ref, ln_bias_ref)
    h = _quant_dot(y, fc_kq_ref, fc_ks_ref, fc_b_ref)
    if activation == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = _gelu_exact(h)
    o = _quant_dot(h, pr_kq_ref, pr_ks_ref, pr_b_ref)
    o_ref[:] = (x32 + o).astype(o_ref.dtype)


def fused_quant_block_apply(
    x: jax.Array,  # [B, T, W]
    p: dict,  # quantized block params (models.quant layout: kernel_q/kernel_scale)
    n_heads: int,
    activation: str = "quick_gelu",
    causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """One full residual block over int8-quantized weights, fused.

    Numerics match `models.quant.quantized_linear` composed the XLA way
    (same per-token absmax quant, same int32 accumulation); inference-only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, W = x.shape
    group = 1
    if T < 128:
        for g in (8, 4, 2):
            if T * g <= 256 and B % g == 0:
                group = g
                break
    dt = x.dtype
    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def vec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    x2 = x.reshape(B // group, group * T, W)
    attn = p["attn"]
    x2 = pl.pallas_call(
        functools.partial(
            _attn_block_kernel_q, n_heads=n_heads, t_seq=T, group=group, causal=causal
        ),
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((1, group * T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            vec(p["ln_1"]["scale"]), vec(p["ln_1"]["bias"]),
            vec(attn["qkv"]["kernel_q"]), vec(attn["qkv"]["kernel_scale"]), vec(attn["qkv"]["bias"]),
            vec(attn["out"]["kernel_q"]), vec(attn["out"]["kernel_scale"]), vec(attn["out"]["bias"]),
        ],
        out_specs=pl.BlockSpec((1, group * T, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dt),
        compiler_params=vmem,
        interpret=interpret,
    )(
        x2,
        p["ln_1"]["scale"].astype(dt), p["ln_1"]["bias"].astype(dt),
        attn["qkv"]["kernel_q"], attn["qkv"]["kernel_scale"].astype(jnp.float32), attn["qkv"]["bias"].astype(jnp.float32),
        attn["out"]["kernel_q"], attn["out"]["kernel_scale"].astype(jnp.float32), attn["out"]["bias"].astype(jnp.float32),
    )

    rows = B * T
    x3 = x2.reshape(rows, W)
    block_rows = min(512, rows)
    pad = (-rows) % block_rows
    if pad:
        x3 = jnp.pad(x3, ((0, pad), (0, 0)))
    mlp = p["mlp"]
    out = pl.pallas_call(
        functools.partial(_mlp_block_kernel_q, activation=activation),
        grid=((rows + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec(p["ln_2"]["scale"]), vec(p["ln_2"]["bias"]),
            vec(mlp["fc"]["kernel_q"]), vec(mlp["fc"]["kernel_scale"]), vec(mlp["fc"]["bias"]),
            vec(mlp["proj"]["kernel_q"]), vec(mlp["proj"]["kernel_scale"]), vec(mlp["proj"]["bias"]),
        ],
        out_specs=pl.BlockSpec((block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + pad, W), dt),
        compiler_params=vmem,
        interpret=interpret,
    )(
        x3,
        p["ln_2"]["scale"].astype(dt), p["ln_2"]["bias"].astype(dt),
        mlp["fc"]["kernel_q"], mlp["fc"]["kernel_scale"].astype(jnp.float32), mlp["fc"]["bias"].astype(jnp.float32),
        mlp["proj"]["kernel_q"], mlp["proj"]["kernel_scale"].astype(jnp.float32), mlp["proj"]["bias"].astype(jnp.float32),
    )
    return out[:rows].reshape(B, T, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_block_apply(
    x: jax.Array,  # [B, T, W]
    p: dict,  # one residual block's params (layers.init_block layout)
    n_heads: int,
    activation: str = "quick_gelu",
    causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """One full pre-LN residual block as two fused kernels.

    Differentiable: the custom VJP runs the fused flash-style backward
    kernels (`fused_attn_block_bwd` / `fused_mlp_block_bwd`) — the
    attention backward recomputes probabilities tile-by-tile from the
    saved row-max/row-sum statistics instead of materialising the [T, T]
    matrix, and the MLP backward recomputes the hidden activation in-kernel
    (see the module docstring for the measured crossover vs XLA).
    """
    return _fused_block_forward(x, p, n_heads, activation, causal, interpret)


def _fused_block_forward(x, p, n_heads, activation, causal, interpret):
    x = fused_attn_block(
        x,
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
        p["attn"]["out"]["kernel"], p["attn"]["out"]["bias"],
        n_heads=n_heads, causal=causal, interpret=interpret,
    )
    return fused_mlp_block(
        x,
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc"]["kernel"], p["mlp"]["fc"]["bias"],
        p["mlp"]["proj"]["kernel"], p["mlp"]["proj"]["bias"],
        activation=activation, interpret=interpret,
    )


def _fused_block_fwd(x, p, n_heads, activation, causal, interpret):
    x_mid = fused_attn_block(
        x,
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
        p["attn"]["out"]["kernel"], p["attn"]["out"]["bias"],
        n_heads=n_heads, causal=causal, interpret=interpret,
    )
    out = fused_mlp_block(
        x_mid,
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc"]["kernel"], p["mlp"]["fc"]["bias"],
        p["mlp"]["proj"]["kernel"], p["mlp"]["proj"]["bias"],
        activation=activation, interpret=interpret,
    )
    # Only the two residual-stream activations are saved; each backward
    # kernel recomputes its half's internals in VMEM (flash-style).
    return out, (x, x_mid, p)


def _fused_block_bwd(n_heads, activation, causal, interpret, res, g):
    x, x_mid, p = res
    dmid, dls2, dlb2, dfck, dfcb, dprk, dprb = fused_mlp_block_bwd(
        x_mid, g,
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc"]["kernel"], p["mlp"]["fc"]["bias"],
        p["mlp"]["proj"]["kernel"], p["mlp"]["proj"]["bias"],
        activation=activation, interpret=interpret,
    )
    dx, dls1, dlb1, dqkvk, dqkvb, doutk, doutb = fused_attn_block_bwd(
        x, dmid,
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
        p["attn"]["out"]["kernel"], p["attn"]["out"]["bias"],
        n_heads=n_heads, causal=causal, interpret=interpret,
    )
    dp = {
        "ln_1": {"scale": dls1, "bias": dlb1},
        "attn": {
            "qkv": {"kernel": dqkvk, "bias": dqkvb},
            "out": {"kernel": doutk, "bias": doutb},
        },
        "ln_2": {"scale": dls2, "bias": dlb2},
        "mlp": {
            "fc": {"kernel": dfck, "bias": dfcb},
            "proj": {"kernel": dprk, "bias": dprb},
        },
    }
    # cotangent dtypes must match the primals'
    dp = jax.tree.map(lambda gr, pr: gr.astype(pr.dtype), dp, p)
    return dx, dp


fused_block_apply.defvjp(_fused_block_fwd, _fused_block_bwd)


@functools.partial(jax.jit, static_argnames=("activation", "interpret", "block_rows"))
def fused_mlp_block(
    x: jax.Array,  # [..., W]
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc_kernel: jax.Array,  # [W, 4W]
    fc_bias: jax.Array,
    proj_kernel: jax.Array,  # [4W, W]
    proj_bias: jax.Array,
    activation: str = "quick_gelu",
    interpret: bool | None = None,
    block_rows: int = 512,
) -> jax.Array:
    """x + proj(act(fc(LN(x)))) in one dispatch. Returns x's shape/dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    w = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, w)
    block_rows = min(block_rows, rows)
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_mlp_block_kernel, activation=activation),
        grid=((rows + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(fc_kernel.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fc_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(proj_kernel.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(proj_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((rows + pad), w), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x2,
        ln_scale.astype(dt),
        ln_bias.astype(dt),
        fc_kernel.astype(dt),
        fc_bias.astype(dt),
        proj_kernel.astype(dt),
        proj_bias.astype(dt),
    )
    return out[:rows].reshape(orig_shape)
