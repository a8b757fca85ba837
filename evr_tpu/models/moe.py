"""Mixture-of-Experts CLIP towers — LIMoE-style sparse scaling, TPU-native.

No reference analog: the reference serves dense OpenAI CLIP towers only
(`Backend/services/embedding_service.py:70-120`). MoE is how a retrieval
deployment scales tower *capacity* past one chip's HBM without scaling
per-token FLOPs — the multimodal-contrastive formulation is LIMoE
("Multimodal Contrastive Learning with LIMoE", arXiv 2206.02770); the
router/dispatch machinery follows Switch Transformer (arXiv 2101.03961)
and GShard (arXiv 2006.16668) top-k routing; ``upcycle_clip_params``
implements Sparse Upcycling (arXiv 2212.05055: init every expert from the
trained dense MLP so the sparse model starts exactly where the dense one
left off).

TPU-first design:

- **Stacked expert params**: each MoE layer holds its experts as single
  arrays with a leading expert dim — ``fc.kernel [E, W, 4W]``,
  ``proj.kernel [E, 4W, W]`` — so *expert parallelism is a sharding
  annotation* (shard dim 0 over a mesh axis, `parallel.ep`), not a code
  path. GSPMD inserts the all-to-alls; no hand-rolled collectives.
- **Einsum dispatch** (Mesh-TensorFlow / GShard style): routing becomes
  one-hot dispatch/combine tensors contracted on the MXU — no sorts, no
  dynamic shapes, no per-expert Python loops. Capacity ``C`` is static, so
  the whole layer is one fixed-shape XLA program; overflow tokens are
  dropped (their MoE output is 0 and the residual carries them — the
  standard Switch behavior).
- **fp32 router**: routing logits/softmax in fp32 regardless of compute
  dtype (bf16-sensitive argmax ties would flap expert assignment).
- MoE replaces only the MLP half. Dense blocks stay on the full
  `layers.block_apply` machinery; an MoE block's attention half routes
  through the fused Pallas attention-half kernel on the TPU serving path
  (`ops.block_fused.fused_attn_block` — see `moe_block_apply`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import ACTIVATIONS, Params, attention, init_attention, init_layer_norm, layer_norm, linear


@dataclass(frozen=True)
class MoEConfig:
    n_experts: int = 8
    # top-k routing: 1 = Switch, 2 = GShard/LIMoE (renormalised gates)
    router_k: int = 1
    # per-expert slots = ceil(capacity_factor * k * group_size / n_experts)
    capacity_factor: float = 1.25
    # which blocks get MoE MLPs: every Nth, counted from the tower's end
    # (LIMoE places experts in the later blocks; 2 → blocks L-1, L-3, …)
    moe_every: int = 2
    # Switch load-balance aux loss weight (their 1e-2 default)
    aux_weight: float = 1e-2
    # GShard §3.1 token grouping: routing/capacity are computed within
    # fixed-size groups of tokens so the one-hot dispatch/combine tensors
    # stay O(N·E·C) with C ≈ cf·k·S/E — bounded per token — instead of the
    # ungrouped O(N²·k/E) that explodes at serving batch (B=512, T=50 is
    # 25.6k tokens). The effective group is the largest divisor of the
    # token count ≤ this; tiny inputs (tests) collapse to one group.
    group_size: int = 256


def moe_block_indices(n_layers: int, moe_every: int) -> tuple[int, ...]:
    """Block indices carrying MoE MLPs: every ``moe_every``-th from the end
    (the last block always included)."""
    return tuple(range(n_layers - 1, -1, -moe_every))[::-1]


# -- the MoE MLP layer ------------------------------------------------------


def init_moe_mlp(
    rng: jax.Array, width: int, n_layers: int, n_experts: int
) -> Params:
    """Experts as stacked tensors (leading dim E — the ep sharding axis).

    Per-expert init matches the dense `layers.init_block` MLP scales
    (fc std (2W)^-1/2, proj std W^-1/2 (2L)^-1/2); router init is small
    (0.02) so early routing is near-uniform.
    """
    k_r, k_fc, k_proj = jax.random.split(rng, 3)
    proj_std = (width**-0.5) * ((2 * n_layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    return {
        "router": {
            "kernel": jax.random.normal(k_r, (width, n_experts), jnp.float32) * 0.02
        },
        "fc": {
            "kernel": jax.random.normal(
                k_fc, (n_experts, width, 4 * width), jnp.float32
            )
            * fc_std,
            "bias": jnp.zeros((n_experts, 4 * width), jnp.float32),
        },
        "proj": {
            "kernel": jax.random.normal(
                k_proj, (n_experts, 4 * width, width), jnp.float32
            )
            * proj_std,
            "bias": jnp.zeros((n_experts, width), jnp.float32),
        },
    }


def upcycle_moe_mlp(rng: jax.Array, mlp: Params, n_experts: int) -> Params:
    """Sparse Upcycling (arXiv 2212.05055): every expert starts as a copy
    of the trained dense MLP. With renormalised top-k≥2 routing the
    upcycled layer computes exactly what the dense layer did at step 0
    (gates sum to 1 over identical experts); Switch k=1 scales the output
    by the top-1 gate probability (the paper's small initial quality dip)."""
    width = mlp["fc"]["kernel"].shape[0]

    def stack(a):
        return jnp.broadcast_to(a, (n_experts,) + a.shape).astype(jnp.float32)

    return {
        "router": {
            "kernel": jax.random.normal(rng, (width, n_experts), jnp.float32) * 0.02
        },
        "fc": {"kernel": stack(mlp["fc"]["kernel"]), "bias": stack(mlp["fc"]["bias"])},
        "proj": {
            "kernel": stack(mlp["proj"]["kernel"]),
            "bias": stack(mlp["proj"]["bias"]),
        },
    }


def moe_mlp_apply(
    x: jax.Array,
    p: Params,
    moe: MoEConfig,
    activation: str = "quick_gelu",
) -> tuple[jax.Array, jax.Array]:
    """[B, T, W] → ([B, T, W], aux_loss scalar).

    One fixed-shape program: tokens regrouped [G, S, W] (GShard §3.1 —
    capacity and the dispatch/combine one-hots are per-group, keeping
    their footprint O(N·E·C) rather than O(N²·k/E)) → fp32 router softmax
    → top-k gates → cumsum-over-tokens position-in-expert (slot-major
    priority: every token's first choice outranks any token's second
    choice, GShard §3.2) → one-hot dispatch/combine einsums → batched
    per-expert MLP GEMMs ([G, E, C, W] × [E, W, 4W] — MXU-batched).
    Tokens past per-group capacity contribute 0 (residual carries them).
    Aux loss is Switch eq. 4, E · Σ_e f_e·P_e over first-choice
    assignments, computed per group and averaged.
    """
    B, T, W = x.shape
    E, k = moe.n_experts, moe.router_k
    N = B * T
    # group size: largest divisor of N ≤ moe.group_size (static — shapes
    # are compile-time constants); tiny inputs collapse to a single group
    S = max(s for s in range(1, min(moe.group_size, N) + 1) if N % s == 0)
    G = N // S
    C = max(1, math.ceil(moe.capacity_factor * k * S / E))
    C = min(C, S)
    xg = x.reshape(G, S, W)

    logits = jnp.einsum(
        "gsw,we->gse",
        xg.astype(jnp.float32),
        p["router"]["kernel"].astype(jnp.float32),
    )
    probs = jax.nn.softmax(logits, axis=-1)  # [G, S, E] fp32

    gate_vals, gate_idx = jax.lax.top_k(probs, k)  # [G, S, k]
    if k > 1:
        gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)
    mask = jax.nn.one_hot(gate_idx, E, dtype=jnp.float32)  # [G, S, k, E]

    # position of each (token, choice) in its expert's per-group buffer,
    # slot-major: all first choices claim slots before any second choice.
    mask_sm = mask.transpose(0, 2, 1, 3).reshape(G, k * S, E)
    pos_sm = (jnp.cumsum(mask_sm, axis=1) - 1.0) * mask_sm
    pos = pos_sm.reshape(G, k, S, E).transpose(0, 2, 1, 3)  # [G, S, k, E]
    keep = mask * (pos < C)  # overflow dropped

    # combine [G, S, E, C]: gate weight at (expert, slot); dispatch ≠ 0
    slot_oh = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
    ce = slot_oh * keep[..., None]  # [G, S, k, E, C]
    combine = jnp.einsum("gsk,gskec->gsec", gate_vals, ce)
    dispatch = (combine > 0).astype(x.dtype)

    xin = jnp.einsum("gsec,gsw->gecw", dispatch, xg.astype(x.dtype))  # [G,E,C,W]
    fc_k = p["fc"]["kernel"].astype(x.dtype)
    h = (
        jnp.einsum("gecw,ewh->gech", xin, fc_k)
        + p["fc"]["bias"].astype(x.dtype)[None, :, None]
    )
    h = ACTIVATIONS[activation](h)
    proj_k = p["proj"]["kernel"].astype(x.dtype)
    ye = (
        jnp.einsum("gech,ehw->gecw", h, proj_k)
        + p["proj"]["bias"].astype(x.dtype)[None, :, None]
    )
    y = jnp.einsum("gsec,gecw->gsw", combine.astype(x.dtype), ye)

    # Switch load-balance loss over first choices (per group, averaged —
    # GShard computes it per group the same way)
    f = jnp.mean(mask[:, :, 0, :], axis=1)  # [G, E] fraction routed
    P = jnp.mean(probs, axis=1)  # [G, E] mean router prob
    aux = jnp.mean(E * jnp.sum(f * P, axis=-1))
    return y.reshape(B, T, W), aux


# -- MoE residual block ------------------------------------------------------


def init_moe_block(
    rng: jax.Array, width: int, n_layers: int, n_experts: int
) -> Params:
    """Pre-LN block whose MLP half is an MoE layer (attention half identical
    to `layers.init_block`)."""
    k_attn, k_moe, k_proj = jax.random.split(rng, 3)
    proj_std = (width**-0.5) * ((2 * n_layers) ** -0.5)
    attn_p = init_attention(k_attn, width)
    attn_p["out"]["kernel"] = (
        jax.random.normal(k_proj, (width, width), jnp.float32) * proj_std
    )
    return {
        "ln_1": init_layer_norm(width),
        "attn": attn_p,
        "ln_2": init_layer_norm(width),
        "moe": init_moe_mlp(k_moe, width, n_layers, n_experts),
    }


def moe_block_apply(
    x: jax.Array,
    p: Params,
    n_heads: int,
    moe: MoEConfig,
    causal: bool = False,
    attn_impl: str = "xla",
    activation: str = "quick_gelu",
) -> tuple[jax.Array, jax.Array]:
    """The attention half follows `layers.block_apply`'s serving routing:
    ``"auto"`` on TPU (W ≤ 1280) takes the fused Pallas attention-half
    kernel (LN1 + QKV GEMM + packed softmax attention + out-proj +
    residual in one dispatch — `ops.block_fused.fused_attn_block`);
    ``"fused"`` forces it (interpret mode off-TPU, for tests). Gradient
    steps (``"auto_grad"``) resolve to XLA: the standalone attention-half
    kernel carries no VJP, and at MoE tower shapes (T ≤ 77 here) XLA's
    stored-activation fwd+bwd is the measured winner anyway (PERF.md)."""
    if attn_impl == "auto_grad":
        attn_impl = "xla"
    use_fused = attn_impl == "fused" or (
        attn_impl == "auto"
        and x.shape[2] <= 1280
        and jax.default_backend() == "tpu"
    )
    if use_fused:
        from evr_tpu.ops.block_fused import fused_attn_block

        ap = p["attn"]
        x = fused_attn_block(
            x,
            p["ln_1"]["scale"],
            p["ln_1"]["bias"],
            ap["qkv"]["kernel"],
            ap["qkv"]["bias"],
            ap["out"]["kernel"],
            ap["out"]["bias"],
            n_heads,
            causal=causal,
        )
    else:
        x = x + attention(
            layer_norm(x, p["ln_1"]), p["attn"], n_heads, causal, attn_impl
        )
    y, aux = moe_mlp_apply(layer_norm(x, p["ln_2"]), p["moe"], moe, activation)
    return x + y, aux


def run_blocks_moe(
    x: jax.Array,
    blocks: list[Params],
    n_heads: int,
    moe: MoEConfig,
    causal: bool,
    cfg,
) -> tuple[jax.Array, jax.Array]:
    """Mixed dense/MoE block stack: blocks holding a ``"moe"`` subtree route
    through `moe_block_apply`; the rest stay on the dense `layers.block_apply`
    path (fused Pallas kernels on TPU). Honors ``cfg.remat`` like the dense
    `clip._run_blocks` loop (per-block jax.checkpoint, exact numerics).
    Returns (x, summed aux loss)."""
    from .layers import block_apply

    dense_apply = block_apply
    sparse_apply = moe_block_apply
    if getattr(cfg, "remat", False):
        dense_apply = jax.checkpoint(block_apply, static_argnums=(2, 3, 4, 5))
        sparse_apply = jax.checkpoint(
            moe_block_apply, static_argnums=(2, 3, 4, 5, 6)
        )

    aux_total = jnp.float32(0.0)
    for bp in blocks:
        if "moe" in bp:
            x, aux = sparse_apply(
                x, bp, n_heads, moe, causal, cfg.attn_impl, cfg.activation
            )
            aux_total = aux_total + aux
        else:
            x = dense_apply(x, bp, n_heads, causal, cfg.attn_impl, cfg.activation)
    return x, aux_total


# -- MoE-CLIP dual encoder ----------------------------------------------------


def init_moe_clip_params(rng: jax.Array, cfg, moe: MoEConfig) -> Params:
    """Fresh MoE-CLIP init: dense towers with every ``moe_every``-th block
    (from the end) carrying an MoE MLP, both towers (LIMoE is
    modality-shared; here each tower routes its own tokens)."""
    from .clip import init_clip_params

    params = init_clip_params(rng, cfg)
    k_v, k_t = jax.random.split(jax.random.fold_in(rng, 0xE0E))
    for tower, key, layers in (
        ("visual", k_v, cfg.vision.layers),
        ("text", k_t, cfg.text.layers),
    ):
        width = params[tower]["blocks"][0]["mlp"]["fc"]["kernel"].shape[0]
        for i in moe_block_indices(layers, moe.moe_every):
            block = dict(params[tower]["blocks"][i])
            block["moe"] = init_moe_mlp(
                jax.random.fold_in(key, i), width, layers, moe.n_experts
            )
            del block["mlp"]
            params[tower]["blocks"][i] = block
    return params


def upcycle_clip_params(rng: jax.Array, params: Params, cfg, moe: MoEConfig) -> Params:
    """Sparse-Upcycle a trained dense CLIP (arXiv 2212.05055): selected
    blocks' dense MLPs become E identical experts; with renormalised
    top-k≥2 routing the MoE model's step-0 forward equals the dense
    model's exactly (gates sum to 1 over identical experts)."""
    out = {k: v for k, v in params.items()}
    k_v, k_t = jax.random.split(jax.random.fold_in(rng, 0xE0E))
    for tower, key, layers in (
        ("visual", k_v, cfg.vision.layers),
        ("text", k_t, cfg.text.layers),
    ):
        blocks = list(out[tower]["blocks"])
        for i in moe_block_indices(layers, moe.moe_every):
            block = dict(blocks[i])
            block["moe"] = upcycle_moe_mlp(
                jax.random.fold_in(key, i), block["mlp"], moe.n_experts
            )
            del block["mlp"]
            blocks[i] = block
        out[tower] = {**out[tower], "blocks": blocks}
    return out


def encode_image_moe(
    params: Params,
    cfg,
    moe: MoEConfig,
    pixels: jax.Array,
    dtype=jnp.float32,
    patch_keep: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """pixels [B,H,W,3] → ([B, embed_dim] unnormalised, aux loss).

    ``patch_keep`` [B, K] int32 composes FLIP patch masking exactly as in
    `clip.encode_image` (the gather happens in ``_vision_prefix``)."""
    from .clip import _vision_prefix, vision_pool

    v = cfg.vision
    p = params["visual"]
    x = pixels.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x,
        p["patch_embed"]["kernel"].astype(dtype),
        window_strides=(v.patch_size, v.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(x.shape[0], v.grid * v.grid, v.width)
    x = _vision_prefix(p, cfg, x, dtype, patch_keep)
    x, aux = run_blocks_moe(x, p["blocks"], v.heads, moe, False, cfg)
    return vision_pool(params, cfg, x, dtype), aux


def encode_text_moe(
    params: Params, cfg, moe: MoEConfig, tokens: jax.Array, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """tokens [B, ctx] → ([B, embed_dim] unnormalised, aux loss)."""
    from .clip import text_pool, text_tokens

    t = cfg.text
    x = text_tokens(params, cfg, tokens, dtype)
    x, aux = run_blocks_moe(x, params["text"]["blocks"], t.heads, moe, True, cfg)
    return text_pool(params, cfg, x, tokens, dtype), aux


def moe_clip_forward(
    params: Params,
    cfg,
    moe: MoEConfig,
    pixels: jax.Array,
    tokens: jax.Array,
    dtype=jnp.float32,
) -> dict[str, jax.Array]:
    """Joint forward (`clip.clip_forward` surface + ``aux_loss``): add
    ``moe.aux_weight * aux_loss`` to the contrastive objective when
    training (Switch's load-balance term)."""
    img, aux_i = encode_image_moe(params, cfg, moe, pixels, dtype)
    txt, aux_t = encode_text_moe(params, cfg, moe, tokens, dtype)
    img_n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img_n @ txt_n.T
    return {
        "image_features": img_n,
        "text_features": txt_n,
        "logits_per_image": logits_per_image,
        "logits_per_text": logits_per_image.T,
        "aux_loss": aux_i + aux_t,
    }
