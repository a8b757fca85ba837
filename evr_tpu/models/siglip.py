"""SigLIP dual encoder — the second model family next to CLIP.

No reference counterpart (`/root/reference` serves OpenAI CLIP only); the
parity target is HuggingFace ``transformers.SiglipModel`` (Zhai et al.,
"Sigmoid Loss for Language Image Pre-Training", arXiv 2303.15343), verified
tower-by-tower against torch at random init (`tests/test_siglip.py`).

Architectural deltas vs `models/clip.py` (why this is not just a config):

- **No CLS token, no pre-LN, biased patch conv.** The vision tower embeds
  grid² patch tokens directly and pools with a **MAP head** (learned probe
  query → one cross-attention over all tokens → LN → residual MLP).
- **Bidirectional text tower, last-token pooling.** No causal mask, no
  argmax-EOT: final LN → take position −1 → a learned ``head`` linear.
- **No projection into a shared smaller space**: embeddings live at tower
  width; similarity is scaled by ``exp(logit_scale)`` and shifted by
  ``logit_bias`` (the sigmoid-loss parameterization — the matching
  training loss already exists as ``TrainConfig(contrastive_loss=
  "siglip")``).
- **tanh-GELU activations, LayerNorm eps 1e-6** (CLIP: quickGELU, 1e-5) —
  the towers carry their own block forward so the eps stays exact.

Functional style matches the package: params pytrees + pure ``encode_*``
functions, compute dtype as a call-site arg, LN/softmax fp32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models.layers import init_layer_norm, init_linear, layer_norm, linear

Params = Any
LN_EPS_SIGLIP = 1e-6


@dataclass(frozen=True)
class SiglipVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class SiglipTextConfig:
    context_length: int = 64
    vocab_size: int = 32000
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072


@dataclass(frozen=True)
class SiglipConfig:
    vision: SiglipVisionConfig = field(default_factory=SiglipVisionConfig)
    text: SiglipTextConfig = field(default_factory=SiglipTextConfig)

    @property
    def embed_dim(self) -> int:
        # SigLIP has no projection: features live at tower width
        return self.text.width


# -- init -------------------------------------------------------------------


def _init_block(rng, width: int, mlp_dim: int, n_layers: int) -> Params:
    k_attn, k_out, k_fc, k_proj = jax.random.split(rng, 4)
    std = width**-0.5
    proj_std = std * ((2 * n_layers) ** -0.5)
    return {
        "ln_1": init_layer_norm(width),
        "attn": {
            "qkv": init_linear(k_attn, width, 3 * width, std=std),
            "out": init_linear(k_out, width, width, std=proj_std),
        },
        "ln_2": init_layer_norm(width),
        "mlp": {
            "fc": init_linear(k_fc, width, mlp_dim, std=(2 * width) ** -0.5),
            "proj": init_linear(k_proj, mlp_dim, width, std=proj_std),
        },
    }


def init_siglip_params(rng: jax.Array, cfg: SiglipConfig) -> Params:
    v, t = cfg.vision, cfg.text
    keys = jax.random.split(rng, 12 + v.layers + t.layers)
    kv, kt = keys[0], keys[1]
    # distinct keys per table — sharing one across towers would make the
    # text positional table a bit-identical prefix of the visual one
    k_vpos, k_tpos, k_thead, _ = keys[8 + v.layers + t.layers :]

    visual = {
        "patch_embed": {
            "kernel": jax.random.normal(
                kv, (v.patch_size, v.patch_size, 3, v.width), jnp.float32
            )
            * (v.width**-0.5),
            "bias": jnp.zeros((v.width,), jnp.float32),
        },
        "pos_embedding": jax.random.normal(
            k_vpos, (v.grid * v.grid, v.width), jnp.float32
        )
        * 0.02,
        "blocks": [
            _init_block(keys[8 + i], v.width, v.mlp_dim, v.layers)
            for i in range(v.layers)
        ],
        "ln_post": init_layer_norm(v.width),
        "head": {
            "probe": jax.random.normal(keys[3], (1, v.width), jnp.float32)
            * 0.02,
            "attn": {
                "qkv": init_linear(keys[4], v.width, 3 * v.width),
                "out": init_linear(keys[5], v.width, v.width),
            },
            "ln": init_layer_norm(v.width),
            "mlp": {
                "fc": init_linear(keys[6], v.width, v.mlp_dim),
                "proj": init_linear(keys[7], v.mlp_dim, v.width),
            },
        },
    }
    text = {
        "token_embedding": jax.random.normal(
            kt, (t.vocab_size, t.width), jnp.float32
        )
        * 0.02,
        "pos_embedding": jax.random.normal(
            k_tpos, (t.context_length, t.width), jnp.float32
        )
        * 0.02,
        "blocks": [
            _init_block(keys[8 + v.layers + i], t.width, t.mlp_dim, t.layers)
            for i in range(t.layers)
        ],
        "ln_final": init_layer_norm(t.width),
        "head": init_linear(k_thead, t.width, t.width),
    }
    return {
        "visual": visual,
        "text": text,
        # sigmoid-loss parameterization (paper init: scale log(10), bias -10)
        "logit_scale": jnp.asarray(np.log(10.0), jnp.float32),
        "logit_bias": jnp.asarray(-10.0, jnp.float32),
    }


# -- forward ----------------------------------------------------------------


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _mha(q, kv, p, n_heads: int, dtype) -> jax.Array:
    """Multi-head attention with packed qkv params; ``q`` [B, Tq, W] may
    differ from ``kv`` [B, Tk, W] (the MAP head's probe query). fp32
    softmax. Projections route through ``layers.linear`` so int8-quantized
    weights (models.quant) dispatch onto the MXU int8 path."""
    b, tq, w = q.shape
    tk = kv.shape[1]
    d = w // n_heads
    if q is kv:  # self-attention: one packed projection
        qkv = linear(q.astype(dtype), p["qkv"])
        qp, kp, vp = qkv[..., :w], qkv[..., w : 2 * w], qkv[..., 2 * w :]
    else:  # cross-attention (MAP probe): project each side, slice outputs
        qp = linear(q.astype(dtype), p["qkv"])[..., :w]
        kvp = linear(kv.astype(dtype), p["qkv"])
        kp, vp = kvp[..., w : 2 * w], kvp[..., 2 * w :]
    qh = qp.reshape(b, tq, n_heads, d)
    kh = kp.reshape(b, tk, n_heads, d)
    vh = vp.reshape(b, tk, n_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(d, jnp.float32)
    ).astype(dtype)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, tq, w)
    return linear(out, p["out"])


def _block(x, p, n_heads: int, dtype) -> jax.Array:
    h = layer_norm(x, p["ln_1"], eps=LN_EPS_SIGLIP)
    x = x + _mha(h, h, p["attn"], n_heads, dtype)
    h = layer_norm(x, p["ln_2"], eps=LN_EPS_SIGLIP)
    h = linear(h.astype(dtype), p["mlp"]["fc"])
    h = _gelu_tanh(h)
    h = linear(h, p["mlp"]["proj"])
    return x + h


def encode_image(
    params: Params,
    cfg: SiglipConfig,
    pixels: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """[B, H, W, 3] preprocessed pixels → [B, width] pooled features
    (HF ``SiglipVisionModel`` forward incl. the MAP pooling head)."""
    v = cfg.vision
    p = params["visual"]
    x = pixels.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x,
        p["patch_embed"]["kernel"].astype(dtype),
        window_strides=(v.patch_size, v.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["bias"].astype(dtype)
    b = x.shape[0]
    x = x.reshape(b, v.grid * v.grid, v.width)
    x = x + p["pos_embedding"].astype(dtype)
    for blk in p["blocks"]:
        x = _block(x, blk, v.heads, dtype)
    x = layer_norm(x, p["ln_post"], eps=LN_EPS_SIGLIP)

    # MAP head: learned probe cross-attends over all tokens, then a
    # residual MLP (HF SiglipMultiheadAttentionPoolingHead)
    h = p["head"]
    probe = jnp.broadcast_to(h["probe"].astype(dtype), (b, 1, v.width))
    pooled = _mha(probe, x, h["attn"], v.heads, dtype)
    res = pooled
    pooled = layer_norm(pooled, h["ln"], eps=LN_EPS_SIGLIP)
    pooled = (
        pooled @ h["mlp"]["fc"]["kernel"].astype(dtype)
        + h["mlp"]["fc"]["bias"].astype(dtype)
    )
    pooled = _gelu_tanh(pooled)
    pooled = (
        pooled @ h["mlp"]["proj"]["kernel"].astype(dtype)
        + h["mlp"]["proj"]["bias"].astype(dtype)
    )
    return (res + pooled)[:, 0].astype(jnp.float32)


def encode_text(
    params: Params,
    cfg: SiglipConfig,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """[B, T] token ids → [B, width] features (bidirectional attention,
    LAST-token pooling, learned head — HF ``SiglipTextModel``)."""
    t = cfg.text
    p = params["text"]
    x = p["token_embedding"].astype(dtype)[tokens]
    x = x + p["pos_embedding"].astype(dtype)[: x.shape[1]]
    for blk in p["blocks"]:
        x = _block(x, blk, t.heads, dtype)
    x = layer_norm(x, p["ln_final"], eps=LN_EPS_SIGLIP)
    pooled = x[:, -1]
    return (
        pooled @ p["head"]["kernel"].astype(dtype)
        + p["head"]["bias"].astype(dtype)
    ).astype(jnp.float32)


def siglip_forward(
    params: Params,
    cfg: SiglipConfig,
    pixels: jax.Array,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    img = encode_image(params, cfg, pixels, dtype)
    txt = encode_text(params, cfg, tokens, dtype)
    img_n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits = (
        img_n @ txt_n.T * jnp.exp(params["logit_scale"]) + params["logit_bias"]
    )
    return {
        "image_features": img_n,
        "text_features": txt_n,
        "logits_per_image": logits,
        "logits_per_text": logits.T,
    }


# -- HF converter -----------------------------------------------------------


def _np_(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _ln_(sd, prefix):
    return {"scale": _np_(sd[f"{prefix}.weight"]), "bias": _np_(sd[f"{prefix}.bias"])}


def _lin_(sd, prefix):
    return {
        "kernel": _np_(sd[f"{prefix}.weight"]).T,
        "bias": _np_(sd[f"{prefix}.bias"]),
    }


def _hf_siglip_block(sd, prefix):
    q = _np_(sd[f"{prefix}.self_attn.q_proj.weight"])
    k = _np_(sd[f"{prefix}.self_attn.k_proj.weight"])
    v = _np_(sd[f"{prefix}.self_attn.v_proj.weight"])
    qb = _np_(sd[f"{prefix}.self_attn.q_proj.bias"])
    kb = _np_(sd[f"{prefix}.self_attn.k_proj.bias"])
    vb = _np_(sd[f"{prefix}.self_attn.v_proj.bias"])
    return {
        "ln_1": _ln_(sd, f"{prefix}.layer_norm1"),
        "attn": {
            "qkv": {
                "kernel": np.concatenate([q.T, k.T, v.T], axis=1),
                "bias": np.concatenate([qb, kb, vb]),
            },
            "out": _lin_(sd, f"{prefix}.self_attn.out_proj"),
        },
        "ln_2": _ln_(sd, f"{prefix}.layer_norm2"),
        "mlp": {
            "fc": _lin_(sd, f"{prefix}.mlp.fc1"),
            "proj": _lin_(sd, f"{prefix}.mlp.fc2"),
        },
    }


def from_hf_siglip_state_dict(sd: Mapping[str, Any], cfg: SiglipConfig) -> dict:
    """``transformers.SiglipModel.state_dict()`` → params pytree."""
    visual = {
        "patch_embed": {
            "kernel": _np_(
                sd["vision_model.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _np_(sd["vision_model.embeddings.patch_embedding.bias"]),
        },
        "pos_embedding": _np_(
            sd["vision_model.embeddings.position_embedding.weight"]
        ),
        "blocks": [
            _hf_siglip_block(sd, f"vision_model.encoder.layers.{i}")
            for i in range(cfg.vision.layers)
        ],
        "ln_post": _ln_(sd, "vision_model.post_layernorm"),
        "head": {
            "probe": _np_(sd["vision_model.head.probe"]).reshape(1, -1),
            "attn": {
                # torch nn.MultiheadAttention packs qkv as in_proj
                "qkv": {
                    "kernel": _np_(
                        sd["vision_model.head.attention.in_proj_weight"]
                    ).T,
                    "bias": _np_(sd["vision_model.head.attention.in_proj_bias"]),
                },
                "out": _lin_(sd, "vision_model.head.attention.out_proj"),
            },
            "ln": _ln_(sd, "vision_model.head.layernorm"),
            "mlp": {
                "fc": _lin_(sd, "vision_model.head.mlp.fc1"),
                "proj": _lin_(sd, "vision_model.head.mlp.fc2"),
            },
        },
    }
    text = {
        "token_embedding": _np_(
            sd["text_model.embeddings.token_embedding.weight"]
        ),
        "pos_embedding": _np_(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "blocks": [
            _hf_siglip_block(sd, f"text_model.encoder.layers.{i}")
            for i in range(cfg.text.layers)
        ],
        "ln_final": _ln_(sd, "text_model.final_layer_norm"),
        "head": _lin_(sd, "text_model.head"),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np_(sd["logit_scale"]).reshape(()),
        "logit_bias": _np_(sd["logit_bias"]).reshape(()),
    }


# Published SigLIP geometries (HF model-card configs; weights are
# deployment assets on zero-egress images — these are the shapes).
SIGLIP_REGISTRY: dict[str, SiglipConfig] = {
    "siglip-base-patch16-224": SiglipConfig(),
    "siglip-base-patch16-256": SiglipConfig(
        vision=SiglipVisionConfig(image_size=256),
    ),
    "siglip-base-patch16-384": SiglipConfig(
        vision=SiglipVisionConfig(image_size=384),
    ),
    "siglip-large-patch16-256": SiglipConfig(
        vision=SiglipVisionConfig(
            image_size=256, width=1024, layers=24, heads=16, mlp_dim=4096
        ),
        text=SiglipTextConfig(width=1024, layers=24, heads=16, mlp_dim=4096),
    ),
    "siglip-so400m-patch14-384": SiglipConfig(
        vision=SiglipVisionConfig(
            image_size=384, patch_size=14, width=1152, layers=27,
            heads=16, mlp_dim=4304,
        ),
        text=SiglipTextConfig(
            width=1152, layers=27, heads=16, mlp_dim=4304,
        ),
    ),
}


def get_siglip_config(name: str) -> SiglipConfig:
    try:
        return SIGLIP_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown SigLIP model {name!r}; known: {sorted(SIGLIP_REGISTRY)}"
        ) from None


def siglip_config_from_hf(hf_cfg) -> SiglipConfig:
    """``transformers.SiglipConfig`` → :class:`SiglipConfig`."""
    v, t = hf_cfg.vision_config, hf_cfg.text_config
    return SiglipConfig(
        vision=SiglipVisionConfig(
            image_size=v.image_size,
            patch_size=v.patch_size,
            width=v.hidden_size,
            layers=v.num_hidden_layers,
            heads=v.num_attention_heads,
            mlp_dim=v.intermediate_size,
        ),
        text=SiglipTextConfig(
            context_length=t.max_position_embeddings,
            vocab_size=t.vocab_size,
            width=t.hidden_size,
            layers=t.num_hidden_layers,
            heads=t.num_attention_heads,
            mlp_dim=t.intermediate_size,
        ),
    )
