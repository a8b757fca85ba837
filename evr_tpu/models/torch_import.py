"""Checkpoint interop: torch CLIP state dicts → evr_tpu param pytrees.

Two source layouts are supported, covering everything the reference loads:

1. **OpenAI pip-``clip`` layout** — what `Backend/services/embedding_service.
   py:74` (`clip.load('ViT-B/32')`) and every fine-tune checkpoint
   (`clip_finetune_correct.py:216-224`, keys prefixed ``clip_model.``) use:
   fused ``attn.in_proj_weight``, ``visual.proj`` applied as ``x @ proj``.
2. **HuggingFace ``CLIPModel`` layout** — what the evaluation harness loads
   for FLAVA/OpenCLIP-style comparisons (`compare_models.py`): split
   q/k/v projections, ``visual_projection.weight`` applied as ``x @ W.T``.

All conversion is pure numpy; torch is only needed to deserialise ``.pt``
files. Fine-tune checkpoints may carry a classifier head
(``classifier.0/3.weight``) which converts into the
``evr_tpu.models.classifier`` pytree.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from .clip import CLIPConfig, TextConfig, VisionConfig

Array = np.ndarray


def _np(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _ln(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _linear_t(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch Linear (y = x W^T + b) → ours (y = x K + b): K = W^T."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


# -- OpenAI pip-clip layout ----------------------------------------------


def _openai_block(sd, prefix: str) -> dict:
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "attn": {
            "qkv": {
                "kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            },
            "out": _linear_t(sd, f"{prefix}.attn.out_proj"),
        },
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": {
            "fc": _linear_t(sd, f"{prefix}.mlp.c_fc"),
            "proj": _linear_t(sd, f"{prefix}.mlp.c_proj"),
        },
    }


def config_from_openai_state_dict(sd: Mapping[str, Any]) -> CLIPConfig:
    """Infer the CLIPConfig from an OpenAI-layout state dict's shapes."""
    v_width = _np(sd["visual.conv1.weight"]).shape[0]
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    v_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    grid = int(round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5))
    embed_dim = _np(sd["text_projection"]).shape[1]
    t_width = _np(sd["ln_final.weight"]).shape[0]
    t_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    vocab, ctx = (
        _np(sd["token_embedding.weight"]).shape[0],
        _np(sd["positional_embedding"]).shape[0],
    )
    return CLIPConfig(
        embed_dim=embed_dim,
        vision=VisionConfig(
            image_size=grid * patch,
            patch_size=patch,
            width=v_width,
            layers=v_layers,
            heads=v_width // 64,
        ),
        text=TextConfig(
            context_length=ctx,
            vocab_size=vocab,
            width=t_width,
            layers=t_layers,
            heads=t_width // 64,
        ),
    )


def from_openai_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig | None = None) -> dict:
    cfg = cfg or config_from_openai_state_dict(sd)
    visual = {
        # OIHW conv weight → HWIO
        "patch_embed": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "pos_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": [
            _openai_block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision.layers)
        ],
        "ln_post": _ln(sd, "visual.ln_post"),
        # visual.proj is applied as x @ proj in the source model: no transpose
        "proj": _np(sd["visual.proj"]),
    }
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "pos_embedding": _np(sd["positional_embedding"]),
        "blocks": [
            _openai_block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.text.layers)
        ],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }


# -- HuggingFace CLIPModel layout ----------------------------------------


def _hf_block(sd, prefix: str) -> dict:
    q = _np(sd[f"{prefix}.self_attn.q_proj.weight"])
    k = _np(sd[f"{prefix}.self_attn.k_proj.weight"])
    v = _np(sd[f"{prefix}.self_attn.v_proj.weight"])
    qb = _np(sd[f"{prefix}.self_attn.q_proj.bias"])
    kb = _np(sd[f"{prefix}.self_attn.k_proj.bias"])
    vb = _np(sd[f"{prefix}.self_attn.v_proj.bias"])
    return {
        "ln_1": _ln(sd, f"{prefix}.layer_norm1"),
        "attn": {
            "qkv": {
                "kernel": np.concatenate([q.T, k.T, v.T], axis=1),
                "bias": np.concatenate([qb, kb, vb]),
            },
            "out": _linear_t(sd, f"{prefix}.self_attn.out_proj"),
        },
        "ln_2": _ln(sd, f"{prefix}.layer_norm2"),
        "mlp": {
            "fc": _linear_t(sd, f"{prefix}.mlp.fc1"),
            "proj": _linear_t(sd, f"{prefix}.mlp.fc2"),
        },
    }


def from_hf_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> dict:
    # HF's vision pre-LN key is historically spelled "pre_layrnorm".
    pre_ln_key = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    visual = {
        "patch_embed": {
            "kernel": _np(
                sd["vision_model.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]).reshape(
            -1
        ),
        "pos_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": _ln(sd, pre_ln_key),
        "blocks": [
            _hf_block(sd, f"vision_model.encoder.layers.{i}")
            for i in range(cfg.vision.layers)
        ],
        "ln_post": _ln(sd, "vision_model.post_layernorm"),
        "proj": _np(sd["visual_projection.weight"]).T,
    }
    text = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "pos_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "blocks": [
            _hf_block(sd, f"text_model.encoder.layers.{i}")
            for i in range(cfg.text.layers)
        ],
        "ln_final": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }


def load_checkpoint(path: str, map_location: str = "cpu") -> dict:
    """Load a reference fine-tune checkpoint (.pt) into pytrees.

    Handles the checkpoint-dict format `clip_finetune_correct.py:216-224`
    writes ({'model_state_dict': ..., 'epoch': ...}) as well as bare state
    dicts, and splits off `classifier.*` keys into a classifier pytree.
    """
    import torch

    blob = torch.load(path, map_location=map_location, weights_only=False)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape") or isinstance(v, np.ndarray)}

    clip_sd = {
        k.removeprefix("clip_model."): v
        for k, v in sd.items()
        if not k.startswith("classifier.")
    }
    clip_params = from_openai_state_dict(clip_sd)

    classifier = None
    if any(k.startswith("classifier.") for k in sd):
        classifier = {
            "fc1": {
                "kernel": _np(sd["classifier.0.weight"]).T,
                "bias": _np(sd["classifier.0.bias"]),
            },
            "fc2": {
                "kernel": _np(sd["classifier.3.weight"]).T,
                "bias": _np(sd["classifier.3.bias"]),
            },
        }
    meta = {k: v for k, v in (blob.items() if isinstance(blob, dict) else []) if k in ("epoch", "loss", "metrics")}
    return {"clip": clip_params, "classifier": classifier, "meta": meta}
