"""SiglipEngine — serving adapter for the SigLIP model family.

Gives `models/siglip.py` the same serving surface `EmbeddingEngine` gives
CLIP (the subset `ServingContext`/`QueryEngine` consume: ``cfg.embed_dim``,
``active_model``, ``get_text_features``, ``encode_texts``,
``encode_staged_images``), so a SigLIP tower can back the whole retrieval
stack — per-model index routing, the 7 strategies (two-step dispatch; the
fused TextSearcher is CLIP-tokenizer-specific), image/hybrid search.

Preprocessing: SigLIP normalizes to [-1, 1] ((x/255 − 0.5)/0.5 — mean=std=
0.5 per channel), NOT the CLIP mean/std; staging therefore happens here.

Tokenization: SigLIP ships a SentencePiece vocabulary which is a
DEPLOYMENT ASSET on this zero-egress image. Pass ``tokenize_fn``
(texts → [B, context] int32 ids, padded) — e.g. a
``transformers.SiglipTokenizer`` loaded from a local path — for real-id
parity. Without one, a deterministic byte-level fallback
(`tokenizer/fallbacks.SiglipFallbackTokenizer`) keeps the whole
ingest→search pipeline drivable zero-egress, same policy as the CLIP BPE
fallback: stable ids, explicitly NON-parity, and the active source is
recorded in ``tokenizer_source`` so it can never masquerade as parity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models.siglip import (
    SiglipConfig,
    encode_image as siglip_encode_image,
    encode_text as siglip_encode_text,
    init_siglip_params,
)


class SiglipEngine:
    """Batched jitted SigLIP encoders behind the EmbeddingEngine surface."""

    def __init__(
        self,
        cfg: SiglipConfig | None = None,
        params=None,
        tokenize_fn=None,
        batch_size: int = 64,
        compute_dtype: str = "float32",
        rng_seed: int = 0,
        params_dtype: str = "float32",
    ):
        self.cfg = cfg or SiglipConfig()
        self.params = (
            params
            if params is not None
            else init_siglip_params(jax.random.PRNGKey(rng_seed), self.cfg)
        )
        self.params_dtype = params_dtype
        if params_dtype == "int8":
            # same block structure as CLIP towers → same quantizer; the
            # MAP head / output projections stay fp (models/quant.py)
            from evr_tpu.models.quant import quantize_siglip_params

            self.params = quantize_siglip_params(self.params)
        elif params_dtype == "bfloat16":
            self.params = jax.tree.map(
                lambda a: (
                    jnp.asarray(a, jnp.bfloat16)
                    if hasattr(a, "dtype")
                    and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else a
                ),
                self.params,
            )
        if tokenize_fn is None:
            from evr_tpu.tokenizer.fallbacks import SiglipFallbackTokenizer

            tokenize_fn = SiglipFallbackTokenizer(
                context_length=self.cfg.text.context_length,
                vocab_size=self.cfg.text.vocab_size,
            )
            self.tokenizer_source = "fallback"
        else:
            self.tokenizer_source = "provided"
        self.tokenize_fn = tokenize_fn
        self.batch_size = batch_size
        self._dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.active_model = "original"
        self.model_name = "siglip"  # /api/models reads this directly
        self._text_cache: dict[tuple, np.ndarray] = {}

        cfg_ = self.cfg
        dtype = self._dtype

        # params as ARGUMENTS (jaxpr-constant wedge rule, CLAUDE.md)
        @jax.jit
        def _encode_staged(params_, staged_u8):
            # SigLIP preprocessing: x/255 -> [-1, 1]
            pixels = staged_u8.astype(dtype) * (2.0 / 255.0) - 1.0
            feats = siglip_encode_image(params_, cfg_, pixels, dtype)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        @jax.jit
        def _encode_tokens(params_, tokens):
            feats = siglip_encode_text(params_, cfg_, tokens, dtype)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        self._encode_staged = _encode_staged
        self._encode_tokens = _encode_tokens

    # -- serving surface ---------------------------------------------------
    def set_active_model(self, name: str) -> bool:
        return name == self.active_model

    def available_models(self) -> list[str]:
        return [self.active_model]

    def encode_staged_images(
        self, staged_u8: np.ndarray, normalise: bool = True
    ) -> np.ndarray:
        """[B, S, S, 3] uint8 (already resized to cfg.vision.image_size) →
        [B, width] unit-norm features, batched at ``batch_size``."""
        del normalise  # SigLIP features are always served unit-norm
        out = []
        for i in range(0, len(staged_u8), self.batch_size):
            chunk = np.asarray(staged_u8[i : i + self.batch_size])
            n = len(chunk)
            if n < self.batch_size:  # static shapes: pad the tail batch
                pad = np.zeros(
                    (self.batch_size - n, *chunk.shape[1:]), chunk.dtype
                )
                chunk = np.concatenate([chunk, pad], axis=0)
            out.append(np.asarray(self._encode_staged(self.params, chunk))[:n])
        return np.concatenate(out, axis=0) if out else np.zeros(
            (0, self.cfg.embed_dim), np.float32
        )

    def encode_texts(self, texts, normalise: bool = True) -> np.ndarray:
        del normalise
        tokens = np.asarray(self.tokenize_fn(list(texts)), np.int32)
        if tokens.ndim != 2 or tokens.shape[1] != self.cfg.text.context_length:
            raise ValueError(
                f"tokenize_fn must return [B, {self.cfg.text.context_length}]"
                f" ids, got {tokens.shape}"
            )
        return np.asarray(self._encode_tokens(self.params, jnp.asarray(tokens)))

    def get_text_features(self, query: str) -> np.ndarray:
        key = (self.active_model, query)
        if key not in self._text_cache:
            self._text_cache[key] = self.encode_texts([query])[0]
        return self._text_cache[key]

    def clear_text_cache(self) -> None:
        self._text_cache.clear()

    def stage_array(self, rgb: np.ndarray) -> np.ndarray:
        """uint8 RGB [H, W, 3] → [S, S, 3] uint8, SigLIP-style: a plain
        square resize (HF ``SiglipImageProcessor`` squashes to the target
        size — it does NOT shorter-side-resize + center-crop like CLIP).
        ServingContext prefers this over the CLIP stager when present."""
        import cv2

        s = self.cfg.vision.image_size
        out = cv2.resize(
            np.asarray(rgb), (s, s), interpolation=cv2.INTER_CUBIC
        )
        return np.clip(out, 0, 255).astype(np.uint8)

    def embed_folder(
        self, folder, normalise: bool = True, progress=None
    ) -> tuple:
        """Embed every image in a folder sorted by filename (the contract
        aligning index rows with metadata frame order — same as
        `EmbeddingEngine.embed_folder`); enough for the upload→ingest
        route to back a SigLIP app."""
        import pathlib

        import cv2

        del normalise
        folder = pathlib.Path(folder)
        exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
        names = sorted(
            p.name for p in folder.iterdir() if p.suffix.lower() in exts
        )
        staged, kept = [], []
        for i, name in enumerate(names):
            bgr = cv2.imread(str(folder / name))
            if bgr is None:
                continue  # unreadable frame: skip, never abort the ingest
            staged.append(self.stage_array(bgr[:, :, ::-1]))
            kept.append(name)
            if progress:
                progress(i + 1, len(names))
        if not staged:
            return np.zeros((0, self.cfg.embed_dim), np.float32), []
        return self.encode_staged_images(np.stack(staged)), kept

    @classmethod
    def from_hf(cls, model_or_path, tokenize_fn=None, **kw) -> "SiglipEngine":
        """Build from a ``transformers.SiglipModel`` instance or a local
        checkpoint directory (no network)."""
        from evr_tpu.models.siglip import (
            from_hf_siglip_state_dict,
            siglip_config_from_hf,
        )

        import os

        if isinstance(model_or_path, (str, bytes, os.PathLike)):
            from transformers import SiglipModel

            model_or_path = SiglipModel.from_pretrained(
                str(model_or_path), local_files_only=True
            )
        cfg = siglip_config_from_hf(model_or_path.config)
        params = jax.tree.map(
            jnp.asarray,
            from_hf_siglip_state_dict(model_or_path.state_dict(), cfg),
        )
        return cls(cfg=cfg, params=params, tokenize_fn=tokenize_fn, **kw)
