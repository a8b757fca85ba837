"""AOT-exported serving encoders (``jax.export`` / StableHLO bundles).

Reference parity: none — the reference boots by loading torch weights into an
eager pip-``clip`` model at service start (`Backend/services/embedding_service.py:69-120`)
and pays Python+framework dispatch on every request. The TPU-native
production answer is ahead-of-time export: trace + lower the serving encode
functions ONCE at deploy-bundle build time, ship the serialized StableHLO,
and have the serving host deserialize and run it — no model code, no tracer,
and no retrace on the boot path. This also freezes the numerics of a
deployed model version: the artifact IS the computation.

Design:

- ``export_encoders(cfg, ...)`` — exports the two serving entry points
  (staged-uint8 → unit-norm image embeddings; token ids → unit-norm text
  embeddings) with a **symbolic batch dimension** (one artifact serves any
  batch size) and **multi-platform lowering** (cpu + tpu by default: the
  same bundle runs on a dev host and on the serving chip).
- Params travel as call-time ARGUMENTS (never baked constants): the bundle
  is weights-independent, so one export serves every fine-tuned checkpoint
  of the same geometry, and compile inputs stay small.
- The exported module forces ``attn_impl="xla"``: Pallas custom calls are
  neither shape-polymorphic nor portable across platforms. AOT bundles
  trade the last ~1.6× fused-kernel speedup for a frozen, portable
  artifact; latency-critical same-process serving keeps the jitted Pallas
  path (`index/engine.py`). Measured context in PERF.md.

Bundle layout (``save_bundle``/``load_bundle``)::

    <dir>/manifest.json          geometry, dtype, platforms, format version
    <dir>/image_encode.shlo      serialized jax.export.Exported
    <dir>/text_encode.shlo

`tools/deploy_model.py` packs these into deploy bundles (I6 equivalent).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from evr_tpu.models.clip import CLIPConfig, encode_image, encode_text, init_clip_params
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

FORMAT_VERSION = 1

_IMAGE_FILE = "image_encode.shlo"
_TEXT_FILE = "text_encode.shlo"


def _xla_cfg(cfg: CLIPConfig) -> CLIPConfig:
    return dataclasses.replace(cfg, attn_impl="xla")


def _param_avals(cfg: CLIPConfig):
    return jax.eval_shape(lambda: init_clip_params(jax.random.PRNGKey(0), cfg))


def export_encoders(
    cfg: CLIPConfig,
    dtype=jnp.float32,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
) -> dict[str, jax_export.Exported]:
    """Export the two serving encoders with a symbolic batch dimension.

    Returns ``{"image": Exported, "text": Exported}``; each takes
    ``(params, batch)`` — image batch is staged uint8 ``[b, S, S, 3]``
    (resize/crop already applied, the host-side staging contract of
    `index/engine.py`), text batch is int32 ``[b, context_length]`` token
    ids. Outputs are L2-normalized embeddings ``[b, embed_dim]`` (the form
    every retrieval path consumes).
    """
    cfg = _xla_cfg(cfg)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    def image_fn(params, staged_u8):
        x = staged_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        emb = encode_image(params, cfg, x, dtype=dtype)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )

    def text_fn(params, tokens):
        emb = encode_text(params, cfg, tokens, dtype=dtype)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )

    params_avals = _param_avals(cfg)
    s = cfg.vision.image_size
    (b,) = jax_export.symbolic_shape("b")
    image_aval = jax.ShapeDtypeStruct((b, s, s, 3), np.uint8)
    (bt,) = jax_export.symbolic_shape("b")  # separate scope per export
    tokens_aval = jax.ShapeDtypeStruct((bt, cfg.text.context_length), np.int32)

    exported = {}
    exported["image"] = jax_export.export(jax.jit(image_fn), platforms=platforms)(
        params_avals, image_aval
    )
    exported["text"] = jax_export.export(jax.jit(text_fn), platforms=platforms)(
        params_avals, tokens_aval
    )
    return exported


def save_bundle(
    out_dir, cfg: CLIPConfig, exported: dict[str, jax_export.Exported]
) -> pathlib.Path:
    """Write the serialized encoders + manifest; returns the bundle dir."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / _IMAGE_FILE).write_bytes(exported["image"].serialize())
    (out / _TEXT_FILE).write_bytes(exported["text"].serialize())
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": "evr_tpu_aot_encoders",
        "platforms": list(exported["image"].platforms),
        "config": dataclasses.asdict(_xla_cfg(cfg)),
        "files": {"image": _IMAGE_FILE, "text": _TEXT_FILE},
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out


class AotEncoders:
    """Deserialized AOT bundle: ``encode_staged(params, u8)`` /
    ``encode_tokens(params, ids)`` with no model code on the call path."""

    def __init__(self, manifest: dict, image: jax_export.Exported, text: jax_export.Exported):
        self.manifest = manifest
        self._image = image
        self._text = text

    @property
    def platforms(self) -> tuple[str, ...]:
        return tuple(self._image.platforms)

    def encode_staged(self, params: Any, staged_u8) -> np.ndarray:
        return np.asarray(self._image.call(params, jnp.asarray(staged_u8)))

    def encode_tokens(self, params: Any, tokens) -> np.ndarray:
        return np.asarray(self._text.call(params, jnp.asarray(tokens)))


def config_from_manifest(manifest: dict) -> CLIPConfig:
    """Rebuild the CLIPConfig recorded in a bundle manifest."""
    from evr_tpu.models.clip import TextConfig, VisionConfig

    c = dict(manifest["config"])
    return CLIPConfig(
        **{
            **c,
            "vision": VisionConfig(**c["vision"]),
            "text": TextConfig(**c["text"]),
        }
    )


class AotEngine:
    """Serving-host engine backed by an AOT bundle — NO model code, no
    tracer, no retrace on the boot path; just ``Exported.call``.

    Implements the encode surface the retrieval stack consumes
    (``get_text_features`` / ``encode_texts`` / ``encode_staged_images`` /
    ``embed_folder``), so a ``FrameIndex`` + query flow runs on a host that
    ships only the bundle + weights. All outputs are unit-norm (the form
    retrieval consumes; the exported graphs normalize internally). The
    fused one-dispatch ``TextSearcher`` path needs live tracing and stays
    with ``index.engine.EmbeddingEngine``.
    """

    def __init__(self, bundle_dir, params, tokenizer=None, batch_size: int = 256):
        self._enc = load_bundle(bundle_dir)
        self.cfg = config_from_manifest(self._enc.manifest)
        self.params = params
        self.batch_size = batch_size
        if tokenizer is None:
            from evr_tpu.tokenizer import get_default_tokenizer

            tokenizer = get_default_tokenizer()
        self.tokenizer = tokenizer
        self._text_cache: dict[str, np.ndarray] = {}

    def encode_texts(self, texts, normalise: bool = True) -> np.ndarray:
        tokens = self.tokenizer(list(texts), context_length=self.cfg.text.context_length)
        return self._enc.encode_tokens(self.params, tokens)

    def get_text_features(self, query: str) -> np.ndarray:
        hit = self._text_cache.get(query)
        if hit is None:
            hit = self._text_cache[query] = self.encode_texts([query])[0]
        return hit

    def clear_text_cache(self) -> None:
        self._text_cache.clear()

    def encode_staged_images(self, staged_u8: np.ndarray, normalise: bool = True) -> np.ndarray:
        outs = [
            self._enc.encode_staged(self.params, staged_u8[i : i + self.batch_size])
            for i in range(0, len(staged_u8), self.batch_size)
        ]
        return (
            np.concatenate(outs, axis=0)
            if outs
            else np.zeros((0, self.cfg.embed_dim), np.float32)
        )

    def embed_folder(self, folder, normalise: bool = True, progress=None):
        """Same sorted-by-filename contract as ``EmbeddingEngine.embed_folder``
        (`Backend/services/embedding_service.py:452-505` parity)."""
        import pathlib as _pl

        from evr_tpu.index.engine import IMAGE_EXTENSIONS, stage_image_fast

        folder = _pl.Path(folder)
        candidates = sorted(
            p.name for p in folder.iterdir() if p.suffix.lower() in IMAGE_EXTENSIONS
        )
        staged, names = [], []
        for name in candidates:
            try:
                staged.append(stage_image_fast(folder / name, self.cfg.vision.image_size))
            except (IOError, OSError):
                continue
            names.append(name)
        emb = (
            self.encode_staged_images(np.stack(staged))
            if staged
            else np.zeros((0, self.cfg.embed_dim), np.float32)
        )
        if progress:
            progress(len(candidates), len(candidates))
        return emb.astype(np.float32), names


def load_bundle(bundle_dir) -> AotEncoders:
    d = pathlib.Path(bundle_dir)
    manifest = json.loads((d / "manifest.json").read_text())
    if manifest.get("kind") != "evr_tpu_aot_encoders":
        raise ValueError(f"{d} is not an evr_tpu AOT encoder bundle")
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"bundle format {manifest['format_version']} is newer than this "
            f"runtime supports ({FORMAT_VERSION})"
        )
    image = jax_export.deserialize((d / manifest["files"]["image"]).read_bytes())
    text = jax_export.deserialize((d / manifest["files"]["text"]).read_bytes())
    return AotEncoders(manifest, image, text)
