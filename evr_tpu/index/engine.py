"""EmbeddingEngine — model registry + batched device encoding.

Reference counterpart: ``EmbeddingService`` (`Backend/services/
embedding_service.py`): loads CLIP ViT-B/32 plus an optional fine-tuned
``CLIPWithClassifier`` checkpoint, switches the active model at runtime
(`:122-145`), caches text features (`:151-184`), and embeds frame folders in
batches of 32 (`:425-536`).

TPU-native differences:

- encode functions are jitted once per (model-config, batch-shape); batches
  are padded to a fixed size so there is exactly one compiled program;
- images are staged host-side to uint8 224² (resize-shortest + center-crop),
  then normalised on device, one transfer per batch (not per image);
- embeddings return with scores/classifier logits available from the same
  forward — no re-encoding candidates from disk (`:394-423` is deleted).
"""

from __future__ import annotations

import pathlib
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models import (
    ClassifierConfig,
    classifier_forward,
    get_model_config,
    init_clip_params,
)
from evr_tpu.models.clip import CLIPConfig, encode_image, encode_text
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, load_image_host
from evr_tpu.tokenizer import get_default_tokenizer

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def stage_array_fast(rgb: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8 RGB array → shortest-side resize + center crop, uint8 [S,S,3].

    INTER_AREA downscale approximates the reference's antialiased bicubic
    closely enough for retrieval (the exact-PIL path is
    ``evr_tpu.ops.preprocess.load_image_host``).
    """
    import cv2

    h, w = rgb.shape[:2]
    scale = image_size / min(h, w)
    interp = cv2.INTER_AREA if scale < 1.0 else cv2.INTER_CUBIC
    img = cv2.resize(
        rgb, (int(round(w * scale)), int(round(h * scale))), interpolation=interp
    )
    h, w = img.shape[:2]
    top, left = (h - image_size) // 2, (w - image_size) // 2
    return np.ascontiguousarray(img[top : top + image_size, left : left + image_size])


def stage_image_fast(path, image_size: int = 224) -> np.ndarray:
    """cv2 decode + shortest-side resize + center crop → uint8 [S, S, 3] RGB."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot decode image: {path}")
    return stage_array_fast(np.ascontiguousarray(img[:, :, ::-1]), image_size)


def load_orbax_checkpoint(path, prefer_ema: bool = False):
    """Load a Trainer orbax checkpoint (or a ``lora_merged`` export) for
    serving.

    ``prefer_ema=True`` serves the Polyak-averaged weights
    (``payload["ema"]``, written when training ran with
    ``TrainConfig.ema_decay > 0``) instead of the raw final params; it
    falls back to the raw params when the checkpoint carries no EMA tree.

    Returns ``{"clip": params, "classifier": params_or_None,
    "moe": MoEConfig_or_None}``. MoE checkpoints are self-describing
    (``Trainer.save_checkpoint`` embeds the MoEConfig), so either kind
    serves:

    >>> blob = load_orbax_checkpoint("checkpoints/best")
    >>> engine = EmbeddingEngine("ViT-B/32", params=blob["clip"], moe=blob["moe"])

    CLI surfaces reach this through ``EmbeddingEngine.load_finetuned``,
    which accepts a ``.pt`` file OR an orbax checkpoint directory.
    """
    import pathlib

    import orbax.checkpoint as ocp

    # orbax requires absolute paths; CLI users pass relative ones
    payload = ocp.StandardCheckpointer().restore(str(pathlib.Path(path).resolve()))
    params = payload["params"]
    if prefer_ema and payload.get("ema") is not None:
        params = payload["ema"]
    if isinstance(params, dict) and "clip" in params:
        clip_params = params["clip"]
        classifier = params.get("classifier")
    else:
        clip_params, classifier = params, None
    moe_cfg = None
    if payload.get("moe"):
        from evr_tpu.models.moe import MoEConfig

        raw = payload["moe"]  # orbax may hand back numpy scalars
        moe_cfg = MoEConfig(
            n_experts=int(raw["n_experts"]),
            router_k=int(raw["router_k"]),
            capacity_factor=float(raw["capacity_factor"]),
            moe_every=int(raw["moe_every"]),
            aux_weight=float(raw["aux_weight"]),
        )
    return {"clip": clip_params, "classifier": classifier, "moe": moe_cfg}


class EmbeddingEngine:
    """Batched CLIP encoder with runtime model switching."""

    def __init__(
        self,
        model_name: str = "ViT-B/32",
        params=None,
        cfg: CLIPConfig | None = None,
        compute_dtype=None,
        batch_size: int = 256,
        tokenizer=None,
        rng_seed: int = 0,
        preprocess_mode: str = "fast",
        mesh=None,
        mesh_axis: str = "data",
        params_dtype: str = "float32",
        moe=None,
    ):
        """``mesh``: shard every encode batch over the mesh's data axis with
        replicated params — ingestion/eval throughput scales with chips (the
        batch size should divide the axis size).

        ``moe``: a ``models.moe.MoEConfig`` switches every encode to the
        sparse MoE towers (params must be MoE-shaped — e.g. a Trainer
        ``moe=`` checkpoint via :func:`load_orbax_checkpoint`); aux loss is
        inference-irrelevant and dropped."""
        self.model_name = model_name
        self.cfg = cfg or get_model_config(model_name)
        self.moe = moe
        if moe is not None and params_dtype == "int8":
            raise NotImplementedError(
                "int8 serving weights are not supported for MoE towers yet"
            )
        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
        self.compute_dtype = compute_dtype
        self.batch_size = batch_size
        self.tokenizer = tokenizer or get_default_tokenizer()
        self.preprocess_mode = preprocess_mode

        if params is None:
            if moe is not None:
                from evr_tpu.models.moe import init_moe_clip_params

                params = init_moe_clip_params(
                    jax.random.PRNGKey(rng_seed), self.cfg, moe
                )
            else:
                params = init_clip_params(jax.random.PRNGKey(rng_seed), self.cfg)
        self.params_dtype = params_dtype
        params = self._cast_params(params)
        self.models: dict[str, dict] = {"original": {"clip": params, "classifier": None}}
        self.active_model = "original"
        self._text_cache: dict[tuple[str, str], np.ndarray] = {}

        mean = np.asarray(CLIP_MEAN, np.float32)
        std = np.asarray(CLIP_STD, np.float32)
        cfg_ = self.cfg
        dtype = self.compute_dtype

        if moe is not None:
            from evr_tpu.models.moe import encode_image_moe, encode_text_moe

            def _encode_staged(params_, staged_u8):
                x = staged_u8.astype(jnp.float32) / 255.0
                x = (x - mean) / std
                return encode_image_moe(params_, cfg_, moe, x, dtype=dtype)[0]

            def _encode_pixels(params_, pixels):
                return encode_image_moe(params_, cfg_, moe, pixels, dtype=dtype)[0]

            def _encode_tokens(params_, tokens):
                return encode_text_moe(params_, cfg_, moe, tokens, dtype=dtype)[0]
        else:

            def _encode_staged(params_, staged_u8):
                # folded-stem path: uint8 patch unfold + normalisation baked
                # into the patch GEMM (models.clip.encode_staged_u8) —
                # numerically equivalent to normalise→encode_image, −8%
                # encode wall time at the headline shape (the XLA conv stem
                # ran at 12% MFU)
                from evr_tpu.models.clip import encode_staged_u8

                return encode_staged_u8(
                    params_, cfg_, staged_u8, dtype=dtype, mean=mean, std=std
                )

            def _encode_pixels(params_, pixels):
                return encode_image(params_, cfg_, pixels, dtype=dtype)

            def _encode_tokens(params_, tokens):
                # eot_fast_final: serving is inference-only, so the last text
                # block runs EOT-row-only (models.layers.final_block_eot) —
                # numerically the full block's pooled row.
                return encode_text(
                    params_, cfg_, tokens, dtype=dtype, eot_fast_final=True
                )

        if mesh is not None:
            # shard_map, not GSPMD shardings: encode is purely data-parallel,
            # and inside shard_map each device traces its LOCAL batch shard —
            # which is what lets the Pallas fused-block kernels (custom
            # calls GSPMD cannot partition) run per-chip on a real mesh.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            n_shards = mesh.shape[mesh_axis]
            if batch_size % n_shards != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over the "
                    f"{n_shards}-way '{mesh_axis}' mesh axis"
                )

            def sharded(fn):
                return jax.jit(
                    shard_map(
                        fn,
                        mesh=mesh,
                        in_specs=(P(), P(mesh_axis)),
                        out_specs=P(mesh_axis),
                        check_rep=False,
                    )
                )

            self._encode_staged = sharded(_encode_staged)
            self._encode_pixels = sharded(_encode_pixels)
            self._encode_tokens = sharded(_encode_tokens)
        else:
            self._encode_staged = jax.jit(_encode_staged)
            self._encode_pixels = jax.jit(_encode_pixels)
            self._encode_tokens = jax.jit(_encode_tokens)

    def _cast_params(self, params):
        """Apply the engine's serving weight format to a CLIP params pytree:
        ``float32`` (as-is), ``bfloat16`` (halve HBM; LN/softmax still fp32),
        or ``int8`` (quantize transformer-block linears for the MXU's int8
        path — see evr_tpu.models.quant; inference-only)."""
        if self.params_dtype == "bfloat16":
            return jax.tree.map(
                lambda a: (
                    jnp.asarray(a, jnp.bfloat16)
                    if hasattr(a, "dtype") and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else a
                ),
                params,
            )
        if self.params_dtype == "int8":
            from evr_tpu.models.quant import quantize_clip_params

            return quantize_clip_params(params)
        return params

    @classmethod
    def from_checkpoint(
        cls, checkpoint_path, model_name: str = "ViT-B/32",
        name: str = "finetuned", prefer_ema: bool = False, **engine_kwargs,
    ) -> "EmbeddingEngine":
        """Build an engine serving ``checkpoint_path``, whatever its kind:
        a reference-format ``.pt`` file, a Trainer orbax directory, or a
        self-describing MoE orbax checkpoint (the engine is constructed
        with the embedded MoEConfig so the sparse encode programs exist).
        The loaded model is registered as ``name`` and made active."""
        import pathlib

        blob = None
        if pathlib.Path(checkpoint_path).is_dir():
            blob = load_orbax_checkpoint(checkpoint_path, prefer_ema=prefer_ema)
        if blob is not None and blob["moe"] is not None:
            engine = cls(
                model_name, params=blob["clip"], moe=blob["moe"], **engine_kwargs
            )
            engine.register_model(name, blob["clip"], blob["classifier"])
        else:
            engine = cls(model_name, **engine_kwargs)
            engine.load_finetuned(checkpoint_path, name, prefer_ema=prefer_ema)
        engine.set_active_model(name)
        return engine

    # -- model registry (set_active_model parity) -------------------------
    def register_model(self, name: str, clip_params, classifier=None,
                       classifier_cfg: ClassifierConfig | None = None) -> None:
        self.models[name] = {
            "clip": self._cast_params(clip_params),
            "classifier": classifier,
            "classifier_cfg": classifier_cfg or ClassifierConfig(embed_dim=self.cfg.embed_dim),
        }

    def load_finetuned(
        self, checkpoint_path, name: str = "finetuned", prefer_ema: bool = False
    ) -> None:
        """Load a fine-tune checkpoint: a reference-format ``.pt`` file
        (`embedding_service.py:103-120` equivalent) or a Trainer orbax
        checkpoint directory (incl. ``lora_merged`` exports). MoE orbax
        checkpoints need the engine constructed with the matching
        ``moe=`` config (the encode programs are built at init).
        ``prefer_ema=True`` serves ``payload["ema"]`` when present (orbax
        checkpoints only; .pt files carry no EMA tree)."""
        import pathlib

        if pathlib.Path(checkpoint_path).is_dir():
            blob = load_orbax_checkpoint(checkpoint_path, prefer_ema=prefer_ema)
            if blob["moe"] is not None and self.moe is None:
                raise ValueError(
                    "MoE checkpoint: construct the engine with its config — "
                    "blob = load_orbax_checkpoint(path); "
                    "EmbeddingEngine(cfg=..., params=blob['clip'], moe=blob['moe'])"
                )
            if blob["moe"] is not None and blob["moe"] != self.moe:
                raise ValueError(
                    f"checkpoint MoEConfig {blob['moe']} != engine's {self.moe}"
                )
        else:
            from evr_tpu.models.torch_import import load_checkpoint

            blob = load_checkpoint(str(checkpoint_path))
        self.register_model(name, blob["clip"], blob["classifier"])

    def set_active_model(self, name: str) -> bool:
        if name not in self.models:
            return False
        self.active_model = name
        return True

    def available_models(self) -> list[str]:
        return list(self.models)

    def set_params_dtype(self, params_dtype: str) -> None:
        """Re-cast every registered model's weights in place (fp32/bf16 →
        int8 promotion after the boot rank-agreement gate passes —
        ``models.quant_gate.auto_params_dtype``). int8→float re-expansion
        is not possible (quantization discards precision) and raises."""
        if self.params_dtype == "int8" and params_dtype != "int8":
            raise ValueError(
                "cannot widen int8 weights back to "
                f"{params_dtype}; rebuild the engine from the checkpoint"
            )
        self.params_dtype = params_dtype
        for slot in self.models.values():
            slot["clip"] = self._cast_params(slot["clip"])
        self._text_cache.clear()

    @property
    def params(self):
        return self.models[self.active_model]["clip"]

    # -- text ------------------------------------------------------------
    def encode_texts(self, texts, normalise: bool = True) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        tokens = self.tokenizer(texts, context_length=self.cfg.text.context_length)
        out = np.asarray(self._encode_tokens(self.params, jnp.asarray(tokens)))
        if normalise:
            out = out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out

    def get_text_features(self, query: str) -> np.ndarray:
        """Cached single-query text features (`embedding_service.py:151-184`)."""
        key = (self.active_model, query)
        if key not in self._text_cache:
            self._text_cache[key] = self.encode_texts([query])[0]
        return self._text_cache[key]

    def clear_text_cache(self) -> None:
        self._text_cache.clear()

    # -- images ----------------------------------------------------------
    def _pad_batch(self, arr: np.ndarray) -> tuple[np.ndarray, int]:
        n = len(arr)
        if n == self.batch_size:
            return arr, n
        pad = np.zeros((self.batch_size - n,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([arr, pad], axis=0), n

    def encode_staged_images(self, staged_u8: np.ndarray, normalise: bool = False) -> np.ndarray:
        """uint8 [N, S, S, 3] (already resized/cropped) → [N, D] embeddings."""
        outs = []
        for i in range(0, len(staged_u8), self.batch_size):
            batch, n = self._pad_batch(staged_u8[i : i + self.batch_size])
            emb = np.asarray(self._encode_staged(self.params, jnp.asarray(batch)))[:n]
            outs.append(emb)
        out = np.concatenate(outs, axis=0) if outs else np.zeros((0, self.cfg.embed_dim), np.float32)
        if normalise:
            out = out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out

    def _ensure_native_stager(self):
        """The C++ thread-pool stager, or None when unavailable."""
        try:
            from evr_tpu.native import NativeStager, native_available

            if not native_available():
                return None
            if getattr(self, "_native_stager", None) is None:
                self._native_stager = NativeStager(self.cfg.vision.image_size)
            return self._native_stager
        except Exception:
            return None

    def _stage_native(self, paths) -> tuple[np.ndarray, list[int]] | None:
        """Stage a JPEG batch through the C++ thread-pool pipeline
        (evr_tpu.native); None when the native library is unavailable."""
        stager = self._ensure_native_stager()
        if stager is None:
            return None
        try:
            return stager.stage_batch(paths)
        except Exception:
            return None

    def _encode_array(self, arr: np.ndarray) -> np.ndarray:
        """Encode a stacked batch that is either staged uint8 or
        preprocessed float pixels."""
        if arr.dtype == np.uint8:
            return self.encode_staged_images(arr)
        outs = []
        for i in range(0, len(arr), self.batch_size):
            batch, n = self._pad_batch(arr[i : i + self.batch_size])
            outs.append(
                np.asarray(self._encode_pixels(self.params, jnp.asarray(batch)))[:n]
            )
        return np.concatenate(outs, axis=0)

    def encode_image_files(self, paths, normalise: bool = False) -> np.ndarray:
        size = self.cfg.vision.image_size
        if self.preprocess_mode == "pil":
            pixels = np.stack([load_image_host(p, size) for p in paths])
            outs = []
            for i in range(0, len(pixels), self.batch_size):
                batch, n = self._pad_batch(pixels[i : i + self.batch_size])
                outs.append(
                    np.asarray(self._encode_pixels(self.params, jnp.asarray(batch)))[:n]
                )
            out = np.concatenate(outs, axis=0)
        else:
            staged = np.stack([stage_image_fast(p, size) for p in paths])
            out = self.encode_staged_images(staged)
        if normalise:
            out = out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out

    def embed_folder(
        self,
        folder,
        normalise: bool = True,
        progress: Callable[[int, int], None] | None = None,
    ) -> tuple[np.ndarray, list[str]]:
        """Embed every image in a folder, sorted by filename — the contract
        that aligns index rows with metadata frame order
        (`embedding_service.py:452-505`). Returns (embeddings, frame_names).
        """
        folder = pathlib.Path(folder)
        candidates = sorted(
            p.name for p in folder.iterdir() if p.suffix.lower() in IMAGE_EXTENSIONS
        )
        size = self.cfg.vision.image_size

        if self.preprocess_mode == "fast" and all(
            n.lower().endswith((".jpg", ".jpeg")) for n in candidates
        ):
            if self._ensure_native_stager() is not None:
                return self._embed_folder_pipelined(
                    folder, candidates, normalise, progress
                )

        names: list[str] = []
        embs = []
        staged_buf: list[np.ndarray] = []
        for pos, name in enumerate(candidates):
            try:
                if self.preprocess_mode == "pil":
                    staged_buf.append(load_image_host(folder / name, size))
                else:
                    staged_buf.append(stage_image_fast(folder / name, size))
            except (IOError, OSError):
                # Unreadable frame: skip it entirely (the row is simply absent
                # and frame_names stays aligned) rather than aborting the
                # whole folder or inserting a zero row.
                continue
            names.append(name)
            if len(staged_buf) == self.batch_size:
                embs.append(self._encode_array(np.stack(staged_buf)))
                staged_buf.clear()
            if progress:
                progress(pos + 1, len(candidates))
        if staged_buf:
            embs.append(self._encode_array(np.stack(staged_buf)))
        emb = (
            np.concatenate(embs, axis=0)
            if embs
            else np.zeros((0, self.cfg.embed_dim), np.float32)
        )
        if normalise:
            emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb.astype(np.float32), names

    def _embed_folder_pipelined(
        self,
        folder: pathlib.Path,
        candidates: list[str],
        normalise: bool,
        progress,
        chunk_frames: int | None = None,
    ) -> tuple[np.ndarray, list[str]]:
        """Chunked double-buffered ingest: the C++ stager decodes chunk k+1
        on its thread pool while the device encodes chunk k (the stager and
        the device dispatch both release the GIL, so decode and encode
        genuinely overlap). Host memory stays bounded at ~2 chunks — the
        previous one-shot path staged the WHOLE folder first, which at the
        100k-frame north-star index is ~14 GB of uint8 (SURVEY.md §7 "input
        pipeline throughput" hard part). Failed decodes are skipped by index,
        same contract as the sequential path."""
        from concurrent.futures import ThreadPoolExecutor

        stager = self._ensure_native_stager()
        chunk = chunk_frames or max(self.batch_size * 4, 256)
        names: list[str] = []
        embs: list[np.ndarray] = []
        total = len(candidates)
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(
                stager.stage_batch, [folder / n for n in candidates[:chunk]]
            )
            for start in range(0, total, chunk):
                batch, ok = fut.result()
                nxt = candidates[start + chunk : start + 2 * chunk]
                if nxt:
                    fut = ex.submit(
                        stager.stage_batch, [folder / n for n in nxt]
                    )
                if ok:
                    embs.append(self.encode_staged_images(batch[ok]))
                    names.extend(candidates[start + i] for i in ok)
                if progress:
                    progress(min(start + chunk, total), total)
        emb = (
            np.concatenate(embs, axis=0)
            if embs
            else np.zeros((0, self.cfg.embed_dim), np.float32)
        )
        if normalise and len(emb):
            emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb.astype(np.float32), names

    # -- classifier (violence/NSFW head) ----------------------------------
    def classify(self, features: np.ndarray) -> np.ndarray | None:
        """3-class probabilities from the active model's classifier head,
        or None if the active model has no head."""
        entry = self.models[self.active_model]
        if entry.get("classifier") is None:
            return None
        logits = classifier_forward(
            entry["classifier"],
            entry.get("classifier_cfg") or ClassifierConfig(embed_dim=self.cfg.embed_dim),
            jnp.asarray(np.atleast_2d(features)),
        )
        return np.asarray(jax.nn.softmax(logits, axis=-1))
