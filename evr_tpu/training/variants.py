"""Exploratory trainer variants (T2–T6 in SURVEY.md §2.3), TPU-native.

One framework covers the reference's zoo of fine-tuning scripts:

- ``multimodal_loss`` — the α/β/γ-weighted CE + InfoNCE loss shared by the
  fusion trainers (`training_CLIP.py:129-165`), with the V2 extensions
  (label smoothing, entropy regularizer, manual L2 —
  `train_CLIP_v3.py:235-298`) switched on by config;
- ``ProjectionTrainer`` — frozen-CLIP + learned projection pair + learnable
  logit_scale, InfoNCE with retrieval validation
  (`training_CLIP_multimodal.py` / `training_CLIP_contrastive.py`);
- ``ProgressiveTrainer`` — the 3-phase unfreezing schedule
  (`train_CLIP_v3.py:133-179`): phase 1 heads-only, phase 2 last-3 blocks of
  both towers + projections + final LNs, phase 3 full unfreeze with
  discriminative LRs (early blocks lr/10, late lr/3); linear-warmup
  one-cycle schedule (warmup 10%); per-phase checkpoints and a cross-phase
  resume guard;
- ``mine_hard_negatives`` — the NSFW trainer's top-k off-diagonal mining
  (`train_clip_nsfw.py:194-211`; the reference computes but never feeds them
  to the loss — here ``hard_negative_infonce`` actually uses them, as an
  opt-in improvement).

All trainers run the same way on the mesh: batch sharded over 'data',
params replicated, global-batch contrastive semantics (see
evr_tpu.training.finetune).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

import chex
import jax
import jax.numpy as jnp
import optax

from evr_tpu.models.clip import CLIPConfig, encode_image, encode_text
from evr_tpu.models.heads import (
    FusionConfig,
    ProjectionConfig,
    fusion_forward,
    init_fusion_params,
    init_projection_params,
    project_features,
)
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
from .losses import softmax_cross_entropy
from .partition import _map_with_paths


# -- shared loss -----------------------------------------------------------


def multimodal_loss(
    outputs: dict[str, jax.Array],
    labels: jax.Array,
    alpha: float = 0.7,
    beta: float = 0.15,
    gamma: float = 0.15,
    temp: float = 0.07,
    label_smoothing: float = 0.0,
    entropy_weight: float = 0.0,
    weight_decay: float = 0.0,
    trainable_params: Any = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    fusion_loss = softmax_cross_entropy(outputs["fused_logits"], labels, label_smoothing).mean()
    image_loss = softmax_cross_entropy(outputs["image_logits"], labels, label_smoothing).mean()
    text_loss = softmax_cross_entropy(outputs["text_logits"], labels, label_smoothing).mean()

    img, txt = outputs["image_features"], outputs["text_features"]
    logits = (img @ txt.T) / temp
    targets = jnp.arange(logits.shape[0])
    contrastive = 0.5 * (
        softmax_cross_entropy(logits, targets, label_smoothing).mean()
        + softmax_cross_entropy(logits.T, targets, label_smoothing).mean()
    )

    total = alpha * fusion_loss + beta * image_loss + gamma * text_loss + contrastive
    metrics = {
        "fusion_loss": fusion_loss,
        "image_loss": image_loss,
        "text_loss": text_loss,
        "contrastive_loss": contrastive,
    }

    if entropy_weight > 0:
        probs = jax.nn.softmax(outputs["fused_logits"].astype(jnp.float32), axis=1)
        entropy = -(probs * jnp.log(probs + 1e-6)).sum(1).mean()
        total = total - entropy_weight * entropy  # maximise prediction entropy
        metrics["fusion_entropy"] = entropy

    if weight_decay > 0 and trainable_params is not None:
        l2 = sum(
            jnp.linalg.norm(leaf)
            for path, leaf in _iter_kernels(trainable_params)
        )
        total = total + weight_decay * l2
        metrics["l2"] = l2

    metrics["total_loss"] = total
    return total, metrics


def _iter_kernels(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_kernels(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_kernels(v, prefix + (str(i),))
    else:
        if prefix and prefix[-1] in ("kernel",):  # torch 'weight' equivalent
            yield prefix, tree


# -- hard negatives (T6) ---------------------------------------------------


def mine_hard_negatives(similarity: jax.Array, k: int = 4) -> jax.Array:
    """Indices [B, k] of the hardest off-diagonal texts per image."""
    B = similarity.shape[0]
    masked = similarity - 1e9 * jnp.eye(B, dtype=similarity.dtype)
    _, idx = jax.lax.top_k(masked, k)
    return idx


def hard_negative_infonce(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    k: int = 4,
    hard_weight: float = 1.0,
) -> jax.Array:
    """InfoNCE where the k hardest negatives get up-weighted — the loss the
    reference's mining was presumably meant to feed."""
    scale = jnp.exp(logit_scale)
    logits = scale * image_features @ text_features.T
    B = logits.shape[0]
    targets = jnp.arange(B)
    if hard_weight != 1.0:
        hard_idx = mine_hard_negatives(logits, k)
        weights = jnp.ones_like(logits)
        rows = jnp.arange(B)[:, None]
        weights = weights.at[rows, hard_idx].set(hard_weight)
        logits = logits + jnp.log(weights)
    return 0.5 * (
        softmax_cross_entropy(logits, targets).mean()
        + softmax_cross_entropy(logits.T, targets).mean()
    )


# -- projection trainer (T3/T4) -------------------------------------------


@dataclass
class ProjectionTrainConfig:
    proj_dim: int = 256
    freeze_clip: bool = True
    lr: float = 1e-4
    weight_decay: float = 1e-4
    epochs: int = 10
    grad_accumulation_steps: int = 1
    compute_dtype: str = "bfloat16"
    num_classes: int = 0  # >0 adds a classification head on projected image feats (T4)
    classification_weight: float = 0.2


class ProjectionTrainer:
    """Frozen (or unfrozen+remat) CLIP with trained projection pair."""

    def __init__(
        self,
        model_cfg: CLIPConfig,
        clip_params,
        cfg: ProjectionTrainConfig | None = None,
        rng: jax.Array | None = None,
        mesh=None,
    ):
        # Same policy as make_train_step: gradient steps resolve "auto"
        # per-shape ("auto_grad" — XLA below T=512, fused flash-style
        # backward above; measured, PERF.md).
        self._infer_cfg = model_cfg  # forward-only paths keep fused kernels
        if model_cfg.attn_impl == "auto":
            model_cfg = dataclasses.replace(model_cfg, attn_impl="auto_grad")
        self.model_cfg = (
            dataclasses.replace(model_cfg, remat=True)
            if not (cfg or ProjectionTrainConfig()).freeze_clip
            else model_cfg
        )
        self.cfg = cfg or ProjectionTrainConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        heads = init_projection_params(
            rng, ProjectionConfig(model_cfg.embed_dim, self.cfg.proj_dim)
        )
        if self.cfg.num_classes > 0:
            k = jax.random.fold_in(rng, 1)
            dim = self.cfg.proj_dim or model_cfg.embed_dim
            heads["classifier"] = {
                "kernel": jax.random.normal(k, (dim, self.cfg.num_classes), jnp.float32)
                * 0.02,
                "bias": jnp.zeros((self.cfg.num_classes,), jnp.float32),
            }
        self.params = {"clip": jax.tree.map(jnp.asarray, clip_params), "heads": heads}

        opt = optax.adamw(self.cfg.lr, weight_decay=self.cfg.weight_decay)
        if self.cfg.grad_accumulation_steps > 1:
            opt = optax.MultiSteps(opt, self.cfg.grad_accumulation_steps)
        self.optimizer = opt
        trainable = self._trainable(self.params)
        self.opt_state = opt.init(trainable)
        self.mesh = mesh
        self._step = self._build_step()

    def _trainable(self, params):
        if self.cfg.freeze_clip:
            return {"heads": params["heads"]}
        return params

    def _build_step(self):
        cfg, model_cfg = self.cfg, self.model_cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)

        def forward(params, batch):
            x = (batch["images"].astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(params["clip"], model_cfg, x, dtype=dtype)
            txt = encode_text(params["clip"], model_cfg, batch["tokens"], dtype=dtype)
            if cfg.freeze_clip:
                img, txt = jax.lax.stop_gradient(img), jax.lax.stop_gradient(txt)
            img_n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            return project_features(params["heads"], img_n, txt_n), params["heads"]

        def loss_fn(trainable, frozen, batch):
            params = {**frozen, **trainable}
            (img_p, txt_p), heads = forward(params, batch)
            # NaN guard parity (`training_CLIP_multimodal.py:239-267`):
            # bf16 makes the fp16 blowups structurally impossible, but keep
            # the loss fp32.
            loss = hard_negative_infonce(img_p, txt_p, heads["logit_scale"])
            metrics = {"contrastive_loss": loss}
            if cfg.num_classes > 0 and "labels" in batch:
                from evr_tpu.models.layers import linear

                cls_logits = linear(img_p, heads["classifier"])
                cls = softmax_cross_entropy(cls_logits, batch["labels"]).mean()
                metrics["classification_loss"] = cls
                loss = loss + cfg.classification_weight * cls
            metrics["total_loss"] = loss
            return loss, metrics

        def step(trainable, frozen, opt_state, batch):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, batch
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, metrics

        return jax.jit(step)

    def train_step(self, batch) -> dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        trainable = self._trainable(self.params)
        frozen = (
            {"clip": self.params["clip"]} if self.cfg.freeze_clip else {}
        )
        trainable, self.opt_state, metrics = self._step(
            trainable, frozen, self.opt_state, batch
        )
        self.params = {**self.params, **trainable}
        return {k: float(v) for k, v in metrics.items()}

    def encode_projected(self, staged_images=None, tokens=None):
        """Projected, normalised features for retrieval validation / the
        chunked embedding-export deployment path
        (`training_CLIP_multimodal.py:787-886`)."""
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)
        img = txt = None
        if staged_images is not None:
            x = (jnp.asarray(staged_images).astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(self.params["clip"], self._infer_cfg, x, dtype=dtype)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        if tokens is not None:
            txt = encode_text(self.params["clip"], self._infer_cfg, jnp.asarray(tokens), dtype=dtype)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        img_p, txt_p = project_features(self.params["heads"], img, txt)
        out = tuple(
            None if v is None else np.asarray(v) for v in (img_p, txt_p)
        )
        return out


# -- progressive trainer (T2) ----------------------------------------------


@dataclass
class ProgressiveTrainConfig:
    num_classes: int = 3
    lr: float = 1e-4
    weight_decay: float = 0.01
    label_smoothing: float = 0.1
    entropy_weight: float = 0.01
    manual_l2: float = 1e-5
    alpha: float = 0.7
    beta: float = 0.15
    gamma: float = 0.15
    temp: float = 0.07
    warmup_fraction: float = 0.1  # OneCycle warmup 10%
    steps_per_phase: int = 100
    compute_dtype: str = "float32"


def _phase_label(path: tuple, n_visual: int, n_text: int, phase: int) -> str:
    """Trainability label for one tensor under the given phase."""
    if path[0] == "heads":
        return "head"
    # path like ('clip','visual','blocks','10',...)
    if phase == 1:
        return "frozen"
    if phase == 2:
        if path[1] == "visual" and path[2:3] == ("blocks",) and int(path[3]) >= n_visual - 3:
            return "late"
        if path[1] == "text" and path[2:3] == ("blocks",) and int(path[3]) >= n_text - 3:
            return "late"
        if path[1] == "visual" and path[2] in ("ln_post", "proj"):
            return "late"
        if path[1] == "text" and path[2] in ("ln_final", "text_projection"):
            return "late"
        return "frozen"
    # phase 3: discriminative LRs — early blocks lr/10, late lr/3, rest lr
    if path[1] in ("visual", "text") and path[2:3] == ("blocks",):
        n = n_visual if path[1] == "visual" else n_text
        return "late" if int(path[3]) >= n - 3 else "early"
    return "mid"


class ProgressiveTrainer:
    """3-phase fusion-head fine-tune with per-phase optimizers."""

    PHASE_LR_SCALE = {"head": 1.0, "late": 1 / 3, "mid": 1.0, "early": 1 / 10}

    def __init__(
        self,
        model_cfg: CLIPConfig,
        clip_params,
        cfg: ProgressiveTrainConfig | None = None,
        rng: jax.Array | None = None,
    ):
        if model_cfg.attn_impl == "auto":  # training pin — see ProjectionTrainer
            model_cfg = dataclasses.replace(model_cfg, attn_impl="auto_grad")
        self.model_cfg = model_cfg
        self.cfg = cfg or ProgressiveTrainConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.params = {
            "clip": jax.tree.map(jnp.asarray, clip_params),
            "heads": init_fusion_params(
                rng, FusionConfig(model_cfg.embed_dim, num_classes=self.cfg.num_classes)
            ),
        }
        self.phase = 0
        self.history: list[dict] = []
        self._enter_phase(1)

    # -- phase machinery --------------------------------------------------
    def labels_for_phase(self, phase: int):
        nv = len(self.params["clip"]["visual"]["blocks"])
        nt = len(self.params["clip"]["text"]["blocks"])
        return _map_with_paths(
            self.params, lambda path, _leaf: _phase_label(path, nv, nt, phase)
        )

    def _enter_phase(self, phase: int):
        if phase <= self.phase:
            raise ValueError(
                f"cross-phase resume refused: already in phase {self.phase}"
            )  # train_CLIP_v3.py:517-529 semantics
        self.phase = phase
        cfg = self.cfg
        labels = self.labels_for_phase(phase)

        def schedule_for(scale):
            peak = cfg.lr * scale
            warm = max(1, int(cfg.steps_per_phase * cfg.warmup_fraction))
            return optax.warmup_cosine_decay_schedule(
                0.0, peak, warm, max(warm + 1, cfg.steps_per_phase)
            )

        transforms = {
            label: optax.adamw(schedule_for(s), weight_decay=cfg.weight_decay)
            for label, s in self.PHASE_LR_SCALE.items()
        }
        transforms["frozen"] = optax.set_to_zero()
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.multi_transform(transforms, labels)
        )
        self.opt_state = self.optimizer.init(self.params)
        self._step = self._build_step(labels)

    def _build_step(self, labels):
        cfg, model_cfg = self.cfg, self.model_cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)
        fusion_cfg = FusionConfig(model_cfg.embed_dim, num_classes=cfg.num_classes)

        def loss_fn(params, batch, rng):
            x = (batch["images"].astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(params["clip"], model_cfg, x, dtype=dtype)
            txt = encode_text(params["clip"], model_cfg, batch["tokens"], dtype=dtype)
            img_n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            outputs = fusion_forward(
                params["heads"], fusion_cfg, img_n, txt_n, deterministic=False, rng=rng
            )
            return multimodal_loss(
                outputs,
                batch["labels"],
                alpha=cfg.alpha,
                beta=cfg.beta,
                gamma=cfg.gamma,
                temp=cfg.temp,
                label_smoothing=cfg.label_smoothing,
                entropy_weight=cfg.entropy_weight,
                weight_decay=cfg.manual_l2,
                trainable_params=params["heads"],
            )

        def step(params, opt_state, batch, rng):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return jax.jit(step)

    def next_phase(self):
        self._enter_phase(self.phase + 1)

    def train_step(self, batch, rng=None) -> dict:
        rng = rng if rng is not None else jax.random.PRNGKey(len(self.history))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, batch, rng
        )
        out = {k: float(v) for k, v in metrics.items()} | {"phase": self.phase}
        self.history.append(out)
        return out


# -- CatLIP classification pretraining (arXiv 2404.15653) -------------------

_EN_STOPWORDS = frozenset(
    "a an the of in on at to for with and or is are was were be been being "
    "this that these those it its as by from his her their there here has "
    "have had not no so up down out over under".split()
)


def build_concept_vocab(
    captions, size: int = 1000, min_count: int = 2
) -> dict[str, int]:
    """Caption corpus → concept vocabulary for CatLIP-style pretraining.

    CatLIP (arXiv 2404.15653 §3.1) extracts noun synsets via POS tagging +
    WordNet; this zero-dependency equivalent uses frequency-filtered
    lowercase unigrams minus stopwords — the same supervision shape
    (presence of a concept word in the caption = positive label), buildable
    offline from any caption JSON.
    """
    import collections
    import re

    counts: collections.Counter = collections.Counter()
    for cap in captions:
        for w in re.findall(r"[a-z]+", str(cap).lower()):
            if len(w) >= 2 and w not in _EN_STOPWORDS:
                counts[w] += 1
    keep = [w for w, c in counts.most_common() if c >= min_count][:size]
    return {w: i for i, w in enumerate(sorted(keep))}


def concept_targets(captions, vocab: dict[str, int]) -> np.ndarray:
    """Multi-hot [N, len(vocab)] float32 targets (word present → 1)."""
    import re

    out = np.zeros((len(captions), len(vocab)), np.float32)
    for i, cap in enumerate(captions):
        for w in re.findall(r"[a-z]+", str(cap).lower()):
            j = vocab.get(w)
            if j is not None:
                out[i, j] = 1.0
    return out


@dataclass
class CatLIPTrainConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-4
    compute_dtype: str = "bfloat16"


class CatLIPTrainer:
    """CatLIP-style pretraining: image tower + multi-label BCE over caption
    concepts — NO text tower in the step (the paper's source of its 2.7×
    pretraining speedup; arXiv 2404.15653). The trained vision tower then
    seeds the ordinary contrastive fine-tune (`Trainer`) — `clip_params`
    returns the full CLIP tree with the updated vision tower in place.
    """

    def __init__(
        self,
        model_cfg: CLIPConfig,
        clip_params,
        vocab: dict[str, int],
        cfg: CatLIPTrainConfig | None = None,
        rng: jax.Array | None = None,
    ):
        if model_cfg.attn_impl == "auto":
            model_cfg = dataclasses.replace(model_cfg, attn_impl="auto_grad")
        self.model_cfg = model_cfg
        self.cfg = cfg or CatLIPTrainConfig()
        self.vocab = vocab
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        head = {
            "kernel": jax.random.normal(
                rng, (model_cfg.embed_dim, len(vocab)), jnp.float32
            )
            * 0.02,
            "bias": jnp.zeros((len(vocab),), jnp.float32),
        }
        # fresh copies: the jitted step donates nothing here, but the
        # Trainer-style no-alias policy keeps caller trees reusable
        self.params = {
            "clip": jax.tree.map(lambda a: jnp.copy(jnp.asarray(a)), clip_params),
            "head": head,
        }
        self.optimizer = optax.adamw(self.cfg.lr, weight_decay=self.cfg.weight_decay)
        self.opt_state = self.optimizer.init(self._trainable(self.params))
        self._step = self._build_step()

    @staticmethod
    def _trainable(params):
        # vision tower + head train; the text tower is untouched (not even
        # run) — that is the whole point of the method
        return {
            "visual": params["clip"]["visual"],
            "head": params["head"],
        }

    def _build_step(self):
        model_cfg = self.model_cfg
        dtype = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)

        def loss_fn(trainable, frozen_clip, batch):
            clip_p = {**frozen_clip, "visual": trainable["visual"]}
            x = (batch["images"].astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(clip_p, model_cfg, x, dtype=dtype)
            logits = (
                img @ trainable["head"]["kernel"] + trainable["head"]["bias"]
            ).astype(jnp.float32)
            loss = optax.sigmoid_binary_cross_entropy(
                logits, batch["targets"]
            ).mean()
            return loss, {"bce_loss": loss}

        def step(trainable, frozen_clip, opt_state, batch):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen_clip, batch
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, metrics

        return jax.jit(step)

    def train_step(self, batch) -> dict:
        """batch: {'images': uint8 [B,S,S,3], 'targets': float32 [B,C]}."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        trainable = self._trainable(self.params)
        frozen_clip = {
            k: v for k, v in self.params["clip"].items() if k != "visual"
        }
        trainable, self.opt_state, metrics = self._step(
            trainable, frozen_clip, self.opt_state, batch
        )
        self.params = {
            "clip": {**self.params["clip"], "visual": trainable["visual"]},
            "head": trainable["head"],
        }
        return {k: float(v) for k, v in metrics.items()}

    def clip_params(self):
        """Full CLIP tree with the CatLIP-pretrained vision tower — drop-in
        init for the contrastive `Trainer`."""
        return self.params["clip"]
