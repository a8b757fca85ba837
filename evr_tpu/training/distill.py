"""CLIP knowledge distillation — large teacher → small student.

MobileCLIP (arXiv 2311.17049 §3: multi-modal reinforced training) and
CLIP-KD both show the strongest transfer from distilling the teacher's
image↔text SIMILARITY structure rather than raw embeddings: the student
matches the teacher's softened per-row similarity distributions over the
batch (bidirectional KL), optionally plus a direct embedding-alignment
term. The reference has no distillation path; this makes the small
serving models (ViT-B/32 at 17k frames/s/chip) trainable from a large
teacher (ViT-L/14@336) rather than from scratch.

TPU shape: the whole step — teacher forward (stop-grad), student
forward+backward, both losses — is ONE jitted program; the teacher params
travel as arguments (never closures: constant-wedge rule, CLAUDE.md).
Teacher and student may have different widths/geometries; only their
embed_dims must match for the embedding-alignment term (the similarity-KD
term needs no dimension agreement at all).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from evr_tpu.models.clip import CLIPConfig, encode_image, encode_text
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
from evr_tpu.training.losses import combined_clip_loss

Params = dict[str, Any]


def similarity_kd_loss(
    s_img: jax.Array,
    s_txt: jax.Array,
    t_img: jax.Array,
    t_txt: jax.Array,
    temperature: float = 2.0,
) -> jax.Array:
    """Bidirectional KL between teacher and student batch-similarity rows.

    Inputs are L2-normalised [B, D] feature matrices (teacher and student
    D may differ). Softening temperature follows classic KD; the loss is
    scaled by T² so gradients keep their magnitude as T grows.
    """
    t = jnp.float32(temperature)
    s_sim = (s_img @ s_txt.T).astype(jnp.float32) / t
    t_sim = (t_img @ t_txt.T).astype(jnp.float32) / t
    t_rows = jax.nn.log_softmax(t_sim, axis=-1)
    s_rows = jax.nn.log_softmax(s_sim, axis=-1)
    t_cols = jax.nn.log_softmax(t_sim.T, axis=-1)
    s_cols = jax.nn.log_softmax(s_sim.T, axis=-1)
    kl_rows = jnp.sum(jnp.exp(t_rows) * (t_rows - s_rows), axis=-1).mean()
    kl_cols = jnp.sum(jnp.exp(t_cols) * (t_cols - s_cols), axis=-1).mean()
    return 0.5 * (kl_rows + kl_cols) * t * t


def embed_align_loss(
    s_feat: jax.Array, t_feat: jax.Array
) -> jax.Array:
    """1 − cosine between student and teacher embeddings (requires equal
    embed_dim); averaged over the batch."""
    return (1.0 - jnp.sum(s_feat * t_feat, axis=-1)).mean()


@dataclass
class DistillConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    compute_dtype: str = "bfloat16"
    # loss mix: total = contrastive_weight*InfoNCE + kd_weight*sim_KD
    #                 + align_weight*(1-cos); contrastive_weight=0 gives a
    # pure-distillation stage (standard in CLIP-KD pipelines)
    contrastive_weight: float = 1.0
    kd_weight: float = 1.0
    align_weight: float = 0.0  # needs teacher.embed_dim == student.embed_dim
    kd_temperature: float = 2.0
    grad_clip: float = 1.0


class DistillationTrainer:
    """Distill a frozen teacher CLIP into a trainable student CLIP."""

    def __init__(
        self,
        student_cfg: CLIPConfig,
        student_params: Params,
        teacher_cfg: CLIPConfig,
        teacher_params: Params,
        cfg: DistillConfig | None = None,
    ):
        self.cfg = cfg or DistillConfig()
        if (
            self.cfg.align_weight > 0.0
            and student_cfg.embed_dim != teacher_cfg.embed_dim
        ):
            raise ValueError(
                f"align_weight needs matching embed dims "
                f"(student {student_cfg.embed_dim} != teacher "
                f"{teacher_cfg.embed_dim}); use the similarity-KD term alone"
            )
        # gradient steps resolve "auto" per-shape like make_train_step
        if student_cfg.attn_impl == "auto":
            student_cfg = dataclasses.replace(student_cfg, attn_impl="auto_grad")
        self.student_cfg = student_cfg
        self.teacher_cfg = teacher_cfg
        # fresh copies (no caller aliasing; Trainer no-alias policy)
        self.params = jax.tree.map(
            lambda a: jnp.copy(jnp.asarray(a)), student_params
        )
        self.teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        opt = optax.adamw(self.cfg.lr, weight_decay=self.cfg.weight_decay)
        if self.cfg.grad_clip > 0:
            opt = optax.chain(optax.clip_by_global_norm(self.cfg.grad_clip), opt)
        self.optimizer = opt
        self.opt_state = opt.init(self.params)
        self._step = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        s_cfg, t_cfg = self.student_cfg, self.teacher_cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)

        def encode_pair(params, model_cfg, batch):
            x = (batch["images"].astype(jnp.float32) / 255.0 - mean) / std
            img = encode_image(params, model_cfg, x, dtype=dtype)
            txt = encode_text(params, model_cfg, batch["tokens"], dtype=dtype)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            return img, txt

        def loss_fn(params, teacher_params, batch):
            s_img, s_txt = encode_pair(params, s_cfg, batch)
            t_img, t_txt = encode_pair(teacher_params, t_cfg, batch)
            t_img = jax.lax.stop_gradient(t_img)
            t_txt = jax.lax.stop_gradient(t_txt)
            con, metrics = combined_clip_loss(
                s_img, s_txt, params["logit_scale"]
            )
            kd = similarity_kd_loss(
                s_img, s_txt, t_img, t_txt, cfg.kd_temperature
            )
            loss = cfg.contrastive_weight * con + cfg.kd_weight * kd
            metrics = {**metrics, "kd_loss": kd}
            if cfg.align_weight > 0.0:
                al = 0.5 * (
                    embed_align_loss(s_img, t_img)
                    + embed_align_loss(s_txt, t_txt)
                )
                loss = loss + cfg.align_weight * al
                metrics["align_loss"] = al
            metrics["total_loss"] = loss
            return loss, metrics

        def step(params, teacher_params, opt_state, batch):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, teacher_params, batch
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return jax.jit(step)

    def train_step(self, batch) -> dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, metrics = self._step(
            self.params, self.teacher_params, self.opt_state, batch
        )
        return {k: float(v) for k, v in metrics.items()}
