"""Data-parallel contrastive fine-tuning (pjit).

Parity target: the production trainer `Backend/clip_finetune_correct.py`
(T1 in SURVEY.md §2.3) — CLIP ViT-B/32 + 3-class head, freeze-prefix 8,
symmetric InfoNCE (weight 1.0) + classification CE (weight 0.2), temperature
0.07 via logit_scale, AdamW betas (0.9, 0.98) eps 1e-6 wd 0.01 with per-group
LRs (text ×0.5, classifier ×5), CosineAnnealingLR to lr/10, global-norm grad
clip 1.0, early stopping patience 5, best + final checkpoints.

TPU-native design:

- one jitted train step; the batch is sharded over the mesh 'data' axis and
  params are replicated — XLA inserts the gradient reduction and the
  feature gathers for the global-batch contrastive loss (the in-batch
  InfoNCE is computed over the GLOBAL batch, which at equal global batch
  size is bit-identical to single-device math — tests/test_training.py);
- bf16 compute with fp32 params/optimizer state; no GradScaler needed
  (the reference fights fp16 NaNs constantly, e.g. `training_CLIP_multimodal
  .py:414-479` — bf16 makes that machinery unnecessary);
- checkpoints via orbax with best/final distinction and full resume
  (`clip_finetune_correct.py:216-224,518-545` equivalents).
"""

from __future__ import annotations

import dataclasses
import math
import pathlib
import time
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

import chex
import jax
import jax.numpy as jnp
import optax

from evr_tpu.models import ClassifierConfig, classifier_forward
from evr_tpu.models.clip import CLIPConfig, encode_image, encode_text
from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
from .losses import combined_clip_loss
from .partition import param_group_labels


@dataclass
class TrainConfig:
    seed: int = 42
    batch_size: int = 32
    epochs: int = 10
    lr: float = 1e-5
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-6
    grad_clip: float = 1.0
    early_stopping: int = 5
    freeze_layers: int = 8
    contrastive_weight: float = 1.0
    classification_weight: float = 0.2
    label_smoothing: float = 0.0
    text_lr_scale: float = 0.5
    classifier_lr_scale: float = 5.0
    eta_min_ratio: float = 0.1  # CosineAnnealingLR eta_min = lr * ratio
    compute_dtype: str = "bfloat16"
    save_dir: str = "checkpoints"
    # Failure containment: wrap the optimizer in optax.apply_if_finite so a
    # non-finite gradient skips the update instead of corrupting the params
    # (the reference instead detects blown fp16 grads mid-run and permanently
    # disables AMP — `training_CLIP_multimodal.py:440-479`).
    skip_nonfinite_updates: bool = True
    max_consecutive_nonfinite: int = 5
    # accumulate gradients over N micro-batches before applying
    # (`training_CLIP_multimodal.py:404-487` grad_accumulation_steps=4)
    grad_accumulation_steps: int = 1
    # Optimizer family: "adamw" (reference parity) or "muon" — hidden 2-D
    # weight matrices take Muon's Newton-Schulz-orthogonalized momentum
    # (training/muon.py: ~15 bf16 GEMMs per matrix per step, pure MXU
    # work) while embeddings/projections/gains/biases stay on AdamW, per
    # the method. Muon's stable lr is ~an order of magnitude above
    # AdamW's, hence the separate scale (applied on top of cfg.lr and the
    # per-group scales; same cosine/warmup schedule). No weight decay on
    # Muon leaves (orthogonalized updates are scale-free).
    optimizer: str = "adamw"
    muon_lr_scale: float = 10.0
    muon_momentum: float = 0.95
    muon_ns_steps: int = 5
    # contrastive objective: 'infonce' (reference parity) or 'siglip'
    # (pairwise sigmoid, arxiv 2303.15343 — adds a learnable logit_bias to
    # params['clip'], no global softmax; Trainer inits the bias to -10)
    contrastive_loss: str = "infonce"
    # Preemption safety: autosave a resumable mid-epoch checkpoint every N
    # train batches (0 disables). TPU pods are preemptible in production;
    # pair with Trainer.install_preemption_autosave() so SIGTERM also
    # triggers one final autosave before the process dies. The reference
    # checkpoints per-epoch only (`clip_finetune_correct.py:518-545`).
    save_every_steps: int = 0
    # FLIP-style random patch masking (arxiv 2212.00794): drop this fraction
    # of image patch tokens per example during TRAINING only — the vision
    # tower runs on (1-p)·grid²+1 tokens, a near-linear step speedup at
    # small contrastive-quality cost. 0.0 disables (inference always runs
    # the full sequence).
    patch_drop: float = 0.0
    # Rematerialise each transformer block in the backward pass
    # (jax.checkpoint, `models.clip.CLIPConfig.remat`): activations are
    # recomputed instead of stored, cutting training HBM roughly by the
    # per-block activation footprint × depth at the cost of one extra
    # forward — the standard TPU memory↔FLOPs lever for deep/wide towers
    # (ViT-L/H) or large per-chip batches. Numerics are exact (tested).
    remat: bool = False
    # LoRA parameter-efficient fine-tuning (arxiv 2106.09685,
    # `training.lora`): rank > 0 freezes the whole base CLIP (logit_scale
    # stays trainable) and trains rank-r adapters on the block linears,
    # merged into the dense weights inside the jitted step. 0 disables.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple[str, ...] = ("attn.qkv", "attn.out", "mlp.fc", "mlp.proj")
    # Mixture-of-Experts fine-tuning (`models.moe`, LIMoE/Sparse-Upcycling):
    # a MoEConfig here switches the towers to the sparse forward and adds
    # moe.aux_weight × load-balance loss to the objective. Dense init
    # checkpoints are Sparse-Upcycled automatically (every expert starts as
    # the trained dense MLP — step-0-exact with renormalised top-k≥2).
    # Pass Trainer(mesh=Mesh(..., ('data','expert'))) to train
    # expert-parallel: experts AND their optimizer moments shard over the
    # 'expert' axis (`parallel.ep.ep_state_shardings`). None disables.
    moe: Any = None
    # Exponential moving average of the params (Polyak averaging): 0.0
    # disables; e.g. 0.999 keeps ema = d*ema + (1-d)*params after every
    # update, inside the same jitted step. The EMA tree shards exactly like
    # the params under fsdp/ep and is saved in checkpoints as payload["ema"]
    # — serve it via EmbeddingEngine for the usual eval-quality win on long
    # fine-tunes. Validation during fit stays on the raw params.
    ema_decay: float = 0.0
    # AdamW first-moment dtype: "bfloat16" halves the mu tree's HBM (optax
    # mu_dtype; update math still runs fp32 — the moment is merely STORED
    # bf16). nu (second moment) stays fp32: its large dynamic range is what
    # bf16 truncation actually hurts. Composes with fsdp/ep sharding.
    adam_mu_dtype: str = "float32"
    # Linear LR warmup over this many steps before the cosine schedule
    # (standard for CLIP-style contrastive training — the reference has no
    # warmup; 0 keeps exact reference-parity scheduling).
    warmup_steps: int = 0
    # GradCache chunked contrastive step (arXiv 2101.06983,
    # `training.gradcache`): split the batch into N chunks so peak encoder
    # activation memory is O(B/N) while the in-batch negative pool stays the
    # FULL batch — gradients are mathematically identical to the direct
    # step (a memory schedule, not an approximation; tested). Costs one
    # extra encoder forward. 0/1 disables. Composes with remat, fsdp, dp
    # meshes, siglip and the classifier head; unsupported with moe/lora/
    # patch_drop (rejected at construction).
    gradcache_chunks: int = 0


@chex.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    ema_params: Any = None


def _cosine_epoch_schedule(base_lr: float, cfg: TrainConfig, steps_per_epoch: int):
    """torch CosineAnnealingLR(T_max=epochs, eta_min=lr*ratio) stepped per
    epoch, expressed as a step-count schedule."""
    eta_min = base_lr * cfg.eta_min_ratio

    def schedule(step):
        epoch = jnp.minimum(step // max(1, steps_per_epoch), cfg.epochs)
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * epoch / cfg.epochs)
        )

    return schedule


def make_optimizer(
    cfg: TrainConfig, params: Any, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    labels = param_group_labels(params, cfg.freeze_layers)

    mu_dtype = jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None

    def _schedule(peak_lr: float):
        """Cosine anneal with optional linear warmup — the ONE schedule
        both optimizer families use (a warmup fix must hit both)."""
        schedule = _cosine_epoch_schedule(peak_lr, cfg, steps_per_epoch)
        if cfg.warmup_steps > 0:
            schedule = optax.join_schedules(
                [optax.linear_schedule(0.0, peak_lr, cfg.warmup_steps), schedule],
                [cfg.warmup_steps],
            )
        return schedule

    def adamw(lr_scale: float):
        schedule = _schedule(cfg.lr * lr_scale)
        return optax.adamw(
            learning_rate=schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mu_dtype=mu_dtype,
        )

    if cfg.optimizer not in ("adamw", "muon"):
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    group_scales = {
        "visual": 1.0,
        "text": cfg.text_lr_scale,
        "classifier": cfg.classifier_lr_scale,
        "other": 1.0,
    }
    if cfg.optimizer == "muon":
        from evr_tpu.training.muon import muon, muon_param_labels

        def muon_group(lr_scale: float):
            return muon(
                _schedule(cfg.lr * lr_scale * cfg.muon_lr_scale),
                momentum=cfg.muon_momentum,
                ns_steps=cfg.muon_ns_steps,
            )

        # flat combined labels: "<group>:<muon|adamw>" (nested
        # multi_transforms would mask already-masked trees)
        kinds = muon_param_labels(params)
        labels = jax.tree.map(
            lambda g, k: g if g == "frozen" else f"{g}:{k}", labels, kinds
        )
        transforms = {"frozen": optax.set_to_zero()}
        for g, sc in group_scales.items():
            transforms[f"{g}:muon"] = muon_group(sc)
            transforms[f"{g}:adamw"] = adamw(sc)
    else:
        transforms = {
            g: adamw(sc) for g, sc in group_scales.items()
        }
        transforms["frozen"] = optax.set_to_zero()
    opt = optax.multi_transform(transforms, labels)
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    if cfg.skip_nonfinite_updates:
        opt = optax.apply_if_finite(opt, cfg.max_consecutive_nonfinite)
    if cfg.grad_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, cfg.grad_accumulation_steps)
    return opt


def make_train_step(
    model_cfg: CLIPConfig,
    cls_cfg: ClassifierConfig | None,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    axis: str = "data",
    state_shardings=None,
) -> Callable:
    """Build the jitted train step.

    Signature: ``step(state, batch, rng) -> (state, metrics)`` with
    ``batch = {'images': uint8 [B,S,S,3], 'tokens': int32 [B,77],
    'labels': int32 [B]}``. With ``mesh``, batch arrays are sharded over
    ``axis`` and state is replicated (pure data parallelism; the global-batch
    contrastive matmul is partitioned by XLA). Pass ``state_shardings``
    (a ``TrainState``-shaped pytree from
    :func:`evr_tpu.parallel.fsdp.fsdp_state_shardings`) to run the SAME step
    fully sharded — params and optimizer state live 1/n-per-device and XLA
    inserts the ZeRO-3 gather/reduce-scatter pattern. Layout only; the math
    is identical (tests/test_fsdp.py).
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    # Gradient steps resolve "auto" per-shape ("auto_grad"): XLA's
    # stored-activation fwd+bwd wins at short sequences, the fused
    # flash-style backward wins at T ≥ 512 (ViT-L/14@336) — measured,
    # PERF.md. Forward-only paths (serving encode, eval) keep "auto".
    if model_cfg.attn_impl == "auto":
        model_cfg = dataclasses.replace(model_cfg, attn_impl="auto_grad")

    n_patches = model_cfg.vision.grid ** 2
    n_keep = max(1, int(round(n_patches * (1.0 - cfg.patch_drop))))

    def _mask_frozen(params):
        """stop_gradient on frozen-prefix leaves — torch parity: a
        ``requires_grad=False`` tensor has NO grad, so it never enters
        ``clip_grad_norm_``'s global norm (`clip_finetune_correct.py:
        118-142,476`). Without this, frozen-param grads inflated the clip
        norm and shrank every trainable update. Zero grads also skip the
        wasted dW GEMMs for the frozen tensors."""
        if cfg.freeze_layers <= 0 and "lora" not in params:
            return params
        labels = param_group_labels(params, cfg.freeze_layers)
        return jax.tree.map(
            lambda p, l: jax.lax.stop_gradient(p) if l == "frozen" else p,
            params, labels,
        )

    def loss_fn(params, batch, rng, train: bool = True):
        params = _mask_frozen(params)
        clip_p = params["clip"]
        if "lora" in params:
            # fold the adapters into the dense kernels inside the traced
            # program; grads reach the rank-r factors through the merge
            from .lora import merge_lora

            clip_p = merge_lora(clip_p, params["lora"], cfg.lora_alpha)
        x = batch["images"].astype(jnp.float32) / 255.0
        x = (x - mean) / std
        patch_keep = None
        if train and cfg.patch_drop > 0.0:
            rng, drop_rng = jax.random.split(rng)
            u = jax.random.uniform(drop_rng, (x.shape[0], n_patches))
            patch_keep = jnp.argsort(u, axis=-1)[:, :n_keep].astype(jnp.int32)
        aux_moe = None
        if cfg.moe is not None:
            from evr_tpu.models.moe import encode_image_moe, encode_text_moe

            img, aux_i = encode_image_moe(
                clip_p, model_cfg, cfg.moe, x, dtype=dtype, patch_keep=patch_keep
            )
            txt, aux_t = encode_text_moe(
                clip_p, model_cfg, cfg.moe, batch["tokens"], dtype=dtype
            )
            aux_moe = aux_i + aux_t
        else:
            img = encode_image(clip_p, model_cfg, x, dtype=dtype, patch_keep=patch_keep)
            txt = encode_text(clip_p, model_cfg, batch["tokens"], dtype=dtype)
        img_n = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        cls_logits = None
        if cls_cfg is not None and params.get("classifier") is not None:
            cls_logits = classifier_forward(
                params["classifier"], cls_cfg, img_n,
                deterministic=not train, rng=rng,
            )
        loss, metrics = combined_clip_loss(
            img_n,
            txt_n,
            clip_p["logit_scale"],
            class_logits=cls_logits,
            class_labels=batch.get("labels"),
            contrastive_weight=cfg.contrastive_weight,
            classification_weight=cfg.classification_weight,
            label_smoothing=cfg.label_smoothing,
            contrastive_impl=cfg.contrastive_loss,
            logit_bias=clip_p.get("logit_bias"),
        )
        if aux_moe is not None:
            # Switch load-balance term (Switch Transformer eq. 4); kept in
            # metrics so router collapse is visible in the history
            loss = loss + jnp.float32(cfg.moe.aux_weight) * aux_moe
            metrics = {**metrics, "total_loss": loss, "moe_aux": aux_moe}
        return loss, metrics

    use_gradcache = cfg.gradcache_chunks > 1
    if use_gradcache:
        if cfg.moe is not None or cfg.lora_rank > 0 or cfg.patch_drop > 0.0:
            raise ValueError(
                "gradcache_chunks > 1 is unsupported with moe/lora/patch_drop"
            )
        from .gradcache import gradcache_value_and_grad

        def encode_fn(params, cb):
            params = _mask_frozen(params)
            x = cb["images"].astype(jnp.float32) / 255.0
            x = (x - mean) / std
            return {
                "img": encode_image(params["clip"], model_cfg, x, dtype=dtype),
                "txt": encode_text(
                    params["clip"], model_cfg, cb["tokens"], dtype=dtype
                ),
            }

        def head_fn(params, emb, aux):
            params = _mask_frozen(params)
            clip_p = params["clip"]
            img_n = emb["img"] / jnp.linalg.norm(emb["img"], axis=-1, keepdims=True)
            txt_n = emb["txt"] / jnp.linalg.norm(emb["txt"], axis=-1, keepdims=True)
            cls_logits = None
            if cls_cfg is not None and params.get("classifier") is not None:
                cls_logits = classifier_forward(
                    params["classifier"], cls_cfg, img_n,
                    deterministic=False, rng=aux["rng"],
                )
            return combined_clip_loss(
                img_n,
                txt_n,
                clip_p["logit_scale"],
                class_logits=cls_logits,
                class_labels=aux.get("labels"),
                contrastive_weight=cfg.contrastive_weight,
                classification_weight=cfg.classification_weight,
                label_smoothing=cfg.label_smoothing,
                contrastive_impl=cfg.contrastive_loss,
                logit_bias=clip_p.get("logit_bias"),
            )

        gc_vag = gradcache_value_and_grad(encode_fn, head_fn, cfg.gradcache_chunks)

    def step(state: TrainState, batch, rng):
        if use_gradcache:
            (_, metrics), grads = gc_vag(
                state.params,
                {"images": batch["images"], "tokens": batch["tokens"]},
                {"labels": batch.get("labels"), "rng": rng},
            )
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        ema = state.ema_params
        if cfg.ema_decay > 0.0 and ema is not None:
            d = jnp.float32(cfg.ema_decay)
            ema = jax.tree.map(
                lambda e, p: (e.astype(jnp.float32) * d
                              + p.astype(jnp.float32) * (1.0 - d)).astype(e.dtype),
                ema,
                params,
            )
        return (
            TrainState(
                params=params, opt_state=opt_state, step=state.step + 1,
                ema_params=ema,
            ),
            metrics,
        )

    def eval_step(state: TrainState, batch):
        # full sequence, no patch masking, deterministic classifier head —
        # validation measures the model that will actually serve
        _, metrics = loss_fn(state.params, batch, jax.random.PRNGKey(0), train=False)
        return metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(axis))
        batch_sh = {"images": data, "tokens": data, "labels": data}
        state_sh = repl if state_shardings is None else state_shardings
        step = jax.jit(
            step,
            in_shardings=(state_sh, batch_sh, repl),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
        )
        eval_step = jax.jit(eval_step, in_shardings=(state_sh, batch_sh), out_shardings=repl)
    else:
        step = jax.jit(step, donate_argnums=(0,))
        eval_step = jax.jit(eval_step)
    return step, eval_step


class PreemptionStop(Exception):
    """Raised inside the train loop after a SIGTERM-triggered autosave."""


class Trainer:
    """End-to-end fine-tune driver: epochs, validation, early stopping,
    best/final checkpointing, resume (epoch-level and mid-epoch autosave)."""

    def __init__(
        self,
        model_cfg: CLIPConfig,
        clip_params,
        cfg: TrainConfig | None = None,
        classifier_params=None,
        cls_cfg: ClassifierConfig | None = None,
        mesh=None,
        steps_per_epoch: int = 1,
        log_fn: Callable[[str], None] = print,
        fsdp: bool = False,
    ):
        """``fsdp=True`` (requires ``mesh``) shards params + optimizer state
        1/n-per-device along the data axis (ZeRO-3,
        `evr_tpu.parallel.fsdp`) — same math, bounded per-chip HBM."""
        self.model_cfg = model_cfg
        self.cfg = cfg or TrainConfig()
        if self.cfg.remat and not model_cfg.remat:
            import dataclasses as _dc

            self.model_cfg = model_cfg = _dc.replace(model_cfg, remat=True)
        self.cls_cfg = cls_cfg or (
            ClassifierConfig(embed_dim=model_cfg.embed_dim)
            if classifier_params is not None
            else None
        )
        self.mesh = mesh
        self.log = log_fn

        if self.cfg.moe is not None:
            if self.cfg.lora_rank > 0:
                raise ValueError(
                    "lora_rank > 0 with cfg.moe is unsupported: LoRA targets "
                    "the dense mlp kernels MoE replaces with expert stacks"
                )
            from evr_tpu.models.moe import upcycle_clip_params

            def _has_moe(cp) -> bool:
                return any(
                    "moe" in b for b in cp.get("visual", {}).get("blocks", ())
                )

            if not _has_moe(clip_params):
                # Sparse Upcycling (arXiv 2212.05055): a dense init
                # checkpoint becomes the MoE init — every expert starts as
                # the trained dense MLP (step-0-exact with top-k≥2)
                clip_params = upcycle_clip_params(
                    jax.random.PRNGKey(self.cfg.seed + 2),
                    clip_params,
                    model_cfg,
                    self.cfg.moe,
                )
                log_fn(
                    f"moe: sparse-upcycled dense init to "
                    f"{self.cfg.moe.n_experts} experts (top-{self.cfg.moe.router_k})"
                )
        params = {"clip": clip_params}
        if classifier_params is not None:
            params["classifier"] = classifier_params
        if self.cfg.contrastive_loss == "siglip" and "logit_bias" not in params["clip"]:
            # SigLIP's learnable bias, init -10 (keeps early sigmoid targets
            # mostly-negative-pair calibrated — arxiv 2303.15343 §3)
            params = {**params, "clip": {**params["clip"], "logit_bias": jnp.float32(-10.0)}}
        if self.cfg.lora_rank > 0:
            from .lora import init_lora

            params["lora"] = init_lora(
                jax.random.PRNGKey(self.cfg.seed + 1),
                params["clip"],
                self.cfg.lora_rank,
                targets=self.cfg.lora_targets,
            )
        # fresh device copies, never aliases of the caller's arrays: the
        # jitted step DONATES the state buffers, so aliasing would silently
        # delete the caller's params after the first train step (and break
        # constructing a second Trainer from the same tree)
        params = jax.tree.map(lambda a: jnp.copy(jnp.asarray(a)), params)
        self.optimizer = make_optimizer(self.cfg, params, steps_per_epoch)
        self._state_shardings = state_shardings = None
        expert_parallel = (
            self.cfg.moe is not None
            and mesh is not None
            and "expert" in mesh.axis_names
        )
        if fsdp and expert_parallel:
            raise ValueError(
                "fsdp=True with an 'expert' mesh axis is unsupported — pick "
                "one state layout (ZeRO-3 over data, or experts over expert)"
            )
        ema_on = self.cfg.ema_decay > 0.0
        if fsdp:
            if mesh is None:
                raise ValueError("fsdp=True requires a mesh")
            from evr_tpu.parallel.fsdp import fsdp_state_shardings, shard_tree

            self._state_shardings = state_shardings = fsdp_state_shardings(
                params, self.optimizer, mesh, ema=ema_on
            )
            params = shard_tree(params, state_shardings.params)
            self.state = TrainState(
                params=params,
                opt_state=shard_tree(
                    self.optimizer.init(params), state_shardings.opt_state
                ),
                step=jnp.zeros((), jnp.int32),
                ema_params=jax.tree.map(jnp.copy, params) if ema_on else None,
            )
        elif expert_parallel:
            # experts + their AdamW moments live E/n-per-device over the
            # 'expert' axis; batch stays on 'data' (GShard's dp×ep layout)
            from evr_tpu.parallel.ep import ep_state_shardings
            from evr_tpu.parallel.fsdp import shard_tree

            self._state_shardings = state_shardings = ep_state_shardings(
                params, self.optimizer, mesh, ema=ema_on
            )
            params = shard_tree(params, state_shardings.params)
            self.state = TrainState(
                params=params,
                opt_state=shard_tree(
                    self.optimizer.init(params), state_shardings.opt_state
                ),
                step=jnp.zeros((), jnp.int32),
                ema_params=jax.tree.map(jnp.copy, params) if ema_on else None,
            )
        else:
            self.state = TrainState(
                params=params,
                opt_state=self.optimizer.init(params),
                step=jnp.zeros((), jnp.int32),
                # a real copy, not an alias: the jitted step donates the
                # state buffers, and double-donating an aliased leaf is UB
                ema_params=(
                    jax.tree.map(lambda a: jnp.copy(jnp.asarray(a)), params)
                    if ema_on else None
                ),
            )
        self.train_step, self.eval_step = make_train_step(
            model_cfg, self.cls_cfg, self.cfg, self.optimizer, mesh,
            state_shardings=state_shardings,
        )
        self.history: list[dict] = []
        self._preempted = False
        # one-process-per-host SPMD: each process feeds its slice of the
        # global batch; _run_epoch glues them into global row-sharded arrays
        self._multihost = mesh is not None and jax.process_count() > 1

    def merged_clip_params(self):
        """The CLIP params the model *serves*: with LoRA active, adapters
        folded into the dense kernels (`training.lora.merge_lora`) — an
        ordinary checkpoint every downstream surface consumes as-is; the
        base params otherwise."""
        params = self.state.params
        if "lora" in params:
            from .lora import merge_lora

            return merge_lora(params["clip"], params["lora"], self.cfg.lora_alpha)
        return params["clip"]

    def install_preemption_autosave(self, signals=None) -> None:
        """Make SIGTERM (the pod-preemption signal) set a flag the train
        loop checks per batch: the next batch boundary writes a resumable
        'autosave' checkpoint and fit() returns with ``preempted=True``
        instead of dying mid-step."""
        import signal as _signal

        for s in signals or (_signal.SIGTERM,):
            _signal.signal(s, lambda signum, frame: setattr(self, "_preempted", True))

    # -- checkpointing ----------------------------------------------------
    def _ckpt_dir(self, name: str) -> pathlib.Path:
        return pathlib.Path(self.cfg.save_dir).absolute() / name

    def save_checkpoint(
        self, name: str, epoch: int, metrics: dict, extra: dict | None = None
    ) -> None:
        import orbax.checkpoint as ocp

        # Multi-host: orbax's save IS a collective (internal
        # sync_global_processes barriers) — every process must call it with
        # the same (replicated) values; orbax gates the actual file writes
        # to the primary host. Only the pre-save cleanup is primary-only.
        primary = (not self._multihost) or jax.process_index() == 0
        path = self._ckpt_dir(name)
        ckptr = ocp.StandardCheckpointer()
        path.parent.mkdir(parents=True, exist_ok=True)

        def to_host(tree):
            # fsdp leaves span processes in multihost runs — np.asarray on a
            # non-addressable array raises; process_allgather replicates the
            # global value onto every host first.
            if self._multihost:
                from jax.experimental import multihost_utils

                return jax.tree.map(
                    np.asarray, multihost_utils.process_allgather(tree, tiled=True)
                )
            return jax.tree.map(np.asarray, tree)

        payload = {
            "params": to_host(self.state.params),
            "step": int(self.state.step),
            "epoch": epoch,
            "metrics": {k: float(v) for k, v in metrics.items()},
            **(extra or {}),
        }
        if self.cfg.moe is not None:
            # self-describing MoE checkpoints: serving loaders rebuild the
            # MoEConfig from the payload (models.moe.MoEConfig(**payload["moe"]))
            payload["moe"] = dataclasses.asdict(self.cfg.moe)
        if self.state.ema_params is not None:
            payload["ema"] = to_host(self.state.ema_params)
        if primary and path.exists():
            import shutil

            shutil.rmtree(path)
        if self._multihost:
            from evr_tpu.parallel.multihost import barrier

            barrier("evr-ckpt-clean")
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
        # optimizer moments in a sibling dir (restored against an abstract
        # template so optax's namedtuple structure survives the round trip)
        opt_path = path.parent / f"{name}_opt"
        if primary and opt_path.exists():
            import shutil

            shutil.rmtree(opt_path)
        if self._multihost:
            from evr_tpu.parallel.multihost import barrier

            barrier("evr-ckpt-clean-opt")
        ckptr.save(opt_path, to_host(self.state.opt_state))
        ckptr.wait_until_finished()

    def restore_checkpoint(self, name: str) -> dict:
        """Full-state restore: params + optimizer moments + step (the
        reference checkpoints bundle optimizer_state_dict the same way —
        `clip_finetune_correct.py:216-224`)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(self._ckpt_dir(name))
        params = payload["params"]  # host numpy tree
        opt_path = self._ckpt_dir(f"{name}_opt")
        if opt_path.exists():
            template = self.optimizer.init(params)
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
                template,
            )
            opt_state = ckptr.restore(opt_path, abstract)
        else:  # older checkpoints: re-init moments
            opt_state = self.optimizer.init(params)
        if self._state_shardings is not None:
            # fsdp trainer: place the restored host values straight into the
            # sharded layout (each device materializes only its 1/n slice)
            params = jax.device_put(params, self._state_shardings.params)
            opt_state = jax.device_put(opt_state, self._state_shardings.opt_state)
        elif not self._multihost:
            params = jax.tree.map(jnp.asarray, params)
        # multihost dp: leave host numpy — the jitted step's in_shardings
        # globalize replicated inputs; jnp.asarray would COMMIT leaves to
        # one local device and conflict with the multi-process sharding
        ema = payload.get("ema")
        if ema is None and self.cfg.ema_decay > 0.0:
            ema = payload["params"]  # pre-EMA checkpoint: restart from params
        if ema is not None and self.cfg.ema_decay > 0.0:
            if self._state_shardings is not None:
                ema = jax.device_put(ema, self._state_shardings.params)
            elif not self._multihost:
                ema = jax.tree.map(lambda a: jnp.copy(jnp.asarray(a)), ema)
        else:
            ema = None
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.asarray(payload["step"], jnp.int32),
            ema_params=ema,
        )
        return payload

    # -- loops ------------------------------------------------------------
    def _autosave(self, epoch: int, batches_done: int) -> None:
        self.save_checkpoint(
            "autosave", epoch, {}, extra={"batches_done": batches_done}
        )

    def _run_epoch(
        self, batches, rng, train: bool = True,
        epoch: int | None = None, skip_batches: int = 0,
    ) -> dict:
        """``skip_batches`` fast-forwards a deterministic epoch iterator to
        resume mid-epoch from an autosave (the skipped batches are never
        staged — itertools.islice drops them before the prefetch thread)."""
        import itertools

        from .data import prefetch_batches

        it = iter(batches)
        if skip_batches:
            it = itertools.islice(it, skip_batches, None)
        agg: dict[str, list[float]] = {}
        n = 0
        for batch in prefetch_batches(it):
            if self._multihost:
                from evr_tpu.parallel.multihost import make_global_batch

                batch = make_global_batch(self.mesh, batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if train:
                rng, sub = jax.random.split(rng)
                self.state, metrics = self.train_step(self.state, batch, sub)
            else:
                metrics = self.eval_step(self.state, batch)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
            n += 1
            if train and epoch is not None:
                done = skip_batches + n
                if self._preempted:
                    self._autosave(epoch, done)
                    raise PreemptionStop
                if (
                    self.cfg.save_every_steps
                    and done % self.cfg.save_every_steps == 0
                ):
                    self._autosave(epoch, done)
        return {k: float(np.mean(v)) for k, v in agg.items()} | {"batches": n}

    def plot_history(self, out_path) -> None:
        """Loss/accuracy curves PNG (`clip_finetune_correct.py:272-293`)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = [r["epoch"] for r in self.history]
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for key, label in (("train_total_loss", "train"), ("val_total_loss", "val")):
            vals = [r.get(key) for r in self.history]
            if any(v is not None for v in vals):
                axes[0].plot(epochs, vals, label=label)
        axes[0].set_xlabel("epoch")
        axes[0].set_ylabel("loss")
        axes[0].legend()
        for key, label in (
            ("train_classification_accuracy", "train"),
            ("val_classification_accuracy", "val"),
        ):
            vals = [r.get(key) for r in self.history]
            if any(v is not None for v in vals):
                axes[1].plot(epochs, vals, label=label)
        axes[1].set_xlabel("epoch")
        axes[1].set_ylabel("classification accuracy")
        axes[1].legend()
        fig.tight_layout()
        fig.savefig(out_path, dpi=110)
        plt.close(fig)

    def evaluate_retrieval(self, batches) -> dict:
        """Per-epoch retrieval validation (R@1/5/10, MRR both directions) —
        the T3 trainer's `validate` (`training_CLIP_multimodal.py:269-375`)
        computed over the current params."""
        from evr_tpu.evaluation.retrieval import evaluate_retrieval
        from evr_tpu.models.clip import encode_image, encode_text
        from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

        dtype = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        mean = np.asarray(CLIP_MEAN, np.float32)
        std = np.asarray(CLIP_STD, np.float32)
        clip_p = self.merged_clip_params()
        imgs, txts = [], []
        for batch in batches:
            x = (np.asarray(batch["images"], np.float32) / 255.0 - mean) / std
            imgs.append(
                np.asarray(
                    encode_image(clip_p, self.model_cfg, jnp.asarray(x), dtype=dtype)
                )
            )
            txts.append(
                np.asarray(
                    encode_text(
                        clip_p, self.model_cfg,
                        jnp.asarray(batch["tokens"]), dtype=dtype,
                    )
                )
            )
        img = np.concatenate(imgs)
        txt = np.concatenate(txts)
        ids = list(range(len(img)))
        return evaluate_retrieval(img, txt, ids, ids)

    def fit(self, train_batches_fn, val_batches_fn=None, resume_from: str | None = None) -> dict:
        """``train_batches_fn(epoch) -> iterator of batches`` (and likewise
        for validation). ``resume_from`` restores a saved checkpoint and
        continues from its epoch+1 (`training_CLIP_multimodal.py:510-523`
        resume semantics). Returns the best metrics dict."""
        rng = jax.random.PRNGKey(self.cfg.seed)
        best_val = math.inf
        best_epoch = -1
        patience = 0
        start_epoch = 0
        resume_skip = 0
        if resume_from is not None:
            payload = self.restore_checkpoint(resume_from)
            resume_skip = int(payload.get("batches_done", 0))
            if resume_skip > 0:  # mid-epoch autosave: re-enter the SAME epoch
                start_epoch = int(payload.get("epoch", 0))
                self.log(
                    f"resumed from {resume_from} mid-epoch {start_epoch} "
                    f"(skipping {resume_skip} consumed batches)"
                )
            else:
                start_epoch = int(payload.get("epoch", -1)) + 1
                self.log(f"resumed from {resume_from} at epoch {start_epoch}")
        for epoch in range(start_epoch, self.cfg.epochs):
            t0 = time.time()
            rng, sub = jax.random.split(rng)
            try:
                train_metrics = self._run_epoch(
                    train_batches_fn(epoch), sub, train=True, epoch=epoch,
                    skip_batches=resume_skip if epoch == start_epoch else 0,
                )
            except PreemptionStop:
                self.log("preempted — mid-epoch state autosaved to 'autosave'")
                return {
                    "preempted": True,
                    "best_val_loss": best_val,
                    "best_epoch": best_epoch,
                    "history": self.history,
                }
            row = {"epoch": epoch, **{f"train_{k}": v for k, v in train_metrics.items()}}
            if val_batches_fn is not None:
                val_metrics = self._run_epoch(val_batches_fn(epoch), rng, train=False)
                row |= {f"val_{k}": v for k, v in val_metrics.items()}
                val_loss = val_metrics.get("total_loss", math.inf)
                if val_loss < best_val:
                    best_val, best_epoch, patience = val_loss, epoch, 0
                    self.save_checkpoint("best_model", epoch, val_metrics)
                else:
                    patience += 1
            row["seconds"] = time.time() - t0
            self.history.append(row)
            self.log(f"[epoch {epoch}] " + " ".join(f"{k}={v:.4g}" for k, v in row.items() if k != "epoch"))
            if val_batches_fn is not None and patience >= self.cfg.early_stopping:
                self.log(f"early stopping at epoch {epoch} (best epoch {best_epoch})")
                break
        final_metrics = self.history[-1] if self.history else {}
        self.save_checkpoint("final_checkpoint", len(self.history) - 1, {})
        return {"best_val_loss": best_val, "best_epoch": best_epoch, "history": self.history}
