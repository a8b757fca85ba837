"""LoRA parameter-efficient fine-tuning (`training.lora`, arXiv 2106.09685).

No reference analog (the reference fine-tunes full towers or frozen-CLIP
projection heads only — SURVEY §2.3); these tests pin the new capability:
zero-effect init, base-frozen training that still learns, exact merge
export, dp-mesh parity.
"""

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models import ClassifierConfig, init_classifier_params
from evr_tpu.models.clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    encode_image,
    init_clip_params,
)
from evr_tpu.training import TrainConfig, Trainer, make_optimizer, make_train_step
from evr_tpu.training.finetune import TrainState
from evr_tpu.training.lora import init_lora, lora_param_fraction, merge_lora
from evr_tpu.training.partition import count_labels, param_group_labels

from test_training import tiny_batch, tiny_cfg


def _setup(rank=4, **tc_kwargs):
    cfg = tiny_cfg()
    clip_params = init_clip_params(jax.random.PRNGKey(0), cfg)
    cls = init_classifier_params(
        jax.random.PRNGKey(1), ClassifierConfig(embed_dim=32, num_classes=3)
    )
    tc = TrainConfig(
        lora_rank=rank, lr=1e-3, batch_size=8, epochs=2,
        compute_dtype="float32", **tc_kwargs,
    )
    return cfg, clip_params, cls, tc


def test_merge_is_identity_at_init(rng):
    cfg, clip_params, _, _ = _setup()
    lora = init_lora(jax.random.PRNGKey(7), clip_params, rank=4)
    merged = merge_lora(clip_params, lora, alpha=16.0)
    x = jnp.asarray((rng.random((2, 32, 32, 3)) * 2 - 1).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(encode_image(clip_params, cfg, x)),
        np.asarray(encode_image(merged, cfg, x)),
    )


def test_merge_math_single_linear():
    cfg, clip_params, _, _ = _setup()
    lora = init_lora(jax.random.PRNGKey(7), clip_params, rank=4)
    # make one adapter non-trivial and check the folded kernel by hand
    a = np.asarray(lora["visual"]["blocks"][0]["attn"]["qkv"]["a"])
    b = np.ones_like(lora["visual"]["blocks"][0]["attn"]["qkv"]["b"])
    lora["visual"]["blocks"][0]["attn"]["qkv"]["b"] = jnp.asarray(b)
    merged = merge_lora(clip_params, lora, alpha=8.0)
    base_k = np.asarray(clip_params["visual"]["blocks"][0]["attn"]["qkv"]["kernel"])
    merged_k = np.asarray(merged["visual"]["blocks"][0]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(merged_k, base_k + (8.0 / 4) * (a @ b), rtol=1e-6)
    # un-adapted leaves are shared, not copied
    assert merged["visual"]["pos_embedding"] is clip_params["visual"]["pos_embedding"]


def test_lora_labels_freeze_base():
    cfg, clip_params, cls, tc = _setup()
    lora = init_lora(jax.random.PRNGKey(7), clip_params, rank=4, targets=("attn.qkv",))
    params = {"clip": clip_params, "classifier": cls, "lora": lora}
    labels = param_group_labels(params, freeze_layers=8)
    counts = count_labels(labels)
    n_clip = len(jax.tree.leaves(clip_params))
    # every base clip leaf frozen except logit_scale (trainable temperature)
    assert counts["frozen"] == n_clip - 1
    # adapters land in their tower's LR group: 2 towers × 2 blocks × (a, b)
    assert counts["visual"] == 4 and counts["text"] == 4
    assert counts["classifier"] == 4


def test_lora_step_trains_adapters_only(rng):
    cfg, clip_params, cls, tc = _setup()
    trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                      cls_cfg=ClassifierConfig(embed_dim=32, num_classes=3))
    assert "lora" in trainer.state.params
    frac = lora_param_fraction(clip_params, trainer.state.params["lora"])
    assert 0 < frac < 0.25  # tiny toy towers; <1% at production widths
    base_before = jax.tree.map(np.asarray, trainer.state.params["clip"])
    scale_before = float(trainer.state.params["clip"]["logit_scale"])
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    losses = []
    state = trainer.state
    for i in range(8):
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    # adapters moved, loss dropped, base tower bytes did not move
    assert losses[-1] < losses[0]
    b0 = np.asarray(state.params["lora"]["visual"]["blocks"][0]["attn"]["qkv"]["b"])
    assert np.abs(b0).max() > 0
    for tower, leaf in (("visual", "pos_embedding"), ("text", "token_embedding")):
        np.testing.assert_array_equal(
            base_before[tower][leaf], np.asarray(state.params["clip"][tower][leaf])
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        base_before["visual"]["blocks"],
        state.params["clip"]["visual"]["blocks"],
    )
    # temperature stays trainable (reference always trains logit_scale)
    assert float(state.params["clip"]["logit_scale"]) != scale_before


def test_lora_optimizer_state_is_adapter_sized():
    cfg, clip_params, cls, tc = _setup()
    params = {"clip": clip_params, "classifier": cls,
              "lora": init_lora(jax.random.PRNGKey(7), clip_params, tc.lora_rank)}
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    # frozen leaves get set_to_zero (no moments): count fp32 moment bytes
    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
                   if hasattr(x, "dtype"))
    base_bytes = nbytes(clip_params)
    # AdamW keeps 2 moments/trainable leaf; with base frozen this must be
    # far below 2x the base-model bytes
    assert nbytes(opt_state) < base_bytes


def test_lora_mesh_matches_single_device(rng):
    cfg, clip_params, cls, tc = _setup()
    cls_cfg = ClassifierConfig(embed_dim=32, num_classes=3)
    batch_np = tiny_batch(rng, 8)

    def run(mesh):
        # fresh copies: the jitted step donates its state, which would
        # delete the shared init buffers between runs
        fresh = jax.tree.map(lambda a: jnp.asarray(np.array(a)), clip_params)
        fresh_cls = jax.tree.map(lambda a: jnp.asarray(np.array(a)), cls)
        t = Trainer(cfg, fresh, tc, classifier_params=fresh_cls,
                    cls_cfg=cls_cfg, mesh=mesh)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = t.train_step(t.state, batch, jax.random.PRNGKey(0))
        return float(metrics["total_loss"]), jax.tree.map(np.asarray, state.params["lora"])

    from evr_tpu.parallel import get_mesh

    loss_single, lora_single = run(None)
    loss_mesh, lora_mesh = run(get_mesh())
    assert abs(loss_single - loss_mesh) < 1e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        lora_single, lora_mesh,
    )


def test_merged_checkpoint_serves_like_lora_model(rng):
    """merged_clip_params() output must reproduce the adapted forward
    exactly — the export surface every downstream consumer reads."""
    cfg, clip_params, cls, tc = _setup()
    # host-side snapshot: the trainer's donated steps delete the init buffers
    base_copy = jax.tree.map(lambda a: jnp.asarray(np.array(a)), clip_params)
    trainer = Trainer(cfg, clip_params, tc, classifier_params=cls,
                      cls_cfg=ClassifierConfig(embed_dim=32, num_classes=3))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 8).items()}
    for i in range(3):
        trainer.state, _ = trainer.train_step(trainer.state, batch, jax.random.PRNGKey(i))
    merged = trainer.merged_clip_params()
    manual = merge_lora(
        trainer.state.params["clip"], trainer.state.params["lora"], tc.lora_alpha
    )
    x = jnp.asarray((rng.random((4, 32, 32, 3)) * 2 - 1).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(encode_image(merged, cfg, x)),
        np.asarray(encode_image(manual, cfg, x)),
    )
    # and it actually differs from the base (training had an effect)
    assert np.abs(
        np.asarray(encode_image(merged, cfg, x))
        - np.asarray(encode_image(base_copy, cfg, x))
    ).max() > 0
