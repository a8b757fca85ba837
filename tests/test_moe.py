"""MoE-CLIP towers + expert parallelism (`models.moe`, `parallel.ep`).

No reference analog (dense towers only — SURVEY §2.3); pins the sparse
scaling path: Switch/GShard einsum routing semantics, Sparse-Upcycling
step-0 exactness, capacity dropping, aux load-balance loss, grads through
router+experts, and exact ep-sharded parity on the 8-device CPU mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp

from evr_tpu.models.clip import (
    CLIPConfig,
    TextConfig,
    VisionConfig,
    clip_forward,
    init_clip_params,
)
from evr_tpu.models.layers import init_block, linear, quick_gelu
from evr_tpu.models.moe import (
    MoEConfig,
    init_moe_clip_params,
    init_moe_mlp,
    moe_block_indices,
    moe_clip_forward,
    moe_mlp_apply,
    upcycle_clip_params,
    upcycle_moe_mlp,
)


def _cfg():
    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=512, width=64, layers=2, heads=4),
    )


def _inputs(rng, b=4):
    pix = jnp.asarray(rng.normal(size=(b, 32, 32, 3)).astype(np.float32))
    toks = np.zeros((b, 16), np.int32)
    toks[:, 0] = 1
    toks[:, 3] = 511
    return pix, jnp.asarray(toks)


def test_moe_block_indices():
    assert moe_block_indices(12, 2) == (1, 3, 5, 7, 9, 11)
    assert moe_block_indices(2, 2) == (1,)
    assert moe_block_indices(3, 1) == (0, 1, 2)


def test_single_expert_equals_dense_mlp(rng):
    """E=1, k=1: the router prob is exactly 1, capacity covers every token,
    so the whole dispatch/combine machinery must reduce to the dense MLP."""
    width = 64
    p = init_moe_mlp(jax.random.PRNGKey(0), width, 2, n_experts=1)
    x = jnp.asarray(rng.normal(size=(2, 8, width)).astype(np.float32))
    moe = MoEConfig(n_experts=1, router_k=1, capacity_factor=1.0)
    y, aux = moe_mlp_apply(x, p, moe)
    dense = {
        "fc": {"kernel": p["fc"]["kernel"][0], "bias": p["fc"]["bias"][0]},
        "proj": {"kernel": p["proj"]["kernel"][0], "bias": p["proj"]["bias"][0]},
    }
    ref = linear(quick_gelu(linear(x, dense["fc"])), dense["proj"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    assert abs(float(aux) - 1.0) < 1e-6  # one expert: f=P=1 → aux = E·1 = 1


def test_upcycle_step0_matches_dense(rng):
    """Sparse Upcycling with renormalised top-2: identical experts whose
    gates sum to 1 → the MoE forward equals the dense forward at step 0."""
    cfg = _cfg()
    moe = MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0, moe_every=2)
    dense = init_clip_params(jax.random.PRNGKey(0), cfg)
    up = upcycle_clip_params(jax.random.PRNGKey(1), dense, cfg, moe)
    # selected blocks swapped mlp→moe, others untouched
    assert "moe" in up["visual"]["blocks"][1] and "mlp" not in up["visual"]["blocks"][1]
    assert "mlp" in up["visual"]["blocks"][0]
    pix, toks = _inputs(rng)
    out_d = clip_forward(dense, cfg, pix, toks)
    out_m = moe_clip_forward(up, cfg, moe, pix, toks)
    np.testing.assert_allclose(
        np.asarray(out_m["image_features"]),
        np.asarray(out_d["image_features"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_m["text_features"]),
        np.asarray(out_d["text_features"]),
        atol=1e-6,
    )


def test_capacity_drop_zeroes_overflow_tokens(rng):
    """C slots per expert: at most E·C tokens produce output; overflow rows
    are exactly 0 (the residual carries them — Switch semantics)."""
    width = 64
    p = init_moe_mlp(jax.random.PRNGKey(0), width, 2, n_experts=2)
    # zero router → uniform probs → top_k ties resolve to expert 0 for every
    # token → guaranteed overflow of expert 0's C=2 slots
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    x = jnp.asarray(rng.normal(size=(1, 16, width)).astype(np.float32))
    moe = MoEConfig(n_experts=2, router_k=1, capacity_factor=0.25)  # C = 2
    y, _ = moe_mlp_apply(x, p, moe)
    nonzero_rows = int(np.sum(np.any(np.asarray(y[0]) != 0, axis=-1)))
    assert nonzero_rows <= 2 * 2  # E·C
    assert nonzero_rows > 0


def test_aux_loss_balanced_router_is_one():
    """Uniform routing: f_e = P_e = 1/E → aux = E·Σ 1/E² = 1 (Switch eq. 4
    minimum). Zero router weights give exactly uniform probs; argmax ties
    all resolve to expert 0 so f is one-hot, but P stays uniform →
    aux = E·(1/E) · anything summing f·P = Σ_e f_e/E = 1/E·1 … compute it."""
    width = 32
    p = init_moe_mlp(jax.random.PRNGKey(0), width, 2, n_experts=4)
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    x = jnp.ones((1, 8, width), jnp.float32)
    _, aux = moe_mlp_apply(x, p, MoEConfig(n_experts=4, capacity_factor=4.0))
    # uniform P (=1/E) regardless of f: aux = E · Σ_e f_e·(1/E) = Σ_e f_e = 1
    assert abs(float(aux) - 1.0) < 1e-5


def test_grads_reach_experts_and_router(rng):
    cfg = _cfg()
    moe = MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0)
    params = init_moe_clip_params(jax.random.PRNGKey(2), cfg, moe)
    pix, toks = _inputs(rng)

    def loss_fn(p):
        o = moe_clip_forward(p, cfg, moe, pix, toks)
        n = o["logits_per_image"].shape[0]
        lbl = jnp.arange(n)
        nll = -jax.nn.log_softmax(o["logits_per_image"])[jnp.arange(n), lbl]
        return jnp.mean(nll) + moe.aux_weight * o["aux_loss"]

    g = jax.grad(loss_fn)(params)
    blk = g["visual"]["blocks"][1]["moe"]
    assert float(np.abs(np.asarray(blk["fc"]["kernel"])).max()) > 0
    assert float(np.abs(np.asarray(blk["router"]["kernel"])).max()) > 0
    tblk = g["text"]["blocks"][1]["moe"]
    assert float(np.abs(np.asarray(tblk["proj"]["kernel"])).max()) > 0


def test_moe_training_reduces_loss(rng):
    """A few AdamW steps on the contrastive+aux objective must reduce it —
    end-to-end trainability of router + experts + dense halves."""
    import optax

    cfg = _cfg()
    moe = MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0)
    params = init_moe_clip_params(jax.random.PRNGKey(2), cfg, moe)
    pix, toks = _inputs(rng, b=8)

    def loss_fn(p):
        o = moe_clip_forward(p, cfg, moe, pix, toks)
        n = o["logits_per_image"].shape[0]
        lbl = jnp.arange(n)
        li = -jax.nn.log_softmax(o["logits_per_image"])[jnp.arange(n), lbl]
        lt = -jax.nn.log_softmax(o["logits_per_text"])[jnp.arange(n), lbl]
        return jnp.mean(li + lt) / 2 + moe.aux_weight * o["aux_loss"]

    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(6):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_ep_sharding_spec_and_parity(rng):
    """Expert-parallel layout: stacked expert tensors sharded on dim 0 over
    the expert axis, routers replicated; jitted forward bit-matches the
    unsharded run (GSPMD inserts the collectives, same math)."""
    from jax.sharding import PartitionSpec as P

    from evr_tpu.parallel import get_mesh
    from evr_tpu.parallel.ep import moe_param_shardings, shard_moe_params

    cfg = _cfg()
    moe = MoEConfig(n_experts=8, router_k=2, capacity_factor=2.0)
    params = init_moe_clip_params(jax.random.PRNGKey(2), cfg, moe)
    mesh = get_mesh(8, axis_names=("expert",))

    shardings = moe_param_shardings(mesh, params, "expert")
    blk = shardings["visual"]["blocks"][1]
    assert blk["moe"]["fc"]["kernel"].spec == P("expert", None, None)
    assert blk["moe"]["fc"]["bias"].spec == P("expert", None)
    assert blk["moe"]["proj"]["kernel"].spec == P("expert", None, None)
    assert blk["moe"]["router"]["kernel"].spec == P()
    assert blk["attn"]["qkv"]["kernel"].spec == P()

    pix, toks = _inputs(rng)
    fwd = jax.jit(
        lambda p, px, tk: moe_clip_forward(p, cfg, moe, px, tk)["image_features"]
    )
    ref = np.asarray(fwd(params, pix, toks))
    sharded = shard_moe_params(mesh, params, "expert")
    out = np.asarray(fwd(sharded, pix, toks))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_ep_composes_with_data_axis(rng):
    """2-D mesh (data × expert): batch row-sharded, experts sharded — the
    layout production MoE serving uses. Exact vs single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from evr_tpu.parallel import get_mesh
    from evr_tpu.parallel.ep import shard_moe_params

    cfg = _cfg()
    moe = MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0)
    params = init_moe_clip_params(jax.random.PRNGKey(2), cfg, moe)
    mesh = get_mesh(8, axis_names=("data", "expert"), shape=(2, 4))
    pix, toks = _inputs(rng, b=4)

    fwd = jax.jit(
        lambda p, px, tk: moe_clip_forward(p, cfg, moe, px, tk)["image_features"]
    )
    ref = np.asarray(fwd(params, pix, toks))
    sharded = shard_moe_params(mesh, params, "expert")
    data_sh = NamedSharding(mesh, P("data"))
    out = np.asarray(
        fwd(sharded, jax.device_put(pix, data_sh), jax.device_put(toks, data_sh))
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)


# -- Trainer + serving integration -------------------------------------------


def _train_batch(rng, cfg, b=8):
    s = cfg.vision.image_size
    return {
        "images": jnp.asarray(
            rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
        ),
        "tokens": jnp.asarray(
            np.concatenate(
                [
                    np.ones((b, 1), np.int32),
                    rng.integers(2, 100, (b, cfg.text.context_length - 1)).astype(
                        np.int32
                    ),
                ],
                axis=1,
            )
        ),
        "labels": jnp.asarray(rng.integers(0, 3, (b,)).astype(np.int32)),
    }


def test_trainer_moe_upcycles_and_steps(rng):
    """Trainer(cfg.moe=...) with a dense init: params are Sparse-Upcycled,
    the step runs the sparse forward, metrics carry moe_aux, and the first
    eval contrastive loss equals the dense Trainer's (step-0 exactness of
    upcycling, through the full Trainer stack)."""
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = _cfg()
    dense = init_clip_params(jax.random.PRNGKey(0), cfg)
    batch = _train_batch(rng, cfg)
    base = TrainConfig(
        batch_size=8, epochs=1, freeze_layers=2, compute_dtype="float32"
    )
    tr_dense = Trainer(cfg, dense, base, log_fn=lambda *_: None)
    ev_dense = tr_dense.eval_step(tr_dense.state, batch)

    import dataclasses as dc

    tc = dc.replace(
        base, moe=MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0)
    )
    dense2 = init_clip_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, dense2, tc, log_fn=lambda *_: None)
    assert "moe" in tr.state.params["clip"]["visual"]["blocks"][1]
    ev = tr.eval_step(tr.state, batch)
    np.testing.assert_allclose(
        float(ev["contrastive_loss"]), float(ev_dense["contrastive_loss"]), atol=1e-5
    )
    st, m = tr.train_step(tr.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["total_loss"]))
    assert "moe_aux" in m and np.isfinite(float(m["moe_aux"]))


def test_trainer_moe_dp_ep_exact_vs_single_device(rng):
    """Trainer on a 2×4 data×expert mesh: expert params AND AdamW moments
    sharded over 'expert' (ep_state_shardings); one step bit-matches the
    single-device step — loss and post-step expert kernels."""
    from evr_tpu.parallel import get_mesh
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = _cfg()
    batch = _train_batch(rng, cfg)
    tc = TrainConfig(
        batch_size=8,
        epochs=1,
        freeze_layers=2,
        compute_dtype="float32",
        moe=MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0),
    )
    tr1 = Trainer(
        cfg, init_clip_params(jax.random.PRNGKey(0), cfg), tc, log_fn=lambda *_: None
    )
    st1, m1 = tr1.train_step(tr1.state, batch, jax.random.PRNGKey(0))

    from jax.sharding import PartitionSpec as P

    mesh = get_mesh(8, axis_names=("data", "expert"), shape=(2, 4))
    tr = Trainer(
        cfg,
        init_clip_params(jax.random.PRNGKey(0), cfg),
        tc,
        mesh=mesh,
        log_fn=lambda *_: None,
    )
    kern = tr.state.params["clip"]["visual"]["blocks"][1]["moe"]["fc"]["kernel"]
    assert kern.sharding.spec == P("expert", None, None)
    # AdamW moments sharded like their params (expert-stacked leaves only)
    moment_specs = {
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(tr.state.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim == 3
    }
    assert P("expert", None, None) in moment_specs
    st, m = tr.train_step(tr.state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m["total_loss"]), float(m1["total_loss"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st.params["clip"]["visual"]["blocks"][1]["moe"]["fc"]["kernel"]),
        np.asarray(st1.params["clip"]["visual"]["blocks"][1]["moe"]["fc"]["kernel"]),
        atol=2e-6,
    )


def test_trainer_moe_ep_ema_sharded(rng):
    """EMA composes with expert parallelism: the EMA tree's expert-stacked
    leaves shard over 'expert' like the params, and the averaged kernels
    match the single-device EMA bit-for-bit."""
    from jax.sharding import PartitionSpec as P

    from evr_tpu.parallel import get_mesh
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = _cfg()
    batch = _train_batch(rng, cfg)
    tc = TrainConfig(
        batch_size=8, epochs=1, freeze_layers=2, compute_dtype="float32",
        moe=MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0),
        ema_decay=0.9,
    )
    tr1 = Trainer(
        cfg, init_clip_params(jax.random.PRNGKey(0), cfg), tc, log_fn=lambda *_: None
    )
    st1, _ = tr1.train_step(tr1.state, batch, jax.random.PRNGKey(0))

    mesh = get_mesh(8, axis_names=("data", "expert"), shape=(2, 4))
    tr = Trainer(
        cfg, init_clip_params(jax.random.PRNGKey(0), cfg), tc,
        mesh=mesh, log_fn=lambda *_: None,
    )
    ema_kern = tr.state.ema_params["clip"]["visual"]["blocks"][1]["moe"]["fc"]["kernel"]
    assert ema_kern.sharding.spec == P("expert", None, None)
    st, _ = tr.train_step(tr.state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(
            jax.device_get(
                st.ema_params["clip"]["visual"]["blocks"][1]["moe"]["fc"]["kernel"]
            )
        ),
        np.asarray(
            st1.ema_params["clip"]["visual"]["blocks"][1]["moe"]["fc"]["kernel"]
        ),
        atol=2e-6,
    )


def test_trainer_moe_patch_drop_runs(rng):
    """FLIP patch masking composes with the sparse vision tower (capacity is
    computed from the kept-token count inside the traced program)."""
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = _cfg()
    tc = TrainConfig(
        batch_size=8,
        epochs=1,
        freeze_layers=0,
        compute_dtype="float32",
        patch_drop=0.5,
        moe=MoEConfig(n_experts=2, router_k=2, capacity_factor=2.0),
    )
    tr = Trainer(
        cfg, init_clip_params(jax.random.PRNGKey(0), cfg), tc, log_fn=lambda *_: None
    )
    _, m = tr.train_step(tr.state, _train_batch(rng, cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["total_loss"]))


def test_trainer_moe_rejects_lora():
    import pytest

    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = _cfg()
    tc = TrainConfig(lora_rank=4, moe=MoEConfig(n_experts=2))
    with pytest.raises(ValueError, match="lora"):
        Trainer(
            cfg,
            init_clip_params(jax.random.PRNGKey(0), cfg),
            tc,
            log_fn=lambda *_: None,
        )


def test_moe_checkpoint_roundtrip_to_serving(rng, tmp_path):
    """Trainer saves a self-describing MoE checkpoint; load_orbax_checkpoint
    rebuilds (params, MoEConfig); EmbeddingEngine(moe=...) serves it — text
    and image features match the direct moe encode functions."""
    from evr_tpu.index.engine import EmbeddingEngine, load_orbax_checkpoint
    from evr_tpu.models.moe import encode_text_moe
    from evr_tpu.training.finetune import TrainConfig, Trainer

    cfg = _cfg()
    moe = MoEConfig(n_experts=4, router_k=2, capacity_factor=2.0)
    tc = TrainConfig(
        batch_size=8,
        epochs=1,
        compute_dtype="float32",
        save_dir=str(tmp_path),
        moe=moe,
    )
    tr = Trainer(
        cfg, init_clip_params(jax.random.PRNGKey(0), cfg), tc, log_fn=lambda *_: None
    )
    st, _ = tr.train_step(tr.state, _train_batch(rng, cfg), jax.random.PRNGKey(0))
    tr.state = st
    tr.save_checkpoint("best", epoch=0, metrics={"val_loss": 1.0})

    blob = load_orbax_checkpoint(tmp_path / "best")
    params, moe_loaded = blob["clip"], blob["moe"]
    assert moe_loaded == moe
    assert "moe" in params["visual"]["blocks"][1]

    # a dense engine must refuse the sparse checkpoint with guidance
    import pytest

    with pytest.raises(ValueError, match="MoE checkpoint"):
        EmbeddingEngine(
            cfg=cfg, compute_dtype=jnp.float32,
            tokenizer=lambda t, context_length: np.zeros(
                (len(t), context_length), np.int32
            ),
        ).load_finetuned(tmp_path / "best")

    engine = EmbeddingEngine(
        cfg=cfg, params=params, moe=moe_loaded, compute_dtype=jnp.float32,
        tokenizer=lambda texts, context_length: np.tile(
            np.arange(context_length, dtype=np.int32), (len(texts), 1)
        ),
    )
    feats = engine.encode_texts(["a dog", "a cat"])
    assert feats.shape == (2, cfg.embed_dim)
    toks = np.tile(np.arange(cfg.text.context_length, dtype=np.int32), (2, 1))
    direct = encode_text_moe(params, cfg, moe, jnp.asarray(toks))[0]
    direct = np.asarray(direct)
    direct = direct / np.linalg.norm(direct, axis=-1, keepdims=True)
    np.testing.assert_allclose(feats, direct, atol=1e-5)

    # image path: staged-u8 serving encode vs direct pixels encode
    s = cfg.vision.image_size
    imgs = rng.integers(0, 255, (2, s, s, 3)).astype(np.uint8)
    out = engine.encode_staged_images(imgs)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(out).all()


def test_moe_block_fused_attn_half_matches_xla(rng):
    """attn_impl='fused' routes the MoE block's attention half through the
    Pallas fused attention-half kernel (interpret mode off-TPU) — same
    output as the XLA composition, both modalities' shapes."""
    from evr_tpu.models.moe import init_moe_block, moe_block_apply

    width = 64
    moe = MoEConfig(n_experts=2, router_k=2, capacity_factor=2.0)
    p = init_moe_block(jax.random.PRNGKey(0), width, 2, moe.n_experts)
    for causal, T in ((False, 16), (True, 16)):
        x = jnp.asarray(rng.normal(size=(2, T, width)).astype(np.float32))
        y_xla, aux_xla = moe_block_apply(x, p, 4, moe, causal=causal, attn_impl="xla")
        y_f, aux_f = moe_block_apply(x, p, 4, moe, causal=causal, attn_impl="fused")
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_xla), atol=2e-5)
        np.testing.assert_allclose(float(aux_f), float(aux_xla), atol=1e-5)


def test_grouped_dispatch_matches_single_group_when_balanced(rng):
    """GShard token grouping (group_size): with ample capacity and k=2
    renormalised gates, per-group routing computes the same combine as
    one big group — outputs must match (routing is pointwise; only the
    slot bookkeeping is grouped). Also pins that the [.., E, C] dispatch
    tensors stay per-group sized: C is derived from S, not N."""
    import dataclasses as dc
    import math

    width = 64
    p = init_moe_mlp(jax.random.PRNGKey(0), width, 2, n_experts=4)
    x = jnp.asarray(rng.normal(size=(8, 32, width)).astype(np.float32))  # 256 tokens
    big = MoEConfig(n_experts=4, router_k=2, capacity_factor=4.0, group_size=256)
    small = dc.replace(big, group_size=64)  # 4 groups
    y_big, _ = moe_mlp_apply(x, p, big)
    y_small, aux_small = moe_mlp_apply(x, p, small)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_big), atol=2e-5)
    assert np.isfinite(float(aux_small))
    # capacity math: S=64 → C = ceil(4.0*2*64/4) = 128 > S → clamped to S
    S = 64
    C = min(S, math.ceil(small.capacity_factor * small.router_k * S / small.n_experts))
    assert C == 64
