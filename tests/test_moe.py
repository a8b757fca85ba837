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
