"""SCST caption-RL tests (T7 — `Backend/sinhcaption.py`).

Covers the prefix captioner's scan decoder (shapes, EOT semantics, logprob
correctness, sampling filters) and the SCST/XE training loops (reward
improves, loss falls, checkpoint round trip). Runs on tiny towers on the
CPU mesh like every other training test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evr_tpu.models.captioner import (
    CaptionerConfig,
    caption_logits,
    generate,
    init_captioner_params,
    sequence_logprob,
    tokens_to_context,
)
from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig, init_clip_params
from evr_tpu.training.scst import (
    ScstConfig,
    ScstTrainer,
    _valid_from_tokens,
    clip_text_reward,
    encode_captions,
    xe_caption_loss,
)

VOCAB = 64
SOT, EOT = 62, 63

CAP_CFG = CaptionerConfig(
    vocab_size=VOCAB,
    sot_id=SOT,
    eot_id=EOT,
    width=32,
    layers=1,
    heads=2,
    image_dim=16,
    prefix_len=3,
    max_new_tokens=6,
)

CLIP_CFG = CLIPConfig(
    embed_dim=16,
    vision=VisionConfig(32, 8, 32, 1, 2),
    text=TextConfig(context_length=16, vocab_size=VOCAB, width=32, layers=1, heads=2),
)


@pytest.fixture(scope="module")
def cap_params():
    return init_captioner_params(jax.random.PRNGKey(0), CAP_CFG)


@pytest.fixture(scope="module")
def clip_params():
    return init_clip_params(jax.random.PRNGKey(1), CLIP_CFG)


def _features(n, seed=2):
    f = jax.random.normal(jax.random.PRNGKey(seed), (n, CAP_CFG.image_dim))
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def test_generate_greedy_shapes_and_eot(cap_params):
    toks, valid = generate(cap_params, CAP_CFG, _features(4), sample=False)
    assert toks.shape == (4, CAP_CFG.buf_len)
    assert valid.shape == toks.shape
    assert bool(jnp.all(toks[:, 0] == SOT))
    # every rollout contains exactly one EOT (natural or forced at the end)
    assert bool(jnp.all(jnp.sum(toks == EOT, axis=1) == 1))
    # SOT never re-emitted
    assert bool(jnp.all(jnp.sum(toks == SOT, axis=1) == 1))
    # after EOT: zero padding, and valid mask off
    toks_np, valid_np = np.asarray(toks), np.asarray(valid)
    for row, vrow in zip(toks_np, valid_np):
        eot_pos = int(np.argmax(row == EOT))
        assert (row[eot_pos + 1 :] == 0).all()
        if eot_pos < CAP_CFG.buf_len - 1:  # natural stop → trailing invalid
            assert not vrow[eot_pos + 1 :].any()
        assert vrow[: eot_pos + 1].all() or eot_pos == CAP_CFG.buf_len - 1


def test_generate_deterministic_greedy(cap_params):
    t1, _ = generate(cap_params, CAP_CFG, _features(3), sample=False)
    t2, _ = generate(cap_params, CAP_CFG, _features(3), sample=False)
    assert bool(jnp.all(t1 == t2))


def test_topk1_sampling_matches_greedy(cap_params):
    greedy, _ = generate(cap_params, CAP_CFG, _features(3), sample=False)
    sampled, _ = generate(
        cap_params,
        CAP_CFG,
        _features(3),
        rng=jax.random.PRNGKey(7),
        sample=True,
        top_k=1,
        top_p=0.0,
    )
    assert bool(jnp.all(greedy == sampled))


def test_kv_cache_matches_full_rerun_greedy(cap_params):
    """The KV-cached scan decoder (default) must reproduce the full-buffer
    re-run decode exactly: same greedy tokens AND same valid mask."""
    feats = _features(5)
    t_cache, v_cache = generate(cap_params, CAP_CFG, feats, sample=False)
    t_full, v_full = generate(
        cap_params, CAP_CFG, feats, sample=False, use_cache=False
    )
    assert bool(jnp.all(t_cache == t_full))
    assert bool(jnp.all(v_cache == v_full))


def test_kv_cache_matches_full_rerun_sampled(cap_params):
    """Same rng → same filtered-sampling trajectory on both decode paths
    (logits agree to float eps, so the categorical draws coincide)."""
    feats = _features(4)
    kw = dict(rng=jax.random.PRNGKey(11), sample=True, top_k=8, top_p=0.9)
    t_cache, _ = generate(cap_params, CAP_CFG, feats, **kw)
    t_full, _ = generate(cap_params, CAP_CFG, feats, use_cache=False, **kw)
    assert bool(jnp.all(t_cache == t_full))


def test_block_apply_cached_matches_block_apply():
    """Incremental cached block == full causal block, row for row, under
    arbitrary prefill/step splits."""
    from evr_tpu.models.layers import block_apply, block_apply_cached, init_block

    H, W, T, B = 2, 32, 9, 3
    blk = init_block(jax.random.PRNGKey(3), W, 1)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, W), jnp.float32)
    ref = block_apply(x, blk, H, causal=True)

    kc = jnp.zeros((B, T, H, W // H), jnp.float32)
    vc = jnp.zeros_like(kc)
    outs = []
    pos = 0
    for size in (4, 1, 1, 3):  # prefill 4 rows, two single steps, a 3-row tail
        y, kc, vc = block_apply_cached(x[:, pos : pos + size], blk, H, kc, vc, pos)
        outs.append(y)
        pos += size
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_beam_size_1_matches_greedy(cap_params):
    from evr_tpu.models.captioner import beam_search

    feats = _features(4)
    greedy, _ = generate(cap_params, CAP_CFG, feats, sample=False)
    beamed, _ = beam_search(cap_params, CAP_CFG, feats, beam_size=1)
    assert bool(jnp.all(greedy == beamed))


def test_beam_search_score_consistent_and_beats_greedy(cap_params):
    """The returned score must equal the teacher-forced logprob of the
    returned tokens, and a 4-beam search must score >= greedy (deterministic
    for fixed params)."""
    from evr_tpu.models.captioner import beam_search
    from evr_tpu.training.scst import _valid_from_tokens

    feats = _features(5)
    toks, score = beam_search(cap_params, CAP_CFG, feats, beam_size=4)
    valid = _valid_from_tokens(toks, CAP_CFG.eot_id)
    recomputed = sequence_logprob(cap_params, CAP_CFG, feats, toks, valid)
    # a rollout that never emits EOT gets one FORCED into its last slot,
    # which the beam never scored — restrict the exact check to rows whose
    # EOT is provably natural (i.e. not sitting in the final slot)
    natural = np.asarray(toks[:, -1] != CAP_CFG.eot_id)
    if natural.any():
        np.testing.assert_allclose(
            np.asarray(score)[natural],
            np.asarray(recomputed)[natural],
            rtol=1e-4,
            atol=1e-4,
        )

    # greedy via the same machinery (beam_size=1) has identical score
    # semantics, so the comparison is apples-to-apples
    _, g_score = beam_search(cap_params, CAP_CFG, feats, beam_size=1)
    assert bool(jnp.all(score >= np.asarray(g_score) - 1e-5))


def test_beam_score_monotone_in_beam_size(cap_params):
    """Empirical regression pin: on this fixed model, widening the beam
    improves (or ties) the best score. (Beam search is NOT guaranteed
    monotone in width in general — a wider frontier can evict a prefix a
    narrower beam would have kept — so this pins observed behaviour, it
    does not assert a theorem.)"""
    from evr_tpu.models.captioner import beam_search

    feats = _features(4)
    scores = []
    for k in (1, 2, 4):
        _, s = beam_search(cap_params, CAP_CFG, feats, beam_size=k)
        scores.append(np.asarray(s))
    assert bool((scores[1] >= scores[0] - 1e-5).all())
    assert bool((scores[2] >= scores[1] - 1e-5).all())


def test_beam_search_eot_invariants(cap_params):
    from evr_tpu.models.captioner import beam_search

    toks, _ = beam_search(cap_params, CAP_CFG, _features(4), beam_size=3)
    assert toks.shape == (4, CAP_CFG.buf_len)
    assert bool(jnp.all(toks[:, 0] == SOT))
    assert bool(jnp.all(jnp.sum(toks == EOT, axis=1) == 1))
    assert bool(jnp.all(jnp.sum(toks == SOT, axis=1) == 1))
    toks_np = np.asarray(toks)
    for row in toks_np:
        eot_pos = int(np.argmax(row == EOT))
        assert (row[eot_pos + 1 :] == 0).all()


def test_sequence_logprob_matches_manual(cap_params):
    feats = _features(2)
    toks, valid = generate(
        cap_params, CAP_CFG, feats, rng=jax.random.PRNGKey(3), sample=True
    )
    lp = sequence_logprob(cap_params, CAP_CFG, feats, toks, valid)
    logits = caption_logits(cap_params, CAP_CFG, feats, toks)[:, :-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    manual = np.zeros(2)
    toks_np, valid_np = np.asarray(toks), np.asarray(valid)
    for b in range(2):
        for i in range(1, CAP_CFG.buf_len):
            if valid_np[b, i]:
                manual[b] += float(logp[b, i - 1, toks_np[b, i]])
    np.testing.assert_allclose(np.asarray(lp), manual, rtol=1e-5)


def test_reward_range_and_pooling(cap_params, clip_params):
    feats = _features(4)
    toks, _ = generate(cap_params, CAP_CFG, feats, sample=False)
    r = clip_text_reward(clip_params, CLIP_CFG, feats, toks)
    assert r.shape == (4,)
    assert bool(jnp.all(r >= 0.0)) and bool(jnp.all(r <= 100.0))
    # the 77-context padding keeps EOT the argmax id for pooling
    ctx = tokens_to_context(toks, CLIP_CFG.text.context_length)
    assert bool(jnp.all(jnp.max(ctx, axis=1) == EOT))


def test_valid_from_tokens():
    toks = jnp.asarray([[SOT, 5, EOT, 0, 0], [SOT, 1, 2, 3, EOT]], jnp.int32)
    valid = _valid_from_tokens(toks, EOT)
    np.testing.assert_array_equal(
        np.asarray(valid),
        [[True, True, True, False, False], [True, True, True, True, True]],
    )


def test_encode_captions_buffers():
    bufs = encode_captions(["a dog", "violence in the street scene"], CAP_CFG)
    assert bufs.shape == (2, CAP_CFG.buf_len)
    # default tokenizer uses the real CLIP id space; buffers for the real
    # config must carry SOT first and one EOT
    real_cfg = CaptionerConfig()
    bufs = encode_captions(["a dog", "x"], real_cfg)
    assert (bufs[:, 0] == real_cfg.sot_id).all()
    assert ((bufs == real_cfg.eot_id).sum(axis=1) == 1).all()


def test_xe_pretraining_reduces_loss(clip_params):
    rng = jax.random.PRNGKey(5)
    trainer = ScstTrainer(
        clip_params,
        CLIP_CFG,
        cap_cfg=CAP_CFG,
        cfg=ScstConfig(lr=5e-3, batch_size=8),
        rng=rng,
    )
    feats = np.asarray(_features(8, seed=11))
    toks = np.zeros((8, CAP_CFG.buf_len), np.int32)
    toks[:, 0] = SOT
    toks[:, 1] = np.arange(8) % 60  # one distinct target token per image
    toks[:, 2] = EOT
    losses = trainer.pretrain_xe(feats, toks, epochs=40)
    assert losses[-1] < losses[0] * 0.5


def test_scst_improves_greedy_reward(clip_params):
    cfg = ScstConfig(lr=2e-3, advantage_scale=1.0, batch_size=16, top_k=0, top_p=0.0)
    trainer = ScstTrainer(
        clip_params, CLIP_CFG, cap_cfg=CAP_CFG, cfg=cfg, rng=jax.random.PRNGKey(9)
    )
    feats = np.asarray(_features(16, seed=21))
    before = trainer.mean_greedy_reward(feats)
    trainer.fit(feats, val_features=feats, epochs=25, rng=jax.random.PRNGKey(10))
    after = trainer.mean_greedy_reward(feats)
    assert after > before, (before, after)
    assert trainer.history and "val_reward" in trainer.history[-1]


def test_scst_target_reward_early_stop(clip_params):
    cfg = ScstConfig(batch_size=4, target_reward=-1.0)  # trivially reached
    trainer = ScstTrainer(
        clip_params, CLIP_CFG, cap_cfg=CAP_CFG, cfg=cfg, rng=jax.random.PRNGKey(12)
    )
    feats = np.asarray(_features(4, seed=31))
    history = trainer.fit(feats, val_features=feats, epochs=10)
    assert len(history) == 1  # stopped after the first epoch


def test_scst_checkpoint_roundtrip(clip_params, tmp_path):
    cfg = ScstConfig(batch_size=4, save_dir=str(tmp_path))
    trainer = ScstTrainer(
        clip_params, CLIP_CFG, cap_cfg=CAP_CFG, cfg=cfg, rng=jax.random.PRNGKey(13)
    )
    feats = np.asarray(_features(4, seed=41))
    trainer.fit(feats, epochs=1)
    toks_before, _ = generate(trainer.params, CAP_CFG, jnp.asarray(feats))
    trainer.save_checkpoint("scst_final")
    fresh = ScstTrainer(
        clip_params, CLIP_CFG, cap_cfg=CAP_CFG, cfg=cfg, rng=jax.random.PRNGKey(99)
    )
    fresh.restore_checkpoint("scst_final")
    toks_after, _ = generate(fresh.params, CAP_CFG, jnp.asarray(feats))
    assert bool(jnp.all(toks_before == toks_after))


def test_xe_loss_ignores_padding(clip_params, cap_params):
    feats = _features(2)
    toks = jnp.asarray(
        [[SOT, 5, EOT, 0, 0, 0, 0], [SOT, 5, EOT, 0, 0, 0, 0]], jnp.int32
    )
    valid = _valid_from_tokens(toks, EOT)
    l1 = xe_caption_loss(cap_params, CAP_CFG, feats, toks, valid)
    # change padding content only — loss must not move
    toks2 = toks.at[:, 4].set(9)
    valid2 = _valid_from_tokens(toks2, EOT)
    l2 = xe_caption_loss(cap_params, CAP_CFG, feats, toks2, valid2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_train_captioner_cli(tmp_path):
    from evr_tpu.tools import train_captioner

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, 512)).astype(np.float32)
    np.save(tmp_path / "emb.npy", feats)
    (tmp_path / "caps.json").write_text(
        '["a dog", "a cat", "a car", "a tree", "a road", "a man", "a dog", "a cat"]'
    )
    train_captioner.main(
        [
            "--embeddings", str(tmp_path / "emb.npy"),
            "--captions", str(tmp_path / "caps.json"),
            "--xe-epochs", "1",
            "--scst-epochs", "1",
            "--batch-size", "4",
            "--max-new-tokens", "4",
            "--prefix-len", "2",
            "--cap-width", "64",
            "--cap-layers", "1",
            "--cap-heads", "2",
            "--save-dir", str(tmp_path / "ckpt"),
            "--demo", "2",
            "--beam-size", "2",
        ]
    )
    assert (tmp_path / "ckpt" / "history.json").exists()
    assert (tmp_path / "ckpt" / "scst_final").exists()


def test_decode_tokens_keeps_id0_and_cuts_at_eot():
    from evr_tpu.models.captioner import decode_tokens

    class Tok:
        def decode(self, ids):
            return "-".join(str(i) for i in ids)

    toks = jnp.asarray([[SOT, 5, 0, 7, EOT, 0, 0]], jnp.int32)
    # id 0 INSIDE the caption ('!' in the real vocab) must survive; padding
    # after EOT must not
    assert decode_tokens(Tok(), toks, EOT) == ["5-0-7"]


def test_tokens_to_context_truncation_forces_eot():
    long_toks = jnp.asarray([[SOT] + [5] * 18 + [EOT]], jnp.int32)  # len 20
    ctx = tokens_to_context(long_toks, 16, eot_id=EOT)
    assert ctx.shape == (1, 16)
    assert int(ctx[0, -1]) == EOT  # pooling position preserved
    # no-truncation path unchanged
    short = jnp.asarray([[SOT, 5, EOT]], jnp.int32)
    ctx2 = tokens_to_context(short, 16, eot_id=EOT)
    assert int(jnp.argmax(ctx2[0])) == 2


def test_fit_empty_train_raises(clip_params):
    trainer = ScstTrainer(
        clip_params, CLIP_CFG, cap_cfg=CAP_CFG, cfg=ScstConfig(batch_size=4)
    )
    with pytest.raises(ValueError, match="at least one"):
        trainer.fit(np.zeros((0, CAP_CFG.image_dim), np.float32))


def test_cli_rejects_overlong_captions(tmp_path):
    from evr_tpu.tools import train_captioner

    np.save(tmp_path / "e.npy", np.zeros((4, 512), np.float32))
    with pytest.raises(SystemExit, match="overflows"):
        train_captioner.main(
            ["--embeddings", str(tmp_path / "e.npy"), "--max-new-tokens", "99"]
        )
