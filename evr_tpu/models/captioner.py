"""Prefix captioner — the TPU-native caption model behind SCST (T7).

The reference RL-tunes LLaVA-1.5-7B with self-critical sequence training,
using CLIP cosine similarity x100 as the reward
(`Backend/sinhcaption.py:126-167` reward, `:172-222` greedy/sampled
generation, `:227-410` SCST loop). A 7B host-side VLM is not a TPU kernel
target; the TPU-native equivalent is a ClipCap-style *prefix captioner*: the
(frozen) CLIP image embedding is mapped to a learned prefix of decoder
tokens, and a small causal transformer LM over the CLIP BPE vocabulary
generates the caption. Sharing CLIP's vocabulary means generated token
buffers feed the CLIP text tower directly for the on-device reward — the
whole SCST step (greedy rollout, sampled rollout, reward, policy gradient)
is ONE jitted XLA program with static shapes.

Decoding is a `lax.scan` over a fixed-size token buffer (no Python loop, no
dynamic shapes) with a KV cache carried through the scan: the prefix rows
are prefilled once, then each step runs the decoder blocks on ONE new row
(`layers.block_apply_cached` — K/V appended via `dynamic_update_slice`,
scores masked to the causal window), so total decode block work is O(L)
rows instead of the O(L^2) full-buffer re-run per token. Both paths live
in the same single jitted program (no extra dispatches); `use_cache=False`
keeps the full re-run as the parity oracle (tested equal).

Generation semantics mirror the reference's `model.generate` call
(`sinhcaption.py:184-196`): greedy or sampled with top-k 50 / top-p 0.9,
`max_new_tokens` 30, early stop on EOT. If a rollout never emits EOT, the
final position is forced to EOT so CLIP's argmax-EOT pooling stays aligned
(the reference relies on HF's eos handling for the same invariant).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from evr_tpu.models.layers import (
    block_apply,
    block_apply_cached,
    init_block,
    init_linear,
    init_layer_norm,
    layer_norm,
    linear,
    quick_gelu,
)

Params = dict[str, Any]


@dataclass(frozen=True)
class CaptionerConfig:
    # CLIP BPE vocabulary (evr_tpu.tokenizer.bpe); SOT/EOT are the last ids.
    vocab_size: int = 49408
    sot_id: int = 49406
    eot_id: int = 49407
    # decoder transformer
    width: int = 512
    layers: int = 4
    heads: int = 8
    # ClipCap-style mapping: image embedding -> prefix_len soft tokens
    image_dim: int = 512
    prefix_len: int = 10
    # `max_new_tokens=30` in the reference generate call (sinhcaption.py:189)
    max_new_tokens: int = 30

    @property
    def buf_len(self) -> int:
        """Token buffer length: SOT + generated tokens."""
        return 1 + self.max_new_tokens

    @property
    def seq_len(self) -> int:
        return self.prefix_len + self.buf_len


def init_captioner_params(rng: jax.Array, cfg: CaptionerConfig) -> Params:
    k_map1, k_map2, k_tok, k_pos, k_blocks = jax.random.split(rng, 5)
    block_keys = jax.random.split(k_blocks, cfg.layers)
    return {
        # two-layer MLP mapping network (ClipCap's lightweight variant)
        "mapper": {
            "fc": init_linear(k_map1, cfg.image_dim, cfg.width * cfg.prefix_len),
            "proj": init_linear(
                k_map2, cfg.width * cfg.prefix_len, cfg.width * cfg.prefix_len
            ),
        },
        "token_embedding": (
            jax.random.normal(k_tok, (cfg.vocab_size, cfg.width), jnp.float32) * 0.02
        ),
        "pos_embedding": (
            jax.random.normal(k_pos, (cfg.seq_len, cfg.width), jnp.float32) * 0.01
        ),
        "blocks": [init_block(k, cfg.width, cfg.layers) for k in block_keys],
        "ln_final": init_layer_norm(cfg.width),
    }


def image_prefix(params: Params, cfg: CaptionerConfig, image_emb: jax.Array) -> jax.Array:
    """[B, image_dim] -> [B, prefix_len, width] soft-token prefix."""
    h = quick_gelu(linear(image_emb, params["mapper"]["fc"]))
    h = linear(h, params["mapper"]["proj"])
    return h.reshape(image_emb.shape[0], cfg.prefix_len, cfg.width)


def caption_logits(
    params: Params,
    cfg: CaptionerConfig,
    image_emb: jax.Array,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Teacher-forced decoder pass.

    tokens: [B, buf_len] int32, tokens[:, 0] == SOT.
    Returns logits [B, buf_len, vocab]; logits[:, i] predicts tokens[:, i+1]
    (the last position predicts the token after the buffer and is unused).
    Output head is weight-tied to the token embedding.
    """
    B, L = tokens.shape
    prefix = image_prefix(params, cfg, image_emb).astype(dtype)
    tok = params["token_embedding"].astype(dtype)[tokens]
    x = jnp.concatenate([prefix, tok], axis=1) + params["pos_embedding"].astype(dtype)
    for blk in params["blocks"]:
        x = block_apply(x, blk, cfg.heads, causal=True)
    x = layer_norm(x, params["ln_final"])
    out = x[:, cfg.prefix_len :]  # positions emitting predictions for t_1..t_L
    logits = out @ params["token_embedding"].astype(dtype).T
    return logits.astype(jnp.float32)


def token_logprobs(
    params: Params,
    cfg: CaptionerConfig,
    image_emb: jax.Array,
    tokens: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Teacher-forced log p(tokens[:, i]) for i >= 1. [B, buf_len-1]"""
    logits = caption_logits(params, cfg, image_emb, tokens, dtype)[:, :-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[:, :, 0]


def sequence_logprob(
    params: Params,
    cfg: CaptionerConfig,
    image_emb: jax.Array,
    tokens: jax.Array,
    valid: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Sum log p(tokens[:, 1:]) over valid generated positions. [B]"""
    picked = token_logprobs(params, cfg, image_emb, tokens, dtype)
    return jnp.sum(picked * valid[:, 1:].astype(jnp.float32), axis=-1)


def _sample_filtered(
    rng: jax.Array,
    logits: jax.Array,
    top_k: int,
    top_p: float,
    temperature: float,
) -> jax.Array:
    """Top-k + nucleus (top-p) sampling, matching the reference generate
    kwargs `top_k=50, top_p=0.9` (sinhcaption.py:186-188). Static shapes:
    top-k via threshold against the k-th logit, top-p via sorted cumulative
    probability mask."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive cumsum
        cutoff_logit = jnp.min(
            jnp.where(cum <= top_p, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def generate(
    params: Params,
    cfg: CaptionerConfig,
    image_emb: jax.Array,
    rng: jax.Array | None = None,
    sample: bool = False,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 0.9,
    dtype: jnp.dtype = jnp.float32,
    use_cache: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Decode captions for a batch of image embeddings.

    Returns (tokens [B, buf_len] int32, valid [B, buf_len] bool). tokens[:,0]
    is SOT; generation stops at EOT (which is included and marked valid, like
    HF's eos handling); positions after EOT are 0 (CLIP padding). A rollout
    that never emits EOT gets EOT forced into its final slot.

    ``use_cache=True`` (default) decodes incrementally with a per-block KV
    cache carried through the scan (`layers.block_apply_cached`): the prefix
    is prefilled once and each step runs the blocks on one new row. Same
    single jitted program, same numerics as the full re-run
    (``use_cache=False``, kept as the parity oracle — tested equal).
    """
    B = image_emb.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    buf0 = jnp.zeros((B, cfg.buf_len), jnp.int32).at[:, 0].set(cfg.sot_id)

    def pick_next(cur, sub):
        cur = cur.at[:, cfg.sot_id].set(-jnp.inf)  # never re-emit SOT
        if sample:
            nxt = _sample_filtered(sub, cur, top_k, top_p, temperature)
        else:
            nxt = jnp.argmax(cur, axis=-1)
        return nxt.astype(jnp.int32)

    if use_cache:
        H, W = cfg.heads, cfg.width
        hd = W // H
        emb = params["token_embedding"].astype(dtype)
        pos_emb = params["pos_embedding"].astype(dtype)

        # prefill: prefix soft tokens fill cache rows 0..prefix_len-1
        x = image_prefix(params, cfg, image_emb).astype(dtype)
        x = x + pos_emb[: cfg.prefix_len]
        caches = []
        for blk in params["blocks"]:
            kc = jnp.zeros((B, cfg.seq_len, H, hd), dtype)
            vc = jnp.zeros((B, cfg.seq_len, H, hd), dtype)
            x, kc, vc = block_apply_cached(x, blk, H, kc, vc, 0)
            caches.append((kc, vc))

        def step(carry, i):
            buf, done, key, caches = carry
            key, sub = jax.random.split(key)
            tok = jax.lax.dynamic_index_in_dim(buf, i, axis=1, keepdims=False)
            p_abs = cfg.prefix_len + i  # absolute position of buf[:, i]
            x = emb[tok][:, None, :] + jax.lax.dynamic_slice_in_dim(
                pos_emb, p_abs, 1, axis=0
            )
            new_caches = []
            for blk, (kc, vc) in zip(params["blocks"], caches):
                x, kc, vc = block_apply_cached(x, blk, cfg.heads, kc, vc, p_abs)
                new_caches.append((kc, vc))
            h = layer_norm(x, params["ln_final"])[:, 0]
            cur = (h @ emb.T).astype(jnp.float32)
            nxt = pick_next(cur, sub)
            emitted = jnp.where(done, 0, nxt)  # pad after EOT
            buf = jax.lax.dynamic_update_index_in_dim(buf, emitted, i + 1, axis=1)
            valid_here = ~done
            done = done | (nxt == cfg.eot_id)
            return (buf, done, key, tuple(new_caches)), valid_here

        (buf, done, _, _), valid_steps = jax.lax.scan(
            step,
            (buf0, jnp.zeros((B,), jnp.bool_), rng, tuple(caches)),
            jnp.arange(cfg.max_new_tokens),
        )
    else:

        def step(carry, i):
            buf, done, key = carry
            key, sub = jax.random.split(key)
            logits = caption_logits(params, cfg, image_emb, buf, dtype)
            cur = jnp.take_along_axis(logits, jnp.full((B, 1, 1), i), axis=1)[:, 0]
            nxt = pick_next(cur, sub)
            emitted = jnp.where(done, 0, nxt)  # pad after EOT
            buf = jax.lax.dynamic_update_index_in_dim(buf, emitted, i + 1, axis=1)
            valid_here = ~done
            done = done | (nxt == cfg.eot_id)
            return (buf, done, key), valid_here

        (buf, done, _), valid_steps = jax.lax.scan(
            step,
            (buf0, jnp.zeros((B,), jnp.bool_), rng),
            jnp.arange(cfg.max_new_tokens),
        )
    # force EOT into the last slot for rollouts that never stopped, so CLIP's
    # argmax-EOT pooling finds a pool position
    last = buf[:, -1]
    buf = buf.at[:, -1].set(jnp.where(done, last, cfg.eot_id))
    valid = jnp.concatenate(
        [jnp.ones((B, 1), jnp.bool_), valid_steps.T], axis=1
    )
    return buf, valid


def beam_search(
    params: Params,
    cfg: CaptionerConfig,
    image_emb: jax.Array,
    beam_size: int = 4,
    length_penalty: float = 0.0,
    dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Beam-search caption decoding (KV-cached, static shapes).

    Goes beyond the reference's greedy/sampled `model.generate` call
    (`Backend/sinhcaption.py:184-196`): maintains ``beam_size`` hypotheses
    per image inside one `lax.scan` — per step, every live beam proposes
    its token distribution, the top-``beam_size`` of the K·V joint
    candidates survive, and the per-block KV caches are re-gathered to the
    surviving beams' parents. Finished beams (EOT emitted) are frozen and
    compete with a single stay-done candidate so shapes stay static.

    Returns ``(tokens [B, buf_len] int32, score [B] fp32)`` — the best
    beam per image and its score: summed token logprob, divided by
    ``length**length_penalty`` (GNMT-style) when ``length_penalty > 0``.
    ``beam_size=1`` reproduces greedy `generate` exactly (tested).

    A best-finished register shadows the frontier: every hypothesis records
    its (penalised) score the step it emits EOT, so a finished hypothesis
    transiently evicted from the top-K by live prefixes (whose scores can
    only fall as they extend) is never lost — the final answer is the max
    of the register and the surviving frontier.
    """
    B = image_emb.shape[0]
    K = beam_size
    H, W = cfg.heads, cfg.width
    hd = W // H
    V = cfg.vocab_size
    emb = params["token_embedding"].astype(dtype)
    pos_emb = params["pos_embedding"].astype(dtype)
    NEG = jnp.float32(-1e9)

    # prefill the image prefix once per image, then broadcast caches to beams
    x = image_prefix(params, cfg, image_emb).astype(dtype) + pos_emb[: cfg.prefix_len]
    caches = []
    for blk in params["blocks"]:
        kc = jnp.zeros((B, cfg.seq_len, H, hd), dtype)
        vc = jnp.zeros((B, cfg.seq_len, H, hd), dtype)
        x, kc, vc = block_apply_cached(x, blk, H, kc, vc, 0)
        # [B, T, H, d] -> [B*K, T, H, d] (beam-major per image)
        caches.append(
            tuple(
                jnp.repeat(c, K, axis=0) for c in (kc, vc)
            )
        )

    buf0 = jnp.zeros((B, K, cfg.buf_len), jnp.int32).at[:, :, 0].set(cfg.sot_id)
    # only beam 0 is live at the start (all beams hold the identical SOT
    # prefix; keeping duplicates would waste the beam on K copies)
    logp0 = jnp.full((B, K), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
    done0 = jnp.zeros((B, K), jnp.bool_)
    lens0 = jnp.zeros((B, K), jnp.int32)  # generated tokens incl. EOT
    fin_score0 = jnp.full((B,), -jnp.inf, jnp.float32)
    fin_toks0 = jnp.zeros((B, cfg.buf_len), jnp.int32)

    def penalise(raw, length):
        if length_penalty > 0.0:
            return raw / jnp.maximum(length, 1).astype(jnp.float32) ** length_penalty
        return raw

    def step(carry, i):
        buf, logp, done, lens, fin_score, fin_toks, caches = carry
        tok = jax.lax.dynamic_index_in_dim(buf, i, axis=2, keepdims=False)  # [B, K]
        p_abs = cfg.prefix_len + i
        xx = emb[tok.reshape(B * K)][:, None, :] + jax.lax.dynamic_slice_in_dim(
            pos_emb, p_abs, 1, axis=0
        )
        new_caches = []
        for blk, (kc, vc) in zip(params["blocks"], caches):
            xx, kc, vc = block_apply_cached(xx, blk, H, kc, vc, p_abs)
            new_caches.append((kc, vc))
        h = layer_norm(xx, params["ln_final"])[:, 0]
        logits = (h @ emb.T).astype(jnp.float32).reshape(B, K, V)
        # true token logprobs (full-vocab normalisation, so accumulated beam
        # scores equal sequence_logprob of the returned tokens); the SOT ban
        # is a selection-time mask, not a renormalisation
        step_logp = jax.nn.log_softmax(logits, axis=-1)
        step_logp = step_logp.at[:, :, cfg.sot_id].set(-jnp.inf)

        # live beams propose all V continuations; done beams propose exactly
        # one frozen candidate (token 0 pad at unchanged score)
        cand = jnp.where(done[:, :, None], NEG, logp[:, :, None] + step_logp)
        frozen = jnp.where(done, logp, NEG)  # [B, K]
        cand = cand.at[:, :, 0].max(frozen)  # pad-token slot carries the frozen beam
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # [B, K]
        parent = top_idx // V  # [B, K] source beam
        token = (top_idx % V).astype(jnp.int32)  # [B, K]

        parent_done = jnp.take_along_axis(done, parent, axis=1)
        token = jnp.where(parent_done, 0, token)  # frozen beams stay padded
        new_done = parent_done | (token == cfg.eot_id)
        new_lens = jnp.take_along_axis(lens, parent, axis=1) + jnp.where(
            parent_done, 0, 1
        )

        buf = jnp.take_along_axis(buf, parent[:, :, None], axis=1)
        buf = jax.lax.dynamic_update_index_in_dim(buf, token, i + 1, axis=2)

        # re-gather each block's caches to the surviving beams' parents
        gather = (jnp.arange(B)[:, None] * K + parent).reshape(B * K)
        new_caches = tuple(
            (kc[gather], vc[gather]) for kc, vc in new_caches
        )

        # record hypotheses finishing THIS step in the best-finished register
        newly = new_done & ~parent_done  # [B, K]
        pen = penalise(top_scores, new_lens)
        cand_fin = jnp.where(newly, pen, -jnp.inf)  # [B, K]
        k_best = jnp.argmax(cand_fin, axis=1)  # [B]
        v_best = jnp.take_along_axis(cand_fin, k_best[:, None], axis=1)[:, 0]
        row = jnp.take_along_axis(buf, k_best[:, None, None], axis=1)[:, 0]
        improve = v_best > fin_score
        fin_score = jnp.where(improve, v_best, fin_score)
        fin_toks = jnp.where(improve[:, None], row, fin_toks)

        return (
            buf, top_scores, new_done, new_lens, fin_score, fin_toks,
            new_caches,
        ), None

    (buf, logp, done, lens, fin_score, fin_toks, _), _ = jax.lax.scan(
        step,
        (buf0, logp0, done0, lens0, fin_score0, fin_toks0, tuple(caches)),
        jnp.arange(cfg.max_new_tokens),
    )

    # force EOT into the final slot of never-finished beams (argmax-EOT
    # pooling invariant, same as generate())
    last = buf[:, :, -1]
    buf = buf.at[:, :, -1].set(jnp.where(done, last, cfg.eot_id))
    lens = jnp.where(done, lens, lens + 1)

    score = penalise(logp, lens)
    best = jnp.argmax(score, axis=1)  # [B]
    tokens = jnp.take_along_axis(buf, best[:, None, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]

    # the register wins when the frontier lost a better finished hypothesis
    from_reg = fin_score > best_score
    tokens = jnp.where(from_reg[:, None], fin_toks, tokens)
    best_score = jnp.where(from_reg, fin_score, best_score)
    return tokens, best_score


def tokens_to_context(
    tokens: jax.Array, context_length: int = 77, eot_id: int | None = None
) -> jax.Array:
    """Pad (or truncate) a captioner buffer [B, buf_len] to CLIP's [B, 77]
    text context. When truncating, the last position is forced to EOT —
    like the tokenizer's truncate path — so argmax-EOT pooling never lands
    on a random token (argmax returns the FIRST max, so a second EOT after
    an earlier natural one is harmless)."""
    B, L = tokens.shape
    if L >= context_length:
        out = tokens[:, :context_length]
        if L > context_length and eot_id is not None:
            out = out.at[:, -1].set(eot_id)
        return out
    pad = jnp.zeros((B, context_length - L), jnp.int32)
    return jnp.concatenate([tokens, pad], axis=1)


def decode_tokens(tokenizer, tokens, eot_id: int) -> list[str]:
    """Decode generated buffers [B, buf_len] to text: drop SOT, cut each row
    at its first EOT (id 0 is a real BPE token — '!' — so filtering zeros
    would corrupt captions; padding only ever FOLLOWS the EOT)."""
    import numpy as np

    out = []
    for row in np.asarray(tokens):
        body = row[1:]
        hits = np.nonzero(body == eot_id)[0]
        end = int(hits[0]) if hits.size else len(body)
        out.append(tokenizer.decode([int(t) for t in body[:end]]).strip())
    return out
