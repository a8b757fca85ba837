"""TPU-native Whisper-architecture speech recognition (voice search).

Parity target: the reference's voice-search route ships every recording out
to AssemblyAI over the network with a hardcoded API key
(`Backend/app.py:766-850`). A zero-egress TPU deployment needs transcription
*on the chip*: this module implements the Whisper encoder-decoder
(arXiv 2212.04356) in the same pure-functional params-pytree style as the
CLIP towers, so the whole pipeline — log-mel frontend, audio encoder,
KV-cached greedy decode — is ONE jittable XLA program with static shapes.

Pieces:

- ``log_mel_spectrogram`` — jittable STFT → slaney-mel → log10 → (x+4)/4
  frontend, numerically matching HF ``WhisperFeatureExtractor`` (center
  reflect padding, periodic Hann, power-2 spectrum, last-frame drop,
  max−8 dynamic-range clamp). Mel filters are built host-side once
  (``mel_filter_bank``, the librosa slaney/slaney algorithm) and passed in
  as a constant.
- ``encoder_forward`` / ``decoder_forward`` — pre-LN transformer blocks with
  erf-GELU (Whisper uses exact GELU, not CLIP's quickGELU), separate
  q/k/v projections (k has no bias), conv1d×2 audio stem, sinusoidal
  encoder positions, learned decoder positions, tied output projection.
- ``greedy_decode`` — one ``lax.scan`` over the token buffer with per-layer
  self-attention K/V caches (rows appended via ``dynamic_update_slice``)
  and cross-attention K/V precomputed once from the encoder output — the
  same O(T) decode design as ``models/captioner.py``. Forced prompt tokens
  (SOT / language / task) are consumed positionally inside the same scan.
- ``from_hf_whisper_state_dict`` — converts any HF Whisper checkpoint
  (tiny … large-v3) into the pytree; ``WHISPER_SIZES`` carries the
  published geometries.

Weights and the Whisper BPE tokenizer are deployment assets (this image is
zero-egress and has neither); ``serving.providers.LocalWhisperTranscriber``
gates on them and the route answers 501 when absent, exactly like the other
pluggable annotators.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from evr_tpu.models.layers import (
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)

Params = dict[str, Any]


@dataclass(frozen=True)
class WhisperConfig:
    """Geometry of one Whisper variant (field names follow HF WhisperConfig)."""

    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_heads: int = 6
    decoder_layers: int = 4
    decoder_heads: int = 6
    ffn_dim: int = 1536  # same for encoder and decoder in every published size
    max_source_positions: int = 1500  # after the stride-2 conv: 30 s / 20 ms
    max_target_positions: int = 448
    # audio frontend (fixed across all published sizes)
    sampling_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    chunk_length: int = 30  # seconds per window
    # special token ids (multilingual layout; -1 disables eos-stop in decode)
    eos_id: int = 50257
    sot_id: int = 50258

    @property
    def n_samples(self) -> int:
        return self.chunk_length * self.sampling_rate

    @property
    def n_frames(self) -> int:
        return self.n_samples // self.hop_length


#: Published Whisper geometries (vocab 51865 = multilingual v1/v2 layout;
#: large-v3 uses 51866 and 128 mel bins).
WHISPER_SIZES: dict[str, WhisperConfig] = {
    "tiny": WhisperConfig(d_model=384, encoder_layers=4, decoder_layers=4,
                          encoder_heads=6, decoder_heads=6, ffn_dim=1536),
    "base": WhisperConfig(d_model=512, encoder_layers=6, decoder_layers=6,
                          encoder_heads=8, decoder_heads=8, ffn_dim=2048),
    "small": WhisperConfig(d_model=768, encoder_layers=12, decoder_layers=12,
                           encoder_heads=12, decoder_heads=12, ffn_dim=3072),
    "medium": WhisperConfig(d_model=1024, encoder_layers=24, decoder_layers=24,
                            encoder_heads=16, decoder_heads=16, ffn_dim=4096),
    "large-v2": WhisperConfig(d_model=1280, encoder_layers=32, decoder_layers=32,
                              encoder_heads=20, decoder_heads=20, ffn_dim=5120),
    "large-v3": WhisperConfig(vocab_size=51866, num_mel_bins=128, d_model=1280,
                              encoder_layers=32, decoder_layers=32,
                              encoder_heads=20, decoder_heads=20, ffn_dim=5120,
                              eos_id=50257, sot_id=50258),
    # CPU-runnable smoke geometry (CLI/tests), same convention as the CLIP
    # registry's "ViT-Tiny-Test" (models/variants.py).
    "tiny-test": WhisperConfig(vocab_size=128, num_mel_bins=8, d_model=32,
                               encoder_layers=2, decoder_layers=2,
                               encoder_heads=2, decoder_heads=2, ffn_dim=64,
                               max_source_positions=24, max_target_positions=16,
                               sampling_rate=1600, n_fft=64, hop_length=100,
                               chunk_length=3, eos_id=2, sot_id=1),
}


# -- log-mel frontend -------------------------------------------------------


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = math.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        f / (200.0 / 3),
    )


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = math.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        m * (200.0 / 3),
    )


def mel_filter_bank(
    n_freqs: int,
    n_mels: int,
    sampling_rate: int,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
) -> np.ndarray:
    """[n_mels, n_freqs] slaney-scale slaney-normalised triangular filters.

    Identical math to librosa ``filters.mel(htk=False, norm='slaney')`` /
    HF ``transformers.audio_utils.mel_filter_bank(mel_scale='slaney',
    norm='slaney')``, which is what the official Whisper checkpoints were
    trained against.
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(min_frequency)),
        _hz_to_mel_slaney(np.array(max_frequency)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(
    audio: jax.Array, filters: jax.Array, n_fft: int, hop_length: int
) -> jax.Array:
    """[B, S] fp32 waveform → [B, n_mels, S//hop] Whisper log-mel features.

    Matches HF ``WhisperFeatureExtractor._np_extract_fbank_features``:
    center reflect-pad by n_fft//2, periodic Hann, |rfft|², mel projection
    with 1e-10 floor, log10, per-example max−8 clamp, (x+4)/4.
    """
    audio = audio.astype(jnp.float32)
    B, S = audio.shape
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = S // hop_length  # center=True gives 1 + S//hop; last dropped
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # [B, F, n_fft]
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2  # [B, F, n_freqs]
    mel = jnp.einsum("bfk,mk->bmf", power, filters.astype(jnp.float32))
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, n_samples: int) -> np.ndarray:
    """Whisper's fixed 30 s window: zero-pad or truncate the waveform."""
    if audio.shape[-1] >= n_samples:
        return audio[..., :n_samples]
    pad = n_samples - audio.shape[-1]
    return np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])


# -- parameters --------------------------------------------------------------


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions: [sin | cos] concat layout."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


def _init_mha(rng, width: int, bias_k: bool = False) -> Params:
    kq, kk, kv, ko = jax.random.split(rng, 4)
    std = width**-0.5
    p = {
        "q": init_linear(kq, width, width, std=std),
        "k": init_linear(kk, width, width, std=std),
        "v": init_linear(kv, width, width, std=std),
        "out": init_linear(ko, width, width, std=std),
    }
    if not bias_k:
        del p["k"]["bias"]  # Whisper's k_proj has no bias
    return p


def _init_mlp(rng, width: int, ffn: int) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": init_linear(k1, width, ffn, std=width**-0.5),
        "fc2": init_linear(k2, ffn, width, std=ffn**-0.5),
    }


def init_whisper_params(rng: jax.Array, cfg: WhisperConfig) -> Params:
    """Random init with the published layout (converter fills real weights)."""
    keys = jax.random.split(rng, 8)
    enc_keys = jax.random.split(keys[0], cfg.encoder_layers)
    dec_keys = jax.random.split(keys[1], cfg.decoder_layers)

    def enc_block(k):
        k1, k2 = jax.random.split(k)
        return {
            "ln1": init_layer_norm(cfg.d_model),
            "attn": _init_mha(k1, cfg.d_model),
            "ln2": init_layer_norm(cfg.d_model),
            "mlp": _init_mlp(k2, cfg.d_model, cfg.ffn_dim),
        }

    def dec_block(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "ln1": init_layer_norm(cfg.d_model),
            "attn": _init_mha(k1, cfg.d_model),
            "ln_x": init_layer_norm(cfg.d_model),
            "xattn": _init_mha(k2, cfg.d_model),
            "ln2": init_layer_norm(cfg.d_model),
            "mlp": _init_mlp(k3, cfg.d_model, cfg.ffn_dim),
        }

    conv_std = (cfg.num_mel_bins * 3) ** -0.5
    return {
        "encoder": {
            "conv1": {
                "kernel": jax.random.normal(
                    keys[2], (cfg.d_model, cfg.num_mel_bins, 3), jnp.float32
                )
                * conv_std,
                "bias": jnp.zeros((cfg.d_model,), jnp.float32),
            },
            "conv2": {
                "kernel": jax.random.normal(
                    keys[3], (cfg.d_model, cfg.d_model, 3), jnp.float32
                )
                * (cfg.d_model * 3) ** -0.5,
                "bias": jnp.zeros((cfg.d_model,), jnp.float32),
            },
            "pos": jnp.asarray(sinusoids(cfg.max_source_positions, cfg.d_model)),
            "blocks": [enc_block(k) for k in enc_keys],
            "ln_post": init_layer_norm(cfg.d_model),
        },
        "decoder": {
            "token_embedding": jax.random.normal(
                keys[4], (cfg.vocab_size, cfg.d_model), jnp.float32
            )
            * 0.02,
            "pos": jax.random.normal(
                keys[5], (cfg.max_target_positions, cfg.d_model), jnp.float32
            )
            * 0.01,
            "blocks": [dec_block(k) for k in dec_keys],
            "ln_post": init_layer_norm(cfg.d_model),
        },
    }


# -- forward ------------------------------------------------------------------


def _mha(
    x_q: jax.Array,
    x_kv: jax.Array,
    p: Params,
    n_heads: int,
    causal: bool = False,
) -> jax.Array:
    """Separate-projection MHA (HF Whisper semantics: q pre-scaled, fp32
    softmax, k without bias)."""
    B, Tq, W = x_q.shape
    Tk = x_kv.shape[1]
    hd = W // n_heads
    q = linear(x_q, p["q"]) * (hd**-0.5)
    k = linear(x_kv, p["k"])
    v = linear(x_kv, p["v"])

    def heads(t, T):
        return t.reshape(B, T, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q, Tq), heads(k, Tk), heads(v, Tk)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((Tq, Tk), jnp.bool_), k=Tk - Tq)
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    w = jax.nn.softmax(logits, axis=-1).astype(x_q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return linear(o.transpose(0, 2, 1, 3).reshape(B, Tq, W), p["out"])


def _mlp(x: jax.Array, p: Params) -> jax.Array:
    return linear(jax.nn.gelu(linear(x, p["fc1"]), approximate=False), p["fc2"])


def encoder_forward(
    params: Params, cfg: WhisperConfig, mel: jax.Array, dtype=jnp.float32
) -> jax.Array:
    """[B, n_mels, F] log-mel → [B, F//2, d_model] audio states."""
    enc = params["encoder"]
    x = mel.astype(dtype)
    dn = ("NCH", "OIH", "NCH")
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["kernel"].astype(dtype), (1,), [(1, 1)],
        dimension_numbers=dn,
    ) + enc["conv1"]["bias"].astype(dtype)[None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["kernel"].astype(dtype), (2,), [(1, 1)],
        dimension_numbers=dn,
    ) + enc["conv2"]["bias"].astype(dtype)[None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)  # [B, T, D]
    T = x.shape[1]
    x = x + enc["pos"][:T].astype(dtype)
    for blk in enc["blocks"]:
        x = x + _mha(layer_norm(x, blk["ln1"]), layer_norm(x, blk["ln1"]),
                     blk["attn"], cfg.encoder_heads)
        x = x + _mlp(layer_norm(x, blk["ln2"]), blk["mlp"])
    return layer_norm(x, enc["ln_post"])


def decoder_forward(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, L] int32
    enc_states: jax.Array,  # [B, T, D]
    dtype=jnp.float32,
) -> jax.Array:
    """Teacher-forced decoder: [B, L] tokens → [B, L, vocab] logits.

    The full-sequence path — the parity oracle for ``greedy_decode``'s
    KV-cached scan and the training path for fine-tuning."""
    dec = params["decoder"]
    L = tokens.shape[1]
    x = dec["token_embedding"][tokens].astype(dtype) + dec["pos"][:L].astype(dtype)
    enc_states = enc_states.astype(dtype)
    for blk in dec["blocks"]:
        h = layer_norm(x, blk["ln1"])
        x = x + _mha(h, h, blk["attn"], cfg.decoder_heads, causal=True)
        x = x + _mha(layer_norm(x, blk["ln_x"]), enc_states, blk["xattn"],
                     cfg.decoder_heads)
        x = x + _mlp(layer_norm(x, blk["ln2"]), blk["mlp"])
    x = layer_norm(x, dec["ln_post"])
    return (x @ dec["token_embedding"].T.astype(dtype)).astype(jnp.float32)


# -- KV-cached greedy decode ---------------------------------------------------


def _mha_cached(
    x_row: jax.Array,  # [B, 1, W] the new row
    p: Params,
    n_heads: int,
    k_cache: jax.Array,  # [B, L, W]
    v_cache: jax.Array,
    pos: jax.Array,  # scalar index of this row
):
    """One-row self-attention against the running K/V cache."""
    B, _, W = x_row.shape
    L = k_cache.shape[1]
    hd = W // n_heads
    q = linear(x_row, p["q"]) * (hd**-0.5)
    k_new = linear(x_row, p["k"])
    v_new = linear(x_row, p["v"])
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, (0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, (0, pos, 0))

    q = q.reshape(B, 1, n_heads, hd).transpose(0, 2, 1, 3)
    k = k_cache.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
    v = v_cache.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    valid = (jnp.arange(L) <= pos)[None, None, None, :]
    logits = jnp.where(valid, logits, jnp.float32(-1e9))
    w = jax.nn.softmax(logits, axis=-1).astype(x_row.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = linear(o.transpose(0, 2, 1, 3).reshape(B, 1, W), p["out"])
    return out, k_cache, v_cache


def _xattn_cached(
    x_row: jax.Array, p: Params, n_heads: int, k: jax.Array, v: jax.Array
) -> jax.Array:
    """One-row cross-attention against precomputed encoder K/V [B,H,T,hd]."""
    B, _, W = x_row.shape
    hd = W // n_heads
    q = (linear(x_row, p["q"]) * (hd**-0.5)).reshape(B, 1, n_heads, hd)
    q = q.transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(x_row.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return linear(o.transpose(0, 2, 1, 3).reshape(B, 1, W), p["out"])


def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    mel: jax.Array,  # [B, n_mels, F]
    prompt: jax.Array,  # [P] int32 forced tokens (sot, language, task, ...)
    max_len: int,
    dtype=jnp.float32,
    suppress_mask: jax.Array | None = None,  # [vocab] bool — True = forbid
) -> jax.Array:
    """Greedy transcription in one jitted program → [B, max_len] token ids.

    Position t < P emits prompt[t] verbatim (prefill inside the same scan);
    afterwards each step argmaxes the logits of the newest row. Once a
    sequence emits ``eos_id`` every later position repeats eos. Total decoder
    block work is O(max_len) rows (KV-cached) instead of the O(max_len²)
    full re-runs; cross-attention K/V are projected once from the encoder.
    """
    dec = params["decoder"]
    B = mel.shape[0]
    W = cfg.d_model
    P = int(prompt.shape[0])
    enc_states = encoder_forward(params, cfg, mel, dtype=dtype)
    T = enc_states.shape[1]
    hd = W // cfg.decoder_heads

    # Precompute cross-attention K/V per block: [B, H, T, hd].
    xkv = []
    for blk in dec["blocks"]:
        k = linear(enc_states, blk["xattn"]["k"])
        v = linear(enc_states, blk["xattn"]["v"])
        xkv.append(
            (
                k.reshape(B, T, cfg.decoder_heads, hd).transpose(0, 2, 1, 3),
                v.reshape(B, T, cfg.decoder_heads, hd).transpose(0, 2, 1, 3),
            )
        )

    n_blocks = len(dec["blocks"])
    k0 = jnp.zeros((n_blocks, B, max_len, W), dtype)
    v0 = jnp.zeros((n_blocks, B, max_len, W), dtype)
    prompt = prompt.astype(jnp.int32)

    def step(carry, t):
        token, done, kc, vc = carry
        x = dec["token_embedding"][token].astype(dtype)[:, None, :]
        x = x + dec["pos"][t].astype(dtype)[None, None, :]
        new_k, new_v = [], []
        for i, blk in enumerate(dec["blocks"]):
            h = layer_norm(x, blk["ln1"])
            att, ki, vi = _mha_cached(
                h, blk["attn"], cfg.decoder_heads, kc[i], vc[i], t
            )
            x = x + att
            new_k.append(ki)
            new_v.append(vi)
            x = x + _xattn_cached(
                layer_norm(x, blk["ln_x"]), blk["xattn"], cfg.decoder_heads,
                xkv[i][0], xkv[i][1],
            )
            x = x + _mlp(layer_norm(x, blk["ln2"]), blk["mlp"])
        x = layer_norm(x, dec["ln_post"])
        logits = (x[:, 0, :] @ dec["token_embedding"].T.astype(dtype)).astype(
            jnp.float32
        )
        if suppress_mask is not None:
            logits = jnp.where(suppress_mask[None, :], jnp.float32(-1e9), logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # Forced prompt positions: position t emits prompt[t+1] next... i.e.
        # the token FED at position t+1 is prompt[t+1] while t+1 < P.
        forced = t + 1 < P
        nxt = jnp.where(forced, prompt[jnp.minimum(t + 1, P - 1)], nxt)
        nxt = jnp.where(done, jnp.int32(cfg.eos_id), nxt)
        done = done | (nxt == cfg.eos_id)
        return (nxt, done, jnp.stack(new_k), jnp.stack(new_v)), nxt

    tok0 = jnp.full((B,), prompt[0], jnp.int32)
    done0 = jnp.zeros((B,), jnp.bool_)
    (_, _, _, _), out = jax.lax.scan(
        step, (tok0, done0, k0, v0), jnp.arange(max_len - 1)
    )
    # out[t] is the token at position t+1; prepend the SOT row.
    return jnp.concatenate([tok0[None, :], out], axis=0).T  # [B, max_len]


# -- HF checkpoint conversion --------------------------------------------------


def _lin(sd, prefix: str, transpose: bool = True) -> Params:
    w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    p = {"kernel": jnp.asarray(w.T if transpose else w)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return p


def _ln(sd, prefix: str) -> Params:
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
    }


def from_hf_whisper_state_dict(sd: dict, cfg: WhisperConfig) -> Params:
    """HF ``WhisperForConditionalGeneration.state_dict()`` → params pytree.

    Accepts tensors or numpy arrays; ``model.`` prefixes are stripped so both
    the full model and bare ``WhisperModel`` dicts convert. ``proj_out`` is
    tied to the token embedding in every published checkpoint, so only the
    embedding is read.
    """
    sd = {k.removeprefix("model."): np.asarray(v) for k, v in sd.items()}

    def mha(prefix: str) -> Params:
        p = {
            "q": _lin(sd, f"{prefix}.q_proj"),
            "k": _lin(sd, f"{prefix}.k_proj"),
            "v": _lin(sd, f"{prefix}.v_proj"),
            "out": _lin(sd, f"{prefix}.out_proj"),
        }
        return p

    def mlp(prefix: str) -> Params:
        return {"fc1": _lin(sd, f"{prefix}.fc1"), "fc2": _lin(sd, f"{prefix}.fc2")}

    enc_blocks = []
    for i in range(cfg.encoder_layers):
        b = f"encoder.layers.{i}"
        enc_blocks.append(
            {
                "ln1": _ln(sd, f"{b}.self_attn_layer_norm"),
                "attn": mha(f"{b}.self_attn"),
                "ln2": _ln(sd, f"{b}.final_layer_norm"),
                "mlp": mlp(b),
            }
        )
    dec_blocks = []
    for i in range(cfg.decoder_layers):
        b = f"decoder.layers.{i}"
        dec_blocks.append(
            {
                "ln1": _ln(sd, f"{b}.self_attn_layer_norm"),
                "attn": mha(f"{b}.self_attn"),
                "ln_x": _ln(sd, f"{b}.encoder_attn_layer_norm"),
                "xattn": mha(f"{b}.encoder_attn"),
                "ln2": _ln(sd, f"{b}.final_layer_norm"),
                "mlp": mlp(b),
            }
        )
    return {
        "encoder": {
            "conv1": {
                "kernel": jnp.asarray(sd["encoder.conv1.weight"].astype(np.float32)),
                "bias": jnp.asarray(sd["encoder.conv1.bias"].astype(np.float32)),
            },
            "conv2": {
                "kernel": jnp.asarray(sd["encoder.conv2.weight"].astype(np.float32)),
                "bias": jnp.asarray(sd["encoder.conv2.bias"].astype(np.float32)),
            },
            "pos": jnp.asarray(
                sd["encoder.embed_positions.weight"].astype(np.float32)
            ),
            "blocks": enc_blocks,
            "ln_post": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_embedding": jnp.asarray(
                sd["decoder.embed_tokens.weight"].astype(np.float32)
            ),
            "pos": jnp.asarray(
                sd["decoder.embed_positions.weight"].astype(np.float32)
            ),
            "blocks": dec_blocks,
            "ln_post": _ln(sd, "decoder.layer_norm"),
        },
    }


# -- host-side audio ------------------------------------------------------------


def read_wav(path: str, target_rate: int = 16000) -> np.ndarray:
    """Read a PCM WAV via the stdlib and resample to ``target_rate`` (linear).

    ffmpeg is absent from this image, so WAV is the zero-dependency input
    format; webm/ogg uploads need a host decoder wired by the deployment.
    """
    import wave

    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    if rate != target_rate:
        t_new = np.arange(int(len(x) * target_rate / rate)) * (rate / target_rate)
        x = np.interp(t_new, np.arange(len(x)), x).astype(np.float32)
    return x


class WhisperASR:
    """Convenience wrapper: one jit-compiled transcribe fn over a checkpoint.

    ``detokenize`` maps token-id lists to text (wire an HF WhisperTokenizer
    when its assets exist); without it ``transcribe`` returns id lists.
    ``detokenize="fallback"`` installs the deterministic byte-level
    stand-in (`tokenizer/fallbacks.WhisperFallbackTokenizer` — explicitly
    NON-parity; readable text needs the real vocab) so the transcribe →
    transcript → speech-search pipeline runs zero-egress. The
    forced prompt defaults to the multilingual transcribe header
    (sot, language, task=transcribe, notimestamps) with ids supplied by the
    caller, since the id→language table lives in the tokenizer assets.
    """

    def __init__(
        self,
        params: Params,
        cfg: WhisperConfig,
        prompt_ids: list[int],
        max_len: int = 224,
        detokenize: Callable[[list[int]], str] | str | None = None,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.params = params
        if detokenize == "fallback":
            from evr_tpu.tokenizer.fallbacks import WhisperFallbackTokenizer

            detokenize = WhisperFallbackTokenizer.for_config(cfg).decode
            self.tokenizer_source = "fallback"
        else:
            self.tokenizer_source = "provided" if detokenize else "none"
        self.detokenize = detokenize
        self.prompt = jnp.asarray(prompt_ids, jnp.int32)
        self.filters = jnp.asarray(
            mel_filter_bank(1 + cfg.n_fft // 2, cfg.num_mel_bins, cfg.sampling_rate)
        )
        # decoder positions are a hard ceiling (JAX would clamp the gather
        # silently past it, which is worse than truncating the transcript)
        max_len = min(max_len, cfg.max_target_positions)
        self.max_len = max_len

        # The prompt is a jit ARGUMENT so switching language headers of the
        # same length (the common case: sot/lang/task/notimestamps) reuses
        # the compile.
        def run(params, audio, prompt):
            mel = log_mel_spectrogram(audio, self.filters, cfg.n_fft, cfg.hop_length)
            return greedy_decode(params, cfg, mel, prompt, max_len, dtype=dtype)

        self._run = jax.jit(run)

    def transcribe(
        self, audio: np.ndarray, prompt_ids: list[int] | None = None
    ) -> list[list[int]] | list[str]:
        """[S] or [B, S] fp32 waveform at 16 kHz → texts (or id lists)."""
        if audio.ndim == 1:
            audio = audio[None, :]
        audio = pad_or_trim(audio, self.cfg.n_samples)
        prompt = (
            jnp.asarray(prompt_ids, jnp.int32) if prompt_ids is not None else self.prompt
        )
        toks = np.asarray(self._run(self.params, jnp.asarray(audio), prompt))
        out = []
        for row in toks:
            ids = [int(t) for t in row if int(t) != self.cfg.eos_id]
            ids = ids[prompt.shape[0]:]  # drop the forced header
            out.append(self.detokenize(ids) if self.detokenize else ids)
        return out

    def transcribe_long(
        self, audio: np.ndarray, prompt_ids: list[int] | None = None
    ) -> list[int] | str:
        """Transcribe audio longer than one window ([S], any length).

        The waveform is cut into consecutive ``chunk_length``-second windows
        which decode as ONE batch (one dispatch, windows fill the batch
        axis the device parallelises over) and the per-window outputs are
        concatenated. Boundary words can split across windows — the
        timestamp-conditioned shifting of the original CLI is a host-side
        refinement deployments can layer on top.
        """
        n = self.cfg.n_samples
        num_windows = max(1, math.ceil(audio.shape[-1] / n))
        windows = np.stack(
            [pad_or_trim(audio[i * n : (i + 1) * n], n) for i in range(num_windows)]
        )
        outs = self.transcribe(windows, prompt_ids=prompt_ids)
        if self.detokenize:
            return " ".join(o.strip() for o in outs if o.strip())
        return [t for o in outs for t in o]

    def transcribe_segments(
        self, audio: np.ndarray, prompt_ids: list[int] | None = None
    ) -> list[dict]:
        """Transcribe to time-anchored segments for the searchable-transcript
        index (`ingest/transcripts.py` / `MetadataStore.add_transcript`).

        Same one-batch windowing as ``transcribe_long``; each window becomes
        ``{"start": s, "end": s, "text": str}`` at window granularity (the
        model's notimestamps header is the cheap greedy path — finer
        word-level timestamps need the timestamp-token decode, a host-side
        refinement). Windows with empty text are dropped. Without a
        detokenizer, ``text`` is the space-joined token ids (still
        searchable/exact-matchable)."""
        n = self.cfg.n_samples
        duration = audio.shape[-1] / self.cfg.sampling_rate
        num_windows = max(1, math.ceil(audio.shape[-1] / n))
        windows = np.stack(
            [pad_or_trim(audio[i * n : (i + 1) * n], n) for i in range(num_windows)]
        )
        outs = self.transcribe(windows, prompt_ids=prompt_ids)
        segments = []
        for i, out in enumerate(outs):
            text = (
                out.strip() if self.detokenize else " ".join(str(t) for t in out)
            )
            if not text:
                continue
            segments.append(
                {
                    "start": i * float(self.cfg.chunk_length),
                    "end": min((i + 1) * float(self.cfg.chunk_length), duration),
                    "text": text,
                }
            )
        return segments
