"""Sustained on-chip fine-tune with a measured retrieval lift (VERDICT r4 #1).

Runs a few hundred REAL production train steps (`training/finetune.py`
`make_train_step`: freeze-prefix AdamW groups, grad clip, finite guard,
bf16 towers) at ViT-B/32 geometry, chained on-device, and records:

  * sustained examples/s across the whole run (device-resident batches —
    this environment's relay moves ~20-40 MB/s, so per-step host feeding
    would measure the debug transport, not the chip; the batch pool is
    uploaded ONCE and cycled, PERF.md "Known environment constraints"), and
  * text→image R@1/R@5/R@10 on a held-out set before vs after.

No real CLIP weights exist on this zero-egress image, so the model starts
random-init and the data is a procedurally generated compositional corpus
(color × shape × position × background scenes with templated captions,
tokenized by the deterministic fallback tokenizer). From random init the
pre-train R@K is chance; a contrastive signal this size is learnable in a
few hundred steps, so the lift is large and honestly attributable to the
training step — the same reference loop shape as
`Backend/clip_finetune_correct.py:437-536`.

    python -m evr_tpu.tools.train_sustained [--steps 320] [--batch 256]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

COLORS = {
    "red": (0, 0, 220), "green": (0, 200, 0), "blue": (230, 80, 0),
    "yellow": (0, 215, 255), "white": (240, 240, 240),
}
SHAPES = ("circle", "square", "triangle", "cross")
POSITIONS = ("top left", "top right", "bottom left", "bottom right", "center")
BACKGROUNDS = {"black": (0, 0, 0), "gray": (90, 90, 90), "navy": (60, 20, 20)}


def render_scene(rng: np.random.Generator, color: str, shape: str,
                 pos: str, bg: str, size: int) -> np.ndarray:
    """One [size, size, 3] RGB uint8 scene; geometry jittered per sample so
    the mapping caption→pixels is a distribution, not a lookup table."""
    import cv2

    img = np.zeros((size, size, 3), np.uint8)
    img[:] = BACKGROUNDS[bg]
    cx = {"left": size // 4, "right": 3 * size // 4, "center": size // 2}
    cy = {"top": size // 4, "bottom": 3 * size // 4, "center": size // 2}
    px = cx["center"] if pos == "center" else cx[pos.split()[1]]
    py = cy["center"] if pos == "center" else cy[pos.split()[0]]
    px += int(rng.integers(-size // 16, size // 16 + 1))
    py += int(rng.integers(-size // 16, size // 16 + 1))
    r = int(size * (0.10 + 0.05 * rng.random()))
    c = COLORS[color]
    if shape == "circle":
        cv2.circle(img, (px, py), r, c, -1)
    elif shape == "square":
        cv2.rectangle(img, (px - r, py - r), (px + r, py + r), c, -1)
    elif shape == "triangle":
        pts = np.array([[px, py - r], [px - r, py + r], [px + r, py + r]])
        cv2.fillPoly(img, [pts], c)
    else:  # cross
        t = max(2, r // 3)
        cv2.rectangle(img, (px - r, py - t), (px + r, py + t), c, -1)
        cv2.rectangle(img, (px - t, py - r), (px + t, py + r), c, -1)
    return img[:, :, ::-1]  # BGR -> RGB


def make_dataset(n: int, size: int, seed: int = 0):
    """(images uint8 [n, size, size, 3], captions list[str], labels [n]) —
    label = shape id (drives the classifier head the production config
    carries)."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, size, size, 3), np.uint8)
    caps, labels = [], np.zeros((n,), np.int32)
    keys = []
    for i in range(n):
        color = list(COLORS)[rng.integers(len(COLORS))]
        shape = SHAPES[rng.integers(len(SHAPES))]
        pos = POSITIONS[rng.integers(len(POSITIONS))]
        bg = list(BACKGROUNDS)[rng.integers(len(BACKGROUNDS))]
        imgs[i] = render_scene(rng, color, shape, pos, bg, size)
        caps.append(f"a {color} {shape} in the {pos} on a {bg} background")
        labels[i] = SHAPES.index(shape)
        keys.append((color, shape, pos, bg))
    return imgs, caps, labels, keys


def retrieval_at_k(img_feats: np.ndarray, txt_feats: np.ndarray,
                   ks=(1, 5, 10)) -> dict:
    """Text→image retrieval on matched pairs (row i ↔ row i)."""
    sims = txt_feats @ img_feats.T
    order = np.argsort(-sims, axis=1)
    n = len(sims)
    gold = np.arange(n)[:, None]
    return {f"R@{k}": float(np.mean((order[:, :k] == gold).any(axis=1)))
            for k in ks}


def main(argv=None) -> None:
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--pool", type=int, default=32,
                    help="device-resident batch pool cycled through the run")
    ap.add_argument("--holdout", type=int, default=256)
    ap.add_argument("--model", default="ViT-B/32")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/evr_tpu_jax_cache_{jax.default_backend()}",
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from evr_tpu.models import get_model_config
    from evr_tpu.models.classifier import ClassifierConfig, init_classifier_params
    from evr_tpu.models.clip import encode_image, encode_text, init_clip_params
    from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    from evr_tpu.tokenizer import tokenize
    from evr_tpu.training.finetune import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    model_cfg = get_model_config(args.model)
    size = model_cfg.vision.image_size
    B, pool = args.batch, args.pool
    print(f"model {args.model}  B={B}  pool={pool} device-resident batches  "
          f"steps={args.steps}", flush=True)

    n_train = B * pool
    t0 = time.perf_counter()
    imgs, caps, labels, _ = make_dataset(n_train + args.holdout, size,
                                         seed=args.seed)
    toks = np.asarray(
        tokenize(caps, context_length=model_cfg.text.context_length), np.int32
    )
    print(f"dataset: {n_train} train + {args.holdout} holdout scenes "
          f"rendered in {time.perf_counter() - t0:.1f}s", flush=True)

    tc = TrainConfig(
        batch_size=B, freeze_layers=0, lr=args.lr, compute_dtype="bfloat16",
        warmup_steps=20, epochs=10_000,  # flat-ish cosine over the run
    )
    cls_cfg = ClassifierConfig(
        embed_dim=model_cfg.embed_dim, num_classes=len(SHAPES)
    )
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(args.seed), model_cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(args.seed + 1), cls_cfg
        ),
    }
    opt = make_optimizer(tc, params, steps_per_epoch=pool)
    step, _ = make_train_step(model_cfg, cls_cfg, tc, opt)

    # ---- holdout encode (shared by before/after) ------------------------
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    def encode_holdout(p, imgs_d, toks_d):
        x = imgs_d.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        im = encode_image(p["clip"], model_cfg, x, dtype=jnp.bfloat16)
        tx = encode_text(p["clip"], model_cfg, toks_d, dtype=jnp.bfloat16)
        im = im / jnp.linalg.norm(im, axis=-1, keepdims=True)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        return im.astype(jnp.float32), tx.astype(jnp.float32)

    encode_j = jax.jit(encode_holdout)
    ho = slice(n_train, n_train + args.holdout)
    ho_imgs = jnp.asarray(imgs[ho])
    ho_toks = jnp.asarray(toks[ho])

    im0, tx0 = encode_j(params, ho_imgs, ho_toks)
    before = retrieval_at_k(np.asarray(im0), np.asarray(tx0))
    print(f"before: {before}  (chance R@5 = "
          f"{5 / args.holdout:.3f})", flush=True)

    # ---- the sustained run: scan over the device-resident pool ----------
    pool_imgs = jnp.asarray(
        imgs[:n_train].reshape(pool, B, size, size, 3)
    )
    pool_toks = jnp.asarray(toks[:n_train].reshape(pool, B, -1))
    pool_labels = jnp.asarray(labels[:n_train].reshape(pool, B))
    print(f"batch pool resident: "
          f"{pool_imgs.nbytes / 1e9:.2f} GB uploaded once", flush=True)

    def run_pool(state, key, p_imgs, p_toks, p_labels):
        # the pool rides as ARGUMENTS — closing over these device arrays
        # would turn 1.2 GB into jaxpr constants and blow up the remote
        # compiler request (observed HTTP 413; CLAUDE.md no-closures rule)
        def body(c, xs):
            s, k = c
            bi, bt, bl = xs
            k, sub = jax.random.split(k)
            s, m = step(s, {"images": bi, "tokens": bt, "labels": bl}, sub)
            return (s, k), m["total_loss"]

        (state, _), losses = jax.lax.scan(
            body, (state, key), (p_imgs, p_toks, p_labels)
        )
        return state, losses

    run_j = jax.jit(run_pool, donate_argnums=(0,))
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), ema_params=None)
    cycles = max(1, args.steps // pool)
    key = jax.random.PRNGKey(args.seed + 2)
    # warm the executable on cycle 1 (compile excluded from the sustained
    # figure; the persistent cache keeps re-runs fast)
    t0 = time.perf_counter()
    key, sub = jax.random.split(key)
    state, losses = run_j(state, sub, pool_imgs, pool_toks, pool_labels)
    first_loss = float(np.asarray(losses)[0])
    print(f"cycle 1/{cycles}: {pool} steps, first loss {first_loss:.3f}, "
          f"last {float(np.asarray(losses)[-1]):.3f} "
          f"(incl. compile: {time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    done = pool
    for c in range(1, cycles):
        key, sub = jax.random.split(key)
        state, losses = run_j(state, sub, pool_imgs, pool_toks,
                              pool_labels)
        done += pool
        print(f"cycle {c + 1}/{cycles}: loss "
              f"{float(np.asarray(losses)[-1]):.3f}", flush=True)
    sustained = (done - pool) * B / max(1e-9, time.perf_counter() - t0)
    print(f"sustained: {sustained:,.0f} ex/s over {done - pool} post-compile "
          f"steps (total {done} steps incl. warm cycle)", flush=True)

    im1, tx1 = encode_j(
        {"clip": state.params["clip"], "classifier": state.params["classifier"]},
        ho_imgs, ho_toks,
    )
    after = retrieval_at_k(np.asarray(im1), np.asarray(tx1))
    print(f"after:  {after}", flush=True)
    print(
        f"LIFT: R@5 {before['R@5']:.3f} -> {after['R@5']:.3f}  "
        f"R@1 {before['R@1']:.3f} -> {after['R@1']:.3f}  "
        f"({done} steps, holdout {args.holdout})", flush=True
    )


if __name__ == "__main__":
    main()
