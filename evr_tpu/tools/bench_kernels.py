"""Reproduce the kernel-level measurements behind PERF.md.

Every Pallas-vs-XLA default in this package (fused blocks, flash
attention, packing groups, int8) was chosen by on-chip measurement; this
tool re-runs those measurements so the numbers stay auditable.

    python -m evr_tpu.tools.bench_kernels block        # fused block vs XLA per tower
    python -m evr_tpu.tools.bench_kernels attention    # flash kernel vs XLA einsum
    python -m evr_tpu.tools.bench_kernels encode       # end-to-end encode A/B
    python -m evr_tpu.tools.bench_kernels int8         # int8 fused vs bf16
    python -m evr_tpu.tools.bench_kernels sweep        # sustained batch-size sweep

Methodology: chained `lax.scan` of REPS applications inside ONE jitted
dispatch with the output mixed back into the carry (hoist-proof), one
device sync, best of 3 — the same methodology as bench.py (PERF.md
explains why per-dispatch timing through this environment's relay
understates the chip).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _chained_timer(reps: int):
    import jax
    import jax.numpy as jnp

    def timeit(fn, x, label, params=None):
        """Time ``fn`` chained ``reps`` times in one dispatch.

        ``params``: optional pytree threaded through jit as an ARGUMENT —
        closing over large param pytrees turns them into jaxpr constants,
        which wedges this environment's remote compiler (CLAUDE.md); when
        given, ``fn`` is called as ``fn(params, x)``.
        """
        def chained(params_, x_):
            def body(c, _):
                o = fn(params_, c) if params_ is not None else fn(c)
                return (0.98 * c + 0.02 * o.astype(c.dtype)).astype(c.dtype), ()

            out, _ = jax.lax.scan(body, x_, None, length=reps)
            return jnp.sum(out.astype(jnp.float32))

        run = jax.jit(chained)
        float(run(params, x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x))
            best = min(best, (time.perf_counter() - t0) / reps * 1000)
        print(f"{label:42s}: {best:8.4f} ms", flush=True)
        return best

    return timeit


TOWER_SHAPES = {
    # (B, T, W, heads, causal, activation)
    "ViT-B/32 vision": (128, 50, 768, 12, False, "quick_gelu"),
    "ViT-B/32 text": (128, 77, 512, 8, True, "quick_gelu"),
    "ViT-L/14 vision": (64, 257, 1024, 16, False, "quick_gelu"),
    "ViT-L/14@336 vision": (64, 577, 1024, 16, False, "quick_gelu"),
    "ViT-H-14 vision": (64, 257, 1280, 16, False, "gelu"),
}


def bench_block(reps: int) -> None:
    import jax
    import jax.numpy as jnp

    from evr_tpu.models.layers import block_apply, init_block
    from evr_tpu.ops.block_fused import fused_block_apply

    timeit = _chained_timer(reps)
    rng = np.random.default_rng(0)
    for name, (B, T, W, H, causal, act) in TOWER_SHAPES.items():
        p = init_block(jax.random.PRNGKey(0), W, 12)
        x = jnp.asarray(rng.normal(size=(B, T, W)) * 0.1, jnp.bfloat16)
        print(f"-- {name}  [B={B} T={T} W={W} causal={causal}]")
        a = timeit(lambda p_, y: block_apply(y, p_, H, causal, "xla", act), x,
                   "  XLA composition", params=p)
        b = timeit(lambda p_, y: fused_block_apply(y, p_, H, act, causal), x,
                   "  fused Pallas block", params=p)
        print(f"  -> fused is {100 * (1 - b / a):+.1f}%")


def bench_attention(reps: int) -> None:
    import jax
    import jax.numpy as jnp

    from evr_tpu.ops.attention import _xla_attention, flash_attention

    timeit = _chained_timer(reps)
    rng = np.random.default_rng(0)
    for label, shape in [
        ("ViT-B/32 (T=50)", (256, 12, 50, 64)),
        ("ViT-L/14 (T=257)", (64, 16, 257, 64)),
        ("ViT-L/14@336 (T=577)", (64, 16, 577, 64)),
    ]:
        q = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        kv = (jnp.asarray(rng.normal(size=shape), jnp.bfloat16),
              jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
        print(f"-- {label}")
        # k/v threaded as arguments, not closures (constant-wedge avoidance)
        timeit(lambda kv_, qq: _xla_attention(qq, kv_[0], kv_[1], False), q,
               "  XLA einsum+softmax", params=kv)
        timeit(lambda kv_, qq: flash_attention(qq, kv_[0], kv_[1]), q,
               "  flash kernel", params=kv)


def _encode_fps(model: str, B: int, reps: int, params=None, impl: str = "auto") -> float:
    import jax
    import jax.numpy as jnp

    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.models.clip import encode_image

    cfg = get_model_config(model, attn_impl=impl)
    if params is None:
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    pix = jnp.asarray(rng.normal(size=(B, size, size, 3)).astype(np.float32))

    def step(params_, pix_):
        def body(c, _):
            out = encode_image(params_, cfg, c, dtype=jnp.bfloat16)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, ()

        out, _ = jax.lax.scan(body, pix_, None, length=reps)
        return jnp.sum(out)

    run = jax.jit(step)
    float(run(params, pix))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, pix))
        best = max(best, B * reps / (time.perf_counter() - t0))
    return best


def bench_encode(reps: int) -> None:
    # ViT-H-14 is the geometry the reference's eval harness compares
    # against via OpenCLIP (Backend/content/Test_compare_model); its
    # W=1280 T=257 tower sits exactly at the fused-block route's width
    # gate (layers.block_apply: W <= 1280), so "auto" vs "xla" here is
    # the end-to-end check of the -13% per-block win PERF.md records.
    for model, B in [("ViT-B/32", 128), ("ViT-L/14@336px", 64),
                     ("ViT-H-14", 32)]:
        for impl in ("xla", "auto"):
            fps = _encode_fps(model, B, reps, impl=impl)
            print(f"{model:16s} B={B:3d} attn_impl={impl:4s}: {fps:9.0f} frames/s")


def bench_int8(reps: int) -> None:
    import jax

    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.models.quant import quantize_clip_params

    cfg = get_model_config("ViT-B/32")
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_clip_params(params)
    for B in (128, 512):
        a = _encode_fps("ViT-B/32", B, reps, params=params)
        b = _encode_fps("ViT-B/32", B, reps, params=qparams)
        print(f"B={B:3d}: bf16 {a:8.0f}  int8 {b:8.0f} frames/s ({100 * (b / a - 1):+.0f}%)")
    # The widest registry tower: W=1280 sits at the fused-quant route's
    # width gate, so this row checks the int8 kernels hold up there too.
    cfg_h = get_model_config("ViT-H-14")
    params_h = init_clip_params(jax.random.PRNGKey(0), cfg_h)
    qparams_h = quantize_clip_params(params_h)
    a = _encode_fps("ViT-H-14", 32, reps, params=params_h)
    b = _encode_fps("ViT-H-14", 32, reps, params=qparams_h)
    print(f"ViT-H-14 B= 32: bf16 {a:8.0f}  int8 {b:8.0f} frames/s ({100 * (b / a - 1):+.0f}%)")


def bench_sweep(reps: int) -> None:
    for B in (64, 128, 256, 512, 768):
        fps = _encode_fps("ViT-B/32", B, reps)
        print(f"B={B:4d}: {fps:9.0f} frames/s sustained")


def bench_roofline(reps: int) -> None:
    """Decompose the headline ViT-B/32 encode (B=512, bf16, fused blocks)
    against its MXU GEMM floor at v5e bf16 peak (197 TFLOP/s) — VERDICT r1
    #7's quantified-residue ask.

    Methodology: time the encode at truncated depths (0, 6, 12 blocks) with
    the identical chained harness; the depth SLOPE is the true in-program
    per-block cost (standalone single-kernel timing carries harness
    overheads that inflate it), the 0-block intercept is the stem+tail
    (patch conv, pos-add, ln_pre/ln_post, projection) cost."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.models.clip import encode_image

    PEAK = 197e12  # v5e bf16
    B, T, W = 512, 50, 768
    cfg = get_model_config("ViT-B/32")
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    timeit = _chained_timer(reps)
    pix = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))

    # GEMM FLOPs (fwd, 2·MACs) per batch of B frames
    f_attn = B * (2 * T * W * 3 * W + 2 * T * T * W * 2 + 2 * T * W * W)
    f_mlp = B * (2 * T * W * 4 * W * 2)
    f_block = f_attn + f_mlp
    f_stem = 2 * B * 49 * (32 * 32 * 3) * W
    f_tail = 2 * B * W * cfg.embed_dim

    times = {}
    for n in (0, 6, 12):
        cfg_n = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, layers=n)
        )
        params_n = dict(params)
        params_n["visual"] = dict(params["visual"])
        params_n["visual"]["blocks"] = params["visual"]["blocks"][:n]

        times[n] = timeit(
            lambda ps, px, c=cfg_n: encode_image(ps, c, px, dtype=jnp.bfloat16)
            .sum() * 1e-9 + px,
            pix, f"encode with {n:2d} blocks", params=params_n,
        )

    per_block = (times[12] - times[0]) / 12
    per_block_6 = (times[6] - times[0]) / 6
    stem_tail = times[0]
    fps = B / times[12] * 1e3

    print(f"\nViT-B/32 fused encode roofline, B={B} bf16 "
          f"(floors at v5e {PEAK / 1e12:.0f} TFLOP/s peak)")
    print(f"{'term':26s} {'meas ms':>9s} {'floor ms':>9s} {'MFU':>6s} {'share':>6s}")

    def row(name, t_ms, fl):
        floor = fl / PEAK * 1e3
        print(f"{name:26s} {t_ms:9.3f} {floor:9.3f} "
              f"{100 * floor / t_ms if t_ms else 0:5.0f}% "
              f"{100 * t_ms / times[12]:5.1f}%")

    row("stem+tail (0-block run)", stem_tail, f_stem + f_tail)
    row("12 blocks (depth slope)", 12 * per_block, 12 * f_block)
    row("whole encode", times[12], f_stem + f_tail + 12 * f_block)
    print(f"per-block: {per_block:.3f} ms (6-block slope {per_block_6:.3f} — "
          f"linearity check)")
    print(f"throughput: {fps:.0f} frames/s at B={B}")
    ceiling = B / (12 * per_block) * 1e3
    print(f"bound: with stem+tail free, ceiling = {ceiling:.0f} frames/s "
          f"({ceiling / fps:.2f}x) — the blocks' "
          f"{100 * 12 * f_block / PEAK / (12 * per_block) * 1e3:.0f}% MFU is the "
          f"binding term (fp32 LN/softmax VPU passes + T=50 tile padding "
          f"inside the fused kernels)")


def bench_siglip(reps: int) -> None:
    """SigLIP family encode throughput (same chained-scan methodology as
    `_encode_fps`): base-224 at the serving batch, so400m at its memory
    bound. The MAP pooling head rides the same fused block kernels as the
    trunk (width ≤ 1024 towers)."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.models.siglip import (
        encode_image,
        get_siglip_config,
        init_siglip_params,
    )

    for name, B in [("siglip-base-patch16-224", 128), ("siglip-so400m-patch14-384", 16)]:
        cfg = get_siglip_config(name)
        params = init_siglip_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        size = cfg.vision.image_size
        pix = jnp.asarray(rng.normal(size=(B, size, size, 3)).astype(np.float32))

        variants = [("bf16", params)]
        if name == "siglip-base-patch16-224":
            # gated int8 serving row (models.quant_gate applies the same
            # armor as CLIP; here we measure the raw quantized towers)
            from evr_tpu.models.quant import quantize_siglip_params

            variants.append(("int8", quantize_siglip_params(params)))

        for tag, p_v in variants:
            def step(params_, pix_):
                def body(c, _):
                    out = encode_image(params_, cfg, c, dtype=jnp.bfloat16)
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, ()

                out, _ = jax.lax.scan(body, pix_, None, length=reps)
                return jnp.sum(out)

            run = jax.jit(step)
            float(run(p_v, pix))
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(p_v, pix))
                best = max(best, B * reps / (time.perf_counter() - t0))
            print(f"{name:28s} {tag:4s} B={B:3d}: {best:9.0f} frames/s "
                  f"sustained")


def _clip_step_flops(model_cfg, n_vis_tokens: int | None = None,
                     txt_T: int = 77, backward: bool = True) -> float:
    """Analytic FLOPs per EXAMPLE of one train step through both towers.

    Per transformer block, per token: qkv (3W²) + attn out (W²) + mlp
    (4W² + 4W²) MACs = 12W² → 24W² FLOPs; attention score+value batched
    matmuls add 4T²W FLOPs per block. Patch embedding and the two
    projection heads are included; LN/softmax/elementwise are not (they
    are bandwidth, not MXU work). Backward ≈ 2× forward (dX and dW each
    replay every GEMM once), so a full step is 3× forward — the standard
    accounting (e.g. PaLM appendix B). The optimizer update is O(params)
    and excluded (it is bandwidth-bound; its cost shows up in the
    phase-attribution rows, not the FLOPs model)."""
    v, t = model_cfg.vision, model_cfg.text

    def tower(T, W, L):
        return L * (24.0 * T * W * W + 4.0 * T * T * W)

    Tv = n_vis_tokens if n_vis_tokens is not None else (v.grid ** 2 + 1)
    f = tower(Tv, v.width, v.layers) + tower(txt_T, t.width, t.layers)
    f += 2.0 * (v.grid ** 2) * (3 * v.patch_size ** 2) * v.width  # patch embed
    f += 2.0 * v.width * model_cfg.embed_dim + 2.0 * t.width * model_cfg.embed_dim
    return (3.0 if backward else 1.0) * f


def _measure_peak_tflops(reps: int) -> float:
    """Self-calibrated MXU peak: best sustained bf16 GEMM chain in one
    dispatch, max over two shapes (a single big square matmul, and a
    two-GEMM wide-then-narrow pair that pipelines like a transformer MLP).
    MFU below is reported against THIS number, so it reflects what this
    chip's MXU actually sustains rather than a datasheet."""
    import jax
    import jax.numpy as jnp

    n = 4096 if jax.default_backend() == "tpu" else 512
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)) * (0.3 / np.sqrt(n)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(n, 2 * n)) * (0.3 / np.sqrt(n)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(2 * n, n)) * (0.2 / np.sqrt(n)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(n, n)) * 0.1, jnp.bfloat16)

    def chain_of(body, flops_per_iter, label):
        def chained(x_):
            out, _ = jax.lax.scan(lambda c, _: (body(c), ()), x_, None,
                                  length=reps)
            return jnp.sum(out.astype(jnp.float32))

        run = jax.jit(chained)
        float(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        tf = flops_per_iter * reps / best / 1e12
        print(f"  peak probe {label}: {tf:7.1f} TFLOP/s")
        return tf

    square = chain_of(
        lambda c: jnp.dot(a, c, preferred_element_type=jnp.bfloat16),
        2.0 * n ** 3, f"{n}^3 square",
    )
    mlp = chain_of(
        lambda c: jnp.dot(jnp.dot(c, w1, preferred_element_type=jnp.bfloat16),
                          w2, preferred_element_type=jnp.bfloat16),
        2.0 * 2 * n * n * (2 * n), f"{n}x{n} MLP pair",
    )
    tflops = max(square, mlp)
    print(f"calibrated MXU peak: {tflops:7.1f} TFLOP/s (best bf16 chain)")
    return tflops


def bench_train(reps: int, tiny: bool = False) -> None:
    """Training-step throughput + MFU campaign (VERDICT r4 #1).

    Measures the PRODUCTION fine-tune step — `training/finetune.py`
    `make_train_step` exactly as `Trainer` builds it (freeze-prefix AdamW
    groups, grad clip, finite-update guard, bf16 towers, fp32 loss) — on
    ViT-B/32 + classifier head (BASELINE config 4,
    `Backend/clip_finetune_correct.py:437-536`), chained steps in one
    dispatch. Columns: ms/step, ex/s, achieved TFLOP/s (analytic FLOPs
    model, `_clip_step_flops`), MFU vs the self-calibrated matmul peak."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.models import get_model_config
    from evr_tpu.models.classifier import ClassifierConfig, init_classifier_params
    from evr_tpu.models.clip import init_clip_params
    from evr_tpu.training.finetune import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    peak = _measure_peak_tflops(max(10, reps) if not tiny else 2)
    chain = 10 if not tiny else 2
    rng = np.random.default_rng(0)

    def measure(model_name: str, B: int, *, remat=False, patch_drop=0.0,
                gradcache=0, lora=0, optimizer="adamw", mu_dtype="float32",
                label="") -> float | None:
        import dataclasses

        model_cfg = get_model_config(model_name)
        if remat:
            model_cfg = dataclasses.replace(model_cfg, remat=True)
        tc = TrainConfig(
            batch_size=B, freeze_layers=8, remat=remat, patch_drop=patch_drop,
            gradcache_chunks=gradcache, lora_rank=lora,
            optimizer=optimizer, adam_mu_dtype=mu_dtype,
            compute_dtype="bfloat16",
        )
        cls_cfg = ClassifierConfig(embed_dim=model_cfg.embed_dim)
        params = {
            "clip": init_clip_params(jax.random.PRNGKey(0), model_cfg),
            "classifier": init_classifier_params(jax.random.PRNGKey(1), cls_cfg),
        }
        if lora:
            from evr_tpu.training.lora import init_lora

            params["lora"] = init_lora(
                jax.random.PRNGKey(2), params["clip"], lora,
                targets=tc.lora_targets,
            )
        opt = make_optimizer(tc, params)
        step, _ = make_train_step(model_cfg, cls_cfg, tc, opt)
        size = model_cfg.vision.image_size
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 256, size=(B, size, size, 3)), jnp.uint8
            ),
            "tokens": jnp.asarray(
                rng.integers(1, model_cfg.text.vocab_size, size=(B, 77)),
                jnp.int32,
            ),
            "labels": jnp.asarray(rng.integers(0, 3, size=(B,)), jnp.int32),
        }
        state = TrainState(
            params=params, opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32), ema_params=None,
        )

        def chained(state_, batch_, key):
            def body(c, _):
                s, k = c
                k, sub = jax.random.split(k)
                s, _m = step(s, batch_, sub)
                return (s, k), ()

            (s, _), _ = jax.lax.scan(
                body, (state_, key), None, length=chain
            )
            return s

        run = jax.jit(chained, donate_argnums=(0,))
        key = jax.random.PRNGKey(0)
        try:
            state = run(state, batch, key)
            int(state.step)  # sync
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"  {label or model_name:34s} B={B:4d}: "
                  f"{type(e).__name__}: {msg}", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = run(state, batch, key)
            int(state.step)
            best = min(best, time.perf_counter() - t0)
        ms = best / chain * 1000
        exs = B * chain / best
        n_keep = max(1, int(round(model_cfg.vision.grid ** 2 * (1.0 - patch_drop))))
        flops_ex = _clip_step_flops(
            model_cfg, n_vis_tokens=n_keep + 1 if patch_drop else None
        )
        if gradcache > 1:
            flops_ex += _clip_step_flops(model_cfg, backward=False) / 3.0
        tf = flops_ex * exs / 1e12
        print(
            f"  {label or model_name:34s} B={B:4d}: {ms:8.1f} ms/step "
            f"{exs:8.0f} ex/s  {tf:6.1f} TFLOP/s  MFU {100 * tf / peak:5.1f}%",
            flush=True,
        )
        return exs

    if tiny:  # mechanics smoke (CI/CPU): tiny geometry, every lever
        for kw in ({}, {"remat": True}, {"patch_drop": 0.5},
                   {"gradcache": 2}, {"lora": 4}):
            assert measure("ViT-Tiny-Test", 8, **kw) is not None, kw
        return

    import os as _os

    spec = _os.environ.get("EVR_TRAIN_SPEC")
    if spec:  # ad-hoc rows: "model=ViT-B/32,B=128,drop=0.5;B=256,mu=bf16"
        for row in spec.split(";"):
            parts = dict(p.split("=", 1) for p in row.split(",") if "=" in p)
            measure(
                parts.get("model", "ViT-B/32"), int(parts.get("B", 128)),
                remat=parts.get("remat") == "1",
                patch_drop=float(parts.get("drop", 0) or 0),
                gradcache=int(parts.get("gc", 0) or 0),
                lora=int(parts.get("lora", 0) or 0),
                optimizer=parts.get("opt", "adamw"),
                mu_dtype=parts.get("mu", "float32"),
                label=row,
            )
        return

    print("-- batch sweep, ViT-B/32 + head (production step)")
    for B in (64, 128, 256, 512):
        measure("ViT-B/32", B)
    print("-- levers at the large batch")
    measure("ViT-B/32", 512, remat=True, label="ViT-B/32 remat")
    measure("ViT-B/32", 512, patch_drop=0.5, label="ViT-B/32 patch_drop=0.5")
    measure("ViT-B/32", 512, gradcache=4, label="ViT-B/32 gradcache=4")
    measure("ViT-B/32", 512, lora=8, label="ViT-B/32 lora r=8")
    print("-- ViT-L/14 (vision-heavy; remat for HBM headroom)")
    measure("ViT-L/14", 64)
    measure("ViT-L/14", 128, remat=True, label="ViT-L/14 remat")
    measure("ViT-L/14", 256, remat=True, label="ViT-L/14 remat")


def bench_train_phases(reps: int, tiny: bool = False) -> None:
    """Phase attribution for the B=256 ViT-B/32 step: forward-only loss,
    fwd+bwd (grads, no update), and the full step (grads + AdamW groups +
    clip + finite guard) — separates MXU work from the bandwidth-bound
    optimizer sweep over the ~150M-param state."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.models import get_model_config
    from evr_tpu.models.classifier import ClassifierConfig, init_classifier_params
    from evr_tpu.models.clip import init_clip_params
    from evr_tpu.training.finetune import (
        TrainConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    import dataclasses

    B, chain = (256, 10) if not tiny else (8, 2)
    model_cfg = get_model_config("ViT-B/32" if not tiny else "ViT-Tiny-Test")
    # mirror make_train_step's gradient-path resolution (auto -> auto_grad:
    # XLA stored-activation fwd+bwd below T=512) so the phase split
    # attributes the SAME program the production step runs
    if model_cfg.attn_impl == "auto":
        model_cfg = dataclasses.replace(model_cfg, attn_impl="auto_grad")
    tc = TrainConfig(batch_size=B, freeze_layers=8, compute_dtype="bfloat16")
    cls_cfg = ClassifierConfig(embed_dim=model_cfg.embed_dim)
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), model_cfg),
        "classifier": init_classifier_params(jax.random.PRNGKey(1), cls_cfg),
    }
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(model_cfg, cls_cfg, tc, opt)
    rng = np.random.default_rng(0)
    size = model_cfg.vision.image_size
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 256, size=(B, size, size, 3)), jnp.uint8
        ),
        "tokens": jnp.asarray(rng.integers(1, 49408, size=(B, 77)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 3, size=(B,)), jnp.int32),
    }

    from evr_tpu.models.classifier import classifier_forward
    from evr_tpu.models.clip import encode_image, encode_text
    from evr_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    from evr_tpu.training.losses import combined_clip_loss

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    def loss_fn(p, b, key, eps=0.0):
        # ``eps`` threads the scan carry into the INPUT so the tower
        # compute is loop-variant — without it XLA hoists the (batch- and
        # param-invariant) encodes out of the chained scan and the
        # "forward" row measures one forward, not ``chain`` of them.
        x = b["images"].astype(jnp.float32) / 255.0
        x = (x - mean) / std + eps
        img = encode_image(p["clip"], model_cfg, x, dtype=jnp.bfloat16)
        # the text tower must be loop-variant too (a data-dependent select
        # XLA cannot constant-fold) or licm hoists it out of the chain
        toks = jnp.where(eps > -1.0, b["tokens"], 0)
        txt = encode_text(p["clip"], model_cfg, toks, dtype=jnp.bfloat16)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        cls = classifier_forward(p["classifier"], cls_cfg, img,
                                 deterministic=False, rng=key)
        loss, _ = combined_clip_loss(
            img, txt, p["clip"]["logit_scale"], class_logits=cls,
            class_labels=b["labels"],
        )
        return loss

    def timed(fn, *args, label):
        run = jax.jit(fn)
        float(np.asarray(run(*args)).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(run(*args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:34s}: {best / chain * 1000:8.1f} ms", flush=True)
        return best

    def fwd_chain(p, b, key):
        def body(c, _):
            k, acc = c
            k, sub = jax.random.split(k)
            return (k, acc + loss_fn(p, b, sub, eps=acc * 1e-24)), ()

        (_, acc), _ = jax.lax.scan(body, (key, jnp.float32(0.0)), None,
                                   length=chain)
        return acc

    def grad_chain(p, b, key):
        def body(c, _):
            k, acc = c
            k, sub = jax.random.split(k)
            g = jax.grad(loss_fn)(p, b, sub, acc * 1e-24)
            gs = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))
            return (k, acc + gs), ()

        (_, acc), _ = jax.lax.scan(body, (key, jnp.float32(0.0)), None,
                                   length=chain)
        return acc

    key = jax.random.PRNGKey(0)
    timed(fwd_chain, params, batch, key, label="forward only (loss)")
    timed(grad_chain, params, batch, key, label="forward + backward (grads)")

    def step_chain(state_, b, key_):
        def body(c, _):
            s, k = c
            k, sub = jax.random.split(k)
            s, _m = step(s, b, sub)
            return (s, k), ()

        (s, _), _ = jax.lax.scan(body, (state_, key_), None, length=chain)
        return s

    run = jax.jit(step_chain, donate_argnums=(0,))
    # the run DONATES the state, so thread the returned state through the
    # timing loop instead of rebuilding from (now-invalid) input buffers
    state = TrainState(
        params=jax.tree.map(jnp.copy, params), opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32), ema_params=None,
    )
    state = run(state, batch, key)
    int(state.step)  # sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state, batch, key)
        int(state.step)
        best = min(best, time.perf_counter() - t0)
    print(f"  {'full step (grads + optimizer)':34s}: "
          f"{best / chain * 1000:8.1f} ms", flush=True)


def bench_whisper(reps: int, sizes=("tiny", "base")) -> None:
    """Whisper ASR throughput (random-init weights — geometry + kernels are
    what's measured; real text needs the gated vocab): real-time factor of
    the full pipeline (log-mel frontend + encoder + KV-cached greedy scan
    decode, one jitted dispatch) on a single 30 s window and on an
    8-window batch (`transcribe_long`'s shape — windows fill the batch
    axis). Greedy decode runs to max_len=64 tokens here (random weights
    never emit EOS, so this is the WORST-case decode depth at caption
    length; real speech usually stops earlier)."""
    from evr_tpu.models.whisper import (
        WHISPER_SIZES,
        WhisperASR,
        init_whisper_params,
    )

    import jax

    rng = np.random.default_rng(0)
    for size in sizes:
        cfg = WHISPER_SIZES[size]
        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
        asr = WhisperASR(params, cfg, prompt_ids=[cfg.sot_id], max_len=64)
        audio1 = rng.normal(size=(cfg.n_samples,)).astype(np.float32) * 0.1
        audio8 = rng.normal(size=(8 * cfg.n_samples,)).astype(np.float32) * 0.1
        asr.transcribe(audio1)  # compile
        best1 = float("inf")
        for _ in range(max(2, reps // 8)):
            t0 = time.perf_counter()
            asr.transcribe(audio1)
            best1 = min(best1, time.perf_counter() - t0)
        asr.transcribe_long(audio8)  # compile the batched shape
        best8 = float("inf")
        for _ in range(max(2, reps // 8)):
            t0 = time.perf_counter()
            asr.transcribe_long(audio8)
            best8 = min(best8, time.perf_counter() - t0)
        print(
            f"whisper-{size:5s}: 1x30s {best1:6.2f}s (RTF "
            f"{30 / best1:6.1f}x)   8x30s {best8:6.2f}s (RTF "
            f"{240 / best8:6.1f}x)", flush=True,
        )


def bench_umap(reps: int, ns=(10_000, 100_000)) -> None:
    """UMAP serving-scale tier measurement (VERDICT r4 #3 / PERF.md
    §umap-scale): wall-clock, phase split (graph build vs layout), peak
    host RSS, and SAMPLED trustworthiness (2k-point subsample, k=10 —
    full trustworthiness is O(N²) and unrepresentable at 100k) for the
    sparse-COO + PCA-init tier at 10k and 100k points. Synthetic corpus:
    32 Gaussian clusters in D=512, the shape of a frame-embedding set."""
    import resource

    from evr_tpu.viz.umap_jax import fuzzy_simplicial_set_edges, umap

    try:
        from sklearn.manifold import trustworthiness
    except ImportError:
        trustworthiness = None

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(32, 512)).astype(np.float32) * 3.0
    for n in ns:
        labels = rng.integers(0, 32, size=n)
        x = centers[labels] + rng.normal(size=(n, 512)).astype(np.float32)
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.perf_counter()
        heads, _tails, _w = fuzzy_simplicial_set_edges(x, 15)
        t_cold = time.perf_counter() - t0  # includes the kNN-chunk compile
        t0 = time.perf_counter()
        heads, _tails, _w = fuzzy_simplicial_set_edges(x, 15)
        t_graph = time.perf_counter() - t0  # warm: what umap() itself pays
        t0 = time.perf_counter()
        y = umap(x)  # includes its own (warm) graph build
        t_total = time.perf_counter() - t0
        t_layout = max(0.0, t_total - t_graph)
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        tw = float("nan")
        if trustworthiness is not None:
            sample = rng.choice(n, size=min(2000, n), replace=False)
            tw = trustworthiness(x[sample], y[sample], n_neighbors=10)
        print(
            f"N={n:>7,}: total {t_total:7.1f}s (graph {t_graph:6.1f}s warm / "
            f"{t_cold:6.1f}s cold, layout {t_layout:6.1f}s)  "
            f"edges {len(heads):,}  "
            f"trust@2k {tw:.3f}  peak-RSS {(rss1 - rss0) / 1e6:+.2f} GB "
            f"(abs {rss1 / 1e6:.2f} GB)",
            flush=True,
        )


def bench_captioner(reps: int) -> None:
    """Caption decode: KV-cached scan vs full-buffer re-run (PERF.md
    'Caption decoding'). Production captioner scale (width 512, 4 layers,
    prefix 10, 30 new tokens), sampled rollout at B=64 — the exact shape
    ScstTrainer rolls out twice per step."""
    import time

    import jax
    import jax.numpy as jnp

    from evr_tpu.models.captioner import (
        CaptionerConfig,
        generate,
        init_captioner_params,
    )

    if jax.default_backend() == "tpu":
        cfg, B = CaptionerConfig(), 64
    else:  # dev-box smoke shape: the full config takes ~80 s/rollout on CPU
        cfg, B = CaptionerConfig(width=64, layers=1, heads=2, prefix_len=3,
                                 max_new_tokens=6), 8
    params = init_captioner_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.image_dim), jnp.float32)
    results = {}
    for use_cache in (False, True):
        f = jax.jit(
            lambda p, x, uc=use_cache: generate(
                p, cfg, x, sample=True, rng=jax.random.PRNGKey(3), use_cache=uc
            )[0]
        )
        f(params, feats).block_until_ready()
        best = float("inf")
        n = max(1, reps // 10)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                float(jnp.sum(f(params, feats)))
            best = min(best, (time.perf_counter() - t0) / n * 1000)
        label = "kv-cached decode" if use_cache else "full re-run decode"
        print(f"{label:42s}: {best:8.1f} ms/rollout (B={feats.shape[0]})", flush=True)
        results[use_cache] = best
    print(f"{'speedup':42s}: {results[False] / results[True]:8.2f}x", flush=True)



# -- shared ANN-bench scaffolding (ivf / pq / ivfpq share the corpus,
# brute-force baseline, best-of-3 timing and recall methodology; one
# implementation so a methodology fix can't drift between tiers) ---------


def _ann_setup(n: int, d: int, nq: int, reps: int):
    """Clustered-ish corpus + near-corpus queries + timed brute baseline.

    Returns (emb, q, brute_rows, brute_ms). Timing is best-of-3 wall rounds
    of ``reps`` dispatches with a device sync per dispatch, the same rule
    bench.py uses for per-call numbers.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, n, nq)] + 0.05 * rng.standard_normal(
        (nq, d)
    ).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    emb_dev, q_dev = jnp.asarray(emb), jnp.asarray(q)

    @jax.jit
    def brute(qq, ee):
        return jax.lax.top_k(qq @ ee.T, 10)

    bs, br = brute(q_dev, emb_dev)
    bs.block_until_ready()
    ms = _best_ms(lambda: brute(q_dev, emb_dev)[0].block_until_ready(), reps)
    return emb, q, np.asarray(br), ms


def _best_ms(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0) / reps * 1000)
    return best


def _recall(rows, brute_rows) -> float:
    hits = sum(
        len(set(r.tolist()) & set(b.tolist()))
        for r, b in zip(rows, brute_rows)
    )
    return hits / brute_rows.size


def _recall_1_at_k(rows, brute_rows) -> float:
    """Fraction of queries whose TRUE nearest neighbour appears in the
    retrieved top-k — the standard PQ metric (Jégou et al. report
    recall@R): ADC codes can't order near-tie cluster members, but
    finding the true NN is what matters for retrieval."""
    return float(
        np.mean([b[0] in set(r.tolist()) for r, b in zip(rows, brute_rows)])
    )


def _device_corpus_int8(n: int, d: int, nq: int, slab_rows: int = 500_000,
                        n_centers: int = 16_384, seed: int = 0):
    """Clustered corpus generated DIRECTLY on device as int8 + per-row
    scales — at N=10M, D=512 that is 5.1 GB HBM, and nothing (beyond the
    [nq, D] queries) ever crosses the relayed host↔device link. Returns
    (emb_int8 [N,D], scales [N], queries fp32 [nq,D])."""
    import functools

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kc, key = jax.random.split(key)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    # per-dim noise scaling keeps the CLUSTER structure real: total noise
    # norm ≈ 0.35 relative to the unit center (≈0.94 intra-cluster cosine,
    # the regime CLIP frame embeddings live in) — unscaled normal(d) noise
    # would have norm √d and drown the centers (measured: recall@10 ≈ 0.1
    # because the "clusters" were noise)
    noise = 0.35 / float(np.sqrt(d))

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("m",))
    def write_slab(buf, scales, k, c, start, m):
        k1, k2 = jax.random.split(k)
        cid = jax.random.randint(k1, (m,), 0, c.shape[0])
        x = c[cid] + noise * jax.random.normal(k2, (m, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1) / 127.0, 1e-12)
        q = jnp.round(x / scale[:, None]).astype(jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, q, (start, 0))
        scales = jax.lax.dynamic_update_slice(scales, scale, (start,))
        return buf, scales

    buf = jnp.zeros((n, d), jnp.int8)
    scales = jnp.ones((n,), jnp.float32)
    for i in range(0, n, slab_rows):
        key, sub = jax.random.split(key)
        buf, scales = write_slab(
            buf, scales, sub, centers, jnp.int32(i), min(slab_rows, n - i)
        )
    kq, key = jax.random.split(key)
    q = buf[:nq].astype(jnp.float32) * scales[:nq, None]
    q = q + (0.1 / float(np.sqrt(d))) * jax.random.normal(kq, (nq, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return buf, scales, np.asarray(q)


def _brute_int8_scan(q, buf, scales, slab_rows: int = 500_000, top_k: int = 10):
    """Exact top-k over the full int8 corpus in ONE dispatch: a `lax.scan`
    over contiguous-slab views (bitcast reshape, no copy), per-slab top-k,
    device-side merge — the same scoring math the IVF int8 probe uses
    (bf16 inputs, fp32 accumulation, per-row scale). Returns
    (rows [B, k], seconds for one dispatch incl. one relay RT)."""
    import jax
    import jax.numpy as jnp

    n, d = buf.shape
    assert n % slab_rows == 0, "corpus must tile into equal slabs"
    n_slabs = n // slab_rows
    bufr = buf.reshape(n_slabs, slab_rows, d)
    scr = scales.reshape(n_slabs, slab_rows)

    @jax.jit
    def exact(qq, br, sr):
        def body(c, sl):
            slab, sc = sl
            s = jnp.einsum(
                "bd,nd->bn",
                qq.astype(jnp.bfloat16),
                slab.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * sc
            return c, jax.lax.top_k(s, top_k)

        _, (ss, rr) = jax.lax.scan(body, 0, (br, sr))
        offs = (jnp.arange(n_slabs, dtype=jnp.int32) * slab_rows)[:, None, None]
        rr = rr + offs
        b = qq.shape[0]
        ss = ss.transpose(1, 0, 2).reshape(b, -1)
        rr = rr.transpose(1, 0, 2).reshape(b, -1)
        s2, pos = jax.lax.top_k(ss, top_k)
        return s2, jnp.take_along_axis(rr, pos, axis=1)

    qd = jnp.asarray(q)
    _, rows = exact(qd, bufr, scr)
    rows = np.asarray(rows)  # compile + warm + fetch
    t0 = time.perf_counter()
    _, rr = exact(qd, bufr, scr)
    rr = np.asarray(rr)
    return rows, time.perf_counter() - t0


def _exact_scores_of(q, buf, scales, rows):
    """fp32 dequantised cosines of specific corpus rows — the tie-recall
    scorer (both the returned rows and the exact-scan rows go through THIS
    same function, so the comparison is internally consistent)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(qq, b, sc, r):
        safe = jnp.where(r >= 0, r, 0)
        vecs = b[safe].astype(jnp.float32) * sc[safe][..., None]
        return jnp.einsum("bd,brd->br", qq, vecs)

    return np.asarray(f(jnp.asarray(q), buf, scales, jnp.asarray(rows)))


def _tie_recall(q, buf, scales, rws, b_rows, eps: float = 1e-3) -> float:
    """Near-tie-aware recall: a returned row counts if its EXACT score
    reaches the exact 10th-best score − eps. On clustered corpora the
    top-10 beyond rank 1 are near-ties (~610 rows/cluster at N=10M at
    ≈0.94 mutual cosine); plain id-recall calls an equally-good tie a
    miss, which says nothing about index quality."""
    ret = _exact_scores_of(q, buf, scales, rws)
    exact = _exact_scores_of(q, buf, scales, b_rows)
    tenth = exact.min(axis=1)
    ok = (ret >= tenth[:, None] - eps) & (rws >= 0)
    return float(ok.mean())


def _exact_scan_probe(qq, bufr, scr, top_k: int = 10):
    """The exact int8 chunked scan as a (scores, rows) probe for the
    batched device-timing harness (same math as `_brute_int8_scan`)."""
    import jax
    import jax.numpy as jnp

    def body(c, sl):
        slab, sc = sl
        s = jnp.einsum(
            "bd,nd->bn",
            qq.astype(jnp.bfloat16),
            slab.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * sc
        return c, jax.lax.top_k(s, top_k)

    _, (ss, rr) = jax.lax.scan(body, 0, (bufr, scr))
    b = qq.shape[0]
    ss = ss.transpose(1, 0, 2).reshape(b, -1)
    s2, pos = jax.lax.top_k(ss, top_k)
    return s2, pos


def _batched_device_ms(probe_call, queries, ops=(), r_lo: int = 8,
                       r_hi: int = 32) -> float:
    """Device-side ms per query BATCH: scan R perturbed copies of the
    batch through ``probe_call`` inside one jit and difference two R's —
    (t(r_hi) − t(r_lo)) / (r_hi − r_lo) cancels the relay round trip and
    dispatch constants exactly.

    This replaces the single-query chained number for the ANN tiers: a
    B=1 probe is an MXU-starved matvec plus per-scan-step overhead and
    measured 10–100× slower than the same work batched (4M rows, nprobe=8:
    3.2 ms/query chained vs 0.033 ms/query in an 8-batch — the retrieval
    serving path always batches, so the batched number is the honest one).
    Operands are ARGUMENTS, never closures (CLAUDE.md: closed-over device
    arrays become jaxpr constants and wedge the remote compiler)."""
    import functools

    import jax
    import jax.numpy as jnp

    qd = jnp.asarray(queries)

    @functools.partial(jax.jit, static_argnames=("r",))
    def run(qb, r: int, *ops_):
        key = jax.random.PRNGKey(0)
        qs = qb[None] + 1e-4 * jax.random.normal(
            key, (r,) + qb.shape, jnp.float32
        )

        def body(c, q1):
            s, _ = probe_call(q1, *ops_)
            return c + jnp.sum(s), None

        out, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return out

    times = {}
    for r in (r_lo, r_hi):
        float(run(qd, r, *ops))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(qd, r, *ops))
            best = min(best, time.perf_counter() - t0)
        times[r] = best
    return max(0.0, (times[r_hi] - times[r_lo]) / (r_hi - r_lo)) * 1000


def _chained_search_ms(probe_call, queries, ops=(), n_chain: int = 2) -> float:
    """Device-side per-query latency: scan ``probe_call`` over each query
    inside ONE jitted dispatch, sync once — the chained methodology
    bench.py's headline uses (a per-dispatch timing charges a full relay
    round trip to every query on this transport). Returns ms/query.

    The index operands (``ops``) MUST be passed here, not closed over:
    closed-over device arrays become jaxpr CONSTANTS, and at the 10M-row
    tier that ships the 5 GB corpus to the remote compiler, which breaks
    the compile (measured: 'Broken pipe' at 5.26 GB of captured
    constants — the CLAUDE.md closure rule, rediscovered)."""
    import jax
    import jax.numpy as jnp

    qd = jnp.asarray(queries)

    @jax.jit
    def chained(qs, *ops_):
        def body(c, q1):
            s, _ = probe_call(q1[None], *ops_)
            return c + jnp.sum(s), None

        out, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return out

    float(chained(qd, *ops))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(qd, *ops))
        best = min(best, (time.perf_counter() - t0) / len(queries) * 1000)
    return best


def bench_ann_big(reps: int, rows: int, d: int = 512,
                  tiers: str = "both", subspaces: int = 64,
                  opq_iters: int = 0, rerank: int = 0) -> None:
    """VERDICT r2 #8: the ANN tiers MEASURED at claimed scale — a real
    ≥10M-row on-chip build (int8 IVF ≈ rows·(D+4) bytes ≈ 5.1 GB at 10M;
    IVF-PQ codes ≈ rows·S bytes ≈ 640 MB). Corpus is generated on device
    (the relayed link would take ~10 min to upload it); queries are
    near-corpus. Prints build seconds, ms/query-batch vs nprobe, and
    recall@10 against the exact chunked scan of the same int8 corpus."""
    from evr_tpu.index.ivf import IVFIndex
    from evr_tpu.index.ivfpq import IVFPQIndex

    nq = 8
    print(f"generating {rows:,}x{d} int8 corpus on device…", flush=True)
    t0 = time.perf_counter()
    buf, scales, q = _device_corpus_int8(rows, d, nq)
    float(jnp_sum_probe(scales))
    print(f"  corpus gen: {time.perf_counter() - t0:.1f}s "
          f"({rows * (d + 4) / 1e9:.2f} GB HBM)", flush=True)

    b_rows, b_sec = _brute_int8_scan(q, buf, scales)
    n_slabs = rows // 500_000
    dev_exact = _batched_device_ms(
        _exact_scan_probe, q,
        ops=(buf.reshape(n_slabs, 500_000, d),
             scales.reshape(n_slabs, 500_000)),
        r_lo=2, r_hi=6,
    )
    print(f"N={rows:>11,}  exact one-dispatch scan: "
          f"{b_sec * 1000:8.1f} ms/batch({nq}) incl. 1 relay RT   "
          f"device {dev_exact:7.2f} ms/batch", flush=True)

    from evr_tpu.index.ivf import IVFIndex as _IVF

    # k=8192 is the 10M-row geometry; smaller rows (CPU smokes of this
    # path) scale k down so the k-means GEMMs stay tractable off-chip
    k = 8192 if rows > 2_000_000 else max(64, rows // 1000)
    if tiers not in ("ivf", "both"):
        _bench_ann_big_pq(reps, rows, d, k, nq, buf, scales, q, b_rows,
                          subspaces, opq_iters, rerank=rerank)
        return
    t0 = time.perf_counter()
    # capacity_factor 1.3 (not the unpacked default): the packed layout
    # materialises capacity_factor× the int8 bytes NEXT TO the caller's
    # corpus — 1.3 keeps packed(6.7 GB)+corpus(5.2 GB) inside HBM at 10M
    ivf = IVFIndex().build_device(
        buf, n_clusters=k, capacity_factor=1.3, iters=6,
        dtype="int8", row_scales=scales, slab_rows=500_000,
    )
    ivf_build = time.perf_counter() - t0
    print(f"  ivf build (k={k}, packed): {ivf_build:.1f}s "
          f"(overflow pool: {int(ivf.overflow.shape[0]):,} rows)", flush=True)
    for nprobe in (8, 32, 64, 128):
        _, rws = ivf.search(q, 10, nprobe=nprobe)  # compile + recall rows
        ms = _best_ms(lambda: ivf.search(q, 10, nprobe=nprobe), max(2, reps // 4))
        dev_ms = _batched_device_ms(
            lambda q1, *ops, _np=nprobe, _c=ivf._capacity: (
                _IVF._probe_search_packed(q1, *ops, 10, _np, _c)
            ),
            q,
            ops=ivf._packed_ops(),
        )
        print(
            f"N={rows:>11,}  ivf int8 nprobe={nprobe:>3}  : {ms:8.1f} "
            f"ms/batch({nq})  device {dev_ms:7.2f} ms/batch  "
            f"recall@10={_recall(rws, b_rows):.3f}  "
            f"tie@10={_tie_recall(q, buf, scales, rws, b_rows):.3f}  "
            f"recall1@10={_recall_1_at_k(rws, b_rows):.3f}",
            flush=True,
        )
    del ivf  # frees the packed block array before the PQ build
    if tiers in ("ivf",):
        return
    _bench_ann_big_pq(reps, rows, d, k, nq, buf, scales, q, b_rows,
                      subspaces, opq_iters, rerank=rerank)


def _bench_ann_big_pq(reps, rows, d, k, nq, buf, scales, q, b_rows,
                      subspaces: int = 64, opq_iters: int = 0,
                      adc_impls=None, rerank: int = 0) -> None:
    """The IVF-PQ half of the claimed-scale measurement (split out so
    ``--tiers ivfpq`` can re-measure ADC changes without re-paying the
    IVF build). ``subspaces``/``opq_iters`` drive the VERDICT r3 #1
    fidelity sweep (S ∈ {64, 128} at D=512; OPQ rotation on/off)."""
    from evr_tpu.index.ivfpq import IVFPQIndex

    if adc_impls is None:
        # measure both formulations on TPU (pallas is the production
        # default for this unpaired layout since round 5); CPU smokes of
        # this path stay xla-only (interpret-mode pallas is glacial)
        import jax as _jax

        adc_impls = (
            ("xla", "pallas") if _jax.default_backend() == "tpu" else ("xla",)
        )
    sub = subspaces if d % subspaces == 0 else (64 if d % 64 == 0 else 32)
    t0 = time.perf_counter()
    pq = IVFPQIndex().build_device(
        buf, n_clusters=k, n_subspaces=sub, capacity_factor=1.3,
        coarse_iters=6, pq_iters=6, row_scales=scales, slab_rows=500_000,
        opq_iters=opq_iters,
    )
    pq_build = time.perf_counter() - t0
    print(f"  ivfpq build (k={k}, S={sub}, opq={opq_iters}, packed): "
          f"{pq_build:.1f}s "
          f"({rows * sub / 1e9:.2f} GB codes, overflow pool: "
          f"{int(pq.overflow.shape[0]):,} rows)", flush=True)
    if rerank:
        # two-tier serving shape (VERDICT r3 #1): PQ codes stay the only
        # HBM-resident index; the full-fidelity int8 rows live in HOST
        # DRAM and exact-re-rank the ADC top-R. The one-time D2H of the
        # corpus is the store build (production would mmap it from disk).
        t0 = time.perf_counter()
        host_rows = np.asarray(buf)
        host_scales = np.asarray(scales)
        pq.attach_host_store(host_rows, host_scales)
        print(f"  host store D2H: {time.perf_counter() - t0:.1f}s "
              f"({host_rows.nbytes / 1e9:.2f} GB in host DRAM)", flush=True)
        depths = (
            rerank if isinstance(rerank, (list, tuple)) else [rerank]
        )
        for rr in depths:
            for nprobe in (8, 32):
                _, rws = pq.search(q, 10, nprobe=nprobe, rerank=rr)
                ms = _best_ms(
                    lambda: pq.search(q, 10, nprobe=nprobe, rerank=rr),
                    max(2, reps // 4),
                )
                print(
                    f"N={rows:>11,}  ivfpq S={sub} rerank={rr} "
                    f"nprobe={nprobe:>3}: {ms:8.1f} ms/batch({nq})  "
                    f"recall@10={_recall(rws, b_rows):.3f}  "
                    f"tie@10={_tie_recall(q, buf, scales, rws, b_rows):.3f}  "
                    f"recall1@10={_recall_1_at_k(rws, b_rows):.3f}",
                    flush=True,
                )
    for impl in adc_impls:
        for nprobe in (8, 32, 64, 128):
            _, rws = pq.search(q, 10, nprobe=nprobe, adc_impl=impl)
            ms = _best_ms(
                lambda: pq.search(q, 10, nprobe=nprobe, adc_impl=impl),
                max(2, reps // 4),
            )
            dev_ms = _batched_device_ms(
                lambda q1, *ops, _np=nprobe, _c=pq._capacity, _i=impl: (
                    IVFPQIndex._probe_adc_search_packed(
                        q1,
                        q1 if pq.rotation is None else q1 @ pq.rotation,
                        *ops, 10, _np, _c, _i,
                    )
                ),
                q,
                ops=(pq.centroids, pq.codebooks, pq.codes_lists,
                     pq.id_lists, pq._pool_recon(), pq.overflow),
            )
            print(
                f"N={rows:>11,}  ivfpq S={sub} {impl:>6} "
                f"nprobe={nprobe:>3}: {ms:8.1f} "
                f"ms/batch({nq})  device {dev_ms:7.2f} ms/batch  "
                f"recall@10={_recall(rws, b_rows):.3f}  "
                f"tie@10={_tie_recall(q, buf, scales, rws, b_rows):.3f}  "
                f"recall1@10={_recall_1_at_k(rws, b_rows):.3f}",
                flush=True,
            )


def bench_ann_streamed(reps: int, rows: int, d: int = 512,
                       n_clusters: int = 16_384, subspaces: int = 64,
                       opq_iters: int = 0, rerank: int = 0,
                       nq: int = 32, slab_rows: int = 500_000,
                       n_centers: int = 16_384, seed: int = 0) -> None:
    """VERDICT r3 #1 at the CLAIMED scale: N=100M on a 16 GB chip, where
    the corpus (51 GB int8 / 205 GB fp32) cannot exist in HBM and IVF-PQ
    codes (~N·S·1.1 bytes) are the ONLY resident index. The corpus is a
    deterministic function of (seed, slab index) — the same clustered
    recipe as `_device_corpus_int8`, canonicalised through int8
    quantisation — so the build, the exact oracle, and the optional host
    re-rank store all stream slab regenerations instead of ever holding
    the corpus. With ``rerank > 0`` the exact re-scores of the ADC top-R
    come from device slab regeneration too (bit-identical fidelity to the
    production host-store re-rank — `attach_host_store` — whose gather
    cost is measured at the 10M tier; a 51 GB D2H through this
    environment's relay stalled mid-transfer when attempted, so the
    measurement path never downloads the corpus).

    Prints build seconds, device ms/query-batch vs nprobe, and
    recall@10 / tie@10 / recall1@10 against a streamed exact oracle."""
    import functools

    import jax
    import jax.numpy as jnp

    from evr_tpu.index.ivfpq import IVFPQIndex

    assert rows % slab_rows == 0, "rows must tile into equal slabs"
    n_slabs = rows // slab_rows
    noise = 0.35 / float(np.sqrt(d))

    key = jax.random.PRNGKey(seed)
    kc, key = jax.random.split(key)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    # fixed BEFORE the jits close over it — the per-slab stream must not
    # depend on later Python-level key reassignment (late-binding closure)
    slab_root = jax.random.fold_in(key, 987_654)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_slab_int8(c, slab_idx, m):
        k1, k2 = jax.random.split(jax.random.fold_in(slab_root, slab_idx))
        cid = jax.random.randint(k1, (m,), 0, c.shape[0])
        x = c[cid] + noise * jax.random.normal(k2, (m, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1) / 127.0, 1e-12)
        q8 = jnp.round(x / scale[:, None]).astype(jnp.int8)
        return q8, scale

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_slab_fp32(c, slab_idx, m):
        q8, scale = gen_slab_int8(c, slab_idx, m)
        return q8.astype(jnp.float32) * scale[:, None]

    def slab_fn(start, m):
        return gen_slab_fp32(centers, jnp.int32(start // slab_rows), m)

    # queries: near-corpus rows from slab 0 (the 10M recipe)
    kq, key = jax.random.split(key)
    first = slab_fn(0, slab_rows)
    q = first[:nq] + (0.1 / float(np.sqrt(d))) * jax.random.normal(
        kq, (nq, d), jnp.float32
    )
    q = np.asarray(q / jnp.linalg.norm(q, axis=1, keepdims=True))
    del first

    sub = subspaces if d % subspaces == 0 else 64
    cf = 1.1
    print(f"streamed build: N={rows:,} D={d} k={n_clusters} S={sub} "
          f"cf={cf} opq={opq_iters} "
          f"(codes ≈ {rows * sub * cf / 1e9:.1f} GB HBM; corpus never "
          f"resident)", flush=True)
    t0 = time.perf_counter()
    pq = IVFPQIndex().build_device_streamed(
        slab_fn, rows, d, n_clusters=n_clusters, n_subspaces=sub,
        capacity_factor=cf, coarse_iters=6, pq_iters=6,
        opq_iters=opq_iters, slab_rows=slab_rows,
        assign_sub_rows=12_500,
        progress=lambda m: print(f"  [{time.perf_counter() - t0:7.1f}s] {m}",
                                 flush=True),
    )
    build_s = time.perf_counter() - t0
    print(f"  build total: {build_s:.1f}s (capacity={pq._capacity}, "
          f"overflow {int(pq.overflow.shape[0]):,})", flush=True)

    # ---- streamed exact oracle: top-10 + per-row exact scorer ----------
    # the build's cached executables (and their donated-buffer aliases)
    # are dead weight next to the 7.5 GB resident codes — drop them
    # before the oracle allocates its own slab transients
    import gc as _gc

    jax.clear_caches()
    _gc.collect()
    qd = jnp.asarray(q)

    # qd is an ARGUMENT, not a closure: closed-over device arrays become
    # jaxpr constants, which both re-uploads them per compile and routes
    # a D2H fetch through the relay at trace time (observed failing with
    # RESOURCE_EXHAUSTED under HBM pressure at the 100M geometry)
    @functools.partial(jax.jit, static_argnames=("m",), donate_argnums=(2, 3))
    def oracle_step(c, qq, best_s, best_r, slab_idx, start, m):
        slab = gen_slab_fp32(c, slab_idx, m)
        sco = jax.lax.dot_general(
            qq, slab, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [B, m]
        s1, p1 = jax.lax.top_k(sco, 10)
        r1 = p1.astype(jnp.int32) + start
        s_all = jnp.concatenate([best_s, s1], axis=1)
        r_all = jnp.concatenate([best_r, r1], axis=1)
        s2, p2 = jax.lax.top_k(s_all, 10)
        return s2, jnp.take_along_axis(r_all, p2, axis=1)

    t0 = time.perf_counter()
    best_s = jnp.full((nq, 10), -jnp.inf, jnp.float32)
    best_r = jnp.full((nq, 10), -1, jnp.int32)
    # host-side checkpoint of the running top-10: oracle_step DONATES
    # best_s/best_r, so after a failed dispatch those buffers may already
    # be invalidated — the retry must rebuild from the last good host
    # snapshot, not re-feed possibly-deleted arrays (ADVICE r4). The
    # arrays are tiny ([nq, 10]); snapshot every 8 slabs to keep relay
    # round trips negligible.
    ckpt_i, ckpt_s, ckpt_r = 0, np.asarray(best_s), np.asarray(best_r)
    i = 0
    retried = False
    while i < n_slabs:
        start = i * slab_rows
        try:
            best_s, best_r = oracle_step(
                centers, qd, best_s, best_r, jnp.int32(i),
                jnp.int32(start), slab_rows,
            )
        except Exception as e:  # one retry after dropping caches
            if retried:
                raise
            retried = True
            print(f"  oracle slab {i}: {type(e).__name__}; clearing "
                  f"caches, rewinding to slab {ckpt_i} and retrying once",
                  flush=True)
            jax.clear_caches()
            _gc.collect()
            time.sleep(5)
            i = ckpt_i
            best_s = jnp.asarray(ckpt_s)
            best_r = jnp.asarray(ckpt_r)
            continue
        i += 1
        if i % 8 == 0 or i == n_slabs:
            ckpt_i = i
            ckpt_s, ckpt_r = np.asarray(best_s), np.asarray(best_r)
    b_scores = np.asarray(best_s)
    b_rows = np.asarray(best_r)
    print(f"  exact oracle pass: {time.perf_counter() - t0:.1f}s",
          flush=True)

    T_PAD = 4096  # fixed gather width -> ONE remote compile for all calls

    @functools.partial(jax.jit, static_argnames=("m",))
    def score_rows(c, qq, slab_idx, local_rows, m):
        slab = gen_slab_fp32(c, slab_idx, m)
        rowsv = slab[local_rows]                            # [T_PAD, D]
        return rowsv @ qq.T                                 # [T_PAD, B]

    def exact_scores_of(rws):
        """[B, R] exact scores of specific rows via slab regeneration —
        one jitted gather+dot per slab that contains any requested row
        (requests padded to a fixed width so the kernel compiles once)."""
        rws = np.asarray(rws)
        out = np.full(rws.shape, -np.inf, np.float32)
        need = sorted({int(r) // slab_rows for r in rws.ravel() if r >= 0})
        for si in need:
            mask = (rws >= si * slab_rows) & (rws < (si + 1) * slab_rows)
            if not mask.any():
                continue
            flat = np.flatnonzero(mask.ravel())
            local = (rws.ravel()[flat] - si * slab_rows).astype(np.int32)
            for lo in range(0, len(flat), T_PAD):
                part = flat[lo : lo + T_PAD]
                lpart = local[lo : lo + T_PAD]
                padded = np.zeros((T_PAD,), np.int32)
                padded[: len(lpart)] = lpart
                sc = np.asarray(
                    score_rows(centers, qd, jnp.int32(si),
                               jnp.asarray(padded), slab_rows)
                )                                           # [T_PAD, B]
                bidx = part // rws.shape[1]
                out.ravel()[part] = sc[np.arange(len(part)), bidx]
        return out

    eps = 1e-3

    def metrics_pre(rws, exact):
        rec = _recall(rws, b_rows)
        r1 = _recall_1_at_k(rws, b_rows)
        thresh = b_scores[:, -1] - eps
        valid = rws >= 0
        tie = float(np.mean(np.where(valid, exact >= thresh[:, None], False)))
        return rec, tie, r1

    def metrics(rws):
        return metrics_pre(rws, exact_scores_of(rws))

    q8b = q[:8]
    rr_list = sorted(
        rerank if isinstance(rerank, (list, tuple))
        else ([rerank] if rerank else [])
    )
    deep = rr_list[-1] if rr_list else 0
    if rr_list:
        print(
            "  rerank source: device slab-regeneration exact scoring "
            "(fidelity-identical to the attach_host_store production "
            "tier; its host gather cost is the 10M-measured row — a "
            "51 GB D2H through this relay stalled mid-transfer when "
            "attempted, so the measurement never downloads the corpus)",
            flush=True,
        )

    def search_chunked(top_k, nprobe):
        # B=32 through the packed ADC at this list geometry (C~6.7k)
        # would put ~7 GB of one-hot transients in HBM next to the
        # ~7.5 GB resident codes — chunk the metric queries to 8
        outs_s, outs_r = [], []
        for lo in range(0, q.shape[0], 8):
            s_, r_ = pq.search(q[lo : lo + 8], top_k, nprobe=nprobe)
            outs_s.append(s_)
            outs_r.append(r_)
        return np.concatenate(outs_s), np.concatenate(outs_r)

    # device row: the impl the PRODUCTION search path resolves to
    # ("auto" = xla by the round-5 real-index decision, PERF.md §ADC),
    # so the recorded device cost is the served one
    import jax as _jax

    adc_default = "xla"
    for nprobe in (4, 8, 16, 32):
        ms = _best_ms(lambda: pq.search(q8b, 10, nprobe=nprobe),
                      max(2, reps // 4))
        dev_ms = _batched_device_ms(
            lambda q1, *ops, _np=nprobe, _c=pq._capacity: (
                IVFPQIndex._probe_adc_search_packed(
                    q1,
                    q1 if pq.rotation is None else q1 @ pq.rotation,
                    *ops, 10, _np, _c, adc_default,
                    interpret=_jax.default_backend() != "tpu",
                    paired=pq._paired,
                )
            ),
            q8b,
            ops=(pq.centroids, pq.codebooks, pq.codes_lists,
                 pq.id_lists, pq._pool_recon(), pq.overflow),
        )
        if deep:
            t0 = time.perf_counter()
            _, rw_deep = search_chunked(deep, nprobe)
            exact_deep = exact_scores_of(rw_deep)   # ONE regen pass/nprobe
            print(f"  [exact pass nprobe={nprobe}: "
                  f"{time.perf_counter() - t0:.0f}s]", flush=True)
            # ADC ranking is deterministic: its top-10 is the deep prefix
            rec, tie, r1 = metrics_pre(rw_deep[:, :10], exact_deep[:, :10])
        else:
            _, rws10 = search_chunked(10, nprobe)
            rec, tie, r1 = metrics(rws10)
        print(
            f"N={rows:>12,}  ivfpq S={sub} nprobe={nprobe:>3}"
            f"          : {ms:8.1f} ms/batch(8)  device[{adc_default}] "
            f"{dev_ms:7.2f} ms/batch  recall@10={rec:.3f}  "
            f"tie@10={tie:.3f}  recall1@10={r1:.3f}",
            flush=True,
        )
        for rr in rr_list:
            cr = rw_deep[:, :rr]
            ce = exact_deep[:, :rr]
            order = np.argsort(-ce, axis=1)[:, :10]
            rws = np.take_along_axis(cr, order, axis=1)
            exact_r = np.take_along_axis(ce, order, axis=1)
            # e2e cost of the device half of a rerank=rr query: the ADC
            # probe fetching R candidates (the host re-score itself is
            # the 10M-measured gather+dot row in PERF.md)
            ms_rr = _best_ms(
                lambda: pq.search(q8b, rr, nprobe=nprobe),
                max(2, reps // 4),
            )
            rec, tie, r1 = metrics_pre(rws, exact_r)
            print(
                f"N={rows:>12,}  ivfpq S={sub} nprobe={nprobe:>3} "
                f"rerank={rr}: {ms_rr:8.1f} ms/batch(8) ADC-fetch-R  "
                f"recall@10={rec:.3f}  tie@10={tie:.3f}  "
                f"recall1@10={r1:.3f}",
                flush=True,
            )


def bench_adc(
    reps: int, d: int = 512, s: int = 64, kk: int = 256, b: int = 8,
    capacity: int = 1664, n_lists: int = 512, o: int = 57_344,
) -> None:
    """ADC formulation shoot-out at the measured 10M-row geometry
    (C=1664, S=64, K=256, B=8 — PERF.md §ADC) on SYNTHETIC codes, so the
    kernel re-measures without re-paying the 10M build.

    CAUTION (round-5 decision record, PERF.md §ADC): this synthetic
    setup (uniform-random codes, arange ids, an oversized 57k-row pool)
    favoured pallas by up to 2.5×, but on BOTH real tiers xla won at
    every nprobe — use `bench_kernels ivfpq --rows 10000000 --tiers
    ivfpq` (measures both impls on a real build) to decide defaults;
    this mode is for kernel iteration only. Measured here:

      - full packed probe+ADC dispatch, xla (HBM one-hot) vs pallas
        (in-VMEM one-hot, `ops/adc_pallas.py`), incl. the reconstructed
        overflow-pool GEMM both now share;
      - kernel-only `adc_list_scores`, VPU multiply-reduce vs MXU matvec
        (`fused=`), at matching [B·nprobe, C, S] block shapes."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.index.ivfpq import IVFPQIndex
    from evr_tpu.ops.adc_pallas import adc_list_scores

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    codes_lists = jax.random.randint(
        ks[0], (n_lists * capacity, s), 0, kk, jnp.int32
    ).astype(jnp.uint8)
    id_lists = jnp.arange(n_lists * capacity, dtype=jnp.int32)
    cents = jax.random.normal(ks[1], (n_lists, d), jnp.float32)
    cents = cents / jnp.linalg.norm(cents, axis=1, keepdims=True)
    books = 0.05 * jax.random.normal(ks[2], (s, kk, d // s), jnp.float32)
    recon = jax.random.normal(ks[3], (o, d), jnp.float32)
    overflow_ids = (
        jnp.arange(o, dtype=jnp.int32) + jnp.int32(n_lists * capacity)
    )
    q = jax.random.normal(ks[4], (b, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    print(
        f"geometry: C={capacity} S={s} K={kk} B={b} lists={n_lists} "
        f"pool={o:,} (codes {n_lists * capacity * s / 1e6:.0f} MB)"
    )

    probes = [p_ for p_ in (8, 32, 128) if p_ <= n_lists]
    for impl in ("xla", "pallas"):
        for nprobe in probes:
            dev_ms = _batched_device_ms(
                lambda q1, *ops, _np=nprobe, _i=impl: (
                    IVFPQIndex._probe_adc_search_packed(
                        q1, q1, *ops, 10, _np, capacity, _i
                    )
                ),
                q,
                ops=(cents, books, codes_lists, id_lists, recon,
                     overflow_ids),
            )
            print(
                f"probe+ADC {impl:>6} nprobe={nprobe:>3}: device "
                f"{dev_ms:8.2f} ms/batch({b})", flush=True,
            )

    for fused in (False, True):
        for nprobe in probes:
            blocks = jax.random.randint(
                ks[5], (b * nprobe, capacity, s), 0, kk, jnp.int32
            ).astype(jnp.uint8)

            def _kernel_call(q1, blocks_, books_, _f=fused):
                bq = q1.shape[0]
                qs = q1.reshape(bq, s, d // s).transpose(1, 0, 2)
                tables = jnp.einsum(
                    "sbd,skd->bsk", qs, books_,
                    preferred_element_type=jnp.float32,
                )
                np_ = blocks_.shape[0] // bq
                return adc_list_scores(
                    blocks_, tables, nprobe=np_, fused=_f
                ), None

            mode = "mxu-matvec" if fused else "vpu-reduce"
            try:
                dev_ms = _batched_device_ms(
                    _kernel_call, q, ops=(blocks, books)
                )
            except Exception as e:  # record the negative result, keep going
                # (measured round 5: fused=True's [S,K]→[S·K,1] reshape is
                # an unsupported Mosaic shape cast on v5e — the vpu-reduce
                # default is the only TPU-lowerable variant)
                print(
                    f"kernel-only {mode} nprobe={nprobe:>3}: "
                    f"COMPILE-FAIL ({type(e).__name__}: "
                    f"{str(e).splitlines()[0][:90]})", flush=True,
                )
                continue
            print(
                f"kernel-only {mode} nprobe={nprobe:>3}: device "
                f"{dev_ms:8.2f} ms/batch({b})", flush=True,
            )


def bench_sharded(reps: int, n: int = 1_000_000, d: int = 512) -> None:
    """Sharded-vs-unsharded ANN tier on whatever devices exist (VERDICT r3
    #3 done-gate: the single-chip no-regression row). On ONE device the
    sharded classes must cost ~the unsharded tier (same probe program plus
    a degenerate all_gather); on the 8-device CPU mesh the same command
    shows the scale-out shape. Times are e2e `.search` calls (host API,
    per-dispatch sync) — the serving-facing cost, batch 8, nprobe=32."""
    import jax
    from jax.sharding import Mesh

    from evr_tpu.index.ivf import IVFIndex
    from evr_tpu.index.ivfpq import IVFPQIndex
    from evr_tpu.parallel.sharded_ann import (
        ShardedIVFIndex, ShardedIVFPQIndex,
    )

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    print(f"devices: {len(devs)} ({devs[0].platform})")
    emb, q, b_rows, ms = _ann_setup(n, d, 8, reps)
    print(f"N={n:>9,}  brute GEMM                 : {ms:8.2f} ms/batch(8)")

    k = 1024
    nprobe = 32
    idx = IVFIndex().build(emb, n_clusters=k, capacity_factor=1.3, iters=6)
    idx.search(q, 10, nprobe=nprobe)  # compile+warm
    ms1 = _best_ms(lambda: idx.search(q, 10, nprobe=nprobe), reps)
    _, r1 = idx.search(q, 10, nprobe=nprobe)
    rec1 = _recall(r1, b_rows)
    print(f"N={n:>9,}  ivf  unsharded nprobe={nprobe}   : {ms1:8.2f} "
          f"ms/batch(8)  recall@10={rec1:.3f}")

    # per-shard cluster count keeps probe work ~constant per device
    ks = max(64, k // len(devs))
    sidx = ShardedIVFIndex(mesh).build(
        emb, n_clusters=ks, capacity_factor=1.3, iters=6
    )
    sidx.search(q, 10, nprobe=nprobe)
    ms2 = _best_ms(lambda: sidx.search(q, 10, nprobe=nprobe), reps)
    _, r2 = sidx.search(q, 10, nprobe=nprobe)
    rec2 = _recall(r2, b_rows)
    print(f"N={n:>9,}  ivf  sharded k/shard={ks:<5}: {ms2:8.2f} "
          f"ms/batch(8)  recall@10={rec2:.3f}  "
          f"({ms2 / ms1:.2f}x unsharded)")
    del idx, sidx

    pq = IVFPQIndex().build(
        emb, n_clusters=k, n_subspaces=64, capacity_factor=1.3,
        coarse_iters=6, pq_iters=6,
    )
    pq.search(q, 10, nprobe=nprobe, rerank=200)
    ms3 = _best_ms(lambda: pq.search(q, 10, nprobe=nprobe, rerank=200), reps)
    _, r3 = pq.search(q, 10, nprobe=nprobe, rerank=200)
    rec3 = _recall(r3, b_rows)
    print(f"N={n:>9,}  ivfpq unsharded +rr200     : {ms3:8.2f} "
          f"ms/batch(8)  recall@10={rec3:.3f}")

    spq = ShardedIVFPQIndex(mesh).build(
        emb, n_clusters=ks, n_subspaces=64, capacity_factor=1.3,
        coarse_iters=6, pq_iters=6,
    )
    spq.search(q, 10, nprobe=nprobe, rerank=200)
    ms4 = _best_ms(
        lambda: spq.search(q, 10, nprobe=nprobe, rerank=200), reps
    )
    _, r4 = spq.search(q, 10, nprobe=nprobe, rerank=200)
    rec4 = _recall(r4, b_rows)
    print(f"N={n:>9,}  ivfpq sharded k/shard={ks:<4}+rr200: {ms4:8.2f} "
          f"ms/batch(8)  recall@10={rec4:.3f}  "
          f"({ms4 / ms3:.2f}x unsharded)")


def jnp_sum_probe(x) -> float:
    """Scalar fetch — the only reliable device sync on the relayed
    transport (block_until_ready is a no-op there, CLAUDE.md)."""
    import jax.numpy as jnp

    return jnp.sum(x.astype(jnp.float32))


def bench_ivf(reps: int, ns=(100_000, 1_000_000), d: int = 512) -> None:
    """IVF ANN vs brute-force GEMM at growing corpus sizes (recall@10 shown
    so the speed/recall trade is visible in one table)."""
    from evr_tpu.index.ivf import IVFIndex

    nq = 32
    for n in ns:
        emb, q, b_rows, ms = _ann_setup(n, d, nq, reps)
        print(f"N={n:>9,}  brute GEMM           : {ms:8.2f} ms/batch({nq})")

        k = 1024 if n >= 1_000_000 else (256 if n >= 100_000 else max(8, n // 100))
        idx = IVFIndex().build(emb, n_clusters=k, capacity_factor=1.3, iters=6)
        for nprobe in (8, 32, 64):
            idx.search(q, 10, nprobe=nprobe)  # compile+warm
            ms = _best_ms(lambda: idx.search(q, 10, nprobe=nprobe), reps)
            _, rows = idx.search(q, 10, nprobe=nprobe)
            print(
                f"N={n:>9,}  ivf k={k} nprobe={nprobe:>3}: {ms:8.2f} ms/batch({nq})"
                f"  recall@10={_recall(rows, b_rows):.3f}"
            )


def bench_pq(reps: int, ns=(100_000, 1_000_000), d: int = 512) -> None:
    """PQ (ADC over uint8 codes) vs brute-force GEMM: latency, recall@10,
    and resident bytes per row — the memory-tier trade in one table."""
    from evr_tpu.index.pq import PQIndex

    nq = 32
    for n in ns:
        emb, q, b_rows, ms = _ann_setup(n, d, nq, reps)
        print(f"N={n:>9,}  brute fp32 ({4*d:>4}B/row): {ms:8.2f} ms/batch({nq})")

        sub = 64 if d % 64 == 0 else 32
        idx = PQIndex().build(emb, n_subspaces=sub, n_centroids=256, iters=6)
        for rerank in (None, 200):
            idx.search(q, 10, rerank=rerank)  # compile+warm
            ms = _best_ms(lambda: idx.search(q, 10, rerank=rerank), reps)
            _, rows = idx.search(q, 10, rerank=rerank)
            label = f"pq S={sub} ({sub:>4}B/row)" + (
                f" +rerank{rerank}" if rerank else ""
            )
            print(
                f"N={n:>9,}  {label:22s}: {ms:8.2f} ms/batch({nq})"
                f"  recall@10={_recall(rows, b_rows):.3f}"
            )


def bench_ivfpq(reps: int, ns=(100_000, 1_000_000), d: int = 512) -> None:
    """IVF-PQ (probed + compressed) vs brute force: the full 100M-row
    recipe at benchable scale — latency, recall@10, HBM bytes per row."""
    from evr_tpu.index.ivfpq import IVFPQIndex

    nq = 32
    for n in ns:
        emb, q, b_rows, ms = _ann_setup(n, d, nq, reps)
        print(f"N={n:>9,}  brute fp32 ({4*d:>4}B/row): {ms:8.2f} ms/batch({nq})")

        k = 1024 if n >= 1_000_000 else 256
        sub = 64 if d % 64 == 0 else 32
        idx = IVFPQIndex().build(
            emb, n_clusters=k, n_subspaces=sub, n_centroids=256,
            capacity_factor=1.3, coarse_iters=6, pq_iters=6,
        )
        bpr = idx.code_bytes // n + 4  # codes + row-id
        for nprobe, rerank in ((32, None), (32, 200), (64, 200)):
            idx.search(q, 10, nprobe=nprobe, rerank=rerank)  # warm
            ms = _best_ms(
                lambda: idx.search(q, 10, nprobe=nprobe, rerank=rerank), reps
            )
            _, rows = idx.search(q, 10, nprobe=nprobe, rerank=rerank)
            label = f"ivfpq k={k} np={nprobe}" + (
                f" rr={rerank}" if rerank else ""
            )
            print(
                f"N={n:>9,}  {label:22s} ({bpr:>3}B/row): {ms:8.2f} "
                f"ms/batch({nq})  recall@10={_recall(rows, b_rows):.3f}"
            )


def main() -> None:
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("what", choices=["block", "attention", "encode", "int8", "sweep", "roofline", "captioner", "siglip", "train", "train-phases", "umap", "whisper", "ivf", "pq", "ivfpq", "adc", "sharded", "all"])
    ap.add_argument("--reps", type=int, default=20, help="chained applications per dispatch")
    ap.add_argument(
        "--rows", type=int, default=None,
        help="ivf/ivfpq: measure at this corpus size. Past 2M rows the "
        "device-resident int8 path runs instead (corpus generated on-chip, "
        "build_device streaming — the honest 10M+ measurement, VERDICT r2 #8)",
    )
    ap.add_argument(
        "--subspaces", type=int, default=64,
        help="ivfpq big run: PQ subspaces S (bytes/row); 64 or 128 at D=512",
    )
    ap.add_argument(
        "--opq-iters", type=int, default=0,
        help="ivfpq big run: OPQ rotation training iterations (0 = plain)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="ivfpq big run: corpus-free streamed build "
        "(build_device_streamed) — the ≥100M regime where the corpus "
        "cannot exist in HBM; composes with --rerank for the two-tier "
        "host-DRAM exact re-rank measurement",
    )
    ap.add_argument(
        "--clusters", type=int, default=16_384,
        help="streamed run: coarse k (default 16384)",
    )
    ap.add_argument(
        "--rerank", default="0",
        help="ivfpq big run: exact host-DRAM re-rank of the ADC top-R "
        "(two-tier serving shape; downloads the int8 corpus once). "
        "Comma list sweeps depths on one build, e.g. 500,2000",
    )
    ap.add_argument(
        "--tiers", choices=["ivf", "ivfpq", "both"], default="both",
        help="which ANN tier(s) the big --rows run measures (ivfpq skips "
        "the IVF build when only the ADC path changed)",
    )
    args = ap.parse_args()

    import jax

    # (the former ',cpu' platform append for --stream --rerank is gone:
    # streamed rerank exact-scores come from DEVICE slab regeneration now,
    # never a CPU-backend host-store rebuild — see the rerank-source note
    # printed by _bench_ann_streamed.)
    try:
        jax.config.update("jax_compilation_cache_dir", f"/tmp/evr_tpu_jax_cache_{jax.default_backend()}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")

    runs = {
        "block": bench_block,
        "attention": bench_attention,
        "encode": bench_encode,
        "int8": bench_int8,
        "sweep": bench_sweep,
        "captioner": bench_captioner,
        "siglip": bench_siglip,
        "train": bench_train,
        "train-phases": bench_train_phases,
        "umap": bench_umap,
        "whisper": bench_whisper,
        "roofline": bench_roofline,
        "ivf": bench_ivf,
        "pq": bench_pq,
        "ivfpq": bench_ivfpq,
        "adc": bench_adc,
        "sharded": bench_sharded,
    }
    for name, fn in runs.items():
        if args.what in (name, "all"):
            print(f"== {name} ==")
            if name == "sharded" and args.rows:
                bench_sharded(args.reps, n=args.rows)
                continue
            if name in ("ivf", "ivfpq") and args.rows:
                if args.rows > 2_000_000:
                    args.rerank = [
                        int(x) for x in str(args.rerank).split(",")
                        if int(x) > 0
                    ]
                    if args.stream:
                        bench_ann_streamed(
                            args.reps, args.rows,
                            n_clusters=args.clusters,
                            subspaces=args.subspaces,
                            opq_iters=args.opq_iters, rerank=args.rerank,
                        )
                    else:
                        bench_ann_big(args.reps, args.rows,
                                      tiers=args.tiers,
                                      subspaces=args.subspaces,
                                      opq_iters=args.opq_iters,
                                      rerank=args.rerank)
                    break  # shared corpus run covers both tiers
                fn(args.reps, ns=(args.rows,))
            else:
                fn(args.reps)


if __name__ == "__main__":
    main()
