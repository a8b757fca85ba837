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

    def timeit(fn, x, label):
        def chained(x_):
            def body(c, _):
                o = fn(c)
                return (0.98 * c + 0.02 * o.astype(c.dtype)).astype(c.dtype), ()

            out, _ = jax.lax.scan(body, x_, None, length=reps)
            return jnp.sum(out.astype(jnp.float32))

        run = jax.jit(chained)
        float(run(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, (time.perf_counter() - t0) / reps * 1000)
        print(f"{label:42s}: {best:8.4f} ms")
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
        a = timeit(lambda y: block_apply(y, p, H, causal, "xla", act), x, "  XLA composition")
        b = timeit(
            lambda y: fused_block_apply(y, p, H, act, causal), x, "  fused Pallas block"
        )
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
        k = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        print(f"-- {label}")
        timeit(lambda qq: _xla_attention(qq, k, v, False), q, "  XLA einsum+softmax")
        timeit(lambda qq: flash_attention(qq, k, v), q, "  flash kernel")


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
    for model, B in [("ViT-B/32", 128), ("ViT-L/14@336px", 64)]:
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


def bench_sweep(reps: int) -> None:
    for B in (64, 128, 256, 512, 768):
        fps = _encode_fps("ViT-B/32", B, reps)
        print(f"B={B:4d}: {fps:9.0f} frames/s sustained")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("what", choices=["block", "attention", "encode", "int8", "sweep", "all"])
    ap.add_argument("--reps", type=int, default=20, help="chained applications per dispatch")
    args = ap.parse_args()

    import jax

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
    }
    for name, fn in runs.items():
        if args.what in (name, "all"):
            print(f"== {name} ==")
            fn(args.reps)


if __name__ == "__main__":
    main()
