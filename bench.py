"""Benchmark: the BASELINE.json headline metrics on real hardware.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: frames embedded/sec/chip on CLIP ViT-B/32 — the chip's sustained
encode throughput on device-resident uint8 batches (normalise + full ViT
forward), measured as a `lax.scan` chain of encode steps inside ONE
dispatch with a single result fetch. The headline serving format is int8
block linears (the MXU's int8 path; promoted from opt-in after the
rank-agreement gate — models/quant_gate.py, tests/test_quant_gate.py,
PERF.md §int8): +31% over bf16 with rank-1 agreement and ≥9/10 top-10
overlap armored on real frames, near-duplicate corpora, scoped searches,
SigLIP and IVF composition. ``bf16_compute_fps`` reports the same chain
with bf16 weights (the `--params-dtype bfloat16` serving path). Chaining matters on
this environment's relayed transport (~30–60 ms per round trip): a
per-dispatch measurement charges one relay round trip to every batch and
understates the chip roughly 2× (that figure is still reported as
``compute_fps_percall``). The scan body gathers a different input buffer
each step, so XLA cannot hoist the encode out of the loop. This is the
like-for-like comparison against the reference's GPU loop
(`Backend/services/embedding_service.py:461-505`), whose 450 fps baseline
is measured on a host with local PCIe. ``e2e_relay_fps`` is the
staging→H2D→encode→D2H loop through this environment's transport, and
``h2d_MBps`` quantifies that transport so the numbers can be reconciled on
any host (see PERF.md for the methodology).

Extras also cover the retrieval side: p50 text-query latency over a
100k-frame HBM index — single query (fused one-dispatch path and two-step
path, both dominated by the relay round-trip here) and per-query amortised
over a 32-query batch (the device-side cost).

``vs_baseline`` divides by a provisional reference-GPU throughput constant
(the reference publishes no numbers — BASELINE.md). 450 img/s is a typical
ViT-B/32 fp32 batch-32 figure on the Kaggle T4 class of GPU its configs
target; replace with a measured baseline when GPU hardware is available.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_GPU_FPS = 450.0  # provisional T4-class fp32 batch-32 baseline
EMBED_BATCH = 256
N_INDEX = 100_000
EMBED_DIM = 512


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _sync(x) -> float:
    """Force a real device round-trip (block_until_ready may be a no-op on
    relayed platforms): fetch a scalar reduction."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _chained_encode(enc):
    """Jitted harness chaining ``n_steps`` encode calls in ONE dispatch
    (lax.scan; step-indexed buffers so XLA cannot hoist the body). Shared by
    the headline and the --full ViT-L measurement so both use the identical
    methodology."""
    import jax
    import jax.numpy as jnp

    def harness(params, buffers, n_steps):
        def body(carry, idx):
            return carry + jnp.sum(enc(params, buffers[idx % 2])), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_steps))
        return total

    return jax.jit(harness, static_argnames=("n_steps",))


def _train_throughput(rng, batch: int, n_steps: int = 10) -> float:
    """Chained production train-step throughput (ex/s) at ``batch`` —
    the PERF.md §Training methodology (10 steps in one dispatch, state
    donated, one sync)."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.models import (
        ClassifierConfig,
        get_model_config,
        init_classifier_params,
        init_clip_params,
    )
    from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
    from evr_tpu.training.finetune import TrainState

    cfg = get_model_config("ViT-B/32")
    params = {
        "clip": init_clip_params(jax.random.PRNGKey(0), cfg),
        "classifier": init_classifier_params(
            jax.random.PRNGKey(1), ClassifierConfig()
        ),
    }
    tc = TrainConfig(freeze_layers=8, batch_size=batch)
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, ClassifierConfig(), tc, opt)
    state = TrainState(
        params=jax.tree.map(jnp.asarray, params),
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    tokens = np.zeros((batch, 77), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1] = 49407
    batch_d = {
        "images": jnp.asarray(
            (rng.random((batch, 224, 224, 3)) * 255).astype(np.uint8)
        ),
        "tokens": jnp.asarray(tokens),
        "labels": jnp.asarray(rng.integers(0, 3, size=batch).astype(np.int32)),
    }

    def _train_chain(state_, batch_, keys):
        def body(s, k):
            s2, m = step(s, batch_, k)
            return s2, m["total_loss"]

        return jax.lax.scan(body, state_, keys)

    train_chain = jax.jit(_train_chain, donate_argnums=(0,))
    keys = jax.random.split(jax.random.PRNGKey(0), n_steps)
    state, losses = train_chain(state, batch_d, keys)  # compile + warm
    _sync(losses)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        state, losses = train_chain(state, batch_d, keys)
        _sync(losses)
        best = max(best, n_steps * batch / (time.perf_counter() - t0))
    return best


def _full_extras(rng):
    """--full mode: ViT-L/14@336 encode throughput (BASELINE config 2) and
    the data-parallel train-step throughput (config 4). Slow first-compile;
    not part of the default driver run."""
    import jax
    import jax.numpy as jnp

    from evr_tpu.index import EmbeddingEngine
    from evr_tpu.models import get_model_config

    extras = {}
    # ViT-B/32 train-step throughput: batch 64 (cross-round continuity)
    # and batch 128 (the round-5 knee, PERF.md §Training)
    extras["train_examples_per_sec_batch64"] = round(
        _train_throughput(rng, 64), 2
    )
    extras["train_examples_per_sec_batch128"] = round(
        _train_throughput(rng, 128), 2
    )

    # ViT-L/14@336 batch-64 encode — both end-to-end and device-resident
    lcfg = get_model_config("ViT-L/14@336px")
    lengine = EmbeddingEngine(cfg=lcfg, batch_size=64, rng_seed=0)
    staged = (rng.random((64, 336, 336, 3)) * 255).astype(np.uint8)
    lengine.encode_staged_images(staged)
    t0 = time.perf_counter()
    for _ in range(2):
        lengine.encode_staged_images(staged)
    extras["vitl336_fps_batch64"] = round(2 * 64 / (time.perf_counter() - t0), 2)
    # sustained device throughput, chained-scan (same methodology as the
    # headline: step-indexed buffers, one dispatch, one sync)
    lsus = jnp.asarray((rng.random((2, 64, 336, 336, 3)) * 255).astype(np.uint8))
    lchained = _chained_encode(lengine._encode_staged)
    LSTEPS = 8
    _sync(lchained(lengine.params, lsus, LSTEPS))
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(lchained(lengine.params, lsus, LSTEPS))
        best = max(best, LSTEPS * 64 / (time.perf_counter() - t0))
    extras["vitl336_compute_fps_batch64"] = round(best, 2)

    del lengine, lsus  # release ViT-L HBM before the dtype sweep

    # int8-quantized encode (models.quant): chained-scan sustained throughput,
    # same methodology as the headline, at the int8-optimal batch (64)
    qeng = EmbeddingEngine("ViT-B/32", batch_size=64, rng_seed=0, params_dtype="int8")
    qsus = jnp.asarray((rng.random((2, 64, 224, 224, 3)) * 255).astype(np.uint8))
    qchained = _chained_encode(qeng._encode_staged)
    QSTEPS = 32 if jax.default_backend() == "tpu" else 2
    _sync(qchained(qeng.params, qsus, QSTEPS))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(qchained(qeng.params, qsus, QSTEPS))
        best = max(best, QSTEPS * 64 / (time.perf_counter() - t0))
    extras["int8_compute_fps_batch64"] = round(best, 2)
    del qeng, qsus

    # index dtype sweep: batched-32 per-query latency over 100k rows
    from evr_tpu.index import FrameIndex

    emb = rng.normal(size=(N_INDEX, EMBED_DIM)).astype(np.float32)
    q32 = rng.normal(size=(32, EMBED_DIM)).astype(np.float32)
    for dtype_name in ("float32", "bfloat16", "int8"):
        idx = FrameIndex(embed_dim=EMBED_DIM, pad_multiple=1024, device_dtype=dtype_name)
        idx.add_video("bench", emb)
        idx.search_raw(q32, 10)
        t0 = time.perf_counter()
        for _ in range(10):
            idx.search_raw(q32, 10)
        extras[f"query_ms_batched32_{dtype_name}"] = round(
            (time.perf_counter() - t0) / 10 / 32 * 1e3, 3
        )
    return extras


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeated bench/driver runs skip the
    (minutes-long on relayed compilers) first-compile cost."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", f"/tmp/evr_tpu_jax_cache_{jax.default_backend()}"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> None:
    import sys

    # Bounded liveness probe: the relayed TPU backend can wedge
    # indefinitely (CLAUDE.md); fall back to CPU (warned, and recorded in
    # the JSON extras) rather than hang the driver's bench run.
    from evr_tpu.utils.tpu_guard import ensure_live_backend

    backend_probe = ensure_live_backend()

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from evr_tpu.index import EmbeddingEngine, FrameIndex

    backend = jax.default_backend()
    full_mode = "--full" in sys.argv
    # headline engine: int8 serving weights (rank-agreement gated; see
    # module docstring). bf16 is measured alongside as bf16_compute_fps.
    engine = EmbeddingEngine(
        "ViT-B/32", batch_size=EMBED_BATCH, rng_seed=0, params_dtype="int8"
    )

    rng = np.random.default_rng(0)
    staged = (rng.random((EMBED_BATCH, 224, 224, 3)) * 255).astype(np.uint8)

    # -- end-to-end frames/sec (H2D + encode + D2H); best of 3 rounds to
    # damp transport jitter on relayed links --------------------------------
    engine.encode_staged_images(staged)  # compile + warmup
    n_iters = 3
    e2e_fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            engine.encode_staged_images(staged)
        e2e_fps = max(e2e_fps, n_iters * EMBED_BATCH / (time.perf_counter() - t0))

    # -- compute-only frames/sec, per dispatch (one relay RT per batch) ----
    dev_batch = jnp.asarray(staged)
    _sync(engine._encode_staged(engine.params, dev_batch))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        _sync(engine._encode_staged(engine.params, dev_batch))
    compute_fps_percall = n_iters * EMBED_BATCH / (time.perf_counter() - t0)

    # -- HEADLINE: sustained device throughput — a lax.scan chain of encode
    # steps inside one dispatch, one sync at the end. Two distinct input
    # buffers gathered by step index keep the loop body non-invariant (XLA
    # would hoist a constant-input encode out of the scan). With the fused
    # Pallas block kernels, larger batches win (B=512 15.7k vs B=128 14.0k
    # on v5e — the kernels scale with rows; under the old XLA path small
    # batches won instead, B=128 10.3k vs B=512 8.2k — see PERF.md).
    # (on CPU the per-dispatch overhead the chain amortises doesn't exist;
    # keep the chain short so the bench stays runnable on a dev box)
    SUS_BATCH, SUS_STEPS = (512, 32) if backend == "tpu" else (128, 2)
    sus = jnp.asarray(
        (rng.random((2, SUS_BATCH, 224, 224, 3)) * 255).astype(np.uint8)
    )
    chained = _chained_encode(engine._encode_staged)
    _sync(chained(engine.params, sus, SUS_STEPS))  # compile + warm
    compute_fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(chained(engine.params, sus, SUS_STEPS))
        compute_fps = max(
            compute_fps, SUS_STEPS * SUS_BATCH / (time.perf_counter() - t0)
        )

    # bf16 weights, identical chain: the --params-dtype bfloat16 serving
    # path (the pre-promotion headline), reported alongside for comparison.
    beng = EmbeddingEngine(
        "ViT-B/32", batch_size=EMBED_BATCH, rng_seed=0, params_dtype="bfloat16"
    )
    bchained = _chained_encode(beng._encode_staged)
    _sync(bchained(beng.params, sus, SUS_STEPS))
    bf16_fps = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(bchained(beng.params, sus, SUS_STEPS))
        bf16_fps = max(bf16_fps, SUS_STEPS * SUS_BATCH / (time.perf_counter() - t0))
    del beng, bchained

    # -- H2D bandwidth -----------------------------------------------------
    t0 = time.perf_counter()
    for _ in range(2):
        _sync(jnp.asarray(staged))
    h2d_mbps = 2 * staged.nbytes / 1e6 / (time.perf_counter() - t0)

    # -- p50 query latency over a 100k-frame index ------------------------
    idx = FrameIndex(embed_dim=EMBED_DIM, pad_multiple=1024)
    idx.add_video("bench", rng.normal(size=(N_INDEX, EMBED_DIM)).astype(np.float32))
    idx.build()
    q1 = rng.normal(size=(1, EMBED_DIM)).astype(np.float32)
    idx.search_raw(q1, 10)  # compile
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        idx.search_raw(q1, 10)
        lat.append((time.perf_counter() - t0) * 1e3)
    p50_search = float(np.percentile(lat, 50))

    # batched queries amortise per-call transport: per-query latency at Q=32
    q32 = rng.normal(size=(32, EMBED_DIM)).astype(np.float32)
    idx.search_raw(q32, 10)
    t0 = time.perf_counter()
    for _ in range(10):
        idx.search_raw(q32, 10)
    batched_per_query = (time.perf_counter() - t0) / 10 / 32 * 1e3

    # end-to-end text query, two-step path: tokenize + encode_text + search
    engine.encode_texts(["warmup query"])
    e2e = []
    for i in range(15):
        t0 = time.perf_counter()
        vec = engine.encode_texts([f"a person fighting in scene {i % 3}"])
        idx.search_raw(vec, 10)
        e2e.append((time.perf_counter() - t0) * 1e3)
    p50_e2e = float(np.percentile(e2e, 50))

    # fused single-dispatch path (tokenize → encode → GEMM → top-k, one call)
    from evr_tpu.index.fused_search import TextSearcher

    searcher = TextSearcher(engine, idx)
    searcher.search("warmup fused", 10)
    fused = []
    for i in range(15):
        t0 = time.perf_counter()
        searcher.search(f"unique fused query {i}", 10)
        fused.append((time.perf_counter() - t0) * 1e3)
    p50_fused = float(np.percentile(fused, 50))

    # -- decompose the single-query number: relay RT vs device time --------
    # (a) pure transport round trip: fetch a scalar from a resident buffer —
    # no compute, no H2D; this is the floor ANY single blocking call pays
    # on this relayed platform.
    resident = jnp.zeros((8,), jnp.float32) + 1
    float(jnp.sum(resident))
    rts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(jnp.sum(resident))
        rts.append((time.perf_counter() - t0) * 1e3)
    relay_rt = float(np.percentile(rts, 50))

    # (b) device-side per-query latency: chain Q UNIQUE full queries
    # (tokenize done host-side; encode_text → GEMM → top-k on device) inside
    # ONE dispatch, sync once — the per-query time a directly-attached host
    # observes. This is the <50 ms-target evidence; the e2e numbers above
    # additionally carry this environment's ~relay_rt_ms round trip.
    from evr_tpu.models.clip import encode_text
    from evr_tpu.ops.topk import cosine_topk

    device_index, row_scales, start, end, _ = idx.snapshot(None)
    QN = 64
    qvecs = jnp.asarray(rng.normal(size=(QN, EMBED_DIM)).astype(np.float32))
    tok = engine.tokenizer(
        [f"a person fighting in scene {i}" for i in range(QN)],
        context_length=engine.cfg.text.context_length,
    )
    toks = jnp.asarray(tok)

    @jax.jit
    def chained_vec_search(index_dev, scales, queries):
        def body(c, q):
            s, _ = cosine_topk(index_dev, q[None], jnp.int32(start), jnp.int32(end), 10, scales)
            return c + jnp.sum(s) * 1e-9, ()

        out, _ = jax.lax.scan(body, jnp.float32(0), queries)
        return out

    @jax.jit
    def chained_text_search(params, index_dev, scales, tokens):
        def body(c, t):
            txt = encode_text(
                params, engine.cfg, t[None],
                dtype=engine.compute_dtype, eot_fast_final=True,
            )
            s, _ = cosine_topk(index_dev, txt, jnp.int32(start), jnp.int32(end), 10, scales)
            return c + jnp.sum(s) * 1e-9, ()

        out, _ = jax.lax.scan(body, jnp.float32(0), tokens)
        return out

    float(chained_vec_search(device_index, row_scales, qvecs))
    dev_vec = min(
        (_timed(lambda: float(chained_vec_search(device_index, row_scales, qvecs)))
         for _ in range(3))
    ) / QN * 1e3
    float(chained_text_search(engine.params, device_index, row_scales, toks))
    dev_txt = min(
        (_timed(lambda: float(chained_text_search(engine.params, device_index, row_scales, toks)))
         for _ in range(3))
    ) / QN * 1e3

    # round-5 training headline in the default artifact (B=128, the
    # measured knee — PERF.md §Training); guarded so a compile hiccup
    # never sinks the serving numbers
    train_extras = {}
    if backend == "tpu" and not full_mode:
        try:
            train_extras["train_examples_per_sec_batch128"] = round(
                _train_throughput(rng, 128), 2
            )
        except Exception as e:  # record, don't fail the bench
            train_extras["train_bench_error"] = str(e).replace("\n", " ")[:120]

    if full_mode:
        # unload the main-phase device state first (the reference's
        # memory-efficient load→eval→unload pattern, compare_models.py:1282):
        # leaving the index + staged buffers live measurably degrades the
        # in-process train-step dispatch on this relayed platform.
        import gc

        del idx, searcher, dev_batch, sus, engine
        del device_index, row_scales, qvecs, toks, resident
        del chained_vec_search, chained_text_search
        gc.collect()
        extras = _full_extras(rng)
    else:
        extras = {}

    if backend != "tpu":
        # Honest context for fallback artifacts: when the relay is wedged
        # (CLAUDE.md) this run measures a 1-core CPU, not the chip. Point
        # the reader at the last on-chip record so the artifact stays
        # interpretable; the number itself is still this run's truth.
        extras["onchip_note"] = (
            "TPU backend unavailable this run (backend_probe="
            f"{backend_probe}); last recorded on-chip headlines: "
            "22.7k f/s int8 (gated serving default, r3) / 17347 f/s bf16 "
            "(BENCH_r02/PERF.md)"
        )

    print(
        json.dumps(
            {
                "metric": "frames_embedded_per_sec_per_chip_vitb32",
                "value": round(compute_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(compute_fps / REFERENCE_GPU_FPS, 3),
                "backend": backend,
                "backend_probe": backend_probe,
                "compute_fps_percall": round(compute_fps_percall, 2),
                "e2e_relay_fps": round(e2e_fps, 2),
                "h2d_MBps": round(h2d_mbps, 1),
                "p50_query_latency_ms_100k": round(p50_search, 3),
                "p50_query_latency_ms_100k_batched32": round(batched_per_query, 3),
                "p50_e2e_text_query_ms_100k": round(p50_e2e, 3),
                "p50_fused_text_query_ms_100k": round(p50_fused, 3),
                "headline_params_dtype": "int8",
                "bf16_compute_fps": round(bf16_fps, 2),
                "relay_rt_ms": round(relay_rt, 3),
                "p50_device_query_latency_ms_100k": round(dev_vec, 3),
                "p50_device_fused_text_query_ms_100k": round(dev_txt, 3),
                "embed_batch_sustained": SUS_BATCH,
                "embed_batch_percall": EMBED_BATCH,
                **train_extras,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
