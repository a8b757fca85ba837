"""Worker program for the real multi-process test in test_multihost.py.

Launched as ``python tests/multihost_worker.py`` in N separate OS processes
(each given EVR_TPU_COORDINATOR / EVR_TPU_NUM_PROCESSES / EVR_TPU_PROCESS_ID
by the launcher). Each process sees 2 virtual CPU devices; jax.distributed
glues them into a 2N-device global set with Gloo TCP collectives — the same
topology shape as one-process-per-host TPU pods.

Also imported (not run) by the launcher for the shared tiny config/batch
builders, so worker and expected-value computation can never drift.
"""

import json
import os
import sys

if __name__ == "__main__":
    # Must precede the first `import jax`: pin CPU and 2 local devices.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import numpy as np

import jax

if __name__ == "__main__":
    # sitecustomize force-registers the axon TPU platform at config level;
    # pin back to CPU (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")


def tiny_cfg():
    from evr_tpu.models.clip import CLIPConfig, TextConfig, VisionConfig

    return CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2, heads=4),
        text=TextConfig(context_length=16, vocab_size=600, width=64, layers=2, heads=4),
    )


def full_global_batch(global_b: int):
    """Deterministic global batch — every process builds the same one and
    takes its process_slice, exactly like a seeded per-host data loader."""
    rng = np.random.default_rng(7)
    tokens = np.zeros((global_b, 16), np.int32)
    for i in range(global_b):
        ln = int(rng.integers(3, 10))
        tokens[i, :ln] = rng.integers(1, 500, size=ln)
        tokens[i, ln] = 599
    return {
        "images": (rng.random((global_b, 32, 32, 3)) * 255).astype(np.uint8),
        "tokens": tokens,
        "labels": rng.integers(0, 3, size=global_b).astype(np.int32),
    }


def contrastive_features(global_b: int, dim: int = 32):
    rng = np.random.default_rng(11)
    img = rng.normal(size=(global_b, dim)).astype(np.float32)
    txt = rng.normal(size=(global_b, dim)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt


def run_train_step_single(global_b: int) -> float:
    """Reference value: one unsharded single-process train step on the full
    global batch (runs in the launcher)."""
    import jax.numpy as jnp

    from evr_tpu.models.clip import init_clip_params
    from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
    from evr_tpu.training.finetune import TrainState

    cfg = tiny_cfg()
    tc = TrainConfig(compute_dtype="float32", patch_drop=0.0, batch_size=global_b)
    params = {"clip": init_clip_params(jax.random.PRNGKey(0), cfg)}
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, None, tc, opt)
    state = TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))
    _, metrics = step(state, full_global_batch(global_b), jax.random.PRNGKey(0))
    return float(metrics["contrastive_loss"])


def main() -> None:
    import jax.numpy as jnp

    from evr_tpu.models.clip import init_clip_params
    from evr_tpu.parallel import multihost as mh
    from evr_tpu.parallel.contrastive import make_sharded_infonce
    from evr_tpu.training import TrainConfig, make_optimizer, make_train_step
    from evr_tpu.training.finetune import TrainState

    pid, nproc = mh.bootstrap()
    assert nproc == int(os.environ["EVR_TPU_NUM_PROCESSES"]), nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc
    mesh = mh.global_mesh()

    # 1) global-batch InfoNCE across process boundaries.
    global_b = 2 * jax.device_count()
    img, txt = contrastive_features(global_b)
    scale = jnp.asarray(np.log(1 / 0.07), jnp.float32)
    sl = mh.process_slice(global_b)
    g = mh.make_global_batch(mesh, {"img": img[sl], "txt": txt[sl]})
    # multi-process arrays are only partially addressable: computations on
    # them must go through jit (shard_map composes under it)
    infonce = float(jax.jit(make_sharded_infonce(mesh))(g["img"], g["txt"], scale))

    # 2) broadcast: non-coordinators start from garbage, end with proc-0's.
    cfg = tiny_cfg()
    params = {"clip": init_clip_params(jax.random.PRNGKey(0), cfg)}
    reference_leaf = np.asarray(params["clip"]["visual"]["proj"])
    if pid != 0:
        params = jax.tree_util.tree_map(lambda x: x * 0.0 + 999.0, params)
    params = mh.broadcast_from_coordinator(params)
    bc_ok = bool(
        np.allclose(np.asarray(params["clip"]["visual"]["proj"]), reference_leaf)
    )

    # 3) one real train step: per-process rows -> global arrays -> the SAME
    # jitted step used single-host, over the multi-process mesh.
    tc = TrainConfig(compute_dtype="float32", patch_drop=0.0, batch_size=global_b)
    opt = make_optimizer(tc, params)
    step, _ = make_train_step(cfg, None, tc, opt, mesh=mesh)
    state = TrainState(
        params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32)
    )
    batch = full_global_batch(global_b)
    g_batch = mh.make_global_batch(mesh, {k: v[sl] for k, v in batch.items()})
    state, metrics = step(state, g_batch, jax.random.PRNGKey(0))
    train_loss = float(metrics["contrastive_loss"])

    # 3b) the SAME step fully sharded (fsdp/ZeRO-3) across the process
    # boundary: params + AdamW moments live 1/4-per-device spanning BOTH
    # processes; layout only — the loss must equal the dp step's.
    from evr_tpu.parallel.fsdp import fsdp_state_shardings, shard_tree

    opt_f = make_optimizer(tc, params)
    sh_f = fsdp_state_shardings(params, opt_f, mesh, min_size=256)
    params_f = shard_tree(params, sh_f.params)
    state_f = TrainState(
        params=params_f,
        opt_state=shard_tree(opt_f.init(params_f), sh_f.opt_state),
        step=jnp.zeros((), jnp.int32),
    )
    step_f, _ = make_train_step(cfg, None, tc, opt_f, mesh=mesh, state_shardings=sh_f)
    g_batch_f = mh.make_global_batch(mesh, {k: v[sl] for k, v in batch.items()})
    _, m_f = step_f(state_f, g_batch_f, jax.random.PRNGKey(0))
    fsdp_loss = float(m_f["contrastive_loss"])

    # 4) Trainer.fit across the process boundary: each process feeds its
    # per-process batch slice; Trainer._multihost glues them to global
    # arrays; only the coordinator writes the checkpoint.
    import tempfile

    from evr_tpu.training import Trainer

    ckpt_dir = os.environ.get("EVR_TPU_TEST_CKPT_DIR") or tempfile.mkdtemp()
    tc2 = TrainConfig(
        compute_dtype="float32", patch_drop=0.0, batch_size=global_b,
        epochs=1, freeze_layers=0, lr=1e-4,
        save_dir=os.path.join(ckpt_dir, "mh_ckpt"),
    )
    trainer = Trainer(
        tiny_cfg(), params["clip"], tc2, mesh=mesh, log_fn=lambda s: None
    )
    assert trainer._multihost
    local_batch = {k: v[sl] for k, v in full_global_batch(global_b).items()}
    fit_out = trainer.fit(lambda e: iter([local_batch]))
    fit_loss = fit_out["history"][-1]["train_contrastive_loss"]

    mh.barrier("multihost-test-end")
    # After the barrier every process must see the ONE checkpoint the
    # coordinator wrote (non-coordinators' save_checkpoint is a guarded
    # no-op — two orbax writers on the same path would collide).
    ckpt_written = os.path.exists(
        os.path.join(ckpt_dir, "mh_ckpt", "final_checkpoint")
    )
    print(
        "MHRESULT "
        + json.dumps(
            {
                "pid": pid,
                "nproc": nproc,
                "global_devices": jax.device_count(),
                "infonce": infonce,
                "bc_ok": bc_ok,
                "train_loss": train_loss,
                "fsdp_loss": fsdp_loss,
                "fit_loss": fit_loss,
                "ckpt_written": ckpt_written,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
