"""Production fine-tune CLI (T1 parity, data-parallel).

``python -m evr_tpu.tools.finetune --train-json a.json b.json --data-dir
images/ --epochs 10`` reproduces `Backend/clip_finetune_correct.py`'s run
shape: combined caption datasets, CLIP + 3-class head, InfoNCE + CE, early
stopping, best/final checkpoints — sharded over every visible device.
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main(argv=None):
    parser = argparse.ArgumentParser(description="contrastive CLIP fine-tune")
    parser.add_argument("--train-json", nargs="+", required=True)
    parser.add_argument("--val-json", nargs="*", default=[])
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--model", default="ViT-B/32")
    parser.add_argument("--init-checkpoint", default=None, help=".pt to start from")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--freeze-layers", type=int, default=8)
    parser.add_argument("--save-dir", default="checkpoints")
    parser.add_argument("--num-classes", type=int, default=3)
    parser.add_argument("--no-mesh", action="store_true", help="single-device run")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--loss", choices=["infonce", "siglip"], default="infonce",
        help="contrastive objective: reference-parity InfoNCE or SigLIP "
        "pairwise sigmoid (arxiv 2303.15343)",
    )
    parser.add_argument(
        "--patch-drop", type=float, default=0.0,
        help="FLIP-style random patch masking fraction during training "
        "(arxiv 2212.00794); 0.5 ≈ 1.7x faster steps at small quality cost",
    )
    parser.add_argument(
        "--warmup-steps", type=int, default=0,
        help="linear LR warmup steps before the cosine schedule (0 = "
        "reference-parity scheduling, no warmup)",
    )
    parser.add_argument(
        "--adam-mu-dtype", choices=["float32", "bfloat16"], default="float32",
        help="AdamW first-moment storage dtype; bfloat16 halves the mu "
        "tree's HBM (update math stays fp32)",
    )
    parser.add_argument(
        "--ema-decay", type=float, default=0.0,
        help="Polyak/EMA weight averaging decay (e.g. 0.999); the EMA tree "
        "updates inside the jitted step, shards like the params under "
        "fsdp/expert-parallel, and is saved as payload['ema']. 0 disables",
    )
    parser.add_argument(
        "--gradcache-chunks", type=int, default=0,
        help="GradCache (arxiv 2101.06983): split each batch into N chunks "
        "so encoder activation memory is O(B/N) while the contrastive "
        "negative pool stays the FULL batch; gradients are exactly the "
        "direct step's (one extra forward). 0 disables",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialise transformer blocks in the backward pass "
        "(jax.checkpoint): ~depth x per-block activation HBM saved per step "
        "for one extra forward -- enables bigger batches / deeper towers",
    )
    parser.add_argument(
        "--lora-rank", type=int, default=0,
        help="LoRA parameter-efficient fine-tune (arxiv 2106.09685): train "
        "rank-r adapters on the block linears, base CLIP frozen; a merged "
        "ordinary checkpoint is written to <save-dir>/lora_merged",
    )
    parser.add_argument("--lora-alpha", type=float, default=16.0)
    parser.add_argument(
        "--optimizer", choices=["adamw", "muon"], default="adamw",
        help="muon: Newton-Schulz-orthogonalized momentum on hidden 2-D "
        "weights (pure MXU GEMM work), AdamW elsewhere (training/muon.py)",
    )
    parser.add_argument(
        "--muon-lr-scale", type=float, default=10.0,
        help="Muon lr = lr * group-scale * this (Muon's stable lr sits "
        "~an order of magnitude above AdamW's)",
    )
    parser.add_argument(
        "--fsdp", action="store_true",
        help="shard params + optimizer state over the data axis (ZeRO-3; "
        "bounded per-chip HBM at ViT-L/H scale)",
    )
    parser.add_argument(
        "--save-every-steps", type=int, default=0,
        help="mid-epoch autosave every N batches + SIGTERM autosave "
        "(preemption safety); resume with --resume-from autosave",
    )
    parser.add_argument("--resume-from", default=None,
                        help="checkpoint name under --save-dir (e.g. autosave)")
    parser.add_argument(
        "--moe-experts", type=int, default=0,
        help="Mixture-of-Experts fine-tune (models.moe, LIMoE/Sparse "
        "Upcycling): >0 upcycles the dense init to this many experts per "
        "MoE layer and trains the sparse towers; 0 = dense (default)",
    )
    parser.add_argument("--moe-router-k", type=int, default=2,
                        help="top-k routing (1=Switch, 2=GShard/LIMoE)")
    parser.add_argument("--moe-every", type=int, default=2,
                        help="every Nth block (from the tower end) gets an MoE MLP")
    parser.add_argument("--moe-capacity", type=float, default=1.25,
                        help="expert capacity factor")
    parser.add_argument("--moe-aux-weight", type=float, default=1e-2,
                        help="Switch load-balance aux loss weight")
    parser.add_argument(
        "--expert-parallel", type=int, default=0, metavar="E",
        help="shard experts (and their optimizer moments) over an E-way "
        "'expert' mesh axis; remaining devices form the 'data' axis "
        "(requires --moe-experts divisible by E)",
    )
    args = parser.parse_args(argv)

    import jax

    # Honor JAX_PLATFORMS at CONFIG level (see utils.platform_pin):
    # pod-simulation workers (pod_launch --cpu-devices) must land on cpu
    # or N processes would contend for one real chip.
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()

    # Multi-host: joins the jax.distributed global device set when
    # EVR_TPU_COORDINATOR/NUM_PROCESSES/PROCESS_ID are set (no-op otherwise);
    # the mesh below then spans every process's chips.
    from evr_tpu.parallel.multihost import bootstrap

    process_index, process_count = bootstrap()

    # AFTER bootstrap: enabling the cache queries the backend, and XLA must
    # not initialize before jax.distributed joins the cluster.
    from evr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from evr_tpu.models import (
        ClassifierConfig,
        get_model_config,
        init_classifier_params,
        init_clip_params,
    )
    from evr_tpu.parallel import get_mesh
    from evr_tpu.training import CaptionDataset, TrainConfig, Trainer

    cfg = get_model_config(args.model)
    if args.init_checkpoint:
        from evr_tpu.models.torch_import import load_checkpoint

        clip_params = load_checkpoint(args.init_checkpoint)["clip"]
    else:
        clip_params = init_clip_params(jax.random.PRNGKey(args.seed), cfg)
    cls_params = init_classifier_params(
        jax.random.PRNGKey(args.seed + 1),
        ClassifierConfig(embed_dim=cfg.embed_dim, num_classes=args.num_classes),
    )

    train_ds = CaptionDataset(args.train_json, args.data_dir)
    val_ds = CaptionDataset(args.val_json, args.data_dir) if args.val_json else None
    if val_ds is None:
        train_ds, val_ds = train_ds.split(0.2, args.seed)
    print(f"train={len(train_ds)} val={len(val_ds)} categories={train_ds.category_counts()}")

    moe_cfg = None
    if args.moe_experts > 0:
        from evr_tpu.models.moe import MoEConfig

        moe_cfg = MoEConfig(
            n_experts=args.moe_experts,
            router_k=args.moe_router_k,
            capacity_factor=args.moe_capacity,
            moe_every=args.moe_every,
            aux_weight=args.moe_aux_weight,
        )

    if args.no_mesh:
        mesh = None
    elif args.expert_parallel > 0:
        if moe_cfg is None:
            raise SystemExit("--expert-parallel requires --moe-experts > 0")
        if args.moe_experts % args.expert_parallel:
            raise SystemExit(
                f"--moe-experts {args.moe_experts} must divide over the "
                f"{args.expert_parallel}-way expert axis"
            )
        n_dev = len(jax.devices())
        if n_dev % args.expert_parallel:
            raise SystemExit(
                f"{n_dev} devices don't divide into an "
                f"{args.expert_parallel}-way expert axis"
            )
        mesh = get_mesh(
            axis_names=("data", "expert"),
            shape=(n_dev // args.expert_parallel, args.expert_parallel),
        )
    else:
        mesh = get_mesh()
    if args.batch_size % process_count:
        raise SystemExit(
            f"--batch-size {args.batch_size} (global) must divide over "
            f"{process_count} processes"
        )
    per_proc_bs = args.batch_size // process_count
    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    tc = TrainConfig(
        seed=args.seed,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        freeze_layers=args.freeze_layers,
        save_dir=args.save_dir,
        patch_drop=args.patch_drop,
        remat=args.remat,
        gradcache_chunks=args.gradcache_chunks,
        ema_decay=args.ema_decay,
        warmup_steps=args.warmup_steps,
        adam_mu_dtype=args.adam_mu_dtype,
        contrastive_loss=args.loss,
        optimizer=args.optimizer,
        muon_lr_scale=args.muon_lr_scale,
        save_every_steps=args.save_every_steps,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        moe=moe_cfg,
    )
    trainer = Trainer(
        cfg, clip_params, tc, classifier_params=cls_params, mesh=mesh,
        steps_per_epoch=steps_per_epoch, fsdp=args.fsdp,
    )
    if args.save_every_steps:
        trainer.install_preemption_autosave()
    size = cfg.vision.image_size
    shard = dict(process_index=process_index, process_count=process_count)
    result = trainer.fit(
        lambda e: train_ds.batches(per_proc_bs, size, epoch=e, seed=args.seed, **shard),
        lambda e: val_ds.batches(per_proc_bs, size, shuffle=False, **shard),
        resume_from=args.resume_from,
    )
    if process_index == 0:  # one writer; every process computed identical SPMD results
        out = pathlib.Path(args.save_dir) / "history.json"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(result, indent=2))
        if args.lora_rank > 0 and not result.get("preempted"):
            # fold adapters → an ordinary CLIP checkpoint any surface serves
            import numpy as np
            import orbax.checkpoint as ocp

            merged = jax.tree.map(np.asarray, trainer.merged_clip_params())
            path = pathlib.Path(args.save_dir).absolute() / "lora_merged"
            if path.exists():
                import shutil

                shutil.rmtree(path)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, {"params": merged})
            ckptr.wait_until_finished()
            print(f"merged LoRA checkpoint -> {path}")
    print(f"best val loss {result['best_val_loss']:.4f} @ epoch {result['best_epoch']}")


if __name__ == "__main__":
    main()
