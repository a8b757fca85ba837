"""Distill a large teacher CLIP into a small student (training/distill.py).

MobileCLIP/CLIP-KD-style similarity distillation over a caption dataset:

    python -m evr_tpu.tools.distill \
        --train-json caps.json --data-dir frames/ \
        --student-model ViT-B/32 --teacher-model ViT-L/14@336px \
        --teacher-checkpoint vit_l.pt --epochs 3 --save-dir distilled/

The teacher is frozen; the student trains on
contrastive + KD(+optional embedding alignment) and is written as an
ordinary orbax checkpoint every serving surface consumes
(``EmbeddingEngine.from_checkpoint``). The reference has no distillation
path (its models are fine-tuned from OpenAI inits only).
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main(argv=None) -> None:
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train-json", required=True)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--student-model", default="ViT-B/32")
    parser.add_argument("--teacher-model", default="ViT-L/14@336px")
    parser.add_argument("--student-checkpoint", default=None,
                        help="optional student init (.pt or orbax dir); random init otherwise")
    parser.add_argument("--teacher-checkpoint", default=None,
                        help="teacher weights (.pt or orbax dir); random init otherwise (smoke runs)")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--kd-weight", type=float, default=1.0)
    parser.add_argument("--align-weight", type=float, default=0.0)
    parser.add_argument("--contrastive-weight", type=float, default=1.0)
    parser.add_argument("--kd-temperature", type=float, default=2.0)
    parser.add_argument("--save-dir", default="distilled")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.training.data import CaptionDataset
    from evr_tpu.training.distill import DistillConfig, DistillationTrainer

    def load_params(path, model_name, seed):
        cfg = get_model_config(model_name)
        if path is None:
            return cfg, init_clip_params(jax.random.PRNGKey(seed), cfg)
        if pathlib.Path(path).is_dir():
            from evr_tpu.index.engine import load_orbax_checkpoint

            return cfg, load_orbax_checkpoint(path)["clip"]
        from evr_tpu.models.torch_import import load_checkpoint

        return cfg, load_checkpoint(str(path))["clip"]

    s_cfg, s_params = load_params(
        args.student_checkpoint, args.student_model, args.seed
    )
    t_cfg, t_params = load_params(
        args.teacher_checkpoint, args.teacher_model, args.seed + 1
    )
    if args.teacher_checkpoint is None:
        print("WARNING: no --teacher-checkpoint; teacher is randomly initialised")

    trainer = DistillationTrainer(
        s_cfg, s_params, t_cfg, t_params,
        DistillConfig(
            lr=args.lr,
            kd_weight=args.kd_weight,
            align_weight=args.align_weight,
            contrastive_weight=args.contrastive_weight,
            kd_temperature=args.kd_temperature,
        ),
    )

    ds = CaptionDataset(args.train_json, args.data_dir)
    print(f"train={len(ds)} student={args.student_model} teacher={args.teacher_model}")
    # teacher and student may need different input resolutions; the student's
    # serving size drives the batch (the teacher tower resizes pos-embeds only
    # at its own geometry, so both towers must share the pixel size here)
    if s_cfg.vision.image_size != t_cfg.vision.image_size:
        raise SystemExit(
            f"student image_size {s_cfg.vision.image_size} != teacher "
            f"{t_cfg.vision.image_size}: pick a teacher at the student's "
            "resolution (e.g. ViT-L/14 for a 224px student)"
        )

    history = []
    for epoch in range(args.epochs):
        ms = []
        for batch in ds.batches(
            args.batch_size, s_cfg.vision.image_size, epoch=epoch, seed=args.seed
        ):
            ms.append(trainer.train_step(batch))
        if not ms:
            raise SystemExit("dataset produced no batches (batch too large?)")
        mean = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        history.append({"epoch": epoch, **mean})
        print(
            f"[epoch {epoch}] " + " ".join(f"{k}={v:.4f}" for k, v in mean.items())
        )

    import orbax.checkpoint as ocp

    out = pathlib.Path(args.save_dir).resolve()
    out.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    path = out / "student"
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(
        path,
        {
            "params": {"clip": jax.tree.map(np.asarray, trainer.params)},
            "step": len(history),
            "epoch": args.epochs - 1,
            "metrics": history[-1],
        },
    )
    ckptr.wait_until_finished()
    (out / "history.json").write_text(json.dumps(history, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
