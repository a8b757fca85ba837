"""SCST captioner CLI (T7 parity — `Backend/sinhcaption.py`).

``python -m evr_tpu.tools.train_captioner --embeddings frames.npy
--captions captions.json --xe-epochs 5 --scst-epochs 3`` warm-starts a
prefix captioner on (frame embedding, caption) pairs with teacher forcing,
then runs self-critical sequence training against the frozen CLIP text
tower (greedy baseline, CLIP cosine x100 reward, target-reward early stop),
saving per-epoch + final checkpoints like the reference loop
(`sinhcaption.py:398-416`).

``--embeddings`` is the `(N, D)` .npy the export tools produce; rows are
L2-normalised here if they are not already. ``--captions`` is a JSON list
of caption strings aligned with the embedding rows (only needed for the XE
warm start).
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="SCST caption-RL fine-tune")
    parser.add_argument("--embeddings", required=True, help="(N, D) .npy of frame embeddings")
    parser.add_argument("--captions", default=None, help="JSON list of captions aligned with rows (XE warm start)")
    parser.add_argument("--val-fraction", type=float, default=0.1)
    parser.add_argument("--model", default="ViT-B/32", help="reward CLIP config")
    parser.add_argument("--clip-checkpoint", default=None, help=".pt with the reward CLIP weights")
    parser.add_argument("--xe-epochs", type=int, default=0)
    parser.add_argument("--scst-epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=3e-5)  # sinhcaption.py:100
    parser.add_argument("--advantage-scale", type=float, default=0.01)
    parser.add_argument("--target-reward", type=float, default=40.0)  # sinhcaption.py:101
    parser.add_argument("--max-new-tokens", type=int, default=30)
    parser.add_argument("--prefix-len", type=int, default=10)
    parser.add_argument("--cap-width", type=int, default=512)
    parser.add_argument("--cap-layers", type=int, default=4)
    parser.add_argument("--cap-heads", type=int, default=8)
    parser.add_argument("--save-dir", default="checkpoints_scst")
    parser.add_argument("--demo", type=int, default=3, help="decode this many captions at the end")
    parser.add_argument(
        "--beam-size", type=int, default=1,
        help="demo decode beam width (1 = greedy; >1 uses beam_search)",
    )
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from evr_tpu.models import get_model_config, init_clip_params
    from evr_tpu.models.captioner import CaptionerConfig, generate
    from evr_tpu.tokenizer import get_default_tokenizer
    from evr_tpu.training.scst import ScstConfig, ScstTrainer, encode_captions

    feats = np.load(args.embeddings).astype(np.float32)
    norms = np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = feats / np.maximum(norms, 1e-8)

    clip_cfg = get_model_config(args.model)
    if 1 + args.max_new_tokens > clip_cfg.text.context_length:
        raise SystemExit(
            f"--max-new-tokens {args.max_new_tokens} overflows the reward "
            f"tower's {clip_cfg.text.context_length}-token context "
            f"(max {clip_cfg.text.context_length - 1})"
        )
    if args.clip_checkpoint:
        from evr_tpu.models.torch_import import load_checkpoint

        clip_params = load_checkpoint(args.clip_checkpoint)["clip"]
    else:
        print("WARNING: no --clip-checkpoint; reward model is randomly initialised")
        clip_params = init_clip_params(jax.random.PRNGKey(args.seed), clip_cfg)

    cap_cfg = CaptionerConfig(
        image_dim=feats.shape[1],
        width=args.cap_width,
        layers=args.cap_layers,
        heads=args.cap_heads,
        prefix_len=args.prefix_len,
        max_new_tokens=args.max_new_tokens,
    )
    cfg = ScstConfig(
        lr=args.lr,
        advantage_scale=args.advantage_scale,
        target_reward=args.target_reward,
        batch_size=args.batch_size,
        save_dir=args.save_dir,
    )
    trainer = ScstTrainer(
        clip_params, clip_cfg, cap_cfg=cap_cfg, cfg=cfg,
        rng=jax.random.PRNGKey(args.seed),
    )

    n_val = max(1, int(len(feats) * args.val_fraction))
    train_feats, val_feats = feats[n_val:], feats[:n_val]

    if args.captions and args.xe_epochs > 0:
        captions = json.loads(pathlib.Path(args.captions).read_text())
        if len(captions) != len(feats):
            raise SystemExit(
                f"--captions has {len(captions)} entries for {len(feats)} embeddings"
            )
        toks = encode_captions(captions, cap_cfg)
        losses = trainer.pretrain_xe(feats[n_val:], toks[n_val:], epochs=args.xe_epochs)
        print(f"XE warm start: loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    history = trainer.fit(
        train_feats,
        val_features=val_feats,
        epochs=args.scst_epochs,
        rng=jax.random.PRNGKey(args.seed + 1),
        save_checkpoints=True,
    )
    for h in history:
        print(
            f"epoch {h['epoch'] + 1}: train reward {h['train_reward']:.2f}"
            + (f", val reward {h['val_reward']:.2f}" if "val_reward" in h else "")
        )

    if args.demo > 0:
        import jax.numpy as jnp

        from evr_tpu.models.captioner import decode_tokens

        tok = get_default_tokenizer()
        demo = jnp.asarray(feats[: args.demo])
        if args.beam_size > 1:
            from evr_tpu.models.captioner import beam_search

            toks, _ = beam_search(
                trainer.params, cap_cfg, demo, beam_size=args.beam_size
            )
        else:
            toks, _ = generate(trainer.params, cap_cfg, demo, sample=False)
        for i, text in enumerate(decode_tokens(tok, toks, cap_cfg.eot_id)):
            print(f"demo[{i}]: {text!r}")

    out = pathlib.Path(args.save_dir) / "history.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(history, indent=2))


if __name__ == "__main__":
    main()
