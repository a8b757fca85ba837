"""End-to-end numerics parity check against the reference's golden fixtures.

The reference repo checks in both the frame JPEGs
(`Backend/static/processed_frames/<video>/`) and the embeddings the real
OpenAI CLIP ViT-B/32 produced for them
(`Backend/embedding/<video>_embeddings.npy`). Given real ViT-B/32 weights
(OpenAI .pt via pip-clip layout, a reference fine-tune checkpoint, or a HF
CLIPModel directory), this tool re-embeds those exact frames through the
evr_tpu pipeline (PIL-exact preprocessing) and reports:

- per-row cosine similarity of our embeddings vs the golden rows;
- top-k retrieval rank agreement using golden rows as queries —
  the "identical R@1/R@5" gate from BASELINE.md.

Without weights (zero-egress environments) it explains what to provide and
exits cleanly — the harness is ready for the first environment that has the
checkpoint.
"""

from __future__ import annotations

import argparse
import json
import pathlib


def load_any_checkpoint(path: str):
    """(clip_params, cfg) from OpenAI .pt / reference .pt / HF directory."""
    import numpy as np

    from evr_tpu.models.torch_import import (
        config_from_openai_state_dict,
        from_hf_state_dict,
        from_openai_state_dict,
    )

    p = pathlib.Path(path)
    if p.is_dir():  # HF layout
        from transformers import CLIPModel

        from evr_tpu.models import get_model_config

        model = CLIPModel.from_pretrained(str(p))
        cfg = get_model_config("ViT-B/32")
        return from_hf_state_dict(model.state_dict(), cfg), cfg
    import torch

    blob = torch.load(str(p), map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k.removeprefix("clip_model."): v for k, v in sd.items() if not k.startswith("classifier.")}
    cfg = config_from_openai_state_dict(sd)
    return from_openai_state_dict(sd, cfg), cfg


def main(argv=None):
    from evr_tpu.utils.platform_pin import pin_platform_from_env

    pin_platform_from_env()
    parser = argparse.ArgumentParser(description="golden-fixture parity check")
    parser.add_argument("--checkpoint", default=None,
                        help="real ViT-B/32 weights (.pt or HF dir)")
    parser.add_argument("--reference-root", default="/root/reference/Backend")
    parser.add_argument("--videos", nargs="*", default=["Violence_2", "Violence"])
    parser.add_argument("--top-k", type=int, default=10)
    args = parser.parse_args(argv)

    ref = pathlib.Path(args.reference_root)
    if not ref.exists():
        print("reference fixture tree not mounted; nothing to compare against")
        return 0
    if args.checkpoint is None:
        print(
            "no weights provided. To run the parity gate, supply real CLIP "
            "ViT-B/32 weights:\n"
            "  --checkpoint ViT-B-32.pt        (OpenAI pip-clip download)\n"
            "  --checkpoint final_checkpoint.pt (reference fine-tune)\n"
            "  --checkpoint /path/to/hf/clip-vit-base-patch32/\n"
            "The harness then reports per-frame cosine vs the golden .npy "
            "fixtures and top-k rank agreement."
        )
        return 0

    import jax
    import numpy as np

    from evr_tpu.index import EmbeddingEngine, FrameIndex

    # TPU matmuls default to bf16 even for fp32 operands; the golden gate
    # needs true fp32 numerics.
    jax.config.update("jax_default_matmul_precision", "highest")

    clip_params, cfg = load_any_checkpoint(args.checkpoint)
    engine = EmbeddingEngine(cfg=cfg, params=clip_params, preprocess_mode="pil",
                             compute_dtype=None)

    overall_ok = True
    for video in args.videos:
        frames_dir = ref / "static" / "processed_frames" / video
        golden_path = ref / "embedding" / f"{video}_embeddings.npy"
        meta_path = ref / "metadata" / f"{video}_metadata.json"
        if not (frames_dir.exists() and golden_path.exists() and meta_path.exists()):
            print(f"{video}: fixtures incomplete, skipping")
            continue
        golden = np.load(golden_path).astype(np.float32)
        golden_n = golden / np.maximum(np.linalg.norm(golden, axis=1, keepdims=True), 1e-12)
        order = [m["frameid"] for m in json.loads(meta_path.read_text(encoding="utf-8"))]

        ours = engine.encode_image_files([frames_dir / n for n in order], normalise=True)
        cos = (ours * golden_n).sum(axis=1)
        print(
            f"{video}: n={len(order)} cosine(our, golden) "
            f"mean={cos.mean():.6f} min={cos.min():.6f}"
        )

        # retrieval rank agreement: golden row i as query must retrieve our
        # row i at rank 1 and produce identical top-k orderings
        idx_ours = FrameIndex(embed_dim=cfg.embed_dim)
        idx_ours.add_video(video, ours, order)
        idx_gold = FrameIndex(embed_dim=cfg.embed_dim)
        idx_gold.add_video(video, golden, order)
        probes = golden_n[:: max(1, len(order) // 20)]
        _, rows_ours = idx_ours.search_raw(probes, args.top_k)
        _, rows_gold = idx_gold.search_raw(probes, args.top_k)
        r1 = float((rows_ours[:, 0] == rows_gold[:, 0]).mean())
        topk = float((rows_ours == rows_gold).mean())
        print(f"{video}: R@1 agreement={r1:.3f}, top-{args.top_k} position agreement={topk:.3f}")
        overall_ok &= r1 == 1.0 and cos.min() > 0.99
    print("PARITY", "OK" if overall_ok else "DIVERGED")
    return 0 if overall_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
