"""Frame/video captioning for training-pair construction.

Reference counterparts (`content/Script_data_finetune/`): LLaVA-NeXT-Video
batch captioner with category-conditioned prompts and OOM frame-halving,
LLaVA-1.5 image captioner, Florence-2 multi-task captioner. Those are
host-side third-party VLMs (SURVEY.md §2.4 scope note) — here they are a
``Captioner`` protocol with:

- ``TemplateCaptioner`` — deterministic category-conditioned template
  captions (always available; good enough for pipeline tests and smoke
  training runs);
- ``HFCaptioner`` — any HuggingFace image-to-text pipeline when its weights
  exist locally (zero-egress guard: constructing it without the model
  present raises immediately rather than mid-run).

``caption_folder`` mirrors the batch loop: per-image captions with interim
saves every ``save_every`` images (`llava_video_batch_process.py:72-86`
resilience pattern).
"""

from __future__ import annotations

import json
import pathlib
from typing import Protocol

CATEGORY_PROMPTS = {
    "Violence": "a scene showing violent activity",
    "Sensitive content": "a scene containing sensitive adult content",
    "NonViolence": "an everyday scene",
}


class Captioner(Protocol):
    def __call__(self, image_path, category: str | None = None) -> str: ...


class TemplateCaptioner:
    """Deterministic captions from filename + category prompt."""

    def __call__(self, image_path, category: str | None = None) -> str:
        stem = pathlib.Path(image_path).stem.replace("_", " ")
        prefix = CATEGORY_PROMPTS.get(category or "", "a video frame")
        return f"{prefix}, frame {stem}"


class HFCaptioner:
    """HuggingFace image-to-text captioner (local weights only)."""

    def __init__(self, model_name: str, max_new_tokens: int = 40):
        from transformers import pipeline

        self.pipe = pipeline(
            "image-to-text", model=model_name, max_new_tokens=max_new_tokens
        )

    def __call__(self, image_path, category: str | None = None) -> str:
        out = self.pipe(str(image_path))
        return out[0]["generated_text"].strip() if out else ""


def caption_folder(
    images_dir,
    out_json,
    captioner: Captioner | None = None,
    category: str | None = None,
    save_every: int = 50,
) -> dict:
    """Caption every image in a folder into the training JSON schema
    ({relative_path: {caption, category}}), with interim saves."""
    images_dir = pathlib.Path(images_dir)
    out_json = pathlib.Path(out_json)
    captioner = captioner or TemplateCaptioner()
    results: dict = {}
    if out_json.exists():  # resume partial runs
        results = json.loads(out_json.read_text(encoding="utf-8"))
    paths = sorted(
        p for p in images_dir.iterdir() if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    for i, path in enumerate(paths):
        rel = path.name
        if rel in results:
            continue
        caption = captioner(path, category)
        results[rel] = {"caption": caption, "category": category or "NonViolence"}
        if (i + 1) % save_every == 0:
            out_json.write_text(json.dumps(results, indent=2, ensure_ascii=False))
    out_json.write_text(json.dumps(results, indent=2, ensure_ascii=False))
    return results


class PrefixCaptioner:
    """TPU-native captioner: CLIP image embedding → SCST-trained prefix
    captioner (`models/captioner.py`, `training/scst.py`) → decoded text.

    Plays the role LLaVA plays in the reference's captioning scripts but
    runs entirely on-device through the embedding engine. Satisfies the
    ``Captioner`` protocol; ``caption_batch`` keeps device batching when a
    whole folder is captioned (used by ``ingest.annotate_folder``).
    """

    def __init__(
        self, engine, captioner_params, cap_cfg, tokenizer=None, beam_size: int = 1
    ):
        import jax

        from evr_tpu.models.captioner import beam_search, generate

        self.engine = engine
        self.params = captioner_params
        self.cap_cfg = cap_cfg
        if tokenizer is None:
            from evr_tpu.tokenizer import get_default_tokenizer

            tokenizer = get_default_tokenizer()
        self.tokenizer = tokenizer
        cfg = cap_cfg
        if beam_size > 1:
            self._generate = jax.jit(
                lambda params, feats: beam_search(
                    params, cfg, feats, beam_size=beam_size
                )
            )
        else:
            self._generate = jax.jit(
                lambda params, feats: generate(params, cfg, feats, sample=False)
            )
        # one compiled decode program: pad to the engine's batch size so a
        # corpus of many folder sizes doesn't trigger a compile per shape
        self._chunk = max(1, int(getattr(engine, "batch_size", 32)))

    def caption_batch(self, paths) -> list[str]:
        import jax.numpy as jnp
        import numpy as np

        from evr_tpu.models.captioner import decode_tokens

        feats = self.engine.encode_image_files(list(paths), normalise=True)
        out: list[str] = []
        B = self._chunk
        for i in range(0, len(feats), B):
            chunk = feats[i : i + B]
            n = chunk.shape[0]
            if n < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n, chunk.shape[1]), chunk.dtype)]
                )
            tokens, _ = self._generate(self.params, jnp.asarray(chunk))
            out.extend(decode_tokens(self.tokenizer, tokens[:n], self.cap_cfg.eot_id))
        return out

    def __call__(self, image_path, category: str | None = None) -> str:
        return self.caption_batch([image_path])[0]
