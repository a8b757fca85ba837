"""Streaming double-buffered embedding pipeline.

The host stages batches (C++ thread-pool decode when available) on a
producer thread while the device encodes the previous batch — the standard
input-pipeline overlap the reference's synchronous per-image loop
(`embedding_service.py:461-505`) never gets. On hosts with real PCIe/ICI
bandwidth the device never starves; on decode-bound hosts the producer is
the bottleneck and the device idles exactly as much as physics requires.
"""

from __future__ import annotations

import pathlib
import queue
import threading

import numpy as np


def embed_folder_streaming(
    engine,
    folder,
    batch_size: int | None = None,
    normalise: bool = True,
    queue_depth: int = 2,
) -> tuple[np.ndarray, list[str]]:
    """Like ``EmbeddingEngine.embed_folder`` but with staging overlapped
    against device compute. Returns (embeddings, frame_names)."""
    from evr_tpu.index.engine import IMAGE_EXTENSIONS, stage_image_fast

    folder = pathlib.Path(folder)
    batch_size = batch_size or engine.batch_size
    candidates = sorted(
        p.name for p in folder.iterdir() if p.suffix.lower() in IMAGE_EXTENSIONS
    )
    size = engine.cfg.vision.image_size

    work: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    SENTINEL = object()
    producer_error: list[BaseException] = []

    def produce():
        try:
            for i in range(0, len(candidates), batch_size):
                chunk = candidates[i : i + batch_size]
                paths = [folder / n for n in chunk]
                staged = engine._stage_native(paths)
                if staged is not None:
                    batch, ok = staged
                    names = [chunk[j] for j in ok]
                    batch = batch[ok]
                else:
                    imgs, names = [], []
                    for name, path in zip(chunk, paths):
                        try:
                            imgs.append(stage_image_fast(path, size))
                            names.append(name)
                        except (IOError, OSError):
                            continue
                    batch = np.stack(imgs) if imgs else np.zeros((0, size, size, 3), np.uint8)
                work.put((batch, names))
        except BaseException as e:  # surfaced on the consumer side
            producer_error.append(e)
        finally:
            work.put(SENTINEL)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()

    embs: list[np.ndarray] = []
    names_out: list[str] = []
    while True:
        item = work.get()
        if item is SENTINEL:
            break
        batch, names = item
        if len(batch):
            embs.append(engine.encode_staged_images(batch))
            names_out.extend(names)
    thread.join()
    if producer_error:
        raise producer_error[0]

    emb = (
        np.concatenate(embs, axis=0)
        if embs
        else np.zeros((0, engine.cfg.embed_dim), np.float32)
    )
    if normalise and len(emb):
        emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb.astype(np.float32), names_out
