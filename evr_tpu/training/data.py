"""Caption dataset + batch pipeline for contrastive fine-tuning.

Reference counterpart: ``ContentAwareDataset`` (`Backend/clip_finetune_
correct.py:39-115`): JSON dict keyed by relative image path with
``{"caption": ..., "category": ...}`` values; invalid/missing entries are
dropped; category mapping {"Sensitive content": 0, "Violence": 1,
"NonViolence": 2} with NonViolence default; multiple JSONs concatenate
(`create_combined_dataset`, `:188-213`).

TPU-native pipeline differences: images are staged to uint8 on the host
(decode+resize+crop) and batched with static shapes (remainder batches are
dropped during training, padded during eval); tokenization happens on the
host per batch. Unreadable images are *dropped at scan time* instead of
becoming zero tensors mid-training (the reference's `:110-113` fallback).
"""

from __future__ import annotations

import json
import pathlib
from typing import Iterator

import numpy as np

from evr_tpu.index.engine import stage_image_fast
from evr_tpu.tokenizer import get_default_tokenizer

CATEGORY_MAPPING = {"Sensitive content": 0, "Violence": 1, "NonViolence": 2}
DEFAULT_CATEGORY_ID = 2


def prefetch_batches(iterator, depth: int = 2):
    """Producer-thread prefetch: host staging of batch i+1 overlaps the
    device step on batch i (the role DataLoader workers play in the
    reference's torch loops)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    SENTINEL = object()
    errors: list[BaseException] = []

    def produce():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            errors.append(e)
        finally:
            q.put(SENTINEL)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is SENTINEL:
            break
        yield item
    if errors:
        raise errors[0]


class CaptionDataset:
    """(image path, caption, category_id) triples from caption JSONs."""

    def __init__(
        self,
        json_paths,
        base_dir,
        category_mapping: dict[str, int] | None = None,
        check_files: bool = True,
    ):
        if isinstance(json_paths, (str, pathlib.Path)):
            json_paths = [json_paths]
        self.base_dir = pathlib.Path(base_dir)
        self.category_mapping = dict(category_mapping or CATEGORY_MAPPING)
        self.items: list[tuple[pathlib.Path, str, int]] = []
        for jp in json_paths:
            data = json.loads(pathlib.Path(jp).read_text(encoding="utf-8"))
            for rel_path, meta in data.items():
                caption = (meta.get("caption") or "").strip()
                if not caption:
                    continue
                full = self.base_dir / rel_path
                if check_files and not full.exists():
                    continue
                cat = self.category_mapping.get(
                    meta.get("category", "NonViolence"), DEFAULT_CATEGORY_ID
                )
                self.items.append((full, caption, cat))

    def __len__(self) -> int:
        return len(self.items)

    def category_counts(self) -> dict[int, int]:
        counts: dict[int, int] = {}
        for _, _, cat in self.items:
            counts[cat] = counts.get(cat, 0) + 1
        return counts

    def split(self, val_fraction: float = 0.2, seed: int = 42):
        """80/20 split with fixed seed (parity with
        `content/Merge_data_NSFW_Violence/chia_dataset.py:17`)."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.items))
        n_val = int(len(order) * val_fraction)
        val, train = object.__new__(CaptionDataset), object.__new__(CaptionDataset)
        for ds, idx in ((val, order[:n_val]), (train, order[n_val:])):
            ds.base_dir = self.base_dir
            ds.category_mapping = self.category_mapping
            ds.items = [self.items[i] for i in idx]
        return train, val

    def batches(
        self,
        batch_size: int,
        image_size: int = 224,
        shuffle: bool = True,
        seed: int = 42,
        drop_remainder: bool = True,
        epoch: int = 0,
        tokenizer=None,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[dict[str, np.ndarray]]:
        """Yield {'images': uint8 [B,S,S,3], 'tokens': int32 [B,77],
        'labels': int32 [B]} with static shapes.

        Multi-host: pass this process's ``(process_index, process_count)``
        (from ``parallel.multihost.bootstrap``) and the PER-PROCESS
        ``batch_size`` (= global // process_count). Every process shuffles
        the SAME epoch order (seed+epoch, no cross-host coordination
        needed), then takes a disjoint covering stride of it — feed the
        yielded host batches through ``multihost.make_global_batch`` to form
        the global row-sharded batch.
        """
        if not 0 <= process_index < process_count:
            raise ValueError(f"process_index {process_index} not in [0, {process_count})")
        tokenizer = tokenizer or get_default_tokenizer()
        order = np.arange(len(self.items))
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(order)
        if process_count > 1:
            # equal-length disjoint stride shards; trailing items that don't
            # fill one batch on EVERY process are dropped so hosts stay in
            # lockstep (a host yielding one batch more than its peers would
            # deadlock the collectives)
            per = len(order) // process_count
            order = order[process_index * per : (process_index + 1) * per]
        end = len(order) - (len(order) % batch_size) if drop_remainder else len(order)

        stager = None
        try:  # C++ thread-pool staging when built (evr_tpu.native)
            from evr_tpu.native import NativeStager, native_available

            if native_available():
                stager = NativeStager(image_size)
        except Exception:
            stager = None

        for i in range(0, end, batch_size):
            chunk = order[i : i + batch_size]
            paths = [self.items[j][0] for j in chunk]
            images, captions, labels = [], [], []
            if stager is not None and all(
                str(p).lower().endswith((".jpg", ".jpeg")) for p in paths
            ):
                staged, ok = stager.stage_batch(paths)
                for pos in ok:
                    j = chunk[pos]
                    images.append(staged[pos])
                    captions.append(self.items[j][1])
                    labels.append(self.items[j][2])
            else:
                for j in chunk:
                    path, caption, cat = self.items[j]
                    try:
                        images.append(stage_image_fast(path, image_size))
                    except IOError:
                        continue
                    captions.append(caption)
                    labels.append(cat)
            if not images:
                continue
            # pad short (unreadable-image) batches back up by repetition to
            # keep shapes static
            while drop_remainder and len(images) < batch_size:
                images.append(images[len(images) % max(1, len(images))])
                captions.append(captions[len(captions) % max(1, len(captions))])
                labels.append(labels[len(labels) % max(1, len(labels))])
            yield {
                "images": np.stack(images),
                "tokens": tokenizer(captions),
                "labels": np.asarray(labels, np.int32),
            }
