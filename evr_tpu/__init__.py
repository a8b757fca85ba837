"""evr_tpu — TPU-native CLIP video event retrieval framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
`Event-Retrival-In-Video-Learning-Transferable-Visual-Model-From-Supervised-
Natural-Language` (reference layer map in /root/repo/SURVEY.md):

- ``evr_tpu.models``     CLIP ViT image/text towers (quickGELU), classifier heads
- ``evr_tpu.tokenizer``  CLIP byte-level BPE tokenizer (77-token context)
- ``evr_tpu.ops``        device compute: fused preprocessing, attention,
                         layernorm, top-k — Pallas kernels with XLA fallbacks
- ``evr_tpu.parallel``   meshes, sharding rules, global-batch contrastive loss
- ``evr_tpu.index``      HBM-resident L2-normalised frame index + cosine top-k
- ``evr_tpu.ingest``     video → scene detection → frames → metadata → index
- ``evr_tpu.query``      the 7 retrieval strategies + query preprocessing hooks
- ``evr_tpu.training``   data-parallel InfoNCE fine-tuning (pjit), checkpoints
- ``evr_tpu.evaluation`` R@K / MRR / MedR / MeanR / P@K / rsum harness
- ``evr_tpu.serving``    HTTP API matching the reference's 12 routes
- ``evr_tpu.viz``        embedding 2-D projection endpoints

Import is kept cheap: subpackages are imported lazily on attribute access so
that host-only tools (ingestion, serving) don't pay for JAX startup.
"""

import importlib

__version__ = "0.1.0"

_SUBPACKAGES = (
    "models",
    "tokenizer",
    "ops",
    "parallel",
    "index",
    "ingest",
    "query",
    "training",
    "evaluation",
    "serving",
    "viz",
    "utils",
    "config",
    "data_prep",
    "native",
    "tools",
)


def __getattr__(name):
    if name in _SUBPACKAGES:
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBPACKAGES))
