from .store import FrameIndex, VideoRegistry
from .engine import EmbeddingEngine
from .ivf import IVFIndex
from .ivfpq import IVFPQIndex
from .pq import PQIndex

__all__ = [
    "FrameIndex",
    "VideoRegistry",
    "EmbeddingEngine",
    "IVFIndex",
    "IVFPQIndex",
    "PQIndex",
]
