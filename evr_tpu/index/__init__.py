from .store import FrameIndex, VideoRegistry
from .engine import EmbeddingEngine
from .ivf import IVFIndex

__all__ = ["FrameIndex", "VideoRegistry", "EmbeddingEngine", "IVFIndex"]
