from .store import FrameIndex, VideoRegistry
from .engine import EmbeddingEngine

__all__ = ["FrameIndex", "VideoRegistry", "EmbeddingEngine"]
