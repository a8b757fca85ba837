from .profiling import Timer, span, trace_to
from .logging import get_logger

__all__ = ["Timer", "span", "trace_to", "get_logger"]
