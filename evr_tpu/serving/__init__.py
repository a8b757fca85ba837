from .app import create_app
from .context import ServingContext
from .cache import TTLCache

__all__ = ["create_app", "ServingContext", "TTLCache"]
