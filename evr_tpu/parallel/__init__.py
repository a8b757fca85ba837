from .mesh import get_mesh, local_device_count
from .sharded_search import sharded_cosine_topk
from .contrastive import global_infonce_loss
from . import fsdp
from . import multihost
from . import pp
from . import sp

__all__ = [
    "get_mesh",
    "local_device_count",
    "sharded_cosine_topk",
    "global_infonce_loss",
    "fsdp",
    "multihost",
    "pp",
    "sp",
]
