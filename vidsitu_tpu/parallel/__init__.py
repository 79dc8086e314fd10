from .collectives import (
    get_rank,
    get_world_size,
    is_main_process,
    reduce_dict,
    reduce_dict_corr,
    synchronize,
)
from .mesh import (
    data_sharded,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "data_sharded",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "make_mesh",
    "reduce_dict",
    "reduce_dict_corr",
    "replicate_tree",
    "replicated",
    "shard_batch",
    "synchronize",
]
