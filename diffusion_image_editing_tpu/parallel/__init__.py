from .edit_shard import (  # noqa: F401
    ShardedCfgEpsClosure,
    ShardedEpsClosure,
    SpatialDecodeClosure,
    SpatialEncodeClosure,
    cfg_mesh,
    make_sharded_cfg_eps_fn,
    shard_decode_fn,
    spatial_shard,
)
from .mesh import data_sharded, initialize_distributed, make_mesh, replicated, shard_leading_axis  # noqa: F401
from .sweep import guided_edit_sweep, seed_sweep_generate, sweep_attr_func  # noqa: F401
