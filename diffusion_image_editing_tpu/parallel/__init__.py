from .mesh import data_sharded, initialize_distributed, make_mesh, replicated, shard_leading_axis  # noqa: F401
from .sweep import guided_edit_sweep, seed_sweep_generate, sweep_attr_func  # noqa: F401
