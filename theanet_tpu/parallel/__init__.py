from .mesh import (
    batch_pspec,
    make_mesh,
    param_pspecs,
    shard_params,
)

__all__ = ["make_mesh", "param_pspecs", "batch_pspec", "shard_params"]
