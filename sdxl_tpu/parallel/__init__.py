from .mesh import make_mesh, shard_batch, shard_params

__all__ = ["make_mesh", "shard_params", "shard_batch"]
