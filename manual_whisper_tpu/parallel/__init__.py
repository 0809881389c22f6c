from .mesh import (make_mesh, param_sharding_rules, shard_batch,
                   shard_params, sharding_pytree)

__all__ = ["make_mesh", "param_sharding_rules", "shard_batch",
           "shard_params", "sharding_pytree"]
