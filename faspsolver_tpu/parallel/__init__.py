from .pcsr import (dist_operator, make_mesh, replicate, shard_rows,
                   shard_vector)

__all__ = ["dist_operator", "make_mesh", "replicate", "shard_rows",
           "shard_vector"]
