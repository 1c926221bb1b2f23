from .dist_dia import dist_dia_operator, shard_hierarchy
from .pcsr import (dist_operator, make_mesh, replicate, shard_rows,
                   shard_vector)

__all__ = ["dist_dia_operator", "dist_operator", "make_mesh", "replicate",
           "shard_hierarchy", "shard_rows", "shard_vector"]
