from .dist_dia import dist_dia_operator, shard_hierarchy
from .halo import (CommMap, HaloDiaOperator, comm_pattern,
                   halo_dia_operator)
from .pcsr import (dist_operator, make_mesh, replicate, shard_rows,
                   shard_vector)

__all__ = ["CommMap", "HaloDiaOperator", "comm_pattern",
           "dist_dia_operator", "dist_operator", "halo_dia_operator",
           "make_mesh", "replicate", "shard_hierarchy", "shard_rows",
           "shard_vector"]
