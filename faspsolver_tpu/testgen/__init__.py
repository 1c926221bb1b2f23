from .fdm import (block_poisson_3d, poisson_2d,
                  poisson_2d_manufactured, poisson_3d,
                  poisson_3d_manufactured)
from .fem import (TriMesh, assemble_mass, assemble_poisson,
                  heat_backward_euler_system, l2_error,
                  poisson_fe_manufactured, quad_points, refine_uniform,
                  unit_square_mesh)

__all__ = ["poisson_2d", "poisson_2d_manufactured", "poisson_3d",
           "poisson_3d_manufactured",
           "TriMesh", "assemble_mass", "assemble_poisson",
           "heat_backward_euler_system", "l2_error",
           "poisson_fe_manufactured", "quad_points", "refine_uniform",
           "unit_square_mesh"]
