from .fdm import (poisson_2d, poisson_2d_manufactured, poisson_3d,
                  poisson_3d_manufactured)

__all__ = ["poisson_2d", "poisson_2d_manufactured", "poisson_3d",
           "poisson_3d_manufactured"]
