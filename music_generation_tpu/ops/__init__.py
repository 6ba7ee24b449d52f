from .monotonic_align import (maximum_path, maximum_path_jax,
                              maximum_path_numpy, maximum_path_pallas)

__all__ = ["maximum_path", "maximum_path_jax", "maximum_path_pallas",
           "maximum_path_numpy"]
