from .monotonic_align import (mas_duration_targets, maximum_path,
                              maximum_path_jax, maximum_path_numpy,
                              maximum_path_pallas)

__all__ = ["maximum_path", "maximum_path_jax", "maximum_path_pallas",
           "maximum_path_numpy", "mas_duration_targets"]
