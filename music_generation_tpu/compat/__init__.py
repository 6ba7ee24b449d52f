from .checkpoints import (load_params, load_pipeline, save_params,
                          save_pipeline)
from .torch_import import visinger_params_from_torch

__all__ = ["visinger_params_from_torch", "save_params", "load_params",
           "save_pipeline", "load_pipeline"]
