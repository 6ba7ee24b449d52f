from . import losses
from .configs import build_svs_config, tool_shapes
from .data import BATCH_KEYS, synthetic_batch
from .trainer import (TrainConfig, TrainState, create_states, make_optimizer,
                      make_train_step, restore_checkpoint, save_checkpoint)

__all__ = ["losses", "TrainConfig", "TrainState", "create_states",
           "make_optimizer", "make_train_step", "save_checkpoint",
           "restore_checkpoint", "synthetic_batch", "BATCH_KEYS",
           "build_svs_config", "tool_shapes"]
