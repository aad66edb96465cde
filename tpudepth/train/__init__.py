from tpudepth.train.trainer import Trainer, TrainState, make_train_step
from tpudepth.train.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "Trainer",
    "TrainState",
    "make_train_step",
    "load_checkpoint",
    "save_checkpoint",
]
