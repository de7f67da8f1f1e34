from .optimizer import build_optimizer
from .scheduler import lr_at_epoch
from .train_step import make_train_step, make_eval_step

__all__ = ["build_optimizer", "lr_at_epoch", "make_train_step", "make_eval_step"]
