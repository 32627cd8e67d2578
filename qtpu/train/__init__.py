"""Training loops (fp32 + QAT/STE) and evaluation."""
from qtpu.train.loop import (TrainState, create_train_state, cross_entropy,
                             evaluate, fit, make_eval_step, make_train_step)

__all__ = ["TrainState", "create_train_state", "cross_entropy", "evaluate",
           "fit", "make_eval_step", "make_train_step"]
