from strajnet_tpu.train.state import TrainState, create_train_state, make_optimizer
from strajnet_tpu.train.step import make_eval_step, make_train_step

__all__ = ["TrainState", "create_train_state", "make_optimizer",
           "make_train_step", "make_eval_step"]
