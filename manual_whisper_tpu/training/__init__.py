from .train import TrainState, make_train_step, init_train_state

__all__ = ["TrainState", "make_train_step", "init_train_state"]
