from qasr.train.state import TrainState, build_model, build_optimizer, create_train_state, param_count
from qasr.train.step import make_eval_step, make_train_step
from qasr.train.loop import train, evaluate, build_dataset
from qasr.train.checkpoint import CheckpointManager
from qasr.train.metrics import MetricWriter

__all__ = [
    "TrainState",
    "build_model",
    "build_optimizer",
    "create_train_state",
    "param_count",
    "make_eval_step",
    "make_train_step",
    "train",
    "evaluate",
    "build_dataset",
    "CheckpointManager",
    "MetricWriter",
]
