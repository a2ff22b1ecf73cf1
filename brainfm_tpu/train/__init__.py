from .schedules import multistep_schedule, cosine_schedule, build_schedules
from .step import make_train_step, build_optimizer, TrainState
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

__all__ = ["multistep_schedule", "cosine_schedule", "build_schedules",
           "make_train_step", "build_optimizer", "TrainState",
           "save_checkpoint", "load_checkpoint", "latest_checkpoint"]
