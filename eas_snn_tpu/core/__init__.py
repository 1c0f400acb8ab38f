from .optim import build_lr_schedule, build_optimizer
from .train_state import (
    TrainState,
    create_train_state,
    ema_update,
    eval_step,
    train_step,
)
from .checkpoint import CheckpointManager, load_partial_params
