from controllable_xgating_tpu.train.state import TrainState, create_train_state
from controllable_xgating_tpu.train.xe import (
    masked_xe_loss,
    make_xe_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "masked_xe_loss",
    "make_xe_train_step",
]
