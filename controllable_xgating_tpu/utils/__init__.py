from controllable_xgating_tpu.utils.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
    load_config,
)
from controllable_xgating_tpu.utils.logging import JsonlLogger, get_logger

__all__ = [
    "Config",
    "DataConfig",
    "EvalConfig",
    "ModelConfig",
    "TrainConfig",
    "load_config",
    "JsonlLogger",
    "get_logger",
]
