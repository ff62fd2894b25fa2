from .optim import make_optimizer, linear_warmup_linear_decay
from .trainer import MarTTrainer, TrainConfig

__all__ = [
    "make_optimizer",
    "linear_warmup_linear_decay",
    "MarTTrainer",
    "TrainConfig",
]
