from .state import (  # noqa: F401
    TrainState,
    ema_decay_schedule,
    ema_update,
    make_optimizer,
)
from .train import diffusion_loss, make_train_step  # noqa: F401
