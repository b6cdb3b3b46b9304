from . import constants  # noqa: F401
from .registry import (  # noqa: F401
    ARTBENCH_NUM_GROUPS,
    ARTBENCH_POST_IMPRESSIONISM_LORA,
    PROMPTS_ARTBENCH,
    LoraTrainSpec,
    OptimizerSpec,
    SchedulerSpec,
    TrainSpec,
    UNetSpec,
    VQVAESpec,
    WorkloadConfig,
    get_config,
)
