from pinthememory_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    MemoryConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    WhiteningConfig,
)
from pinthememory_tpu.core import labels, metrics  # noqa: F401

NUM_CLASSES = 19
IGNORE_LABEL = 255
