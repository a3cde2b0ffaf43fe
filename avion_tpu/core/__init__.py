from avion_tpu.core.policy import Policy, DEFAULT_POLICY
from avion_tpu.core.config import (
    MeshConfig,
    OptimConfig,
    TrainConfig,
    DataConfig,
    ModelConfig,
)
