from tpudepth.core.config import (
    CROPS,
    MAX_DEPTHS,
    RESOLUTIONS,
    EvalConfig,
    TrainConfig,
)
from tpudepth.core.mesh import create_mesh, shard_batch
from tpudepth.core.precision import Precision

__all__ = [
    "CROPS",
    "MAX_DEPTHS",
    "RESOLUTIONS",
    "EvalConfig",
    "TrainConfig",
    "create_mesh",
    "shard_batch",
    "Precision",
]
