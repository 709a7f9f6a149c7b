from blackjax_tpu.parallel import config, eca, model_axis, smc
from blackjax_tpu.parallel.config import MeshConfig, chains_spec, replicated_spec
from blackjax_tpu.parallel.model_axis import (
    additive_logdensity,
    model_sharded_metric,
)

__all__ = [
    "eca",
    "config",
    "model_axis",
    "smc",
    "MeshConfig",
    "chains_spec",
    "replicated_spec",
    "additive_logdensity",
    "model_sharded_metric",
]
