from blackjax_tpu.parallel import config, eca, smc
from blackjax_tpu.parallel.config import MeshConfig, chains_spec, replicated_spec

__all__ = ["eca", "config", "smc", "MeshConfig", "chains_spec", "replicated_spec"]
