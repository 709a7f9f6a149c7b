from blackjax_tpu.parallel import config, eca
from blackjax_tpu.parallel.config import MeshConfig, chains_spec, replicated_spec

__all__ = ["eca", "config", "MeshConfig", "chains_spec", "replicated_spec"]
