from blackjax_tpu.smc import (
    adaptive_tempered,
    base,
    ess,
    from_mcmc,
    inner_kernel_tuning,
    partial_posteriors_path,
    resampling,
    solver,
    tempered,
    tuning,
    waste_free,
)
from blackjax_tpu.smc.base import extend_params

__all__ = [
    "adaptive_tempered",
    "base",
    "ess",
    "extend_params",
    "from_mcmc",
    "inner_kernel_tuning",
    "partial_posteriors_path",
    "resampling",
    "solver",
    "tempered",
    "tuning",
    "waste_free",
]
