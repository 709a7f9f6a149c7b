from blackjax_tpu.mcmc import (
    hmc,
    integrators,
    metrics,
    nuts,
    proposal,
    termination,
    trajectory,
)

__all__ = [
    "hmc",
    "integrators",
    "metrics",
    "nuts",
    "proposal",
    "termination",
    "trajectory",
]
