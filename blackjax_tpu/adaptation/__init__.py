from blackjax_tpu.adaptation import (
    chees_adaptation,
    mass_matrix,
    mclmc_adaptation,
    meads_adaptation,
    metric_recipes,
    pathfinder_adaptation,
    staged_adaptation,
    step_size,
    window_adaptation,
)
from blackjax_tpu.adaptation.base import AdaptationInfo, AdaptationResults

__all__ = [
    "chees_adaptation",
    "mass_matrix",
    "mclmc_adaptation",
    "meads_adaptation",
    "metric_recipes",
    "pathfinder_adaptation",
    "staged_adaptation",
    "step_size",
    "window_adaptation",
    "AdaptationInfo",
    "AdaptationResults",
]
