from blackjax_tpu.adaptation import (
    mass_matrix,
    step_size,
)
from blackjax_tpu.adaptation.base import AdaptationInfo, AdaptationResults

__all__ = [
    "mass_matrix",
    "step_size",
    "AdaptationInfo",
    "AdaptationResults",
]
