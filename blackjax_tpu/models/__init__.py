from blackjax_tpu.models.targets import (
    eight_schools_noncentered,
    finnish_horseshoe,
    hierarchical_gaussian,
    ill_conditioned_gaussian,
    logistic_regression,
    standard_normal,
)

__all__ = [
    "standard_normal",
    "ill_conditioned_gaussian",
    "hierarchical_gaussian",
    "eight_schools_noncentered",
    "finnish_horseshoe",
    "logistic_regression",
]
