"""TPU hot-path kernels (Pallas) and the registered-target registry.

This is the S4 layer of the build plan (SURVEY.md §7): the generic sampling
path runs vmapped XLA; for registered analytic targets the leapfrog inner
loop drops into a fused Pallas kernel that keeps a chain tile resident in
VMEM across every integration step (one HBM round-trip per trajectory
instead of one per step).
"""
from blackjax_tpu.ops.fused_hmc import FusedHMCInfo, FusedHMCState, fused_hmc
from blackjax_tpu.ops.fused_leapfrog import (
    TargetKernel,
    fused_leapfrog,
    get_registered_target,
    make_gaussian_target,
    make_hierarchical_gaussian_target,
    make_logistic_regression_target,
    register_target,
)

__all__ = [
    "TargetKernel",
    "FusedHMCInfo",
    "FusedHMCState",
    "fused_hmc",
    "fused_leapfrog",
    "get_registered_target",
    "make_gaussian_target",
    "make_hierarchical_gaussian_target",
    "make_logistic_regression_target",
    "register_target",
]
