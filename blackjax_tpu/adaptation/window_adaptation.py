"""Public Stan-style window adaptation API.

Behavioral parity target: ``blackjax/adaptation/window_adaptation.py:296`` —
a thin, frozen wrapper over the staged engine with Welford cores.
"""
from typing import Callable, Optional

import jax.numpy as jnp

from blackjax_tpu.adaptation.base import return_all_adapt_info
from blackjax_tpu.adaptation.mass_matrix import (
    MassMatrixAdaptationState,
    welford_algorithm,
)
from blackjax_tpu.adaptation.staged_adaptation import (
    StagedAdaptationState,
    build_schedule,
    staged_adaptation,
)
from blackjax_tpu.base import AdaptationAlgorithm
from blackjax_tpu.types import Array

__all__ = ["window_adaptation", "WindowAdaptationState", "build_schedule"]

WindowAdaptationState = StagedAdaptationState


def window_adaptation(
    algorithm,
    logdensity_fn: Callable,
    is_mass_matrix_diagonal: bool = True,
    initial_inverse_mass_matrix: Optional[Array] = None,
    imm_shrinkage_to_previous: float = 0.0,
    initial_step_size: float = 1.0,
    target_acceptance_rate: float = 0.80,
    adaptation_info_fn: Callable = return_all_adapt_info,
    n_chains: int = 1,
    **extra_parameters,
) -> AdaptationAlgorithm:
    """Tune ``(step_size, inverse_mass_matrix)`` for an HMC-family algorithm
    with Stan's three-phase window schedule.

    Parity note (deliberate omission): the reference also re-exports a frozen
    legacy ``base()`` (``blackjax/adaptation/window_adaptation.py:62``),
    deprecated upstream in favor of the staged engine. This package exposes
    the staged engine directly (:mod:`blackjax_tpu.adaptation.
    staged_adaptation`), which subsumes ``base()``'s composition surface, so
    the legacy entry point is intentionally not reproduced.

    ``initial_inverse_mass_matrix`` seeds the first window's geometry;
    ``imm_shrinkage_to_previous`` is a pseudo-count blending each window's
    estimate toward the previous window's IMM (0 = Stan behavior).
    """
    if imm_shrinkage_to_previous < 0:
        raise ValueError(
            f"imm_shrinkage_to_previous must be >= 0, got {imm_shrinkage_to_previous}."
        )
    if initial_inverse_mass_matrix is not None:
        ndim_expected = 1 if is_mass_matrix_diagonal else 2
        if jnp.ndim(initial_inverse_mass_matrix) != ndim_expected:
            raise ValueError(
                "initial_inverse_mass_matrix has the wrong number of dimensions: "
                f"expected {ndim_expected} for "
                f"{'diagonal' if is_mass_matrix_diagonal else 'dense'} adaptation, "
                f"got {jnp.ndim(initial_inverse_mass_matrix)}."
            )

    initial_metric_state = None
    if initial_inverse_mass_matrix is not None:
        wc_init, _, _ = welford_algorithm(is_mass_matrix_diagonal)
        d = initial_inverse_mass_matrix.shape[0]
        initial_metric_state = MassMatrixAdaptationState(
            jnp.asarray(initial_inverse_mass_matrix), wc_init(d)
        )

    return staged_adaptation(
        algorithm,
        logdensity_fn,
        metric="welford_diag" if is_mass_matrix_diagonal else "welford_dense",
        metric_options={"imm_shrinkage_to_previous": imm_shrinkage_to_previous},
        initial_step_size=initial_step_size,
        target_acceptance_rate=target_acceptance_rate,
        initial_metric_state=initial_metric_state,
        adaptation_info_fn=adaptation_info_fn,
        n_chains=n_chains,
        **extra_parameters,
    )
