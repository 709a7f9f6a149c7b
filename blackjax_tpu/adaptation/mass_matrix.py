"""Mass-matrix estimation: Welford online covariance plus the Stan
regularization used at slow-window boundaries.

Behavioral parity target: ``blackjax/adaptation/mass_matrix.py`` (Welford
:364, regularized adaptation :111 with the shrink-to-previous pseudo-count
generalization :339-354).

TPU note: ``update`` also accepts a batched ``(M, d)`` value, folding a whole
chain block into the estimator in one call — the multi-chain warmup path
feeds ensembles this way instead of scanning chains.
"""
from typing import Callable, NamedTuple

import jax.numpy as jnp

from blackjax_tpu.types import Array, ArrayLike

__all__ = [
    "WelfordAlgorithmState",
    "MassMatrixAdaptationState",
    "welford_algorithm",
    "mass_matrix_adaptation",
]


class WelfordAlgorithmState(NamedTuple):
    mean: Array
    m2: Array
    sample_size: int


class MassMatrixAdaptationState(NamedTuple):
    inverse_mass_matrix: Array
    wc_state: WelfordAlgorithmState


def welford_algorithm(is_diagonal_matrix: bool) -> tuple[Callable, Callable, Callable]:
    """Numerically stable streaming mean/covariance via the sum of squared
    deviations ``M2``. Returns ``(init, update, final)``; ``final`` yields
    ``(covariance, sample_size, mean)``."""

    def init(n_dims: int) -> WelfordAlgorithmState:
        mean = jnp.zeros((n_dims,))
        m2 = jnp.zeros((n_dims,)) if is_diagonal_matrix else jnp.zeros((n_dims, n_dims))
        return WelfordAlgorithmState(mean, m2, 0)

    def update(state: WelfordAlgorithmState, value: ArrayLike) -> WelfordAlgorithmState:
        mean, m2, sample_size = state
        value = jnp.atleast_2d(value)  # (B, d); B = 1 for the scalar-chain path
        batch = value.shape[0]

        # batched Welford via Chan-Golub-LeVeque merge of the batch block
        batch_mean = jnp.mean(value, axis=0)
        centered = value - batch_mean
        if is_diagonal_matrix:
            batch_m2 = jnp.sum(centered**2, axis=0)
        else:
            batch_m2 = centered.T @ centered

        new_size = sample_size + batch
        delta = batch_mean - mean
        new_mean = mean + delta * (batch / new_size)
        if is_diagonal_matrix:
            cross = delta**2 * (sample_size * batch / new_size)
        else:
            cross = jnp.outer(delta, delta) * (sample_size * batch / new_size)
        return WelfordAlgorithmState(new_mean, m2 + batch_m2 + cross, new_size)

    def final(state: WelfordAlgorithmState):
        mean, m2, sample_size = state
        covariance = m2 / (sample_size - 1)
        return covariance, sample_size, mean

    return init, update, final


def mass_matrix_adaptation(
    is_diagonal_matrix: bool = True,
    imm_shrinkage_to_previous: float = 0.0,
) -> tuple[Callable, Callable, Callable]:
    """Window-reset mass-matrix adaptation from the chain's positions.

    ``final`` regularizes the window covariance with the Stan formula,
    generalized with a shrink-to-previous pseudo-count:
    ``IMM = (n * cov + s * prev + 5 * 1e-3 * I) / (n + s + 5)``, then resets
    the accumulator for the next window.
    """
    wc_init, wc_update, wc_final = welford_algorithm(is_diagonal_matrix)

    def init(n_dims: int) -> MassMatrixAdaptationState:
        if is_diagonal_matrix:
            imm = jnp.ones(n_dims)
        else:
            imm = jnp.identity(n_dims)
        return MassMatrixAdaptationState(imm, wc_init(n_dims))

    def update(state: MassMatrixAdaptationState, position: ArrayLike):
        return MassMatrixAdaptationState(
            state.inverse_mass_matrix, wc_update(state.wc_state, position)
        )

    def final(state: MassMatrixAdaptationState) -> MassMatrixAdaptationState:
        previous_imm, wc_state = state
        covariance, count, mean = wc_final(wc_state)
        denom = count + 5 + imm_shrinkage_to_previous
        shrunk = (
            (count / denom) * covariance
            + (imm_shrinkage_to_previous / denom) * previous_imm
        )
        if is_diagonal_matrix:
            imm = shrunk + (5 / denom) * 1e-3
        else:
            imm = shrunk + (5 / denom) * 1e-3 * jnp.identity(mean.shape[0])
        return MassMatrixAdaptationState(imm, wc_init(mean.shape[0]))

    return init, update, final
