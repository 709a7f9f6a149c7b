"""Mass-matrix estimation: Welford online covariance, the Stan
regularization at slow-window boundaries, and the Fisher-diagonal
accumulation path.

Behavioral parity target: ``blackjax/adaptation/mass_matrix.py`` (Welford
:364, regularized adaptation :111 with the shrink-to-previous pseudo-count
generalization :339-354, Fisher diagonal accumulator path :249-333).

TPU note: ``update`` also accepts a batched ``(M, d)`` value, folding a whole
chain block into the estimator in one call — the multi-chain warmup path
feeds ensembles this way instead of scanning chains.
"""
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.types import Array, ArrayLike

__all__ = [
    "WelfordAlgorithmState",
    "MassMatrixAdaptationState",
    "FisherMassMatrixAdaptationState",
    "FisherMomentBlock",
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


class FisherMomentBlock(NamedTuple):
    """Diagonal position + gradient moment accumulator (O(d) state)."""

    count: Array
    mean_x: Array
    m2_x: Array
    mean_g: Array
    m2_g: Array


class FisherMassMatrixAdaptationState(NamedTuple):
    inverse_mass_matrix: Array
    fisher_block: FisherMomentBlock


def fisher_block_init(d: int) -> FisherMomentBlock:
    return FisherMomentBlock(
        jnp.zeros(()), jnp.zeros(d), jnp.zeros(d), jnp.zeros(d), jnp.zeros(d)
    )


def fisher_block_update(
    block: FisherMomentBlock, positions: Array, grads: Array
) -> FisherMomentBlock:
    """Fold a batch of (position, gradient) pairs into the diagonal moment
    block (batched CGL merge, accepting (d,) or (M, d))."""
    positions = jnp.atleast_2d(positions)
    grads = jnp.atleast_2d(grads)
    batch = positions.shape[0]

    def merge(count, mean, m2, values):
        batch_mean = jnp.mean(values, axis=0)
        batch_m2 = jnp.sum((values - batch_mean) ** 2, axis=0)
        new_count = count + batch
        delta = batch_mean - mean
        new_mean = mean + delta * (batch / new_count)
        cross = delta**2 * (count * batch / new_count)
        return new_count, new_mean, m2 + batch_m2 + cross

    count_x, mean_x, m2_x = merge(block.count, block.mean_x, block.m2_x, positions)
    _, mean_g, m2_g = merge(block.count, block.mean_g, block.m2_g, grads)
    return FisherMomentBlock(count_x, mean_x, m2_x, mean_g, m2_g)


def welford_algorithm(
    is_diagonal_matrix: bool, axis_name: Optional[str] = None
) -> tuple[Callable, Callable, Callable]:
    """Numerically stable streaming mean/covariance via the sum of squared
    deviations ``M2``. Returns ``(init, update, final)``; ``final`` yields
    ``(covariance, sample_size, mean)``.

    With ``axis_name`` the batched ``update`` pools the batch over the named
    mesh axis as well (one ``psum`` per moment), so a ``shard_map``-resident
    warmup folds the GLOBAL chain block into a replicated estimator — the
    sharded counterpart of the multi-chain pooling path.
    """

    def init(n_dims: int) -> WelfordAlgorithmState:
        mean = jnp.zeros((n_dims,))
        m2 = jnp.zeros((n_dims,)) if is_diagonal_matrix else jnp.zeros((n_dims, n_dims))
        return WelfordAlgorithmState(mean, m2, 0)

    def update(state: WelfordAlgorithmState, value: ArrayLike) -> WelfordAlgorithmState:
        mean, m2, sample_size = state
        value = jnp.atleast_2d(value)  # (B, d); B = 1 for the scalar-chain path
        batch = value.shape[0]

        # batched Welford via Chan-Golub-LeVeque merge of the batch block
        if axis_name is None:
            batch_mean = jnp.mean(value, axis=0)
        else:
            batch = batch * jax.lax.axis_size(axis_name)
            batch_mean = jax.lax.psum(jnp.sum(value, axis=0), axis_name) / batch
        centered = value - batch_mean
        if is_diagonal_matrix:
            batch_m2 = jnp.sum(centered**2, axis=0)
        else:
            batch_m2 = centered.T @ centered
        if axis_name is not None:
            batch_m2 = jax.lax.psum(batch_m2, axis_name)

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
    diagonal_estimator: str = "welford",
) -> tuple[Callable, Callable, Callable]:
    """Window-reset mass-matrix adaptation.

    Welford path (default): ``final`` regularizes the window covariance with
    the Stan formula generalized with a shrink-to-previous pseudo-count:
    ``IMM = (n * cov + s * prev + 5 * 1e-3 * I) / (n + s + 5)``, then resets
    the accumulator.

    Fisher path (``diagonal_estimator="fisher"``, diagonal only):
    accumulates position AND gradient moments; ``final`` only resets the
    block — the caller (the fisher metric core) computes the IMM from the
    block's variances before calling ``final`` (no circular import with the
    estimators module).
    """
    if diagonal_estimator not in ("welford", "fisher"):
        raise ValueError(
            f"diagonal_estimator must be 'welford' or 'fisher', got "
            f"{diagonal_estimator!r}"
        )
    if diagonal_estimator == "fisher" and not is_diagonal_matrix:
        raise ValueError("The fisher estimator only supports diagonal matrices.")

    wc_init, wc_update, wc_final = welford_algorithm(is_diagonal_matrix)
    use_fisher = diagonal_estimator == "fisher"

    def init(n_dims: int, initial_inverse_mass_matrix: Optional[Array] = None):
        if initial_inverse_mass_matrix is not None:
            imm = jnp.asarray(initial_inverse_mass_matrix)
        elif is_diagonal_matrix:
            imm = jnp.ones(n_dims)
        else:
            imm = jnp.identity(n_dims)
        if use_fisher:
            return FisherMassMatrixAdaptationState(imm, fisher_block_init(n_dims))
        return MassMatrixAdaptationState(imm, wc_init(n_dims))


    def update(state, position: ArrayLike, grad: Optional[ArrayLike] = None):
        if isinstance(state, FisherMassMatrixAdaptationState):
            return FisherMassMatrixAdaptationState(
                state.inverse_mass_matrix,
                fisher_block_update(state.fisher_block, position, grad),
            )
        return MassMatrixAdaptationState(
            state.inverse_mass_matrix, wc_update(state.wc_state, position)
        )

    def final(state):
        if isinstance(state, FisherMassMatrixAdaptationState):
            # reset the block; the caller stitches in the new IMM (computed
            # from the block BEFORE this call)
            d = state.fisher_block.m2_x.shape[0]
            return FisherMassMatrixAdaptationState(
                state.inverse_mass_matrix, fisher_block_init(d)
            )

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
