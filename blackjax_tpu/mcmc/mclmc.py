"""Microcanonical Langevin Monte Carlo (unadjusted).

Behavioral parity target: ``blackjax/mcmc/mclmc.py`` (kernel :65, NaN and
high-energy guard rails :128-142). State is a bare
:class:`~blackjax_tpu.mcmc.integrators.IntegratorState`; the dynamics are the
isokinetic ESH flow with Maruyama O-U partial momentum refresh, parametrized
by the decoherence length ``L`` and the step size.
"""
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc.integrators import (
    IntegratorState,
    isokinetic_mclachlan,
    with_isokinetic_maruyama,
)
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.mcmc.proposal import tree_select
from blackjax_tpu.types import ArrayLike, PRNGKey
from blackjax_tpu.util import generate_unit_vector, pytree_size

__all__ = ["MCLMCInfo", "init", "build_kernel", "as_top_level_api"]


class MCLMCInfo(NamedTuple):
    logdensity: float
    kinetic_change: float
    energy_change: float
    nonans: bool


def init(position: ArrayLike, logdensity_fn, rng_key):
    if pytree_size(position) < 2:
        raise ValueError("MCLMC requires a target with more than 1 dimension.")
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return IntegratorState(
        position, generate_unit_vector(rng_key, position), logdensity, logdensity_grad
    )


def _all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in leaves]))


def _revert(previous_state: IntegratorState, info: MCLMCInfo, key, nonans):
    """Rejected-transition state: previous position with a freshly drawn unit
    momentum, zeroed energy changes."""
    return (
        IntegratorState(
            previous_state.position,
            generate_unit_vector(key, previous_state.position),
            previous_state.logdensity,
            previous_state.logdensity_grad,
        ),
        MCLMCInfo(
            logdensity=previous_state.logdensity,
            kinetic_change=jnp.zeros_like(info.kinetic_change),
            energy_change=jnp.zeros_like(info.energy_change),
            nonans=nonans,
        ),
    )


def handle_nans(previous_state, next_state, info, key):
    """Revert non-finite transitions (position, momentum, OR logdensity) and
    flag them in ``info.nonans``."""
    nonans = (
        _all_finite(next_state.position)
        & _all_finite(next_state.momentum)
        & jnp.isfinite(next_state.logdensity)
    )
    reverted_state, reverted_info = _revert(previous_state, info, key, nonans)
    state = tree_select(nonans, next_state, reverted_state)
    info = tree_select(nonans, info, reverted_info._replace(nonans=nonans))
    return state, info


def handle_high_energy(previous_state, next_state, info, key, cutoff):
    """Revert transitions whose |energy change| exceeds the cutoff (an
    unadjusted-sampler divergence guard)."""
    ok = jnp.abs(info.energy_change) <= cutoff
    reverted_state, reverted_info = _revert(previous_state, info, key, info.nonans)
    state = tree_select(ok, next_state, reverted_state)
    info = tree_select(ok, info, reverted_info)
    return state, info


def build_kernel(
    integrator: Callable = isokinetic_mclachlan,
    desired_energy_var_max_ratio: float = jnp.inf,
    desired_energy_var: float = 5e-4,
):
    """MCLMC kernel: one stochastic isokinetic step plus NaN / high-energy
    rejection. ``inverse_mass_matrix`` may be scalar / 1-D (diagonal) or a
    :class:`LowRankInverseMassMatrix` (O(dk) LRD preconditioning)."""

    def kernel(
        rng_key: PRNGKey,
        state: IntegratorState,
        logdensity_fn: Callable,
        inverse_mass_matrix: Union[ArrayLike, LowRankInverseMassMatrix],
        L: float,
        step_size: float,
    ) -> tuple[IntegratorState, MCLMCInfo]:
        step = with_isokinetic_maruyama(
            integrator(logdensity_fn, inverse_mass_matrix)
        )
        kernel_key, energy_key, nan_key = jax.random.split(rng_key, 3)

        new_state, kinetic_change = step(state, step_size, L, kernel_key)
        energy_change = kinetic_change - new_state.logdensity + state.logdensity

        info = MCLMCInfo(
            logdensity=new_state.logdensity,
            kinetic_change=kinetic_change,
            energy_change=energy_change,
            nonans=jnp.asarray(True),
        )

        ndims = pytree_size(new_state.position)
        cutoff = jnp.sqrt(ndims * desired_energy_var_max_ratio * desired_energy_var)
        new_state, info = handle_high_energy(state, new_state, info, energy_key, cutoff)
        new_state, info = handle_nans(state, new_state, info, nan_key)
        return new_state, info

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    L,
    step_size,
    integrator=isokinetic_mclachlan,
    inverse_mass_matrix: Union[ArrayLike, LowRankInverseMassMatrix] = 1.0,
    desired_energy_var_max_ratio=jnp.inf,
) -> SamplingAlgorithm:
    """``blackjax_tpu.mclmc(...)``."""
    kernel = build_kernel(
        integrator=integrator,
        desired_energy_var_max_ratio=desired_energy_var_max_ratio,
    )
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(inverse_mass_matrix, L, step_size),
        pass_rng_key_to_init=True,
    )
