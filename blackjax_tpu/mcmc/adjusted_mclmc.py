"""Metropolis-adjusted microcanonical Langevin Monte Carlo (static
trajectory length).

Behavioral parity target: ``blackjax/mcmc/adjusted_mclmc.py`` (proposal
:194, ``rescale`` :281). The energy change of the isokinetic flow — the
accumulated kinetic change minus the logdensity change — plays the role of
the Hamiltonian energy difference in the MH correction.
"""
import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators
from blackjax_tpu.mcmc.hmc import HMCInfo, HMCState
from blackjax_tpu.mcmc.proposal import static_binomial_sampling
from blackjax_tpu.types import ArrayLikeTree, PRNGKey
from blackjax_tpu.util import generate_unit_vector

__all__ = ["init", "build_kernel", "as_top_level_api", "adjusted_mclmc_proposal", "rescale"]


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> HMCState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return HMCState(position, logdensity, logdensity_grad)


def rescale(mu):
    """Scale ``s`` such that ``round(U(0,1) * s + 0.5)`` has mean ``mu``."""
    k = jnp.floor(2 * mu - 1)
    x = k * (mu - 0.5 * (k + 1)) / (k + 1 - mu)
    return k + x


def adjusted_mclmc_proposal(
    integrator: Callable,
    step_size,
    L_proposal_factor: float,
    num_integration_steps: int = 1,
    divergence_threshold: float = 1000,
    *,
    sample_proposal: Callable = static_binomial_sampling,
    max_num_integration_steps: int = None,
) -> Callable:
    """Integrate the stochastic isokinetic dynamics ``num_integration_steps``
    times and Metropolis-accept the endpoint against the accumulated energy
    change. ``max_num_integration_steps`` (static) enables the masked
    fixed-trip loop for traced per-chain step counts."""

    def one_step(i, carry):
        state, kinetic_sum, rng_key = carry
        step_key, next_key = jax.random.split(rng_key)
        next_state, dK = integrator(state, step_size, L_proposal_factor, step_key)
        return next_state, kinetic_sum + dK, next_key

    def masked_one_step(i, carry):
        # statically-bounded loop for traced per-chain step counts: freeze
        # the whole carry (state, kinetic sum, AND key stream) past the
        # drawn count — bit-identical to running exactly n steps
        new = one_step(i, carry)
        return jax.tree.map(
            lambda a, b: jnp.where(i < num_integration_steps, a, b), new, carry
        )

    def generate(rng_key, state: integrators.IntegratorState):
        # zero derived from data so it carries the right sharding type
        kinetic0 = state.logdensity * 0.0
        if max_num_integration_steps is None:
            end_state, kinetic_sum, rng_key = jax.lax.fori_loop(
                0, num_integration_steps, one_step, (state, kinetic0, rng_key)
            )
        else:
            end_state, kinetic_sum, rng_key = jax.lax.fori_loop(
                0, max_num_integration_steps, masked_one_step,
                (state, kinetic0, rng_key),
            )

        new_energy = -end_state.logdensity
        delta_energy = end_state.logdensity - state.logdensity - kinetic_sum
        delta_energy = jnp.where(jnp.isnan(delta_energy), -jnp.inf, delta_energy)
        is_diverging = -delta_energy > divergence_threshold
        sampled, (do_accept, p_accept, other_info) = sample_proposal(
            rng_key, delta_energy, state, end_state
        )
        info = HMCInfo(
            state.momentum,
            p_accept,
            do_accept,
            is_diverging,
            new_energy,
            end_state,
            num_integration_steps,
        )
        return sampled, info, other_info

    return generate


def build_kernel(
    integrator: Callable = integrators.isokinetic_mclachlan,
    divergence_threshold: float = 1000,
    max_integration_steps: int = None,
):
    """Adjusted MCLMC kernel with full momentum resampling per transition.
    ``max_integration_steps`` (static) enables the masked fixed-trip
    integration loop for traced per-chain step counts."""

    def kernel(
        rng_key: PRNGKey,
        state: HMCState,
        logdensity_fn: Callable,
        step_size: float,
        integration_steps_params: tuple = (1,),
        inverse_mass_matrix=1.0,
        L_proposal_factor: float = jnp.inf,
    ) -> tuple[HMCState, HMCInfo]:
        (num_integration_steps,) = integration_steps_params

        key_momentum, key_integrator = jax.random.split(rng_key)
        momentum = generate_unit_vector(key_momentum, state.position)
        stochastic_integrator = integrators.with_isokinetic_maruyama(
            integrator(logdensity_fn, inverse_mass_matrix)
        )
        generate = adjusted_mclmc_proposal(
            stochastic_integrator,
            step_size,
            L_proposal_factor * (num_integration_steps * step_size),
            num_integration_steps,
            divergence_threshold,
            max_num_integration_steps=max_integration_steps,
        )
        proposal, info, _ = generate(
            key_integrator,
            integrators.IntegratorState(
                state.position, momentum, state.logdensity, state.logdensity_grad
            ),
        )
        return HMCState(proposal.position, proposal.logdensity, proposal.logdensity_grad), info

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    L_proposal_factor: float = jnp.inf,
    inverse_mass_matrix=1.0,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.isokinetic_mclachlan,
    num_integration_steps: Optional[int] = None,
    integration_steps_params: Optional[tuple] = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.adjusted_mclmc(...)``."""
    if integration_steps_params is not None and num_integration_steps is not None:
        warnings.warn(
            "Both `num_integration_steps` and `integration_steps_params` "
            "given; using `integration_steps_params`.",
            DeprecationWarning,
            stacklevel=2,
        )
    if integration_steps_params is None:
        if num_integration_steps is None:
            raise ValueError(
                "Provide `num_integration_steps` or `integration_steps_params`."
            )
        integration_steps_params = (num_integration_steps,)

    kernel = build_kernel(integrator=integrator, divergence_threshold=divergence_threshold)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(
            step_size,
            integration_steps_params,
            inverse_mass_matrix,
            L_proposal_factor,
        ),
    )
