"""Hamiltonian Monte Carlo with a static trajectory length.

One transition is: resample the momentum from the metric, integrate the
Hamiltonian flow for a fixed number of leapfrog steps, then either
Metropolis-accept the (momentum-flipped) endpoint — classic HMC — or draw
one state from the whole trajectory proportional to ``exp(-H)`` —
multinomial HMC.  Both variants share the kernel spine here; the proposal
rule is a pluggable ``build_proposal``.

Everything in this module is shape-stable and branch-free, so the kernel
vmaps cleanly over a chain axis and runs in lockstep on TPU.

Behavioral parity: ``blackjax/mcmc/hmc.py`` (``HMCState`` :38, endpoint
proposal :115, multinomial proposal :181, kernel :251).
"""
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators, metrics, trajectory
from blackjax_tpu.mcmc.proposal import safe_energy_diff, static_binomial_sampling
from blackjax_tpu.mcmc.trajectory import hmc_energy
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "HMCState",
    "HMCInfo",
    "init",
    "build_kernel",
    "as_top_level_api",
    "hmc_proposal",
    "multinomial_hmc_proposal",
    "flip_momentum",
]


class HMCState(NamedTuple):
    """Chain state: position plus cached logdensity and gradient (the cache
    saves one gradient evaluation per transition)."""

    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


class HMCInfo(NamedTuple):
    """Per-transition diagnostics."""

    momentum: ArrayTree
    acceptance_rate: float
    is_accepted: bool
    is_divergent: bool
    energy: float
    proposal: integrators.IntegratorState
    num_integration_steps: int


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> HMCState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return HMCState(position, logdensity, logdensity_grad)


def flip_momentum(state: integrators.IntegratorState) -> integrators.IntegratorState:
    """Negate the endpoint momentum, making the proposal map an involution
    (integrate-then-flip composed with itself is the identity) — the
    requirement for detailed balance."""
    return state._replace(momentum=jax.tree.map(jnp.negative, state.momentum))


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    build_proposal: Callable = None,
    max_num_integration_steps: int = None,
    integration_unroll: int = 1,
):
    """The HMC kernel spine: momentum refresh -> trajectory -> proposal rule.

    Tunables (``step_size``, ``inverse_mass_matrix``,
    ``num_integration_steps``) are per-call arguments so adaptation loops
    can retune them without re-closing (and re-tracing) anything.
    ``max_num_integration_steps`` (static) enables the masked fixed-trip
    integration loop for traced per-chain step counts (drawn-length lifts).
    """
    propose = hmc_proposal if build_proposal is None else build_proposal
    propose_kwargs = {}
    if max_num_integration_steps is not None:
        propose_kwargs["max_num_integration_steps"] = max_num_integration_steps
    if integration_unroll != 1:
        propose_kwargs["integration_unroll"] = integration_unroll

    def kernel(
        rng_key: PRNGKey,
        state: HMCState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        num_integration_steps: int,
    ) -> tuple[HMCState, HMCInfo]:
        metric = metrics.default_metric(inverse_mass_matrix)
        generate = propose(
            integrator(logdensity_fn, metric.kinetic_energy),
            metric.kinetic_energy,
            step_size,
            num_integration_steps,
            divergence_threshold,
            **propose_kwargs,
        )
        key_refresh, key_propose = jax.random.split(rng_key)
        phase_point = integrators.IntegratorState(
            state.position,
            metric.sample_momentum(key_refresh, state.position),
            state.logdensity,
            state.logdensity_grad,
        )
        landed, info, _ = generate(key_propose, phase_point)
        return HMCState(landed.position, landed.logdensity, landed.logdensity_grad), info

    return kernel


def hmc_proposal(
    integrator: Callable,
    kinetic_energy: Callable,
    step_size: Union[float, ArrayLikeTree],
    num_integration_steps: int = 1,
    divergence_threshold: float = 1000,
    *,
    sample_proposal: Callable = static_binomial_sampling,
    max_num_integration_steps: int = None,
    integration_unroll: int = 1,
) -> Callable:
    """Classic endpoint HMC: the proposal is the momentum-flipped end of the
    trajectory; accept with probability ``min(1, exp(H(z0) - H(z1)))``.

    Pass a static ``max_num_integration_steps`` when ``num_integration_steps``
    is traced and per-chain (drawn-length kernels): the integration runs as
    a statically-bounded masked loop (see
    :func:`blackjax_tpu.mcmc.trajectory.static_integration`)."""
    roll_forward = trajectory.static_integration(integrator)
    total_energy = hmc_energy(kinetic_energy)

    def generate(rng_key, head: integrators.IntegratorState):
        tail = flip_momentum(
            roll_forward(
                head,
                step_size,
                num_integration_steps,
                max_num_integration_steps,
                unroll=integration_unroll,
            )
        )
        h_tail = total_energy(tail)
        energy_drop = safe_energy_diff(total_energy(head), h_tail)
        landed, (accepted, p_accept, extra) = sample_proposal(
            rng_key, energy_drop, head, tail
        )
        info = HMCInfo(
            head.momentum,
            p_accept,
            accepted,
            -energy_drop > divergence_threshold,
            h_tail,
            tail,
            num_integration_steps,
        )
        return landed, info, extra

    return generate


def multinomial_hmc_proposal(
    integrator: Callable,
    kinetic_energy: Callable,
    step_size: Union[float, ArrayLikeTree],
    num_integration_steps: int = 1,
    divergence_threshold: float = 1000,
) -> Callable:
    """Multinomial HMC: draw one state from the whole trajectory with weight
    ``exp(-H)`` via O(1)-memory progressive reservoir sampling.  There is no
    rejection step, so ``is_accepted`` is identically True."""
    sample_trajectory = trajectory.static_progressive_integration(
        integrator, kinetic_energy, num_integration_steps, divergence_threshold
    )

    def generate(rng_key, head: integrators.IntegratorState):
        reservoir, diverged = sample_trajectory(rng_key, head, step_size)
        info = HMCInfo(
            momentum=head.momentum,
            # diagnostic: mean exponentiated energy difference over the
            # trajectory, NOT a Metropolis acceptance probability
            acceptance_rate=jnp.exp(reservoir.sum_log_p_accept)
            / num_integration_steps,
            is_accepted=jnp.asarray(True),
            is_divergent=diverged,
            energy=reservoir.energy,
            proposal=reservoir.state,
            num_integration_steps=num_integration_steps,
        )
        return reservoir.state, info, None

    return generate


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: metrics.MetricTypes,
    num_integration_steps: int,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    build_proposal: Callable = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.hmc(...)``: the general kernel specialized over fixed
    tunables."""
    kernel = build_kernel(integrator, divergence_threshold, build_proposal)
    metric = metrics.default_metric(inverse_mass_matrix)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, metric, num_integration_steps),
    )
