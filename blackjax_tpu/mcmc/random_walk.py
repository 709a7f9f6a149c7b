"""Random-walk Metropolis-Hastings family: additive-step RW, independent
RMH (IRMH), and the general RMH with asymmetric proposal support.

Behavioral parity target: ``blackjax/mcmc/random_walk.py`` (additive step
:168, IRMH :252, RMH :346, asymmetric transition energy :453).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import proposal
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = [
    "RWState",
    "RWInfo",
    "init",
    "normal",
    "build_additive_step",
    "build_irmh",
    "build_rmh",
    "normal_random_walk",
    "additive_step_random_walk",
    "irmh_as_top_level_api",
    "rmh_as_top_level_api",
]


class RWState(NamedTuple):
    position: ArrayTree
    logdensity: float


class RWInfo(NamedTuple):
    acceptance_rate: float
    is_accepted: bool
    proposal: RWState


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> RWState:
    return RWState(position, logdensity_fn(position))


def normal(sigma: Array) -> Callable:
    """Symmetric Gaussian move proposal with scale ``sigma`` (scalar, diag,
    or dense)."""

    def propose(rng_key: PRNGKey, position: ArrayLikeTree) -> ArrayTree:
        return generate_gaussian_noise(rng_key, position, sigma=sigma)

    return propose


def _transition_energy(proposal_logdensity_fn: Optional[Callable]) -> Callable:
    """Symmetric: ``-logpi(y)``. Asymmetric: subtract the reverse proposal
    log-density ``log q(y -> x)``."""
    if proposal_logdensity_fn is None:
        return lambda prev_state, new_state: -new_state.logdensity
    return (
        lambda prev_state, new_state: -new_state.logdensity
        - proposal_logdensity_fn(new_state, prev_state)
    )


def _rmh_step(
    logdensity_fn: Callable,
    transition_generator: Callable,
    proposal_logdensity_fn: Optional[Callable],
    sample_proposal: Callable = proposal.static_binomial_sampling,
):
    log_acceptance_ratio = proposal.compute_asymmetric_acceptance_ratio(
        _transition_energy(proposal_logdensity_fn)
    )

    def step(rng_key, state: RWState):
        key_proposal, key_accept = jax.random.split(rng_key)
        new_position = transition_generator(key_proposal, state.position)
        proposed = RWState(new_position, logdensity_fn(new_position))
        log_p_accept = log_acceptance_ratio(state, proposed)
        accepted, (do_accept, p_accept, _) = sample_proposal(
            key_accept, log_p_accept, state, proposed
        )
        return accepted, do_accept, p_accept

    return step


def build_rmh():
    """General Rosenbluth-Metropolis-Hastings kernel: any transition
    generator, optional asymmetric proposal correction."""

    def kernel(
        rng_key: PRNGKey,
        state: RWState,
        logdensity_fn: Callable,
        transition_generator: Callable,
        proposal_logdensity_fn: Optional[Callable] = None,
    ) -> tuple[RWState, RWInfo]:
        step = _rmh_step(logdensity_fn, transition_generator, proposal_logdensity_fn)
        new_state, do_accept, p_accept = step(rng_key, state)
        return new_state, RWInfo(p_accept, do_accept, new_state)

    return kernel


def build_additive_step():
    """RW-MH where the proposal adds a symmetric random step to the current
    position."""
    rmh = build_rmh()

    def kernel(
        rng_key: PRNGKey, state: RWState, logdensity_fn: Callable, random_step: Callable
    ) -> tuple[RWState, RWInfo]:
        def transition_generator(key, position):
            move = random_step(key, position)
            return jax.tree.map(jnp.add, position, move)

        return rmh(rng_key, state, logdensity_fn, transition_generator)

    return kernel


def build_irmh() -> Callable:
    """Independent RMH: proposals do not depend on the current position."""
    rmh = build_rmh()

    def kernel(
        rng_key: PRNGKey,
        state: RWState,
        logdensity_fn: Callable,
        proposal_distribution: Callable,
        proposal_logdensity_fn: Optional[Callable] = None,
    ) -> tuple[RWState, RWInfo]:
        def transition_generator(key, position):
            del position
            return proposal_distribution(key)

        return rmh(
            rng_key, state, logdensity_fn, transition_generator, proposal_logdensity_fn
        )

    return kernel


def additive_step_random_walk(
    logdensity_fn: Callable, random_step: Callable
) -> SamplingAlgorithm:
    """``blackjax_tpu.additive_step_random_walk(...)``."""
    kernel = build_additive_step()
    return build_sampling_algorithm(
        kernel, init, logdensity_fn, kernel_args=(random_step,)
    )


def normal_random_walk(logdensity_fn: Callable, sigma) -> SamplingAlgorithm:
    """Additive-step RW with a Gaussian proposal of scale ``sigma``."""
    return additive_step_random_walk(logdensity_fn, normal(sigma))


def irmh_as_top_level_api(
    logdensity_fn: Callable,
    proposal_distribution: Callable,
    proposal_logdensity_fn: Optional[Callable] = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.irmh(...)``."""
    kernel = build_irmh()
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(proposal_distribution, proposal_logdensity_fn),
    )


def rmh_as_top_level_api(
    logdensity_fn: Callable,
    proposal_generator: Callable,
    proposal_logdensity_fn: Optional[Callable] = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.rmh(...)``."""
    kernel = build_rmh()
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(proposal_generator, proposal_logdensity_fn),
    )
