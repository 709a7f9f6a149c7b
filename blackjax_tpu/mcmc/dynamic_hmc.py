"""HMC with a per-transition (quasi-)random number of integration steps.

This module contributes two things:

1. ``lift_drawn_steps`` — a combinator that turns any fixed-trajectory-
   length kernel into one whose step count is drawn afresh each transition
   from a carried generator argument (a PRNG key, a Halton index, ...).
   Randomized trajectory lengths break the resonances static HMC suffers on
   anisotropic targets and are the substrate for ChEES-style adaptation.
2. The base-2 Halton (van der Corput) sequence used as the low-discrepancy
   jitter source, plus ``rescale``/``halton_trajectory_length`` helpers to
   hit a requested mean length.

Behavioral parity: ``blackjax/mcmc/dynamic_hmc.py`` (carried generator arg
:39, Halton jitter :205).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators
from blackjax_tpu.mcmc.hmc import HMCState, hmc_proposal
from blackjax_tpu.mcmc.hmc import build_kernel as build_static_hmc_kernel
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "DynamicHMCState",
    "init",
    "build_kernel",
    "as_top_level_api",
    "halton_sequence",
    "halton_trajectory_length",
    "rescale",
    "lift_drawn_steps",
]


def _fresh_key(key):
    return jax.random.split(key)[1]


def _uniform_steps(key):
    return jax.random.randint(key, (), 1, 10)


class DynamicHMCState(NamedTuple):
    """HMC chain state extended with the carried argument that seeds the
    next transition's trajectory-length draw."""

    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree
    random_generator_arg: Array


def init(position: ArrayLikeTree, logdensity_fn: Callable, random_generator_arg: Array):
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return DynamicHMCState(position, logdensity, logdensity_grad, random_generator_arg)


def lift_drawn_steps(
    stepped_kernel: Callable,
    integration_steps_fn: Callable,
    next_random_arg_fn: Callable,
):
    """Lift ``stepped_kernel(rng_key, hmc_state, num_steps) -> (state, info)``
    into a kernel over :class:`DynamicHMCState`: draw the step count from
    the carried generator argument, run the fixed-length kernel, advance the
    carry."""

    def kernel(rng_key, state: DynamicHMCState, integration_steps_params=()):
        num_steps = integration_steps_fn(
            state.random_generator_arg, *integration_steps_params
        )
        chain = HMCState(state.position, state.logdensity, state.logdensity_grad)
        moved, info = stepped_kernel(rng_key, chain, num_steps)
        return (
            DynamicHMCState(
                moved.position,
                moved.logdensity,
                moved.logdensity_grad,
                next_random_arg_fn(state.random_generator_arg),
            ),
            info,
        )

    return kernel


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    next_random_arg_fn: Callable = _fresh_key,
    integration_steps_fn: Callable = _uniform_steps,
    build_proposal: Callable = hmc_proposal,
    max_integration_steps: int = None,
    integration_unroll: int = 1,
):
    """Dynamic-trajectory-length HMC as a lift of the static HMC kernel.

    ``max_integration_steps`` (static upper bound on what
    ``integration_steps_fn`` can draw) switches the integration to a masked
    fixed-trip loop — essential when the drawn counts differ per chain
    under vmap (measured 15x on v5e; see
    ``trajectory.static_integration``). ``integration_unroll`` amortizes the
    trajectory loop's fixed per-iteration cost when the drawn count is one
    shared scalar (the ChEES regime) — bit-identical, see
    ``static_integration``."""
    static_kernel = build_static_hmc_kernel(
        integrator,
        divergence_threshold,
        build_proposal,
        max_num_integration_steps=max_integration_steps,
        integration_unroll=integration_unroll,
    )

    def kernel(
        rng_key: PRNGKey, state: DynamicHMCState, logdensity_fn: Callable,
        step_size: float, inverse_mass_matrix: Array,
        integration_steps_params: tuple = (),
    ):
        stepped = lambda key, chain, n: static_kernel(
            key, chain, logdensity_fn, step_size, inverse_mass_matrix, n
        )
        lifted = lift_drawn_steps(stepped, integration_steps_fn, next_random_arg_fn)
        return lifted(rng_key, state, integration_steps_params)

    return kernel


def as_top_level_api(
    logdensity_fn: Callable, step_size: float, inverse_mass_matrix: Array, *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    next_random_arg_fn: Callable = _fresh_key,
    integration_steps_fn: Callable = _uniform_steps,
    integration_steps_params: tuple = (),
    build_proposal: Callable = hmc_proposal,
    max_integration_steps: int = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.dynamic_hmc(...)``."""
    kernel = build_kernel(
        integrator, divergence_threshold, next_random_arg_fn,
        integration_steps_fn, build_proposal, max_integration_steps,
    )
    return build_sampling_algorithm(
        kernel, init, logdensity_fn,
        kernel_args=(step_size, inverse_mass_matrix, integration_steps_params),
        pass_rng_key_to_init=True,
    )


# ---------------------------------------------------------------------------
# Low-discrepancy trajectory-length jitter.
# ---------------------------------------------------------------------------


def halton_sequence(i: Array, max_bits: int = 10) -> float:
    """Element ``i`` (0-based) of the base-2 van der Corput sequence, by bit
    reversal of ``i + 1`` over ``max_bits`` bits.  Successive values fill
    (0, 1) far more evenly than IID uniforms, which keeps ChEES-style
    trajectory-length averages stable at small sample counts."""
    if max_bits >= jnp.iinfo(i.dtype).bits:
        raise ValueError(
            f"max_bits ({max_bits}) must be smaller than the bit width of "
            f"{i.dtype} ({jnp.iinfo(i.dtype).bits})"
        )
    place_value = 2 ** jnp.arange(max_bits, dtype=i.dtype)
    digits = ((i + 1) // place_value) % 2
    return jnp.sum(digits * 0.5 / place_value)


def rescale(mu):
    """The scale ``s`` for which ``round(U(0,1) * s + 0.5)`` has mean
    ``mu`` (converts a target average trajectory length into the jitter
    range)."""
    k = jnp.floor(2 * mu - 1)
    x = k * (mu - 0.5 * (k + 1)) / (k + 1 - mu)
    return k + x


def halton_trajectory_length(
    i: Array, trajectory_length_adjustment: float, max_bits: int = 10
) -> int:
    """Quasi-random integer trajectory length with the requested mean."""
    scale = rescale(trajectory_length_adjustment)
    return jnp.asarray(
        jnp.rint(0.5 + halton_sequence(i, max_bits) * scale), dtype=int
    )
