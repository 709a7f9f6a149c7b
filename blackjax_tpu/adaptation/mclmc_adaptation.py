"""MCLMC tuning: find the decoherence length L, step size and diagonal
preconditioner for the unadjusted microcanonical sampler.

Behavioral parity target: ``blackjax/adaptation/mclmc_adaptation.py``
(``mclmc_find_L_and_step_size`` :42; 3-phase scheme: dual control of the
step size on the energy-variance target + streaming variance preconditioner
(``make_L_step_size_adaptation`` :208), then L from the run's effective
sample size (``make_adaptation_L`` :367); NaN shrink-recovery :402).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.diagnostics import effective_sample_size
from blackjax_tpu.types import Array
from blackjax_tpu.util import generate_unit_vector, incremental_value_update, pytree_size

__all__ = [
    "MCLMCAdaptationState",
    "mclmc_find_L_and_step_size",
    "make_L_step_size_adaptation",
    "make_adaptation_L",
]


class MCLMCAdaptationState(NamedTuple):
    L: float
    step_size: float
    inverse_mass_matrix: Array


def mclmc_find_L_and_step_size(
    mclmc_kernel,
    num_steps,
    state,
    rng_key,
    logdensity_fn=None,
    frac_tune1=0.1,
    frac_tune2=0.1,
    frac_tune3=0.1,
    desired_energy_var=5e-4,
    trust_in_estimate=1.5,
    num_effective_samples=150,
    diagonal_preconditioning=True,
    params=None,
    l_factor=0.4,
):
    """Three-phase MCLMC warmup. Returns ``(state, MCLMCAdaptationState,
    total_tuning_steps)``.

    Phases 1+2 control the step size toward the per-dimension energy-variance
    target and stream position variances for ``L`` / the preconditioner;
    phase 3 refines ``L`` from the effective sample size of a pilot run.
    """
    if logdensity_fn is None:
        raise ValueError("logdensity_fn is required.")

    dim = pytree_size(state.position)
    if params is None:
        params = MCLMCAdaptationState(
            jnp.sqrt(dim), jnp.sqrt(dim) * 0.25, inverse_mass_matrix=jnp.ones((dim,))
        )

    part1_key, part2_key = jax.random.split(rng_key)
    num_steps1 = round(num_steps * frac_tune1)
    num_steps2 = round(num_steps * frac_tune2)
    num_steps2 += diagonal_preconditioning * (num_steps2 // 3)
    num_steps3 = round(num_steps * frac_tune3)
    total = num_steps1 + num_steps2

    state, params = make_L_step_size_adaptation(
        kernel=mclmc_kernel,
        logdensity_fn=logdensity_fn,
        dim=dim,
        frac_tune1=frac_tune1,
        frac_tune2=frac_tune2,
        desired_energy_var=desired_energy_var,
        trust_in_estimate=trust_in_estimate,
        num_effective_samples=num_effective_samples,
        diagonal_preconditioning=diagonal_preconditioning,
    )(state, params, num_steps, part1_key)

    if num_steps3 >= 2:
        state, params = make_adaptation_L(
            mclmc_kernel, logdensity_fn, frac=frac_tune3, l_factor=l_factor
        )(state, params, num_steps, part2_key)
        total += num_steps3

    return state, params, total


def make_L_step_size_adaptation(
    kernel,
    logdensity_fn,
    dim,
    frac_tune1,
    frac_tune2,
    diagonal_preconditioning,
    desired_energy_var=1e-3,
    trust_in_estimate=1.5,
    num_effective_samples=150,
):
    """Step-size controller + streaming variance estimator for unadjusted
    MCLMC. Exploits the leapfrog scaling ``Var[dE] = O(eps^6)``: a decayed,
    Gaussian-weighted running estimate of ``Var[dE]/eps^6`` is inverted for
    the optimal step size each step."""
    decay_rate = (num_effective_samples - 1.0) / (num_effective_samples + 1.0)

    def one_tuning_step(previous_state, params, adaptive_state, rng_key):
        time, x_average, step_size_max = adaptive_state
        rng_key, nan_key = jax.random.split(rng_key)

        next_state, info = kernel(
            rng_key=rng_key,
            state=previous_state,
            logdensity_fn=logdensity_fn,
            inverse_mass_matrix=params.inverse_mass_matrix,
            L=params.L,
            step_size=params.step_size,
        )
        success, state, step_size_max, energy_change = _handle_nans(
            previous_state,
            next_state,
            params.step_size,
            step_size_max,
            info.energy_change,
            info.nonans,
            nan_key,
        )

        # energy-variance ratio relative to target; exponent 6 from the
        # leapfrog error scaling
        xi = jnp.square(energy_change) / (dim * desired_energy_var) + 1e-8
        weight = jnp.exp(-0.5 * jnp.square(jnp.log(xi) / (6.0 * trust_in_estimate)))
        x_average = decay_rate * x_average + weight * (xi / params.step_size**6.0)
        time = decay_rate * time + weight
        step_size = jnp.power(x_average / time, -1.0 / 6.0)
        step_size = jnp.where(step_size < step_size_max, step_size, step_size_max)

        return (
            state,
            params._replace(step_size=step_size),
            (time, x_average, step_size_max),
            success,
        )

    def step(carry, mask_and_key):
        mask, rng_key = mask_and_key
        state, params, adaptive_state, streaming_avg = carry
        state, params, adaptive_state, success = one_tuning_step(
            state, params, adaptive_state, rng_key
        )
        x = ravel_pytree(state.position)[0]
        streaming_avg = incremental_value_update(
            expectation=jnp.array([x, jnp.square(x)]),
            incremental_val=streaming_avg,
            weight=mask * success * params.step_size,
        )
        return (state, params, adaptive_state, streaming_avg), jnp.logical_not(success)

    def run_steps(xs, state, params):
        return jax.lax.scan(
            step,
            init=(
                state,
                params,
                (0.0, 0.0, jnp.inf),
                (0.0, jnp.array([jnp.zeros(dim), jnp.zeros(dim)])),
            ),
            xs=xs,
        )

    def L_step_size_adaptation(state, params, num_steps, rng_key):
        num_steps1 = round(num_steps * frac_tune1)
        num_steps2 = round(num_steps * frac_tune2)
        keys = jax.random.split(rng_key, num_steps1 + num_steps2 + 1)
        step_keys, final_key = keys[:-1], keys[-1]

        # only the last num_steps2 draws feed the variance estimate
        mask = jnp.concatenate((jnp.zeros(num_steps1), jnp.ones(num_steps2)))
        (state, params, _, (_, average)), _ = run_steps(
            xs=(mask, step_keys), state=state, params=params
        )

        L = params.L
        inverse_mass_matrix = params.inverse_mass_matrix
        if num_steps2 > 1:
            x_average, x_sq_average = average[0], average[1]
            variances = x_sq_average - jnp.square(x_average)
            L = jnp.sqrt(jnp.sum(variances))
            if diagonal_preconditioning:
                inverse_mass_matrix = variances
                params = params._replace(inverse_mass_matrix=inverse_mass_matrix)
                L = jnp.sqrt(dim)
                # re-equilibrate the step size under the new metric
                steps = round(num_steps2 / 3)
                keys = jax.random.split(final_key, steps)
                (state, params, _, _), _ = run_steps(
                    xs=(jnp.ones(steps), keys), state=state, params=params
                )

        return state, MCLMCAdaptationState(L, params.step_size, inverse_mass_matrix)

    return L_step_size_adaptation


def make_adaptation_L(kernel, logdensity_fn, frac, l_factor):
    """Refine L from the autocorrelation of a pilot run: ``L = l_factor *
    eps * (steps / ESS)``."""

    def adaptation_L(state, params, num_steps, key):
        steps = round(num_steps * frac)
        keys = jax.random.split(key, steps)

        def one(state, key):
            next_state, _ = kernel(
                rng_key=key,
                state=state,
                logdensity_fn=logdensity_fn,
                inverse_mass_matrix=params.inverse_mass_matrix,
                L=params.L,
                step_size=params.step_size,
            )
            return next_state, next_state.position

        state, samples = jax.lax.scan(one, state, keys)
        flat = jax.vmap(lambda x: ravel_pytree(x)[0])(samples)
        ess = effective_sample_size(flat[None, ...])
        return state, params._replace(
            L=l_factor * params.step_size * jnp.mean(steps / ess)
        )

    return adaptation_L


def _handle_nans(
    previous_state, next_state, step_size, step_size_max, kinetic_change, kernel_nonans, key
):
    """On kernel-reported divergence (or non-finite energy change), revert
    the state, shrink the step-size ceiling by 0.8, zero the energy change,
    and redraw the momentum if the logdensity was NaN."""
    nonans = jnp.logical_and(kernel_nonans, jnp.isfinite(kinetic_change))
    state, new_max, kinetic_change = jax.tree.map(
        lambda new, old: jax.lax.select(nonans, jnp.nan_to_num(new), old),
        (next_state, step_size_max, kinetic_change),
        (previous_state, step_size * 0.8, 0.0),
    )
    state = jax.lax.cond(
        jnp.isnan(next_state.logdensity),
        lambda: state._replace(momentum=generate_unit_vector(key, previous_state.position)),
        lambda: state,
    )
    return nonans, state, new_max, kinetic_change
