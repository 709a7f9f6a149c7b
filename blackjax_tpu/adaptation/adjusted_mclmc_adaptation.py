"""Warmup for Metropolis-adjusted MCLMC: dual-averaging step-size control at
a pinned average trajectory length ("avg-preserving" calibration), streaming
variance-based L estimation, and optional ESS-based L refinement.

Behavioral parity target: ``blackjax/adaptation/adjusted_mclmc_adaptation.py``
(``adjusted_mclmc_find_L_and_step_size`` :26 with entry pin
``L = target_num_integration_steps * step`` :127, two-pass DA :409-434 with
the pass-1 fix_L anchor, variance contraction + Lratio clamp :373-399, IMM
update without the sqrt(dim) L-reset :404-408, step ceiling ``L/1.1``
(_AVG_FLOOR) :15, ESS L-refinement :440-…, nan guard :496).

TPU notes: every phase is a single ``lax.scan`` with branch-free masking;
the per-step trajectory length is ``round(L/step)`` integration sub-steps
inside one compiled kernel call (no recompilation as L drifts).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.adaptation.mclmc_adaptation import MCLMCAdaptationState
from blackjax_tpu.adaptation.step_size import (
    DualAveragingAdaptationState,
    dual_averaging_adaptation,
)
from blackjax_tpu.diagnostics import effective_sample_size
from blackjax_tpu.util import incremental_value_update, pytree_size

__all__ = ["adjusted_mclmc_find_L_and_step_size"]

L_RATIO_LOWER = 0.0
L_RATIO_UPPER = 2.0
# step ceiling L/AVG_FLOOR: keeps the adjusted kernel above MALA (avg = 1)
AVG_FLOOR = 1.1


def _steps_from(params: MCLMCAdaptationState):
    """Integer trajectory length at the current (L, step): round(L/step) >= 1."""
    avg = params.L / params.step_size
    return jnp.maximum(jnp.rint(avg).astype(jnp.int32), 1)


def _handle_nans(previous_state, next_state, step_size, step_size_max, energy):
    """Reject non-finite proposals: keep the old state and shrink the step
    ceiling by 0.8."""
    flat, _ = ravel_pytree(next_state.position)
    nonans = jnp.all(jnp.isfinite(flat))
    state, new_max, energy = jax.tree.map(
        lambda new, old: jax.lax.select(nonans, jnp.nan_to_num(new), old),
        (next_state, step_size_max, energy),
        (previous_state, step_size * 0.8, 0.0),
    )
    return nonans, state, new_max, energy


def adjusted_mclmc_find_L_and_step_size(
    mclmc_kernel: Callable,
    logdensity_fn: Callable,
    num_steps: int,
    state,
    rng_key,
    target: float,
    frac_tune1: float = 0.1,
    frac_tune2: float = 0.1,
    frac_tune3: float = 0.0,
    diagonal_preconditioning: bool = True,
    params: Optional[MCLMCAdaptationState] = None,
    max: str = "avg",
    num_windows: int = 1,
    tuning_factor: float = 1.3,
    target_num_integration_steps: float = 2.0,
):
    """Tune ``(L, step_size[, inverse_mass_matrix])`` for adjusted MCLMC.

    ``mclmc_kernel`` must have signature ``(rng_key, state, logdensity_fn,
    step_size, inverse_mass_matrix, integration_steps_params) -> (state,
    info)``. The step size is dual-averaged toward ``target`` acceptance at a
    trajectory length pinned to ``target_num_integration_steps`` steps per
    proposal; L tracks the step so the operating avg never drifts to the
    MALA regime. Returns ``(state, params, total_integration_steps)``.
    """
    if max not in ("max", "avg"):
        raise ValueError(f"max should be 'max' or 'avg', got {max!r}")

    frac_tune1 /= num_windows
    frac_tune2 /= num_windows
    frac_tune3 /= num_windows

    dim = pytree_size(state.position)
    if params is None:
        params = MCLMCAdaptationState(
            jnp.sqrt(dim), jnp.sqrt(dim) * 0.2, inverse_mass_matrix=jnp.ones((dim,))
        )
    # entry pin: calibrate the step AT the operating trajectory length
    params = params._replace(L=target_num_integration_steps * params.step_size)

    windows_key, ess_key = jax.random.split(rng_key)

    if max == "max":
        contract = lambda var: jnp.sqrt(jnp.max(var) * dim) * tuning_factor
    else:
        contract = lambda var: jnp.sqrt(jnp.sum(var)) * tuning_factor

    def run_da_pass(state, params, keys, mask, fix_L):
        """One masked DA scan. ``mask=1`` steps update DA only; ``mask=0``
        steps stream position moments (weighted by step size) for L."""
        da_init, da_update, da_final = dual_averaging_adaptation(target=target)

        def one_step(carry, xs):
            mask_t, key = xs
            state, params, da_state, step_size_max, stream = carry

            next_state, info = mclmc_kernel(
                rng_key=key,
                state=state,
                logdensity_fn=logdensity_fn,
                step_size=params.step_size,
                inverse_mass_matrix=params.inverse_mass_matrix,
                integration_steps_params=(_steps_from(params),),
            )
            success, next_state, step_size_max, _ = _handle_nans(
                state, next_state, params.step_size, step_size_max, info.energy
            )

            proposed_da = da_update(da_state, info.acceptance_rate)
            da_state = jax.tree.map(
                lambda new, old: mask_t * new + (1 - mask_t) * old,
                proposed_da,
                da_state,
            )
            # ceiling: step may not exceed L/AVG_FLOOR (avg must stay > 1.1)
            step_size = jax.lax.clamp(
                1e-5, jnp.exp(da_state.log_step_size), params.L / AVG_FLOOR
            )
            da_state = da_state._replace(log_step_size=jnp.log(step_size))

            x = ravel_pytree(next_state.position)[0]
            stream = incremental_value_update(
                expectation=jnp.array([x, jnp.square(x)]),
                incremental_val=stream,
                weight=(1 - mask_t) * success * step_size,
                zero_prevention=mask_t,
            )

            old_step = params.step_size
            new_step = mask_t * step_size + (1 - mask_t) * old_step
            # avg-preserving: unless anchored, L tracks the step's motion
            new_L = params.L if fix_L else (
                mask_t * params.L * (step_size / old_step) + (1 - mask_t) * params.L
            )
            params = params._replace(step_size=new_step, L=new_L)

            return (next_state, params, da_state, step_size_max, stream), (
                info.num_integration_steps,
                info.acceptance_rate,
            )

        init_carry = (
            state,
            params,
            da_init(params.step_size),
            jnp.inf,
            (0.0, jnp.array([jnp.zeros(dim), jnp.zeros(dim)])),
        )
        (state, params, da_state, _, (_, moments)), (n_steps, _) = jax.lax.scan(
            one_step, init_carry, (mask, keys)
        )
        params = params._replace(step_size=da_final(da_state))
        return state, params, moments, jnp.sum(n_steps)

    total_integration_steps = jnp.zeros((), jnp.int32)
    num_steps1 = int(num_steps * frac_tune1)
    num_steps2 = int(num_steps * frac_tune2)

    for window in range(num_windows):
        window_key = jax.random.fold_in(windows_key, window)
        pass1_key, pass2_key = jax.random.split(window_key)

        # pass 1: DA for num_steps1 (L anchored — prevents runaway growth
        # through the L/1.1 ceiling), then stream moments for num_steps2
        mask1 = jnp.concatenate([jnp.ones(num_steps1), jnp.zeros(num_steps2)])
        state, params, moments, n1 = run_da_pass(
            state,
            params,
            jax.random.split(pass1_key, num_steps1 + num_steps2),
            mask1,
            fix_L=True,
        )
        total_integration_steps += n1

        if num_steps2 != 0:
            variances = moments[1] - jnp.square(moments[0])
            change = jax.lax.clamp(
                L_RATIO_LOWER, contract(variances) / params.L, L_RATIO_UPPER
            )
            params = params._replace(
                L=params.L * change, step_size=params.step_size * change
            )
            if diagonal_preconditioning:
                # adopt the streamed variances as the diagonal IMM; the
                # proportional (L, step) rescale above already preserved the
                # operating avg, so no sqrt(dim) L-reset here
                params = params._replace(inverse_mass_matrix=variances)
            # re-pin before the avg-preserving pass
            params = params._replace(
                L=target_num_integration_steps * params.step_size
            )

            # pass 2: avg-preserving DA (L tracks step)
            state, params, _, n2 = run_da_pass(
                state,
                params,
                jax.random.split(pass2_key, num_steps1),
                jnp.ones(num_steps1),
                fix_L=False,
            )
            total_integration_steps += n2

    if frac_tune3 != 0:
        num_steps3 = int(num_steps * frac_tune3)
        ess_keys = jax.random.split(ess_key, num_steps3)

        def sample_step(state, key):
            next_state, info = mclmc_kernel(
                rng_key=key,
                state=state,
                logdensity_fn=logdensity_fn,
                step_size=params.step_size,
                inverse_mass_matrix=params.inverse_mass_matrix,
                integration_steps_params=(_steps_from(params),),
            )
            return next_state, (next_state.position, info.num_integration_steps)

        state, (samples, n_steps) = jax.lax.scan(sample_step, state, ess_keys)
        total_integration_steps += jnp.sum(n_steps)

        flat = jax.vmap(lambda p: ravel_pytree(p)[0])(samples)
        ess_contract = jnp.min if max == "max" else jnp.mean
        ess_frac = ess_contract(effective_sample_size(flat[None, ...])) / num_steps3
        params = params._replace(
            L=jnp.clip(0.5 * params.L / ess_frac, max=params.L * L_RATIO_UPPER)
        )

    # invariant: the returned L always encodes the operating trajectory length
    params = params._replace(L=target_num_integration_steps * params.step_size)
    return state, params, total_integration_steps
