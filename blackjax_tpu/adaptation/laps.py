"""LAPS (Late Adjusted Parallel Sampler) / EMAUS driver.

Two ensemble phases over one device mesh, both executed through
:func:`blackjax_tpu.parallel.eca.run_eca` (shard_map over a ``"chains"``
axis, psum-reduced summary statistics, replicated controller):

1. **burn-in** — unadjusted microcanonical dynamics with equipartition
   convergence control (:mod:`blackjax_tpu.adaptation.laps_burn_in`),
   optionally early-stopped on the ensemble fluctuation criterion;
2. **sampling** — Metropolis-adjusted MCLMC whose step size is steered
   toward a target acceptance by a bracketing bisection shared by the whole
   ensemble; the preconditioner and trajectory length stay frozen at their
   burn-in estimates.

Behavioral parity: ``blackjax/adaptation/laps.py`` (controller :45-122,
driver :143, phases :218/:303).  Re-derived for this codebase: the phase-2
hyperparameter resolution lives in small pure helpers and the controller
state/update are minimal wrappers over ``bisection_monotonic_fn``.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.adaptation import laps_burn_in
from blackjax_tpu.adaptation.laps_burn_in import (
    equipartition_diagonal,
    equipartition_diagonal_loss,
)
from blackjax_tpu.adaptation.step_size import bisection_monotonic_fn
from blackjax_tpu.mcmc.adjusted_mclmc import build_kernel as build_adjusted_mclmc_kernel
from blackjax_tpu.mcmc.hmc import HMCState
from blackjax_tpu.mcmc.integrators import (
    generate_isokinetic_integrator,
    mclachlan_coefficients,
    omelyan_coefficients,
)
from blackjax_tpu.parallel.eca import run_eca

__all__ = ["laps", "Adaptation", "AdaptationState"]

# Heuristic switch point: high-dimensional targets get the 11-stage Omelyan
# scheme and a tighter acceptance target, low-dimensional ones the cheap
# 2-stage minimal-norm scheme.
_HIGH_DIM_CUTOFF = 200
_L_PROPOSAL_FACTOR = 1.25


class AdaptationState(NamedTuple):
    steps_per_sample: float
    step_size: float
    stepsize_adaptation_state: Any
    iteration: int


class Adaptation:
    """Adjusted-phase controller.

    The only tunable left in phase 2 is the step size; it is bisected
    toward ``acc_prob_target`` using the ensemble-averaged acceptance.
    Everything else (trajectory length, preconditioner) was settled during
    burn-in and rides along frozen.
    """

    def __init__(
        self, adaptation_state, num_adaptation_samples, steps_per_sample=15,
        acc_prob_target=0.8, observables=lambda x: 0.0,
        observables_for_bias=lambda x: 0.0, contract=lambda x: 0.0,
    ):
        self.num_adaptation_samples = num_adaptation_samples
        self.observables = observables
        self.observables_for_bias = observables_for_bias
        self.contract = contract
        self.epsadap_update = bisection_monotonic_fn(acc_prob_target)
        unbracketed = (jnp.array([-jnp.inf, jnp.inf]), False)
        self.initial_state = AdaptationState(
            steps_per_sample=steps_per_sample,
            step_size=adaptation_state.step_size,
            stepsize_adaptation_state=unbracketed,
            iteration=0,
        )

    def summary_statistics_fn(self, state, info, rng_key):
        return {
            "acceptance_probability": info.acceptance_rate,
            "equipartition_diagonal": equipartition_diagonal(state),
            "observables": self.observables(state.position),
            "observables_for_bias": self.observables_for_bias(state.position),
        }

    def update(self, controller: AdaptationState, Etheta):
        acceptance = Etheta["acceptance_probability"]
        record = {
            "L": controller.step_size * controller.steps_per_sample,
            "steps_per_sample": controller.steps_per_sample,
            "step_size": controller.step_size,
            "acc_prob": acceptance,
            "equi_diag": equipartition_diagonal_loss(
                Etheta["equipartition_diagonal"]
            ),
            "bias": self.contract(Etheta["observables_for_bias"]),
            "observables": Etheta["observables"],
        }
        bracket, step_size = self.epsadap_update(
            controller.stepsize_adaptation_state, controller.step_size, acceptance
        )
        next_controller = AdaptationState(
            controller.steps_per_sample,
            step_size,
            bracket,
            controller.iteration + 1,
        )
        return next_controller, record


def _resolve_phase2_scheme(ndims, integrator_coefficients, acc_prob):
    """Pick the phase-2 integrator coefficients and acceptance target.

    Returns ``(coefficients, acc_prob, gradient_calls_per_step)``.  In a
    BAB...AB palindrome of length n there are n//2 + 1 momentum kicks but
    only n//2 fresh gradients per step: the trailing kick's gradient is the
    next step's leading one.
    """
    if integrator_coefficients is not None:
        coefficients = integrator_coefficients
        target = 0.9 if acc_prob is None else acc_prob
    elif ndims > _HIGH_DIM_CUTOFF:
        coefficients = omelyan_coefficients
        target = 0.9 if acc_prob is None else acc_prob
    else:
        coefficients = mclachlan_coefficients
        target = 0.7 if acc_prob is None else acc_prob
    return coefficients, target, len(coefficients) // 2


def _fold_in_preconditioner(burn_in_result, diagonal_preconditioning):
    """Extract the phase-2 inverse mass matrix from the burn-in controller
    and rescale its step size by the average metric scale change (the
    dynamics now move in the preconditioned coordinates)."""
    if not diagonal_preconditioning:
        return burn_in_result, 1.0
    imm = burn_in_result.inverse_mass_matrix
    scale_shift = jnp.sqrt(jnp.mean(imm))
    rescaled = burn_in_result._replace(
        step_size=burn_in_result.step_size / scale_shift
    )
    return rescaled, imm


def laps(
    logdensity_fn, sample_init, ndims, num_steps1, num_steps2, num_chains,
    mesh, rng_key, microcanonical=True, alpha=1.9, save_frac=0.2, C=0.1,
    early_stop=True, r_end=0.01, bias_type=3, diagonal_preconditioning=True,
    integrator_coefficients=None, steps_per_sample=15, acc_prob=None,
    observables_for_bias=lambda x: x, all_chains_info=None, diagnostics=True,
    contract=lambda x: 0.0, superchain_size=1,
):
    """Run the full LAPS/EMAUS pipeline on ``mesh``.

    Returns ``(info, gradient_calls_per_step, acc_prob, final_state)`` where
    ``info`` is ``{"phase_1": ..., "phase_2": ...}`` per-step records (or
    ``None`` when ``diagnostics=False``).
    """
    if not microcanonical:
        raise ValueError("Only microcanonical mode is supported for LAPS.")
    key_init, key_burn, key_sample = jax.random.split(rng_key, 3)

    state0 = laps_burn_in.initialize(
        key_init, logdensity_fn, microcanonical, sample_init,
        num_chains, mesh, superchain_size,
    )

    # Phase 1: unadjusted burn-in, early-stoppable.
    burn_controller = laps_burn_in.Adaptation(
        ndims, microcanonical=microcanonical, alpha=alpha, bias_type=bias_type,
        save_num=int(round(save_frac * num_steps1)), C=C, r_end=r_end,
        observables_for_bias=observables_for_bias, contract=contract,
    )
    burned_state, burn_result, info1 = run_eca(
        key_burn, state0,
        laps_burn_in.build_kernel(logdensity_fn, ndims, microcanonical),
        burn_controller, num_steps1, num_chains, mesh, superchain_size,
        all_chains_info, early_stop=early_stop,
    )

    # Phase 2: Metropolis-adjusted MCLMC with ensemble step-size bisection.
    coefficients, target_acceptance, grads_per_step = _resolve_phase2_scheme(
        ndims, integrator_coefficients, acc_prob
    )
    burn_result, inverse_mass_matrix = _fold_in_preconditioner(
        burn_result, diagonal_preconditioning
    )
    adjusted_step = build_adjusted_mclmc_kernel(
        integrator=generate_isokinetic_integrator(coefficients)
    )

    def sampling_kernel(key, state, controller):
        return adjusted_step(
            rng_key=key, state=state, logdensity_fn=logdensity_fn,
            step_size=controller.step_size,
            integration_steps_params=(controller.steps_per_sample,),
            inverse_mass_matrix=inverse_mass_matrix,
            L_proposal_factor=_L_PROPOSAL_FACTOR,
        )

    num_samples = num_steps2 // (grads_per_step * steps_per_sample)
    sample_controller = Adaptation(
        burn_result._replace(step_size=burn_result.step_size.item()),
        num_adaptation_samples=num_samples // 2,
        steps_per_sample=steps_per_sample, acc_prob_target=target_acceptance,
        contract=contract, observables_for_bias=observables_for_bias,
    )
    phase2_state0 = HMCState(
        burned_state.position, burned_state.logdensity,
        burned_state.logdensity_grad,
    )
    final_state, _, info2 = run_eca(
        key_sample, phase2_state0, sampling_kernel, sample_controller,
        num_samples, num_chains, mesh, superchain_size, all_chains_info,
    )

    info = {"phase_1": info1, "phase_2": info2} if diagnostics else None
    return info, grads_per_step, target_acceptance, final_state
