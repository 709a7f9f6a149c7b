"""LAPS (Late Adjusted Parallel Sampler) / EMAUS: two-phase massively
parallel microcanonical sampling on a device mesh — unadjusted burn-in with
equipartition diagnostics, then Metropolis-adjusted MCLMC with bisection
step-size control.

Behavioral parity target: ``blackjax/adaptation/laps.py`` (Adaptation
:45-122, driver :143 with phases at :218/:303).
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


class AdaptationState(NamedTuple):
    steps_per_sample: float
    step_size: float
    stepsize_adaptation_state: Any
    iteration: int


class Adaptation:
    """Adjusted-phase controller: bracketing bisection of the step size
    toward the target acceptance probability; everything else frozen."""

    def __init__(
        self,
        adaptation_state,
        num_adaptation_samples,
        steps_per_sample=15,
        acc_prob_target=0.8,
        observables=lambda x: 0.0,
        observables_for_bias=lambda x: 0.0,
        contract=lambda x: 0.0,
    ):
        self.num_adaptation_samples = num_adaptation_samples
        self.observables = observables
        self.observables_for_bias = observables_for_bias
        self.contract = contract
        self.epsadap_update = bisection_monotonic_fn(acc_prob_target)
        self.initial_state = AdaptationState(
            steps_per_sample,
            adaptation_state.step_size,
            (jnp.array([-jnp.inf, jnp.inf]), False),
            0,
        )

    def summary_statistics_fn(self, state, info, rng_key):
        return {
            "acceptance_probability": info.acceptance_rate,
            "equipartition_diagonal": equipartition_diagonal(state),
            "observables": self.observables(state.position),
            "observables_for_bias": self.observables_for_bias(state.position),
        }

    def update(self, adaptation_state, Etheta):
        acc_prob = Etheta["acceptance_probability"]
        equi_diag = equipartition_diagonal_loss(Etheta["equipartition_diagonal"])
        true_bias = self.contract(Etheta["observables_for_bias"])

        info_to_be_stored = {
            "L": adaptation_state.step_size * adaptation_state.steps_per_sample,
            "steps_per_sample": adaptation_state.steps_per_sample,
            "step_size": adaptation_state.step_size,
            "acc_prob": acc_prob,
            "equi_diag": equi_diag,
            "bias": true_bias,
            "observables": Etheta["observables"],
        }

        stepsize_adaptation_state, step_size = self.epsadap_update(
            adaptation_state.stepsize_adaptation_state,
            adaptation_state.step_size,
            acc_prob,
        )
        return (
            AdaptationState(
                adaptation_state.steps_per_sample,
                step_size,
                stepsize_adaptation_state,
                adaptation_state.iteration + 1,
            ),
            info_to_be_stored,
        )


def laps(
    logdensity_fn,
    sample_init,
    ndims,
    num_steps1,
    num_steps2,
    num_chains,
    mesh,
    rng_key,
    microcanonical=True,
    alpha=1.9,
    save_frac=0.2,
    C=0.1,
    early_stop=True,
    r_end=0.01,
    bias_type=3,
    diagonal_preconditioning=True,
    integrator_coefficients=None,
    steps_per_sample=15,
    acc_prob=None,
    observables_for_bias=lambda x: x,
    all_chains_info=None,
    diagnostics=True,
    contract=lambda x: 0.0,
    superchain_size=1,
):
    """Run LAPS over ``mesh``: gradient-aligned sharded init, unadjusted
    burn-in (phase 1, early-stoppable on the fluctuation criterion), then
    adjusted MCLMC sampling with a per-ensemble step-size bisection
    (phase 2). Returns ``(info, gradient_calls_per_step, acc_prob,
    final_state)``."""
    key_init, key1, key2 = jax.random.split(rng_key, 3)

    initial_state = laps_burn_in.initialize(
        key_init,
        logdensity_fn,
        microcanonical,
        sample_init,
        num_chains,
        mesh,
        superchain_size,
    )

    # ---- phase 1: unadjusted burn-in ---------------------------------
    kernel = laps_burn_in.build_kernel(logdensity_fn, ndims, microcanonical)
    save_num = int(jnp.rint(save_frac * num_steps1))
    adap = laps_burn_in.Adaptation(
        ndims,
        microcanonical=microcanonical,
        alpha=alpha,
        bias_type=bias_type,
        save_num=save_num,
        C=C,
        r_end=r_end,
        observables_for_bias=observables_for_bias,
        contract=contract,
    )
    final_state, final_adaptation_state, info1 = run_eca(
        key1,
        initial_state,
        kernel,
        adap,
        num_steps1,
        num_chains,
        mesh,
        superchain_size,
        all_chains_info,
        early_stop=early_stop,
    )

    # ---- phase 2: adjusted MCLMC -------------------------------------
    _acc_prob = acc_prob
    if integrator_coefficients is None:
        high_dims = ndims > 200
        _integrator_coefficients = (
            omelyan_coefficients if high_dims else mclachlan_coefficients
        )
        if acc_prob is None:
            _acc_prob = 0.9 if high_dims else 0.7
    else:
        _integrator_coefficients = integrator_coefficients
        if acc_prob is None:
            _acc_prob = 0.9

    # one gradient per position update; the trailing kick's gradient is
    # reused by the next step
    gradient_calls_per_step = len(_integrator_coefficients) // 2

    if diagonal_preconditioning:
        inverse_mass_matrix = final_adaptation_state.inverse_mass_matrix
        average_scale_change = jnp.sqrt(jnp.average(inverse_mass_matrix))
        final_adaptation_state = final_adaptation_state._replace(
            step_size=final_adaptation_state.step_size / average_scale_change
        )
    else:
        inverse_mass_matrix = 1.0

    if not microcanonical:
        raise ValueError("Only microcanonical mode is supported for LAPS.")

    integrator = generate_isokinetic_integrator(_integrator_coefficients)
    built_kernel = build_adjusted_mclmc_kernel(integrator=integrator)

    def adjusted_kernel(key, state, adap):
        return built_kernel(
            rng_key=key,
            state=state,
            logdensity_fn=logdensity_fn,
            step_size=adap.step_size,
            integration_steps_params=(adap.steps_per_sample,),
            inverse_mass_matrix=inverse_mass_matrix,
            L_proposal_factor=1.25,
        )

    initial_state = HMCState(
        final_state.position, final_state.logdensity, final_state.logdensity_grad
    )
    num_samples = num_steps2 // (gradient_calls_per_step * steps_per_sample)
    num_adaptation_samples = num_samples // 2

    final_adaptation_state = final_adaptation_state._replace(
        step_size=final_adaptation_state.step_size.item()
    )
    adap2 = Adaptation(
        final_adaptation_state,
        num_adaptation_samples,
        steps_per_sample,
        _acc_prob,
        contract=contract,
        observables_for_bias=observables_for_bias,
    )
    final_state, final_adaptation_state, info2 = run_eca(
        key2,
        initial_state,
        adjusted_kernel,
        adap2,
        num_samples,
        num_chains,
        mesh,
        superchain_size,
        all_chains_info,
    )

    info = {"phase_1": info1, "phase_2": info2} if diagnostics else None
    return info, gradient_calls_per_step, _acc_prob, final_state
