"""MCLMC tuning: decoherence length L, step size and diagonal preconditioner
for the unadjusted microcanonical sampler.

Behavioral parity target: ``blackjax/adaptation/mclmc_adaptation.py``
(``mclmc_find_L_and_step_size`` :42 — three phases: step-size control on an
energy-variance target plus streamed position variances, then L from the
effective sample size of a pilot run; NaN shrink-recovery :402).

The implementation here is organized around two small streaming estimators:

* an **step-size controller** that treats every transition as a noisy
  measurement of the *optimal* step size.  Under the leapfrog error law
  ``Var[dE] ~ c * eps^6`` the step that would have hit the per-dimension
  target variance is ``eps_opt = eps * ratio**(-1/6)`` with
  ``ratio = dE^2 / (d * target)``.  The controller keeps a decayed,
  confidence-weighted power-mean of these implied optima (accumulating
  ``eps_opt**-6`` keeps the mean in the natural units of the error law) and
  proposes its current mean each step, clipped to a divergence-informed
  ceiling.
* a **variance stream**: weighted online means of ``x`` and ``x*x`` held as
  two separate d-vectors, updated in incremental (Welford-style) form.

Phases run as separate scans — burn-in control, variance streaming, and an
optional re-equilibration after the preconditioner swap — rather than one
masked scan.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.diagnostics import effective_sample_size
from blackjax_tpu.types import Array
from blackjax_tpu.util import generate_unit_vector, pytree_size

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


class _EpsController(NamedTuple):
    """Decayed confidence-weighted estimate of the optimal step size.

    ``inv6_sum / conf_sum`` is the running mean of ``eps_opt**-6`` over past
    transitions; the proposal is its ``-1/6`` power.  ``ceiling`` is the hard
    cap lowered whenever a transition diverges.
    """

    conf_sum: float
    inv6_sum: float
    ceiling: float


def _controller_propose(ctrl, eps, sq_energy_change, dim, target_var, trust, decay):
    ratio = sq_energy_change / (dim * target_var) + 1e-8
    # confidence decays as a log-normal in the measured ratio: transitions far
    # from the target regime say little about the optimum (the 6 is the
    # exponent of the leapfrog error law, `trust` widens the band)
    confidence = jnp.exp(-0.5 * jnp.square(jnp.log(ratio) / (6.0 * trust)))
    conf_sum = decay * ctrl.conf_sum + confidence
    inv6_sum = decay * ctrl.inv6_sum + confidence * ratio / eps**6.0
    proposal = jnp.power(inv6_sum / conf_sum, -1.0 / 6.0)
    proposal = jnp.minimum(proposal, ctrl.ceiling)
    return _EpsController(conf_sum, inv6_sum, ctrl.ceiling), proposal


class _VarStream(NamedTuple):
    """Weighted online first/raw-second moments of the flattened position."""

    wsum: float
    mean: Array
    mean_sq: Array


def _var_stream_init(dim):
    return _VarStream(0.0, jnp.zeros(dim), jnp.zeros(dim))


def _var_stream_push(stream, x, weight):
    wsum = stream.wsum + weight
    gain = jnp.where(wsum > 0.0, weight / jnp.where(wsum > 0.0, wsum, 1.0), 0.0)
    return _VarStream(
        wsum,
        stream.mean + gain * (x - stream.mean),
        stream.mean_sq + gain * (jnp.square(x) - stream.mean_sq),
    )


def _var_stream_read(stream):
    return stream.mean_sq - jnp.square(stream.mean)


def _guarded_transition(kernel, logdensity_fn):
    """One kernel call with divergence recovery.

    A transition counts as clean when the kernel reports no NaNs *and* the
    energy change is finite.  A dirty transition keeps the pre-step state,
    lowers the controller ceiling to ``0.8 * eps``, reports zero energy
    change, and — if the log-density itself went NaN — redraws the momentum
    direction so the chain does not re-enter the bad region.
    """

    def transition(rng_key, state, params, ceiling):
        step_key, refresh_key = jax.random.split(rng_key)
        proposed, info = kernel(
            rng_key=step_key,
            state=state,
            logdensity_fn=logdensity_fn,
            inverse_mass_matrix=params.inverse_mass_matrix,
            L=params.L,
            step_size=params.step_size,
        )
        clean = jnp.logical_and(info.nonans, jnp.isfinite(info.energy_change))

        kept = jax.tree.map(
            lambda prop, prev: jnp.where(clean, jnp.nan_to_num(prop), prev),
            proposed,
            state,
        )
        bad_logdensity = jnp.isnan(proposed.logdensity)
        fresh = generate_unit_vector(refresh_key, state.position)
        momentum = jax.tree.map(
            lambda cur, new: jnp.where(bad_logdensity, new, cur), kept.momentum, fresh
        )
        kept = kept._replace(momentum=momentum)

        ceiling = jnp.where(clean, ceiling, 0.8 * params.step_size)
        delta_e = jnp.where(clean, info.energy_change, 0.0)
        return kept, clean, delta_e, ceiling

    return transition


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
    """Phases 1+2 of the MCLMC warmup: step-size control plus streamed
    position variances (for ``L`` and the diagonal preconditioner)."""
    decay = (num_effective_samples - 1.0) / (num_effective_samples + 1.0)
    transition = _guarded_transition(kernel, logdensity_fn)

    def make_controlled_step(stream_gate):
        def controlled_step(carry, rng_key):
            state, params, ctrl, stream = carry
            state, clean, delta_e, ceiling = transition(
                rng_key, state, params, ctrl.ceiling
            )
            ctrl, eps = _controller_propose(
                ctrl._replace(ceiling=ceiling),
                params.step_size,
                jnp.square(delta_e),
                dim,
                desired_energy_var,
                trust_in_estimate,
                decay=decay,
            )
            params = params._replace(step_size=eps)
            flat = ravel_pytree(state.position)[0]
            # clean transitions feed the variance stream, weighted by the
            # step size actually travelled
            stream = _var_stream_push(stream, flat, clean * eps * stream_gate)
            return (state, params, ctrl, stream), jnp.logical_not(clean)

        return controlled_step

    def run_phase(state, params, ctrl, stream, keys, gated):
        (state, params, ctrl, stream), div_flags = jax.lax.scan(
            make_controlled_step(1.0 if gated else 0.0),
            (state, params, ctrl, stream),
            keys,
        )
        return state, params, ctrl, stream, div_flags

    def adapt(state, params, num_steps, rng_key):
        n1 = round(num_steps * frac_tune1)
        n2 = round(num_steps * frac_tune2)
        burn_key, stream_key, requil_key = jax.random.split(rng_key, 3)

        ctrl = _EpsController(0.0, 0.0, jnp.inf)
        stream = _var_stream_init(dim)

        # phase 1: pure step-size burn-in
        state, params, ctrl, stream, _ = run_phase(
            state, params, ctrl, stream, jax.random.split(burn_key, n1), gated=False
        )
        # phase 2: keep controlling eps, stream position variances
        state, params, ctrl, stream, _ = run_phase(
            state, params, ctrl, stream, jax.random.split(stream_key, n2), gated=True
        )

        L = params.L
        imm = params.inverse_mass_matrix
        if n2 > 1:
            variances = _var_stream_read(stream)
            L = jnp.sqrt(jnp.sum(variances))
            if diagonal_preconditioning:
                # swap the metric in and let the controller re-equilibrate eps
                imm = variances
                params = params._replace(inverse_mass_matrix=imm)
                L = jnp.sqrt(dim)
                n_re = round(n2 / 3)
                state, params, ctrl, stream, _ = run_phase(
                    state,
                    params,
                    ctrl,
                    stream,
                    jax.random.split(requil_key, n_re),
                    gated=True,
                )
        return state, MCLMCAdaptationState(L, params.step_size, imm)

    return adapt


def make_adaptation_L(kernel, logdensity_fn, frac, l_factor):
    """Phase 3: set ``L`` from the integrated autocorrelation time of a pilot
    run — ``L = l_factor * eps * mean_d(tau_d)`` with ``tau_d = n / ESS_d``."""

    def adapt(state, params, num_steps, rng_key):
        n = round(num_steps * frac)

        def pilot_step(state, key):
            state, _ = kernel(
                rng_key=key,
                state=state,
                logdensity_fn=logdensity_fn,
                inverse_mass_matrix=params.inverse_mass_matrix,
                L=params.L,
                step_size=params.step_size,
            )
            return state, ravel_pytree(state.position)[0]

        state, draws = jax.lax.scan(pilot_step, state, jax.random.split(rng_key, n))
        tau = n / effective_sample_size(draws[None, ...])
        return state, params._replace(L=l_factor * params.step_size * jnp.mean(tau))

    return adapt


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
    target and stream position variances for ``L`` / the preconditioner
    (:func:`make_L_step_size_adaptation`); phase 3 refines ``L`` from the
    effective sample size of a pilot run (:func:`make_adaptation_L`).
    """
    if logdensity_fn is None:
        raise ValueError("logdensity_fn is required.")

    dim = pytree_size(state.position)
    if params is None:
        params = MCLMCAdaptationState(
            jnp.sqrt(dim), 0.25 * jnp.sqrt(dim), inverse_mass_matrix=jnp.ones((dim,))
        )

    n1 = round(num_steps * frac_tune1)
    n2 = round(num_steps * frac_tune2)
    n2 += diagonal_preconditioning * (n2 // 3)
    n3 = round(num_steps * frac_tune3)

    phase12_key, phase3_key = jax.random.split(rng_key)
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
    )(state, params, num_steps, phase12_key)
    total = n1 + n2

    if n3 >= 2:
        state, params = make_adaptation_L(
            mclmc_kernel, logdensity_fn, frac=frac_tune3, l_factor=l_factor
        )(state, params, num_steps, phase3_key)
        total += n3

    return state, params, total
