"""LAPS/EMAUS burn-in: massively-parallel unadjusted MCLMC with
equipartition-based convergence diagnostics and energy-variance step-size
control, executed on a device mesh through the ECA layer.

Behavioral parity target: ``blackjax/adaptation/laps_burn_in.py``
(gradient-aligned ensemble initialization :81-160, equipartition
diagnostics :198-226, adaptation :231-368).
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.mcmc import mclmc
from blackjax_tpu.mcmc.integrators import (
    IntegratorState,
    _unit,
    isokinetic_velocity_verlet,
)
from blackjax_tpu.parallel.eca import ensemble_execute_fn
from blackjax_tpu.types import Array

__all__ = [
    "build_kernel",
    "initialize",
    "Adaptation",
    "AdaptationState",
    "equipartition_diagonal",
    "equipartition_fullrank",
    "equipartition_diagonal_loss",
    "equipartition_fullrank_loss",
]


def no_nans(tree):
    flat, _ = ravel_pytree(tree)
    return jnp.all(jnp.isfinite(flat))


def nan_reject(nonans, old, new):
    return jax.lax.cond(nonans, lambda: new, lambda: old)


def build_kernel(logdensity_fn, ndims, microcanonical=True):
    """Unadjusted MCLMC kernel with NaN revert, identity mass matrix (the
    estimated preconditioner is applied only at the adjusted phase)."""
    if not microcanonical:
        raise ValueError("Only microcanonical mode is supported for LAPS burn-in.")
    kernel = mclmc.build_kernel(integrator=isokinetic_velocity_verlet)
    inverse_mass_matrix = jnp.ones(ndims)

    def sequential_kernel(key, state, adap):
        new_state, info = kernel(
            key, state, logdensity_fn, inverse_mass_matrix, adap.L, adap.step_size
        )
        nonans = info.nonans
        new_state = nan_reject(nonans, state, new_state)
        return new_state, {
            "nans": 1 - nonans,
            "energy_change": info.energy_change * nonans,
            "logdensity": info.logdensity * nonans,
        }

    return sequential_kernel


def initialize(
    rng_key,
    logdensity_fn,
    microcanonical,
    sample_init,
    num_chains,
    mesh,
    superchain_size,
):
    """Sharded ensemble initialization: draw each chain's position from
    ``sample_init``, aim its velocity along the gradient, then flip the sign
    per dimension according to the ensemble equipartition condition
    (``E[-x g] < 1`` means overdispersed along that dimension)."""
    if microcanonical:
        norm = lambda vec: 1.0
    else:
        norm = lambda vec: jnp.sqrt(len(vec))

    def sequential_init(key, x, args):
        position = sample_init(key)
        logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
        flat_g, unravel = ravel_pytree(logdensity_grad)
        velocity = unravel(_unit(flat_g)[0] * norm(flat_g))
        return IntegratorState(position, velocity, logdensity, logdensity_grad), None

    def summary_statistics_fn(state):
        flat_pos, _ = ravel_pytree(state.position)
        flat_g, unravel = ravel_pytree(state.logdensity_grad)
        return unravel(-flat_pos * flat_g)

    def ensemble_init(key, state, signs):
        momentum, unflatten = ravel_pytree(state.momentum)
        velocity = unflatten(signs * momentum)
        return (
            IntegratorState(
                state.position, velocity, state.logdensity, state.logdensity_grad
            ),
            None,
        )

    key1, key2 = jax.random.split(rng_key)
    initial_state, equipartition = ensemble_execute_fn(
        sequential_init,
        key1,
        num_chains,
        mesh,
        summary_statistics_fn=summary_statistics_fn,
        superchain_size=superchain_size,
    )
    flat_equi, _ = ravel_pytree(equipartition)
    signs = -2.0 * (flat_equi < 1.0) + 1.0
    initial_state, _ = ensemble_execute_fn(
        ensemble_init,
        key2,
        num_chains,
        mesh,
        x=initial_state,
        args=signs,
        superchain_size=superchain_size,
    )
    return initial_state


def update_history(new_vals, history):
    flat, _ = ravel_pytree(new_vals)
    return jnp.concatenate((flat[None, :], history[:-1, :]))


def update_history_scalar(new_val, history):
    return jnp.concatenate((new_val * jnp.ones(1), history[:-1]))


def contract_history(theta, weights):
    """Relative fluctuation of each observable over the history window:
    ``(E[x^2] - E[x]^2) / E[x]^2``, reported as (max, mean)."""
    square_average = jnp.square(jnp.average(theta, weights=weights, axis=0))
    average_square = jnp.average(jnp.square(theta), weights=weights, axis=0)
    r = (average_square - square_average) / square_average
    return jnp.array([jnp.max(r), jnp.average(r)])


class History(NamedTuple):
    observables: Array
    stopping: Array
    weights: Array


class AdaptationState(NamedTuple):
    L: float
    inverse_mass_matrix: Any
    step_size: float
    step_count: int
    EEVPD: float
    EEVPD_wanted: float
    history: Any


def equipartition_diagonal(state):
    """Per-dimension equipartition statistic ``-x grad``; its ensemble mean
    is 1 at equilibrium (generalized virial theorem)."""
    return jax.tree.map(lambda x, g: -x * g, state.position, state.logdensity_grad)


def equipartition_fullrank(state, rng_key):
    """Hutchinson probe of the full equipartition matrix deviation."""
    x, _ = ravel_pytree(state.position)
    g, _ = ravel_pytree(state.logdensity_grad)
    d = len(x)

    def probe(z):
        return z + jnp.dot(z, g) * x

    z = jax.random.rademacher(rng_key, (100, d))
    return jax.vmap(probe)(z)


def equipartition_diagonal_loss(Eii):
    flat, _ = ravel_pytree(Eii)
    return jnp.average(jnp.square(1.0 - flat))


def equipartition_fullrank_loss(delta_z):
    d = delta_z.shape[-1]
    return jnp.average(jnp.square(delta_z)) / d


class Adaptation:
    """Burn-in controller: step size from the energy-error-variance-per-
    dimension (EEVPD) target derived from the current bias estimate; L and
    the diagonal preconditioner from streaming ensemble moments; early stop
    on the observable-fluctuation criterion."""

    def __init__(
        self,
        ndims,
        microcanonical,
        alpha=1.0,
        C=0.1,
        r_end=0.01,
        bias_type=0,
        save_num=10,
        observables=lambda x: 0.0,
        observables_for_bias=lambda x: x,
        contract=lambda x: 0.0,
    ):
        self.ndims = ndims
        self.alpha = alpha
        self.C = C
        self.r_end = r_end
        self.observables = observables
        self.observables_for_bias = observables_for_bias
        self.contract = contract
        self.bias_type = bias_type
        self.save_num = save_num

        history = History(
            observables=jnp.zeros((save_num, ndims)),
            stopping=jnp.full((save_num,), jnp.nan),
            weights=jnp.zeros(save_num),
        )
        self.norm_factor = jnp.sqrt(ndims) if microcanonical else 1.0
        self.initial_state = AdaptationState(
            L=jnp.inf if microcanonical else 1.0,  # no momentum noise on step 1
            inverse_mass_matrix=jnp.ones(ndims),
            step_size=0.01 * self.norm_factor,
            step_count=0,
            EEVPD=1e-3,
            EEVPD_wanted=1e-3,
            history=history,
        )

    def summary_statistics_fn(self, state, info, rng_key):
        position_flat, _ = ravel_pytree(state.position)
        return {
            "equipartition_diagonal": equipartition_diagonal(state),
            "equipartition_fullrank": equipartition_fullrank(state, rng_key),
            "x": position_flat,
            "xsq": jnp.square(position_flat),
            "E": info["energy_change"],
            "Esq": jnp.square(info["energy_change"]),
            "rejection_rate_nans": info["nans"],
            "observables_for_bias": self.observables_for_bias(state.position),
            "observables": self.observables(state.position),
            "entropy": -info["logdensity"],
        }

    def update(self, adaptation_state, Etheta):
        equi_diag = equipartition_diagonal_loss(Etheta["equipartition_diagonal"])
        equi_full = equipartition_fullrank_loss(Etheta["equipartition_fullrank"])

        history_observables = update_history(
            Etheta["observables_for_bias"], adaptation_state.history.observables
        )
        history_weights = update_history_scalar(1.0, adaptation_state.history.weights)
        fluctuations = contract_history(history_observables, history_weights)
        history_stopping = update_history_scalar(
            jax.lax.cond(
                adaptation_state.step_count > len(history_weights),
                lambda: fluctuations[0],
                lambda: jnp.nan,
            ),
            adaptation_state.history.stopping,
        )
        history = History(history_observables, history_stopping, history_weights)

        L = (
            self.alpha
            * jnp.sqrt(jnp.average(Etheta["xsq"] - jnp.square(Etheta["x"])))
            * self.norm_factor
        )
        inverse_mass_matrix = Etheta["xsq"] - jnp.square(Etheta["x"])
        EEVPD = (Etheta["Esq"] - jnp.square(Etheta["E"])) / self.ndims
        true_bias = self.contract(Etheta["observables_for_bias"])
        nans = Etheta["rejection_rate_nans"] > 0.0

        bias = jnp.array([fluctuations[0], fluctuations[1], equi_full, equi_diag])[
            self.bias_type
        ]
        EEVPD_wanted = self.C * jnp.power(bias, 3.0 / 8.0)
        eps_factor = jnp.clip(jnp.power(EEVPD_wanted / EEVPD, 1.0 / 6.0), 0.3, 3.0)
        eps_factor = nan_reject(1 - nans, 0.5, eps_factor)

        info_to_be_stored = {
            "L": adaptation_state.L,
            "step_size": adaptation_state.step_size,
            "EEVPD_wanted": EEVPD_wanted,
            "EEVPD": EEVPD,
            "equi_diag": equi_diag,
            "equi_full": equi_full,
            "bias": true_bias,
            "r_max": fluctuations[0],
            "r_avg": fluctuations[1],
            "entropy": Etheta["entropy"],
            "observables": Etheta["observables"],
        }

        new_state = AdaptationState(
            L,
            inverse_mass_matrix,
            adaptation_state.step_size * eps_factor,
            adaptation_state.step_count + 1,
            EEVPD,
            EEVPD_wanted,
            history,
        )
        return new_state, info_to_be_stored

    def while_cond(self, info, counter):
        """Keep burning in while the fluctuation criterion is above the
        threshold (or the history window hasn't filled)."""
        return (info["r_max"] > self.r_end) | (counter < self.save_num)
