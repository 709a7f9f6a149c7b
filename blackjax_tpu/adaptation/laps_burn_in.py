"""EMAUS burn-in: the unadjusted phase of the massively-parallel
microcanonical sampler.

An ensemble of unadjusted MCLMC chains runs in lockstep on the device mesh
(through :mod:`blackjax_tpu.parallel.eca`); every step the ensemble reduces a
small pytree of summary statistics (psum over the ``"chains"`` axis) and a
single replicated controller retunes the step size, the decoherence length
``L`` and the diagonal preconditioner from them.  Convergence is declared
from the *relative fluctuation* of ensemble observables over a trailing
window: once the ensemble averages stop drifting, the burn-in is over and
the adjusted phase (:mod:`blackjax_tpu.adaptation.laps`) takes over.

Controller logic per step (EMAUS paper, eq. (9)):

- the step size follows an energy-error-variance-per-dimension (EEVPD)
  target ``C * bias**(3/8)`` where ``bias`` is one of four selectable
  convergence proxies (fluctuation max / fluctuation mean / full-rank
  equipartition loss / diagonal equipartition loss);
- ``L = alpha * sqrt(d) * sqrt(mean ensemble variance)``;
- the diagonal inverse mass matrix is the raw ensemble variance (applied
  only when the adjusted phase starts).

Behavioral parity: ``blackjax/adaptation/laps_burn_in.py`` (init :81-160,
equipartition :198-226, controller :231-368).  This implementation is
re-derived from the algorithm; the fluctuation window is a roll-based ring
buffer and all NaN handling is select-based (TPU-friendly, no branches).
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

# Step-size controller constants: eps <- eps * (EEVPD_target/EEVPD)^(1/6),
# clipped to a trust region; on any non-finite chain state, halve instead.
_EEVPD_BIAS_EXPONENT = 3.0 / 8.0
_EPS_GAIN_EXPONENT = 1.0 / 6.0
_EPS_TRUST_REGION = (0.3, 3.0)
_EPS_ON_NAN = 0.5
_FULLRANK_NUM_PROBES = 100


def no_nans(tree) -> Array:
    """True when every leaf of ``tree`` is finite."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x: jnp.all(jnp.isfinite(x)), tree))
    return jnp.stack(leaves).all()


def nan_reject(nonans, old, new):
    """Select ``new`` when ``nonans``, else fall back to ``old`` (per leaf)."""
    return jax.tree.map(lambda o, n: jnp.where(nonans, n, o), old, new)


# ---------------------------------------------------------------------------
# Equipartition diagnostics.
#
# At equilibrium the generalized virial theorem gives E[-x_i dlogp/dx_i] = 1
# per dimension; deviations of the ensemble average from 1 measure how far
# the ensemble is from the target (Robnik & Seljak).
# ---------------------------------------------------------------------------


def equipartition_diagonal(state):
    """Per-dimension virial statistic ``-x * grad`` (pytree-shaped)."""
    return jax.tree.map(
        lambda x, g: -x * g, state.position, state.logdensity_grad
    )


def equipartition_diagonal_loss(Eii):
    """Mean squared deviation of the ensemble-averaged virial from 1."""
    flat, _ = ravel_pytree(Eii)
    return jnp.mean(jnp.square(flat - 1.0))


def equipartition_fullrank(state, rng_key):
    """Rademacher probes of ``(I + x g^T) z`` — a Hutchinson estimate of the
    full equipartition matrix deviation (O(d) per probe, never forms d×d)."""
    x, _ = ravel_pytree(state.position)
    g, _ = ravel_pytree(state.logdensity_grad)
    z = jax.random.rademacher(rng_key, (_FULLRANK_NUM_PROBES, x.shape[0]))
    return z + (z @ g)[:, None] * x[None, :]


def equipartition_fullrank_loss(delta_z):
    """Normalized probe energy: zero at perfect equipartition."""
    return jnp.mean(jnp.square(delta_z)) / delta_z.shape[-1]


# ---------------------------------------------------------------------------
# Trailing fluctuation window (ring buffer, newest entry at row 0).
# ---------------------------------------------------------------------------


class History(NamedTuple):
    observables: Array  # (window, n_obs) trailing ensemble averages
    stopping: Array  # (window,) trailing r_max values (NaN until warm)
    weights: Array  # (window,) 1.0 for filled rows, 0.0 for empty

    def push(self, observed_flat, stopping_value):
        """Shift the window one step and write the newest row."""
        roll = lambda buf, v: jnp.roll(buf, 1, axis=0).at[0].set(v)
        return History(
            roll(self.observables, observed_flat),
            roll(self.stopping, stopping_value),
            roll(self.weights, 1.0),
        )


def _window_fluctuation(window: History):
    """Relative fluctuation r = Var[obs]/E[obs]^2 over the filled part of the
    window, summarized as (max over observables, mean over observables)."""
    w = window.weights
    first = jnp.average(window.observables, axis=0, weights=w)
    second = jnp.average(jnp.square(window.observables), axis=0, weights=w)
    r = second / jnp.square(first) - 1.0
    return jnp.max(r), jnp.mean(r)


# ---------------------------------------------------------------------------
# Ensemble initialization.
# ---------------------------------------------------------------------------


def initialize(
    rng_key, logdensity_fn, microcanonical, sample_init, num_chains, mesh,
    superchain_size,
):
    """Two sharded passes over the ensemble: (1) draw positions from
    ``sample_init`` and aim each chain's velocity along its own gradient;
    (2) flip the velocity sign per dimension wherever the ensemble virial
    says the cloud is overdispersed (``E[-x g] < 1``), so the initial flow
    contracts toward the typical set."""
    speed_of = (lambda v: 1.0) if microcanonical else (lambda v: jnp.sqrt(v.shape[0]))

    def draw_one(key, _x, _args):
        position = sample_init(key)
        logdensity, grad = jax.value_and_grad(logdensity_fn)(position)
        flat_grad, unravel = ravel_pytree(grad)
        direction, _ = _unit(flat_grad)
        velocity = unravel(direction * speed_of(flat_grad))
        return IntegratorState(position, velocity, logdensity, grad), None

    def orient_one(key, state, signs):
        v_flat, unravel = ravel_pytree(state.momentum)
        return state._replace(momentum=unravel(signs * v_flat)), None

    key_draw, key_orient = jax.random.split(rng_key)
    state, virial = ensemble_execute_fn(
        draw_one, key_draw, num_chains, mesh,
        summary_statistics_fn=equipartition_diagonal,
        superchain_size=superchain_size,
    )
    virial_flat, _ = ravel_pytree(virial)
    signs = jnp.where(virial_flat < 1.0, -1.0, 1.0)
    state, _ = ensemble_execute_fn(
        orient_one, key_orient, num_chains, mesh, x=state, args=signs,
        superchain_size=superchain_size,
    )
    return state


# ---------------------------------------------------------------------------
# The per-chain kernel and the replicated controller.
# ---------------------------------------------------------------------------


def build_kernel(logdensity_fn, ndims, microcanonical=True):
    """Unadjusted isokinetic MCLMC step with select-based NaN revert.  The
    mass matrix stays identity during burn-in — the estimated preconditioner
    is deferred to the adjusted phase, so retuning it never perturbs the
    running dynamics."""
    if not microcanonical:
        raise ValueError("Only microcanonical mode is supported for LAPS burn-in.")
    step = mclmc.build_kernel(integrator=isokinetic_velocity_verlet)
    identity_imm = jnp.ones(ndims)

    def kernel(rng_key, state, controller):
        proposed, info = step(
            rng_key,
            state,
            logdensity_fn,
            identity_imm,
            controller.L,
            controller.step_size,
        )
        ok = info.nonans
        return nan_reject(ok, state, proposed), {
            "nans": 1 - ok,
            "energy_change": jnp.where(ok, info.energy_change, 0.0),
            "logdensity": jnp.where(ok, info.logdensity, 0.0),
        }

    return kernel


class AdaptationState(NamedTuple):
    L: float
    inverse_mass_matrix: Any
    step_size: float
    step_count: int
    EEVPD: float
    EEVPD_wanted: float
    history: Any


class Adaptation:
    """Replicated burn-in controller (one instance drives the whole
    ensemble; it only ever sees psum-averaged statistics)."""

    def __init__(
        self, ndims, microcanonical, alpha=1.0, C=0.1, r_end=0.01, bias_type=0,
        save_num=10, observables=lambda x: 0.0,
        observables_for_bias=lambda x: x, contract=lambda x: 0.0,
    ):
        self.ndims = ndims
        self.alpha = alpha
        self.C = C
        self.r_end = r_end
        self.bias_type = bias_type
        self.save_num = save_num
        self.observables = observables
        self.observables_for_bias = observables_for_bias
        self.contract = contract
        self.speed = jnp.sqrt(ndims) if microcanonical else 1.0
        window = History(
            observables=jnp.zeros((save_num, ndims)),
            stopping=jnp.full((save_num,), jnp.nan),
            weights=jnp.zeros(save_num),
        )
        # Infinite L on the very first step = no momentum decoherence.
        self.initial_state = AdaptationState(
            L=jnp.inf if microcanonical else 1.0,
            inverse_mass_matrix=jnp.ones(ndims), step_size=0.01 * self.speed,
            step_count=0, EEVPD=1e-3, EEVPD_wanted=1e-3, history=window,
        )

    def summary_statistics_fn(self, state, info, rng_key):
        """Per-chain statistics; the ECA layer psum-averages them."""
        x, _ = ravel_pytree(state.position)
        dE = info["energy_change"]
        return {
            "equipartition_diagonal": equipartition_diagonal(state),
            "equipartition_fullrank": equipartition_fullrank(state, rng_key),
            "x": x,
            "xsq": jnp.square(x),
            "E": dE,
            "Esq": jnp.square(dE),
            "rejection_rate_nans": info["nans"],
            "observables_for_bias": self.observables_for_bias(state.position),
            "observables": self.observables(state.position),
            "entropy": -info["logdensity"],
        }

    def _retune_step_size(self, current, EEVPD, convergence_bias, any_nans):
        """EEVPD-targeted multiplicative step-size control."""
        wanted = self.C * jnp.power(convergence_bias, _EEVPD_BIAS_EXPONENT)
        gain = jnp.power(wanted / EEVPD, _EPS_GAIN_EXPONENT)
        gain = jnp.clip(gain, *_EPS_TRUST_REGION)
        gain = jnp.where(any_nans, _EPS_ON_NAN, gain)
        return current * gain, wanted

    def update(self, controller: AdaptationState, Etheta):
        loss_diag = equipartition_diagonal_loss(Etheta["equipartition_diagonal"])
        loss_full = equipartition_fullrank_loss(Etheta["equipartition_fullrank"])

        # Trailing-window fluctuation of the ensemble observables.  The
        # stopping track only starts recording once the window has filled.
        obs_flat, _ = ravel_pytree(Etheta["observables_for_bias"])
        pushed = controller.history.push(obs_flat, jnp.nan)
        r_max, r_avg = _window_fluctuation(pushed)
        warm = controller.step_count > self.save_num
        history = pushed._replace(
            stopping=pushed.stopping.at[0].set(jnp.where(warm, r_max, jnp.nan))
        )

        # Ensemble variance drives both L and the (deferred) preconditioner.
        variance = Etheta["xsq"] - jnp.square(Etheta["x"])
        L = self.alpha * jnp.sqrt(jnp.mean(variance)) * self.speed
        EEVPD = (Etheta["Esq"] - jnp.square(Etheta["E"])) / self.ndims

        convergence_bias = jnp.stack([r_max, r_avg, loss_full, loss_diag])[
            self.bias_type
        ]
        any_nans = Etheta["rejection_rate_nans"] > 0.0
        step_size, EEVPD_wanted = self._retune_step_size(
            controller.step_size, EEVPD, convergence_bias, any_nans
        )

        record = {
            "L": controller.L,
            "step_size": controller.step_size,
            "EEVPD_wanted": EEVPD_wanted,
            "EEVPD": EEVPD,
            "equi_diag": loss_diag,
            "equi_full": loss_full,
            "bias": self.contract(Etheta["observables_for_bias"]),
            "r_max": r_max,
            "r_avg": r_avg,
            "entropy": Etheta["entropy"],
            "observables": Etheta["observables"],
        }
        next_state = AdaptationState(
            L, variance, step_size, controller.step_count + 1,
            EEVPD, EEVPD_wanted, history,
        )
        return next_state, record

    def while_cond(self, info, counter):
        """Continue while fluctuations exceed ``r_end`` or the window is
        still filling."""
        return (info["r_max"] > self.r_end) | (counter < self.save_num)
