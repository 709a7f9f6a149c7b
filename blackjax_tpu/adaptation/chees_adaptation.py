"""ChEES-HMC cross-chain adaptation (Hoffman, Radul & Sountsov 2021).

Tunes the jittered-HMC trajectory length by gradient ascent on the Change in
the Estimator of the Expected Square criterion over an ensemble of chains,
and the step size by dual averaging on the harmonic-mean acceptance rate.

Behavioral parity target: ``blackjax/adaptation/chees_adaptation.py``
(``base`` :250, criterion/compute_parameters :309-..., public
``chees_adaptation`` :574 with opt-in ensemble diagonal mass matrix and
whitened criterion). The whole warmup is one ``lax.scan`` over steps of a
``vmap`` over chains — the canonical many-chain TPU workload; on a mesh the
per-step cross-chain reductions (means over chains) become ``psum``s
(see ``blackjax_tpu.parallel.eca``).

Not yet ported from the reference: the slow-direction trajectory-length
floor (power-iteration lambda_max accumulator, reference :93-236).
"""
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from blackjax_tpu.adaptation.base import AdaptationResults, return_all_adapt_info
from blackjax_tpu.adaptation.mass_matrix import welford_algorithm
from blackjax_tpu.base import AdaptationAlgorithm
from blackjax_tpu.mcmc import dynamic_hmc
from blackjax_tpu.optimizers import dual_averaging as dual_averaging_module
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey
from blackjax_tpu.util import pytree_size

__all__ = ["ChEESAdaptationState", "base", "chees_adaptation"]

OPTIMAL_TARGET_ACCEPTANCE_RATE = 0.651
EPS_FLOAT = 1e-10
LOG_UPDATE_CLIP = 1.0


class ChEESAdaptationState(NamedTuple):
    step_size: float
    log_step_size_moving_average: float
    trajectory_length: float
    log_trajectory_length_moving_average: float
    da_state: NamedTuple
    optim_state: NamedTuple
    random_generator_arg: Array
    step: int


def _weighted_mean(x, w):
    return jnp.sum(x * w[:, None], axis=0) / (jnp.sum(w) + EPS_FLOAT)


def base(
    jitter_generator: Callable,
    next_random_arg_fn: Callable,
    optim: optax.GradientTransformation,
    target_acceptance_rate: float,
    decay_rate: float,
    max_leapfrog_steps: int,
    whiten_criterion: bool = True,
) -> tuple[Callable, Callable]:
    """Return ``(init, update)`` of the ChEES controller.

    ``update`` consumes one ensemble step's proposals (positions, momenta),
    initial positions, per-chain acceptance probabilities and divergence
    flags, plus the diagonal inverse mass matrix the kernel used; it emits
    the tuned ``(step_size, trajectory_length)``.

    With a non-identity metric the criterion is *whitened*: position
    differences are measured in ``Sigma^{-1/2}`` coordinates and the endpoint
    velocity ``v = Sigma p`` whitened the same way (as a tangent vector), so
    the criterion stays consistent with the preconditioned geometry; with an
    identity metric every factor is an exact no-op.
    """
    da_init, da_update, _ = dual_averaging_module.dual_averaging()

    def init(random_generator_arg: Array, step_size: float):
        return ChEESAdaptationState(
            step_size=step_size,
            log_step_size_moving_average=0.0,
            trajectory_length=step_size,
            log_trajectory_length_moving_average=0.0,
            da_state=da_init(step_size),
            optim_state=optim.init(step_size),
            random_generator_arg=random_generator_arg,
            step=1,
        )

    def update(
        state: ChEESAdaptationState,
        proposed_positions: ArrayLikeTree,
        proposed_momentums: ArrayLikeTree,
        initial_positions: ArrayLikeTree,
        acceptance_probabilities: Array,
        is_divergent: Array,
        inverse_mass_matrix: Array,
    ) -> ChEESAdaptationState:
        # ---- step size: dual averaging on harmonic-mean acceptance -------
        harmonic_mean = 1.0 / jnp.mean(
            1.0 / acceptance_probabilities, where=~is_divergent
        )
        harmonic_mean = jnp.where(jnp.isfinite(harmonic_mean), harmonic_mean, 0.0)
        da_candidate = da_update(state.da_state, target_acceptance_rate - harmonic_mean)
        candidate_step_size = jnp.exp(da_candidate.log_x)
        ok = jnp.isfinite(candidate_step_size)
        new_step_size = jnp.where(ok, candidate_step_size, state.step_size)
        new_da_state = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), da_candidate, state.da_state
        )
        new_log_step_size = jnp.where(ok, da_candidate.log_x, state.da_state.log_x)

        update_weight = state.step ** (-decay_rate)
        new_log_step_size_ma = (
            1.0 - update_weight
        ) * state.log_step_size_moving_average + update_weight * new_log_step_size

        # ---- trajectory length: ascent on the ChEES gradient -------------
        flatten_chains = jax.vmap(lambda p: ravel_pytree(p)[0])
        w = jnp.where(~is_divergent, acceptance_probabilities, 0.0)
        proposals = flatten_chains(proposed_positions)
        initials = flatten_chains(initial_positions)
        momentums = flatten_chains(proposed_momentums)

        proposals_centered = proposals - _weighted_mean(proposals, w)
        initials_centered = initials - jnp.nanmean(initials, axis=0)

        if whiten_criterion:
            inv_sqrt_imm = 1.0 / jnp.sqrt(inverse_mass_matrix)
            proposals_w = proposals_centered * inv_sqrt_imm
            initials_w = initials_centered * inv_sqrt_imm
            # velocity v = Sigma p, whitened like a position tangent vector
            velocities_w = momentums * inverse_mass_matrix * inv_sqrt_imm
        else:
            proposals_w = proposals_centered
            initials_w = initials_centered
            velocities_w = momentums

        per_chain_gradients = jax.vmap(
            lambda prop, ini, vel: (jnp.dot(prop, prop) - jnp.dot(ini, ini))
            * jnp.dot(prop, vel)
        )(proposals_w, initials_w, velocities_w)
        trajectory_gradients = (
            jitter_generator(state.random_generator_arg)
            * state.trajectory_length  # gradient w.r.t. LOG trajectory length
            * per_chain_gradients
        )
        trajectory_gradient = jnp.sum(
            acceptance_probabilities * trajectory_gradients, where=~is_divergent
        ) / jnp.sum(acceptance_probabilities + EPS_FLOAT, where=~is_divergent)

        log_length = jnp.log(state.trajectory_length)
        updates, optim_candidate = optim.update(
            trajectory_gradient, state.optim_state, log_length
        )
        updates = jax.tree.map(
            lambda u: jnp.clip(u, -LOG_UPDATE_CLIP, LOG_UPDATE_CLIP), updates
        )
        log_length_candidate = optax.apply_updates(log_length, updates)
        length_ok = jnp.all(jnp.isfinite(ravel_pytree(log_length_candidate)[0]))
        new_log_length = jnp.where(length_ok, log_length_candidate, log_length)
        new_optim_state = jax.tree.map(
            lambda a, b: jnp.where(length_ok, a, b), optim_candidate, state.optim_state
        )

        new_log_length_ma = (
            1.0 - update_weight
        ) * state.log_trajectory_length_moving_average + update_weight * new_log_length
        new_trajectory_length = jnp.clip(
            jnp.exp(new_log_length_ma),
            min=new_step_size,
            max=max_leapfrog_steps * new_step_size,
        )

        return ChEESAdaptationState(
            new_step_size,
            new_log_step_size_ma,
            new_trajectory_length,
            new_log_length_ma,
            new_da_state,
            new_optim_state,
            next_random_arg_fn(state.random_generator_arg),
            state.step + 1,
        )

    return init, update


def chees_adaptation(
    logdensity_fn: Callable,
    num_chains: int,
    *,
    jitter_generator: Optional[Callable] = None,
    jitter_amount: float = 1.0,
    target_acceptance_rate: float = OPTIMAL_TARGET_ACCEPTANCE_RATE,
    decay_rate: float = 0.5,
    max_leapfrog_steps: int = 1000,
    adaptation_info_fn: Callable = return_all_adapt_info,
    mass_matrix_estimation: Optional[str] = None,
    mass_matrix_window_fraction: float = 0.5,
) -> AdaptationAlgorithm:
    """Cross-chain ChEES warmup for jittered dynamic HMC.

    ``run(rng_key, positions, step_size, optim, num_steps)`` expects
    ``positions`` with a leading ``(num_chains, ...)`` axis; it returns the
    ensemble's final states plus the tuned parameters accepted by
    ``blackjax_tpu.dynamic_hmc``.

    ``mass_matrix_estimation="diagonal"`` pools a Welford variance estimate
    over all chains during the last ``mass_matrix_window_fraction`` of
    warmup, gated on ``max(64, 2 sqrt(d))`` accumulated samples, and whitens
    the ChEES criterion accordingly.
    """
    if mass_matrix_estimation not in (None, "diagonal"):
        raise ValueError(
            f"mass_matrix_estimation must be None or 'diagonal', got "
            f"{mass_matrix_estimation!r}."
        )
    if not 0.0 <= mass_matrix_window_fraction <= 1.0:
        raise ValueError(
            "mass_matrix_window_fraction must be in [0, 1], got "
            f"{mass_matrix_window_fraction}."
        )
    estimate_mass_matrix = mass_matrix_estimation == "diagonal"

    def run(
        rng_key: PRNGKey,
        positions: ArrayLikeTree,
        step_size: float,
        optim: optax.GradientTransformation,
        num_steps: int = 1000,
        *,
        max_sampling_steps: int = 1000,
    ):
        leading = {jax.tree.leaves(jax.tree.map(lambda p: p.shape[0], positions))[0]}
        assert all(
            jax.tree.leaves(jax.tree.map(lambda p: p.shape[0] == num_chains, positions))
        ), "initial `positions` leading dimension must equal `num_chains`"
        num_dim = pytree_size(positions) // num_chains

        next_random_arg_fn = lambda i: i + 1
        init_random_arg = 0

        if jitter_generator is not None:
            rng_key, carry_key = jax.random.split(rng_key)
            jitter_gn = lambda i: jitter_generator(
                jax.random.fold_in(carry_key, i)
            ) * jitter_amount + (1.0 - jitter_amount)
        else:
            max_bits = int(np.ceil(np.log2(num_steps + max_sampling_steps)))
            jitter_gn = lambda i: dynamic_hmc.halton_sequence(
                i, max_bits
            ) * jitter_amount + (1.0 - jitter_amount)

        def integration_steps_fn(random_generator_arg, num_leapfrog_steps):
            return jnp.asarray(
                jnp.ceil(jitter_gn(random_generator_arg) * num_leapfrog_steps),
                dtype=int,
            )

        step_fn = dynamic_hmc.build_kernel(
            next_random_arg_fn=next_random_arg_fn,
            integration_steps_fn=integration_steps_fn,
        )
        init, update = base(
            jitter_gn,
            next_random_arg_fn,
            optim,
            target_acceptance_rate,
            decay_rate,
            max_leapfrog_steps,
        )

        wc_init, wc_update, wc_final = welford_algorithm(is_diagonal_matrix=True)
        engagement_threshold = max(64, int(2 * np.sqrt(num_dim)))
        window_start = int(num_steps * mass_matrix_window_fraction)
        in_window_flags = jnp.arange(num_steps) >= window_start

        def current_imm(mm_accum):
            if not estimate_mass_matrix:
                return jnp.ones(num_dim)
            cov, count, _ = wc_final(mm_accum)
            engaged = mm_accum.sample_size >= engagement_threshold
            safe = jnp.where(jnp.isfinite(cov) & (cov > 0), cov, 1.0)
            return jnp.where(engaged, safe, jnp.ones(num_dim))

        def one_step(carry, xs):
            rng_key, in_window = xs
            states, adaptation_state, mm_accum = carry

            imm = current_imm(mm_accum)
            keys = jax.random.split(rng_key, num_chains)
            _step = partial(
                step_fn,
                logdensity_fn=logdensity_fn,
                step_size=adaptation_state.step_size,
                inverse_mass_matrix=imm,
                integration_steps_params=(
                    adaptation_state.trajectory_length / adaptation_state.step_size,
                ),
            )
            new_states, info = jax.vmap(_step)(keys, states)
            new_adaptation_state = update(
                adaptation_state,
                info.proposal.position,
                info.proposal.momentum,
                states.position,
                info.acceptance_rate,
                info.is_divergent,
                imm,
            )

            if estimate_mass_matrix:
                flat_positions = jax.vmap(lambda p: ravel_pytree(p)[0])(
                    new_states.position
                )
                new_mm_accum = jax.lax.cond(
                    in_window,
                    lambda acc: wc_update(acc, flat_positions),
                    lambda acc: acc,
                    mm_accum,
                )
            else:
                new_mm_accum = mm_accum

            return (new_states, new_adaptation_state, new_mm_accum), adaptation_info_fn(
                new_states, info, new_adaptation_state
            )

        init_states = jax.vmap(
            lambda p: dynamic_hmc.init(p, logdensity_fn, init_random_arg)
        )(positions)
        init_adaptation_state = init(init_random_arg, step_size)
        init_mm_accum = wc_init(num_dim) if estimate_mass_matrix else wc_init(1)

        keys = jax.random.split(rng_key, num_steps)
        (last_states, last_adaptation_state, last_mm_accum), info = jax.lax.scan(
            one_step,
            (init_states, init_adaptation_state, init_mm_accum),
            (keys, in_window_flags),
        )

        final_imm = current_imm(last_mm_accum) if estimate_mass_matrix else jnp.ones(num_dim)
        parameters = {
            "step_size": jnp.exp(last_adaptation_state.log_step_size_moving_average),
            "inverse_mass_matrix": final_imm,
            "next_random_arg_fn": next_random_arg_fn,
            "integration_steps_fn": integration_steps_fn,
            "integration_steps_params": (
                jnp.exp(
                    last_adaptation_state.log_trajectory_length_moving_average
                    - last_adaptation_state.log_step_size_moving_average
                ),
            ),
        }
        return AdaptationResults(last_states, parameters), info

    return AdaptationAlgorithm(run)
