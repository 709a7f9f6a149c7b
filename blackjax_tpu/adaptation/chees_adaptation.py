"""ChEES-HMC cross-chain adaptation (Hoffman, Radul & Sountsov 2021).

Tunes the jittered-HMC trajectory length by gradient ascent on the Change in
the Estimator of the Expected Square criterion over an ensemble of chains,
and the step size by dual averaging on the harmonic-mean acceptance rate.

Behavioral parity target: ``blackjax/adaptation/chees_adaptation.py``
(``base`` :250, criterion/compute_parameters :309-..., public
``chees_adaptation`` :574 with opt-in ensemble diagonal mass matrix and
whitened criterion, slow-direction trajectory-length floor :93-236 —
``(pi/2) sqrt(lambda_max)`` of the whitened ensemble covariance via
warm-started power iteration, applied at consumption only). The whole
warmup is one ``lax.scan`` over steps of a ``vmap`` over chains — the
canonical many-chain TPU workload; on a mesh the per-step cross-chain
reductions (means over chains) become ``psum``s
(see ``blackjax_tpu.parallel.eca``).
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

# --- slow-direction trajectory-length floor --------------------------------
# A whitened direction with eigenvalue lambda undergoes simple-harmonic HMC
# motion with period 2 pi sqrt(lambda); a quarter turn is (pi/2) sqrt(lambda).
# ChEES's own criterion converges to ~pi/2 for the well-conditioned bulk
# (lambda ~ 1), so flooring the CONSUMED length at
# (pi/2) sqrt(lambda_max(whitened ensemble covariance)) extends the same
# quarter-turn rule to the residual slow direction the diagonal metric can't
# remove. lambda_max is tracked by a few power iterations (O(d^2)) refreshed
# every _LENGTH_FLOOR_RECOMPUTE_INTERVAL steps, warm-started on the previous
# eigenvector — never a full eigh per step.
CHEES_LENGTH_FLOOR_FACTOR: float = np.pi / 2
_LENGTH_FLOOR_RECOMPUTE_INTERVAL = 32
_LENGTH_FLOOR_POWER_ITERATIONS = 5
_LENGTH_FLOOR_FINAL_POWER_ITERATIONS = 20
# floor lambda_max away from <=0 (rank-deficient / cancellation cases whose
# sqrt would be NaN)
_LENGTH_FLOOR_LAMBDA_EPS = 1e-6


class _ChEESEigState(NamedTuple):
    """Warm-startable top eigenpair estimate of the whitened ensemble
    covariance ``D^{-1/2} C D^{-1/2}`` (D = engaged diagonal IMM)."""

    eigenvector: Array
    lambda_max: Array


def _eig_state_init(num_dim: int) -> _ChEESEigState:
    return _ChEESEigState(
        eigenvector=jnp.ones((num_dim,)) / jnp.sqrt(num_dim),
        lambda_max=jnp.ones(()),
    )


def _power_iteration_lambda_max(matrix, v0, num_iterations):
    """Warm-started power iteration on a symmetric PSD matrix; returns the
    Rayleigh-quotient top-eigenvalue estimate and the normalized direction
    (to warm-start the next refresh)."""

    def body(_, v):
        v_next = matrix @ v
        norm = jnp.linalg.norm(v_next)
        return v_next / jnp.where(norm > 0.0, norm, 1.0)

    v = jax.lax.fori_loop(0, num_iterations, body, v0)
    return jnp.dot(v, matrix @ v), v


def _recompute_eig_state(
    cov_count, cov_mean, cov_m2, inverse_mass_matrix, eig_state, num_iterations
):
    """Whiten the accumulated dense covariance by the engaged diagonal IMM
    and refresh the top-eigenvalue estimate."""
    covariance = cov_m2 / jnp.maximum(cov_count - 1.0, 1.0)
    inv_sqrt_d = 1.0 / jnp.sqrt(inverse_mass_matrix)
    whitened = covariance * inv_sqrt_d[:, None] * inv_sqrt_d[None, :]
    lambda_max, eigenvector = _power_iteration_lambda_max(
        whitened, eig_state.eigenvector, num_iterations
    )
    return _ChEESEigState(
        eigenvector, jnp.maximum(lambda_max, _LENGTH_FLOOR_LAMBDA_EPS)
    )


def _apply_length_floor(
    trajectory_length,
    lambda_max,
    engaged,
    enable: bool,
    max_leapfrog_steps: int,
    step_size,
):
    """Floor the CONSUMED trajectory length at ``(pi/2) sqrt(lambda_max)``,
    capped by the user's leapfrog budget. Pure function of the adapted
    length — never fed back into the ChEES optimizer state, so the floor is
    cleanly ablatable via the ``enable`` seam. Returns ``(consumed_length,
    floor_clipped_by_cap)``."""
    if not enable:
        return trajectory_length, jnp.asarray(False)
    floor_value = jnp.where(
        engaged, CHEES_LENGTH_FLOOR_FACTOR * jnp.sqrt(lambda_max), 0.0
    )
    cap = max_leapfrog_steps * step_size
    consumed = jnp.minimum(jnp.maximum(trajectory_length, floor_value), cap)
    return consumed, engaged & (floor_value > cap)


class ChEESAdaptationState(NamedTuple):
    step_size: float
    log_step_size_moving_average: float
    trajectory_length: float
    log_trajectory_length_moving_average: float
    da_state: NamedTuple
    optim_state: NamedTuple
    random_generator_arg: Array
    step: int


def _axis_sum(x, axis_name: Optional[str]):
    """Complete a shard-local partial sum over the named mesh axis (no-op
    outside ``shard_map``): the one seam that turns every cross-chain
    reduction below into a global one."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _weighted_mean(x, w, axis_name=None):
    return _axis_sum(jnp.sum(x * w[:, None], axis=0), axis_name) / (
        _axis_sum(jnp.sum(w), axis_name) + EPS_FLOAT
    )


def _axis_nanmean(x, axis_name=None):
    # mask NaN only (nanmean parity with the unsharded reference path:
    # +/-inf entries stay in the mean, exactly like jnp.nanmean)
    counted = ~jnp.isnan(x)
    total = _axis_sum(jnp.sum(jnp.where(counted, x, 0.0), axis=0), axis_name)
    count = _axis_sum(jnp.sum(counted, axis=0), axis_name)
    return total / count


def base(
    jitter_generator: Callable,
    next_random_arg_fn: Callable,
    optim: optax.GradientTransformation,
    target_acceptance_rate: float,
    decay_rate: float,
    max_leapfrog_steps: int,
    whiten_criterion: bool = True,
    axis_name: Optional[str] = None,
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
        inv_acc_sum = _axis_sum(
            jnp.sum(1.0 / acceptance_probabilities, where=~is_divergent), axis_name
        )
        non_divergent = _axis_sum(jnp.sum(~is_divergent), axis_name)
        harmonic_mean = non_divergent / inv_acc_sum
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

        proposals_centered = proposals - _weighted_mean(proposals, w, axis_name)
        initials_centered = initials - _axis_nanmean(initials, axis_name)

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
        trajectory_gradient = _axis_sum(
            jnp.sum(
                acceptance_probabilities * trajectory_gradients, where=~is_divergent
            ),
            axis_name,
        ) / _axis_sum(
            jnp.sum(acceptance_probabilities + EPS_FLOAT, where=~is_divergent),
            axis_name,
        )

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
    _length_floor: bool = False,
    axis_name: Optional[str] = None,
    integration_unroll: int = 2,
) -> AdaptationAlgorithm:
    """Cross-chain ChEES warmup for jittered dynamic HMC.

    ``run(rng_key, positions, step_size, optim, num_steps)`` expects
    ``positions`` with a leading ``(num_chains, ...)`` axis; it returns the
    ensemble's final states plus the tuned parameters accepted by
    ``blackjax_tpu.dynamic_hmc``.

    ``axis_name`` shards the ensemble over a mesh axis: call ``run`` inside
    ``jax.shard_map`` with ``positions`` holding this device's
    ``num_chains / axis_size`` block and ``rng_key`` replicated. Every
    cross-chain reduction (harmonic-mean acceptance, the ChEES gradient, the
    pooled Welford moments) completes over the mesh with one ``psum``; the
    controller state stays replicated, so the tuned parameters are identical
    (up to reduction-order rounding) to the single-device vmap run — see
    ``tests/multidevice/test_sharded_warmup.py``.

    ``mass_matrix_estimation="diagonal"`` pools a Welford variance estimate
    over all chains during the last ``mass_matrix_window_fraction`` of
    warmup, gated on ``max(64, 2 sqrt(d))`` accumulated samples, and whitens
    the ChEES criterion accordingly.

    ``integration_unroll`` blocks the inner trajectory loop (the drawn
    length is one shared scalar, so the loop's per-iteration dispatch cost
    dominates the cheap ensemble leapfrog at (chains, d) scale); results
    are bit-identical for any value — see
    ``trajectory.static_integration``.

    ``_length_floor=True`` (private seam; requires the diagonal metric)
    additionally accumulates the dense ensemble covariance and floors the
    consumed trajectory length at ``(pi/2) sqrt(lambda_max)`` of its
    whitened form — the quarter-turn rule for the residual slow direction
    the diagonal metric cannot remove.
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
    if _length_floor and not estimate_mass_matrix:
        raise ValueError(
            "_length_floor=True requires mass_matrix_estimation='diagonal' "
            "(the floor shares the diagonal metric's engagement gate)."
        )

    def run(
        rng_key: PRNGKey,
        positions: ArrayLikeTree,
        step_size: float,
        optim: optax.GradientTransformation,
        num_steps: int = 1000,
        *,
        max_sampling_steps: int = 1000,
    ):
        local_chains = (
            num_chains if axis_name is None else num_chains // jax.lax.axis_size(axis_name)
        )
        assert all(
            jax.tree.leaves(
                jax.tree.map(lambda p: p.shape[0] == local_chains, positions)
            )
        ), "initial `positions` leading dimension must equal the (local) chain count"
        num_dim = pytree_size(positions) // local_chains

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
            integration_unroll=integration_unroll,
        )
        init, update = base(
            jitter_gn,
            next_random_arg_fn,
            optim,
            target_acceptance_rate,
            decay_rate,
            max_leapfrog_steps,
            axis_name=axis_name,
        )

        wc_init, wc_update, wc_final = welford_algorithm(
            is_diagonal_matrix=True, axis_name=axis_name
        )
        dense_init, dense_update, _ = welford_algorithm(
            is_diagonal_matrix=False, axis_name=axis_name
        )
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
            rng_key, in_window, step_idx = xs
            states, adaptation_state, mm_accum, dense_accum, eig_state = carry

            imm = current_imm(mm_accum)
            engaged = mm_accum.sample_size >= engagement_threshold
            consumed_length, _ = _apply_length_floor(
                adaptation_state.trajectory_length,
                eig_state.lambda_max,
                engaged,
                _length_floor,
                max_leapfrog_steps,
                adaptation_state.step_size,
            )
            keys = jax.random.split(rng_key, num_chains)
            if axis_name is not None:
                # same global key stream as the vmap path; take our block
                keys = jax.lax.dynamic_slice_in_dim(
                    keys, jax.lax.axis_index(axis_name) * local_chains, local_chains
                )
            _step = partial(
                step_fn,
                logdensity_fn=logdensity_fn,
                step_size=adaptation_state.step_size,
                inverse_mass_matrix=imm,
                integration_steps_params=(
                    consumed_length / adaptation_state.step_size,
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

            def windowed(update_fn, acc, value):
                # a collective (the pooled psum) may not live in only one
                # branch of lax.cond — on the sharded path compute the merge
                # unconditionally and select
                if axis_name is None:
                    return jax.lax.cond(
                        in_window, lambda a: update_fn(a, value), lambda a: a, acc
                    )
                updated = update_fn(acc, value)
                return jax.tree.map(
                    lambda a, b: jnp.where(in_window, a, b), updated, acc
                )

            if estimate_mass_matrix:
                flat_positions = jax.vmap(lambda p: ravel_pytree(p)[0])(
                    new_states.position
                )
                new_mm_accum = windowed(wc_update, mm_accum, flat_positions)
            else:
                new_mm_accum = mm_accum

            if _length_floor:
                new_dense_accum = windowed(dense_update, dense_accum, flat_positions)
                # refresh lambda_max every INTERVAL steps once engaged
                refresh_due = (
                    in_window
                    & engaged
                    & (step_idx % _LENGTH_FLOOR_RECOMPUTE_INTERVAL == 0)
                )
                new_eig_state = jax.lax.cond(
                    refresh_due,
                    lambda es: _recompute_eig_state(
                        new_dense_accum.sample_size,
                        new_dense_accum.mean,
                        new_dense_accum.m2,
                        imm,
                        es,
                        _LENGTH_FLOOR_POWER_ITERATIONS,
                    ),
                    lambda es: es,
                    eig_state,
                )
            else:
                new_dense_accum = dense_accum
                new_eig_state = eig_state

            return (
                new_states,
                new_adaptation_state,
                new_mm_accum,
                new_dense_accum,
                new_eig_state,
            ), adaptation_info_fn(new_states, info, new_adaptation_state)

        init_states = jax.vmap(
            lambda p: dynamic_hmc.init(p, logdensity_fn, init_random_arg)
        )(positions)
        init_adaptation_state = init(init_random_arg, step_size)
        init_mm_accum = wc_init(num_dim) if estimate_mass_matrix else wc_init(1)
        init_dense_accum = dense_init(num_dim) if _length_floor else dense_init(1)
        init_eig_state = _eig_state_init(num_dim)

        keys = jax.random.split(rng_key, num_steps)
        (
            last_states,
            last_adaptation_state,
            last_mm_accum,
            last_dense_accum,
            last_eig_state,
        ), info = jax.lax.scan(
            one_step,
            (
                init_states,
                init_adaptation_state,
                init_mm_accum,
                init_dense_accum,
                init_eig_state,
            ),
            (keys, in_window_flags, jnp.arange(num_steps)),
        )

        final_imm = current_imm(last_mm_accum) if estimate_mass_matrix else jnp.ones(num_dim)
        final_step_size = jnp.exp(last_adaptation_state.log_step_size_moving_average)
        final_length = jnp.exp(
            last_adaptation_state.log_trajectory_length_moving_average
        )
        if _length_floor:
            # a longer final refresh so the returned parameters see a
            # converged lambda_max (cheap: runs once, outside the scan)
            final_eig_state = _recompute_eig_state(
                last_dense_accum.sample_size,
                last_dense_accum.mean,
                last_dense_accum.m2,
                final_imm,
                last_eig_state,
                _LENGTH_FLOOR_FINAL_POWER_ITERATIONS,
            )
            final_engaged = last_mm_accum.sample_size >= engagement_threshold
            final_length, _ = _apply_length_floor(
                final_length,
                final_eig_state.lambda_max,
                final_engaged,
                _length_floor,
                max_leapfrog_steps,
                final_step_size,
            )
        parameters = {
            "step_size": final_step_size,
            "inverse_mass_matrix": final_imm,
            "next_random_arg_fn": next_random_arg_fn,
            "integration_steps_fn": integration_steps_fn,
            "integration_steps_params": (final_length / final_step_size,),
        }
        return AdaptationResults(last_states, parameters), info

    return AdaptationAlgorithm(run)
