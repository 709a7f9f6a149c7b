"""MEADS: Maximum-Eigenvalue Adaptation of Damping and Step size for
generalized HMC (Hoffman & Sountsov 2022, Algorithm 3).

K-fold cross-chain scheme: chains are split into K folds; at step t fold
``t mod K`` is frozen, each fold's step size comes from its left neighbor's
preconditioned-gradient eigenvalue estimate, damping from the fold's own
positions, and all chains reshuffle across folds every K steps.

Behavioral parity target: ``blackjax/adaptation/meads_adaptation.py``
(state :31, base :55, ``meads_adaptation`` :316, ``maximum_eigenvalue``
:790). The opt-in pooled low-rank momentum metric of the reference
(:323-420) is not yet ported.
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.adaptation.base import AdaptationResults, return_all_adapt_info
from blackjax_tpu.base import AdaptationAlgorithm
from blackjax_tpu.mcmc import ghmc
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey

__all__ = ["MEADSAdaptationState", "base", "meads_adaptation", "maximum_eigenvalue"]


class MEADSAdaptationState(NamedTuple):
    """Per-fold GHMC parameters."""

    current_iteration: int
    step_size: Array  # (num_folds,)
    position_sigma: ArrayLikeTree  # leaves (num_folds, ...)
    alpha: Array
    delta: Array


def maximum_eigenvalue(matrix: ArrayLikeTree) -> Array:
    """Low-variance estimate of the largest eigenvalue of the second-moment
    matrix of a batch of vectors: the unbiased ratio
    ``E[sum lambda_i^2] / E[sum lambda_i]`` computed from the (n, n) Gram
    matrix — accurate unless many mid-sized eigenvalues exist."""
    X = jax.vmap(lambda m: ravel_pytree(m)[0])(matrix)
    n = X.shape[0]
    gram = X @ X.T
    diag = jnp.diagonal(gram)
    first_moment = jnp.sum(diag) / n
    second_moment = (jnp.sum(gram**2) - jnp.sum(diag**2)) / (n * (n - 1))
    return second_moment / first_moment


def base(
    num_folds: int = 4,
    step_size_multiplier: float = 0.5,
    damping_slowdown: float = 1.0,
):
    """Return ``(init, update)`` of the MEADS controller over per-fold
    parameter arrays."""
    if num_folds < 1:
        raise ValueError(f"num_folds must be >= 1, got {num_folds}.")

    def compute_parameters(positions, logdensity_grad, current_iteration):
        mean_position = jax.tree.map(lambda p: p.mean(axis=0), positions)
        sd_position = jax.tree.map(lambda p: p.std(axis=0), positions)
        normalized = jax.tree.map(
            lambda p, mu, sd: (p - mu) / sd, positions, mean_position, sd_position
        )
        scaled_grads = jax.tree.map(lambda g, sd: g * sd, logdensity_grad, sd_position)

        # Alg. 3 line 8: step size from the largest curvature of the
        # preconditioned gradients
        epsilon = jnp.minimum(
            step_size_multiplier / jnp.sqrt(maximum_eigenvalue(scaled_grads)), 1.0
        )
        # lines 9-10: damping from the slowest direction of the ensemble,
        # floored early in the run
        gamma = jnp.maximum(
            1.0 / jnp.sqrt(maximum_eigenvalue(normalized)),
            damping_slowdown / ((current_iteration + 1) * epsilon),
        )
        alpha = 1.0 - jnp.exp(-2.0 * epsilon * gamma)
        return epsilon, sd_position, alpha, alpha / 2.0

    def init(positions: ArrayLikeTree, logdensity_grad: ArrayLikeTree):
        step_size, sd_position, alpha, delta = compute_parameters(
            positions, logdensity_grad, 0
        )
        return MEADSAdaptationState(
            0,
            jnp.full((num_folds,), step_size),
            jax.tree.map(lambda s: jnp.repeat(s[None], num_folds, axis=0), sd_position),
            jnp.full((num_folds,), alpha),
            jnp.full((num_folds,), delta),
        )

    def update(
        adaptation_state: MEADSAdaptationState,
        positions: ArrayLikeTree,
        logdensity_grad: ArrayLikeTree,
        source_fold: int,
    ) -> MEADSAdaptationState:
        """Write parameters computed from ``source_fold``'s chains into the
        slot of fold ``source_fold + 1``."""
        target = (source_fold + 1) % num_folds
        t = adaptation_state.current_iteration
        step_size, sigma, alpha, delta = compute_parameters(positions, logdensity_grad, t)
        return MEADSAdaptationState(
            t + 1,
            adaptation_state.step_size.at[target].set(step_size),
            jax.tree.map(
                lambda s, v: s.at[target].set(v), adaptation_state.position_sigma, sigma
            ),
            adaptation_state.alpha.at[target].set(alpha),
            adaptation_state.delta.at[target].set(delta),
        )

    return init, update


def meads_adaptation(
    logdensity_fn: Callable,
    num_chains: int,
    num_folds: int = 4,
    step_size_multiplier: float = 0.5,
    damping_slowdown: float = 1.0,
    adaptation_info_fn: Callable = return_all_adapt_info,
) -> AdaptationAlgorithm:
    """Cross-chain MEADS warmup for GHMC. ``run(rng_key, positions,
    num_steps)`` takes positions with a leading ``(num_chains, ...)`` axis
    and returns tuned ``(step_size, momentum_inverse_scale, alpha, delta)``.
    """
    if num_folds < 1:
        raise ValueError(f"num_folds must be >= 1, got {num_folds}.")
    if num_chains % num_folds != 0:
        raise ValueError(
            f"num_chains ({num_chains}) must be divisible by num_folds ({num_folds})."
        )
    n_per_fold = num_chains // num_folds

    ghmc_kernel = ghmc.build_kernel()
    adapt_init, _ = base(num_folds, step_size_multiplier, damping_slowdown)
    batch_init = jax.vmap(lambda p, r: ghmc.init(p, logdensity_fn, r))

    def one_step(carry, rng_key):
        states, adaptation_state = carry
        t = adaptation_state.current_iteration
        fold_to_skip = t % num_folds

        keys = jax.random.split(rng_key, num_chains + 1)
        chain_keys, shuffle_key = keys[:num_chains], keys[num_chains]

        def to_folds(x):
            return x.reshape((num_folds, n_per_fold) + x.shape[1:])

        folded_pos = jax.tree.map(to_folds, states.position)
        folded_grads = jax.tree.map(to_folds, states.logdensity_grad)
        folded_scales = jax.tree.map(lambda p: p.std(axis=1), folded_pos)
        precond_grads = jax.tree.map(
            lambda g, s: g * jnp.expand_dims(s, axis=1), folded_grads, folded_scales
        )

        def fold_step_size(grads_k):
            return jnp.minimum(
                step_size_multiplier / jnp.sqrt(maximum_eigenvalue(grads_k)), 1.0
            )

        step_size_own = jax.vmap(fold_step_size)(precond_grads)
        # fold k samples with the step size and momentum scale of fold k-1
        step_size_rolled = jnp.roll(step_size_own, 1)
        scales_rolled = jax.tree.map(lambda s: jnp.roll(s, 1, axis=0), folded_scales)

        def fold_damping(pos_k, eps_k):
            centered = jax.tree.map(lambda p: p - p.mean(axis=0), pos_k)
            gamma = jnp.maximum(
                1.0 / jnp.sqrt(maximum_eigenvalue(centered)),
                damping_slowdown / ((t + 1) * eps_k),
            )
            alpha = 1.0 - jnp.exp(-2.0 * eps_k * gamma)
            return alpha, alpha / 2.0

        precond_pos = jax.tree.map(
            lambda p, s: p / jnp.expand_dims(s, axis=1), folded_pos, folded_scales
        )
        alphas, deltas = jax.vmap(fold_damping)(precond_pos, step_size_rolled)

        chain_step_sizes = jnp.repeat(step_size_rolled, n_per_fold)
        chain_scales = jax.tree.map(
            lambda s: jnp.repeat(s, n_per_fold, axis=0), scales_rolled
        )
        chain_alphas = jnp.repeat(alphas, n_per_fold)
        chain_deltas = jnp.repeat(deltas, n_per_fold)

        new_states, info = jax.vmap(ghmc_kernel, in_axes=(0, 0, None, 0, 0, 0, 0))(
            chain_keys,
            states,
            logdensity_fn,
            chain_step_sizes,
            chain_scales,
            chain_alphas,
            chain_deltas,
        )

        if num_folds > 1:
            # frozen fold does not advance this step
            chain_is_skipped = jnp.repeat(
                jnp.arange(num_folds) == fold_to_skip, n_per_fold
            )

            def restore(new_val, old_val):
                mask = chain_is_skipped.reshape(
                    chain_is_skipped.shape + (1,) * (new_val.ndim - 1)
                )
                return jnp.where(mask, old_val, new_val)

            new_states = jax.tree.map(restore, new_states, states)

        new_adaptation_state = MEADSAdaptationState(
            t + 1, step_size_rolled, scales_rolled, alphas, deltas
        )

        if num_folds > 1:
            # reshuffle chains across folds every K steps
            perm = jax.random.permutation(shuffle_key, num_chains)
            new_states = jax.lax.cond(
                (t + 1) % num_folds == 0,
                lambda s: jax.tree.map(lambda x: x[perm], s),
                lambda s: s,
                new_states,
            )

        return (new_states, new_adaptation_state), adaptation_info_fn(
            new_states, info, new_adaptation_state
        )

    def run(rng_key: PRNGKey, positions: ArrayLikeTree, num_steps: int = 1000):
        key_init, key_adapt = jax.random.split(rng_key)
        init_states = batch_init(positions, jax.random.split(key_init, num_chains))
        init_adaptation_state = adapt_init(positions, init_states.logdensity_grad)

        keys = jax.random.split(key_adapt, num_steps)
        (last_states, last_adaptation_state), info = jax.lax.scan(
            one_step, (init_states, init_adaptation_state), keys
        )

        parameters = {
            "step_size": last_adaptation_state.step_size.mean(),
            "momentum_inverse_scale": jax.tree.map(
                lambda s: s.mean(axis=0), last_adaptation_state.position_sigma
            ),
            "alpha": last_adaptation_state.alpha.mean(),
            "delta": last_adaptation_state.delta.mean(),
        }
        return AdaptationResults(last_states, parameters), info

    return AdaptationAlgorithm(run)
