"""Pathfinder-seeded warmup: phase 1 runs (multi-path) Pathfinder to get an
inverse mass matrix and a typical-set initialization, phase 2 adapts only
the step size by dual averaging.

Behavioral parity target: ``blackjax/adaptation/pathfinder_adaptation.py``
(``base`` :171-247, PSIS-weighted mixture covariance :46, multi-chain /
multi-path dispatch in ``pathfinder_adaptation`` :261).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.scipy.special import logsumexp

from blackjax_tpu.adaptation.base import AdaptationResults, return_all_adapt_info
from blackjax_tpu.adaptation.step_size import (
    DualAveragingAdaptationState,
    dual_averaging_adaptation,
)
from blackjax_tpu.base import AdaptationAlgorithm
from blackjax_tpu.optimizers.lbfgs import lbfgs_inverse_hessian_formula_1
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey
from blackjax_tpu.vi import multipathfinder as mpf
from blackjax_tpu.vi import pathfinder

__all__ = ["PathfinderAdaptationState", "base", "pathfinder_adaptation"]


class PathfinderAdaptationState(NamedTuple):
    ss_state: DualAveragingAdaptationState
    step_size: float
    inverse_mass_matrix: Array


def _psis_weighted_mixture_covariance(mpf_state, log_weights: Array) -> Array:
    """Law-of-total-variance covariance of the PSIS-weighted mixture of the
    per-path Laplace approximations: within-path IMMs plus between-path mean
    spread. Reduces exactly to the single path's inverse Hessian when
    ``n_paths = 1``."""
    per_path = mpf_state.logp.shape[1]
    n_paths = log_weights.shape[0] // per_path
    log_w_paths = logsumexp(log_weights.reshape(n_paths, per_path), axis=1)
    w = jnp.exp(log_w_paths - logsumexp(log_w_paths))

    mu = jax.vmap(lambda p: ravel_pytree(p)[0])(mpf_state.path_states.position)
    sigmas = jax.vmap(lbfgs_inverse_hessian_formula_1)(
        mpf_state.path_states.alpha, mpf_state.path_states.beta, mpf_state.path_states.gamma
    )
    mu_mix = jnp.einsum("i,id->d", w, mu)
    within = jnp.einsum("i,ijk->jk", w, sigmas)
    delta = mu - mu_mix[None, :]
    between = jnp.einsum("i,ij,ik->jk", w, delta, delta)
    return within + between


def base(target_acceptance_rate: float = 0.80):
    """Return ``(init, init_from_imm, update, final)``: IMM frozen from
    Pathfinder's inverse Hessian, step size dual-averaged."""
    da_init, da_update, da_final = dual_averaging_adaptation(target_acceptance_rate)

    def init(alpha, beta, gamma, initial_step_size: float) -> PathfinderAdaptationState:
        imm = lbfgs_inverse_hessian_formula_1(alpha, beta, gamma)
        return PathfinderAdaptationState(da_init(initial_step_size), initial_step_size, imm)

    def init_from_imm(inverse_mass_matrix, initial_step_size: float):
        return PathfinderAdaptationState(
            da_init(initial_step_size), initial_step_size, inverse_mass_matrix
        )

    def update(
        adaptation_state: PathfinderAdaptationState, position, acceptance_rate
    ) -> PathfinderAdaptationState:
        new_ss = da_update(adaptation_state.ss_state, acceptance_rate)
        return PathfinderAdaptationState(
            new_ss, jnp.exp(new_ss.log_step_size), adaptation_state.inverse_mass_matrix
        )

    def final(state: PathfinderAdaptationState):
        return jnp.exp(state.ss_state.log_step_size_avg), state.inverse_mass_matrix

    return init, init_from_imm, update, final


def pathfinder_adaptation(
    algorithm,
    logdensity_fn: Callable,
    *,
    num_chains: int = 1,
    n_paths: Optional[int] = None,
    num_samples_per_path: int = 200,
    initial_step_size: float = 1.0,
    target_acceptance_rate: float = 0.80,
    adaptation_info_fn: Callable = return_all_adapt_info,
    **extra_parameters,
) -> AdaptationAlgorithm:
    """Warmup HMC-family ``algorithm`` using Pathfinder's inverse Hessian as
    the (dense) inverse mass matrix.

    ``num_chains == 1`` with one path reproduces the classic scheme;
    ``num_chains > 1`` (or ``n_paths >= 2``) runs multi-path Pathfinder,
    draws chain initializations by PSIS importance resampling, estimates a
    shared dense IMM from the PSIS-weighted mixture covariance, and
    dual-averages the step size per chain (returned as ``(num_chains,)``).
    """
    if num_chains < 1:
        raise ValueError(f"num_chains must be >= 1, got {num_chains}")
    if n_paths is not None and n_paths < 1:
        raise ValueError(f"n_paths must be >= 1 or None, got {n_paths}")
    effective_n_paths = n_paths if n_paths is not None else num_chains

    mcmc_kernel = algorithm.build_kernel()
    adapt_init, adapt_init_from_imm, adapt_update, adapt_final = base(
        target_acceptance_rate
    )

    def one_step(carry, rng_key):
        state, adaptation_state = carry
        new_state, info = mcmc_kernel(
            rng_key,
            state,
            logdensity_fn,
            adaptation_state.step_size,
            adaptation_state.inverse_mass_matrix,
            **extra_parameters,
        )
        new_adaptation_state = adapt_update(
            adaptation_state, new_state.position, info.acceptance_rate
        )
        return (new_state, new_adaptation_state), adaptation_info_fn(
            new_state, info, new_adaptation_state
        )

    def _run_single(rng_key, position, num_steps):
        init_key, sample_key, rng_key = jax.random.split(rng_key, 3)
        pf_state, _ = pathfinder.approximate(init_key, logdensity_fn, position)
        init_adapt = adapt_init(
            pf_state.alpha, pf_state.beta, pf_state.gamma, initial_step_size
        )
        new_position, _ = pathfinder.sample(sample_key, pf_state)
        init_state = algorithm.init(new_position, logdensity_fn)

        keys = jax.random.split(rng_key, num_steps)
        (last_state, last_adapt), info = jax.lax.scan(
            one_step, (init_state, init_adapt), keys
        )
        step_size, imm = adapt_final(last_adapt)
        parameters = {
            "step_size": step_size,
            "inverse_mass_matrix": imm,
            **extra_parameters,
        }
        return AdaptationResults(last_state, parameters), info

    def _run_multi(rng_key, position, num_steps):
        pf_key, resample_key, chains_key = jax.random.split(rng_key, 3)
        flat, unravel = ravel_pytree(position)
        initial_positions = jax.vmap(unravel)(
            flat[None, :]
            + 2.0
            * jax.random.normal(pf_key, (effective_n_paths, flat.shape[0]))
        )
        mpf_state, _ = mpf.multi_approximate(
            pf_key, logdensity_fn, initial_positions, num_samples_per_path
        )
        log_w, pareto_k = mpf.psis_weights(mpf_state)
        imm = _psis_weighted_mixture_covariance(mpf_state, log_w)

        # PSIS-resample one init position per chain from the pooled draws
        pool = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), mpf_state.samples)
        idx = jax.random.choice(
            resample_key, log_w.shape[0], shape=(num_chains,), replace=True, p=jnp.exp(log_w)
        )
        init_positions = jax.tree.map(lambda x: x[idx], pool)

        init_states = jax.vmap(lambda p: algorithm.init(p, logdensity_fn))(init_positions)
        init_adapts = jax.vmap(lambda _: adapt_init_from_imm(imm, initial_step_size))(
            jnp.arange(num_chains)
        )

        @jax.vmap
        def run_one(init_state, init_adapt, key):
            keys = jax.random.split(key, num_steps)
            (last_state, last_adapt), info = jax.lax.scan(
                one_step, (init_state, init_adapt), keys
            )
            step_size, _ = adapt_final(last_adapt)
            return last_state, step_size, info

        last_states, step_sizes, infos = run_one(
            init_states, init_adapts, jax.random.split(chains_key, num_chains)
        )
        parameters = {
            "step_size": step_sizes,
            "inverse_mass_matrix": imm,
            "_pathfinder_psis_pareto_k": pareto_k,
            **extra_parameters,
        }
        return AdaptationResults(last_states, parameters), infos

    def run(rng_key: PRNGKey, position: ArrayLikeTree, num_steps: int = 400):
        if num_chains == 1 and effective_n_paths == 1:
            return _run_single(rng_key, position, num_steps)
        return _run_multi(rng_key, position, num_steps)

    return AdaptationAlgorithm(run)
